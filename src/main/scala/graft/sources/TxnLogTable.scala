package graft.sources

import java.util.{Collections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement,
  LogicalPlan, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension,
  Identifier, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.types.{Metadata, StructField, StructType}

/** DSv2 session-catalog integration for txnlog tables — the piece
  * that makes a catalog NAME a first-class table instead of a cached
  * DSv1 relation. Installed the way Delta installs its catalog:
  *
  * {{{
  *   spark.sql.extensions          = graft.GraftExtensions
  *   spark.sql.catalog.spark_catalog = graft.sources.TxnLogCatalog
  * }}}
  *
  * The catalog DELEGATES everything to Spark's own session catalog
  * and intercepts exactly one seam: `loadTable` on a table whose
  * provider is `txnlog` returns a [[TxnLogTable]] instead of the
  * `V1Table` wrapper. That single change moves catalog-name
  * resolution off the DSv1 path — and with it off the session
  * catalog's RELATION CACHE, which serves creation-time snapshots
  * until an explicit `refreshTable` — onto DataSourceV2Relation,
  * which re-loads the table at every analysis. Freshness becomes
  * per-query, the same contract `txnlog.\`/path\`` references and
  * the reference's own per-query snapshot resolution have.
  *
  * What rides on it:
  *  - SELECT/DESCRIBE/SHOW over catalog names serve the CURRENT log
  *    state — schema (post-evolution), declared partition layout,
  *    table properties AND constraints — with no refreshTable;
  *  - `VERSION AS OF` / `TIMESTAMP AS OF` on catalog names resolve
  *    through the TableCatalog time-travel overloads (previously
  *    only `txnlog.\`/path\`` references could travel);
  *  - INSERT INTO forms the parser seam does not lower (PARTITION
  *    specs among them) plan through Spark's native v2 write path
  *    and land as ordinary log commits ([[TxnLogTable]]'s V1Write).
  *
  * READS do not re-implement a scan: [[TxnLogV2ReadRewrite]] (an
  * injected resolution rule, the Delta pattern) rewrites every
  * read-position `DataSourceV2Relation` over a [[TxnLogTable]] onto
  * the existing V1 relations — the live per-scan-resolved relation,
  * or the eager pinned one for time travel — so the physical plan is
  * the SAME dv-aware, partition-reconstituting, pushdown-verified
  * scan every other entry point uses (and every plan-shape spec
  * pins). At 100 TB the added cost of catalog-name access is one
  * checkpoint-bounded metadata replay per query — no data touched. */
class TxnLogCatalog extends DelegatingCatalogExtension {
  import org.apache.spark.sql.graftglue.CatalogShim

  private def txnlogMeta(tbl: Table): Option[CatalogTable] =
    CatalogShim.v1Meta(tbl)
      .filter(_.provider.exists(_.equalsIgnoreCase("txnlog")))

  /** Wrap a delegate-loaded table when it is a txnlog entry with a
    * resolvable location (latest-version view; the time-travel
    * overloads pin `asOf` onto the wrapped result). */
  private def wrap(tbl: Table): Table =
    txnlogMeta(tbl) match {
      case Some(meta) =>
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.getPath)) match {
          case Some(p) =>
            TxnLogTable(TxnLog.Table(TxnLog.pathOf(p)), meta, None)
          case None => tbl // no location: leave it to the V1 path
        }
      case None => tbl
    }

  override def loadTable(ident: Identifier): Table =
    wrap(super.loadTable(ident))

  /** `SELECT ... FROM t VERSION AS OF n` on a catalog name — the
    * TableCatalog time-travel seam. Non-txnlog tables keep Spark's
    * native handling (and its native refusal message); a txnlog
    * entry whose location cannot resolve refuses LOUDLY through the
    * same delegation rather than silently dropping the version. ONE
    * base load serves the provider check and the wrap. */
  override def loadTable(ident: Identifier, version: String): Table =
    wrap(super.loadTable(ident)) match {
      case plain: TxnLogTable =>
        val v = try version.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"txnlog VERSION AS OF takes a numeric log version, " +
                s"got: $version")
        }
        plain.copy(asOf = Some(v))
      case _ => super.loadTable(ident, version)
    }

  /** `TIMESTAMP AS OF ts` — `timestamp` arrives in MICROseconds
    * (the TableCatalog contract); [[TxnLog.versionAt]] resolves it
    * against commit mtimes like every other time-travel entry. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    wrap(super.loadTable(ident)) match {
      case plain: TxnLogTable =>
        plain.copy(asOf =
          Some(TxnLog.versionAt(plain.t, timestamp / 1000L)))
      case _ => super.loadTable(ident, timestamp)
    }
}

/** The DSv2 `Table` a [[TxnLogCatalog]] load returns: metadata —
  * schema, partitioning, properties, constraints — is served from
  * ONE log replay taken at load time (per-analysis, so per-query
  * fresh; checkpoint-bounded, so metadata-scale at any table age).
  * Writes implement `SupportsWrite` through Spark's `V1Write`
  * fallback — the same bridge Delta uses — landing as the engine's
  * own append/replace commits with every existing guarantee
  * (declared-layout staging, constraint enforcement, atomic
  * replace). Reads never reach a DSv2 scan: [[TxnLogV2ReadRewrite]]
  * rewrites the relation onto the V1 plan first (BATCH_READ is
  * declared so analysis admits the relation before the rule fires). */
final case class TxnLogTable(t: TxnLog.Table, meta: CatalogTable,
    asOf: Option[Long]) extends Table with SupportsWrite {

  /** One replay serves every metadata accessor; None for a location
    * with no commits yet (a natively-created entry whose v0 was never
    * minted) — metastore metadata serves those. */
  @transient private lazy val snap: Option[TxnLog.Snapshot] =
    if (TxnLog.latestVersion(t) < 0) None
    else Some(TxnLog.snapshot(t, asOf))

  /** The staging layout a write must route through — served from the
    * SAME load-time replay as partitioning(), so a v2 INSERT pays no
    * second log replay at execution. */
  private[sources] def writeLayout: Seq[String] =
    snap.map(_.partCols).getOrElse(Nil)

  override def name(): String = meta.identifier.unquotedString

  /** The LOGICAL schema at the loaded version, mapping metadata
    * stripped (physical names are a storage detail no catalog
    * surface should leak). */
  override def schema(): StructType = snap.flatMap(_.schemaJson)
    .map(js => org.apache.spark.sql.types.DataType.fromJson(js)
      .asInstanceOf[StructType])
    .map(st => StructType(st.fields.map(f =>
      StructField(f.name, f.dataType, f.nullable, Metadata.empty))))
    .getOrElse(meta.schema)

  override def partitioning(): Array[Transform] =
    snap.map(_.partCols).getOrElse(meta.partitionColumnNames)
      .map(Expressions.identity).toArray

  override def properties(): java.util.Map[String, String] = {
    val base = Map(
      "provider" -> "txnlog",
      "location" -> t.root.toString) ++
      snap.map(sn =>
        sn.properties ++
          Map("graft.version" -> sn.version.toString,
            "graft.minReaderVersion" -> sn.minReader.toString) ++
          sn.notNull.toSeq.sorted.map(c =>
            s"graft.constraints.notnull.$c" -> s"$c IS NOT NULL") ++
          sn.checks.toSeq.sortBy(_._1).map { case (n, e) =>
            s"graft.constraints.$n" -> e }
      ).getOrElse(Map.empty)
    base.asJava
  }

  override def capabilities(): JSet[TableCapability] =
    Collections.unmodifiableSet(java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.TRUNCATE))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"cannot write to a time-traveled snapshot of ${name()} " +
        s"(VERSION AS OF ${asOf.get})")
    new TxnLogV2WriteBuilder(t, writeLayout)
  }
}

/** INSERT INTO → one append commit (restaged through a partitioned
  * target's layout); INSERT OVERWRITE / truncate-overwrite → one
  * atomic REPLACE. Partition-FILTERED overwrite refuses: the engine's
  * replace is whole-table-atomic (use DELETE + INSERT, or
  * dropPartition, for scoped rewrites). */
private class TxnLogV2WriteBuilder(t: TxnLog.Table,
    partCols: Seq[String])
  extends WriteBuilder with SupportsOverwrite {

  private var replaceAll = false

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.isEmpty || filters.forall(_ == AlwaysTrue),
      s"txnlog INSERT OVERWRITE supports only whole-table overwrite " +
        s"(got filters: ${filters.mkString(", ")}); use DELETE FROM " +
        "for scoped rewrites")
    replaceAll = true
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val s = data.sparkSession
          if (replaceAll || overwrite) {
            TxnLog.replace(s, t, data, partCols); ()
          } else if (partCols.isEmpty) {
            TxnLog.append(s, t, data); ()
          } else {
            TxnLog.appendPartitioned(s, t, data, partCols); ()
          }
        }
      }
  }
}

/** Resolution rule (injected by GraftExtensions): every
  * READ-position `DataSourceV2Relation` over a [[TxnLogTable]]
  * becomes the engine's own V1 relation — live (per-scan snapshot
  * resolution, so temp views over catalog names serve fresh data)
  * or eagerly pinned for time travel (a pinned version is
  * immutable). Write targets are left for Spark's v2 write planning
  * (AppendData/OverwriteByExpression over the table's V1Write).
  * The rewrite keeps the relation's output attributes, so
  * references bound upstream stay valid — the Delta conversion
  * pattern. */
final case class TxnLogV2ReadRewrite(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // EARLY EXIT: this rule sits in the analyzer's fixpoint batch, so
    // it runs many times per query — a plan with no txnlog v2
    // relation (every query in a session that never touches a
    // catalog-name txnlog table) must pay one cheap existence walk
    // and nothing else
    val hasTarget = plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[TxnLogTable]
      case _                       => false
    }
    if (!hasTarget) return plan
    // never rewrite a write TARGET: AppendData/OverwriteByExpression
    // plan through the table's own WriteBuilder; InsertIntoStatement
    // still needs ResolveInsertInto to see the v2 relation
    val writeTargets: Seq[LogicalPlan] = plan.collect {
      case i: InsertIntoStatement => Seq(i.table)
      case w: V2WriteCommand      => Seq(w.table)
    }.flatten
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[TxnLogTable] &&
          !writeTargets.exists(_ eq r) =>
        val tt = r.table.asInstanceOf[TxnLogTable]
        // NOTE: `spark.read.option("versionAsOf"/"timestampAsOf",
        // ...).table(name)` needs no handling here — Spark's own
        // relation resolution folds those option keys into a
        // TimeTravelSpec (session-timezone-aware, refusing both at
        // once) and arrives through the catalog's time-travel
        // loadTable overloads, so tt.asOf already carries the pin
        // (spec-pinned end-to-end)
        val rel = tt.asOf match {
          case Some(v) => // pinned: eager resolution, like @v suffixes
            new TxnLogStreamProvider().createRelation(spark.sqlContext,
              Map("path" -> tt.t.root.toString,
                "versionAsOf" -> v.toString))
          case None => // live: the snapshot resolves per scan
            new TxnLogLiveRelation(spark.sqlContext, tt.t, tt.schema())
        }
        new LogicalRelation(rel, r.output, Some(tt.meta),
          false, None)
    }
  }
}
