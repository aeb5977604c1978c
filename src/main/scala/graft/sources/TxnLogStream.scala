package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftglue.StreamShim
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, SchemaRelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[TxnLog]] table — the read
  * half of the lakehouse streaming loop (the write half is the
  * exactly-once `appendBatch` sink): `readStream.format("txnlog")
  * .option("path", root)` replays the table's change feed into a
  * streaming query, the way Delta/Iceberg tables feed downstream
  * pipelines.
  *
  * Offsets ARE log versions — the natural total order the commit
  * protocol already provides — so offset tracking is one long per
  * batch and a restart resumes from the engine's checkpointed
  * version with no source-side state at all. Batch planning is a
  * metadata walk: the first batch is the snapshot at the starting
  * version (the initial backlog); every later batch reads EXACTLY
  * the files that append commits added in (start, end] (plus any
  * recorded cdc insert files), resolved from the log the same way
  * [[TxnLog.changes]]'s fast path is. Compactions are invisible
  * (`cdc none`); row-level delete commits FAIL the stream by default
  * — a downstream that assumed append-only must find out. Delta's
  * two opt-outs apply: `ignoreDeletes=true` skips PURE delete
  * commits only; `ignoreChanges=true` also accepts update rewrites
  * (MERGE/REPLACE) by re-emitting their new images — the downstream
  * must tolerate re-delivered rows.
  *
  * 100 TB posture: per micro-batch the source lists only the version
  * files past the last offset (checkpoint-bounded, O(1) for a live
  * stream) and scans only the new data files; nothing rescans the
  * table. Exactly-once end-to-end composes with the appendBatch
  * sink: versions give the source its replayable offsets, txn
  * markers give the sink its idempotence.
  *
  * Spark wires V1 sources through `StreamSourceProvider` (the same
  * interface FileStreamSource ships on); `DataSourceRegister` + the
  * META-INF services entry make the short name `txnlog` resolvable. */
class TxnLogStreamProvider extends StreamSourceProvider
    with StreamSinkProvider
    with RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider
    with DataSourceRegister {

  /** STREAMING SINK — `writeStream.format("txnlog")` closes the
    * lakehouse streaming loop natively (the read half is the source
    * below; foreachBatch + appendBatch remains for custom batching):
    * Append mode lands each micro-batch as ONE exactly-once commit
    * through [[TxnLog.appendBatch]]'s txn markers — the writer
    * identity is the `appId` option, derived from the query's
    * checkpointLocation when absent, so a RESTARTED query (same
    * checkpoint) fences its replayed batches and a crashed epoch
    * never double-delivers. Complete mode maps each batch onto one
    * atomic REPLACE (idempotent by value). Update mode — a keyed
    * aggregation's native shape — needs option `mergeKeys` (comma-
    * separated key columns) and lands each micro-batch as one
    * exactly-once UPSERT ([[TxnLog.upsertBatch]]: matched keys take
    * the batch's values, fresh keys insert, the same txn fencing as
    * Append), converging to the batch-twin result across restarts.
    * A partitioned target (or an explicit `.partitionBy(...)`)
    * stages through the layout. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val t = tableOf(parameters)
    val complete =
      outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()
    val update =
      outputMode == org.apache.spark.sql.streaming.OutputMode.Update()
    require(complete || update ||
      outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"txnlog sink supports Append (exactly-once commits), Update " +
        s"(exactly-once keyed upserts via option 'mergeKeys') and " +
        s"Complete (atomic replace) output modes, got $outputMode")
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toIndexedSeq)
      .filter(_.nonEmpty)
    require(!update || mergeKeys.nonEmpty,
      "txnlog sink in Update output mode needs option 'mergeKeys' " +
        "(comma-separated key columns) to upsert on")
    val appId = parameters.get("appId").getOrElse {
      val ckpt = parameters.getOrElse("checkpointLocation",
        throw new IllegalArgumentException(
          "txnlog sink needs option 'appId' (a stable writer identity " +
            "for exactly-once fencing) or a checkpointLocation to " +
            "derive one from"))
      // a 64-bit digest prefix, not a 32-bit hash: two queries on
      // distinct checkpoints writing one table must never collide
      // into one writer identity (a collision silently fences out the
      // other query's batches). A checkpoint whose markers were
      // committed under the LEGACY 32-bit identity keeps it —
      // switching ids under an existing checkpoint would unfence its
      // replayed batches (duplicate delivery on upgrade)
      val legacy = "ck" + java.lang.Integer.toUnsignedString(
        java.util.Arrays.hashCode(ckpt.getBytes("UTF-8")))
      val derived = "ck" + java.security.MessageDigest
        .getInstance("SHA-256").digest(ckpt.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      if (TxnLog.lastBatch(t, derived).isEmpty &&
          TxnLog.lastBatch(t, legacy).nonEmpty) legacy
      else derived
    }
    new TxnLogSink(sqlContext, t, appId, partitionColumns, complete,
      if (update) mergeKeys else None,
      allowWiden = parameters.get("mergeSchema").exists(_.toBoolean))
  }

  /** BATCH writes — `df.write.format("txnlog").mode(...).save()`:
    * Append is one append commit; Overwrite is one atomic REPLACE
    * commit (remove every live file + add the staged ones — readers
    * see the old table or the new one, never a mix, and a concurrent
    * append aborts the replace instead of being silently dropped);
    * ErrorIfExists/Ignore follow their contracts against a non-empty
    * table. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val t = tableOf(parameters)
    val empty = TxnLog.latestVersion(t) < 0
    // Delta's mergeSchema writer option: an additive source schema
    // already lands with the data in one commit (the standing
    // contract); the option additionally admits losslessly WIDER
    // incoming types, re-registering the column wide in that same
    // commit instead of refusing toward ALTER COLUMN TYPE
    val allowWiden = parameters.get("mergeSchema").exists(_.toBoolean)
    mode match {
      case SaveMode.Append =>
        TxnLog.append(sqlContext.sparkSession, t, data, allowWiden)
      case SaveMode.Overwrite if parameters.contains("replaceWhere") =>
        // Delta's writer-option spelling: a conjunction of
        // PARTITION-column equalities keeps the metadata-only fast
        // path (one scoped replace commit, no data file read); any
        // other predicate routes the GENERAL form (Delta >= 1.1) —
        // one atomic delete-matching + insert-validated commit
        val raw = parameters("replaceWhere")
        val spec =
          try Some(TxnLogStreamProvider.parseReplaceWhere(raw))
          catch { case _: IllegalArgumentException => None }
        // ONE snapshot serves the spec classification AND the
        // statement itself — no second full log replay per write
        val snap0 = if (empty) None else Some(TxnLog.snapshot(t))
        val partCols = snap0.map(_.partCols).getOrElse(Nil)
        spec match {
          case Some(sp) if sp.nonEmpty &&
              sp.keySet.subsetOf(partCols.toSet) =>
            TxnLog.replaceWhere(sqlContext.sparkSession, t, data, sp,
              allowWiden, snap0)
          case _ =>
            TxnLog.replaceWhereExpr(sqlContext.sparkSession, t, data,
              org.apache.spark.sql.functions.expr(raw), snap0,
              allowWiden)
        }
      case SaveMode.Overwrite =>
        TxnLog.replace(sqlContext.sparkSession, t, data)
      case SaveMode.ErrorIfExists if !empty =>
        throw new IllegalStateException(
          s"txnlog table at ${t.root} already exists (latest version " +
            s"${TxnLog.latestVersion(t)}); use mode(\"append\") or " +
            "mode(\"overwrite\")")
      case SaveMode.Ignore if !empty => ()
      case _ => // ErrorIfExists / Ignore on an empty table: first write
        TxnLog.append(sqlContext.sparkSession, t, data)
    }
    relationOf(sqlContext, parameters, None)
  }

  override def shortName(): String = "txnlog"

  /** BATCH reads through the same short name —
    * `spark.read.format("txnlog").option("path", root).load()` and
    * SQL `CREATE ... USING txnlog OPTIONS (path ...)` — resolved to
    * a plain parquet HadoopFsRelation over exactly the snapshot's
    * live files, so filter pushdown / column pruning / whole-stage
    * codegen all apply as if the manifest were a directory listing.
    * Time travel rides the options: `versionAsOf` (a log version) or
    * `timestampAsOf` (epoch millis or an ISO-8601 instant). */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    relationOf(sqlContext, parameters, None)

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation =
    relationOf(sqlContext, parameters, Some(schema))

  /** Delta's path-embedded time-travel convention: a batch-read path
    * may end in `@v<version>` or `@ts<millis-or-ISO-8601>`, which
    * peel off into the versionAsOf/timestampAsOf options. This is
    * what SQL `SELECT … FROM txnlog.\`/p\` VERSION AS OF n` lowers
    * onto (GraftSqlParser rewrites the reference into the suffix
    * form — the table identifier is the only channel a pure SQL text
    * has). Explicit options win over a suffix; streams never see it
    * (time travel is a batch concept). */
  private val TravelSuffix = """(?s)^(.+)@(?:v(\d+)|ts([\d.:TZ+\- ]+))$""".r

  private def relationOf(sqlContext: SQLContext,
      rawParameters: Map[String, String],
      userSchema: Option[StructType]): BaseRelation = {
    val parameters = rawParameters.get("path") match {
      case Some(TravelSuffix(p, v, ts))
        if !rawParameters.contains("versionAsOf") &&
          !rawParameters.contains("timestampAsOf") =>
        rawParameters + ("path" -> p) ++
          Option(v).map("versionAsOf" -> _) ++
          Option(ts).map("timestampAsOf" -> _)
      case _ => rawParameters
    }
    val t = tableOf(parameters)
    // a SCHEMA-DEFINING first touch (version-0 schema commit on an
    // empty location) happens only under the EXPLICIT createIfAbsent
    // option — set by the SQL CREATE TABLE path (the parser's
    // TxnLogCreateTableCommand registers directly) or a programmatic
    // caller that means it. A probing READ with a schema must never
    // mint table metadata as a side effect: a later CREATE with a
    // different schema would merge into the accident instead of
    // defining the table.
    if (TxnLog.latestVersion(t) < 0 &&
        parameters.get("createIfAbsent").exists(_.toBoolean) &&
        !parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"))
      userSchema.foreach(sc => TxnLog.registerSchema(t, sc))
    val asOf: Option[Long] = parameters.get("versionAsOf") match {
      case Some(v) => Some(v.toLong)
      case None => parameters.get("timestampAsOf").map(ts =>
        TxnLog.versionAt(t, TxnLog.tsMillis(ts)))
    }
    val snap = TxnLog.snapshot(t, asOf)
    // a hive-partitioned table's files do NOT store the partition
    // columns, so the flat parquet relation would null-fill them —
    // such tables resolve through the partition-aware scan instead
    // (pinned to the observed version, the same point-in-time
    // semantics the flat path's captured file list has). A
    // column-MAPPED table (files hold physical names after a rename/
    // drop) needs the same indirection: the wrapped scan aliases
    // physical back to logical. A DELETION-VECTOR-carrying snapshot
    // too: the flat parquet relation would serve the dead rows.
    val mapped = snap.schemaJson.map(js =>
      org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[StructType]).exists(TxnLog.hasMapping)
    if (snap.filePartitions.nonEmpty || mapped || snap.dvs.nonEmpty)
      return new TxnLogPartitionedRelation(sqlContext, t,
        Some(snap.version),
        userSchema.orElse(snap.schemaJson.map(js =>
          org.apache.spark.sql.types.DataType.fromJson(js)
            .asInstanceOf[StructType])).getOrElse(
          throw new IllegalStateException(
            "partitioned txnlog reads need a log-registered schema")))
    val paths = snap.liveFiles.map(rel => t.root.resolve(rel).toString)
    val schema = userSchema.orElse(
      snap.schemaJson.map(js =>
        org.apache.spark.sql.types.DataType.fromJson(js)
          .asInstanceOf[StructType]))
    StreamShim.resolveParquet(sqlContext.sparkSession, paths, schema)
  }

  private def tableOf(parameters: Map[String, String]): TxnLog.Table =
    TxnLog.Table(TxnLog.pathOf(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txnlog source requires option 'path'"))))

  private def schemaOf(sqlContext: SQLContext,
                       schema: Option[StructType],
                       parameters: Map[String, String]): StructType =
    schema.orElse(TxnLog.registeredSchema(tableOf(parameters))).getOrElse {
      // raw-commit tables never registered one: fall back to the live
      // snapshot's footers, once, at stream definition time
      val t = tableOf(parameters)
      require(TxnLog.latestVersion(t) >= 0,
        s"txnlog table at ${t.root} has no commits and no registered " +
          "schema; commit first or pass .schema(...) explicitly")
      TxnLog.readFiles(sqlContext.sparkSession, t,
        TxnLog.snapshot(t).liveFiles, None, mergeSchema = true).schema
    }

  /** `readChangeFeed=true` turns the source into a CDF stream: rows
    * arrive with a trailing `_change_type` column ("insert" or
    * "delete" — a merge delivers delete-old-image + insert-new-image
    * pairs), so a delete commit mid-stream becomes typed delete
    * events instead of fail-or-skip, and replaying inserts-then-
    * deletes converges to the snapshot. */
  private def isCdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  private def withChangeType(schema: StructType): StructType =
    StructType(schema.fields :+ org.apache.spark.sql.types.StructField(
      "_change_type", org.apache.spark.sql.types.StringType,
      nullable = false))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schemaOf(sqlContext, schema, parameters)
    ("txnlog", if (isCdf(parameters)) withChangeType(base) else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = tableOf(parameters)
    // Delta's startingVersion: skip the initial-snapshot backlog and
    // stream changes FROM the given version (inclusive). "latest"
    // resolves ONCE and persists under the stream's metadata path:
    // a driver that dies after starting but before its first offset
    // commits must not re-resolve on restart — commits that landed
    // during the outage belong to the stream
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "set either startingVersion or startingTimestamp, not both")
    // resolve-once persistence shared by "latest" and
    // startingTimestamp: both resolve against CURRENT log state, so
    // a driver that dies after starting but before its first offset
    // commits must not re-resolve on restart — commits that landed
    // during the outage belong to the stream. The marker write is
    // atomic; a racing twin reads the winner's value back.
    def resolveOnce(resolve: => Long): Long = {
      val marker = TxnLog.pathOf(metadataPath)
        .resolve("graft-starting-version")
      if (java.nio.file.Files.exists(marker))
        java.nio.file.Files.readString(marker).trim.toLong
      else {
        val v = resolve
        java.nio.file.Files.createDirectories(marker.getParent)
        val tmp = marker.getParent.resolve(
          s".tmp-sv-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.writeString(tmp, s"$v\n")
        try java.nio.file.Files.move(tmp, marker,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp) }
        java.nio.file.Files.readString(marker).trim.toLong
      }
    }
    val startingVersion = parameters.get("startingVersion").map {
      case s0 if s0.equalsIgnoreCase("latest") =>
        resolveOnce(TxnLog.latestVersion(t) + 1)
      case s0 => s0.toLong
    }.orElse {
      // startingTimestamp: the earliest version committed at or
      // after the instant (inclusive — Delta's contract), resolved
      // ONCE and persisted — an instant past the current head means
      // "wait", and re-resolving after an outage would silently skip
      // the commits that landed during it; log expiry between
      // resolutions would likewise shift the answer. The resolution
      // is CHECKED, like the TVF's: when expired history could hide
      // commits at or after the instant, the stream refuses instead
      // of silently folding them into the retained floor. A log with
      // no commits yet has nothing expired — resolve to v0 and wait.
      parameters.get("startingTimestamp").map(ts =>
        resolveOnce(
          if (TxnLog.latestVersion(t) < 0) 0L
          else TxnLog.versionAtOrAfterChecked(t, TxnLog.tsMillis(ts))))
    }
    new TxnLogSource(sqlContext, t,
      schemaOf(sqlContext, schema, parameters),
      parameters.get("ignoreDeletes").exists(_.toBoolean),
      parameters.get("maxVersionsPerBatch").map(_.toLong),
      parameters.get("ignoreChanges").exists(_.toBoolean),
      isCdf(parameters),
      startingVersion)
  }
}

private[graft] object TxnLogStreamProvider {
  /** Parse the `replaceWhere` writer option: a conjunction of
    * `col = value` equalities (values optionally single- or
    * double-quoted). The AND split is QUOTE-AWARE — a partition
    * value containing the word AND must not split the expression —
    * and a column named twice refuses (silently last-winning on a
    * contradictory spec would replace the wrong partition). Anything
    * richer refuses by name — the scoped overwrite is
    * partition-granular by design; row-scoped rewrites are
    * DELETE + INSERT. */
  private[graft] def parseReplaceWhere(expr: String)
      : Map[String, String] = {
    // split on top-level AND tokens (word-bounded, outside quotes)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < expr.length) {
      val ch = expr.charAt(i)
      if (quote != 0) {
        cur += ch
        if (ch == quote) quote = 0
        i += 1
      } else if (ch == '\'' || ch == '"') {
        quote = ch; cur += ch; i += 1
      } else if ((ch == 'a' || ch == 'A') && i + 3 <= expr.length &&
          expr.regionMatches(true, i, "AND", 0, 3) &&
          (i == 0 || !Character.isLetterOrDigit(expr.charAt(i - 1))) &&
          (i + 3 == expr.length ||
            !Character.isLetterOrDigit(expr.charAt(i + 3)))) {
        parts += cur.toString; cur.clear(); i += 3
      } else { cur += ch; i += 1 }
    }
    parts += cur.toString
    val Pair = """\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(?:'([^']*)'|"([^"]*)"|([^\s'"]+))\s*""".r
    val pairs = parts.toSeq.map {
      case Pair(c, sq, dq, bare) =>
        c -> Seq(Option(sq), Option(dq), Option(bare)).flatten.head
      case other =>
        throw new IllegalArgumentException(
          s"replaceWhere accepts a conjunction of partition-column " +
            s"equalities (k = 7 AND d = '2020-01-01'); cannot parse: " +
            s"'${other.trim}'")
    }
    val dup = pairs.groupBy(_._1).collect {
      case (c, vs) if vs.length > 1 => c }
    require(dup.isEmpty,
      s"replaceWhere names column(s) more than once: " +
        s"${dup.toSeq.sorted.mkString(", ")}")
    pairs.toMap
  }
}

/** See [[TxnLogStreamProvider.createSink]]. The micro-batch frame
  * re-plans as a batch frame once (StreamShim.asBatch — V1 sinks
  * cannot hand a streaming plan to ordinary writers), then Append
  * rides appendBatch's exactly-once txn fencing and Complete rides
  * the atomic REPLACE. A partitioned TARGET with no explicit
  * partitionBy inherits the table's layout — the sink must not erode
  * what every other write op preserves. */
private[sources] class TxnLogSink(ctx: SQLContext, t: TxnLog.Table,
    appId: String, partitionColumns: Seq[String], complete: Boolean,
    upsertKeys: Option[Seq[String]] = None,
    allowWiden: Boolean = false)
  extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val batch = StreamShim.asBatch(data)
    val partCols =
      if (partitionColumns.nonEmpty) partitionColumns
      else if (TxnLog.latestVersion(t) < 0) Nil
      else TxnLog.snapshot(t).partCols
    if (complete)
      TxnLog.replace(ctx.sparkSession, t, batch, partCols)
    else upsertKeys match {
      case Some(keys) => // Update mode: exactly-once keyed upsert
        TxnLog.upsertBatch(ctx.sparkSession, t, batch, keys, appId,
          batchId, partCols, allowWiden)
      case None =>
        TxnLog.appendBatch(ctx.sparkSession, t, batch, appId, batchId,
          partCols, allowWiden)
    }
    ()
  }
}

/** Shared V1 Filter → Column translation for the txnlog relations.
  * Exact translation or None — Or/Not over a dropped branch would
  * change semantics, so nothing partial survives below the top
  * level (top-level array elements are implicitly ANDed, where
  * dropping an element is always safe); Spark re-applies every
  * filter above a V1 relation, so untranslated predicates stay
  * correct. */
private[graft] object TxnLogFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  def exact(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case And(l, r) => for (a <- exact(l); b <- exact(r)) yield a && b
    case Or(l, r)  => for (a <- exact(l); b <- exact(r)) yield a || b
    case Not(x)    => exact(x).map(!_)
    case _         => None
  }

  /** Filter + prune `base` and hand back its internal-row RDD (the
    * relations run with needConversion=false). */
  def scan(base: org.apache.spark.sql.DataFrame,
      requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val filtered = filters.flatMap(exact).foldLeft(base)(_.filter(_))
    val pruned = filtered.select(
      requiredColumns.map(col).toIndexedSeq: _*)
    pruned.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd
      .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
  }
}

/** Batch relation for a HIVE-PARTITIONED txnlog table: wraps the
  * partition-aware grouped read (typed reconstitution of the
  * partition columns) behind V1's PrunedFilteredScan. Column pruning
  * reaches the parquet scans through the inner plan's select, and
  * exactly-translated filters push into it — including filters on
  * the partition columns, which collapse to the reconstituted
  * literals and prune whole scan groups in the optimizer. Spark
  * re-applies every filter above a V1 relation, so partially
  * untranslatable predicates stay correct. */
private[graft] class TxnLogPartitionedRelation(
    override val sqlContext: SQLContext, t: TxnLog.Table,
    asOf: Option[Long], override val schema: StructType)
  extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {
  import org.apache.spark.sql.sources._

  // rows are produced by an internal Dataset plan: already InternalRow
  override def needConversion: Boolean = false

  /** How many times the log was replayed into a base plan — the spec
    * pins this at 1 for a multi-scan query (a self-join must not pay
    * the log read and grouped-plan build per scan). */
  private[graft] val logReads = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The snapshot's resolved plan, built ONCE per relation instance:
    * every buildScan (each scan of a self-join, each retry) projects
    * and filters over the same memoized base. The version is already
    * pinned (`asOf` captures the snapshot at relation creation), so
    * caching adds no staleness — at a 100 TB table's history depth it
    * removes O(versions) log-replay churn per extra scan. */
  private lazy val base: org.apache.spark.sql.DataFrame = {
    logReads.incrementAndGet()
    TxnLog.read(sqlContext.sparkSession, t, asOf)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): org.apache.spark.rdd.RDD[
        org.apache.spark.sql.Row] =
    TxnLogFilters.scan(base, requiredColumns, filters)
}

/** LIVE (query-time-resolved) batch relation for a `txnlog.\`/p\``
  * SQL reference: each buildScan replays the log and plans the
  * CURRENT snapshot, so a temp view or cached parsed plan holding
  * this relation serves fresh data after later commits — the
  * reference's per-query snapshot resolution, where an eagerly
  * resolved relation would pin its creation-time file list forever
  * (and break after vacuum). Time-traveled references (`@v`/`@ts`
  * suffix) stay EAGER: a pinned version is immutable, so there is
  * nothing to re-resolve. The relation's SCHEMA is captured at parse
  * time (analysis needs fixed output attributes); additive evolution
  * after view creation keeps working — buildScan projects the
  * captured columns out of the wider live snapshot — and a view
  * predating a column sees it after re-creation, Delta's posture.
  *
  * Consistency note: each SCAN resolves independently, so two scans
  * of one query (a self-join through the view) may observe different
  * versions if a commit lands between their plannings — the
  * documented V1 trade; a job that needs one pinned snapshot across
  * scans reads `spark.read.format("txnlog")` (the memoized
  * [[TxnLogPartitionedRelation]] / pinned flat relation). At 100 TB
  * the per-scan cost is one checkpoint-bounded log replay — metadata,
  * no data file touched before the scan itself. */
private[graft] class TxnLogLiveRelation(
    override val sqlContext: SQLContext, t: TxnLog.Table,
    override val schema: StructType)
  extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {

  // rows are produced by an internal Dataset plan: already InternalRow
  override def needConversion: Boolean = false

  /** Log replays this relation has paid — the freshness audit
    * (spec-pinned: one per execution THROUGH a temp view, not one
    * ever). */
  private[graft] val logReads = new java.util.concurrent.atomic.AtomicInteger(0)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    logReads.incrementAndGet()
    // fresh snapshot per scan; the captured schema projects out of it
    // (additive evolution widens the live read — never narrows it)
    val base = TxnLog.read(sqlContext.sparkSession, t, None)
    TxnLogFilters.scan(base, requiredColumns, filters)
  }
}

private[graft] object TxnLogLiveRelation {
  /** Resolve the relation for a path reference: schema pinned NOW
    * (registered, or the live footers for raw-commit logs), data
    * re-resolved per scan. */
  def of(ctx: SQLContext, path: String): TxnLogLiveRelation = {
    val t = TxnLog.Table(TxnLog.pathOf(path))
    val schema = TxnLog.registeredSchema(t).getOrElse {
      require(TxnLog.latestVersion(t) >= 0,
        s"empty transaction log at ${t.logDir}")
      TxnLog.readFiles(ctx.sparkSession, t,
        TxnLog.snapshot(t).liveFiles, None, mergeSchema = true).schema
    }
    new TxnLogLiveRelation(ctx, t, schema)
  }
}

/** See [[TxnLogStreamProvider]]. `maxVersionsPerBatch` is the
  * maxFilesPerTrigger analog: without it, a consumer starting (or
  * restarting) against a long backlog plans ONE batch spanning the
  * whole gap; with it each micro-batch advances at most N versions,
  * so backlog recovery is a stream of bounded batches — the shape
  * that keeps executor memory and commit sizes flat at 100 TB. */
class TxnLogSource(ctx: SQLContext, t: TxnLog.Table,
    tableSchema: StructType, ignoreDeletes: Boolean,
    maxVersionsPerBatch: Option[Long] = None,
    ignoreChanges: Boolean = false,
    readChangeFeed: Boolean = false,
    startingVersion: Option[Long] = None)
    extends Source {

  override val schema: StructType =
    if (!readChangeFeed) tableSchema
    else StructType(tableSchema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))

  maxVersionsPerBatch.foreach(n =>
    require(n > 0, s"maxVersionsPerBatch must be positive, got $n"))

  /** High-water mark of versions this source has already offered or
    * been asked for — rate-limited offsets must never move backward
    * (after a restart the engine's checkpointed offset re-seeds it
    * through getBatch before anything else matters). SEEDED from
    * startingVersion: the skip must hold in offset tracking too, or
    * a rate-limited first batch (maxVersionsPerBatch) would commit a
    * small offset and the next batch would chain from it, delivering
    * the very backlog the option skips; a startingVersion beyond the
    * current latest makes the stream WAIT for that version. */
  private var lastSeen: Long = startingVersion.map(_ - 1).getOrElse(-1L)

  /** The engine replays checkpointed offsets as SerializedOffset;
    * both carry the version as their json. */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val latest = TxnLog.latestVersion(t)
    if (latest < 0) None
    else {
      val target = maxVersionsPerBatch
        .map(n => math.min(latest, lastSeen + n)).getOrElse(latest)
      val eff = math.max(target, lastSeen)
      if (eff < 0) None
      else {
        lastSeen = eff
        Some(LongOffset(eff))
      }
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    lastSeen = math.max(lastSeen, endV)
    start.foreach(s0 => lastSeen = math.max(lastSeen, versionOf(s0)))
    // the engine holds ONE schema for the stream's lifetime; a
    // column-adding commit mid-stream would otherwise be silently
    // projected away — fail loudly instead (the Delta posture: a
    // schema change requires a stream restart, which re-reads the
    // registered schema and picks the new columns up)
    TxnLog.registeredSchema(t).foreach { reg =>
      val pinned = tableSchema.fields.map(f => f.name -> f.dataType).toMap
      val extra = reg.fieldNames.filterNot(pinned.contains)
      // a WIDENED column mid-stream is as fatal as a new one: files
      // written wide cannot be read under the pinned narrow schema
      val retyped = reg.fields
        .filter(f => pinned.get(f.name).exists(_ != f.dataType))
        .map(_.name)
      if (extra.nonEmpty || retyped.nonEmpty)
        throw new IllegalStateException(
          s"txnlog table at ${t.root} evolved mid-stream (" +
            (if (extra.nonEmpty) s"new columns: ${extra.mkString(", ")}"
             else "") +
            (if (extra.nonEmpty && retyped.nonEmpty) "; " else "") +
            (if (retyped.nonEmpty)
              s"retyped columns: ${retyped.mkString(", ")}" else "") +
            "); restart the stream to pick the new schema up")
    }
    import org.apache.spark.sql.functions.lit
    def typed(df: DataFrame, kind: String): DataFrame =
      df.withColumn("_change_type", lit(kind))
    // startingVersion skips the initial-snapshot backlog: the first
    // batch replays the feed FROM that version (inclusive) instead of
    // delivering the whole table; sv <= 0 degrades to the snapshot
    // path (replaying from the origin IS the initial snapshot)
    val firstFrom = startingVersion.filter(_ > 0).map(_ - 1)
    val batch = (start.map(versionOf).orElse(firstFrom),
        readChangeFeed) match {
      case (None, false) =>
        // initial backlog: the full snapshot at the first offset
        TxnLog.read(ctx.sparkSession, t, Some(endV))
      case (None, true) =>
        // CDF backlog: the snapshot arrives as one insert wave
        typed(TxnLog.read(ctx.sparkSession, t, Some(endV)), "insert")
      case (Some(s0), false) =>
        TxnLog.readFeedBatch(ctx.sparkSession, t, s0, endV,
          ignoreDeletes, ignoreChanges, tableSchema.json)
      case (Some(s0), true) =>
        val (ins, del) = TxnLog.readChangeFeedBatch(ctx.sparkSession, t,
          s0, endV, tableSchema.json)
        typed(ins, "insert").unionByName(typed(del, "delete"))
    }
    StreamShim.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}
