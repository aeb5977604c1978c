package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL entry points for the transaction-log DML the Scala API
  * already provides — the statement surface a SQL-first lakehouse
  * user expects:
  *
  * {{{
  *   DELETE FROM txnlog.`/path/to/table` WHERE k % 10 = 3
  *   MERGE INTO txnlog.`/p` t USING src s ON t.k = s.k
  *     WHEN MATCHED AND s.v > 5 THEN UPDATE SET v = t.v + s.v
  *     WHEN MATCHED THEN DELETE
  *     WHEN NOT MATCHED AND s.k % 2 = 0 THEN INSERT *
  *   OPTIMIZE txnlog.`/p` [ZORDER BY (a, b)]
  *   VACUUM txnlog.`/p` [RETAIN 168 HOURS]
  * }}}
  *
  * Tables address either by path (the Delta `format.\`/path\``
  * convention) or by a catalog table created with
  * `CREATE TABLE ... USING txnlog OPTIONS (path ...)`. The parser is
  * a DELEGATING front end (the SparkSessionExtensions injectParser
  * mechanism, the same seam Delta's own SQL support rides): the four
  * statement shapes above are recognized textually and lower onto
  * [[TxnLog.delete]]/[[TxnLog.mergeInto]]/[[TxnLog.compact]]/
  * [[TxnLog.compactZorder]]/[[TxnLog.vacuum]]; everything else
  * passes through untouched. Conditions and SET expressions stay SQL
  * text until run time, where they resolve against the target/source
  * aliases exactly as the Scala clause API does. A DELETE/MERGE whose
  * target turns out NOT to be a txnlog table executes Spark's own
  * plan for the same statement (captured from the delegate at parse
  * time), so v2 catalogs in the same session keep their native DML. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseDml(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val Ident = """[\w.]+|txnlog\.`[^`]+`"""
  private val DeleteRe =
    s"""(?is)^\\s*DELETE\\s+FROM\\s+($Ident)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$""".r
  private val OptimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+($Ident)(?:\\s+ZORDER\\s+BY\\s*\\(\\s*(\\w+)\\s*,\\s*(\\w+)\\s*\\))?\\s*;?\\s*$$""".r
  private val VacuumRe =
    s"""(?is)^\\s*VACUUM\\s+($Ident)(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?\\s*;?\\s*$$""".r
  private val HistoryRe =
    s"""(?is)^\\s*DESCRIBE\\s+HISTORY\\s+($Ident)(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*$$""".r
  private val MergeRe =
    (s"""(?is)^\\s*MERGE\\s+INTO\\s+($Ident)(?:\\s+AS\\b)?(?:\\s+(?!USING\\b)(\\w+))?""" +
      s"""\\s+USING\\s+(\\((?:[^()]|\\([^()]*\\))*\\)|$Ident)(?:\\s+AS\\b)?(?:\\s+(?!ON\\b)(\\w+))?""" +
      """\s+ON\s+(.+?)\s+(WHEN\s+(?:MATCHED|NOT\s+MATCHED)\b[\s\S]+?)\s*;?\s*$""").r
  private val MatchedUpdateRe =
    """(?is)^MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*$""".r
  private val MatchedDeleteRe =
    """(?is)^MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*$""".r
  private val NotMatchedInsertRe =
    """(?is)^NOT\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT\s+\*\s*$""".r
  private val BySourceUpdateRe =
    """(?is)^NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*$""".r
  private val BySourceDeleteRe =
    """(?is)^NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*$""".r
  private val PathIdent = """(?is)^txnlog\.`([^`]+)`\s*$""".r
  private[sources] val OnKeyRe =
    """(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r
  private val AssignRe = """(?s)^\s*([\w.]+)\s*=\s*(.+?)\s*$""".r

  private[graft] def parseDml(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case DeleteRe(tbl, where) =>
        Some(TxnLogDeleteCommand(tbl, Option(where),
          () => delegate.parsePlan(sqlText)))
      case OptimizeRe(tbl, a, b) =>
        Some(TxnLogOptimizeCommand(tbl,
          (Option(a), Option(b)) match {
            case (Some(x), Some(y)) => Some((x, y))
            case _                  => None
          }))
      case VacuumRe(tbl, hours) =>
        Some(TxnLogVacuumCommand(tbl, Option(hours).map(_.toLong)))
      case HistoryRe(tbl, limit) =>
        Some(TxnLogHistoryCommand(tbl, Option(limit).map(_.toInt)))
      case MergeRe(tbl, tAlias, src, sAlias, onCond, whenText) =>
        Some(TxnLogMergeCommand(tbl, Option(tAlias), src.trim,
          Option(sAlias), onCond.trim, parseWhenClauses(whenText),
          () => delegate.parsePlan(sqlText)))
      case _ => None
    }

  /** One WHEN clause as raw text pieces: (kind, condition,
    * assignment list) — resolved against the live frames at run. */
  private[sources] final case class ClauseText(kind: String,
      cond: Option[String], sets: Seq[(String, String)])

  private def parseWhenClauses(whenText: String): Seq[ClauseText] = {
    // split only at clause STARTS — a CASE WHEN inside a condition or
    // SET expression is not a clause boundary
    val pieces = whenText
      .split("""(?i)\bWHEN\b(?=\s+(?:MATCHED\b|NOT\s+MATCHED\b))""")
      .map(_.trim).filter(_.nonEmpty)
    require(pieces.nonEmpty, "MERGE needs at least one WHEN clause")
    pieces.toSeq.map {
      case MatchedUpdateRe(cond, sets) =>
        ClauseText("update", Option(cond).map(_.trim),
          splitTopLevel(sets, ',').map {
            case AssignRe(col, rhs) =>
              // the left side may be alias-qualified: strip it
              (col.split('.').last, rhs)
            case bad => throw new IllegalArgumentException(
              s"cannot parse SET assignment: $bad")
          })
      case MatchedDeleteRe(cond) =>
        ClauseText("delete", Option(cond).map(_.trim), Nil)
      // BY SOURCE forms before the plain NOT MATCHED insert
      case BySourceUpdateRe(cond, sets) =>
        ClauseText("bysource_update", Option(cond).map(_.trim),
          splitTopLevel(sets, ',').map {
            case AssignRe(col, rhs) => (col.split('.').last, rhs)
            case bad => throw new IllegalArgumentException(
              s"cannot parse SET assignment: $bad")
          })
      case BySourceDeleteRe(cond) =>
        ClauseText("bysource_delete", Option(cond).map(_.trim), Nil)
      case NotMatchedInsertRe(cond) =>
        ClauseText("insert", Option(cond).map(_.trim), Nil)
      case bad => throw new IllegalArgumentException(
        s"cannot parse MERGE clause: WHEN $bad (supported: " +
          "WHEN MATCHED [AND c] THEN UPDATE SET a = e, ... | " +
          "WHEN MATCHED [AND c] THEN DELETE | " +
          "WHEN NOT MATCHED [AND c] THEN INSERT * | " +
          "WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | " +
          "WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE)")
    }
  }

  /** Split on `sep` at parenthesis/quote depth zero. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQuote = false; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '\'' => inQuote = !inQuote
      case '(' if !inQuote => depth += 1
      case ')' if !inQuote => depth -= 1
      case c if c == sep && depth == 0 && !inQuote =>
        out += s.substring(start, i); start = i + 1
      case _ => ()
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Resolve a DML target when it IS ours: a `txnlog.\`/path\``
    * literal, or a catalog table whose provider is txnlog. None for
    * anything else (unknown names, temp views, other providers) — the
    * caller hands those statements back to Spark's native DML path,
    * so v2 catalogs keep working in sessions with this parser. */
  private[sources] def tryResolveTable(spark: SparkSession,
      ident: String): Option[TxnLog.Table] =
    ident.trim match {
      case PathIdent(p) => Some(TxnLog.Table(TxnLog.pathOf(p)))
      case name =>
        val tid = spark.sessionState.sqlParser
          .parseMultipartIdentifier(name) match {
          case Seq(tb)     => Some(TableIdentifier(tb))
          case Seq(db, tb) => Some(TableIdentifier(tb, Some(db)))
          case _           => None
        }
        for {
          id <- tid
          meta <- scala.util.Try(
            spark.sessionState.catalog.getTableMetadata(id)).toOption
          if meta.provider.exists(_.equalsIgnoreCase("txnlog"))
          path <- meta.storage.properties.get("path")
            .orElse(meta.storage.locationUri.map(_.getPath))
        } yield TxnLog.Table(TxnLog.pathOf(path))
    }

  /** [[tryResolveTable]] that refuses instead of deferring — for the
    * statements only this library defines (OPTIMIZE/VACUUM/DESCRIBE
    * HISTORY), where there is no native path to fall back to. */
  private[sources] def resolveTable(spark: SparkSession,
                                    ident: String): TxnLog.Table =
    tryResolveTable(spark, ident).getOrElse(
      throw new IllegalArgumentException(
        s"$ident is not a txnlog table; this statement applies to " +
          "USING txnlog tables or txnlog.`/path` targets"))

  /** A MERGE source: `txnlog.\`/path\``, a (subquery), or any
    * catalog/temp-view name. */
  private[sources] def resolveSource(spark: SparkSession,
                                     src: String): DataFrame =
    src.trim match {
      case PathIdent(p) =>
        TxnLog.read(spark, TxnLog.Table(TxnLog.pathOf(p)))
      case s if s.startsWith("(") && s.endsWith(")") =>
        spark.sql(s.substring(1, s.length - 1))
      case name => spark.table(name)
    }
}

/** `DELETE FROM <txnlog table> [WHERE cond]` → [[TxnLog.delete]]
  * (no WHERE = delete everything, the SQL contract). */
final case class TxnLogDeleteCommand(table: String,
    where: Option[String],
    native: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.tryResolveTable(spark, table) match {
      case Some(t) =>
        TxnLog.delete(spark, t, where.map(expr).getOrElse(lit(true)))
        Seq.empty
      case None => // not ours: run Spark's own DELETE plan (v2 tables)
        org.apache.spark.sql.graftshim.Shim
          .ofRows(spark, native()).collect().toSeq
    }
}

/** `OPTIMIZE <table> [ZORDER BY (a, b)]` → [[TxnLog.compact]] /
  * [[TxnLog.compactZorder]]. */
final case class TxnLogOptimizeCommand(table: String,
    zorder: Option[(String, String)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(spark, table)
    zorder match {
      case Some((a, b)) => TxnLog.compactZorder(spark, t, a, b)
      case None         => TxnLog.compact(spark, t)
    }
    Seq.empty
  }
}

/** `VACUUM <table> [RETAIN n HOURS]` → [[TxnLog.vacuum]] with the
  * retention window as the staging grace. */
final case class TxnLogVacuumCommand(table: String,
    retainHours: Option[Long]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(spark, table)
    TxnLog.vacuum(t,
      retainHours.map(_ * 3600L * 1000L).getOrElse(TxnLog.VacuumGraceMs))
    Seq.empty
  }
}

/** `DESCRIBE HISTORY <table> [LIMIT n]` → [[TxnLog.history]]: the
  * audit surface as a result set (version, operation, adds, removes,
  * change files), newest-n bounded with LIMIT. */
final case class TxnLogHistoryCommand(table: String,
    limit: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      org.apache.spark.sql.types.StructType.fromDDL(
        "version BIGINT, operation STRING, n_adds BIGINT, " +
          "n_removes BIGINT, n_cdc BIGINT"))
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(spark, table)
    TxnLog.history(t, limit.getOrElse(Int.MaxValue)).map {
      case (v, op, a, r, c) => Row(v, op, a, r, c)
    }
  }
}

/** `MERGE INTO tgt t USING src s ON t.k = s.k [AND t.k2 = s.k2 ...]
  * WHEN ...` → [[TxnLog.mergeIntoKeys]] with the SQL aliases as the
  * clause qualifiers. The ON condition must be an equi conjunction
  * with the same column name on both sides of every term — the
  * (composite) key the Scala API merges on. */
final case class TxnLogMergeCommand(table: String,
    tAlias: Option[String], source: String, sAlias: Option[String],
    onCond: String,
    clauses: Seq[GraftSqlParser.ClauseText],
    native: () => LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.tryResolveTable(spark, table).getOrElse {
      // not ours: run Spark's own MERGE plan (v2 tables)
      return org.apache.spark.sql.graftshim.Shim
        .ofRows(spark, native()).collect().toSeq
    }
    val src = GraftSqlParser.resolveSource(spark, source)
    val ta = tAlias.getOrElse("t")
    val sa = sAlias.getOrElse("s")
    // ON is an equi conjunction: t.a = s.a [AND t.b = s.b ...] with
    // the same column name on both sides of every conjunct
    val keys = onCond.split("""(?i)\bAND\b""").toSeq.map {
      case GraftSqlParser.OnKeyRe(q1, c1, q2, c2)
        if c1 == c2 && Set(q1, q2) == Set(ta, sa) => c1
      case other => throw new IllegalArgumentException(
        s"MERGE ON must be a conjunction of $ta.<col> = $sa.<col> " +
          s"terms with the same column name on both sides, got: $other")
    }
    val mcs = clauses.map {
      case GraftSqlParser.ClauseText("update", cond, sets) =>
        TxnLog.MergeClause.Update(cond.map(expr),
          sets.map { case (c, rhs) => c -> expr(rhs) }.toMap)
      case GraftSqlParser.ClauseText("delete", cond, _) =>
        TxnLog.MergeClause.Delete(cond.map(expr))
      case GraftSqlParser.ClauseText("bysource_update", cond, sets) =>
        TxnLog.MergeClause.BySourceUpdate(cond.map(expr),
          sets.map { case (c, rhs) => c -> expr(rhs) }.toMap)
      case GraftSqlParser.ClauseText("bysource_delete", cond, _) =>
        TxnLog.MergeClause.BySourceDelete(cond.map(expr))
      case GraftSqlParser.ClauseText(_, cond, _) =>
        TxnLog.MergeClause.Insert(cond.map(expr))
    }
    TxnLog.mergeIntoKeys(spark, t, src, keys, mcs,
      targetAlias = ta, sourceAlias = sa)
    Seq.empty
  }
}
