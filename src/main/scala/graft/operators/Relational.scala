package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational / MapReduce-equivalent core (SURVEY.md §2).
  *
  * Each query re-expresses a Hadoop MapReduce pattern Spark-first:
  * the map→combine→partition→shuffle→sort→reduce pipeline of the
  * reference (the vendored tree ships common/hdfs/yarn — the
  * processing model they serve; its package index at
  * /root/reference/README.txt:26 lists hadoop-mapreduce-project)
  * becomes a declarative plan Catalyst optimizes: partial
  * (map-side) aggregation replaces combiners, broadcast hash joins
  * replace map-side replicated joins, shuffle hash/sort-merge joins
  * replace reduce-side joins, range partitioning replaces
  * TotalOrderPartitioner (TeraSort), windows replace secondary sort.
  *
  * Determinism conventions (driver oracle hash-compares vs DuckDB):
  *  - money is aggregated in exact integer cents (`cents`,
  *    `centsX100`) — no floating-point sum-order sensitivity;
  *  - every result has a total ORDER BY with a unique tiebreaker;
  *  - timestamps are emitted as formatted strings;
  *  - any emitted double is produced by an identical IEEE expression
  *    in the oracle SQL (same ops, same order).
  */
object Relational {

  /** Exact integer cents: round(x*100) as long. Mirror in SQL as
    * CAST(round(x*100) AS BIGINT). */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** Discount as exact integer percent. */
  private def pct(c: Column): Column = round(c * 100).cast("long")
  private def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** TPC-H Q1 shape: scan-heavy groupBy agg. [MR: combiner + reduce —
    * partial_sum runs map-side, final merge reduce-side; visible as
    * HashAggregate(partial)→Exchange→HashAggregate(final).] */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("sum_disc_x10000"),
        count(lit(1)).as("cnt"),
        (sum(col("l_quantity")).cast("long").cast("double") / count(lit(1)))
          .as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Map-only job: filter + project, both pushed to the parquet scan
    * (PushedFilters + ReadSchema prune I/O — at 100 TB this is the
    * difference between reading 2 columns and reading 11). */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-04-01").cast("timestamp") &&
              col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"),
        dateStr(col("l_shipdate")).as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q3 shape: selective dim ⋈ fact ⋈ fact + top-k.
    * customer is SF-proportional (150k rows/SF — 10⁸+ at the 100 TB
    * target), so it carries NO broadcast hint: AQE picks broadcast
    * at small SF and a shuffled join once the side outgrows the
    * threshold. orders⋈lineitem shuffles on orderkey. Top-10 via
    * TakeOrderedAndProject — no global sort. */
  def q3TopRevenue(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice")) *
             (lit(100L) - pct(col("l_discount")))).as("revenue_x10000"))
      .select(col("l_orderkey"), col("revenue_x10000"),
        dateStr(col("o_orderdate")).as("order_date"))
      .orderBy(col("revenue_x10000").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4 shape: EXISTS → left-semi join (no row duplication,
    * build side only keeps keys). [MR: reduce-side semi-join.] */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-07-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5 shape: 6-table join. Only the CONSTANT-size dims
    * (region = 5 rows, nation = 25 rows, any SF) are force-broadcast
    * [MR: map-side replicated join / distributed cache — only ever
    * for genuinely small sides]. supplier and customer grow linearly
    * with SF (10⁸–10⁹ rows at the 100 TB target), so they carry no
    * hint: AQE broadcasts them at small SF and shuffles at scale.
    * The fact-fact orders⋈lineitem join shuffles once on orderkey. */
  def q5NationRevenue(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c,
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice")) *
             (lit(100L) - pct(col("l_discount")))).as("revenue_x10000"))
      .orderBy(col("revenue_x10000").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: selective scan + single global agg [MR: map +
    * one reducer; here partial aggs mean the "reducer" sees one row
    * per partition, not the data]. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              pct(col("l_discount")).between(2, 4) &&
              col("l_quantity") < 25)
      .agg(sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
        .as("revenue_x10000"),
        count(lit(1)).as("n_rows"))

  /** DISTINCT = shuffle-dedup [MR: identity mapper + identity reducer
    * keyed on the full record]. */
  def q7DistinctParts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .orderBy(col("l_partkey"), col("l_suppkey"))

  /** Global top-k WITHOUT a global sort: TakeOrderedAndProject keeps
    * k rows per partition then merges [MR: per-mapper heap + single
    * reduce merge]. At 100 TB a full sort here would be the bug. */
  def q8TopkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"),
        col("o_orderpriority"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(15)

  /** Total-order sort via range partitioning (sampled bounds) — the
    * TeraSort pattern [MR: TotalOrderPartitioner + sampler]. Output
    * stays distributed; coalescing to one file is the writer's
    * choice, not the sort's. */
  def q9GlobalSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(dateStr(col("l_shipdate")).as("ship_date"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
      .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"))

  /** Secondary sort: per-key ordered values via a window [MR:
    * composite key + grouping comparator + value-ordered reduce]. */
  def q10SecondarySort(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        dateStr(col("o_orderdate")).as("order_date"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank() within groups; top-3 per nation. */
  def q11WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("c_custkey"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("rnk"))
      .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
  }

  /** ROLLUP multi-level agg — one shuffle produces all grouping sets
    * [MR: would be 3 separate jobs or a multi-output reducer]. */
  def q12RollupRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_base_cents"), col("cnt"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** TPC-H Q13 shape: outer join keeping empty groups + second agg.
    * [MR: outer reduce-side join + follow-up count job.] */
  def q13CustOrderCounts(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** GROUP BY + HAVING — the filter runs post-aggregate, after the
    * map-side partials merged. */
  def q14Having(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("cnt") >= 45)
      .orderBy(col("l_partkey"))

  /** UNION ALL of two inputs + agg [MR: MultipleInputs job]. */
  def q15UnionCounts(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_nationkey").cast("int").as("nationkey"),
        lit("customer").as("kind"))
    val sup = Tables.supplier(s, d)
      .select(col("s_nationkey").cast("int").as("nationkey"),
        lit("supplier").as("kind"))
    c.unionAll(sup)
      .groupBy(col("nationkey"), col("kind"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("nationkey"), col("kind"))
  }

  /** NOT EXISTS → left-anti join: customers with no very large order. */
  def q16AntiJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000.0).select(col("o_custkey"))
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** TPC-H Q17 shape: per-group average as a filter. The boundary
    * predicate is kept in exact integer arithmetic
    * (2*qty*cnt < sum  ⟺  qty < 0.5*avg) so no float compare can
    * disagree with the oracle. Expressed as a WINDOW over l_partkey —
    * one shuffle, no join, no broadcast: the per-part aggregate has
    * one row per distinct partkey, which grows linearly with SF
    * (~2B keys at 100 TB), so a broadcast of it would OOM the driver
    * long before the target scale. */
  def q17SmallQtyParts(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val w = Window.partitionBy(col("l_partkey"))
    l.withColumn("qty_sum", sum(col("l_quantity")).over(w).cast("long"))
      .withColumn("qty_cnt", count(lit(1)).over(w))
      .filter(col("l_quantity").cast("long") * 2 * col("qty_cnt") < col("qty_sum"))
      .agg(sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q18 shape: agg → filter → join back to facts. No forced
    * broadcast: the `sum_qty > 300` key set grows linearly with SF, so
    * a broadcast hint is a driver OOM at 100×. AQE picks the strategy
    * at runtime — broadcast when the filtered set is actually small,
    * shuffle join when it is not. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val bigOrders = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        dateStr(col("o_orderdate")).as("order_date"),
        cents(col("o_totalprice")).as("total_cents"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** Event-time tumbling window agg (batch twin of the Structured
    * Streaming job in graft.streaming.EventStreams). */
  def q19EventWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy(col("hour"), col("event_type"))

  /** Pivot via conditional aggregation — one shuffle, no per-column
    * jobs. */
  def q20PivotEvents(s: SparkSession, d: String): DataFrame = {
    def cnt(t: String) =
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"),
        cnt("error"),
        sum(when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(0L)).as("purchase_cents"))
      .orderBy(col("user_id"))
  }

  /** Sessionization: 30-min-gap sessions per user via lag window
    * [MR: secondary sort on (user, ts) + stateful reduce]. */
  def q21Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
          1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Semi-structured extraction: events.props is a JSON string; parse
    * a field and aggregate. [MR: custom RecordReader + map parse; here
    * a codegen'd JSON path expression at the scan.] */
  def q23JsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Running total per customer (RANGE-free ROWS frame): the
    * cumulative-reduce pattern secondary sort enabled in MR. */
  def q24RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("total_cents", cents(col("o_totalprice")))
      .withColumn("running_cents", sum(col("total_cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("total_cents"),
        col("running_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated median per group, computed as a DISTRIBUTED
    * value histogram instead of `percentile()`: the builtin buffers
    * one (value -> count) map PER GROUP inside a single aggregation
    * buffer, so with 3 return flags the entire value distribution of a
    * 100 TB lineitem funnels through 3 reducer buffers. Here the
    * histogram itself is the shuffled relation — groupBy (flag,
    * metric, value) distributes over the full value domain, the
    * cumulative rank is a window over histogram ROWS (distinct values,
    * orders of magnitude fewer than input rows, spillable sort), and
    * the two bracketing values at rank 0.5*(n-1) are picked by range
    * predicates on the cumulative counts.
    *
    * Interpolation mirrors Spark's own Percentile (and DuckDB median):
    * lo + (hi - lo) * (r - floor(r)) in IEEE double, so the result is
    * bit-identical to both engines' builtins — the oracle hash-match
    * proves it. One scan (explode, not self-union) feeds both
    * metrics. */
  def q25Median(s: SparkSession, d: String): DataFrame = {
    val vals = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), explode(array(
        struct(lit("qty").as("metric"),
          col("l_quantity").cast("double").as("v")),
        struct(lit("price").as("metric"),
          col("l_extendedprice").cast("double").as("v")))).as("mv"))
      .select(col("flag"), col("mv.metric").as("metric"), col("mv.v").as("v"))
      .filter(col("v").isNotNull) // percentile() semantics: nulls ignored
    val hist = vals.groupBy(col("flag"), col("metric"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("flag"), col("metric")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("flag"), col("metric"))
    // value row covers sorted positions [cum - c, cum - 1] (0-indexed)
    val ranked = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("r", expr("0.5 * cast(n - 1 as double)"))
      .withColumn("k", floor(col("r")))
    // both bracketing values picked in ONE pass over the histogram (a
    // lo/hi self-join would evaluate the whole subtree twice)
    val med = ranked
      .filter(col("cum") - col("c") <= col("k") + 1 &&
        col("k") <= col("cum") - 1)
      .groupBy(col("flag"), col("metric"))
      .agg(
        max(when(col("cum") - col("c") <= col("k") &&
          col("k") <= col("cum") - 1, col("v"))).as("lo"),
        max(when(col("cum") - col("c") <= col("k") + 1 &&
          col("k") + 1 <= col("cum") - 1, col("v"))).as("hi"),
        max(col("r")).as("r"), max(col("k")).as("k"), max(col("n")).as("n"))
      .withColumn("m", when(col("r") === col("k").cast("double"), col("lo"))
        .otherwise(col("lo") +
          (col("hi") - col("lo")) * (col("r") - col("k").cast("double"))))
    med.groupBy(col("flag"))
      .agg(max(when(col("metric") === "qty", col("m"))).as("median_qty"),
        max(when(col("metric") === "price", col("m"))).as("median_price"),
        max(when(col("metric") === "qty", col("n"))).as("cnt"))
      .select(col("flag").as("l_returnflag"), col("median_qty"),
        col("median_price"), col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** FULL OUTER join — the one join shape q4 (semi), q13 (left
    * outer), and q16 (anti) left uncovered: per-nation customer
    * aggregates against supplier aggregates, preserving nations that
    * have only one side (at small SF most nations have customers but
    * no suppliers). Both inputs pre-aggregate BEFORE the join, so the
    * outer join runs on nation-scale relations — the
    * aggregate-then-join shape that keeps outer joins cheap at 100 TB
    * (joining the raw tables first would carry every row through the
    * join only to collapse them after). */
  def q29FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(cents(col("c_acctbal"))).as("cust_acct_cents"))
    val su = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("cust_acct_cents"), lit(0L)).as("cust_acct_cents"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** RANGE-frame window — the frame semantics q24's ROWS frame can't
    * express: a trailing 7-DAY spend per customer, where the frame
    * bounds follow the ORDER-BY VALUE (days), not row positions, so
    * same-day orders all see the same window and gaps in the calendar
    * shrink it. One customer-keyed shuffle; frame evaluation streams
    * each partition once. */
  def q30RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"))
      .rangeBetween(-6, 0)
    Tables.orders(s, d)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01"))
        .cast("long"))
      .withColumn("total_cents", cents(col("o_totalprice")))
      .withColumn("trailing7d_cents", sum(col("total_cents")).over(w))
      .withColumn("trailing7d_orders", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        col("total_cents"), col("trailing7d_cents"),
        col("trailing7d_orders"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  /** Ranking-family coverage beyond row_number/rank: decile buckets
    * over the global spend distribution via ntile(10) (deterministic
    * because the ORDER BY carries a unique tiebreak), aggregated to
    * one row per decile. The global sort is a single range-partitioned
    * exchange — at 100 TB you'd compute approximate decile BOUNDARIES
    * from a sample instead of a full sort; this is the exact form the
    * sample-based one is validated against. */
  def q31Deciles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("total_cents", cents(col("o_totalprice")))
      .withColumn("decile", ntile(10).over(
        Window.orderBy(col("total_cents"), col("o_orderkey"))).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("total_cents")).as("min_cents"),
        max(col("total_cents")).as("max_cents"),
        sum(col("total_cents")).as("sum_cents"))
      .orderBy(col("decile"))

  /** q31's 100 TB form — SAMPLED-boundary deciles (the executable
    * variant of the scale note on [[q31Deciles]]): decile boundaries
    * come from a deterministic hash sample (md5-fold mod m, the
    * oracle-mirrorable stand-in for TeraSort's InputSampler /
    * Spark's RangePartitioner reservoir), so the FULL data is never
    * globally sorted — the only total-order sort in the plan is over
    * the sample, and the sample is ROW-BUDGETED, not rate-bounded:
    * one cheap count() sets the modulus m = max(20, ceil(n /
    * [[Q36SampleBudget]])), i.e. rate = min(5%, budget/n), exactly
    * the numSamples cap of the reference's partition-file sampler
    * (hadoop-common/.../mapreduce/lib/partition/InputSampler.java:1).
    * At the test SFs m stays 20 (identical results); at 100 TB the
    * single ordered-ntile task holds ~budget rows, never terabytes.
    * The 9 boundary values collapse to ONE array row, broadcast, and
    * every row buckets map-side by counting boundaries below it —
    * rows tied with a boundary go to the lower bucket, so membership
    * is deterministic on both engines. Bucket sizes are approximate
    * (that is the trade); RelationalSpec bounds the skew vs the
    * exact q31 form and PlansSpec pins that no full-data global sort
    * survives. */
  val Q36SampleBudget = 100000L

  /** max(20, ceil(n/budget)) — integer-exact, mirrored in the oracle
    * as greatest(20, (n + budget - 1) // budget). */
  private[graft] def q36Modulus(n: Long): Long =
    math.max(20L, (n + Q36SampleBudget - 1) / Q36SampleBudget)

  def q36SampledDeciles(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
    val m = q36Modulus(o.count())
    val samp = o.filter(
      graft.functions.RollingHash.rollingHash(
        md5(concat(lit("dec-"), col("o_orderkey").cast("string"))
          .cast("binary"))) % m === 0)
    val bounds = samp
      .withColumn("tile", ntile(10).over(
        Window.orderBy(col("total_cents"), col("o_orderkey"))))
      .filter(col("tile") < 10)
      .groupBy(col("tile")).agg(max(col("total_cents")).as("b"))
      .agg(array_sort(collect_list(col("b"))).as("bs"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(
        "1 + aggregate(bs, 0L, (acc, b) -> acc + IF(total_cents > b, 1L, 0L))"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("total_cents")).as("min_cents"),
        max(col("total_cents")).as("max_cents"),
        sum(col("total_cents")).as("sum_cents"))
      .orderBy(col("bucket"))
  }

  /** The SQL-surface twin of q1: the identical query through
    * `spark.sql` over a registered view — parser → analyzer →
    * the same Catalyst plan, proving the TEXT interface reaches full
    * parity with the DataFrame one (the reference world's users
    * arrive via SQL strings as often as via APIs). Must stay
    * bit-identical to q1_pricing_summary AND the oracle. */
  def sqlPricingSummary(s: SparkSession, d: String): DataFrame = {
    val v = viewFor("graft_lineitem", Tables.lineitem(s, d), d)
    s.sql(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          AS sum_base_cents,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
            (100 - CAST(round(l_discount * 100) AS BIGINT)))
          AS sum_disc_x10000,
        count(*) AS cnt,
        CAST(CAST(sum(l_quantity) AS BIGINT) AS DOUBLE) / count(*)
          AS avg_qty
      FROM $v
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  }

  /** SLIDING (hopping) event windows — 1-hour windows every 30
    * minutes, so each event lands in exactly two windows (q19 is the
    * tumbling special case). Spark's `window()` generates the window
    * memberships row-locally before the one aggregate shuffle; the
    * oracle enumerates the same two hop-aligned starts per event. */
  def q32SlidingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm")
        .as("win_start"), col("event_type"), col("n"), col("value_cents"))
      .orderBy(col("win_start"), col("event_type"))

  /** Full quantile profile (p25/p50/p75/p95) per group through the
    * SAME distributed histogram as q25 — built once, probed for every
    * quantile via a constant 4-row broadcast (contrast percentile(
    * array(...)), which still buffers the whole per-group value map in
    * one aggregation buffer). r = q·(n−1) and the lo/hi interpolation
    * are the identical IEEE doubles DuckDB's quantile_cont computes,
    * non-dyadic q included, so all four quantiles hash-match. (The
    * interpolation mirrors quantile_cont's literal form, (ceil(r)−r)·lo
    * + (r−floor(r))·hi — algebraically equal to q25's lo+(hi−lo)·frac
    * but NOT bit-equal for every frac, as a one-ulp p75 mismatch
    * proved.) */
  def q28Quantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("flag"), col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("flag")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("flag"))
    val qdf = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95))
      .toDF("q_label", "q")
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .crossJoin(broadcast(qdf)) // constant-size at any SF
      .withColumn("r", expr("q * cast(n - 1 as double)"))
      .withColumn("k", floor(col("r")))
      .filter(col("cum") - col("c") <= col("k") + 1 &&
        col("k") <= col("cum") - 1)
      .groupBy(col("flag"), col("q_label"))
      .agg(
        max(when(col("cum") - col("c") <= col("k") &&
          col("k") <= col("cum") - 1, col("v"))).as("lo"),
        max(when(col("cum") - col("c") <= col("k") + 1 &&
          col("k") + 1 <= col("cum") - 1, col("v"))).as("hi"),
        max(col("r")).as("r"), max(col("k")).as("k"))
      .withColumn("value", when(col("r") === col("k").cast("double"),
        col("lo")).otherwise(expr(
          "(cast(ceil(r) as double) - r) * lo + (r - cast(k as double)) * hi")))
      .select(col("flag").as("l_returnflag"), col("q_label"), col("value"))
      .orderBy(col("l_returnflag"), col("q_label"))
  }

  /** Correlated min-per-group (TPC-H Q2 shape): cheapest lineitem per
    * part, resolved as a window min rather than a correlated
    * re-scan — one shuffle instead of a per-row subquery. */
  def q26MinPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .withColumn("min_price_cents", min(cents(col("l_extendedprice"))).over(w))
      .filter(cents(col("l_extendedprice")) === col("min_price_cents"))
      .groupBy(col("l_partkey"))
      // a part's minimum may be hit by several lines: count them and
      // tiebreak deterministically
      .agg(min(col("l_orderkey")).as("first_orderkey"),
        count(lit(1)).as("n_at_min"),
        min(col("min_price_cents")).as("min_price_cents"))
      .orderBy(col("l_partkey"))
  }

  /** Set operations: suppliers' nations INTERSECT/EXCEPT customers'
    * nations [MR: multi-input jobs with presence flags]. */
  def q27SetOps(s: SparkSession, d: String): DataFrame = {
    val custN = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val supN = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val both = supN.intersect(custN)
      .withColumn("relation", lit("both"))
    val supOnly = supN.except(custN)
      .withColumn("relation", lit("supplier_only"))
    both.unionAll(supOnly)
      .orderBy(col("relation"), col("nationkey"))
  }

  /** CUBE grouping sets over orders. */
  def q22CubeOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("cnt"), col("total_cents"))
      .orderBy(col("status"), col("priority"))

  /** Inter-order gap profile per customer — the lag() window family
    * (q11 covered ranking, q24/q30 frames; this is offset access).
    * gap_i = days between order i and i−1 in (date, orderkey) order;
    * one customer-keyed shuffle, gaps computed row-local within the
    * partition, then the same-keyed aggregate reuses the partitioning
    * (no second exchange). Day arithmetic on DATE-truncated
    * timestamps — integers on both engines. */
  def q33OrderGaps(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("gap_days",
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("gap_days")).as("n_gaps"),
        coalesce(sum(col("gap_days")), lit(0L)).as("sum_gap_days"),
        coalesce(max(col("gap_days")), lit(0L)).as("max_gap_days"))
      .orderBy(col("o_custkey"))
  }

  /** Explicit GROUPING SETS — the shape rollup (q12) and cube (q22)
    * can't express: exactly the two one-dimensional marginals plus the
    * grand total, skipping the (status, priority) cross — through the
    * SQL text interface, like sql_pricing_summary. At scale this is
    * ONE pass with grouping-id expansion (3 copies of each row's
    * grouping columns, partial-aggregated map-side), not three unioned
    * scans. */
  def q34GroupingSets(s: SparkSession, d: String): DataFrame = {
    val v = viewFor("graft_orders_gs", Tables.orders(s, d), d)
    s.sql(s"""
      SELECT coalesce(o_orderstatus, '(all)') AS status,
        coalesce(o_orderpriority, '(all)') AS priority,
        count(*) AS cnt,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
      FROM $v
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  /** Correlated scalar subqueries — orders priced above their
    * priority class's average. The naive form compares against
    * avg(double), whose accumulation order is nondeterministic; this
    * is the exact-integer algebra instead (cents · n > sum_cents), so
    * membership can never flip. Catalyst DECORRELATES the two
    * correlated aggregates into one per-class aggregate joined back
    * (PlansSpec pins: no nested-loop per-row re-scan survives) — at
    * 100 TB the subquery costs one extra class-keyed aggregate, not
    * |orders| re-scans. */
  def q35AboveClassAvg(s: SparkSession, d: String): DataFrame = {
    val v = viewFor("graft_orders_aca", Tables.orders(s, d), d)
    s.sql(s"""
      SELECT o_orderpriority, count(*) AS n_above,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS above_cents
      FROM $v o
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
          (SELECT count(*) FROM $v i
           WHERE i.o_orderpriority = o.o_orderpriority)
        > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
           FROM $v i
           WHERE i.o_orderpriority = o.o_orderpriority)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q2's shape — the correlated subquery q35 lacks: the inner
    * query min-aggregates a DIFFERENT derived relation (the
    * region-scoped offer table built from a 5-table join), correlated
    * on partkey. For each small part, the EUROPE suppliers offering it
    * at that part's minimum price. Catalyst decorrelates the inner min
    * into one part-keyed aggregate joined back (PlansSpec pins no
    * nested loop survives); `offer` is min-per-(part,supplier) so the
    * correlated relation is pair-scale, not lineitem-scale; the
    * region/size filters push into the scans BEFORE the big join.
    * Exact integer cents, ties all emitted — deterministic set. */
  def q37MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val li = viewFor("graft_li_q37", Tables.lineitem(s, d), d)
    val sup = viewFor("graft_sup_q37", Tables.supplier(s, d), d)
    val nat = viewFor("graft_nat_q37", Tables.nation(s, d), d)
    val reg = viewFor("graft_reg_q37", Tables.region(s, d), d)
    val part = viewFor("graft_part_q37", Tables.part(s, d), d)
    s.sql(s"""
      WITH offer AS (
        SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
          min(CAST(round(l.l_extendedprice * 100) AS BIGINT))
            AS price_cents
        FROM $li l
        JOIN $sup s ON l.l_suppkey = s.s_suppkey
        JOIN $nat n ON s.s_nationkey = n.n_nationkey
        JOIN $reg r ON n.n_regionkey = r.r_regionkey
        JOIN $part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'EUROPE' AND p.p_size < 10
        GROUP BY 1, 2)
      SELECT o.partkey, o.suppkey, n2.n_name AS nation, o.price_cents
      FROM offer o
      JOIN $sup s2 ON o.suppkey = s2.s_suppkey
      JOIN $nat n2 ON s2.s_nationkey = n2.n_nationkey
      WHERE o.price_cents = (SELECT min(i.price_cents) FROM offer i
                             WHERE i.partkey = o.partkey)
      ORDER BY o.partkey, o.suppkey""")
  }

  /** TPC-H Q19's shape — DISJUNCTIVE join predicates: the join
    * condition is partkey-equality AND an OR of three
    * (brand, size-range, quantity-range) conjuncts. Catalyst keeps
    * the equi-key for the hash join and extracts the per-side
    * residues of the OR (brand/size union → part scan, quantity
    * union → lineitem scan — PushExtraPredicateThroughJoin), so at
    * 100 TB the scan reads only the qualifying slices instead of
    * filtering after a full-fact join. [MR: a reduce-side join whose
    * mapper-side filters must be hand-derived from the OR.] */
  def q38DisjunctiveJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 20) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 40) &&
          col("l_quantity").between(20, 35))))
      .agg(
        sum(cents(col("l_extendedprice")) *
          (lit(100L) - pct(col("l_discount")))).as("revenue_x10000"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14 shape — promo revenue share: one fact⋈dim join, a
    * conditional and an unconditional aggregate in the same pass,
    * then one scalar division. Both sums are exact integer cents so
    * the final double is a single deterministic IEEE op mirrored in
    * the oracle. part carries no hint (it grows with SF; AQE
    * broadcasts at small SF, shuffles at scale). */
  def q39PromoShare(s: SparkSession, d: String): DataFrame = {
    val term = cents(col("l_extendedprice")) *
      (lit(100L) - pct(col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-10-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", term).otherwise(lit(0L)))
          .as("promo_x10000"),
        sum(term).as("total_x10000"))
      .withColumn("promo_share",
        col("promo_x10000").cast("double") * 100 /
          col("total_x10000").cast("double"))
  }

  /** TPC-H Q15 shape — top supplier via CTE + scalar max: the
    * supplier-keyed revenue aggregate is computed ONCE, its max is a
    * second constant-size aggregate broadcast back as a 1-row join
    * (never a global sort, never a re-scan of the fact). Ties all
    * emitted — deterministic set. */
  def q40TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) *
        (lit(100L) - pct(col("l_discount")))).as("total_x10000"))
    val top = rev.agg(max(col("total_x10000")).as("mx"))
    rev.join(broadcast(top), col("total_x10000") === col("mx"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_x10000"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q10 shape — top customers by returned-item revenue: the
    * returnflag filter pushes into the lineitem scan, the quarter
    * filter into orders, the two facts shuffle-join on orderkey,
    * customer joins un-hinted (AQE), nation (25 rows) broadcasts.
    * Final top-20 is TakeOrderedAndProject — per-partition heaps,
    * never a global sort. */
  def q41ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1997-10-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(cents(col("l_extendedprice")) *
        (lit(100L) - pct(col("l_discount")))).as("revenue_x10000"))
      .orderBy(col("revenue_x10000").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q7 shape — bilateral nation trade volume by year: both
    * nation dims are PRE-FILTERED to the two trading nations before
    * their broadcast joins, so supplier and customer prune to ~2/25
    * of their rows before touching the facts; the cross-pair
    * (supp≠cust) residue filters after. Year emitted as a formatted
    * string (the timestamp convention). */
  def q42NationVolume(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_18", "NATION_19")
    val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        date_format(col("l_shipdate"), "yyyy").as("l_year"))
      .agg(sum(cents(col("l_extendedprice")) *
        (lit(100L) - pct(col("l_discount")))).as("revenue_x10000"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape — market share: one nation's slice of a region's
    * spend on one part type, by order year (nation names in this
    * corpus are synthetic NATION_k). The part-type filter prunes the
    * fact FIRST (the most selective edge), the region gate rides the
    * broadcast nation⋈region dims on the customer side, and the
    * share is a conditional-over-unconditional pair of exact-cents
    * sums divided once. */
  def q43MarketShare(s: SparkSession, d: String): DataFrame = {
    val term = cents(col("l_extendedprice")) *
      (lit(100L) - pct(col("l_discount")))
    val nCust = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_nk"), col("n_regionkey"))
    val nSupp = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_nk"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_nk"))
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_19", term).otherwise(lit(0L)))
          .as("nation_x10000"),
        sum(term).as("total_x10000"))
      .withColumn("mkt_share",
        col("nation_x10000").cast("double") /
          col("total_x10000").cast("double"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q22 shape — dormant rich customers: balance above the
    * positive-balance average AND no orders since 1999. The average
    * compares in exact integer algebra (cents·n > sum_cents —
    * membership can never flip on accumulation order), the
    * threshold is a 1-row broadcast, and the dormancy test is a
    * LEFT ANTI join against the date-pruned orders keys — at 100 TB
    * one customer-scale pass plus one anti-probe, no correlated
    * re-scans. */
  def q44DormantCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val thr = c.filter(col("c_acctbal") > 0.0)
      .agg(count(lit(1)).as("npos"),
        sum(cents(col("c_acctbal"))).as("sum_pos_cents"))
    c.crossJoin(broadcast(thr))
      .filter(cents(col("c_acctbal")) * col("npos") > col("sum_pos_cents"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(cents(col("c_acctbal"))).as("bal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q21's semantics re-expressed Spark-first: suppliers who
    * were the SOLE returner in multi-supplier orders. The classic
    * form is an EXISTS + NOT-EXISTS double self-join on lineitem;
    * here both collapse into ONE order-keyed aggregate —
    * n_supp > 1 ∧ n_fail = 1 identifies the orders and max(CASE)
    * names the culprit — so the fact shuffles once instead of three
    * times. [MR: a three-job chain of reduce-side self-joins.]
    * Top-20 via TakeOrderedAndProject with a unique tiebreak. */
  def q45SoleFailingSupplier(s: SparkSession, d: String): DataFrame = {
    val failSupp = when(col("l_returnflag") === "R", col("l_suppkey"))
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(failSupp).as("n_fail"),
        max(failSupp).as("fail_supp"))
      .filter(col("n_supp") > 1 && col("n_fail") === 1)
      .groupBy(col("fail_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(s, d), col("fail_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** q46 — UNPIVOT, the inverse of q20's pivot: melt three per-row
    * measures into (metric, value) rows with Spark's native unpivot
    * (one Expand node — no self-union, the input is scanned ONCE),
    * then aggregate per (returnflag, metric). The melt triples row
    * count map-locally; the shuffle is the tiny post-aggregate one.
    * Exact integer measures (cents / units / basis points) so the
    * DuckDB UNION-ALL mirror hash-matches. */
  def q46Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 10000).cast("long").as("discount_bp"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("price_cents"), col("qty"), col("discount_bp")),
        "metric", "value")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("metric"))

  /** q47 — the DISTRIBUTION window functions q11/q31 left uncovered:
    * percent_rank and cume_dist of each customer's spend within
    * their nation. Both are exact IEEE divisions of integers
    * ((rank−1)/(n−1), rows≤current/n) over a UNIQUE ordering
    * (spend, custkey), so the doubles hash-match DuckDB bit-for-bit;
    * one customer aggregate + a broadcast dim join + one
    * nation-keyed window. Every nation holds ≥3 customers at every
    * SF, so the (n−1) denominator never degenerates. */
  def q47WindowProfile(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nation"))
      .orderBy(col("spend_cents"), col("cust"))
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("cust"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("spend_cents"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("nation")),
        col("cust") === col("c_custkey"))
      .select(col("nation"), col("cust"), col("spend_cents"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy(col("nation"), col("cust"))
  }

  /** q47's PRODUCTION-SCALE twin — the q36 posture applied to the
    * per-nation spend distribution: q47_window_profile ranks every
    * customer inside a 25-value partitionBy window, so per-task rows
    * grow linearly with customers; this variant never runs a
    * customer-scale window at all. One row-budgeted deterministic
    * hash-sample (the q36 modulus) calibrates ≤3 quartile cutoffs
    * per nation in a SAMPLE-sized window, the ≤25×3 cutoff table
    * broadcasts, and every customer buckets MAP-SIDE — the output is
    * nation×4 rows, not one per customer. The oracle replays the
    * identical sample (rolling-hash of md5, the q36 trick) so the
    * cutoffs — and therefore every bucket count — hash-match
    * exactly. */
  def q47WindowProfileSampled(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("cust"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("nation")),
        col("cust") === col("c_custkey"))
      .select(col("nation"), col("cust"), col("spend_cents"))
    val m = q36Modulus(spend.count())
    val samp = spend.filter(
      graft.functions.RollingHash.rollingHash(
        md5(concat(lit("q47-"), col("cust").cast("string"))
          .cast("binary"))) % m === 0)
    val bounds = samp
      .withColumn("tile", ntile(4).over(Window.partitionBy(col("nation"))
        .orderBy(col("spend_cents"), col("cust"))))
      .filter(col("tile") < 4)
      .groupBy(col("nation"), col("tile"))
      .agg(max(col("spend_cents")).as("b"))
      .groupBy(col("nation"))
      .agg(array_sort(collect_list(col("b"))).as("bs"))
    spend.join(broadcast(bounds), Seq("nation"), "left")
      .withColumn("bucket", expr(
        "1 + aggregate(coalesce(bs, array()), 0L, " +
          "(acc, b) -> acc + IF(spend_cents > b, 1L, 0L))"))
      .groupBy(col("nation"), col("bucket"))
      .agg(count(lit(1)).as("n_cust"),
        min(col("spend_cents")).as("min_cents"),
        max(col("spend_cents")).as("max_cents"),
        sum(col("spend_cents")).as("sum_cents"))
      .orderBy(col("nation"), col("bucket"))
  }

  /** Register `df` under a name unique per (query, input dir), so
    * concurrent runs of the SQL-text queries against DIFFERENT data
    * dirs cannot race on a shared view name (two calls with the same
    * (prefix, dir) re-register an identical frame — benign). */
  private def viewFor(prefix: String, df: DataFrame, d: String): String = {
    val name = prefix + "_" + java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(d.getBytes)
        .getMostSignificantBits & Long.MaxValue)
    df.createOrReplaceTempView(name)
    name
  }
}
