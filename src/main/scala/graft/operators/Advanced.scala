package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Advanced relational patterns (SURVEY.md §2): as-of join, skew-salted
  * join, distinct-cardinality aggregates.
  *
  * asOfJoin deliberately stays at tier (a) of the custom-operator
  * ladder (compose built-ins): union + last_value-over-window expresses
  * as-of semantics in ONE shuffle on (key), versus the naive
  * range-join that explodes to pairs. A custom SparkPlan would buy
  * nothing here — the window already streams each key group once in
  * ts order.
  */
object Advanced {

  /** For each purchase event, the user's most recent strictly-prior
    * click (an as-of backward join, the time-series primitive Spark
    * has no native operator for). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_us",
        last(when(col("event_type") === "click", col("ts_us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_click_us"))
      .orderBy(col("event_id"))
  }

  /** The same as-of semantics through the CUSTOM Catalyst operator
    * (graft.plans.AsofJoin — LogicalPlan + Strategy + SparkPlan,
    * tier (c)): purchases as-of-joined to the latest click at or
    * before the purchase time, carrying the matched click's id AND
    * timestamp — the whole-row carry the window formulation cannot do
    * without one extra last_value per column. Inclusive (<=) backward
    * semantics; ties on click time resolved to the largest click_id
    * via the exec's right-side tiebreak ordering. */
  def asofCustom(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_ts"))
    graft.plans.AsofJoin.asof(purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTime = "ts_us", rightTime = "c_ts",
        rightTiebreaks = Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("c_ts").as("last_click_us"), col("click_id").as("last_click_id"))
      .orderBy(col("event_id"))
  }

  /** Salted join: spreads each DETECTED hot key over `salt` subkeys.
    * Hot keys are found by sampling the fact (left) side; only rows
    * whose key is in the sampled heavy-hitter set get a
    * random-but-deterministic salt from their row identity, and only
    * the matching build-side rows are replicated across the `salt`
    * subkeys. The cold majority flows through with salt 0 — ZERO
    * replication — so total shuffle volume is the plain join plus
    * (salt−1)× the hot build rows, not (salt)× the whole build table.
    * Result is provably identical to the plain join — the oracle IS
    * the plain join. At 100 TB this is the remedy when one orderkey
    * holds 10^9 rows and AQE's skew split cannot help (e.g. pre-AQE
    * stages or aggregations keyed on the hot column).
    *
    * The hot-key set is small BY CONSTRUCTION (at most
    * sampledRows/threshold keys can exceed the threshold), so its
    * broadcast is SF-safe — unlike broadcasting an SF-proportional
    * aggregate. Which keys the sample classifies hot only affects the
    * plan, never the result. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int, sampleFraction: Double = 0.05,
      hotRowThreshold: Long = 1000L): DataFrame = {
    val (saltedL, saltedR) = saltedSides(
      left, right, key, salt, sampleFraction, hotRowThreshold)
    saltedL.join(saltedR, Seq(key, "_salt")).drop("_salt")
  }

  /** The two salted join inputs, exposed so specs can assert the
    * replication bound directly: with no hot keys the right side has
    * exactly right.count rows; with h hot build rows it has
    * right.count + (salt−1)·h. */
  def saltedSides(left: DataFrame, right: DataFrame, key: String,
      salt: Int, sampleFraction: Double, hotRowThreshold: Long)
      : (DataFrame, DataFrame) = {
    // A key is hot if its sampled row count projects above the
    // threshold. Seeded sample → reproducible plan; correctness does
    // not depend on the classification.
    val sampledThreshold =
      math.max(1L, math.round(hotRowThreshold * sampleFraction))
    val hot = left.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 7L)
      .groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= sampledThreshold)
      .select(col(key), lit(1).as("_hot"))
    // Single pass per side: broadcast the (small) hot set, salt hot
    // rows, send cold rows to subkey 0.
    val saltedL = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
          pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt.toLong)))
        .otherwise(lit(0L)))
      .drop("_hot")
    val saltedR = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", explode(when(col("_hot").isNotNull,
          sequence(lit(0L), lit(salt.toLong - 1L)))
        .otherwise(array(lit(0L)))))
      .drop("_hot")
    (saltedL, saltedR)
  }

  /** lineitem joined to orders through the salted path, aggregated per
    * priority — must equal the unsalted join bit-for-bit. */
  def skewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    saltedJoin(l, o, "k", salt = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** Interval (range) join, batch twin of the streaming
    * purchase-click join: each purchase joined to the same user's
    * clicks within the preceding hour. Expressed as an EQUI-join on
    * user_id with the time window as a post-join predicate, so
    * Catalyst plans a sort-merge join on the high-cardinality key
    * instead of a nested-loop range join — the shape that scales:
    * per-user click counts are bounded, so the joined intermediate is
    * proportional to output, not |purchases|x|clicks|. */
  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("c_ts"))
    val hourUs = 3600L * 1000000L
    purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") >= col("p_ts") - hourUs && col("c_ts") < col("p_ts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"),
        min(col("click_id")).as("first_click"),
        max(col("click_id")).as("last_click"))
      .orderBy(col("purchase_id"))
  }

  /** Exact distinct cardinalities per event type — the shuffle-dedup
    * aggregate. (The HLL approx_count_distinct variant is spec-tested
    * for error bounds; approximate values cannot hash-match an exact
    * oracle.) */
  def distinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
}
