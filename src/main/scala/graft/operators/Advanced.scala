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
    // Materialized ONCE (eager localCheckpoint) so both join sides
    // broadcast the identical classification: if the two subtrees
    // recomputed the sample independently (AQE replan, task retry),
    // a key hot on one side and cold on the other would drop or
    // duplicate join rows.
    val hot = left.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 7L)
      .groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= sampledThreshold)
      .select(col(key), lit(1).as("_hot"))
      .localCheckpoint()
    // Single pass per side: broadcast the (small) hot set, salt hot
    // rows, send cold rows to subkey 0.
    val saltedL = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
          pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salt.toLong)))
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
    * oracle — for the oracle-able sketch see [[hllDistinct]].) */
  def distinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** HLL register count (m) and the CASE chain computing rho = (number
    * of leading zero bits of the remaining 25-bit hash) + 1. The chain
    * is integer comparisons only, so it evaluates identically in Spark
    * and DuckDB — floor(log2(w)) via doubles would be off-by-one near
    * powers of two on some libm implementations. */
  private[graft] val HllM = 64
  private[graft] val rhoCase: String =
    (0 until 25).map(k => s"WHEN _w >= ${1L << (24 - k)} THEN ${k + 1}")
      .mkString("CASE ", " ", " ELSE 26 END")

  /** Distinct users per event type via a DETERMINISTIC HyperLogLog
    * (m=64 registers): hash = md5-fold in [0, 2^31); register = hash
    * mod m; rho = leading-zeros(hash div m)+1; estimate = alpha·m² /
    * Σ 2^(-M_j). The raw-HLL double is bit-reproducible because every
    * term 2^(-M_j) is an exact dyadic (computed as 1.0 / (1L << M_j),
    * never libm pow), their sum fits 53 bits exactly (≤ 26+6), and the
    * final multiply/divide are single exactly-rounded IEEE ops — so an
    * APPROXIMATE sketch still hash-matches its oracle. The sketch
    * state is m registers per group regardless of corpus size: the
    * constant-memory distinct-count the reference world used
    * HyperLogLog for, vs the shuffle-dedup in [[distinctUsers]].
    * Exact counts ride along so the error is visible and spec-bound. */
  def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val h = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        graft.functions.RollingHash.rollingHash(
          md5(concat(lit("hll-"), col("user_id").cast("string"))
            .cast("binary"))).as("hv"))
    val regs = h
      .withColumn("_w", expr(s"hv div $HllM"))
      .groupBy(col("event_type"), expr(s"hv % $HllM").as("reg"))
      .agg(max(expr(rhoCase)).as("mj"))
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr("1.0d / cast(shiftleft(cast(1 as bigint), mj) as double)"))
        .as("sp"), count(lit(1)).as("np"))
      // empty registers contribute 2^0 = 1.0 each
      .withColumn("estimate",
        expr(s"(0.709d * ${HllM * HllM}.0d) / (sp + ($HllM - np) * 1.0d)"))
      // emitted so consumers can apply the standard small-range
      // (linear-counting) correction m·ln(m/V) — ln stays OUT of the
      // query because libm ln is not bit-identical across engines
      .withColumn("n_zero_regs", expr(s"cast($HllM - np as bigint)"))
    val exact = Tables.events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("estimate"), col("n_zero_regs"),
        col("exact_users"))
      .orderBy(col("event_type"))
  }

  /** Latest-record-wins upsert (CDC merge): a deterministic change
    * batch (price-bump updates on keys ≡3 mod 10, inserts in a
    * disjoint key space on keys ≡7 mod 100) merged into the orders
    * snapshot by ONE window over the key — union + row_number(version
    * DESC), the merge-on-read plan. Key-partitioned shuffle only; no
    * broadcast, no driver state; at 100 TB this is exactly the
    * compaction step a merge-tree table format runs. Versions are
    * unique per key by construction, so the survivor — and the hash —
    * is deterministic. */
  def upsert(s: SparkSession, d: String): DataFrame = {
    def snap = Tables.orders(s, d)
    val base = snap.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), lit(1L).as("version"))
    val updates = snap.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 1.1).as("o_totalprice"), lit(2L).as("version"))
    // Insert keys are NEGATED base keys: o_orderkey is a positive
    // surrogate at any SF, so -k is provably disjoint from every
    // base/update key — no collision threshold to outgrow (a fixed
    // +1e9 offset collides once max(orderkey) crosses 1e9, which a
    // 100 TB snapshot does).
    val inserts = snap.filter(col("o_orderkey") % 100 === 7)
      .select((-col("o_orderkey")).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"),
        lit(2L).as("version"))
    base.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderkey"))
        .orderBy(col("version").desc)))
      .filter(col("rn") === 1)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
        sum(col("version")).as("version_sum"))
      .orderBy(col("o_orderstatus"))
  }

  /** Conversion funnel: view → first click after it → first purchase
    * after that, per user; one summary row. Three user-keyed
    * aggregates and two user-keyed joins — every step shuffles on the
    * high-cardinality user key and carries one timestamp per user, so
    * the intermediate is user-scale no matter how many events. The
    * timestamps compare in microseconds on both engines (Spark stores
    * micros; the oracle truncates its nanos with epoch_us). */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  /** Session-level revenue attribution — q21's gap sessions carried
    * one step further into the analytics a session table exists for:
    * the session id is the running count of 30-min-gap breaks (a
    * second window over the SAME (user, ts) sort — no extra
    * shuffle), then one aggregate per (user, session) with per-type
    * conditional sums. Everything rides the single user-keyed
    * exchange. */
  def sessionRevenue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
               1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("revenue_cents"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Time-series resample: per-user purchase stream re-gridded to
    * 1-hour slots over each user's active span, gaps FORWARD-FILLED
    * with the last observed value (the per-slot representative is the
    * latest event by (ts, event_id) — a deterministic tiebreak). The
    * grid explodes from per-user (min, max) slot bounds, so row count
    * is user-span-scale, not event-scale; the fill is one window over
    * user-partitioned slot order. This is the gap-filling/resampling
    * primitive every time-series store ships, as two shuffles on
    * user_id. */
  def resample(s: SparkSession, d: String): DataFrame = {
    val slotUs = 3600L * 1000000L
    val e = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("slot", expr(s"us div $slotUs"))
    val perSlot = e
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("slot"))
          .orderBy(col("us").desc, col("event_id").desc)))
      .groupBy(col("user_id"), col("slot"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("cents"))).as("last_cents"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("slot")).as("s0"), max(col("slot")).as("s1"))
      .select(col("user_id"), explode(expr("sequence(s0, s1)")).as("slot"))
    grid.join(perSlot, Seq("user_id", "slot"), "left")
      .withColumn("filled_cents",
        last(col("last_cents"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("slot"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("slot"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("filled_cents"))
      .orderBy(col("user_id"), col("slot"))
  }

  /** KMV (k-minimum-values / bottom-k) sketch overlap between two
    * sets — here the distinct part assortments supplied by two
    * nations, but the shape is the 100 TB dedup-planning primitive:
    * "how much does corpus A overlap corpus B" WITHOUT computing the
    * exact distinct-intersection. Each set keeps only its k smallest
    * distinct hash values (per-set window limit — WindowGroupLimit
    * prunes to ≤k rows per task BEFORE the exchange, so shuffle
    * volume is k·tasks, never set-scale); the union sketch is the k
    * smallest of the two sketches MERGED (a 2k-row TakeOrdered —
    * KMV's closure-under-union, constant driver-free state); the
    * intersection estimate counts union-sketch members present in
    * both sets. All estimator arithmetic is exact integer division
    * over the 31-bit hash space (n̂ = (k−1)·P div v_k), so the result
    * hash-matches the oracle bit-for-bit. Estimates are within ~9%
    * (1/√k) of truth — the spec pins that envelope against the exact
    * counts. */
  def kmvOverlap(s: SparkSession, d: String): DataFrame = {
    val k = 128
    val P = 2147483647L // rolling-hash modulus = hash-space size
    val (setA, setB) = ("NATION_18", "NATION_19")
    val items = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin(setA, setB))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nm"), col("l_partkey").as("pk"))
    val hashed = items
      .withColumn("h", graft.functions.RollingHash.rollingHash(
        md5(concat(lit("kmv_"), col("pk").cast("string")).cast("binary"))))
      .select(col("nm"), col("h")).distinct()
    val perSet = Window.partitionBy(col("nm")).orderBy(col("h"))
    val sk = hashed
      .withColumn("rn", row_number().over(perSet))
      .filter(col("rn") <= k)
    val skA = sk.filter(col("nm") === setA).select(col("h"))
    val skB = sk.filter(col("nm") === setB).select(col("h"))
    val skU = skA.unionByName(skB).distinct()
      .orderBy(col("h")).limit(k) // k-min of A∪B == k-min of skA∪skB
    val vkA = skA.agg(max(col("h")).as("vk_a"))
    val vkB = skB.agg(max(col("h")).as("vk_b"))
    val vkU = skU.agg(max(col("h")).as("vk_u"))
    // union-sketch members present in BOTH sets: the set-scale group
    // count reuses hashed's (nm, h) shuffle; the ≤k sketch broadcasts
    val both = hashed.groupBy(col("h"))
      .agg(countDistinct(col("nm")).as("ns"))
    val inter = both.join(broadcast(skU), Seq("h"))
      .filter(col("ns") === 2)
      .agg(count(lit(1)).as("inter_in_sketch"))
    val km1P = (k - 1).toLong * P
    vkA.crossJoin(vkB).crossJoin(vkU).crossJoin(inter)
      .withColumn("k", lit(k.toLong))
      .withColumn("est_a", expr(s"$km1P div vk_a"))
      .withColumn("est_b", expr(s"$km1P div vk_b"))
      .withColumn("est_union", expr(s"$km1P div vk_u"))
      .withColumn("est_jaccard_pm",
        expr(s"(1000 * inter_in_sketch) div $k"))
      .withColumn("est_intersection",
        expr(s"(inter_in_sketch * est_union) div $k"))
      .select(col("k"), col("vk_a"), col("vk_b"), col("vk_u"),
        col("est_a"), col("est_b"), col("est_union"),
        col("inter_in_sketch"), col("est_jaccard_pm"),
        col("est_intersection"))
  }

  /** NULL-skew join rewrite — the OTHER join pathology the salted
    * join doesn't cover: a LEFT join on a mostly-NULL key (here:
    * purchase events carry their user key, every other event type
    * carries NULL — the sparse-foreign-key shape). NULL keys can
    * never match, yet the naive plan still ships every NULL row
    * through the join's hash exchange — and they all hash to ONE
    * partition, the straggler that kills the stage at 100 TB. The
    * rewrite routes NULL-key rows AROUND the join entirely (filter +
    * union), so the exchange carries only matchable rows and the
    * NULL population never concentrates anywhere. The oracle is the
    * PLAIN left join — equality proves the rewrite result-preserving
    * (adv_salted_join's contract, for the NULL pathology). */
  def nullSkewJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "purchase", col("user_id")).as("pkey"))
    val dim = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("upc"))
    val matchable = e.filter(col("pkey").isNotNull)
      .join(dim, e("pkey") === dim("user_id"), "left")
      .select(col("event_type"), col("user_id"), col("upc"))
    val bypass = e.filter(col("pkey").isNull)
      .select(col("event_type"), lit(null).cast("long").as("user_id"),
        lit(null).cast("long").as("upc"))
    matchable.unionByName(bypass)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("user_id").isNotNull, 1L).otherwise(0L)).as("matched"),
        sum(coalesce(col("upc"), lit(0L))).as("total_purchase_cents"))
      .orderBy(col("event_type"))
  }

  /** Cohort retention matrix — the classic product-analytics workload
    * every MR shop ran as a two-job chain (first-touch extraction,
    * then cohort×offset roll-up). Cohort and offset are pure integer
    * epoch-day arithmetic ((epoch_us div 86400000000) div 7), never
    * calendar week-of-year — ISO week semantics differ across engines
    * and none of that matters to retention. The per-user first touch
    * is a window min over the user exchange (no self-join), so the
    * whole matrix costs two shuffles: user_id, then (cohort, offset).
    * At 100 TB the first shuffle is the events table's natural key
    * and the output is weeks², i.e. tiny. */
  def retentionCohort(s: SparkSession, d: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("epoch_day"))
      .withColumn("first_day", min(col("epoch_day")).over(wUser))
      .select(col("user_id"),
        expr("first_day div 7").as("cohort_week"),
        expr("(epoch_day - first_day) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Recency-decayed revenue per user (half-life = 7 days) — the
    * feature-engineering primitive behind "recent activity" model
    * features. All arithmetic is EXACT integer: reference "now" is
    * the corpus max epoch-day (data-derived, so the query is
    * deterministic), age buckets are integer weeks, and the decay is
    * applied as one integer division per (user, age_week) GROUP SUM —
    * Σ_k (cents_k div 2^k) — never per row and never in floating
    * point, so group-sum ordering cannot perturb the result and the
    * hash matches the oracle bit-for-bit. Weights below 2^-62 are
    * exactly zero. Two exchanges, both cheap where it counts: the
    * (user, age_week) shuffle carries MAP-SIDE PARTIAL SUMS (never
    * raw events — at 100 TB that partial combine is the whole game),
    * and the user shuffle after it carries only group-level rows
    * (≤ corpus-age-in-weeks per user); the 1-row corpus max is a
    * broadcast cross join. */
  def decayScore(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        expr("unix_micros(ts) div 86400000000").as("epoch_day"))
    val nowDay = e.agg(max(col("epoch_day")).as("now_day"))
    e.crossJoin(broadcast(nowDay))
      .withColumn("age_weeks", expr("(now_day - epoch_day) div 7"))
      .groupBy(col("user_id"), col("age_weeks"))
      .agg(sum(col("cents")).as("ck"))
      .withColumn("decayed",
        when(col("age_weeks") >= 63, 0L)
          .otherwise(expr("ck div shiftleft(1L, cast(age_weeks as int))")))
      .groupBy(col("user_id"))
      .agg(sum(col("decayed")).as("decayed_cents"),
        sum(col("ck")).as("raw_cents"))
      .orderBy(col("user_id"))
  }

  /** Equi-width value-distribution histogram over order totals — the
    * data-profiling pass any 100 TB ingest runs before choosing
    * partition bounds or spotting skew. Buckets are exact integer
    * cents div a fixed width, so there is no floating-point binning
    * ambiguity between engines; per-bucket count/min/max/sum come out
    * of ONE hash aggregate whose key space is the bucket count
    * (constant), making the reduce side trivially small at any data
    * scale. */
  def profileHistogram(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("bucket", expr("cents div 2500000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("bucket"))
  }

  /** Event-transition matrix — the first-order Markov model product
    * analytics fits over user journeys (what follows what, and how
    * often): each user's event stream in (ts, event_id) order yields
    * (type → next type) pairs via ONE lead window, counted corpus-wide
    * with the share of each source type in integer basis points
    * ((10000·n) div from-total — exact on both engines). Shuffle
    * classes: the user-keyed window exchange, then a type²-keyed
    * (constant-cardinality) aggregate — transition state never
    * exceeds |types|² rows at any event volume. */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("from_total"))
    pairs.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("next_type"), col("n_transitions"),
        expr("(10000 * n_transitions) div from_total").as("share_bps"))
      .orderBy(col("from_type"), col("next_type"))
  }

  /** Doubled exact median (lo + hi of the two bracketing sorted
    * positions — 2·median as an INTEGER even when n is even) per
    * group, via the q25 distributed-histogram pattern: the window
    * runs over the (group, value)-DISTINCT histogram, never the raw
    * rows, so a billion events with a bounded value domain cost a
    * histogram-scale sort. */
  private def doubledMedian(vals: DataFrame, g: String, v: String,
      out: String): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(g)).orderBy(col(v))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(g))
    vals.groupBy(col(g), col(v)).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("k1", expr("(n - 1) div 2"))
      .withColumn("k2", expr("n div 2"))
      .groupBy(col(g))
      .agg((max(when(col("cum") - col("c") <= col("k1") &&
          col("k1") <= col("cum") - 1, col(v))) +
        max(when(col("cum") - col("c") <= col("k2") &&
          col("k2") <= col("cum") - 1, col(v)))).as(out))
  }

  /** ROBUST outlier screen — [[outlierEvents]]' median/MAD twin, the
    * screen that still works when the anomalies themselves poison
    * mean and variance (the classic failure of z-scores on heavy
    * tails): flag |v − median| > 3·MAD, computed entirely in exact
    * integers by carrying the median DOUBLED (med2 = lo+hi) and the
    * MAD QUADRUPLED (mad4 = doubled median of already-doubled
    * deviations), so the test is 2·|2v − med2| > 3·mad4 with no
    * halves ever materialized. Two histogram-scale median passes +
    * two constant-size broadcasts + one map-side flag — nothing
    * event-scale is sorted. */
  def robustOutlier(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val med = doubledMedian(ev, "event_type", "cents", "med2_cents")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(lit(2L) * col("cents") - col("med2_cents")))
    val mad = doubledMedian(dev, "event_type", "dev", "mad4_cents")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("med2_cents")).as("med2_cents"),
        min(col("mad4_cents")).as("mad4_cents"),
        sum(when(lit(2L) * col("dev") > lit(3L) * col("mad4_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** 3σ outlier screen per event type — the data-quality gate an
    * ingest runs before anomalies poison downstream aggregates — in
    * EXACT integer arithmetic: the float test |v − μ| > 3σ is
    * algebraically cleared of divisions to
    * (n·v − S)² > 9·(n·SS − S²) over value cents, evaluated in
    * decimal(38,0) (Spark) / HUGEINT (DuckDB) so no rounding mode
    * can disagree — a z-score in doubles would hinge on libm sqrt
    * and summation order. Exactness holds while the largest term
    * (n·v − S)² stays inside 38 digits, i.e. n·max|cents| < ~10¹⁹
    * per type — ~10¹² events averaging 10⁷ cents. Beyond that,
    * non-ANSI decimal overflow yields NULL, which a naive
    * `else 0` would silently count as "not an outlier"; instead the
    * three-valued case below routes the NULL comparison into
    * assert_true, so Spark fails as loudly as DuckDB's HUGEINT
    * does — an overflow is an error on BOTH engines, never a
    * silent undercount. Shuffle classes: one type-keyed stats
    * aggregate (map-side partials), the tiny per-type stats row
    * broadcast back, one map-side flag + final aggregate. The
    * two-pass shape (stats, then flag) is how a 100 TB screen runs —
    * nothing is ever sorted or windowed per event. */
  def outlierEvents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("cast(round(value * 100) as decimal(38,0))").as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("v")).as("s"),
        sum(expr("v * v")).as("ss"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("is_out",
        expr("case when (n*v - s)*(n*v - s) > 9*(n*ss - s*s) then 1L" +
          " when (n*v - s)*(n*v - s) <= 9*(n*ss - s*s) then 0L" +
          " else cast(assert_true(false," +
          " 'decimal(38,0) overflow in 3-sigma screen') as long) end"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("is_out")).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Order-3 journey mining — [[transitionMatrix]]'s higher-order
    * sibling: every 3-step path of consecutive event types in a
    * user's (ts, event_id)-ordered stream, counted corpus-wide with
    * integer-bps share of all complete 3-paths. TWO lead windows over
    * the SAME user-keyed sort (one exchange, one sort — Catalyst
    * collapses same-spec windows), then a path-keyed count whose
    * state is bounded by |types|³ = 125 rows at any event volume;
    * the total for shares rides a 1-row broadcast. The full bounded
    * table is emitted — no top-k truncation to go nondeterministic
    * under ties. */
  def userPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val paths = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
    // the total rides an unpartitioned window over the ALREADY-BOUNDED
    // ≤125-row path table — one event-scale pass total, where an
    // agg-and-rejoin total would re-run the scan+window pipeline
    paths
      .withColumn("total_paths",
        sum(col("n_paths")).over(Window.partitionBy()))
      .select(col("step1"), col("step2"), col("step3"), col("n_paths"),
        expr("(10000 * n_paths) div total_paths").as("share_bps"))
      .orderBy(col("step1"), col("step2"), col("step3"))
  }

  /** Multi-touch attribution — the event-pipeline op that turns a raw
    * click-stream into channel credit. Each purchase's value is split
    * LINEARLY across the same user's view/click/signup touches in the
    * preceding hour; purchases with no touch in the window credit a
    * synthetic `direct` channel. Exact to the last unit: value rides
    * as micro-cents (cents × 10⁶), each touch takes total div n, and
    * the MOST RECENT touch (row_number over (ts, event_id) desc — a
    * total order, so deterministic) absorbs the remainder, making
    * credit conservation an identity, not a float approximation
    * (AdvancedSpec pins Σcredits == Σ purchase micro-cents).
    * Shuffle classes: one user-keyed equi-join (the bounded
    * interval-join shape of [[intervalJoin]] — per-user fan-out is
    * window-bounded, so the intermediate tracks output, never
    * |purchases|×|touches|), one purchase-keyed window, one
    * constant-key final aggregate. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"),
        (round(col("value") * 100).cast("long") * 1000000L).as("micros"))
    val touches = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("event_id").as("touch_id"), col("user_id").as("t_user"),
        col("ts_us").as("t_ts"), col("event_type").as("touch_type"))
    // ONE pass: a left join keeps untouched purchases as null-touch
    // rows (the `direct` channel) instead of a second scan + anti-join
    val pairs = purchases.join(touches,
      col("user_id") === col("t_user") &&
        col("t_ts") < col("p_ts") && col("t_ts") >= col("p_ts") - hourUs,
      "left")
    val byRecency = Window.partitionBy(col("purchase_id"))
      .orderBy(col("t_ts").desc, col("touch_id").desc)
    val perPurchase = Window.partitionBy(col("purchase_id"))
    pairs
      .withColumn("rk", row_number().over(byRecency))
      .withColumn("n", count(col("touch_id")).over(perPurchase))
      .withColumn("credit",
        when(col("touch_id").isNull, col("micros"))
          .otherwise(expr("micros div n") +
            when(col("rk") === 1, col("micros") % col("n")).otherwise(0L)))
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit")).as("credited_micros"))
      .orderBy(col("touch_type"))
  }
}
