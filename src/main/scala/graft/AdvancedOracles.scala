package graft

/** DuckDB oracle SQL for Advanced: note the salted join's oracle is
  * the PLAIN join — equality proves the salting rewrite is
  * result-preserving. */
object AdvancedOracles {
  val sql: Map[String, String] = Map(
    "adv_asof_join" ->
      """SELECT event_id, user_id, ts_us, last_click_us FROM (
        |  SELECT event_id, user_id, event_type, ts_us,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_us END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_click_us
        |  FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |        FROM events WHERE event_type IN ('click', 'purchase')))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // custom-operator as-of join: inclusive (c_ts <= p_ts) backward
    // match, ties on c_ts resolved to the largest click_id
    "adv_asof_custom" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT c.ts_us FROM ev c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts_us <= p.ts_us
        |   ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS last_click_us,
        |  (SELECT c.event_id FROM ev c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts_us <= p.ts_us
        |   ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) AS last_click_id
        |FROM ev p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    "adv_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "adv_interval_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
        |  min(c.event_id) AS first_click, max(c.event_id) AS last_click
        |FROM ev p JOIN ev c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us < p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "adv_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Advanced.hllDistinct: identical rho CASE chain (shared
    // Scala constant), dyadic-exact register sum, one final IEEE
    // multiply/divide — an approximate sketch with an exact oracle
    "adv_hll_distinct" -> {
      val fold =
        """list_reduce(
          |    list_prepend(CAST(0 AS BIGINT),
          |      list_transform(regexp_extract_all(
          |        md5('hll-' || CAST(user_id AS VARCHAR)), '(?s).'),
          |        c -> CAST(unicode(c) AS BIGINT))),
          |    (h, c) -> (h * 31 + c) % 2147483647)""".stripMargin
      val rho = graft.operators.Advanced.rhoCase.replace("_w", "(hv // 64)")
      s"""WITH h AS (SELECT event_type, user_id, $fold AS hv FROM events),
         |regs AS (SELECT event_type, hv % 64 AS reg, max($rho) AS mj
         |  FROM h GROUP BY 1, 2),
         |agg AS (SELECT event_type,
         |    sum(1.0 / CAST((CAST(1 AS BIGINT) << mj) AS DOUBLE)) AS sp,
         |    count(*) AS np FROM regs GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT a.event_type,
         |  (0.709 * 4096.0) / (sp + (64 - np) * 1.0) AS estimate,
         |  CAST(64 - np AS BIGINT) AS n_zero_regs,
         |  ex.exact_users
         |FROM agg a JOIN ex ON a.event_type = ex.event_type
         |ORDER BY 1""".stripMargin
    },

    "adv_upsert" ->
      """WITH all_rows AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    CAST(1 AS BIGINT) AS version FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'U', o_totalprice * 1.1, 2 FROM orders
        |  WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT -o_orderkey, 'N', o_totalprice, 2 FROM orders
        |  WHERE o_orderkey % 100 = 7),
        |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC) AS rn FROM all_rows)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(sum(version) AS BIGINT) AS version_sum
        |FROM m WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "adv_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND us > v_us GROUP BY 1),
        |p AS (SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin,

    "adv_session_revenue" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS prev_us FROM e)),
        |sid AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS revenue_cents,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clicks,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM sid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "adv_resample" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(ts) // 3600000000 AS slot
        |  FROM events WHERE event_type = 'purchase'),
        |per_slot AS (
        |  SELECT user_id, slot, count(*) AS n_events,
        |    max(CASE WHEN rn = 1 THEN cents END) AS last_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, slot
        |          ORDER BY us DESC, event_id DESC) AS rn FROM e)
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(s0, s1)) AS slot
        |  FROM (SELECT user_id, min(slot) AS s0, max(slot) AS s1
        |        FROM e GROUP BY 1)),
        |j AS (
        |  SELECT g.user_id, g.slot,
        |    CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
        |    p.last_cents
        |  FROM grid g LEFT JOIN per_slot p
        |    ON g.user_id = p.user_id AND g.slot = p.slot)
        |SELECT user_id, slot, n_events,
        |  last_value(last_cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_cents
        |FROM j ORDER BY user_id, slot""".stripMargin,

    // identical KMV construction: rolling-hash(md5('kmv_'||pk)) per
    // distinct (nation, part), bottom-128 per set, union sketch from
    // the merged sketches, exact-integer estimators over P = 2^31-1
    "adv_kmv_overlap" ->
      """WITH items AS (
        |  SELECT DISTINCT n_name AS nm, l_partkey AS pk
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_18', 'NATION_19')),
        |hashed AS (
        |  SELECT DISTINCT nm, list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        regexp_extract_all(md5('kmv_' || CAST(pk AS VARCHAR)),
        |          '(?s).'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS h
        |  FROM items),
        |ska AS (SELECT h FROM hashed WHERE nm = 'NATION_18'
        |        ORDER BY h LIMIT 128),
        |skb AS (SELECT h FROM hashed WHERE nm = 'NATION_19'
        |        ORDER BY h LIMIT 128),
        |sku AS (SELECT DISTINCT h FROM (
        |          SELECT h FROM ska UNION ALL SELECT h FROM skb)
        |        ORDER BY h LIMIT 128),
        |inter AS (
        |  SELECT count(*) AS n FROM sku
        |  WHERE h IN (SELECT h FROM hashed WHERE nm = 'NATION_18')
        |    AND h IN (SELECT h FROM hashed WHERE nm = 'NATION_19'))
        |SELECT CAST(128 AS BIGINT) AS k,
        |  (SELECT max(h) FROM ska) AS vk_a,
        |  (SELECT max(h) FROM skb) AS vk_b,
        |  (SELECT max(h) FROM sku) AS vk_u,
        |  (127 * CAST(2147483647 AS BIGINT)) // (SELECT max(h) FROM ska)
        |    AS est_a,
        |  (127 * CAST(2147483647 AS BIGINT)) // (SELECT max(h) FROM skb)
        |    AS est_b,
        |  (127 * CAST(2147483647 AS BIGINT)) // (SELECT max(h) FROM sku)
        |    AS est_union,
        |  (SELECT n FROM inter) AS inter_in_sketch,
        |  (1000 * (SELECT n FROM inter)) // 128 AS est_jaccard_pm,
        |  ((SELECT n FROM inter) *
        |    ((127 * CAST(2147483647 AS BIGINT)) // (SELECT max(h) FROM sku)))
        |    // 128 AS est_intersection""".stripMargin,

    // the PLAIN left join: equality proves the null-bypass rewrite
    // result-preserving
    "adv_null_skew_join" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_type = 'purchase' THEN user_id END AS pkey
        |  FROM events),
        |d AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS upc
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS matched,
        |  CAST(sum(COALESCE(d.upc, 0)) AS BIGINT) AS total_purchase_cents
        |FROM e LEFT JOIN d ON e.pkey = d.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // integer epoch-day/week arithmetic only — no ISO week-of-year,
    // which differs across engines and is irrelevant to retention
    "adv_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS epoch_day
        |  FROM events),
        |f AS (
        |  SELECT user_id, epoch_day,
        |    min(epoch_day) OVER (PARTITION BY user_id) AS first_day
        |  FROM e)
        |SELECT first_day // 7 AS cohort_week,
        |  (epoch_day - first_day) // 7 AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // decay applied as one integer division per (user, age_week)
    // GROUP SUM — Σ_k (cents_k // 2^k) — exact at any sum order
    "adv_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(ts) // 86400000000 AS epoch_day
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(epoch_day) AS now_day FROM e),
        |k AS (
        |  SELECT user_id, (now_day - epoch_day) // 7 AS age_weeks,
        |    CAST(sum(cents) AS BIGINT) AS ck
        |  FROM e, mx GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN age_weeks >= 63 THEN 0
        |    ELSE ck // (CAST(1 AS BIGINT) << age_weeks) END) AS BIGINT)
        |    AS decayed_cents,
        |  CAST(sum(ck) AS BIGINT) AS raw_cents
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "adv_profile_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT cents // 2500000 AS bucket,
        |  count(*) AS n_orders,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Advanced.transitionMatrix: lead over the same
    // (user, µs, event_id) order, type-pair counts + integer bps.
    "adv_transition_matrix" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type, next_type, count(*)
        |    AS n_transitions
        |  FROM (
        |    SELECT user_id, event_type,
        |      lead(event_type) OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts), event_id) AS next_type
        |    FROM events)
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type, CAST(sum(n_transitions) AS BIGINT)
        |    AS from_total
        |  FROM pairs GROUP BY 1)
        |SELECT p.from_type, p.next_type, p.n_transitions,
        |  (10000 * p.n_transitions) // t.from_total AS share_bps
        |FROM pairs p JOIN tot t USING (from_type)
        |ORDER BY 1, 2""".stripMargin,

    // Mirrors Advanced.robustOutlier: doubled median (lo+hi via
    // row_number positions), quadrupled MAD, the 2|2v-med2| > 3 mad4
    // test — positions pick the same VALUES regardless of tie order.
    "adv_robust_outlier" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |r1 AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |med AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN rn = (n-1)//2 + 1 THEN c ELSE 0 END)
        |       + sum(CASE WHEN rn = n//2 + 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS med2
        |  FROM r1 GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, abs(2*e.c - m.med2) AS d
        |  FROM ev e JOIN med m USING (event_type)),
        |r2 AS (
        |  SELECT event_type, d,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev),
        |mad AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN rn = (n-1)//2 + 1 THEN d ELSE 0 END)
        |       + sum(CASE WHEN rn = n//2 + 1 THEN d ELSE 0 END) AS BIGINT)
        |      AS mad4
        |  FROM r2 GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_events,
        |  min(m.med2) AS med2_cents, min(a.mad4) AS mad4_cents,
        |  CAST(sum(CASE WHEN 2*d.d > 3*a.mad4 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN med m USING (event_type)
        |JOIN mad a USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Advanced.outlierEvents: the division-free 3-sigma test
    // in HUGEINT (Spark evaluates the same inequality in decimal(38,0)).
    "adv_outlier_events" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS v
        |  FROM events),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    sum(v) AS s, sum(v * v) AS ss
        |  FROM ev GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN (st.n*e.v - st.s)*(st.n*e.v - st.s)
        |                     > 9*(st.n*st.ss - st.s*st.s)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ev e JOIN st USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Advanced.userPaths: two leads over the same
    // (user, µs, event_id) order, 3-path counts + integer bps share.
    "adv_user_paths" ->
      """WITH p AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id)),
        |c AS (
        |  SELECT step1, step2, step3, count(*) AS n_paths
        |  FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |  GROUP BY 1, 2, 3)
        |SELECT step1, step2, step3, n_paths,
        |  (10000 * n_paths) //
        |    CAST((SELECT sum(n_paths) FROM c) AS BIGINT) AS share_bps
        |FROM c ORDER BY 1, 2, 3""".stripMargin,

    // Mirrors Advanced.attribution: linear split in micro-cents, the
    // most recent touch (same (ts, event_id) DESC total order) absorbs
    // the remainder; untouched purchases credit 'direct'. Operands are
    // non-negative so DuckDB's floor // and Spark's truncating div
    // cannot disagree.
    "adv_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    value
        |  FROM events),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts_us AS p_ts,
        |    CAST(round(value*100) AS BIGINT) * 1000000 AS micros
        |  FROM ev WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT event_id AS touch_id, user_id, ts_us AS t_ts,
        |    event_type AS touch_type
        |  FROM ev WHERE event_type IN ('view','click','signup')),
        |pairs AS (
        |  SELECT p.purchase_id, p.micros, t.touch_id, t.t_ts,
        |    t.touch_type
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - 3600000000),
        |ranked AS (
        |  SELECT coalesce(touch_type, 'direct') AS touch_type, micros,
        |    touch_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY t_ts DESC, touch_id DESC) AS rk,
        |    count(touch_id) OVER (PARTITION BY purchase_id) AS n
        |  FROM pairs)
        |SELECT touch_type, count(*) AS n_credits,
        |  CAST(sum(CASE WHEN touch_id IS NULL THEN micros
        |    ELSE micros // n +
        |      CASE WHEN rk = 1 THEN micros % n ELSE 0 END END)
        |    AS BIGINT) AS credited_micros
        |FROM ranked GROUP BY 1
        |ORDER BY touch_type""".stripMargin,
  )
}
