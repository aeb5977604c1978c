package graft

/** DuckDB-1.0 oracle SQL for graft.operators.Relational (SURVEY.md §2).
  *
  * Conventions mirrored from the Spark side (see Relational's scaladoc):
  * exact integer cents via CAST(round(x*100) AS BIGINT); every HUGEINT
  * sum re-cast to BIGINT so parquet<->duckdb schemas agree; timestamps
  * emitted via strftime; total ORDER BY with unique tiebreakers.
  */
object RelationalOracles {
  private val cents = "CAST(round(%s*100) AS BIGINT)"
  private def c(col: String) = cents.format(col)
  /** revenue term: cents * (100 - discount_pct), summed as exact ints */
  private val rev =
    "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |  $rev AS sum_disc_x10000,
         |  count(*) AS cnt,
         |  CAST(CAST(sum(l_quantity) AS BIGINT) AS DOUBLE) / count(*) AS avg_qty
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical to q1's oracle: the SQL-surface twin must match both
    // the DataFrame form and DuckDB bit-for-bit
    "sql_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |  $rev AS sum_disc_x10000,
         |  count(*) AS cnt,
         |  CAST(CAST(sum(l_quantity) AS BIGINT) AS DOUBLE) / count(*) AS avg_qty
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${c("l_extendedprice")} AS price_cents,
         |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-04-01' AND l_quantity >= 45
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_top_revenue" ->
      s"""SELECT l_orderkey, $rev AS revenue_x10000,
         |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue_x10000 DESC, l_orderkey LIMIT 10""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, $rev AS revenue_x10000
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY revenue_x10000 DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT CAST(sum(${c("l_extendedprice")} *
         |    CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)
         |  AS revenue_x10000, count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 2 AND 4
         |  AND l_quantity < 25""".stripMargin,

    "q7_distinct_parts" ->
      """SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |ORDER BY 1, 2""".stripMargin,

    "q8_topk_orders" ->
      s"""SELECT o_orderkey, ${c("o_totalprice")} AS total_cents,
         |  o_orderpriority
         |FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 15""".stripMargin,

    "q9_global_sort" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date, l_orderkey,
        |  l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,

    "q10_secondary_sort" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "q11_window_rank" ->
      s"""SELECT c_nationkey, c_custkey, acctbal_cents, rnk FROM (
         |  SELECT c_nationkey, c_custkey,
         |    ${c("c_acctbal")} AS acctbal_cents,
         |    CAST(rank() OVER (PARTITION BY c_nationkey
         |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
         |  FROM customer) WHERE rnk <= 3
         |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    "q12_rollup_revenue" ->
      s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY 1, 2""".stripMargin,

    "q13_cust_order_counts" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_having" ->
      """SELECT l_partkey, count(*) AS cnt,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 45
        |ORDER BY 1""".stripMargin,

    "q15_union_counts" ->
      """SELECT nationkey, kind, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q16_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY 1""".stripMargin,

    "q17_small_qty_parts" ->
      s"""SELECT CAST(sum(${c("l_extendedprice")}) AS BIGINT)
         |    AS sum_price_cents, count(*) AS n_rows
         |FROM lineitem, (
         |  SELECT l_partkey AS p_key, CAST(sum(l_quantity) AS BIGINT)
         |      AS qty_sum, count(*) AS qty_cnt
         |  FROM lineitem GROUP BY 1) pp
         |WHERE l_partkey = p_key
         |  AND CAST(l_quantity AS BIGINT) * 2 * qty_cnt < qty_sum""".stripMargin,

    "q18_large_orders" ->
      s"""SELECT c_custkey, o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         |  ${c("o_totalprice")} AS total_cents, sum_qty
         |FROM orders, customer, (
         |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(sum(l_quantity) AS BIGINT) > 300) b
         |WHERE o_orderkey = b.l_orderkey AND o_custkey = c_custkey
         |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,

    "q19_event_windows" ->
      s"""SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         |  count(*) AS n,
         |  CAST(sum(${c("value")}) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q20_pivot_events" -> {
      def n(t: String) =
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t"
      s"""SELECT user_id, ${n("click")}, ${n("view")}, ${n("purchase")},
         |  ${n("signup")}, ${n("error")},
         |  CAST(sum(CASE WHEN event_type = 'purchase'
         |    THEN ${c("value")} ELSE 0 END) AS BIGINT) AS purchase_cents
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q21_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
        |  SELECT user_id, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |    ELSE 0 END AS new_sess FROM (
        |    SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_ts FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_running_total" ->
      s"""SELECT o_custkey, o_orderkey, ${c("o_totalprice")} AS total_cents,
         |  CAST(sum(${c("o_totalprice")}) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS running_cents
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q25_median" ->
      """SELECT l_returnflag,
        |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
        |  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE)
        |    AS median_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same builtin-interpolation contract as q25, one branch per
    // quantile (quantile_cont's q must be a constant in DuckDB)
    "q28_quantiles" -> {
      def one(l: String, q: String) =
        s"""SELECT l_returnflag, '$l' AS q_label,
           |  CAST(quantile_cont(l_extendedprice, $q) AS DOUBLE) AS value
           |FROM lineitem GROUP BY 1""".stripMargin
      s"""${one("p25", "0.25")}
         |UNION ALL
         |${one("p50", "0.5")}
         |UNION ALL
         |${one("p75", "0.75")}
         |UNION ALL
         |${one("p95", "0.95")}
         |ORDER BY l_returnflag, q_label""".stripMargin
    },

    "q29_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS cust_acct_cents
        |  FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
        |  CAST(COALESCE(cust_acct_cents, 0) AS BIGINT) AS cust_acct_cents,
        |  CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL JOIN s ON c.nationkey = s.nationkey
        |ORDER BY 1""".stripMargin,

    // Each event belongs to exactly two hop-aligned 1-hour windows:
    // starts (floor(t/30min) - k) * 30min for k in {0, 1}
    "q32_sliding_windows" ->
      s"""SELECT strftime(make_timestamp(s), '%Y-%m-%d %H:%M')
         |    AS win_start, event_type,
         |  count(*) AS n, CAST(sum(${c("value")}) AS BIGINT) AS value_cents
         |FROM (
         |  SELECT event_type, value,
         |    (epoch_us(ts) // 1800000000 - k) * 1800000000 AS s
         |  FROM events, unnest([0, 1]) AS t(k))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q30_range_frame" ->
      """SELECT o_custkey, o_orderkey, day, total_cents,
        |  CAST(sum(total_cents) OVER w AS BIGINT) AS trailing7d_cents,
        |  count(*) OVER w AS trailing7d_orders
        |FROM (SELECT o_custkey, o_orderkey,
        |    CAST(datediff('day', DATE '1970-01-01', o_orderdate)
        |      AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,

    "q31_deciles" ->
      """SELECT decile, count(*) AS n_orders,
        |  min(total_cents) AS min_cents, max(total_cents) AS max_cents,
        |  CAST(sum(total_cents) AS BIGINT) AS sum_cents
        |FROM (SELECT CAST(ntile(10) OVER (ORDER BY total_cents,
        |      o_orderkey) AS BIGINT) AS decile, total_cents
        |  FROM (SELECT o_orderkey,
        |      CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |    FROM orders))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Relational.q36SampledDeciles: identical md5-fold hash
    // sample (mod 20), ntile boundaries of the SAMPLE only, strict
    // b < cents bucket assignment (ties to the lower bucket).
    // sample modulus mirrors Relational.q36Modulus: the row budget
    // (100k) turns the rate into min(5%, budget/n), integer-exact
    "q36_sampled_deciles" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders),
        |mm AS (
        |  SELECT greatest(20, (count(*) + 99999) // 100000) AS m FROM o),
        |samp AS (
        |  SELECT o.* FROM o, mm
        |  WHERE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('dec-' || CAST(o_orderkey AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 2147483647) % mm.m = 0),
        |tiles AS (
        |  SELECT total_cents,
        |    ntile(10) OVER (ORDER BY total_cents, o_orderkey) AS tile
        |  FROM samp),
        |bounds AS (
        |  SELECT max(total_cents) AS b FROM tiles
        |  WHERE tile < 10 GROUP BY tile),
        |assigned AS (
        |  SELECT total_cents,
        |    1 + (SELECT count(*) FROM bounds WHERE b < o.total_cents)
        |      AS bucket
        |  FROM o)
        |SELECT bucket, count(*) AS n_orders,
        |  min(total_cents) AS min_cents, max(total_cents) AS max_cents,
        |  CAST(sum(total_cents) AS BIGINT) AS sum_cents
        |FROM assigned GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Mirrors Relational.q37MinCostSupplier verbatim (real table names)
    "q37_min_cost_supplier" ->
      """WITH offer AS (
        |  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
        |    min(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |      AS price_cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE r.r_name = 'EUROPE' AND p.p_size < 10
        |  GROUP BY 1, 2)
        |SELECT o.partkey, o.suppkey, n2.n_name AS nation, o.price_cents
        |FROM offer o
        |JOIN supplier s2 ON o.suppkey = s2.s_suppkey
        |JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |WHERE o.price_cents = (SELECT min(i.price_cents) FROM offer i
        |                       WHERE i.partkey = o.partkey)
        |ORDER BY o.partkey, o.suppkey""".stripMargin,

    "q26_min_per_group" ->
      s"""SELECT l_partkey, min(l_orderkey) AS first_orderkey,
         |  count(*) AS n_at_min,
         |  min(${c("l_extendedprice")}) AS min_price_cents
         |FROM (
         |  SELECT l_partkey, l_orderkey, l_extendedprice,
         |    min(${c("l_extendedprice")}) OVER (PARTITION BY l_partkey)
         |      AS mn
         |  FROM lineitem)
         |WHERE ${c("l_extendedprice")} = mn
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q27_set_ops" ->
      """SELECT nationkey, 'both' AS relation
        |FROM (SELECT s_nationkey AS nationkey FROM supplier
        |      INTERSECT SELECT c_nationkey FROM customer)
        |UNION ALL
        |SELECT nationkey, 'supplier_only' AS relation
        |FROM (SELECT s_nationkey AS nationkey FROM supplier
        |      EXCEPT SELECT c_nationkey FROM customer)
        |ORDER BY relation, nationkey""".stripMargin,

    "q22_cube_orders" ->
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
         |  coalesce(o_orderpriority, '(all)') AS priority,
         |  count(*) AS cnt,
         |  CAST(sum(${c("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY 1, 2""".stripMargin,

    "q33_order_gaps" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  count(gap_days) AS n_gaps,
        |  CAST(coalesce(sum(gap_days), 0) AS BIGINT) AS sum_gap_days,
        |  CAST(coalesce(max(gap_days), 0) AS BIGINT) AS max_gap_days
        |FROM (SELECT o_custkey,
        |    CAST(datediff('day',
        |      CAST(lag(o_orderdate, 1) OVER w AS DATE),
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey))
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q35_above_class_avg" ->
      """SELECT o_orderpriority, count(*) AS n_above,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS above_cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |    (SELECT count(*) FROM orders i
        |     WHERE i.o_orderpriority = o.o_orderpriority)
        |  > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
        |     FROM orders i
        |     WHERE i.o_orderpriority = o.o_orderpriority)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q34_grouping_sets" ->
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
         |  coalesce(o_orderpriority, '(all)') AS priority,
         |  count(*) AS cnt,
         |  CAST(sum(${c("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY 1, 2""".stripMargin,

    "q38_disjunctive_join" ->
      s"""SELECT $rev AS revenue_x10000, count(*) AS n_items
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 20
         |        AND l_quantity BETWEEN 1 AND 15)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
         |        AND l_quantity BETWEEN 10 AND 25)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40
         |        AND l_quantity BETWEEN 20 AND 35)""".stripMargin,

    "q39_promo_share" ->
      s"""SELECT promo_x10000, total_x10000,
         |  CAST(promo_x10000 AS DOUBLE) * 100 / CAST(total_x10000 AS DOUBLE)
         |    AS promo_share
         |FROM (
         |  SELECT
         |    CAST(sum(CASE WHEN p_type = 'PROMO'
         |      THEN ${c("l_extendedprice")} *
         |        (100 - CAST(round(l_discount*100) AS BIGINT))
         |      ELSE 0 END) AS BIGINT) AS promo_x10000,
         |    $rev AS total_x10000
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |    AND l_shipdate <  TIMESTAMP '1997-10-01')""".stripMargin,

    "q40_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, $rev AS total_x10000
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_x10000
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_x10000 = (SELECT max(total_x10000) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,

    "q41_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, $rev AS revenue_x10000
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-07-01'
         |  AND o_orderdate <  TIMESTAMP '1997-10-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_x10000 DESC, c_custkey LIMIT 20""".stripMargin,

    "q42_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  strftime(l_shipdate, '%Y') AS l_year, $rev AS revenue_x10000
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_18', 'NATION_19')
         |  AND n2.n_name IN ('NATION_18', 'NATION_19')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q43_market_share" ->
      s"""SELECT o_year, nation_x10000, total_x10000,
         |  CAST(nation_x10000 AS DOUBLE) / CAST(total_x10000 AS DOUBLE)
         |    AS mkt_share
         |FROM (
         |  SELECT strftime(o_orderdate, '%Y') AS o_year,
         |    CAST(sum(CASE WHEN ns.n_name = 'NATION_19'
         |      THEN ${c("l_extendedprice")} *
         |        (100 - CAST(round(l_discount*100) AS BIGINT))
         |      ELSE 0 END) AS BIGINT) AS nation_x10000,
         |    $rev AS total_x10000
         |  FROM lineitem
         |  JOIN part     ON l_partkey = p_partkey
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region   ON nc.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate <  TIMESTAMP '1998-01-01'
         |  GROUP BY 1)
         |ORDER BY o_year""".stripMargin,

    "q44_dormant_customers" ->
      s"""WITH thr AS (
         |  SELECT count(*) AS npos,
         |    CAST(sum(${c("c_acctbal")}) AS BIGINT) AS sum_pos_cents
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT c_mktsegment, count(*) AS n_cust,
         |  CAST(sum(${c("c_acctbal")}) AS BIGINT) AS bal_cents
         |FROM customer, thr
         |WHERE ${c("c_acctbal")} * npos > sum_pos_cents
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '1999-01-01')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_sole_failing_supplier" ->
      s"""WITH per_order AS (
         |  SELECT l_orderkey,
         |    count(DISTINCT l_suppkey) AS n_supp,
         |    count(DISTINCT CASE WHEN l_returnflag = 'R'
         |      THEN l_suppkey END) AS n_fail,
         |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
         |      AS fail_supp
         |  FROM lineitem GROUP BY 1)
         |SELECT s_suppkey, s_name, count(*) AS numwait
         |FROM per_order JOIN supplier ON fail_supp = s_suppkey
         |WHERE n_supp > 1 AND n_fail = 1
         |GROUP BY 1, 2
         |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,

    // Mirrors Relational.q46Unpivot: the UNION-ALL melt of the same
    // three integer measures, aggregated per (returnflag, metric).
    "q46_unpivot" ->
      """WITH melted AS (
        |  SELECT l_returnflag, 'price_cents' AS metric,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'qty', CAST(l_quantity AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'discount_bp',
        |    CAST(round(l_discount * 10000) AS BIGINT)
        |  FROM lineitem)
        |SELECT l_returnflag, metric, CAST(sum(value) AS BIGINT) AS total,
        |  count(*) AS n_rows
        |FROM melted GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors Relational.q47WindowProfile: unique (spend, cust)
    // ordering, the same integer-operand IEEE divisions.
    "q47_window_profile" ->
      """WITH spend AS (
        |  SELECT o_custkey AS cust,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS spend_cents
        |  FROM orders GROUP BY 1)
        |SELECT c_nationkey AS nation, cust, spend_cents,
        |  percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY spend_cents, cust) AS pr,
        |  cume_dist() OVER (PARTITION BY c_nationkey
        |    ORDER BY spend_cents, cust) AS cd
        |FROM spend JOIN customer ON cust = c_custkey
        |ORDER BY nation, cust""".stripMargin,

    // Mirrors Relational.q47WindowProfileSampled: the q36 rolling-
    // hash sample replayed per nation, quartile cutoffs, map-side
    // bucket assignment.
    "q47_window_profile_sampled" ->
      """WITH spend AS (
        |  SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
        |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS spend_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |mm AS (
        |  SELECT greatest(20, (count(*) + 99999) // 100000) AS m
        |  FROM spend),
        |samp AS (
        |  SELECT spend.* FROM spend, mm
        |  WHERE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('q47-' || CAST(cust AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 2147483647) % mm.m = 0),
        |tiles AS (
        |  SELECT nation, cust, spend_cents,
        |    ntile(4) OVER (PARTITION BY nation
        |      ORDER BY spend_cents, cust) AS tile
        |  FROM samp),
        |bounds AS (
        |  SELECT nation, tile, max(spend_cents) AS b FROM tiles
        |  WHERE tile < 4 GROUP BY 1, 2),
        |assigned AS (
        |  SELECT s.nation, s.spend_cents,
        |    1 + (SELECT count(*) FROM bounds b
        |         WHERE b.nation = s.nation AND b.b < s.spend_cents)
        |      AS bucket
        |  FROM spend s)
        |SELECT nation, bucket, count(*) AS n_cust,
        |  min(spend_cents) AS min_cents, max(spend_cents) AS max_cents,
        |  CAST(sum(spend_cents) AS BIGINT) AS sum_cents
        |FROM assigned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
