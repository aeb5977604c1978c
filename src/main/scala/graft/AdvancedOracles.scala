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
  )
}
