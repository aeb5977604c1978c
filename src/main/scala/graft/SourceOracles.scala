package graft

/** DuckDB oracle SQL for SourceOps: each aggregates the ORIGINAL
  * parquet table — the Spark side must survive its format round-trip
  * with zero fidelity loss to match.
  */
object SourceOracles {
  val sql: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_orc_roundtrip" ->
      """SELECT p_brand, count(*) AS cnt,
        |  CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_sequence_roundtrip" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |    AS BIGINT)) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,

    "src_text_roundtrip" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,

    "src_parquet_zstd" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_text_escaped" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,

    "src_text_bzip2" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,

    "src_csv_lz4" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_csv_snappy" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors SourceOps.sortedMerge: the key_chain folds
    // (h*31 + key) % (2^31-1) over keys in ASCENDING key order — the
    // order the 3-run merge must reproduce; any transposition in the
    // merged stream diverges the chain.
    "src_sorted_merge" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list(o_orderkey ORDER BY o_orderkey)),
        |    (h, k) -> (h * 31 + k) % 2147483647) AS key_chain
        |FROM orders""".stripMargin,

    "src_avro_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_set_membership" -> {
      val probes = graft.operators.SourceOps.SET_PROBES
        .map(p => s"(CAST($p AS BIGINT))").mkString(", ")
      s"""WITH probes(probe_key) AS (VALUES $probes),
         |keys AS (SELECT DISTINCT o_custkey AS key FROM orders)
         |SELECT probe_key,
         |  CAST(CASE WHEN key IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |    AS present
         |FROM probes LEFT JOIN keys ON probe_key = key
         |ORDER BY probe_key""".stripMargin
    },

    "src_array_lookup" -> {
      val positions = graft.operators.SourceOps.ARRAY_POSITIONS.mkString(", ")
      s"""WITH ranked AS (
         |  SELECT o_orderkey,
         |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
         |    row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
         |  FROM orders)
         |SELECT CAST(pos AS BIGINT) AS pos, o_orderkey, cents
         |FROM ranked WHERE pos IN ($positions) ORDER BY pos""".stripMargin
    },

    "src_compaction" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,

    // Mirrors SourceOps.txnlogSnapshot: v1 holds slices l_orderkey%4
    // in {0,1}; latest holds every row (the compaction commit is
    // logically invariant, which this equality proves).
    "src_txnlog_snapshot" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents, 'v1' AS snap
        |FROM lineitem WHERE l_orderkey % 4 <= 1 GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents, 'latest' AS snap
        |FROM lineitem GROUP BY 1
        |ORDER BY snap, l_returnflag""".stripMargin,

    // Mirrors SourceOps.txnlogSkipping: the manifest prune must be
    // invisible to the result — same filter on the flat table.
    "src_txnlog_skipping" ->
      """SELECT count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 1200""".stripMargin,

    // Mirrors SourceOps.txnlogChanges: both ranges insert exactly
    // slices 2-3 and delete nothing — the fast (log-resolved) and
    // diff (exceptAll) paths must agree, and the compaction commit
    // must be row-level invisible.
    "src_txnlog_changes" ->
      """WITH s23 AS (
        |  SELECT l_returnflag, count(*) AS n_rows,
        |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |      AS qty_cents
        |  FROM lineitem WHERE l_orderkey % 4 IN (2, 3) GROUP BY 1)
        |SELECT l_returnflag, n_rows, qty_cents,
        |  'v1..latest' AS vrange, 'insert' AS change FROM s23
        |UNION ALL
        |SELECT l_returnflag, n_rows, qty_cents,
        |  'v1..v3' AS vrange, 'insert' AS change FROM s23
        |ORDER BY vrange, change, l_returnflag""".stripMargin,

    "src_txnlog_delete" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'deleted' AS side
        |FROM lineitem WHERE l_orderkey % 10 = 3 GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'latest' AS side
        |FROM lineitem WHERE l_orderkey % 10 <> 3 GROUP BY 1
        |ORDER BY side, l_returnflag""".stripMargin,

    "src_txnlog_cdf" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'delete' AS change
        |FROM lineitem
        |WHERE l_orderkey % 3 IN (0, 1) AND l_quantity >= 45 GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'insert' AS change
        |FROM lineitem WHERE l_orderkey % 3 IN (1, 2) GROUP BY 1
        |ORDER BY change, l_returnflag""".stripMargin,

    "src_txnlog_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST('APPEND' AS VARCHAR),
        |   CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  (1, 'APPEND',    1, 0, 0),
        |  (2, 'OPTIMIZE',  1, 2, 0),
        |  (3, 'DELETE',    1, 1, 1),
        |  (4, 'MERGE',     2, 1, 2),
        |  (5, 'STREAMING', 1, 0, 0))
        |  AS t(version, operation, n_adds, n_removes, n_cdc)
        |ORDER BY version""".stripMargin,

    "src_txnlog_zorder" ->
      """SELECT count(*) AS cnt,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  min(l_orderkey) AS min_order, max(l_orderkey) AS max_order
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 200
        |  AND l_suppkey BETWEEN 5 AND 20""".stripMargin,

    "src_txnlog_merge" ->
      """WITH odds AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 5 <> 0),
        |news AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |olds AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 <> 0),
        |latest AS (
        |  SELECT * FROM odds UNION ALL SELECT * FROM news)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'deleted' AS side
        |FROM olds GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'inserted' AS side
        |FROM news GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM latest GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_merge_into" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |upd AS (
        |  SELECT t.o_orderkey, t.o_orderstatus, t.p + s.p AS p
        |  FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
        |  WHERE s.p > 150000),
        |gone AS (
        |  SELECT t.o_orderkey, t.o_orderstatus, t.p
        |  FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
        |  WHERE s.p <= 50000),
        |ins AS (
        |  SELECT o_orderkey, o_orderstatus, p FROM src
        |  WHERE o_orderkey % 5 = 0 AND o_orderkey % 2 = 0),
        |latest AS (
        |  SELECT * FROM tgt
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM gone)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins),
        |oldimg AS (
        |  SELECT t.o_orderkey, t.o_orderstatus, t.p
        |  FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
        |  WHERE s.p > 150000 OR s.p <= 50000),
        |newimg AS (
        |  SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'deleted' AS side
        |FROM oldimg GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'inserted' AS side
        |FROM newimg GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM latest GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_partitioned" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'dropped' AS side
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'latest' AS side
        |FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  'pruned' AS side
        |FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
        |ORDER BY side, l_returnflag""".stripMargin,

    "src_txnlog_sql_dml" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders
        |  WHERE o_orderkey % 4 <> 3 AND o_orderkey % 10 <> 1),
        |src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 6 = 0),
        |latest AS (
        |  SELECT k, st, p FROM tgt
        |  WHERE k NOT IN (SELECT k FROM src)
        |  UNION ALL
        |  SELECT k, st, p FROM src
        |  WHERE k IN (SELECT k FROM tgt) AND p > 200000
        |  UNION ALL
        |  SELECT k, st, p FROM src WHERE k NOT IN (SELECT k FROM tgt))
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum
        |FROM latest GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_txnlog_merge_sync" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |upd AS (
        |  SELECT t.k, t.st, s.p FROM tgt t JOIN src s ON t.k = s.k),
        |ins AS (SELECT k, st, p FROM src WHERE k % 5 = 0),
        |bys AS (SELECT k, st, p FROM tgt WHERE k % 2 = 1),
        |bysupd AS (
        |  SELECT k, 'Z' AS st, p FROM bys WHERE p > 100000),
        |latest AS (
        |  SELECT k, st, p FROM upd
        |  UNION ALL SELECT k, st, p FROM ins
        |  UNION ALL SELECT k, st, p FROM bysupd),
        |oldimg AS (
        |  SELECT t.k, t.st, t.p FROM tgt t
        |  WHERE t.k % 2 = 0
        |  UNION ALL SELECT k, st, p FROM bys)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'deleted' AS side
        |FROM oldimg GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'inserted' AS side
        |FROM latest GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM latest GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_update" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders),
        |hit AS (SELECT k, st, p FROM tgt WHERE k % 10 = 1),
        |upd AS (SELECT k, 'U' AS st, p * 2 AS p FROM hit),
        |latest AS (
        |  SELECT k, st, p FROM tgt WHERE k % 10 <> 1
        |  UNION ALL SELECT k, st, p FROM upd)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM latest GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'before' AS side
        |FROM hit GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'deleted' AS side
        |FROM hit GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'inserted' AS side
        |FROM upd GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_insert" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt WHERE k % 3 = 0 GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'pre_overwrite' AS side
        |FROM tgt GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_restore" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'restored' AS side
        |FROM tgt WHERE st = 'F' GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_view" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'pinned' AS side
        |FROM tgt WHERE k % 2 = 1 GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'through_view' AS side
        |FROM tgt GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_constraints" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CASE WHEN o_orderkey % 100 = 7 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(2 AS BIGINT) AS n_rows,
        |  CAST(0 AS BIGINT) AS price_cents, CAST(0 AS BIGINT) AS key_sum,
        |  'refused' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_txnlog_rename" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders),
        |ren AS (
        |  SELECT k, st,
        |    CASE WHEN k % 10 = 3 THEN p * 2 ELSE p END AS p
        |  FROM tgt)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM ren GROUP BY 1
        |UNION ALL
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'pre_rename' AS side
        |FROM tgt GROUP BY 1
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogDv: the deleted window (keys 700-799)
    // is gone, the updated window (800-899) doubled; the audit row
    // pins merge-on-read (exactly ONE DV-carrying file — both fixed
    // windows land in the first of the four key-range files — with
    // every original file still live).
    "src_txnlog_dv" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CASE WHEN o_orderkey BETWEEN 800 AND 899
        |         THEN o_totalprice * 2
        |         ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderkey NOT BETWEEN 700 AND 799)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(0 AS BIGINT) AS key_sum,
        |  'dv' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogMergeForms: odd keys are the target;
    // the source's odd members (% 10 = 1) star-update to ('U', 3p),
    // its even members (% 10 = 0) insert through the column list
    // with a NULL-filled price.
    "src_txnlog_merge_forms" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |src AS (
        |  SELECT o_orderkey AS k, 'U' AS st, o_totalprice * 3 AS p
        |  FROM orders WHERE o_orderkey % 10 < 2),
        |merged AS (
        |  SELECT t.k,
        |    CASE WHEN s.k IS NOT NULL THEN s.st ELSE t.st END AS st,
        |    CASE WHEN s.k IS NOT NULL THEN s.p ELSE t.p END AS p
        |  FROM tgt t LEFT JOIN src s ON t.k = s.k
        |  UNION ALL
        |  SELECT s.k, s.st, NULL AS p FROM src s
        |  WHERE s.k NOT IN (SELECT k FROM tgt))
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(coalesce(CAST(round(p*100) AS BIGINT), 0)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum,
        |  CAST(sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_price
        |FROM merged GROUP BY 1
        |ORDER BY o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogMergeDv: keys 700-749 deleted, 750-799
    // re-priced to status 'U', the window shifted +20M inserted as
    // status 'N'; the audit row pins merge-on-read (one DV-carrying
    // file, every original file still live).
    "src_txnlog_merge_dv" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey BETWEEN 750 AND 799 THEN 'U'
        |         ELSE o_orderstatus END AS st,
        |    CASE WHEN o_orderkey BETWEEN 750 AND 799
        |         THEN o_totalprice * 2
        |         ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderkey NOT BETWEEN 700 AND 749
        |  UNION ALL
        |  SELECT o_orderkey + 20000000 AS k, 'N' AS st, 1.0 AS p
        |  FROM orders WHERE o_orderkey BETWEEN 700 AND 799)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(0 AS BIGINT) AS key_sum,
        |  'dv' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogReplaceWhere: the F partition's rows
    // replaced by their doubled-price twins in one scoped commit;
    // the audit row pins (one commit, out-of-scope files kept,
    // in-scope files gone).
    "src_txnlog_replace_where" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(1 AS BIGINT) AS key_sum,
        |  'rw' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogDvSidecar: the odd keys of the 700-899
    // window are dead; the audit row pins the sidecar contract (the
    // stamped token is an @ ref, every original file still live,
    // protocol floor 3).
    "src_txnlog_dv_sidecar" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey BETWEEN 700 AND 899
        |             AND o_orderkey % 2 = 1))
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(3 AS BIGINT) AS key_sum,
        |  'dv' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogEvolveWrite: evens landed narrow (no
    // status, bucketed __pre__), odds landed through the mergeSchema
    // evolution; the audit row pins (one commit, widened-to-BIGINT,
    // protocol floor 2).
    "src_txnlog_evolve_write" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
        |         ELSE '__pre__' END AS st,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(p) AS BIGINT) AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(2 AS BIGINT) AS key_sum,
        |  'evolve' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogReplaceWhereExpr: the 700-899 key
    // window's rows are replaced by doubled-price twins in one
    // general-replaceWhere commit; the audit row pins (one commit,
    // stats-pruned out-of-scope files kept).
    "src_txnlog_replace_where_expr" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CASE WHEN o_orderkey BETWEEN 700 AND 899
        |         THEN o_totalprice * 2 ELSE o_totalprice END AS p
        |  FROM orders)
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(0 AS BIGINT) AS key_sum,
        |  'rwe' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogClone: the clone dropped its F
    // partition while the source appended a sentinel; the audit row
    // pins (zero-copy fork, divergence isolated both ways).
    "src_txnlog_clone" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice AS p
        |  FROM orders WHERE o_orderstatus <> 'F')
        |SELECT st AS o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(p*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(0 AS BIGINT) AS key_sum,
        |  'clone' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogCreateOrReplace: the replacing CTAS's
    // result is exactly orders; the audit row pins (one atomic
    // replace commit, declared layout took, tokens recorded).
    "src_txnlog_create_or_replace" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS price_cents, CAST(1 AS BIGINT) AS key_sum,
        |  'cor' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    // Mirrors SourceOps.txnlogDefaults: evens landed pre-evolution
    // (stamped 'en', backfilled q=7), odds post-evolution (explicit
    // NULL lang, q=9); the audit row pins the v4 protocol floor.
    "src_txnlog_defaults" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'en'
        |         ELSE '__null__' END AS lang,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 7 ELSE 9 END AS q
        |  FROM orders)
        |SELECT lang, CAST(q AS BIGINT) AS q, count(*) AS n_rows,
        |  CAST(sum(k) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM tgt GROUP BY 1, 2
        |UNION ALL
        |SELECT '__audit__' AS lang, CAST(4 AS BIGINT) AS q,
        |  CAST(1 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS key_sum,
        |  'def' AS side
        |ORDER BY side, lang, q""".stripMargin,

    // Mirrors SourceOps.txnlogCreate: the DDL-first table holds
    // exactly orders; the audit row pins (partitions after insert =
    // distinct statuses, partitions pre-data = 0, pruning flag = 1).
    "src_txnlog_create" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum, 'latest' AS side
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT '__audit__' AS o_orderstatus,
        |  (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT)
        |   FROM orders) AS n_rows,
        |  CAST(0 AS BIGINT) AS price_cents, CAST(1 AS BIGINT) AS key_sum,
        |  'audit' AS side
        |ORDER BY side, o_orderstatus""".stripMargin,

    "src_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_range_lookup" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 1099
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_bucketed_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderkey IN (42, 777)
        |ORDER BY o_orderkey""".stripMargin,

    "src_bloom_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderkey IN (42, 777, 4242, 900000007)
        |ORDER BY o_orderkey""".stripMargin,

    "src_zorder_lookup" ->
      """SELECT count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  min(l_orderkey) AS min_order, max(l_orderkey) AS max_order
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 200
        |  AND l_suppkey BETWEEN 5 AND 20""".stripMargin,

    // v1 batch = even keys (no price column), v2 batch = odd keys
    // (adds total_cents); the merged read must null-fill v1 rows
    "src_schema_evolution" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_price,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_nested_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "src_partitioned_prune" ->
      """SELECT count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,
  )
}
