package graft

/** DuckDB oracle SQL for Dedup, Similarity, and Multimodal.
  *
  * `dedup_minhash_lsh`, `dedup_simhash`, and `sim_knn_lsh` are
  * rows-only (their hash families are Spark-side xxhash64 /
  * seeded-RNG constructs DuckDB cannot reproduce); their correctness
  * is spec-verified against the exact operators instead.
  *
  * Cosine comparisons CAST the float lists to DOUBLE[] so DuckDB
  * accumulates in double like the Spark expression; emitted columns
  * avoid raw cosines entirely (pair ids and ranks only — membership
  * gaps were measured >= 1.1e-3 vs threshold and >= 1.9e-5 between
  * ranks, orders of magnitude above any accumulation-order noise).
  */
object PipelineOracles {
  private val shingles =
    """SELECT DISTINCT doc_id, t[i] || '_' || t[i+1] || '_' || t[i+2] AS sh
      |FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |            FROM documents))""".stripMargin

  /** Octet-exact stub dims: byte k of the UTF-8 payload via
    * substr(hex(encode(text)), 2k-1, 2) — matches Spark bytes(k-1). */
  private val mmDims =
    """SELECT doc_id, text,
      |  CASE WHEN octet_length(encode(text)) >= 1
      |    THEN (CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS BIGINT)
      |          % 64) + 1
      |    ELSE CAST(0 AS BIGINT) END AS w,
      |  CASE WHEN octet_length(encode(text)) >= 2
      |    THEN (CAST(('0x' || substr(hex(encode(text)), 3, 2)) AS BIGINT)
      |          % 64) + 1
      |    ELSE CAST(0 AS BIGINT) END AS h
      |FROM documents""".stripMargin

  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($shingles),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT x, y, inter, sa.n AS na, sb.n AS nb,
         |  (100 * inter) // (sa.n + sb.n - inter) AS jac_pct
         |FROM pairs JOIN sz sa ON x = sa.doc_id JOIN sz sb ON y = sb.doc_id
         |WHERE inter * 9 >= (sa.n + sb.n) * 4
         |ORDER BY x, y""".stripMargin,

    "dedup_embedding" ->
      """SELECT a.vec_id AS x, b.vec_id AS y
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY x, y""".stripMargin,

    "sim_knn_brute" ->
      """SELECT q_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT)
        |      AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "emb_quantize" ->
      """SELECT vec_id,
        |  list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> abs(x))) AS scale,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  list_min(q) AS q_min, list_max(q) AS q_max
        |FROM (
        |  SELECT vec_id, embedding,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 127 / list_max(list_transform(
        |        CAST(embedding AS DOUBLE[]), y -> abs(y)))) AS BIGINT)) AS q
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    // mm_* oracles are OCTET-based (encode + hex-substring byte
    // extraction), mirroring Spark's raw-byte stub decode exactly for
    // any UTF-8 input — DuckDB's ascii/substr are character-based and
    // would diverge from bytes(0)/bytes(1) on multi-byte text.
    "mm_resize" ->
      s"""SELECT doc_id, w AS width, h AS height,
         |  CASE WHEN greatest(w, h) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE (w * 16) // greatest(w, h) END AS thumb_w,
         |  CASE WHEN greatest(w, h) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE (h * 16) // greatest(w, h) END AS thumb_h
         |FROM ($mmDims) ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) // 256 AS BIGINT) AS n_frames,
        |  md5(substr(hex(encode(text)), 1, 512)) AS frame0_digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS digest, w AS width, h AS height
         |FROM ($mmDims) ORDER BY doc_id""".stripMargin,
  )
}
