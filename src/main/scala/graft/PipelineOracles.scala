package graft

/** DuckDB oracle SQL for Dedup, Similarity, and Multimodal.
  *
  * Every query here has a FULL hash-match oracle. The approximate
  * operators (minhash, simhash, hyperplane LSH, IVF) are exactly
  * reproducible because their hash families were chosen
  * DuckDB-expressible: rolling-hash folds (mirrored via list_reduce
  * over codepoints), closed-form universal-hash parameters, LCG-bit
  * ±1 hyperplanes, and exact-integer centroid sums — see the
  * operator scaladocs in operators/Dedup.scala and
  * operators/Similarity.scala.
  *
  * Cosine comparisons CAST the float lists to DOUBLE[] so DuckDB
  * accumulates in double like the Spark expression; emitted columns
  * avoid raw cosines entirely (pair ids and ranks only — membership
  * gaps were measured >= 1.1e-3 vs threshold and >= 1.9e-5 between
  * ranks, orders of magnitude above any accumulation-order noise).
  */
object PipelineOracles {
  /** Rolling-hash fold of string expression `s` with multiplier `m`,
    * mirroring graft.functions.RollingHash: fold(h*m + codepoint)
    * mod 2^31-1 over every codepoint (dotall). */
  private def rollFold(s: String, m: Int = 31): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(regexp_extract_all($s, '(?s).'),
       |        c -> CAST(unicode(c) AS BIGINT))),
       |    (h, c) -> (h * $m + c) % 2147483647)""".stripMargin
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

  /** The IVF/k-means training chain (mirrors Similarity.trainedCells):
    * deterministic 50% hash sample, label-seeded centroids, two Lloyd
    * iterations with exact-integer M-steps and cell-id tie-broken
    * E-steps, then the corpus-wide assignment to the trained cells.
    * Shared by sim_knn_ivf (which probes it) and ml_kmeans (which
    * audits it). Usable as `WITH $ivfTrainedCorpus, more AS (...)`. */
  /** The IVF query path as CTEs (nprobe=3 probe + exact re-rank to
    * rank ≤ 5 in `approx`), usable after [[ivfTrainedCorpus]].
    * Shared by sim_knn_ivf and sim_recall_audit — one definition of
    * what "the index returned" means for both the query and its
    * quality audit. */
  private val ivfTopK: String =
    """probed AS (
      |  SELECT q_id, cell FROM (
      |    SELECT q.vec_id AS q_id, c.cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS crank
      |    FROM embeddings q CROSS JOIN c2 c
      |    WHERE q.vec_id < 20)
      |  WHERE crank <= 3),
      |icand AS (
      |  SELECT p.q_id, a.vec_id
      |  FROM probed p JOIN corpus a ON a.cell = p.cell
      |  WHERE a.vec_id <> p.q_id),
      |approx AS (
      |  SELECT q_id, neighbor_id, rank FROM (
      |    SELECT icand.q_id, icand.vec_id AS neighbor_id,
      |      CAST(row_number() OVER (PARTITION BY icand.q_id
      |        ORDER BY list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
      |          CAST(ce.embedding AS DOUBLE[])) DESC, icand.vec_id) AS BIGINT)
      |        AS rank
      |    FROM icand
      |    JOIN embeddings qe ON qe.vec_id = icand.q_id
      |    JOIN embeddings ce ON ce.vec_id = icand.vec_id)
      |  WHERE rank <= 5)""".stripMargin

  /** Exact brute-force top-5 as a `truth` CTE — shared by
    * sim_knn_brute and sim_recall_audit's ground-truth side. */
  private val bruteTopK: String =
    """truth AS (
      |  SELECT q_id, neighbor_id, rank FROM (
      |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |      CAST(row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT)
      |        AS rank
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5)""".stripMargin

  private val ivfTrainedCorpus: String =
    """samp AS (
      |  SELECT vec_id, embedding, CAST(label AS BIGINT) AS cell
      |  FROM embeddings
      |  WHERE list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(regexp_extract_all(
      |          md5('ivf-' || CAST(vec_id AS VARCHAR)), '(?s).'),
      |          c -> CAST(unicode(c) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 2147483647) % 2 = 0),
      |c0 AS (
      |  SELECT cell,
      |    list_transform(list(m ORDER BY i), v -> CAST(v AS FLOAT))
      |      AS centroid
      |  FROM (
      |    SELECT cell, i,
      |      sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
      |          AS BIGINT)) AS m
      |    FROM samp CROSS JOIN generate_series(1, 64) g(i)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |a1 AS (
      |  SELECT vec_id, cell, embedding FROM (
      |    SELECT s.vec_id, c.cell, s.embedding,
      |      row_number() OVER (PARTITION BY s.vec_id
      |        ORDER BY list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
      |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS rn
      |    FROM samp s CROSS JOIN c0 c)
      |  WHERE rn = 1),
      |c1 AS (
      |  SELECT cell,
      |    list_transform(list(m ORDER BY i), v -> CAST(v AS FLOAT))
      |      AS centroid
      |  FROM (
      |    SELECT cell, i,
      |      sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
      |          AS BIGINT)) AS m
      |    FROM a1 CROSS JOIN generate_series(1, 64) g(i)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |a2 AS (
      |  SELECT vec_id, cell, embedding FROM (
      |    SELECT s.vec_id, c.cell, s.embedding,
      |      row_number() OVER (PARTITION BY s.vec_id
      |        ORDER BY list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
      |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS rn
      |    FROM samp s CROSS JOIN c1 c)
      |  WHERE rn = 1),
      |c2 AS (
      |  SELECT cell,
      |    list_transform(list(m ORDER BY i), v -> CAST(v AS FLOAT))
      |      AS centroid
      |  FROM (
      |    SELECT cell, i,
      |      sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
      |          AS BIGINT)) AS m
      |    FROM a2 CROSS JOIN generate_series(1, 64) g(i)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |corpus AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT e.vec_id, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS rn
      |    FROM embeddings e CROSS JOIN c2 c)
      |  WHERE rn = 1)""".stripMargin

  /** The emb_pq training + encode CTE chain (comps_all..enc) —
    * shared by emb_pq (which emits the codes) and sim_knn_pq (which
    * searches them with ADC tables). Usable as
    * `WITH $pqCtes SELECT ...` or `WITH $pqCtes, more AS (...)`. */
  private val pqCtes: String =
    """comps_all AS (
        |  SELECT vec_id, (i - 1) // 16 AS ss, i,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS x
        |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
        |samp AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS cell FROM embeddings
        |  WHERE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('pq-' || CAST(vec_id AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 2147483647) % 2 = 0),
        |scomps AS (
        |  SELECT c.vec_id, c.ss, c.i, c.x
        |  FROM comps_all c JOIN samp USING (vec_id)),
        |b0 AS (
        |  SELECT c.ss, s.cell, c.i,
        |    CAST(sum(c.x) AS BIGINT) // count(*) AS c
        |  FROM scomps c JOIN samp s USING (vec_id)
        |  GROUP BY 1, 2, 3),
        |a1 AS (
        |  SELECT vec_id, ss, cell FROM (
        |    SELECT d.*, row_number() OVER (PARTITION BY vec_id, ss
        |      ORDER BY d2, cell) AS rn
        |    FROM (
        |      SELECT sc.vec_id, sc.ss, b.cell,
        |        CAST(sum((sc.x - b.c) * (sc.x - b.c)) AS BIGINT) AS d2
        |      FROM scomps sc JOIN b0 b ON sc.ss = b.ss AND sc.i = b.i
        |      GROUP BY 1, 2, 3) d)
        |  WHERE rn = 1),
        |b1 AS (
        |  SELECT sc.ss, a.cell, sc.i,
        |    CAST(sum(sc.x) AS BIGINT) // count(*) AS c
        |  FROM scomps sc JOIN a1 a ON sc.vec_id = a.vec_id AND sc.ss = a.ss
        |  GROUP BY 1, 2, 3),
        |a2 AS (
        |  SELECT vec_id, ss, cell FROM (
        |    SELECT d.*, row_number() OVER (PARTITION BY vec_id, ss
        |      ORDER BY d2, cell) AS rn
        |    FROM (
        |      SELECT sc.vec_id, sc.ss, b.cell,
        |        CAST(sum((sc.x - b.c) * (sc.x - b.c)) AS BIGINT) AS d2
        |      FROM scomps sc JOIN b1 b ON sc.ss = b.ss AND sc.i = b.i
        |      GROUP BY 1, 2, 3) d)
        |  WHERE rn = 1),
        |b2 AS (
        |  SELECT sc.ss, a.cell, sc.i,
        |    CAST(sum(sc.x) AS BIGINT) // count(*) AS c
        |  FROM scomps sc JOIN a2 a ON sc.vec_id = a.vec_id AND sc.ss = a.ss
        |  GROUP BY 1, 2, 3),
        |enc AS (
        |  SELECT vec_id, ss, cell, d2 FROM (
        |    SELECT d.*, row_number() OVER (PARTITION BY vec_id, ss
        |      ORDER BY d2, cell) AS rn
        |    FROM (
        |      SELECT c.vec_id, c.ss, b.cell,
        |        CAST(sum((c.x - b.c) * (c.x - b.c)) AS BIGINT) AS d2
        |      FROM comps_all c JOIN b2 b ON c.ss = b.ss AND c.i = b.i
        |      GROUP BY 1, 2, 3) d)
        |  WHERE rn = 1)"""
      .stripMargin

  /** [[pqCtes]] with every CTE name prefixed `pq_`, so it can share a
    * WITH clause with [[ivfTrainedCorpus]] (both define samp/a1/a2).
    * Word-boundary rename; column names are untouched. */
  private val pqCtesPrefixed: String =
    Seq("comps_all", "samp", "scomps", "b0", "a1", "b1", "a2", "b2", "enc")
      .foldLeft(pqCtes)((s, n) => s.replaceAll(s"\\b$n\\b", "pq_" + n))

  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Dedup.incremental: the doc_id ≡ 0 (mod 5) batch deduped
    // against the rest-of-corpus fingerprint set, then first-of-fp
    // within the batch; single-row admission audit record.
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 5 = 0),
        |corpus AS (
        |  SELECT DISTINCT md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 5 <> 0),
        |fresh AS (
        |  SELECT b.doc_id, b.fp FROM batch b
        |  LEFT JOIN corpus c ON b.fp = c.fp WHERE c.fp IS NULL),
        |admitted AS (
        |  SELECT fp, min(doc_id) AS keep_id FROM fresh GROUP BY fp)
        |SELECT
        |  (SELECT count(*) FROM batch) AS batch_size,
        |  (SELECT count(*) FROM batch) - (SELECT count(*) FROM fresh)
        |    AS n_dup_vs_corpus,
        |  (SELECT count(*) FROM fresh) - (SELECT count(*) FROM admitted)
        |    AS n_dup_in_batch,
        |  (SELECT count(*) FROM admitted) AS n_admitted,
        |  (SELECT CAST(coalesce(sum(keep_id), 0) AS BIGINT) FROM admitted)
        |    AS admitted_id_sum""".stripMargin,

    // Mirrors Similarity.kmeansClusters: per-cell audit of the SAME
    // trained corpus assignment sim_knn_ivf probes.
    "ml_kmeans" ->
      s"""WITH $ivfTrainedCorpus
         |SELECT cell, count(*) AS n_vecs,
         |  min(vec_id) AS min_vec, max(vec_id) AS max_vec,
         |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
         |FROM corpus GROUP BY cell ORDER BY cell""".stripMargin,

    // Mirrors Dedup.bloomAdmit: same count-derived bitmap width
    // (smallest power of two >= 16n), same badm{i}- md5-fold probe
    // family, hit = all three positions set, exact verify on hits.
    "dedup_bloom_admit" -> {
      def pos(i: Int): String =
        "(" + rollFold(s"md5('badm$i-' || fp)") + ") % mb.m"
      s"""WITH fps AS (
         |  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
         |corpus AS (
         |  SELECT DISTINCT fp FROM fps WHERE doc_id % 5 <> 0),
         |nn AS (SELECT count(*) AS n FROM corpus),
         |mb AS (
         |  SELECT CASE WHEN n <= 0 THEN 16 ELSE CAST(1 AS BIGINT) <<
         |    (coalesce((SELECT max(j) + 1 FROM range(63) g(j), nn
         |               WHERE (CAST(1 AS BIGINT) << j) < 16 * nn.n), 0))
         |    END AS m
         |  FROM nn),
         |bits AS (
         |  SELECT DISTINCT ${pos(0)} AS pos FROM corpus, mb
         |  UNION SELECT DISTINCT ${pos(1)} FROM corpus, mb
         |  UNION SELECT DISTINCT ${pos(2)} FROM corpus, mb),
         |batch AS (
         |  SELECT doc_id, fp FROM fps WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, fp FROM fps
         |  WHERE doc_id % 5 <> 0 AND doc_id % 7 = 3),
         |probed AS (
         |  SELECT doc_id, fp,
         |    CAST(${pos(0)} IN (SELECT pos FROM bits)
         |     AND ${pos(1)} IN (SELECT pos FROM bits)
         |     AND ${pos(2)} IN (SELECT pos FROM bits) AS BIGINT) AS hit,
         |    CAST(fp IN (SELECT fp FROM corpus) AS BIGINT) AS in_corpus
         |  FROM batch, mb)
         |SELECT count(*) AS batch_size,
         |  CAST(sum(hit) AS BIGINT) AS n_bloom_hit,
         |  CAST(sum(in_corpus) AS BIGINT) AS n_true_dup,
         |  CAST(sum(hit * (1 - in_corpus)) AS BIGINT) AS n_false_pos,
         |  CAST(sum(1 - in_corpus) AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN in_corpus = 0 THEN doc_id ELSE 0 END)
         |    AS BIGINT) AS admitted_id_sum
         |FROM probed""".stripMargin
    },

    // Mirrors Dedup.semantic: the SAME trained corpus assignment,
    // intra-cell pairwise exact cosine, drop-on-lower-id-neighbor at
    // the shared 0.45 threshold.
    "dedup_semantic" ->
      s"""WITH $ivfTrainedCorpus,
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM corpus a
         |  JOIN corpus b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |          CAST(eb.embedding AS DOUBLE[])) >= 0.45)
         |SELECT c.vec_id, c.cell,
         |  CAST(d.vec_id IS NULL AS BIGINT) AS kept
         |FROM corpus c LEFT JOIN dropped d ON c.vec_id = d.vec_id
         |ORDER BY c.vec_id""".stripMargin,

    // Mirrors Similarity.kmeansUpdate: the %5 batch assigned to the
    // SAME trained centroids (c2 of the shared chain), fit cosine in
    // floor-micro units, per-cell freshness stats.
    "ml_kmeans_update" ->
      s"""WITH $ivfTrainedCorpus,
         |fit AS (
         |  SELECT vec_id, cell,
         |    CAST(floor(cos * 1000000) AS BIGINT) AS cos_micro
         |  FROM (
         |    SELECT e.vec_id, c.cell,
         |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |        CAST(c.centroid AS DOUBLE[])) AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN c2 c
         |    WHERE e.vec_id % 5 = 0)
         |  WHERE rn = 1)
         |SELECT cell, count(*) AS n_new,
         |  min(cos_micro) AS min_cos_micro,
         |  CAST(sum(cos_micro) AS BIGINT) AS sum_cos_micro,
         |  max(cos_micro) AS max_cos_micro
         |FROM fit GROUP BY 1 ORDER BY cell""".stripMargin,

    // Mirrors Similarity.clusterSample: same trained cells, same
    // md5-fold rank, same per-cell cutoff.
    "ml_cluster_sample" ->
      s"""WITH $ivfTrainedCorpus,
         |ranked AS (
         |  SELECT cell, vec_id,
         |    CAST(row_number() OVER (PARTITION BY cell ORDER BY
         |      list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(regexp_extract_all(
         |          md5('cs-' || CAST(vec_id AS VARCHAR)), '(?s).'),
         |          c -> CAST(unicode(c) AS BIGINT))),
         |        (h, c) -> (h * 31 + c) % 2147483647), vec_id)
         |      AS BIGINT) AS rk
         |  FROM corpus)
         |SELECT cell, rk, vec_id FROM ranked WHERE rk <= 5
         |ORDER BY cell, rk""".stripMargin,

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

    "dedup_substring" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(t, i, i + 7), ' ') AS win
        |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8
        |)
        |SELECT
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(win, '(?s).'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS wfp,
        |  md5(win) AS wmd5,
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM wins
        |GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY 1, 2""".stripMargin,

    // Mirrors Dedup.substringMax: same 8-token window keys as
    // dedup_substring, cross-doc keys kept, per-doc gaps-and-islands
    // (pos − row_number) merged into maximal runs, each run re-sliced
    // from the token array and fingerprinted corpus-wide.
    "dedup_substring_max" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents
         |), keyed AS (
         |  SELECT doc_id, i AS pos,
         |    ${rollFold("array_to_string(list_slice(t, i, i + 7), ' ')")}
         |      AS wfp,
         |    md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS wmd5
         |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
         |  WHERE len(t) >= 8
         |), dupk AS (
         |  SELECT wfp, wmd5 FROM keyed
         |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
         |), isl AS (
         |  SELECT k.doc_id, k.pos,
         |    k.pos - row_number() OVER (PARTITION BY k.doc_id
         |      ORDER BY k.pos) AS g
         |  FROM keyed k JOIN dupk USING (wfp, wmd5)
         |), runs AS (
         |  SELECT doc_id, min(pos) AS start,
         |    max(pos) - min(pos) + 8 AS len_tokens
         |  FROM isl GROUP BY doc_id, g
         |), pass AS (
         |  SELECT r.doc_id, CAST(r.len_tokens AS BIGINT) AS len_tokens,
         |    md5(array_to_string(
         |      list_slice(t.t, r.start, r.start + r.len_tokens - 1), ' '))
         |      AS passage_fp
         |  FROM runs r JOIN toks t USING (doc_id))
         |SELECT passage_fp, len_tokens,
         |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM pass GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // Mirrors Dedup.substringScrub: the substring_max island runs as
    // token spans, every covered token dropped, the kept tokens
    // re-joined single-spaced and fingerprinted per doc.
    "dedup_substring_scrub" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents
         |), keyed AS (
         |  SELECT doc_id, i AS pos,
         |    ${rollFold("array_to_string(list_slice(t, i, i + 7), ' ')")}
         |      AS wfp,
         |    md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS wmd5
         |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
         |  WHERE len(t) >= 8
         |), dupk AS (
         |  SELECT wfp, wmd5 FROM keyed
         |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
         |), isl AS (
         |  SELECT k.doc_id, k.pos,
         |    k.pos - row_number() OVER (PARTITION BY k.doc_id
         |      ORDER BY k.pos) AS g
         |  FROM keyed k JOIN dupk USING (wfp, wmd5)
         |), runs AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
         |  FROM isl GROUP BY doc_id, g
         |), tok_idx AS (
         |  SELECT doc_id, i, t[i] AS tok
         |  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
         |), kept AS (
         |  SELECT k.doc_id, k.i, k.tok
         |  FROM tok_idx k
         |  WHERE NOT EXISTS (SELECT 1 FROM runs r
         |    WHERE r.doc_id = k.doc_id AND k.i BETWEEN r.s AND r.e)
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY i) AS clean
         |  FROM kept GROUP BY doc_id)
         |SELECT toks.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
         |  md5(COALESCE(a.clean, '')) AS clean_fp
         |FROM toks LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "dedup_survivor" ->
      """SELECT fp, keep_id, keep_chars, n_dups FROM (
        |  SELECT fp, doc_id AS keep_id, n_chars AS keep_chars,
        |    row_number() OVER (PARTITION BY fp
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY fp) AS n_dups
        |  FROM (SELECT doc_id, n_chars, md5(lower(trim(text))) AS fp
        |        FROM documents))
        |WHERE rn = 1 ORDER BY fp""".stripMargin,

    // Mirrors Dedup.minhashLsh end to end: rolling-hash base, 128
    // permutations with closed-form (a_i, b_i) (seed 42 => 43+i), 16
    // bands x 8 rows folded polynomially, exact-Jaccard verification
    // of the candidate pairs only.
    "dedup_minhash_lsh" ->
      s"""WITH sh AS ($shingles),
         |hv AS (SELECT doc_id, sh, ${rollFold("sh")} AS h FROM sh),
         |sig AS (
         |  SELECT doc_id, i,
         |    min(((((43 + i) * 2654435761) % 2147483647) * h
         |         + ((43 + i) * 1013904223) % 2147483647) % 2147483647) AS m
         |  FROM hv CROSS JOIN range(128) g(i)
         |  GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // 8 AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(m ORDER BY i)),
         |      (a, v) -> (a * 31 + v) % 2147483647) AS bh
         |  FROM sig GROUP BY doc_id, i // 8),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT c.x, c.y, count(*) AS inter
         |  FROM cand c
         |  JOIN sh p ON p.doc_id = c.x
         |  JOIN sh q ON q.doc_id = c.y AND q.sh = p.sh
         |  GROUP BY 1, 2)
         |SELECT i.x, i.y, (100 * i.inter) // (sa.n + sb.n - i.inter) AS jac_pct
         |FROM inter i
         |JOIN sz sa ON i.x = sa.doc_id JOIN sz sb ON i.y = sb.doc_id
         |WHERE i.inter * 9 >= (sa.n + sb.n) * 4
         |ORDER BY 1, 2""".stripMargin,

    // Mirrors Dedup.simhash: 62-bit word hash = fold31 << 31 | fold131,
    // classic weighted-bit-counter signature (bits 62/63 always 0, so
    // range(62) suffices), 4x16-bit bands, exact Hamming verify.
    // same pair pipeline as dedup_minhash_lsh, then component labels
    // via recursive reachability (component = min reachable doc_id)
    "dedup_components" ->
      s"""WITH RECURSIVE sh AS ($shingles),
         |hv AS (SELECT doc_id, sh, ${rollFold("sh")} AS h FROM sh),
         |sig AS (
         |  SELECT doc_id, i,
         |    min(((((43 + i) * 2654435761) % 2147483647) * h
         |         + ((43 + i) * 1013904223) % 2147483647) % 2147483647) AS m
         |  FROM hv CROSS JOIN range(128) g(i)
         |  GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // 8 AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(m ORDER BY i)),
         |      (a, v) -> (a * 31 + v) % 2147483647) AS bh
         |  FROM sig GROUP BY doc_id, i // 8),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT c.x, c.y, count(*) AS inter
         |  FROM cand c
         |  JOIN sh p ON p.doc_id = c.x
         |  JOIN sh q ON q.doc_id = c.y AND q.sh = p.sh
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT i.x, i.y
         |  FROM inter i
         |  JOIN sz sa ON i.x = sa.doc_id JOIN sz sb ON i.y = sb.doc_id
         |  WHERE i.inter * 9 >= (sa.n + sb.n) * 4),
         |ed AS (SELECT x, y FROM pairs UNION ALL SELECT y, x FROM pairs),
         |nodes AS (SELECT DISTINCT x AS v FROM ed),
         |reach(a, b) AS (
         |  SELECT v, v FROM nodes
         |  UNION
         |  SELECT r.a, e.y FROM reach r JOIN ed e ON e.x = r.b),
         |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY 1),
         |clus AS (
         |  SELECT component, n_members, doc_id AS keep_id FROM (
         |    SELECT c.component, c.doc_id,
         |      count(*) OVER (PARTITION BY c.component) AS n_members,
         |      row_number() OVER (PARTITION BY c.component
         |        ORDER BY d.n_chars DESC, c.doc_id) AS rn
         |    FROM comp c JOIN documents d USING (doc_id))
         |  WHERE rn = 1)
         |SELECT c.doc_id, c.component, s.n_members, s.keep_id
         |FROM comp c JOIN clus s USING (component)
         |ORDER BY c.doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH words AS (
         |  SELECT doc_id, word, count(*) AS w FROM (
         |    SELECT doc_id,
         |      unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |    FROM documents)
         |  WHERE length(word) > 0 GROUP BY 1, 2),
         |wh AS (
         |  SELECT doc_id, w,
         |    ${rollFold("word", 31)} * 2147483648 + ${rollFold("word", 131)}
         |      AS h
         |  FROM words),
         |bits AS (
         |  SELECT doc_id, j,
         |    sum(CASE WHEN (h >> j) & 1 = 1 THEN w ELSE -w END) AS c
         |  FROM wh CROSS JOIN range(62) g(j)
         |  GROUP BY 1, 2),
         |sigs AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j)
         |             ELSE 0 END) AS BIGINT) AS sig
         |  FROM bits GROUP BY 1),
         |bands AS (
         |  SELECT doc_id, sig, b AS band, (sig >> (b * 16)) & 65535 AS bv
         |  FROM sigs CROSS JOIN range(4) g(b))
         |SELECT DISTINCT a.doc_id AS x, b.doc_id AS y,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY 1, 2""".stripMargin,

    // reference-only baseline: vec_id < 65536 mirrors Dedup.EmbeddingCap
    "dedup_embedding_exact_smoke" ->
      """SELECT a.vec_id AS x, b.vec_id AS y
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 65536 AND b.vec_id < 65536
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY x, y""".stripMargin,

    // Mirrors Dedup.embeddingLsh with the SAME corpus-driven
    // constants: band_bits = ceil(log2 n) - 4 clamped to [4, 62]
    // (ceil(log2 n) computed integer-exactly as max{j: 2^j < n} + 1,
    // the twin of Scala's 64 - numberOfLeadingZeros(n-1)), 4 bands,
    // plane j's bucket bit = j % band_bits of band j // band_bits,
    // self-join per bucket, cross-band pair dedup, exact cosine
    // >= 0.45 verify — identical planes/banding/arithmetic.
    "dedup_embedding_lsh" ->
      """WITH nn AS (SELECT count(*) AS n FROM embeddings),
        |bb AS (
        |  SELECT least(62, greatest(4,
        |    coalesce((SELECT max(j) + 1 FROM range(63) g(j), nn
        |              WHERE (CAST(1 AS BIGINT) << j) < nn.n), 0) - 4))
        |    AS band_bits
        |  FROM nn),
        |dots AS (
        |  SELECT vec_id, j,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, 64),
        |        k -> CAST(embedding[k] AS DOUBLE) *
        |             (CASE WHEN unicode(substr(md5(
        |                    CAST(j AS VARCHAR) || '-' ||
        |                    CAST(k - 1 AS VARCHAR)), 1, 1)) & 1 = 1
        |                   THEN CAST(1 AS DOUBLE)
        |                   ELSE CAST(-1 AS DOUBLE) END))),
        |      (a, x) -> a + x) AS dot
        |  FROM embeddings CROSS JOIN range(248) g(j), bb
        |  WHERE j < 4 * bb.band_bits),
        |bands AS (
        |  SELECT vec_id, j // bb.band_bits AS band,
        |    CAST(sum(CASE WHEN dot >= 0
        |             THEN (CAST(1 AS BIGINT) << (j % bb.band_bits))
        |             ELSE 0 END) AS BIGINT) AS bv
        |  FROM dots, bb GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS x, c.vec_id AS y
        |  FROM bands a JOIN bands c
        |  ON a.band = c.band AND a.bv = c.bv AND a.vec_id < c.vec_id)
        |SELECT x, y FROM cand
        |JOIN embeddings ea ON ea.vec_id = x
        |JOIN embeddings eb ON eb.vec_id = y
        |WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |    CAST(eb.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY x, y""".stripMargin,

    "sim_range_search" ->
      """SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id
        |FROM embeddings q, embeddings c
        |WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
        |  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |    CAST(c.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY q_id, neighbor_id""".stripMargin,

    // norm² via the identical left fold: prepend 0.0, add x·x in
    // index order — both engines replay the same double chain
    "emb_norms" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
        |    (a, x) -> a + x) AS norm_sq,
        |  CAST(len(list_filter(embedding, x -> x = 0)) AS BIGINT)
        |    AS n_zeros
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "sim_knn_brute" ->
      s"""WITH $bruteTopK
        |SELECT q_id, neighbor_id, rank FROM truth
        |ORDER BY q_id, rank""".stripMargin,

    // Mirrors Similarity.hybridRrf: keyword top-10 by distinct-token
    // overlap (same trim+\s+ tokenization mirror as txt_tokens),
    // vector top-10 by the same cosine ranking as bruteTopK, fused by
    // integer RRF (1e6 // (60+rank)), final top-5 by (score, id).
    "sim_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_distinct(regexp_split_to_array(trim(text), '\s+'))
        |      AS toks
        |  FROM documents),
        |kw AS (
        |  SELECT q_id, cand_id, rank FROM (
        |    SELECT q.doc_id AS q_id, c.doc_id AS cand_id,
        |      CAST(row_number() OVER (PARTITION BY q.doc_id
        |        ORDER BY len(list_intersect(c.toks, q.toks)) DESC,
        |          c.doc_id) AS BIGINT) AS rank
        |    FROM toks q, toks c
        |    WHERE q.doc_id < 20 AND c.doc_id <> q.doc_id)
        |  WHERE rank <= 10),
        |vec AS (
        |  SELECT q_id, cand_id, rank FROM (
        |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(
        |          CAST(q.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id)
        |        AS BIGINT) AS rank
        |    FROM embeddings q, embeddings c
        |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |  WHERE rank <= 10),
        |fused AS (
        |  SELECT coalesce(k.q_id, v.q_id) AS q_id,
        |    coalesce(k.cand_id, v.cand_id) AS cand_id,
        |    coalesce(1000000 // (60 + k.rank), 0) +
        |      coalesce(1000000 // (60 + v.rank), 0) AS rrf_score
        |  FROM kw k FULL OUTER JOIN vec v
        |    ON k.q_id = v.q_id AND k.cand_id = v.cand_id),
        |fin AS (
        |  SELECT q_id, cand_id, rrf_score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY rrf_score DESC, cand_id) AS BIGINT)
        |      AS final_rank
        |  FROM fused)
        |SELECT q_id, cand_id, rrf_score, final_rank
        |FROM fin WHERE final_rank <= 5
        |ORDER BY q_id, final_rank""".stripMargin,

    // Mirrors Similarity.recallAudit: the IVF approx set left-joined
    // against the brute-force truth set, both via the SAME shared
    // CTE chains the standalone queries use.
    "sim_recall_audit" ->
      s"""WITH $ivfTrainedCorpus,
        |$ivfTopK,
        |$bruteTopK
        |SELECT t.q_id, count(*) AS k,
        |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN a.neighbor_id IS NULL THEN t.neighbor_id
        |    ELSE 0 END) AS BIGINT) AS missed_id_sum,
        |  (10000 * CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1
        |    ELSE 0 END) AS BIGINT)) // count(*) AS recall_bps
        |FROM truth t LEFT JOIN approx a
        |  ON a.q_id = t.q_id AND a.neighbor_id = t.neighbor_id
        |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,

    // Mirrors Similarity.knnFiltered: per-query target label
    // (q_id+3)%10 restricts the candidate set BEFORE ranking.
    "sim_knn_filtered" ->
      """SELECT q_id, target_label, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS q_id, (q.vec_id + 3) % 10 AS target_label,
        |    c.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT)
        |      AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
        |    AND CAST(c.label AS BIGINT) = (q.vec_id + 3) % 10)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Mirrors Similarity.knnMrl: 32-dim-prefix cosine shortlist of
    // 64 (ties on vec_id), exact 64-dim cosine re-rank to top 5.
    "sim_knn_mrl" ->
      """WITH coarse AS (
        |  SELECT q_id, neighbor_id, q_emb, c_emb FROM (
        |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |      q.embedding AS q_emb, c.embedding AS c_emb,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(
        |          CAST(q.embedding[1:32] AS DOUBLE[]),
        |          CAST(c.embedding[1:32] AS DOUBLE[])) DESC, c.vec_id)
        |        AS prank
        |    FROM embeddings q, embeddings c
        |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |  WHERE prank <= 64)
        |SELECT q_id, neighbor_id, rank FROM (
        |  SELECT q_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
        |        CAST(c_emb AS DOUBLE[])) DESC, neighbor_id) AS BIGINT)
        |      AS rank
        |  FROM coarse)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Mirrors Similarity.knnLsh: 12 ±1 hyperplanes from md5("j-k")
    // hex parity, dot in double in index order (bit-identical to the
    // codegen loop), 4 bands x 3 bits, exact cosine re-rank.
    "sim_knn_lsh" ->
      """WITH sig AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
        |             ELSE 0 END) AS BIGINT) AS sig
        |  FROM (
        |    SELECT vec_id, j,
        |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(generate_series(1, 64),
        |          k -> CAST(embedding[k] AS DOUBLE) *
        |               (CASE WHEN unicode(substr(md5(
        |                      CAST(j AS VARCHAR) || '-' ||
        |                      CAST(k - 1 AS VARCHAR)), 1, 1)) & 1 = 1
        |                     THEN CAST(1 AS DOUBLE)
        |                     ELSE CAST(-1 AS DOUBLE) END))),
        |        (a, x) -> a + x) AS dot
        |    FROM embeddings CROSS JOIN range(12) g(j))
        |  GROUP BY 1),
        |bands AS (
        |  SELECT vec_id, b AS band, (sig >> (b * 3)) & 7 AS bv
        |  FROM sig CROSS JOIN range(4) g(b)),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
        |  FROM bands q JOIN bands c ON q.band = c.band AND q.bv = c.bv
        |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |SELECT q_id, neighbor_id, rank FROM (
        |  SELECT cand.q_id, cand.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY cand.q_id
        |      ORDER BY list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
        |        CAST(ce.embedding AS DOUBLE[])) DESC, cand.vec_id) AS BIGINT)
        |      AS rank
        |  FROM cand
        |  JOIN embeddings qe ON qe.vec_id = cand.q_id
        |  JOIN embeddings ce ON ce.vec_id = cand.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Mirrors Similarity.knnIvf: k-means coarse quantizer trained by
    // two Lloyd iterations (seed = per-label cells) on the 50% hash
    // sample; every M-step centroid is an exact integer sum of
    // round(v*1e6) cast to float, every E-step argmax breaks ties on
    // cell id, so both engines replay identical training. Corpus-wide
    // assignment to the trained cells, nprobe=3 probe, exact re-rank.
    "sim_knn_ivf" ->
      s"""WITH $ivfTrainedCorpus,
        |$ivfTopK
        |SELECT q_id, neighbor_id, rank FROM approx
        |ORDER BY q_id, rank""".stripMargin,

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

    // Mirrors Multimodal.embedKnn: 32-dim zero-padded byte vectors
    // (integers, exactly representable in float), exact top-3 cosine.
    "mm_embed_knn" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, 32),
        |      k -> CASE WHEN octet_length(encode(text)) >= k
        |             THEN CAST(('0x' || substr(hex(encode(text)),
        |                        2 * k - 1, 2)) AS BIGINT)
        |             ELSE CAST(0 AS BIGINT) END) AS vec
        |  FROM documents)
        |SELECT q_id, neighbor_id, rank FROM (
        |  SELECT q.doc_id AS q_id, c.doc_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.doc_id
        |      ORDER BY list_cosine_similarity(CAST(q.vec AS DOUBLE[]),
        |        CAST(c.vec AS DOUBLE[])) DESC, c.doc_id) AS BIGINT) AS rank
        |  FROM v q, v c WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id)
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

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

    // Mirrors Multimodal.imageMeta: the Spark side BUILDS real
    // PNG/JPEG payloads (dims derived from doc_id) and PARSES them
    // back byte-by-byte; the oracle recomputes the dims in pure
    // arithmetic, so any parser defect hash-mismatches.
    "mm_image_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST((doc_id % 640) + 1 AS BIGINT) AS width,
        |  CAST((doc_id % 480) + 1 AS BIGINT) AS height,
        |  CAST(((doc_id % 640) + 1) * 16 //
        |    greatest((doc_id % 640) + 1, (doc_id % 480) + 1)
        |    AS BIGINT) AS thumb_w,
        |  CAST(((doc_id % 480) + 1) * 16 //
        |    greatest((doc_id % 640) + 1, (doc_id % 480) + 1)
        |    AS BIGINT) AS thumb_h
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.imageFilter: kinds 2 (garbage) and 3
    // (truncated header) must be rejected by the PARSE on the Spark
    // side; the oracle rejects them by construction, so a parser
    // that accepted garbage or truncation would hash-mismatch.
    "mm_image_filter" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 4 AS kind,
        |    CAST((doc_id % 200) + 16 AS BIGINT) AS w,
        |    CAST((doc_id % 150) + 16 AS BIGINT) AS h
        |  FROM documents)
        |SELECT CASE WHEN kind = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  count(*) AS n_images,
        |  CAST(sum(w) AS BIGINT) AS sum_w,
        |  CAST(sum(h) AS BIGINT) AS sum_h
        |FROM m
        |WHERE kind IN (0, 1) AND w >= 32 AND h >= 32
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Multimodal.audioMeta: the Spark side BUILDS real WAV
    // payloads (params derived from doc_id) and chunk-WALKS them
    // back; kinds 3/5 mod 7 (garbage, truncated fmt) must be
    // rejected by the parse. The oracle recomputes everything in
    // pure arithmetic, so any endian/offset/walk defect mismatches.
    "mm_audio_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT)
        |    AS bits_per_sample,
        |  CAST((doc_id % 100 + 1) * 10 AS BIGINT) AS n_frames,
        |  CAST(((doc_id % 100 + 1) * 10 * 1000) //
        |    (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms
        |FROM documents
        |WHERE doc_id % 7 NOT IN (3, 5)
        |ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.videoMeta's deterministic payload params:
    // the Spark side PARSES real ISO-BMFF boxes, the oracle
    // recomputes the planted values arithmetically
    "mm_video_meta" ->
      """SELECT doc_id, 'isom' AS brand,
        |  CAST(1000 + (doc_id % 4) * 500 AS BIGINT) AS timescale,
        |  CAST((doc_id % 90 + 1) * 1000 AS BIGINT) AS duration_ticks,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_tracks,
        |  CAST(((doc_id % 90 + 1) * 1000 * 1000) //
        |    (1000 + (doc_id % 4) * 500) AS BIGINT) AS duration_ms
        |FROM documents
        |WHERE doc_id % 7 NOT IN (3, 5)
        |ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.videoSamples' planted layout arithmetic,
    // one row PER SAMPLE: n = id%5+1 samples packed spc = id%3+1 per
    // chunk into k = ceil(n/spc) chunks (e stsc run entries: 2 when
    // the last chunk is partial, else 1) with a 4-byte gap between
    // chunks; mdat payload starts at ftyp(16) + optional free(13) +
    // moov(120 + 4n + 12e + 4k) + mdat header(8) = 144 + extra + 4n
    // + 12e + 4k. The Spark side walks stsz/stsc/stco and SLICES;
    // the oracle recomputes every offset, size, and fill digest.
    "mm_video_samples" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 5 + 1 AS n, doc_id % 3 + 1 AS spc,
        |    CASE WHEN doc_id % 2 = 0 THEN 13 ELSE 0 END AS extra
        |  FROM documents WHERE doc_id % 7 NOT IN (3, 5)),
        |p2 AS (
        |  SELECT *, (n + spc - 1) // spc AS k,
        |    CASE WHEN (n + spc - 1) // spc > 1 AND n % spc <> 0
        |         THEN 2 ELSE 1 END AS e
        |  FROM p),
        |s AS (
        |  SELECT doc_id, n, spc, extra, k, e, g AS i,
        |    20 + ((doc_id + g) % 7) * 10 AS sz,
        |    g // spc AS chunk_idx
        |  FROM p2, unnest(generate_series(0, CAST(n - 1 AS INT))) AS t(g))
        |SELECT doc_id, CAST(i AS BIGINT) AS sample_idx,
        |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(144 + extra + 4 * n + 12 * e + 4 * k
        |    + COALESCE(sum(sz) OVER (PARTITION BY doc_id ORDER BY i
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + chunk_idx * 4 AS BIGINT) AS s_off,
        |  CAST(sz AS BIGINT) AS s_size,
        |  md5(repeat(chr(CAST(65 + (doc_id + i) % 26 AS INT)),
        |    CAST(sz AS INT))) AS digest
        |FROM s ORDER BY doc_id, sample_idx""".stripMargin,

    // Mirrors Multimodal.audioFeatures: channel-0 sample of frame f
    // is byte f·align (+ the LE high byte for 16-bit) of the planted
    // data chunk, byte j = 32 + (doc_id + 7j) % 95 — always below the
    // sign bit for 16-bit, biased by 128 for 8-bit WAV PCM; every
    // per-window aggregate recomputes in exact integers.
    "mm_audio_features" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    ((doc_id % 2 + 1) *
        |     (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END)) // 8 AS align,
        |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
        |    (doc_id % 100 + 1) * 10 AS n
        |  FROM documents WHERE doc_id % 7 NOT IN (3, 5)
        |), samp AS (
        |  SELECT doc_id, f // 100 AS w,
        |    CASE WHEN bits = 16
        |      THEN (32 + (doc_id + 7 * (f * align)) % 95)
        |           + 256 * (32 + (doc_id + 7 * (f * align + 1)) % 95)
        |      ELSE (32 + (doc_id + 7 * (f * align)) % 95) - 128 END AS v
        |  FROM p, unnest(generate_series(0, CAST(n - 1 AS INT))) AS t(f))
        |SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
        |  count(*) AS n_frames,
        |  CAST(sum(v) AS BIGINT) AS sum_amp,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |  CAST(min(v) AS BIGINT) AS min_amp
        |FROM samp GROUP BY 1, 2 ORDER BY doc_id, win_idx""".stripMargin,

    // Mirrors Multimodal.audioSamples' planted layout: data chunk at
    // 44 + optional LIST(18), blockAlign = ch·bits/8 from the same
    // doc_id arithmetic as mm_audio_meta, 100-frame windows (last
    // partial), every window's bytes rebuilt with chr() and digested.
    "mm_audio_samples" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    ((doc_id % 2 + 1) *
        |     (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END)) // 8 AS align,
        |    (doc_id % 100 + 1) * 10 AS n,
        |    CASE WHEN doc_id % 2 = 0 THEN 18 ELSE 0 END AS extra
        |  FROM documents WHERE doc_id % 7 NOT IN (3, 5)
        |), wins AS (
        |  SELECT doc_id, align, n, extra, w,
        |    44 + extra + w * 100 * align AS byte_off,
        |    least(n - w * 100, 100) AS win_frames
        |  FROM p, unnest(generate_series(0,
        |    CAST((n - 1) // 100 AS INT))) AS t(w)
        |), bytes AS (
        |  SELECT doc_id, w, j,
        |    chr(CAST(32 + (doc_id + 7 * j) % 95 AS INT)) AS c
        |  FROM wins, unnest(generate_series(
        |    CAST(w * 100 * align AS INT),
        |    CAST(w * 100 * align + win_frames * align - 1 AS INT))) AS u(j)
        |), agg AS (
        |  SELECT doc_id, w, count(*) AS nb,
        |    md5(string_agg(c, '' ORDER BY j)) AS digest
        |  FROM bytes GROUP BY 1, 2)
        |SELECT ww.doc_id, CAST(ww.w AS BIGINT) AS win_idx,
        |  CAST(ww.byte_off AS BIGINT) AS byte_off,
        |  CAST(ww.win_frames AS BIGINT) AS win_frames,
        |  CAST(a.nb AS BIGINT) AS win_bytes,
        |  a.digest
        |FROM wins ww JOIN agg a ON ww.doc_id = a.doc_id AND ww.w = a.w
        |ORDER BY ww.doc_id, win_idx""".stripMargin,

    // Mirrors Multimodal.phashGroups in pure integer arithmetic: the
    // planted 9×8 field (palette index (o + h·gx + v·gy) mod 5 with
    // base-derived o/h/v, one-block +1 perturbation for d=1) aligns
    // 1:1 with dHash's grid, so each hash bit is an index comparison;
    // bit 63 lands via the BIGINT min-value term. Groups, PNG/JPEG
    // membership, 4×16-bit band keys (arithmetic >> then mask — the
    // same two's-complement band Spark computes), and nearest-
    // neighbor hamming all recomputed from doc_id alone.
    // Mirrors Multimodal.imageFeatures: the planted fieldIdx
    // arithmetic per (base, d) block grid, joined back to every doc —
    // the decoded-then-quantized index must equal it in BOTH codecs.
    "mm_image_features" ->
      """WITH imgs AS (
        |  SELECT DISTINCT doc_id % 40 AS base, (doc_id // 80) % 2 AS d
        |  FROM documents
        |), cells AS (
        |  SELECT base, d, gx, gy,
        |    ((base % 5) + (2 + (base // 5) % 2) * gx
        |      + ((base // 5) % 5) * gy
        |      + CASE WHEN d = 1 AND gx = base % 9 AND gy = (base * 3) % 8
        |             THEN 1 ELSE 0 END) % 5 AS idx
        |  FROM imgs,
        |    unnest(generate_series(0, 8)) AS t1(gx),
        |    unnest(generate_series(0, 7)) AS t2(gy))
        |SELECT doc_id, CAST(gx AS BIGINT) AS bx, CAST(gy AS BIGINT) AS by,
        |  CAST(idx AS BIGINT) AS level_idx
        |FROM documents JOIN cells
        |  ON cells.base = doc_id % 40 AND cells.d = (doc_id // 80) % 2
        |ORDER BY doc_id, by, bx""".stripMargin,

    "mm_phash_neardup" ->
      """WITH imgs AS (
        |  SELECT DISTINCT doc_id % 40 AS base, (doc_id // 80) % 2 AS d
        |  FROM documents
        |), cells AS (
        |  SELECT base, d, gx, gy,
        |    ((base % 5) + (2 + (base // 5) % 2) * gx
        |      + ((base // 5) % 5) * gy
        |      + CASE WHEN d = 1 AND gx = base % 9 AND gy = (base * 3) % 8
        |             THEN 1 ELSE 0 END) % 5 AS idx
        |  FROM imgs,
        |    unnest(generate_series(0, 8)) AS t1(gx),
        |    unnest(generate_series(0, 7)) AS t2(gy)
        |), hashes AS (
        |  SELECT a.base, a.d, CAST(SUM(CASE WHEN a.idx > b.idx THEN
        |      CASE WHEN a.gy * 8 + a.gx = 63 THEN -9223372036854775808
        |           ELSE (1::BIGINT << CAST(a.gy * 8 + a.gx AS INT)) END
        |      ELSE 0 END) AS BIGINT) AS phash
        |  FROM cells a JOIN cells b
        |    ON a.base = b.base AND a.d = b.d AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  GROUP BY a.base, a.d
        |), docs AS (
        |  SELECT doc_id, h.phash
        |  FROM documents JOIN hashes h
        |    ON h.base = doc_id % 40 AND h.d = (doc_id // 80) % 2
        |), grp AS (
        |  SELECT phash, count(*) AS n_docs,
        |    CAST(sum(CASE WHEN (doc_id // 40) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_png,
        |    CAST(sum(CASE WHEN (doc_id // 40) % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_jpeg,
        |    min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |  FROM docs GROUP BY 1
        |), bands AS (
        |  SELECT phash, band, (phash >> (band * 16)) & 65535 AS key
        |  FROM (SELECT DISTINCT phash FROM grp),
        |    unnest(generate_series(0, 3)) AS tb(band)
        |), pairs AS (
        |  SELECT DISTINCT a.phash AS pa, b.phash AS pb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.key = b.key AND a.phash <> b.phash
        |), nn AS (
        |  SELECT pa, CAST(min(bit_count(xor(pa, pb))) AS BIGINT)
        |      AS nn_hamming,
        |    count(*) AS nn_pairs
        |  FROM pairs WHERE bit_count(xor(pa, pb)) <= 6 GROUP BY 1)
        |SELECT g.phash, g.n_docs, g.n_png, g.n_jpeg, g.first_doc,
        |  g.last_doc, nn.nn_hamming,
        |  CAST(COALESCE(nn.nn_pairs, 0) AS BIGINT) AS nn_pairs
        |FROM grp g LEFT JOIN nn ON g.phash = nn.pa
        |ORDER BY g.phash""".stripMargin,

    // Mirrors Multimodal.shardManifest: the same two-level prefix sum
    // (bucket offsets + within-bucket window), 256 KB shard target
    "mm_shard_manifest" ->
      s"""WITH sized AS (SELECT doc_id,
         |    octet_length(encode(text)) AS bytes,
         |    ${rollFold("md5(text)")} AS fp,
         |    doc_id // 1000 AS bucket
         |  FROM documents),
         |bs AS (SELECT bucket, sum(bytes) AS bb FROM sized GROUP BY 1),
         |off AS (SELECT bucket, COALESCE(sum(bb) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS off FROM bs),
         |c AS (SELECT s.doc_id, s.bytes, s.fp,
         |    o.off + sum(s.bytes) OVER (PARTITION BY s.bucket
         |      ORDER BY s.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM sized s JOIN off o ON s.bucket = o.bucket)
         |SELECT CAST((cum - bytes) // 262144 AS BIGINT) AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(bytes) AS BIGINT) AS shard_bytes,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  CAST(sum(fp) AS BIGINT) AS checksum
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Similarity.pq end to end: identical 'pq-' hash sample,
    // label-seeded integer-micro-unit codebooks, two Lloyd rounds
    // where M = sum // n (both engines truncate toward zero) and E
    // breaks d2 ties to the smaller cell, then the corpus-wide encode
    "emb_pq" ->
      s"""WITH $pqCtes
        |SELECT vec_id,
        |  max(CASE WHEN ss = 0 THEN cell END) AS c0,
        |  max(CASE WHEN ss = 1 THEN cell END) AS c1,
        |  max(CASE WHEN ss = 2 THEN cell END) AS c2,
        |  max(CASE WHEN ss = 3 THEN cell END) AS c3,
        |  CAST(sum(d2) AS BIGINT) AS err_sq
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,

    // ADC search over the same codes: per-query (subspace, cell)
    // distance tables against b2, candidate distance = 4 lookups
    "sim_knn_pq" ->
      s"""WITH $pqCtes,
         |qcomps AS (
         |  SELECT vec_id AS q_id, ss, i, x AS qx FROM comps_all
         |  WHERE vec_id < 20),
         |dt AS (
         |  SELECT q.q_id, b.ss, b.cell,
         |    CAST(sum((q.qx - b.c) * (q.qx - b.c)) AS BIGINT) AS dt
         |  FROM qcomps q JOIN b2 b ON q.ss = b.ss AND q.i = b.i
         |  GROUP BY 1, 2, 3),
         |adc AS (
         |  SELECT d.q_id, e.vec_id, CAST(sum(d.dt) AS BIGINT) AS adc
         |  FROM enc e JOIN dt d ON e.ss = d.ss AND e.cell = d.cell
         |  WHERE e.vec_id <> d.q_id
         |  GROUP BY 1, 2)
         |SELECT q_id, vec_id AS neighbor_id, adc, rank FROM (
         |  SELECT q_id, vec_id, adc,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY adc, vec_id) AS BIGINT) AS rank
         |  FROM adc)
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // IVFADC+R composition: coarse probe list from the replayed IVF
    // training, candidates pruned to the probed cells, ADC-ranked by
    // the SAME integer tables as sim_knn_pq, exact cosine re-rank of
    // the 64-deep shortlist — both trainings replayed in one WITH
    // (pq CTEs prefixed to avoid name collisions)
    "sim_knn_ivfpq" ->
      s"""WITH $ivfTrainedCorpus,
         |$pqCtesPrefixed,
         |probed AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.vec_id AS q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |          CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS crank
         |    FROM embeddings q CROSS JOIN c2 c
         |    WHERE q.vec_id < 20)
         |  WHERE crank <= 3),
         |qcomps AS (
         |  SELECT vec_id AS q_id, ss, i, x AS qx FROM pq_comps_all
         |  WHERE vec_id < 20),
         |dt AS (
         |  SELECT q.q_id, b.ss, b.cell,
         |    CAST(sum((q.qx - b.c) * (q.qx - b.c)) AS BIGINT) AS dt
         |  FROM qcomps q JOIN pq_b2 b ON q.ss = b.ss AND q.i = b.i
         |  GROUP BY 1, 2, 3),
         |cand AS (
         |  SELECT p.q_id, a.vec_id
         |  FROM probed p JOIN corpus a ON a.cell = p.cell
         |  WHERE a.vec_id <> p.q_id),
         |adc AS (
         |  SELECT cd.q_id, e.vec_id, CAST(sum(d.dt) AS BIGINT) AS adc
         |  FROM cand cd
         |  JOIN pq_enc e ON e.vec_id = cd.vec_id
         |  JOIN dt d ON d.q_id = cd.q_id AND d.ss = e.ss AND d.cell = e.cell
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY adc, vec_id) AS srank
         |    FROM adc)
         |  WHERE srank <= 64)
         |SELECT q_id, neighbor_id, rank FROM (
         |  SELECT s.q_id, s.vec_id AS neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY s.q_id
         |      ORDER BY list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |        CAST(ce.embedding AS DOUBLE[])) DESC, s.vec_id) AS BIGINT)
         |      AS rank
         |  FROM short s
         |  JOIN embeddings qe ON qe.vec_id = s.q_id
         |  JOIN embeddings ce ON ce.vec_id = s.vec_id)
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
  )
}
