package graft

/** DuckDB oracle SQL for MapReduceClassics and TextAnalysis.
  *
  * Tokenization mirror: regexp_split_to_array(trim(text), '\s+') ==
  * Spark split(trim(text), "\\s+"). Ratios use DuckDB's integer `//`
  * to mirror Spark's `div` (both truncate toward zero for positives —
  * a double CAST would round in DuckDB but truncate in Spark).
  */
object TextOracles {
  private val words =
    """SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |FROM documents""".stripMargin

  /** Cavnar-Trenkle trigram language-ID scoring: the latin-language
    * score expressions and the argmax/margin CASEs are the SAME
    * generated SQL text the Spark operator evaluates
    * (TextAnalysis.langScoreSql et al.) — only the CJK class syntax
    * differs (RE2 \x{..} here, Java [一-鿿] there) and DuckDB needs
    * the 'g' flag for replace-all semantics. No ORDER BY so both the
    * per-doc query and the confusion-matrix aggregate can wrap it. */
  private val langidSql: String = {
    import graft.operators.TextAnalysis._
    val latinScores = LATIN_LANGS
      .map(l => s"${langScoreSql(l)} AS s_$l").mkString(",\n    ")
    s"""WITH padded AS (
       |  SELECT *, concat(' ', lower(text), ' ') AS pad FROM documents),
       |scored AS (SELECT *,
       |    $latinScores,
       |    12 * (length(text) - length(regexp_replace(text,
       |      '[\\x{4e00}-\\x{9fff}]', '', 'g'))) AS s_zh
       |  FROM padded),
       |ranked AS (SELECT *, $langTopSql AS top_score FROM scored),
       |argd AS (SELECT *, $langArgSql AS arg FROM ranked),
       |secd AS (SELECT *, $langSecondSql AS second_score FROM argd)
       |SELECT doc_id, lang AS labeled_lang,
       |  $langPredSql AS pred_lang, top_score, second_score
       |FROM secd""".stripMargin
  }

  /** Rolling-hash fold of string expression `e`, mirroring
    * graft.functions.RollingHash ('(?s).' so every codepoint folds). */
  private def fold(e: String): String =
    s"""list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(regexp_extract_all($e, '(?s).'),
       |          c -> CAST(unicode(c) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % 2147483647)""".stripMargin

  /** One PageRank iteration (integer fixed-point), prev -> next CTE. */
  private def prIter(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT n.v,
       |    CAST(150000 + (85 * COALESCE(c.cin, 0)) // 100 AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS v, sum(p.r // d.outdeg) AS cin
       |    FROM edges e JOIN deg d ON e.src = d.src
       |    JOIN $prev p ON p.v = e.src GROUP BY 1) c ON c.v = n.v)""".stripMargin

  /** One FROZEN-STEP PageRank round (mirrors pageRankConvergedRounds):
    * compute the candidate next table and its max |Δ| against prev;
    * once Δ < ε the round republishes prev unchanged — so unrolling
    * the full cap yields exactly the first iterate whose successor
    * moves no node by ≥ ε, without the SQL knowing the round count.
    * MATERIALIZED is load-bearing: each round reads its predecessor
    * twice, and inlined CTEs would double the plan per round (2^cap). */
  private def prIterConv(prev: String, next: String): String = {
    val eps = graft.operators.MapReduceClassics.PrEps
    s"""cand_$next AS MATERIALIZED (
       |  SELECT n.v,
       |    CAST(150000 + (85 * COALESCE(c.cin, 0)) // 100 AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS v, sum(p.r // d.outdeg) AS cin
       |    FROM edges e JOIN deg d ON e.src = d.src
       |    JOIN $prev p ON p.v = e.src GROUP BY 1) c ON c.v = n.v),
       |dm_$next AS MATERIALIZED (
       |  SELECT max(abs(c.r - p.r)) AS dm
       |  FROM cand_$next c JOIN $prev p ON c.v = p.v),
       |$next AS MATERIALIZED (
       |  SELECT p.v,
       |    CASE WHEN (SELECT dm FROM dm_$next) < $eps THEN p.r ELSE c.r
       |      END AS r
       |  FROM $prev p JOIN cand_$next c ON c.v = p.v)""".stripMargin
  }

  /** The BPE trainer CTE chain, mirroring TextAnalysis.bpeMerges
    * exactly: top-V vocab by (freq desc, word asc), then K rounds of
    * single-row recursive state — vocab as LIST<STRUCT(w, f)>, pair
    * counts as list expressions (key "a b"; tokens are ^[a-z]+$ so
    * the space-composite key sorts identically to the (a, b) tuple),
    * argmax with lexicographic tie-break, merge applied as the
    * greedy left-to-right list fold. `mtab` is the merge table. */
  private val bpeCtes: String = {
    import graft.operators.TextAnalysis.{BpeVocabCap, BpeMinFreq, BpeMergeBudget}
    s"""bpewords AS (
       |  SELECT word, count(*) AS f FROM ($words)
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1),
       |topv AS (
       |  SELECT word, f FROM bpewords WHERE f >= $BpeMinFreq
       |  ORDER BY f DESC, word LIMIT $BpeVocabCap),
       |bpe AS (
       |  SELECT 0 AS it,
       |    list(struct_pack(w := regexp_extract_all(word, '.'),
       |                     f := f) ORDER BY f DESC, word) AS vocab,
       |    CAST([] AS STRUCT(a VARCHAR, b VARCHAR, c BIGINT)[]) AS merges
       |  FROM topv
       |  UNION ALL
       |  SELECT it + 1,
       |    list_transform(vocab, s -> struct_pack(
       |      w := list_reduce(
       |             list_transform(s.w, t -> [t]),
       |             (acc, x) -> CASE
       |               WHEN acc[-1] = best_a AND x[1] = best_b
       |               THEN list_append(array_pop_back(acc),
       |                      best_a || best_b)
       |               ELSE list_concat(acc, x) END),
       |      f := s.f)) AS vocab,
       |    list_append(merges,
       |      struct_pack(a := best_a, b := best_b, c := maxc)) AS merges
       |  FROM (
       |    SELECT it, vocab, merges, maxc,
       |      string_split(bestk, ' ')[1] AS best_a,
       |      string_split(bestk, ' ')[2] AS best_b
       |    FROM (
       |      SELECT it, vocab, merges, maxc,
       |        list_min(list_transform(list_filter(pc, x -> x.c = maxc),
       |          x -> x.k)) AS bestk
       |      FROM (
       |        SELECT it, vocab, merges, pc,
       |          CAST(list_max(list_transform(pc, x -> x.c)) AS BIGINT)
       |            AS maxc
       |        FROM (
       |          SELECT it, vocab, merges,
       |            list_transform(list_distinct(
       |                list_transform(apf, p -> p.k)),
       |              k -> struct_pack(k := k,
       |                c := CAST(list_sum(list_transform(apf,
       |                       p -> CASE WHEN p.k = k THEN p.f ELSE 0 END))
       |                     AS BIGINT))) AS pc
       |          FROM (
       |            SELECT it, vocab, merges,
       |              flatten(list_transform(vocab, s ->
       |                list_transform(generate_series(1, len(s.w) - 1),
       |                  i -> struct_pack(
       |                    k := s.w[i] || ' ' || s.w[i + 1],
       |                    f := s.f)))) AS apf
       |            FROM bpe WHERE it < $BpeMergeBudget
       |          ) WHERE len(apf) > 0
       |        )
       |      )
       |    )
       |  )),
       |mtab AS (
       |  SELECT CAST(rank AS BIGINT) AS rank, u.a AS lhs, u.b AS rhs,
       |    u.a || u.b AS merged, u.c AS pair_count
       |  FROM (SELECT unnest(merges) AS u,
       |               generate_subscripts(merges, 1) AS rank
       |        FROM bpe WHERE it = (SELECT max(it) FROM bpe)))""".stripMargin
  }

  /** BPE application CTE chain (rides on [[bpeCtes]]): per distinct
    * ^[a-z]+$ word, the merges apply in rank order via the SAME
    * greedy left-to-right list fold the trainer uses — and that
    * graft.functions.BpeEncode implements — so the two engines agree
    * even on overlapping-repeat inputs where a string-level replace
    * would not ("aaaa" + (a,a) -> [aa, aa]); `fin` is (word, ntok). */
  private val bpeApplyCtes: String =
    s"""allwords AS (
       |  SELECT doc_id, word, count(*) AS n FROM ($words)
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1, 2),
       |dw AS (SELECT DISTINCT word FROM allwords),
       |app AS (
       |  SELECT 0 AS it, word, regexp_extract_all(word, '.') AS tk
       |  FROM dw
       |  UNION ALL
       |  SELECT it + 1, word,
       |    list_reduce(
       |      list_transform(tk, t -> [t]),
       |      (acc, x) -> CASE
       |        WHEN acc[-1] = m.lhs AND x[1] = m.rhs
       |        THEN list_append(array_pop_back(acc), m.merged)
       |        ELSE list_concat(acc, x) END) AS tk
       |  FROM app JOIN mtab m ON m.rank = it + 1),
       |fin AS (
       |  SELECT word, CAST(len(tk) AS BIGINT) AS ntok
       |  FROM app WHERE it = (SELECT count(*) FROM mtab))""".stripMargin

  /** The concat-and-chunk packing tail over a `sized` CTE of
    * (doc_id, n_tok) — shared by the whitespace and BPE pack forms. */
  private val packTail: String =
    """pre AS (
      |  SELECT doc_id, n_tok,
      |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM sized),
      |spans AS (
      |  SELECT n_tok, cum - n_tok AS st, cum,
      |    (cum - n_tok) // 2048 AS seq_lo, (cum - 1) // 2048 AS seq_hi
      |  FROM pre),
      |ex AS (
      |  SELECT st, cum, seq_lo, seq_hi,
      |    unnest(generate_series(seq_lo, seq_hi)) AS seq_id
      |  FROM spans)
      |SELECT seq_id, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN seq_lo = seq_hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_full_docs,
      |  CAST(sum(CASE WHEN seq_lo <> seq_hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_straddlers,
      |  CAST(sum(least(cum, (seq_id + 1) * 2048) -
      |           greatest(st, seq_id * 2048)) AS BIGINT) AS tokens_filled
      |FROM ex GROUP BY seq_id ORDER BY seq_id""".stripMargin

  /** Batch-perceptron training unroll (ml_perceptron_quality):
    * epoch e computes margins under w_{e-1}, the misclassified set,
    * and w_e — the frozen-unroll discipline the PageRank oracle
    * uses, applied to supervised learning. All-integer, so the
    * replay is exact. */
  private def perceptronEpoch(e: Int): String = {
    val p = s"w${e - 1}"
    s"""m$e AS (
       |  SELECT f.doc_id, f.y, sum($p.w * f.x) AS m
       |  FROM pfeats f JOIN $p USING (bucket) GROUP BY 1, 2),
       |e$e AS (SELECT doc_id FROM m$e WHERE y * m <= 0),
       |w$e AS (
       |  SELECT p.bucket, p.w + COALESCE(u.dw, 0) AS w
       |  FROM $p p LEFT JOIN (
       |    SELECT f.bucket, sum(f.y * f.x) AS dw
       |    FROM pfeats f JOIN e$e USING (doc_id) GROUP BY 1) u
       |  USING (bucket))""".stripMargin
  }

  private val perceptronCtes: String =
    s"""pbase AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents
       |), pfeats AS (
       |  SELECT doc_id, y, bucket, count(*) AS x FROM (
       |    SELECT doc_id, y, ${fold("word")} % 64 AS bucket FROM (
       |      SELECT doc_id,
       |        CASE WHEN len(t) BETWEEN 20 AND 400
       |              AND list_sum(list_transform(t, w -> length(w)))
       |                  <= len(t) * 8
       |             THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
       |        unnest(t) AS word
       |      FROM pbase))
       |  GROUP BY 1, 2, 3
       |), w0 AS (
       |  SELECT CAST(b AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
       |  FROM range(64) t(b)),
       |${(1 to 5).map(perceptronEpoch).mkString(",\n")}""".stripMargin

  val sql: Map[String, String] = Map(
    "ml_perceptron_quality" ->
      s"""WITH $perceptronCtes
         |SELECT w5.bucket, CAST(w5.w AS BIGINT) AS weight,
         |  (SELECT count(*) FROM e5) AS final_errors
         |FROM w5 ORDER BY bucket""".stripMargin,
    "mr_wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM ($words)
         |WHERE length(word) > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_bpe" ->
      s"""WITH RECURSIVE
         |$bpeCtes
         |SELECT rank, lhs, rhs, merged, pair_count FROM mtab
         |ORDER BY rank""".stripMargin,

    // docs with no alpha words drop out on both sides
    "txt_bpe_tokens" ->
      s"""WITH RECURSIVE
         |$bpeCtes,
         |$bpeApplyCtes
         |SELECT a.doc_id, CAST(sum(a.n * f.ntok) AS BIGINT) AS n_subwords
         |FROM allwords a JOIN fin f USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors TextAnalysis.bpeCoverage: allwords joined back to the
    // doc's language, fin's per-word ntok weighted by occurrence count;
    // fertility = integer percent, unmerged = ntok == word length.
    "txt_bpe_coverage" ->
      s"""WITH RECURSIVE
         |$bpeCtes,
         |$bpeApplyCtes,
         |wl AS (
         |  SELECT d.lang, a.word, a.n
         |  FROM allwords a JOIN documents d USING (doc_id)),
         |sc AS (
         |  SELECT w.lang, w.n, f.ntok, length(w.word) AS wlen
         |  FROM wl w JOIN fin f USING (word))
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_words,
         |  CAST(sum(n * ntok) AS BIGINT) AS n_subwords,
         |  CAST(sum(CASE WHEN ntok = wlen THEN n ELSE 0 END) AS BIGINT)
         |    AS n_unmerged,
         |  (100 * CAST(sum(n * ntok) AS BIGINT)) //
         |    CAST(sum(n) AS BIGINT) AS fertility_pct
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    // packSequences budgeted in the LEARNED vocabulary's tokens:
    // sized = per-doc BPE subword totals, then the same pack tail
    "txt_pack_bpe" ->
      s"""WITH RECURSIVE
         |$bpeCtes,
         |$bpeApplyCtes,
         |sized AS (
         |  SELECT a.doc_id, CAST(sum(a.n * f.ntok) AS BIGINT) AS n_tok
         |  FROM allwords a JOIN fin f USING (word)
         |  GROUP BY 1),
         |$packTail""".stripMargin,

    // trains the identical bigram model (counts over [a-z ]-normalized
    // text) and scores with the same exact integer micro-probability
    // division — no doubles anywhere, so the hash compare is stable
    "txt_lm_score" ->
      """WITH d2 AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS t
        |  FROM documents
        |  WHERE len(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')))
        |    >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> substr(t, CAST(i AS INTEGER), 2))) AS bg
        |  FROM d2),
        |counts AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
        |prefix AS (
        |  SELECT substr(bg, 1, 1) AS pre, CAST(sum(c2) AS BIGINT) AS c1
        |  FROM counts GROUP BY 1),
        |model AS (
        |  SELECT bg, (1000000 * c2) // c1 AS p_micro
        |  FROM counts JOIN prefix ON substr(bg, 1, 1) = pre)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(m.p_micro) AS BIGINT) // count(*) AS score_micro
        |FROM bg b JOIN model m USING (bg)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors TextAnalysis.pipelineV2: the gopher flags and pii chain
    // composed, per-source rollup with the summed fingerprint fold.
    "txt_pipeline_v2" ->
      s"""WITH stats AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |      AS n_tokens,
         |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      w -> w IN ('the','a','of','to','and','in','is','it')))
         |      AS BIGINT) AS stop_hits,
         |    CAST(len(list_distinct(regexp_split_to_array(trim(text),
         |      '\\s+'))) AS BIGINT) AS n_distinct,
         |    CAST(length(replace(trim(text), ' ', '')) AS BIGINT)
         |      AS nospace_len
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, source FROM stats
         |  WHERE n_tokens >= 20
         |    AND (100 * nospace_len) // n_tokens BETWEEN 300 AND 1000
         |    AND stop_hits >= 2
         |    AND (100 * n_distinct) // n_tokens >= 50),
         |aug AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
         |         || CAST(doc_id AS VARCHAR) || '@example.com'
         |       ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0 THEN ' from 10.'
         |         || CAST(doc_id % 256 AS VARCHAR) || '.'
         |         || CAST((doc_id // 256) % 256 AS VARCHAR) || '.'
         |         || CAST(doc_id % 100 AS VARCHAR)
         |       ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-'
         |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |       ELSE '' END AS a
         |  FROM documents),
         |perdoc AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(a,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |      + len(regexp_extract_all(a,
         |          '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
         |      + len(regexp_extract_all(a, '\\+1-555-\\d{4}')) AS BIGINT)
         |      AS pii_hits,
         |    regexp_replace(regexp_replace(regexp_replace(a,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |      '<EMAIL>', 'g'),
         |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |      '\\+1-555-\\d{4}', '<PHONE>', 'g') AS c
         |  FROM aug)
         |SELECT k.source, count(*) AS n_kept,
         |  CAST(sum(p.pii_hits) AS BIGINT) AS n_pii_hits,
         |  CAST(sum(length(p.c)) AS BIGINT) AS clean_len_sum,
         |  CAST(sum(${fold("md5(p.c)")}) AS BIGINT) AS clean_fp_fold_sum
         |FROM kept k JOIN perdoc p USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors TextAnalysis.mixSample: index-proportional weights, the
    // scarcest-source feasible total, integer-div rates, md5-fold coin.
    "txt_mix_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
         |  FROM documents),
         |bs AS (SELECT source, w, count(*) AS n_docs FROM d GROUP BY 1, 2),
         |wt AS (SELECT CAST(sum(w) AS BIGINT) AS w_sum FROM bs),
         |fz AS (
         |  SELECT min((n_docs * w_sum) // w) AS t_max FROM bs, wt),
         |rates AS (
         |  SELECT source, n_docs,
         |    least(10000, (10000 * w * t_max) // (w_sum * n_docs))
         |      AS rate_bps
         |  FROM bs, wt, fz),
         |coin AS (
         |  SELECT doc_id, source,
         |    (${fold("md5('mix-' || CAST(doc_id AS VARCHAR))")}) % 10000
         |      AS c
         |  FROM d)
         |SELECT r.source, r.n_docs, r.rate_bps,
         |  CAST(sum(CASE WHEN c.c < r.rate_bps THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN c.c < r.rate_bps THEN c.doc_id ELSE 0 END)
         |    AS BIGINT) AS admitted_id_sum
         |FROM coin c JOIN rates r USING (source)
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // Mirrors TextAnalysis.lmBuckets: the txt_lm_score chain + the
    // per-language ntile(3) tercile split on (score desc, doc_id).
    "txt_lm_buckets" ->
      """WITH d2 AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS t
        |  FROM documents
        |  WHERE len(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')))
        |    >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> substr(t, CAST(i AS INTEGER), 2))) AS bg
        |  FROM d2),
        |counts AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
        |prefix AS (
        |  SELECT substr(bg, 1, 1) AS pre, CAST(sum(c2) AS BIGINT) AS c1
        |  FROM counts GROUP BY 1),
        |model AS (
        |  SELECT bg, (1000000 * c2) // c1 AS p_micro
        |  FROM counts JOIN prefix ON substr(bg, 1, 1) = pre),
        |scored AS (
        |  SELECT b.doc_id, CAST(sum(m.p_micro) AS BIGINT) // count(*)
        |    AS score_micro
        |  FROM bg b JOIN model m USING (bg) GROUP BY 1),
        |bucketed AS (
        |  SELECT s.doc_id, d.lang, s.score_micro,
        |    CAST(ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.score_micro DESC, s.doc_id) AS BIGINT) AS bucket
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, score_micro, bucket,
        |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket_name
        |FROM bucketed ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.lmBucketsSampled: the txt_lm_score chain,
    // the q36-style hash-sampled per-lang tercile cutoffs, then the
    // map-side boundary-count assignment and per-(lang,bucket) audit.
    "txt_lm_buckets_sampled" ->
      s"""WITH d2 AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS t
         |  FROM documents
         |  WHERE len(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')))
         |    >= 2),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)),
         |      i -> substr(t, CAST(i AS INTEGER), 2))) AS bg
         |  FROM d2),
         |counts AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
         |prefix AS (
         |  SELECT substr(bg, 1, 1) AS pre, CAST(sum(c2) AS BIGINT) AS c1
         |  FROM counts GROUP BY 1),
         |model AS (
         |  SELECT bg, (1000000 * c2) // c1 AS p_micro
         |  FROM counts JOIN prefix ON substr(bg, 1, 1) = pre),
         |scored AS (
         |  SELECT b.doc_id, d.lang,
         |    CAST(sum(m.p_micro) AS BIGINT) // count(*) AS score_micro
         |  FROM bg b JOIN model m USING (bg)
         |  JOIN documents d USING (doc_id)
         |  GROUP BY 1, 2),
         |mm AS (
         |  SELECT greatest(20, (count(*) + 99999) // 100000) AS m
         |  FROM scored),
         |samp AS (
         |  SELECT s.* FROM scored s, mm
         |  WHERE (${fold("md5('lmb-' || CAST(doc_id AS VARCHAR))")})
         |    % mm.m = 0),
         |tiles AS (
         |  SELECT lang, score_micro,
         |    ntile(3) OVER (PARTITION BY lang
         |      ORDER BY score_micro DESC, doc_id) AS tile
         |  FROM samp),
         |bounds AS (
         |  SELECT lang, tile, min(score_micro) AS b FROM tiles
         |  WHERE tile < 3 GROUP BY 1, 2),
         |assigned AS (
         |  SELECT s.doc_id, s.lang, s.score_micro,
         |    1 + (SELECT count(*) FROM bounds bo
         |         WHERE bo.lang = s.lang AND s.score_micro < bo.b)
         |      AS bucket
         |  FROM scored s)
         |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
         |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket_name,
         |  count(*) AS n_docs,
         |  min(score_micro) AS min_micro, max(score_micro) AS max_micro,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM assigned GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    // same (degree, id)-orientation: every triangle counted once via
    // the wedge self-join + closure equi-join
    "mr_triangles" ->
      """WITH pp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS (
        |  SELECT u, v FROM (
        |    SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |    FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk
        |    GROUP BY 1, 2)
        |  WHERE w >= 2),
        |deg AS (
        |  SELECT x, count(*) AS dg FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |ori AS (
        |  SELECT
        |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
        |      THEN u ELSE v END AS s,
        |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
        |      THEN v ELSE u END AS t
        |  FROM e0 JOIN deg du ON u = du.x JOIN deg dv ON v = dv.x),
        |tri AS (
        |  SELECT count(*) AS n FROM (
        |    SELECT e1.t AS cs, e2.t AS ct
        |    FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND e1.t <> e2.t)
        |  JOIN ori ON cs = s AND ct = t),
        |wed AS (
        |  SELECT CAST(sum((dg * (dg - 1)) // 2) AS BIGINT) AS w FROM deg)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM e0) AS n_edges,
        |  (SELECT w FROM wed) AS n_wedges,
        |  (SELECT n FROM tri) AS n_triangles,
        |  (3000 * (SELECT n FROM tri)) // (SELECT w FROM wed)
        |    AS closure_pm""".stripMargin,

    "mr_grep" ->
      """SELECT needle, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(text,
        |    '(scan|join|sort|merge|hash)', 1)) AS needle FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, needle""".stripMargin,

    "mr_inverted_index" ->
      s"""SELECT word, count(*) AS df, min(doc_id) AS first_doc FROM (
         |  SELECT DISTINCT doc_id, word FROM ($words)
         |  WHERE length(word) > 0)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mr_word_stats" ->
      s"""SELECT count(*) AS n_words,
         |  CAST(sum(len) AS BIGINT) AS sum_len,
         |  CAST(sum(len * len) AS BIGINT) AS sum_len_sq,
         |  min(len) AS min_len, max(len) AS max_len,
         |  CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) / count(*) AS mean_len
         |FROM (SELECT CAST(length(word) AS BIGINT) AS len FROM ($words)
         |      WHERE length(word) > 0)""".stripMargin,

    // Mirrors MapReduceClassics.tfIdf: score = (tok/doc_toks) *
    // (n_docs/df), four exactly-rounded IEEE double ops (no ln() — not
    // bit-reproducible across libm implementations)
    "mr_tfidf" ->
      s"""WITH w AS (SELECT doc_id, word FROM ($words)
         |  WHERE length(word) > 0),
         |tf AS (SELECT doc_id, word, count(*) AS tok FROM w GROUP BY 1, 2),
         |wl AS (SELECT doc_id, word, tok,
         |  sum(tok) OVER (PARTITION BY doc_id) AS doc_toks FROM tf),
         |dfq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w
         |  GROUP BY 1),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT wl.doc_id, wl.word, wl.tok, dfq.df,
         |    (CAST(wl.tok AS DOUBLE) / CAST(wl.doc_toks AS DOUBLE)) *
         |    (CAST(nd.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE)) AS score
         |  FROM wl JOIN dfq USING (word), nd)
         |SELECT doc_id, word, tok, df, score, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, word) AS rk FROM scored)
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // Mirrors MapReduceClassics.pageRank: 5 integer fixed-point
    // iterations over the part<->supplier bipartite graph; `//` and
    // Spark's `div` agree on positives, long sums are associative
    "mr_pagerank" ->
      s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src,
         |    l_suppkey * 2 + 1 AS dst FROM lineitem),
         |edges AS (SELECT src, dst FROM base
         |  UNION ALL SELECT dst AS src, src AS dst FROM base),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS v FROM edges),
         |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")},
         |${prIter("r3", "r4")},
         |${prIter("r4", "r5")}
         |SELECT v, r FROM r5 ORDER BY r DESC, v LIMIT 100""".stripMargin,

    // Frozen-step unroll of the full round cap: identical result to
    // the driver loop that stops at the Δ<ε fixpoint (or the cap)
    "mr_pagerank_converged" -> {
      val cap = graft.operators.MapReduceClassics.PrCap
      val chain = (0 until cap)
        .map(i => prIterConv(s"r$i", s"r${i + 1}")).mkString(",\n")
      s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src,
         |    l_suppkey * 2 + 1 AS dst FROM lineitem),
         |edges AS MATERIALIZED (SELECT src, dst FROM base
         |  UNION ALL SELECT dst AS src, src AS dst FROM base),
         |deg AS MATERIALIZED (
         |  SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges),
         |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |$chain
         |SELECT v, r FROM r$cap ORDER BY r DESC, v LIMIT 100""".stripMargin
    },

    // Mirrors TextAnalysis.heavyHitters: d=4 x w=2048 count-min
    // sketch, hash row j = fold(md5('cms{j}-'||word)) mod 2048
    "txt_heavy_hitters" ->
      s"""WITH ww AS (SELECT word FROM ($words) WHERE length(word) > 0),
         |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |sketch AS (
         |  SELECT j, ${fold(
               "md5('cms' || CAST(j AS VARCHAR) || '-' || word)")}
         |      % 2048 AS b, count(*) AS c
         |  FROM ww CROSS JOIN js GROUP BY 1, 2),
         |cand AS (SELECT word, count(*) AS exact FROM ww GROUP BY 1),
         |probes AS (
         |  SELECT word, exact, j, ${fold(
               "md5('cms' || CAST(j AS VARCHAR) || '-' || word)")}
         |      % 2048 AS b
         |  FROM cand CROSS JOIN js)
         |SELECT q.word, min(s.c) AS est, q.exact
         |FROM probes q JOIN sketch s ON s.j = q.j AND s.b = q.b
         |GROUP BY q.word, q.exact
         |ORDER BY est DESC, q.word LIMIT 10""".stripMargin,

    // Mirrors TextAnalysis.scrub; DuckDB regexp_replace needs the 'g'
    // flag (Spark's replaces all occurrences by default)
    "txt_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(spark|hash|key)\b', 0))
        |    AS BIGINT) AS n_hits,
        |  CAST(length(text) AS BIGINT) AS len_before,
        |  CAST(length(regexp_replace(text, '\b(spark|hash|key)\b',
        |    '<REDACTED>', 'g')) AS BIGINT) AS len_after,
        |  md5(regexp_replace(text, '\b(spark|hash|key)\b',
        |    '<REDACTED>', 'g')) AS scrubbed_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.gopherFilter: same integer-div stats, same
    // rule thresholds, kept = product of the four rule flags.
    "txt_gopher_filter" ->
      """WITH stats AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      w -> w IN ('the','a','of','to','and','in','is','it')))
        |      AS BIGINT) AS stop_hits,
        |    CAST(len(list_distinct(regexp_split_to_array(trim(text),
        |      '\s+'))) AS BIGINT) AS n_distinct,
        |    CAST(length(replace(trim(text), ' ', '')) AS BIGINT)
        |      AS nospace_len
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id, source, n_tokens,
        |    (100 * nospace_len) // n_tokens AS mwl_x100,
        |    stop_hits,
        |    (100 * n_distinct) // n_tokens AS distinct_x100,
        |    CAST(n_tokens >= 20 AS BIGINT) AS r_len,
        |    CAST((100 * nospace_len) // n_tokens BETWEEN 300 AND 1000
        |      AS BIGINT) AS r_mwl,
        |    CAST(stop_hits >= 2 AS BIGINT) AS r_stop,
        |    CAST((100 * n_distinct) // n_tokens >= 50 AS BIGINT) AS r_rep
        |  FROM stats)
        |SELECT *, CAST(r_len * r_mwl * r_stop * r_rep AS BIGINT) AS kept
        |FROM flags ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.piiScrub: identical planted augmentation
    // (e-mail / IPv4 / phone from doc_id arithmetic), identical
    // boundary-anchored patterns, identical replace order.
    "txt_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
        |         || CAST(doc_id AS VARCHAR) || '@example.com'
        |       ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN ' from 10.'
        |         || CAST(doc_id % 256 AS VARCHAR) || '.'
        |         || CAST((doc_id // 256) % 256 AS VARCHAR) || '.'
        |         || CAST(doc_id % 100 AS VARCHAR)
        |       ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |       ELSE '' END AS a
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id, a,
        |    regexp_replace(regexp_replace(regexp_replace(a,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\+1-555-\d{4}', '<PHONE>', 'g') AS c
        |  FROM aug)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(a,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(a, '\+1-555-\d{4}')) AS BIGINT)
        |    AS n_phones,
        |  CAST(length(c) AS BIGINT) AS len_clean,
        |  md5(c) AS clean_fp
        |FROM clean ORDER BY doc_id""".stripMargin,

    "txt_length_profile" ->
      """SELECT bucket, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        |FROM (SELECT (n_tokens // 64) * 64 AS bucket, n_tokens
        |  FROM (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS n_tokens FROM documents))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
        |  n_tokens, stop_hits,
        |  (100 * nospace_len) // n_tokens AS mean_tok_len_x100,
        |  (10000 * stop_hits) // n_tokens AS stop_bps
        |FROM (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      w -> w IN ('the','a','of','to','and','in','is','it')))
        |      AS BIGINT) AS stop_hits,
        |    CAST(length(replace(trim(text), ' ', '')) AS BIGINT)
        |      AS nospace_len
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // Cavnar-Trenkle trigram scoring: the latin-language score
    // expressions and the argmax/margin CASEs are the SAME generated
    // SQL text the Spark operator evaluates (TextAnalysis.langScoreSql
    // et al.) — only the CJK class syntax differs (RE2 \x{..} here,
    // Java [一-鿿] there) and DuckDB needs the 'g' flag for
    // replace-all semantics.
    "txt_langid" -> s"$langidSql ORDER BY doc_id",

    // txt_langid's generated scoring chain wrapped in a CTE and
    // aggregated to (labeled, predicted) cells — one definition of
    // the classifier (langidSql), two views of it.
    "txt_lang_confusion" ->
      s"""WITH li AS ($langidSql)
         |SELECT labeled_lang, pred_lang, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
         |FROM li GROUP BY 1, 2
         |ORDER BY labeled_lang, pred_lang""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_source_mix" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT)) AS BIGINT) AS total_tokens,
        |    count(DISTINCT md5(lower(trim(text)))) AS n_distinct
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, total_tokens,
        |  CAST((10000 * total_tokens) //
        |    CAST((SELECT sum(total_tokens) FROM per) AS BIGINT)
        |    AS BIGINT) AS token_share_bps,
        |  CAST((10000 * (n_docs - n_distinct)) // n_docs AS BIGINT)
        |    AS dup_bps
        |FROM per ORDER BY source""".stripMargin,

    // mirrors RollingHash's fold (h*31 + codepoint) mod 2^31-1 over
    // the md5 hex characters, exactly as the Spark side computes it
    "txt_split" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('split_' || CAST(doc_id AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 2147483647) % 1000 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT CASE WHEN bucket < 950 THEN 'train'
        |              WHEN bucket < 990 THEN 'val'
        |              ELSE 'test' END AS split,
        |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM h GROUP BY 1)
        |SELECT split, n_docs, n_chars,
        |  CAST((10000 * n_docs) //
        |    CAST((SELECT sum(n_docs) FROM s) AS BIGINT) AS BIGINT)
        |    AS share_bps
        |FROM s ORDER BY split""".stripMargin,

    // Mirrors TextAnalysis.epochShuffle: the same RollingHash fold
    // over md5('ep'||epoch||'_'||doc_id), shard = h % 8, within-shard
    // rank over (h, doc_id), order-sensitive checksum Σ rank·doc_id.
    "txt_epoch_shuffle" ->
      """WITH e AS (
        |  SELECT d.doc_id, d.n_chars, ep.epoch,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('ep' || CAST(ep.epoch AS VARCHAR) || '_' ||
        |            CAST(d.doc_id AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 2147483647) AS h
        |  FROM documents d,
        |    (SELECT CAST(1 AS BIGINT) AS epoch
        |     UNION ALL SELECT CAST(2 AS BIGINT)) ep),
        |r AS (
        |  SELECT epoch, h % 8 AS shard, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY epoch, h % 8
        |      ORDER BY h, doc_id) AS BIGINT) AS rk
        |  FROM e)
        |SELECT epoch, shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN rk = 1 THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS first_doc,
        |  CAST(sum(rk * doc_id) AS BIGINT) AS order_check
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "txt_pack_sequences" ->
      s"""WITH sized AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |      AS n_tok
         |  FROM documents
         |  WHERE trim(text) <> ''),
         |$packTail""".stripMargin,

    // '(?s).' (dotall) so newline codepoints enter the fold exactly
    // like the Spark RollingHash, which iterates every codepoint
    "txt_rolling_fp" ->
      """SELECT doc_id, list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(lower(trim(text)), '(?s).'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mr_teragen" ->
      """SELECT count(*) AS n_rows, CAST(sum(key) AS BIGINT) AS checksum,
        |  min(key) AS min_key, max(key) AS max_key
        |FROM (SELECT list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(CAST(i AS VARCHAR), '(?s).'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS key
        |  FROM range(100000) t(i))""".stripMargin,

    // Mirrors TextAnalysis.sampleStratified: rolling-hash fold of
    // md5('sample-'||doc_id), per-lang permille rates (en 100,
    // else 500)
    "txt_sample_stratified" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(keep) AS BIGINT) AS n_sampled,
        |  CAST(sum(doc_id * keep) AS BIGINT) AS sample_checksum
        |FROM (
        |  SELECT lang, doc_id,
        |    CASE WHEN list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(regexp_extract_all(
        |            md5('sample-' || CAST(doc_id AS VARCHAR)), '(?s).'),
        |            c -> CAST(unicode(c) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 2147483647) % 1000 <
        |      (CASE WHEN lang = 'en' THEN 100 ELSE 500 END)
        |    THEN 1 ELSE 0 END AS keep
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_repetition" ->
      """SELECT doc_id, n_grams, n_distinct,
        |  CASE WHEN n_grams > 0
        |    THEN (10000 * (n_grams - n_distinct)) // n_grams
        |    ELSE 0 END AS dup_bps
        |FROM (
        |  SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
        |    CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(t) >= 3
        |        THEN list_transform(generate_series(1, len(t) - 2),
        |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |        ELSE CAST([] AS VARCHAR[]) END AS g
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+')
        |            AS t FROM documents)))
        |ORDER BY doc_id""".stripMargin,

    "txt_contamination" ->
      """WITH ev(eval_ngram) AS (VALUES ('big order scan'),
        |  ('group slow spark'), ('small part order'),
        |  ('sort slow hash'), ('filter merge data')),
        |g AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 2)) AS i
        |        FROM (SELECT doc_id,
        |                regexp_split_to_array(trim(text), '\s+') AS t
        |              FROM documents))),
        |hits AS (
        |  SELECT g.g AS eval_ngram,
        |    count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |  FROM g JOIN ev ON g.g = ev.eval_ngram GROUP BY 1)
        |SELECT e.eval_ngram,
        |  CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
        |  CAST(coalesce(h.n_occurrences, 0) AS BIGINT) AS n_occurrences
        |FROM ev e LEFT JOIN hits h ON e.eval_ngram = h.eval_ngram
        |ORDER BY 1""".stripMargin,

    // Mirrors HadoopTools.piEstimate: dart i = (fold(md5('x'||i)),
    // fold(md5('y'||i))) in [0, P)^2, inside iff x^2+y^2 < P^2 in
    // exact 64-bit arithmetic.
    "mr_pi" ->
      """SELECT CAST(sum(inside) AS BIGINT) AS hits,
        |  count(*) AS darts,
        |  (40000 * CAST(sum(inside) AS BIGINT)) // count(*) AS pi_x10000
        |FROM (
        |  SELECT CASE WHEN x * x + y * y <
        |      CAST(2147483647 AS BIGINT) * CAST(2147483647 AS BIGINT)
        |    THEN 1 ELSE 0 END AS inside
        |  FROM (
        |    SELECT
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('x' || CAST(i AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 2147483647) AS x,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(
        |          md5('y' || CAST(i AS VARCHAR)), '(?s).'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 2147483647) AS y
        |    FROM range(400000) t(i)))""".stripMargin,

    "txt_pipeline_e2e" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (
        |  SELECT lang, n_tokens, n_chars,
        |    row_number() OVER (PARTITION BY fp
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM (
        |    SELECT doc_id, lang, n_chars,
        |      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |        AS n_tokens,
        |      md5(lower(trim(text))) AS fp
        |    FROM documents)
        |  WHERE n_tokens >= 10)
        |WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // n_rows/checksum mirror mr_teragen; violations is 0 by
    // construction in SQL (the oracle sorts too) — the Spark side is
    // asserting its own range-partitioned sort really is global
    "mr_teravalidate" ->
      """SELECT count(*) AS n_rows, CAST(sum(key) AS BIGINT) AS checksum,
        |  CAST(0 AS BIGINT) AS violations
        |FROM (SELECT list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(CAST(i AS VARCHAR), '(?s).'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS key
        |  FROM range(100000) t(i))""".stripMargin,

    "txt_ngrams" ->
      """SELECT bigram, count(*) AS cnt FROM (
        |  SELECT t[i] || '_' || t[i+1] AS bigram FROM (
        |    SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM (
        |      SELECT regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM documents)))
        |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
  )
}
