package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for an LLM training-data pipeline
  * (SURVEY.md §2): token counting, quality scoring, heuristic
  * language ID, content fingerprinting, n-gram frequencies.
  *
  * Everything is built from codegen'd `functions._` — per-document
  * work is embarrassingly parallel (no shuffle except the final
  * corpus-level aggregations), so the plans scale linearly with
  * input splits, the property the reference's map-only jobs had.
  *
  * Ratios are emitted as exact integer basis points (x div y in long
  * arithmetic) so the DuckDB oracle compares exactly.
  */
object TextAnalysis {

  private val STOPWORDS = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace tokens + BPE-ish subword tokens per document. The
    * subword regex splits runs of letters, digits, and single
    * non-alphanumerics — the shape a byte-pair pre-tokenizer produces. */
  def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_ws_tokens"),
        size(expr(
          """regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"""))
          .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Quality signals: length, token count, stopword hits, mean token
    * length; score = stopword basis points (a cheap fluency proxy). */
  def quality(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val stopHits = size(filter(t, w => w.isin(STOPWORDS: _*)))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len_chars"),
        size(t).cast("long").as("n_tokens"),
        stopHits.cast("long").as("stop_hits"))
      // integer `div` throughout: Spark casts fp quotients by
      // truncation but DuckDB casts by rounding, so any emitted ratio
      // must never pass through a double
      .withColumn("mean_tok_len_x100",
        expr("(100 * length(replace(trim(text), ' ', ''))) div n_tokens"))
      .withColumn("stop_bps", expr("(10000 * stop_hits) div n_tokens"))
      .drop("text")
      .orderBy(col("doc_id"))
  }

  /** Heuristic language ID: stopword-lexicon hit ratio (the n-gram
    * profile method degenerates to lexicon hits on whitespace-clean
    * text). Deterministic threshold so the oracle can mirror it. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val hits = size(filter(t, w => w.isin(STOPWORDS: _*))).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        when(hits * 10L >= size(t).cast("long"), lit("en"))
          .otherwise(lit("und")).as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint: md5 over the UTF-8 bytes of the normalized
    * (trimmed, lowercased) text — identical definition in DuckDB. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(lower(trim(col("text"))).cast("binary")).as("fp"))
      .orderBy(col("doc_id"))

  /** Rabin-Karp rolling-hash fingerprint (native codegen expression;
    * the md5 variant above is the cryptographic cousin). Oracle mirrors
    * the identical fold in DuckDB list_reduce. */
  def rollingFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.RollingHash.rollingHash(lower(trim(col("text"))))
          .as("fp"))
      .orderBy(col("doc_id"))

  /** Corpus-wide top bigrams. Bigrams are built positionally inside
    * the row (no shuffle until the count), then one aggregation. */
  def ngrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(toks(col("text")).as("t"))
      // guard: Spark's sequence(1, 0) counts DOWN, so a 1-token doc
      // would index element_at(t, 0) and error — gate on size >= 2
      .select(explode(when(size(col("t")) >= 2, expr(
        """transform(sequence(1, size(t) - 1),
           i -> concat(element_at(t, i), '_', element_at(t, i + 1)))"""))
        .otherwise(expr("cast(array() as array<string>)"))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)
}
