package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The classic Hadoop example jobs (WordCount, Grep, inverted index,
  * WordMean/WordStandardDeviation) re-expressed as Spark plans over the
  * `documents` table.
  *
  * Each one was a full MapReduce job in the reference's model (mapper +
  * combiner + reducer classes, cf. the example set shipped with
  * hadoop-mapreduce); here each is a single declarative plan where
  * Catalyst inserts the map-side partial aggregation the combiner used
  * to provide.
  *
  * Tokenization contract (mirrored in the DuckDB oracles): trim the
  * text, split on runs of whitespace. All stats that feed doubles are
  * carried as exact integer sums so the oracle hash-compare is stable.
  */
object MapReduceClassics {

  private def words(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)

  /** WordCount: token → occurrence count. [MR: the canonical example —
    * map emits (word,1), combine+reduce sum.] */
  def wordCount(s: SparkSession, d: String): DataFrame =
    words(s, d)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** Grep: extract every match of a pattern, count per match. [MR: the
    * Grep example — map extracts regex group, reduce sums, second job
    * sorts by count.] */
  def grep(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(expr(
        """regexp_extract_all(text, '(scan|join|sort|merge|hash)', 1)"""))
        .as("needle"))
      .groupBy(col("needle"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("needle"))

  /** Inverted index: word → document frequency + first posting. [MR:
    * map emits (word, doc_id), reduce builds the posting list; emitting
    * df + min posting keeps the oracle comparable without hashing
    * variable-length lists.]
    *
    * One aggregation instead of `.distinct().groupBy(word)` (which
    * shuffled twice — once on (doc_id, word), once on word): the
    * distinct-aggregate rewrite dedups (word, doc_id) in the map-side
    * partial, so the wide row stream collapses before any exchange —
    * the combiner role the MR original gave its reducer-side set. */
  def invertedIndex(s: SparkSession, d: String): DataFrame =
    words(s, d)
      .groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("word"))

  /** Word-length statistics. [MR: WordMean / WordStandardDeviation
    * examples.] Mean is the only double and is derived from exact
    * integer sums with the identical IEEE division in the oracle;
    * sum of squares is emitted so stddev is recoverable exactly. */
  def wordStats(s: SparkSession, d: String): DataFrame =
    words(s, d)
      .select(length(col("word")).cast("long").as("len"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("len")).as("sum_len"),
        sum(col("len") * col("len")).as("sum_len_sq"),
        min(col("len")).as("min_len"),
        max(col("len")).as("max_len"),
        (sum(col("len")).cast("double") / count(lit(1))).as("mean_len"))
}
