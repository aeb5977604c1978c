package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming ingest for the training-data pipeline: documents arrive
  * as files (the 100 TB reality — crawl dumps landing in object
  * storage), and each new file becomes a micro-batch that is quality-
  * filtered and exact-deduplicated INCREMENTALLY — no full-corpus
  * recompute per delivery, which is the whole advantage over the
  * reference's batch-rerun model.
  */
object DocumentStreams {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a documents parquet directory (single
    * test files are staged behind a symlink dir, as in EventStreams). */
  def readDocuments(s: SparkSession, d: String): DataFrame = {
    val src = new java.io.File(s"$d/documents.parquet")
    val path =
      if (src.isFile) {
        val dir = graft.sources.TempDirs.scratch("graft-docs-")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("documents.parquet"), src.toPath)
        dir.toString
      } else src.toString
    s.readStream.schema(schema).parquet(path)
  }

  /** Quality gate + incremental exact dedup. The quality predicate
    * (>= 10 whitespace tokens) is stateless/map-only; the dedup keys
    * on the content fingerprint with dropDuplicates, whose state is
    * the fingerprint set itself — for GLOBAL corpus dedup that state
    * is inherently unbounded (every fingerprint ever seen must be
    * remembered); production bounds it with an RocksDB state store +
    * TTL or an external fingerprint table, the same trade the batch
    * dedup_exact makes by re-scanning. Emits the surviving documents'
    * (doc_id, fp, n_tokens). */
  def ingest(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .filter(col("n_tokens") >= 10)
      .withColumn("fp", md5(lower(trim(col("text"))).cast("binary")))
      .dropDuplicates("fp")
      .select(col("doc_id"), col("fp"), col("n_tokens"))

  /** Streaming count-min sketch over a document stream: tokens from
    * each micro-batch fold into the same d x w = 8192 counter cells a
    * batch build uses (graft.operators.TextAnalysis.cmsSketch — the
    * IDENTICAL hash family and geometry, so the drained stream's
    * sketch equals the batch sketch cell for cell). The streaming
    * aggregation's state IS the counter table: at most 8192 rows no
    * matter how many tokens flow through, so this runs forever on a
    * 100 TB/day firehose with constant memory — the streaming analog
    * of the reference's counters/combiners. Run it with
    * outputMode("complete"); the sink always holds the current sketch. */
  def cmsCells(docs: DataFrame): DataFrame = {
    val w = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    graft.operators.TextAnalysis.cmsSketch(w)
  }

  case class Deduped(doc_id: Long, fp: String)

  /** Exact dedup with BOUNDED state — the production answer to
    * `ingest`'s unbounded fingerprint set. Each fingerprint's state is
    * its last-seen event time; a duplicate arriving within `ttlMs` of
    * that is dropped (and refreshes the sighting), while one arriving
    * later is treated as a fresh document. Correctness of the horizon
    * comes from the STORED last-seen value; the event-time timeout's
    * only job is to delete state once the watermark passes
    * last-seen + TTL — so total state is bounded by the number of
    * distinct fingerprints seen within one TTL horizon, independent of
    * stream lifetime. (Semantics match what a 100 TB pipeline wants:
    * global forever-dedup needs an external fingerprint store; within-
    * horizon dedup is the streaming tier's contract.) Runs unchanged
    * on the RocksDB state store — StreamingSpec proves both the
    * horizon behavior and the state-size bound there.
    *
    * `docs` must carry (doc_id, text, ts) with `ts` the event time. */
  def ingestDedupTtl(docs: DataFrame, watermarkDelay: String,
      ttlMs: Long): Dataset[Deduped] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs
      .withColumn("fp", md5(lower(trim(col("text"))).cast("binary")))
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("fp"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, Deduped](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (fp: String, it: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed last-seen + TTL: forget the fingerprint
            state.remove()
            Iterator.empty
          } else {
            val events = it.toSeq
            val minTs = events.map(_._3.getTime).min
            val maxTs = events.map(_._3.getTime).max
            // fresh iff never seen, or last sighting fell out of the
            // horizon before this batch's earliest event (state may
            // outlive its horizon briefly when new data and timeout
            // land in the same batch — the stored value, not the
            // timeout, decides)
            val fresh = state.getOption.forall(last => minTs - last > ttlMs)
            val out =
              if (fresh) {
                val first = events.minBy(e => (e._3.getTime, e._1))
                Iterator.single(Deduped(first._1, fp))
              } else Iterator.empty
            state.update(maxTs)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, maxTs + ttlMs))
            out
          }
      }
  }
}
