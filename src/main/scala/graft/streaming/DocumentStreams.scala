package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
}
