package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2): treat media payloads as
  * opaque binary columns with typed metadata, decoded in batched
  * per-partition passes.
  *
  * The container has no image/audio codecs, so the "decode" is a
  * deterministic stub (dimensions derived from the first payload
  * bytes); everything around it — binary column, partition-local
  * batch iteration via mapPartitions with a typed Encoder, metadata
  * schema — is the real production shape. mapPartitions is the
  * documented last-resort tier (SURVEY.md §4): a codec call is opaque
  * to Catalyst, so the only job of the plan is to keep it
  * partition-local and column-pruned, which this is.
  */
/** Encoder-visible row types (codegen'd (de)serializers need public
  * classes). */
case class MediaPayload(doc_id: Long, bytes: Array[Byte])
case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
    width: Long, height: Long)

object Multimodal {

  /** Binary payload + stub-decoded metadata per document. */
  def meta(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[MediaPayload]
    payloads.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one instance per batch
      val hex = "0123456789abcdef".toCharArray
      it.map { p =>
        md.reset()
        val dig = md.digest(p.bytes)
        val sb = new java.lang.StringBuilder(32)
        dig.foreach { b =>
          sb.append(hex((b >> 4) & 0xf)); sb.append(hex(b & 0xf))
        }
        val digest = sb.toString
        // stub decode: "header" = first two bytes drive fake dimensions
        val w = if (p.bytes.length > 0) (p.bytes(0) & 0xff) % 64 + 1 else 0
        val h = if (p.bytes.length > 1) (p.bytes(1) & 0xff) % 64 + 1 else 0
        MediaMeta(p.doc_id, p.bytes.length.toLong, digest, w.toLong, h.toLong)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }
}
