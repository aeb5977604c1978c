package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
case class MediaThumb(doc_id: Long, width: Long, height: Long,
    thumb_w: Long, thumb_h: Long)
case class MediaFrames(doc_id: Long, n_frames: Long, frame0_digest: String)
case class MediaVec(doc_id: Long, vec: Array[Float])

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

  private def payloads(s: SparkSession, d: String) = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[MediaPayload]
  }

  /** Resize: aspect-preserving thumbnail dimensions from the stubbed
    * header dims, longest edge 16 (integer arithmetic only so the
    * oracle mirrors exactly). The real op would hand each batch to a
    * codec; the partition-local batch shape is identical. */
  def resize(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    payloads(s, d).mapPartitions { it =>
      it.map { p =>
        val w = if (p.bytes.length > 0) (p.bytes(0) & 0xff) % 64 + 1 else 0
        val h = if (p.bytes.length > 1) (p.bytes(1) & 0xff) % 64 + 1 else 0
        val m = math.max(w, h)
        MediaThumb(p.doc_id, w.toLong, h.toLong,
          if (m == 0) 0L else (w.toLong * 16) / m,
          if (m == 0) 0L else (h.toLong * 16) / m)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** The multimodal -> similarity bridge: stub "feature extraction"
    * turns each payload's first 32 bytes into a 32-dim vector
    * (zero-padded; byte values are integers, exactly representable in
    * float, so both engines cosine over identical doubles), then
    * exact top-3 cosine neighbors for the first 10 docs — the
    * decode -> embed -> ANN flow of a real multimodal pipeline with
    * the codec stubbed and every Spark-side mechanism real. */
  def embedKnn(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val dims = 32
    val vecs = payloads(s, d).mapPartitions { it =>
      it.map { p =>
        val v = new Array[Float](dims)
        var i = 0
        while (i < dims && i < p.bytes.length) {
          v(i) = (p.bytes(i) & 0xff).toFloat
          i += 1
        }
        MediaVec(p.doc_id, v)
      }
    }.toDF()
    val queries = vecs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("vec").as("q_vec"))
    val scored = vecs.crossJoin(broadcast(queries))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.VectorFunctions
        .cosineSim(col("q_vec"), col("vec")))
    Similarity.topKPerGroup(scored, col("q_id"), col("cos"), col("doc_id"), 3)
      .select(col("q_id"), col("doc_id").as("neighbor_id"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Frame sampling: treat the payload as fixed-size 256-byte frames,
    * count them and fingerprint frame 0 — the batched video-sampling
    * shape with a deterministic stub decoder. The fingerprint is
    * md5 over the UPPERCASE-HEX rendering of the first 256 bytes
    * (not the raw bytes) so the DuckDB oracle can reproduce it
    * byte-exactly for any UTF-8 input — DuckDB 1.x cannot hash or
    * slice BLOBs, but substr(hex(encode(text))) is octet-precise. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    payloads(s, d).mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      val hexLo = "0123456789abcdef".toCharArray
      val hexUp = "0123456789ABCDEF".toCharArray
      it.map { p =>
        val frameSize = 256
        val nFrames = p.bytes.length / frameSize
        val f0 = p.bytes.take(math.min(frameSize, p.bytes.length))
        val hx = new java.lang.StringBuilder(f0.length * 2)
        f0.foreach { b =>
          hx.append(hexUp((b >> 4) & 0xf)); hx.append(hexUp(b & 0xf))
        }
        md.reset()
        val dig = md.digest(hx.toString.getBytes(StandardCharsets.US_ASCII))
        val sb = new java.lang.StringBuilder(32)
        dig.foreach { b =>
          sb.append(hexLo((b >> 4) & 0xf)); sb.append(hexLo(b & 0xf))
        }
        MediaFrames(p.doc_id, nFrames.toLong, sb.toString)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** WebDataset-style shard manifest: pack documents (in doc_id
    * order) into ~256 KB shards and emit one manifest row per shard
    * (counts, byte span, id range, content checksum) — the export
    * step that turns a cleaned corpus into training shards.
    *
    * Shard assignment needs a GLOBAL prefix sum of byte sizes; a
    * single `Window.orderBy` computes it in ONE task, so this uses
    * the two-level distributed scan instead: (1) per-bucket byte
    * totals (bucket = doc_id div 1000, one small aggregate), (2) a
    * running total over BUCKETS (bucket-count-scale window, thousands
    * of rows at 100 TB), (3) bucket offset + within-bucket cumulative
    * window (partitioned, parallel). Same arithmetic, no sequential
    * bottleneck. The checksum is an order-independent long sum of
    * per-doc md5 folds, so shard integrity is oracle-verifiable. */
  def shardManifest(s: SparkSession, d: String): DataFrame = {
    val target = 256L * 1024
    val sized = Tables.documents(s, d)
      .select(col("doc_id"), expr("octet_length(text)").as("bytes"),
        graft.functions.RollingHash.rollingHash(
          md5(col("text").cast("binary"))).as("fp"))
      .withColumn("bucket", expr("doc_id div 1000"))
    val offsets = sized.groupBy(col("bucket"))
      .agg(sum(col("bytes")).as("bb"))
      .withColumn("off", coalesce(sum(col("bb")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    sized.join(offsets, "bucket")
      .withColumn("cum", col("off") + sum(col("bytes")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("shard", expr(s"(cum - bytes) div $target"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("fp")).as("checksum"))
      .orderBy(col("shard"))
  }
}
