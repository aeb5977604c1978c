package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.sources.Tables
import graft.streaming.EventStreams

/** The events table has shipped in two on-disk ts encodings so far
  * (int64 TIMESTAMP(NANOS) read as long, then int64 TIMESTAMP(MICROS)
  * NTZ) — and the round-9 regression was exactly one reader adapting
  * while the other kept the old assumption. This spec stages BOTH
  * encodings from one logical dataset and proves the batch and
  * streaming readers decode them identically, plus that a mis-scaled
  * encoding fails loudly at the reader (Tables.pinEventTimeScale)
  * instead of three specs downstream. */
class EventEncodingSpec extends AnyFunSuite {
  import TestSpark._

  // one logical dataset: 12 events in June 2024, micros since epoch
  private val baseUs: Long =
    java.time.Instant.parse("2024-06-01T00:00:00Z").toEpochMilli * 1000L

  private def logical: DataFrame = {
    val sp = spark
    import sp.implicits._
    (0 until 12).map { i =>
      (i.toLong, baseUs + i * 600L * 1000000L, (i % 3).toLong,
        if (i % 2 == 0) "click" else "purchase", 1.5 * i, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  private def stage(ts: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc-").toString
    logical.select(col("event_id"), ts.as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def batchMap(d: String): Map[Long, java.sql.Timestamp] =
    Tables.events(spark, d).select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap

  private def streamMap(d: String, qn: String): Map[Long, java.sql.Timestamp] = {
    val q = EventStreams.readEvents(spark, d).select("event_id", "ts")
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(qn).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
  }

  test("batch and stream readers agree on the nanos-as-long encoding") {
    val d = stage((col("ts_us") * 1000L).cast("long"))
    val batch = batchMap(d)
    assert(batch.size == 12)
    // decoded instants are the logical micros, exactly
    assert(batch(1L).toInstant.toEpochMilli * 1000L == baseUs + 600000000L)
    assert(streamMap(d, "enc_nanos") == batch)
  }

  test("batch and stream readers agree on the micros-NTZ encoding") {
    val d = stage(timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    val batch = batchMap(d)
    assert(batch.size == 12)
    assert(batch(1L).toInstant.toEpochMilli * 1000L == baseUs + 600000000L)
    assert(streamMap(d, "enc_ntz") == batch)
  }

  test("the two encodings of one dataset decode to identical instants") {
    val nanos = batchMap(stage((col("ts_us") * 1000L).cast("long")))
    val ntz = batchMap(
      stage(timestamp_micros(col("ts_us")).cast(TimestampNTZType)))
    assert(nanos == ntz)
  }

  test("a mis-scaled encoding fails loudly at BOTH readers") {
    // micros stored where the long encoding means nanos: div 1000
    // lands every event in 1970 — the exact round-9 failure shape
    val d = stage(col("ts_us").cast("long"))
    val e1 = intercept[IllegalArgumentException] { Tables.events(spark, d) }
    assert(e1.getMessage.contains("mis-scaled"))
    // memoized pin keeps failing on retry, and the streaming reader
    // hits the same pin before any query starts
    val e2 = intercept[IllegalArgumentException] {
      EventStreams.readEvents(spark, d)
    }
    assert(e2.getMessage.contains("mis-scaled"))
  }
}
