package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Parquet-backed so Catalyst pushes predicates and prunes columns at
  * the scan (the HDFS-splittable-input role of the reference:
  * hadoop-hdfs-project provides splittable block storage; Spark's
  * parquet source provides the same partitioned-scan contract with
  * column pruning on top).
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")

  /** `events.ts` arrives in whatever encoding the generator staged:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long via the legacy conf and convert
    * with exact integer division; `ts div 1000` stays in long
    * arithmetic because a double roundtrip would lose precision above
    * 2^53 ns), TIMESTAMP(MICROS) NTZ (cast to the instant-bearing
    * type), or an instant type already. The switch is shared with the
    * streaming reader (EventStreams.readEvents) so the two paths can
    * never diverge on encoding again. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ instants are UTC in this pipeline; downstream time math
        // (unix_micros, windows) requires the instant-bearing type
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private val pinnedEventPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Event-time scale pin: the next testdata encoding flip must fail
    * HERE, at the reader, not three specs downstream (the round-9
    * lesson — micros landed where the streaming reader assumed nanos
    * and every timestamp silently shrank 1000×). One min/max-year
    * aggregate per path per JVM (memoized; ~a column-stats scan, so
    * it costs one cheap job once, not per query) asserts the decoded
    * event times land in a sane window. A mis-scale is 1000× — three
    * orders of magnitude — so any [1990, 2100] miss is unambiguous. */
  private[graft] def pinEventTimeScale(events: DataFrame, path: String): Unit =
    if (pinnedEventPaths.add(path)) {
      import org.apache.spark.sql.functions._
      val r = events.agg(min(year(col("ts"))), max(year(col("ts")))).head()
      if (!r.isNullAt(0)) {
        val (lo, hi) = (r.getInt(0), r.getInt(1))
        if (lo < 1990 || hi > 2100) {
          pinnedEventPaths.remove(path) // keep failing on retry
          throw new IllegalArgumentException(
            s"events at $path decode to years [$lo, $hi] — timestamp " +
              "encoding mis-scaled (nanos/micros mix-up?); fix the " +
              "reader's normalization, do not widen this pin")
        }
      }
    }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = normalizeEventTs(read(s, d, "events"))
    pinEventTimeScale(df, s"$d/events.parquet")
    df
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
