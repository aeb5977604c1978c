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

  /** `events.ts` may be parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects: read nanos as long (legacy conf) and
    * convert with exact integer division — `ts div 1000` stays in
    * long arithmetic (a double roundtrip would lose precision above
    * 2^53 ns). Micro/milli-encoded inputs arrive as TimestampType
    * already and pass through untouched. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ instants are UTC in this pipeline; downstream time math
        // (unix_micros, windows) requires the instant-bearing type
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
