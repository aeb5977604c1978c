package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates that graft's join plans compose with AQE's runtime
  * skew mitigation — the complement to the MANUAL salting rewrite
  * (Advanced.saltedJoin, for pre-AQE stages / keyed aggregations):
  * a sort-merge join whose left side is 90%+ one hot key gets its
  * oversized partition split at runtime (OptimizeSkewedJoin), with
  * results identical to the unskewed-path join.
  */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds low enough that a ~MB hot partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 200k fact rows, 92% on key 7; 100 dim rows
      val fact = spark.range(200000)
        .select(when(col("id") % 25 =!= 0, 7L).otherwise(col("id") % 100)
          .as("k"), col("id").as("v"), lit("x").as("pad"))
      val dim = spark.range(100)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS Dataset's queryExecution (count() would
      // build a separate one and leave joined's plan unexecuted)
      val n = joined.collect().length
      assert(n == 200000)

      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")

      // and the result matches the same join computed skew-free
      // (broadcast path)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val bSum = fact.join(broadcast(dim), "k")
        .agg(sum(col("v"))).as[Long].head()
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sSum = joined.agg(sum(col("v"))).as[Long].head()
      assert(bSum == sSum)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
