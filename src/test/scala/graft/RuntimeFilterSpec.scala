package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Runtime filtering — the two mechanisms that make selective
  * fact-dim joins cheap at 100 TB without any hand-tuning:
  * dynamic partition pruning (skip whole partitions based on the
  * dim side's runtime values) and runtime bloom filters (push a
  * bloom of the small side's keys into the big side's scan). Both
  * are free consequences of declarative plans — this spec pins them
  * so a refactor can't silently lose them. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dynamic partition pruning fires on a partitioned fact join") {
    val path = Files.createTempDirectory("graft-dpp-").resolve("t").toString
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").parquet(path)
    // DPP wants a SELECTIVE PREDICATE surviving on the dim side — a
    // local relation constant-folds it away, so stage the dim as a
    // parquet table and filter on read
    val dimPath = Files.createTempDirectory("graft-dppdim-")
      .resolve("d").toString
    Seq(("R", "returned"), ("N", "none"), ("A", "ack"))
      .toDF("flag", "label").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("label") === "returned")
    val joined = spark.read.parquet(path)
      .join(dim, col("l_returnflag") === col("flag"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    val n = joined.collect()(0).getLong(0)
    // matches the static filter
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .agg(sum(col("l_quantity")).cast("long")).as[Long].head()
    assert(n == expected)
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(1500)}")
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    val conf = spark.conf
    // the enabled flag is saved too: it defaults to false, and leaking
    // it on leaves later suites' plan-shape assertions order-dependent
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // SMJ, not BHJ
      val selectiveOrders = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("might_contain"),
        s"no bloom filter pushed into the scan side:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
