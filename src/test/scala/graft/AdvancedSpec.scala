package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Advanced
import graft.sources.Tables

class AdvancedSpec extends AnyFunSuite {
  import TestSpark._

  test("as-of join only ever matches strictly-prior clicks") {
    val rows = Advanced.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) < r.getLong(2),
        s"click at ${r.getLong(3)} not strictly before purchase ${r.getLong(2)}")
    }
  }

  test("salted join equals plain join") {
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val salted = Advanced.saltedJoin(l, o, "k", salt = 8)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = l.join(o, "k")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join is correct under heavy key skew") {
    import spark.implicits._
    // one key owns half the fact rows — the shape that stalls a
    // plain hash shuffle at scale
    val fact = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1L to 10000L).map(k => (k, s"d$k")).toDF("k", "name")
    val salted = Advanced.saltedJoin(fact, dim, "k", salt = 16)
    val plain = fact.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).collect()(0).getLong(0) ==
      plain.agg(sum("v")).collect()(0).getLong(0))
  }

  test("HLL approx distinct stays within 5% of exact") {
    val df = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()(0)
    val exact = df.getLong(0).toDouble
    val approx = df.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }
}
