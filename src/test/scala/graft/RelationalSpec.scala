package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  // Multi-tenant scheduling story (SchedulingSpec): FAIR pools with
  // weights/minShares + speculation are CONTEXT-level confs, so they
  // ride on the shared session. Both are inert for every other suite
  // — single-threaded tests land in the default pool, and in local
  // mode a speculative copy can never be placed (one host), so only
  // the detection event is observable.
  private lazy val poolsXml: String = {
    val f = java.nio.file.Files.createTempFile("graft-pools-", ".xml")
    java.nio.file.Files.writeString(f,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="interactive">
        |    <schedulingMode>FIFO</schedulingMode>
        |    <weight>4</weight>
        |    <minShare>2</minShare>
        |  </pool>
        |  <pool name="batch">
        |    <schedulingMode>FIFO</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |  <pool name="gold">
        |    <schedulingMode>FIFO</schedulingMode>
        |    <weight>2</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |  <pool name="silver">
        |    <schedulingMode>FIFO</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |</allocations>""".stripMargin)
    f.toString
  }
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // build-time extension wiring: the txnlog SQL DML parser (and the
    // function/strategy injections) ride on every test session
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // catalog-name txnlog tables resolve DSv2 (per-query fresh, no
    // relation cache) — the Delta-style dual wiring
    .config("spark.sql.catalog.spark_catalog",
      "graft.sources.TxnLogCatalog")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh-").toString)
    .config("spark.ui.enabled", "false")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.scheduler.allocation.file", poolsXml)
    .config("spark.speculation", "true")
    .config("spark.speculation.interval", "50ms")
    .config("spark.speculation.multiplier", "2")
    .config("spark.speculation.quantile", "0.75")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("all declared queries run and return rows on sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q47 distribution windows: pr/cd bounded and spend-monotone per nation") {
    val rows = SparkEntry.queries("q47_window_profile")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (nation, cs) =>
      val sorted = cs.sortBy(c => (c._2, c._3))
      assert(sorted.head._3 == 0.0, s"nation $nation min pr must be 0")
      assert(sorted.last._3 == 1.0 && sorted.last._4 == 1.0,
        s"nation $nation max pr/cd must be 1")
      sorted.sliding(2).foreach { p =>
        if (p.length == 2) {
          assert(p(0)._3 <= p(1)._3 && p(0)._4 < p(1)._4,
            s"nation $nation pr/cd not monotone in spend order")
        }
      }
    }
  }

  test("q1 groups by (returnflag, linestatus) with exact cent sums") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 9)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags.distinct.size == flags.size)
    assert(rows.forall(_.getLong(3) > 0)) // sum_base_cents positive
  }

  test("q8 top-k is ordered and bounded") {
    val rows = SparkEntry.queries("q8_topk_orders")(spark, sf).collect()
    assert(rows.length == 15)
    val totals = rows.map(_.getLong(1)).toSeq
    assert(totals == totals.sorted.reverse)
  }

  test("q13 histogram covers every customer exactly once") {
    val rows = SparkEntry.queries("q13_cust_order_counts")(spark, sf).collect()
    val nCust = rows.map(_.getLong(1)).sum
    assert(nCust == 150L) // sf0.001 customer count
  }

  test("q21 sessions never exceed events per user") {
    val rows = SparkEntry.queries("q21_sessionize")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)))
  }

  test("range frame: same-day orders share one window; deciles partition evenly") {
    val rows = SparkEntry.queries("q30_range_frame")(spark, sf).collect()
    // same (customer, day) rows must see the identical RANGE window —
    // the distinction from a ROWS frame, which would split them
    rows.groupBy(r => (r.getLong(0), r.getLong(2))).foreach {
      case (_, rs) =>
        assert(rs.map(r => (r.getLong(4), r.getLong(5))).distinct.length == 1)
    }
    // the trailing window always contains at least the current order
    assert(rows.forall(r => r.getLong(5) >= 1 && r.getLong(4) >= r.getLong(3)))

    val dec = SparkEntry.queries("q31_deciles")(spark, sf).collect()
    assert(dec.length == 10)
    val sizes = dec.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"ntile uneven: ${sizes.toSeq}")
    // decile value ranges are non-decreasing
    val byDecile = dec.sortBy(_.getLong(0))
    byDecile.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2) ||
        a.getLong(3) <= b.getLong(3))
      case _ =>
    }
  }

  test("q33: per-customer gap accounting is internally consistent") {
    val rows = SparkEntry.queries("q33_order_gaps")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - 1,
        s"customer ${r.getLong(0)}: n_gaps != n_orders - 1")
      // gaps are day differences in ascending date order: non-negative,
      // and the sum dominates the max
      assert(r.getLong(4) >= 0 && r.getLong(3) >= r.getLong(4))
    }
    // all orders accounted for
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("q34: grouping sets emit exactly the two marginals plus the grand total") {
    val rows = SparkEntry.queries("q34_grouping_sets")(spark, sf).collect()
    val status = rows.filter(r =>
      r.getString(0) != "(all)" && r.getString(1) == "(all)")
    val prio = rows.filter(r =>
      r.getString(0) == "(all)" && r.getString(1) != "(all)")
    val grand = rows.filter(r =>
      r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length == 1, "exactly one grand-total row")
    // no (status, priority) cross cells — the set rollup/cube can't skip
    assert(status.length + prio.length + 1 == rows.length)
    val total = grand(0).getLong(2)
    assert(status.map(_.getLong(2)).sum == total)
    assert(prio.map(_.getLong(2)).sum == total)
    assert(status.map(_.getLong(3)).sum == grand(0).getLong(3))
    assert(prio.map(_.getLong(3)).sum == grand(0).getLong(3))
  }

  test("sampled deciles: full coverage, bounded skew vs the exact form") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q36_sampled_deciles")(spark, sf).collect()
    val n = graft.sources.Tables.orders(spark, sf).count()
    // partition: 10 buckets, every order in exactly one
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).sum == n)
    // value ranges are disjoint and ordered (bucket i's max < i+1's min)
    rows.sortBy(_.getLong(0)).sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2),
        s"bucket ${a.getLong(0)} max ${a.getLong(3)} overlaps " +
          s"bucket ${b.getLong(0)} min ${b.getLong(2)}")
    }
    // skew bound: a 5% sample holds every bucket within a small
    // constant of the exact N/10 (the trade for never globally
    // sorting the full data; the exact q31 gets ±1)
    val target = n / 10.0
    rows.foreach { r =>
      val c = r.getLong(1)
      assert(c > 0.4 * target && c < 2.2 * target,
        s"bucket ${r.getLong(0)} size $c vs target $target")
    }
  }

  test("q36 sample is row-budgeted: modulus grows with corpus size") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational
    // rate = min(5%, budget/n): the 5% floor binds at the test SFs
    // (identical results), the row budget takes over past 2M rows
    assert(Relational.q36Modulus(15000) == 20)
    assert(Relational.q36Modulus(2000000) == 20)
    assert(Relational.q36Modulus(4000000) == 40)
    assert(Relational.q36Modulus(1000000000L) == 10000)
    // the sampled subtree on a ~267× key space: what flows into the
    // single ordered-ntile task stays pinned at ~budget rows
    val n = 4000000L
    val m = Relational.q36Modulus(n)
    val sampled = spark.range(n).select(col("id").as("o_orderkey"))
      .filter(graft.functions.RollingHash.rollingHash(
        md5(concat(lit("dec-"), col("o_orderkey").cast("string"))
          .cast("binary"))) % m === 0)
      .count()
    assert(sampled <= (Relational.Q36SampleBudget * 1.1).toLong,
      s"sample $sampled exceeds the 100k row budget")
    assert(sampled >= (Relational.Q36SampleBudget * 0.9).toLong,
      s"sample $sampled implausibly small for rate 1/$m of $n")
  }

  test("every query key has a DuckDB oracle (no rows-only queries left)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
