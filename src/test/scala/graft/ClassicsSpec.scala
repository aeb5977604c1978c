package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MapReduceClassics, TextAnalysis}
import graft.sources.Tables

/** Property specs for the round-3 classic-job additions: TF-IDF,
  * integer PageRank, and the count-min-sketch heavy hitters. */
class ClassicsSpec extends AnyFunSuite {
  import TestSpark._

  test("tfidf emits at most 3 ranked terms per doc, scores descending") {
    val rows = MapReduceClassics.tfIdf(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rs) =>
      val ranks = rs.map(_.getLong(5)).toSeq.sorted
      assert(ranks == (1L to rs.length).toSeq, s"doc $doc ranks: $ranks")
      assert(rs.length <= 3)
      // ranks follow score descending (word tiebreak only on equality)
      val byRank = rs.sortBy(_.getLong(5)).map(_.getDouble(4)).toSeq
      assert(byRank == byRank.sorted.reverse, s"doc $doc scores: $byRank")
    }
    // a term in every document is worthless: idf multiplier 1 means
    // its score can't beat an equally-frequent rarer term
    assert(rows.forall(_.getDouble(4) > 0))
  }

  test("pagerank conserves bounded mass and rewards high-degree nodes") {
    val rows = MapReduceClassics.pageRank(spark, sf).collect()
    assert(rows.length == 100)
    // every rank >= the teleport floor; ordered desc
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks.forall(_ >= 150000L))
    assert(ranks == ranks.sorted.reverse)
    // suppliers (odd ids) dominate the top: ~200x fewer suppliers than
    // parts share the same edge set, so per-node rank concentrates
    val top10 = rows.take(10).map(_.getLong(0))
    assert(top10.count(_ % 2 == 1) >= 8, s"top-10 nodes: ${top10.toSeq}")
  }

  test("converged pagerank: integer fixpoint inside the round budget") {
    val (df, rounds) = MapReduceClassics
      .pageRankConvergedRounds(spark, sf)
    // Δ decays ~0.85x/round from ~16.6e6, so ε=200k lands the
    // fixpoint at round 28 on this corpus — pinned, and strictly
    // inside the 30-round cap (the cap is a budget, not the stop)
    assert(rounds == 28, s"expected 28 advancing rounds, got $rounds")
    assert(rounds < MapReduceClassics.PrCap)
    val rows = df.collect()
    assert(rows.length == 100)
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks.forall(_ >= 150000L))
    assert(ranks == ranks.sorted.reverse)
    // convergence moved the answer: the fixed-5 snapshot is not the
    // fixpoint (otherwise the operator adds nothing over mr_pagerank)
    val five = MapReduceClassics.pageRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq != five)
  }

  test("converged pagerank releases superseded round checkpoints") {
    // 28 rounds must NOT pin 28 node-scale rank tables: each round
    // unpersists its predecessor the moment the next materializes, so
    // the persistent-RDD census grows by a constant, not by rounds
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (df, rounds) = MapReduceClassics.pageRankConvergedRounds(spark, sf)
    assert(df.count() == 100 && rounds == 28)
    val added = (sc.getPersistentRDDs.keySet -- before).size
    assert(added <= 2,
      s"$added checkpoints still persisted after $rounds rounds")
  }

  test("triangle count equals an independent unordered triple enumeration") {
    val r = MapReduceClassics.triangles(spark, sf).collect()(0)
    val (nodes, edges, wedges, tri, pm) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nodes > 0 && edges > 0 && tri >= 0)
    assert(pm == 3000 * tri / wedges)
    // independent count: plain id-ordered a<b<c triple join (the
    // orientation-free formulation the degree-ordered plan replaces)
    val pp = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a").join(pp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select(col("u"), col("v"))
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    assert(tri == naive, s"degree-oriented count $tri != naive $naive")
    assert(edges == e.count())
  }

  test("count-min estimates never undercount and bound the error") {
    val rows = TextAnalysis.heavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    val streamN = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).count()
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      // CMS one-sided guarantee: never under, over by < N/w per row
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
      assert(est - exact <= streamN / 2048 * 4,
        s"${r.getString(0)}: error ${est - exact} too large for N=$streamN")
    }
    // the true most frequent token must surface in the top-10
    val trueTop = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().orderBy(col("count").desc).head().getString(0)
    assert(rows.map(_.getString(0)).contains(trueTop), s"missing $trueTop")
  }
}
