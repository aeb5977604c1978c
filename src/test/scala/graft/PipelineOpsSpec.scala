package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Specs for the round-2 pipeline operators: stratified sampling,
  * repetition stats, contamination screen, survivorship dedup. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("stratified sample hits the configured rates within tolerance") {
    val rows = TextAnalysis.sampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (n, k)) =>
      val rate = if (lang == "en") 0.1 else 0.5
      val tol = 4 * math.sqrt(rate * (1 - rate) / n) // ±4σ binomial
      assert(math.abs(k.toDouble / n - rate) <= tol,
        s"$lang sampled $k/$n, expected ~$rate")
    }
  }

  test("repetition stats are internally consistent") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, bps) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d <= n && bps >= 0 && bps <= 10000)
      if (n > 0) assert(bps == 10000 * (n - d) / n)
    }
  }

  test("contamination screen emits one row per eval phrase") {
    val rows = TextAnalysis.contamination(spark, sf).collect()
    assert(rows.length == TextAnalysis.EVAL_NGRAMS.length)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1))) // occ >= docs
  }

  test("survivor picks the longest doc per group, same groups as exact") {
    val surv = Dedup.survivor(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Dedup.exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(surv.keySet == exact.keySet) // identical duplicate groups
    // survivor's keep_chars must be the group's actual doc length
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    surv.foreach { case (_, (keepId, keepChars)) =>
      assert(docs(keepId) == keepChars)
    }
  }
}
