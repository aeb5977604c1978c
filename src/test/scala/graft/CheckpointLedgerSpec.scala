package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CheckpointLedger

/** r22: block-manager census for the checkpoint ledger — operators
  * whose RETURNED plan consumes a localCheckpoint track it, and the
  * next declared-query build sweeps the previous query's blocks, so a
  * long session retains at most ONE query's checkpointed storage (the
  * pageRankConverged release discipline, extended to the sites the
  * r21 verdict listed: semantic-dedup's corpus assignment, the bloom
  * fingerprint set, the substring window fingerprints, the components
  * labels, the sampled lm-bucket scores). */
class CheckpointLedgerSpec extends AnyFunSuite {
  import TestSpark._

  private def runQuery(name: String): Unit =
    SparkEntry.queries(name)(spark, sf)
      .write.format("noop").mode("overwrite").save()

  test("returned-plan checkpoints release at the next query build") {
    val sc = spark.sparkContext
    CheckpointLedger.sweep() // clean slate from earlier suites
    val before = sc.getPersistentRDDs.keySet
    // dedup_semantic tracks its corpus-scale assignment checkpoint;
    // materializing it must leave the blocks alive (the plan reads
    // them) but TRACKED for the next build
    runQuery("dedup_semantic")
    assert(CheckpointLedger.pendingCount >= 1)
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty)
    // building ANY next declared query sweeps them; after ITS own
    // materialization the census is back to at most that query's own
    // tracked blocks — nothing accumulates across queries
    runQuery("dedup_bloom_admit")
    runQuery("q2_filter_project") // tracks nothing; sweeps the bloom set
    assert(CheckpointLedger.pendingCount == 0)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"${leaked.size} checkpointed RDD(s) survived two query builds")
  }

  test("in-function training checkpoints never reach the ledger") {
    val sc = spark.sparkContext
    CheckpointLedger.sweep()
    val before = sc.getPersistentRDDs.keySet
    // perceptron features and both PQ/IVF training samples release
    // inside their operator (their last consumer is an internal
    // collect) — the census must come back clean with NO sweep needed
    runQuery("ml_perceptron_quality")
    runQuery("emb_pq")
    assert(CheckpointLedger.pendingCount == 0)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"${leaked.size} training checkpoint(s) survived their operator")
  }
}
