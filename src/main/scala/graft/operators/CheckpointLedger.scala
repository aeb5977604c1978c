package graft.operators

import org.apache.spark.sql.DataFrame

/** Release discipline for localCheckpoints whose LAST consumer is the
  * caller's RETURNED plan (r21 verdict item 4): such blocks cannot be
  * released inside the operator — the returned DataFrame still reads
  * them, and a localCheckpoint's lineage is truncated, so an early
  * release breaks the query rather than recomputing — and without any
  * release they pin executor storage until the JVM exits (one copy
  * per query call; at 100 TB the semantic-dedup assignment is
  * corpus-scale). The ledger bounds retention to ONE query: operators
  * `track` those checkpoints, and `SparkEntry.queries` sweeps the
  * ledger when the NEXT declared query is built — by which point every
  * prior query's plan has been materialized by the harness (Bench,
  * Verify and Profile all consume each query before building the
  * next; plan-only consumers like Explain never read the blocks at
  * all). Checkpoints whose last consumer action is INSIDE the
  * operator (training samples, per-round iterates) release in place
  * instead and never enter the ledger. Direct operator calls (specs)
  * never sweep, so a spec holding several frames stays safe. */
private[graft] object CheckpointLedger {
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register a checkpointed frame consumed by the caller's returned
    * plan; released at the next declared-query build. */
  def track(df: DataFrame): DataFrame = { pending.add(df); df }

  /** Release every tracked checkpoint's blocks (no-op when empty). */
  def sweep(): Unit = {
    var df = pending.poll()
    while (df != null) {
      org.apache.spark.sql.graftshim.Shim.releaseCheckpoint(df)
      df = pending.poll()
    }
  }

  /** Tracked-but-unswept count — census-spec surface. */
  def pendingCount: Int = pending.size
}
