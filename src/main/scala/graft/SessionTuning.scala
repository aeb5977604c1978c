package graft

import org.apache.spark.sql.SparkSession

/** Shared shuffle-parallelism tuning for the driver-contract mains
  * (Bench / Verify) and the dev Profile main — applied in one place
  * so the correctness gate always runs under the SAME settings the
  * bench runs under (a partition-order-sensitive result bug must
  * fail the oracle, not flake the bench).
  *
  * Why: AQE's partition coalescing floor (minPartitionSize, 1 MB
  * default) collapses every sub-MB shuffle to ONE post-shuffle task,
  * serializing compute-heavy small-shuffle stages (r21 profile: the
  * pageRankConverged iteration shuffles and most dedup/verify joins
  * ran one task wide on a 32-core box). The knob is a FLOOR: at
  * production scale shuffle partitions are sized by bytes-per-core
  * (coalescePartitions.parallelismFirst), far above either value, so
  * lowering it changes nothing at 100 TB — it only stops the floor
  * from serializing small-shuffle work. Env-overridable for cluster
  * deployments that want the stock floor back.
  *
  * Scan-split tuning (spark.sql.files.openCostInBytes) was tried and
  * REJECTED here: it bought little (single-row-group test files cap
  * scan parallelism anyway) and it changes scan split counts, which
  * feed the file counts that DML restages — and therefore the
  * file-count-bearing fixture results (src_txnlog_history) — making
  * results depend on a config knob. See OPTIMIZATION_r21.md.
  */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "65536"))
}
