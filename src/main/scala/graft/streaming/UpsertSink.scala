package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC upsert sink — the INCREMENTAL form of the batch
  * merge in `Advanced.upsert` (reference analog: the re-run-the-job
  * output-overwrite cycle of MR pipelines, made a standing query):
  * each micro-batch of (key, payload, version) change records merges
  * latest-record-wins into a keyed parquet table via `foreachBatch`.
  *
  * Merge-on-WRITE per micro-batch: read the current table, union the
  * batch, keep row_number()=1 per key by (version desc) — one
  * key-partitioned window, no driver state. Cost per delivery is one
  * (table + batch) scan, the compaction trade every merge-tree
  * format makes; at 100 TB the same code runs with the table
  * bucketed by key so the window reuses the layout.
  *
  * Publication is ATOMIC per batch: the merged table is written to a
  * staging dir and swapped in with two renames, so a crash
  * mid-publish leaves either the old or the new table, never a
  * half-written mix — and because the merge is idempotent
  * (re-merging the same batch picks the same survivors), a replayed
  * micro-batch after a restart converges to the same table.
  */
object UpsertSink {

  /** Latest-record-wins merge of `updates` into the table at `dir`
    * (parquet; absent = empty). Exposed for the spec's batch-twin
    * equality check. */
  private[graft] def merge(updates: DataFrame, dir: String): DataFrame = {
    val sp = updates.sparkSession
    val p = new Path(dir)
    val fsys = p.getFileSystem(new Configuration())
    val existing =
      if (fsys.exists(p)) sp.read.parquet(dir)
      else sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        updates.schema)
    existing.unionByName(updates)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("key"))
          .orderBy(col("version").desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** One micro-batch delivery: recover from any prior crashed
    * publish, merge, then swap the merged table in with two renames.
    *
    * The two-rename swap has a crash WINDOW — a failure between
    * rename(table, retired) and rename(staged, table) leaves no table
    * dir on disk. Without recovery, the replayed batch would merge
    * against a falsely-EMPTY table and publish only its own keys,
    * silently dropping every prior row. So before merging we restore
    * the newest `.retired-*` sibling if the table dir is absent, and
    * sweep any older `.retired-*`/`.staging-*` leftovers (a crash
    * after publish but before the retired-dir delete leaves one).
    * With recovery in place the replay is idempotent at every crash
    * point: the reader always sees either the old or the new table. */
  private[graft] def publish(batch: DataFrame, tableDir: String,
      batchId: Long): Unit = {
    val conf = new Configuration()
    val table = new Path(tableDir)
    val fsys = table.getFileSystem(conf)
    val parent = table.getParent
    def siblings(prefix: String): Array[Path] =
      if (parent != null && fsys.exists(parent))
        fsys.listStatus(parent).map(_.getPath)
          .filter(_.getName.startsWith(prefix))
      else Array.empty[Path]
    val retiredPrefix = table.getName + ".retired-"
    val stagingPrefix = table.getName + ".staging-"
    if (!fsys.exists(table)) {
      val orphans = siblings(retiredPrefix)
      if (orphans.nonEmpty) {
        // Crash hit between the two renames: the retired dir IS the
        // table. Restore the newest (highest batchId) copy.
        val newest =
          orphans.maxBy(_.getName.drop(retiredPrefix.length).toLong)
        require(fsys.rename(newest, table),
          s"upsert sink: cannot restore $newest")
      }
    }
    // Older retired/staging leftovers are dead weight (this batch's
    // staging dir is rewritten below with mode=overwrite).
    (siblings(retiredPrefix) ++ siblings(stagingPrefix))
      .foreach(p => fsys.delete(p, true))
    val staged = new Path(tableDir + s".staging-$batchId")
    val retired = new Path(tableDir + s".retired-$batchId")
    // merge against the CURRENT table into staging...
    merge(batch, tableDir).write.mode("overwrite")
      .parquet(staged.toString)
    // ...then publish with two renames (atomic swap)
    if (fsys.exists(table)) {
      require(fsys.rename(table, retired),
        s"upsert sink: cannot retire $table")
    }
    require(fsys.rename(staged, table),
      s"upsert sink: cannot publish $staged")
    fsys.delete(retired, true)
    ()
  }

  /** Start the sink: `stream` must carry (key, payload, version)
    * with versions unique per key (CDC log offsets are). */
  def start(stream: DataFrame, tableDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publish(batch, tableDir, batchId)
      }
      .start()
}
