package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TxnLog

/** Pins the transaction-log guarantees src_txnlog_snapshot's oracle
  * can't see: commit atomicity (no partial version is ever visible),
  * the concurrent-writer race (every slot has exactly one winner and
  * no append is lost), stale-rewrite refusal, and vacuum's
  * time-travel trade. */
class TxnLogSpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(): TxnLog.Table =
    TxnLog.Table(Files.createTempDirectory("graft-txnspec-").resolve("t"))

  private def oneRowDf(id: Long) = {
    import spark.implicits._
    Seq(id).toDF("id")
  }

  test("txnlog: staged data and tmp log files are invisible until the version links") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    // a crashed writer's leftovers: staged parquet with no commit, and
    // a fully written but never-linked tmp action file
    val orphan = t.dataDir.resolve("orphan-stage")
    oneRowDf(99).write.parquet(orphan.toString)
    val rel = t.root.relativize(
      Files.list(orphan).iterator().next()).toString
    Files.writeString(t.logDir.resolve(".tmp-crashed"), s"add\t$rel\n")
    val snap = TxnLog.snapshot(t)
    assert(snap.version === 0L)
    assert(snap.liveFiles.size === 1)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("txnlog: racing appends all land, versions stay dense, no row lost or doubled") {
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    val n = 8
    // pre-stage serially (Spark writes share the session), then race
    // ONLY the commit protocol on raw action files
    val staged = (0 until n).map { i =>
      val stage = t.dataDir.resolve(s"stage-$i")
      oneRowDf(i.toLong).write.parquet(stage.toString)
      Files.list(stage).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => t.root.relativize(p).toString).toSeq
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxnLog.commit(t, base = -1L, adds = staged(i))
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions === (0L until n.toLong))
    } finally pool.shutdown()
    val ids = TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until n.toLong))
  }

  test("txnlog: a rewrite based on a stale snapshot refuses instead of losing the concurrent append") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    val stale = TxnLog.snapshot(t) // v0
    TxnLog.append(spark, t, oneRowDf(2)) // v1 lands after the read set
    val stage = t.dataDir.resolve("rewrite-stage")
    oneRowDf(1).write.parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val adds = Files.list(stage).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => t.root.relativize(p).toString).toSeq
    intercept[java.util.ConcurrentModificationException] {
      TxnLog.commit(t, base = stale.version, adds = adds,
        removes = stale.liveFiles)
    }
    // nothing was published; both rows still read
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
  }

  test("txnlog: change feed — fast path on append ranges, real deletes surface, rewrite invisible") {
    val t = freshTable()
    (1 to 3).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    // append-only range: log-resolved inserts, no deletes
    val (ins0, del0) = TxnLog.changes(spark, t, 0L, 2L)
    assert(ins0.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    assert(del0.count() === 0)
    // a compaction rewrite is row-level invisible to the diff path
    TxnLog.compact(spark, t) // v3
    val (ins1, del1) = TxnLog.changes(spark, t, 2L, 3L)
    assert(ins1.count() === 0 && del1.count() === 0)
    // a REAL delete commit (remove a live file, re-add nothing)
    val snap = TxnLog.snapshot(t)
    val victim = snap.liveFiles.head
    TxnLog.commit(t, snap.version, adds = Nil, removes = Seq(victim)) // v4
    val (ins2, del2) = TxnLog.changes(spark, t, 3L, 4L)
    assert(ins2.count() === 0)
    assert(del2.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L)) // the compacted single file held all rows
  }

  test("txnlog: incremental consumer — pending/ack lifecycle, at-least-once on crash") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    TxnLog.append(spark, t, oneRowDf(2))
    // first contact: the whole table is the backlog
    val Some((v0, ins0, del0)) = TxnLog.pending(spark, t, "etl")
    assert(v0 === 1L && del0.count() === 0)
    assert(ins0.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // crash BEFORE ack: the same batch is re-delivered, nothing lost
    val Some((v1, ins1, _)) = TxnLog.pending(spark, t, "etl")
    assert(v1 === v0)
    assert(ins1.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    TxnLog.ack(t, "etl", v0)
    // caught up
    assert(TxnLog.pending(spark, t, "etl").isEmpty)
    // new commits deliver ONLY the delta; a compaction alone delivers
    // nothing at row level
    TxnLog.append(spark, t, oneRowDf(3))
    TxnLog.compact(spark, t)
    val Some((v2, ins2, del2)) = TxnLog.pending(spark, t, "etl")
    assert(v2 === TxnLog.latestVersion(t))
    assert(ins2.collect().map(_.getLong(0)).toSeq === Seq(3L))
    assert(del2.count() === 0)
    TxnLog.ack(t, "etl", v2)
    assert(TxnLog.pending(spark, t, "etl").isEmpty)
    // independent consumers keep independent cursors
    assert(TxnLog.pending(spark, t, "audit").nonEmpty)
  }

  test("txnlog: a random operation history always matches the multiset model") {
    val rnd = new scala.util.Random(11)
    val t = freshTable()
    var model = Vector.empty[Long] // expected multiset at latest
    var next = 100L
    // (version, expected multiset) after every COMMIT — a raced step
    // lands two versions, so the axis is versions, not steps
    val history =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Vector[Long])]
    def record(): Unit = history += ((TxnLog.latestVersion(t), model))
    for (step <- 0 until 14) {
      rnd.nextInt(4) match {
        case 0 | 1 => // append 1-3 fresh rows
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            next += 1; next
          }
          import spark.implicits._
          TxnLog.append(spark, t, rows.toDF("id"))
          model = model ++ rows
          record()
        case 2 if model.nonEmpty => // compact (logical no-op)
          TxnLog.compact(spark, t)
          record()
        case 3 if model.nonEmpty => // stale-base dv DELETE racing an
          // append: the reconcile-and-retry path must land BOTH — the
          // interloper's row survives, the victim dies
          val victim = model(rnd.nextInt(model.size))
          val stale = TxnLog.snapshot(t)
          next += 1
          TxnLog.append(spark, t, oneRowDf(next))
          model = model :+ next
          record()
          TxnLog.deleteDv(spark, t, col("id") === victim,
            snap0 = Some(stale))
          model = model.filterNot(_ == victim)
          record()
        case _ => // nothing to compact/delete yet: append one row
          next += 1
          TxnLog.append(spark, t, oneRowDf(next))
          model = model :+ next
          record()
      }
      val got = TxnLog.read(spark, t).collect().map(_.getLong(0))
      assert(got.sorted.toSeq === model.sorted,
        s"step $step diverged from the model")
    }
    // time travel replays every historical state exactly
    history.foreach { case (v, expected) =>
      val got = TxnLog.read(spark, t, Some(v)).collect()
        .map(_.getLong(0))
      assert(got.sorted.toSeq === expected.sorted, s"version $v diverged")
    }
  }

  test("txnlog: exactly-once batch append — replays no-op, racing twins elect one writer") {
    val t = freshTable()
    assert(TxnLog.appendBatch(spark, t, oneRowDf(1), "etl", 0L))
    // restart replay of an already-committed batch: no-op
    assert(!TxnLog.appendBatch(spark, t, oneRowDf(1), "etl", 0L))
    assert(TxnLog.appendBatch(spark, t, oneRowDf(2), "etl", 1L))
    // a LATER marker also fences earlier replays
    assert(!TxnLog.appendBatch(spark, t, oneRowDf(1), "etl", 0L))
    // distinct apps do not fence each other
    assert(TxnLog.appendBatch(spark, t, oneRowDf(3), "other", 0L))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    assert(TxnLog.lastBatch(t, "etl") === Some(1L))
    // racing twins replaying ONE batch: exactly one commits
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val wins = (0 until 6).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            TxnLog.appendBatch(spark, t, oneRowDf(4), "etl", 2L)
        })
      }.count(_.get())
      assert(wins === 1, s"$wins twins committed batch 2")
    } finally pool.shutdown()
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("txnlog: foreachBatch streaming ingestion lands each micro-batch as one version") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val ctx = spark.sqlContext
    val t = freshTable()
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        TxnLog.appendBatch(spark, t, df, "ingest", id); ()
      }
      .start()
    try {
      mem.addData(1L, 2L); q.processAllAvailable()
      mem.addData(3L); q.processAllAvailable()
      mem.addData(4L, 5L); q.processAllAvailable()
    } finally q.stop()
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(TxnLog.latestVersion(t) === 2L) // one version per batch
    assert(TxnLog.lastBatch(t, "ingest") === Some(2L))
  }

  test("txnlog: corrupt actions fail loudly naming the file; stray log-dir files are ignored") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    // stray files that are NOT version logs must not confuse replay
    Files.writeString(t.logDir.resolve("README"), "not a log\n")
    Files.writeString(t.logDir.resolve("0001.log"), "add\tx\n") // wrong width
    assert(TxnLog.latestVersion(t) === 0L)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(1L))
    // an unknown verb in a REAL version file is corruption, not data:
    // replay must stop loudly, naming the file — never skip silently
    val bad = t.logDir.resolve(f"${1L}%020d.log")
    Files.writeString(bad, "frobnicate\tx\n")
    val e = intercept[IllegalStateException] { TxnLog.snapshot(t) }
    assert(e.getMessage.contains("corrupt") &&
      e.getMessage.contains(bad.getFileName.toString))
  }

  test("txnlog: additive schema evolution — later commits add columns, history keeps its shape") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L, 2L).toDF("id"))
    // v1 adds a column; v0's files stay untouched on disk
    TxnLog.append(spark, t, Seq((3L, "x")).toDF("id", "tag"))
    val merged = TxnLog.read(spark, t, mergeSchema = true)
    assert(merged.columns.sorted.toSeq === Seq("id", "tag"))
    val rows = merged.collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        Option(r.getAs[String]("tag")))).sortBy(_._1)
    // old rows null-fill the new column; the new row carries it
    assert(rows.toSeq === Seq((1L, None), (2L, None), (3L, Some("x"))))
    // time travel to v0 replays the ORIGINAL shape, not the merged one
    assert(TxnLog.read(spark, t, Some(0L), mergeSchema = true)
      .columns.toSeq === Seq("id"))
  }

  test("txnlog: concurrent batch appends and compactions never lose or double a row") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(0)) // seed so compact has work
    // NOTE the appendBatch contract: batch ids of ONE app are
    // sequential (Structured Streaming's foreachBatch guarantee) —
    // a marker fences every id at or below it, so concurrent DISTINCT
    // batches of one app would fence each other by design. Concurrent
    // WRITERS are therefore modeled as distinct apps, each replaying
    // its own batch, racing three compactions.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val compactWins = new java.util.concurrent.atomic.AtomicInteger
    try {
      val tasks = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            TxnLog.appendBatch(spark, t, oneRowDf(i.toLong), s"app$i", 0L)
            // immediate replay must no-op regardless of the races
            assert(!TxnLog.appendBatch(spark, t, oneRowDf(i.toLong), s"app$i", 0L))
          }
        })
      } ++ (0 until 3).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            // a compaction may lose the optimistic race — that is the
            // contract (refuse rather than lose a concurrent append);
            // what it must NEVER do is alter row content
            try { TxnLog.compact(spark, t); compactWins.incrementAndGet(); () }
            catch { case _: java.util.ConcurrentModificationException => () }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // every appended row exactly once, no matter how the races fell
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === (0L to 8L))
    // every app's marker recorded
    (1 to 8).foreach(i => assert(TxnLog.lastBatch(t, s"app$i") === Some(0L)))
    // versions stay dense through the mixed history
    val latest = TxnLog.latestVersion(t)
    assert(latest === 8L + compactWins.get())
    (0L to latest).foreach(v => TxnLog.snapshot(t, Some(v))) // all replay
  }

  test("txnlog: manifest stats prune files at planning time, never rows from results") {
    import spark.implicits._
    val t = freshTable()
    // four disjoint key ranges, one file each, stats in the manifest
    (0 until 4).foreach { i =>
      val rows = (i * 100L until i * 100L + 50L).toSeq
      TxnLog.appendWithStats(spark, t,
        rows.toDF("id").coalesce(1), Seq("id"))
    }
    // a stats-less append must never be skipped (conservative keep)
    TxnLog.append(spark, t, Seq(1000L).toDF("id"))
    // narrow probe: 1 stats file intersects + the stats-less file
    val (kept, total) = TxnLog.plannedFiles(t, "id", 120L, 130L)
    assert(total === 5 && kept === 2, s"planned $kept of $total")
    val got = TxnLog.readPruned(spark, t, "id", 120L, 130L)
      .filter($"id".between(120L, 130L)).collect().map(_.getLong(0))
    assert(got.sorted.toSeq === (120L to 130L).toSeq)
    // pruned read equals the unpruned read under the same predicate
    val full = TxnLog.read(spark, t)
      .filter($"id".between(120L, 130L)).collect().map(_.getLong(0))
    assert(got.sorted.toSeq === full.sorted.toSeq)
    // out-of-domain probe: only the stats-less file is planned
    assert(TxnLog.plannedFiles(t, "id", 5000L, 6000L)._1 === 1)
    // a probe matching nothing anywhere still returns a sane empty
    val none = TxnLog.readPruned(spark, t, "id", 5000L, 6000L)
      .filter($"id".between(5000L, 6000L))
    assert(none.count() === 0)
  }

  test("txnlog: row-level delete rewrites only affected files and records the change feed") {
    import spark.implicits._
    val t = freshTable()
    // four disjoint single-file ranges with manifest stats
    (0 until 4).foreach { i =>
      TxnLog.appendWithStats(spark, t,
        (i * 100L until i * 100L + 50L).toDF("id").coalesce(1), Seq("id"))
    }
    val before = TxnLog.snapshot(t)
    val vDel = TxnLog.delete(spark, t, col("id").between(120L, 230L))
    val after = TxnLog.snapshot(t, Some(vDel))
    // untouched files keep their identity — only files 1 and 2 rewrote
    val untouched = before.liveFiles.toSet intersect after.liveFiles.toSet
    assert(untouched.size === 2, s"expected 2 untouched files, " +
      s"kept ${untouched.size}")
    // rows: matching gone, survivors intact
    val got = TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
    val want = (0L until 400L).filter(id => id % 100 < 50)
      .filterNot(id => id >= 120L && id <= 230L)
    assert(got.toSeq === want)
    // rewritten survivors keep manifest stats: a probe outside every
    // surviving range plans ZERO files, an in-range probe a subset
    assert(TxnLog.plannedFiles(t, "id", 5000L, 6000L)._1 === 0)
    val (kept, total) = TxnLog.plannedFiles(t, "id", 0L, 10L)
    assert(kept >= 1 && kept < total, s"planned $kept of $total")
    // the deleted rows came out as cdc change files: the range is
    // LOG-RESOLVED (no snapshot diff) and replays exactly the victims
    val (ins, del) = TxnLog.changes(spark, t, before.version, vDel)
    assert(ins.count() === 0)
    assert(del.collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 400L).filter(id => id % 100 < 50)
        .filter(id => id >= 120L && id <= 230L))
    // a delete matching nothing commits nothing
    assert(TxnLog.delete(spark, t, col("id") > 99999L) === vDel)
    assert(TxnLog.latestVersion(t) === vDel)
  }

  test("txnlog: merge upserts — matched rows replaced, new rows inserted, only touched files rewrite") {
    import spark.implicits._
    val t = freshTable()
    // four disjoint single-file key ranges with manifest stats
    (0 until 4).foreach { i =>
      TxnLog.appendWithStats(spark, t,
        (i * 100L until i * 100L + 50L).map(k => (k, k * 10L))
          .toDF("id", "v").coalesce(1), Seq("id"))
    }
    val before = TxnLog.snapshot(t)
    // source: update two keys of file 1, insert two fresh keys
    val src = Seq((110L, -1L), (120L, -2L), (9000L, -3L), (9001L, -4L))
      .toDF("id", "v")
    val vM = TxnLog.merge(spark, t, src, "id")
    // only file 1 rewrote; files 0/2/3 keep their identity
    val untouched = before.liveFiles.toSet intersect
      TxnLog.snapshot(t).liveFiles.toSet
    assert(untouched.size === 3, s"expected 3 untouched, ${untouched.size}")
    val got = TxnLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 202)
    assert(got(110L) === -1L && got(120L) === -2L)
    assert(got(9000L) === -3L && got(9001L) === -4L)
    assert(got(111L) === 1110L) // untouched neighbor in the same file
    // the merge's change feed is (delete old images, insert new ones)
    val (ins, del) = TxnLog.changes(spark, t, before.version, vM)
    assert(del.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(110L -> 1100L, 120L -> 1200L))
    assert(ins.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(110L -> -1L, 120L -> -2L, 9000L -> -3L, 9001L -> -4L))
    // a source matching nothing is a plain append (no removes)
    val v2 = TxnLog.merge(spark, t,
      Seq((9100L, -5L)).toDF("id", "v"), "id")
    val (ins2, del2) = TxnLog.changes(spark, t, vM, v2)
    assert(del2.count() === 0)
    assert(ins2.collect().map(_.getLong(0)).toSeq === Seq(9100L))
  }

  test("txnlog: compaction keeps the data-skipping index and the change feed stays log-resolved across it") {
    import spark.implicits._
    val t = freshTable()
    (0 until 4).foreach { i =>
      TxnLog.appendWithStats(spark, t,
        (i * 100L until i * 100L + 50L).toDF("id").coalesce(1), Seq("id"))
    }
    TxnLog.compact(spark, t, targetFiles = 2) // v4
    // rewritten files carry recomputed (min, max): an out-of-domain
    // probe plans ZERO files even though every file is post-compaction
    assert(TxnLog.plannedFiles(t, "id", 5000L, 6000L)._1 === 0)
    // an in-domain narrow probe prunes to a strict subset
    val (kept, total) = TxnLog.plannedFiles(t, "id", 10L, 20L)
    assert(total === 2 && kept === 1, s"planned $kept of $total")
    // the compaction range resolves from the log (cdc none): both
    // sides empty without any snapshot diff
    val (ins, del) = TxnLog.changes(spark, t, 3L, 4L)
    assert(ins.count() === 0 && del.count() === 0)
  }

  test("txnlog: zorder compaction makes 2-D box probes prune from the manifest") {
    import spark.implicits._
    def mkTable(): TxnLog.Table = {
      val t = freshTable()
      // keys deliberately anti-correlated so single-key sorting
      // cannot make both dimensions tight
      val rows = (0L until 4096L).map(i => (i, i % 64L, (i / 64L) % 64L))
      TxnLog.appendWithStats(spark, t,
        rows.toDF("id", "a", "b").repartition(4), Seq("a", "b"))
      t
    }
    val zt = mkTable()
    TxnLog.compactZorder(spark, zt, "a", "b", targetFiles = 16)
    // control: the un-clustered table (hash-spread files — every file
    // spans both key domains, so the box cannot prune at all)
    val ct = mkTable()
    val box = Seq(("a", 10L, 20L), ("b", 10L, 20L))
    val (zKept, zTotal) = TxnLog.plannedFilesBox(zt, box)
    val (cKept, cTotal) = TxnLog.plannedFilesBox(ct, box)
    assert(zTotal === 16 && cTotal === 4)
    // compare pruned FRACTIONS: the z layout must plan a strictly
    // smaller share of its files than the hash layout does
    assert(zKept * cTotal < cKept * zTotal,
      s"zorder planned $zKept/$zTotal vs control $cKept/$cTotal")
    assert(zKept <= zTotal / 2, s"weak z pruning: $zKept of $zTotal")
    // pruned read ≡ full read under the same predicate
    val probe = TxnLog.readPrunedBox(spark, zt, box)
      .filter($"a".between(10L, 20L) && $"b".between(10L, 20L))
      .collect().map(_.getLong(0)).sorted
    val full = TxnLog.read(spark, zt)
      .filter($"a".between(10L, 20L) && $"b".between(10L, 20L))
      .collect().map(_.getLong(0)).sorted
    assert(probe.toSeq === full.toSeq && probe.nonEmpty)
  }

  test("txnlog: checkpoints bound replay and lastBatch reads O(1) log files") {
    import spark.implicits._
    val t = freshTable()
    (0 until 13).foreach(i =>
      assert(TxnLog.appendBatch(spark, t, oneRowDf(i.toLong), "app", i.toLong)))
    // interval hit at v10: the checkpoint exists
    assert(Files.exists(t.logDir.resolve(f"${10L}%020d.ckpt")))
    // replay through the checkpoint equals the ground truth
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === (0L until 13L))
    assert(TxnLog.lastBatch(t, "app") === Some(12L))
    // a marker BELOW the newest checkpoint still resolves (summary)
    assert(TxnLog.appendBatch(spark, t, Seq(99L).toDF("id"), "other", 0L))
    (13 until 21).foreach(i =>
      assert(TxnLog.appendBatch(spark, t, oneRowDf(i.toLong), "app", i.toLong)))
    assert(Files.exists(t.logDir.resolve(f"${20L}%020d.ckpt")))
    assert(TxnLog.lastBatch(t, "other") === Some(0L))
    // time travel BEFORE the first checkpoint still replays
    assert(TxnLog.read(spark, t, Some(3L)).collect().map(_.getLong(0))
      .sorted.toSeq === (0L until 4L))
  }

  test("txnlog: registered schema survives a remove-bearing diff across additive evolution") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L, 2L).toDF("id").coalesce(1))
    TxnLog.append(spark, t, Seq((3L, "x")).toDF("id", "tag"))
    // ordinary reads are schema-pinned now — no footer union needed
    assert(TxnLog.read(spark, t).columns.sorted.toSeq === Seq("id", "tag"))
    // a RAW remove commit (no cdc info) inside a schema-evolving range
    // forces the snapshot-diff fallback; both sides must align
    val snap = TxnLog.snapshot(t)
    TxnLog.commit(t, snap.version, adds = Nil,
      removes = Seq(snap.liveFiles.head)) // v2 removes v0's file
    val (ins, del) = TxnLog.changes(spark, t, 0L, 2L)
    val insRows = ins.collect().map(r => r.getLong(r.fieldIndex("id")))
    val delRows = del.collect().map(r => r.getLong(r.fieldIndex("id")))
    assert(insRows.sorted.toSeq === Seq(3L))
    assert(delRows.sorted.toSeq === Seq(1L, 2L))
    // non-additive evolution refuses instead of corrupting
    intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, Seq("oops").toDF("id"))
    }
  }

  test("txnlog: corrupt stats triples fail loudly naming the file") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    val bad = t.logDir.resolve(f"${1L}%020d.log")
    Files.writeString(bad, "add\tdata/x/p.parquet\tid:12\n")
    val e = intercept[IllegalStateException] { TxnLog.snapshot(t) }
    assert(e.getMessage.contains("corrupt") &&
      e.getMessage.contains(bad.getFileName.toString))
    Files.writeString(bad, "add\tdata/x/p.parquet\tid:a:b\n")
    val e2 = intercept[IllegalStateException] { TxnLog.snapshot(t) }
    assert(e2.getMessage.contains("corrupt"))
  }

  test("txnlog: vacuum spares an in-flight writer's staged files until the grace window expires") {
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))
    TxnLog.compact(spark, t) // makes v0's file dead
    // simulate a concurrent writer mid-stage: files + fresh marker
    val stage = t.dataDir.resolve("mid-stage")
    oneRowDf(50).write.parquet(stage.toString)
    Files.writeString(t.dataDir.resolve(".inflight-mid-stage"), "")
    import scala.jdk.CollectionConverters._
    // default grace: the dead committed file goes, the staged one stays
    assert(TxnLog.vacuum(t) === 1)
    assert(Files.list(stage).iterator().asScala
      .exists(_.toString.endsWith(".parquet")),
      "vacuum reclaimed a live writer's staged files")
    // grace 0: the crashed writer's garbage is collected, marker swept
    assert(TxnLog.vacuum(t, graceMs = 0L) === 1)
    assert(!Files.exists(t.dataDir.resolve(".inflight-mid-stage")))
    // the table itself is untouched throughout
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("txnlog: readStream replays the append feed exactly once across restart, compaction-invisible") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L, 2L).toDF("id"))
    TxnLog.append(spark, t, Seq(3L).toDF("id"))
    val ckpt = Files.createTempDirectory("graft-txnstream-ckpt-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def startQ(ignoreDeletes: Boolean = false) =
      spark.readStream.format("txnlog")
        .option("path", t.root.toString)
        .option("ignoreDeletes", ignoreDeletes.toString)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add(r.getLong(0))); ()
        }.start()
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      // initial backlog: the whole table, once
      assert(got.asScala.toSeq.sorted === Seq(1L, 2L, 3L))
      // live appends arrive; a compaction rewrite is invisible
      TxnLog.append(spark, t, Seq(4L).toDF("id"))
      TxnLog.compact(spark, t)
      q1.processAllAvailable()
      assert(got.asScala.toSeq.sorted === (1L to 4L))
    } finally q1.stop()
    // rows landing while the stream is DOWN arrive after restart —
    // exactly once, resumed from the engine's checkpointed version
    TxnLog.append(spark, t, Seq(5L, 6L).toDF("id"))
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(got.asScala.toSeq.sorted === (1L to 6L))
    } finally q2.stop()
    // a row-level delete fails the append-feed stream by default...
    TxnLog.delete(spark, t, col("id") === 1L)
    TxnLog.append(spark, t, Seq(7L).toDF("id"))
    val q3 = startQ()
    try intercept[Exception] { q3.processAllAvailable() }
    finally q3.stop()
    assert(!got.asScala.toSeq.contains(7L))
    // ...and with ignoreDeletes the delete commit is skipped, the
    // append after it arrives, and nothing is re-delivered
    val q4 = startQ(ignoreDeletes = true)
    try {
      q4.processAllAvailable()
      assert(got.asScala.toSeq.sorted === (1L to 7L))
    } finally q4.stop()
  }

  test("txnlog: time travel by timestamp resolves the latest version at or before the instant") {
    val t = freshTable()
    (1 to 3).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    // pin distinct commit instants (link mtime IS the commit record)
    (0L to 2L).foreach { v =>
      Files.setLastModifiedTime(t.logDir.resolve(f"$v%020d.log"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L + v * 60000L))
    }
    assert(TxnLog.versionAt(t, 1000000L) === 0L)         // exactly at v0
    assert(TxnLog.versionAt(t, 1000000L + 59999L) === 0L) // before v1
    assert(TxnLog.versionAt(t, 1000000L + 60000L) === 1L)
    assert(TxnLog.versionAt(t, 9999999999L) === 2L)      // far future
    intercept[IllegalArgumentException] {
      TxnLog.versionAt(t, 999999L)                       // before v0
    }
    // the resolved version replays the table as of that instant
    assert(TxnLog.read(spark, t,
      Some(TxnLog.versionAt(t, 1000000L + 60000L))).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("txnlog: readStream drains a backlog under Trigger.AvailableNow and terminates") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    (1 to 3).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    val ckpt = Files.createTempDirectory("graft-txnan-ckpt-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("txnlog")
      .option("path", t.root.toString).load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0))); ()
      }.start()
    // AvailableNow must process the backlog then STOP on its own
    assert(q.awaitTermination(120000L), "AvailableNow query did not stop")
    assert(got.asScala.toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("txnlog: readStream rate limit bounds every micro-batch to N versions") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    (1 to 3).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    val ckpt = Files.createTempDirectory("graft-txnrate-ckpt-").toString
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def startQ() = spark.readStream.format("txnlog")
      .option("path", t.root.toString)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.collect().map(_.getLong(0)).toSeq); ()
      }.start()
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    // the 3-version backlog drains as one-version batches: the first
    // is the snapshot AT the starting version (one commit), each
    // later one a single commit — never one catch-all batch
    val drained = batches.asScala.filter(_.nonEmpty).toSeq
    assert(drained.forall(_.size == 1),
      s"a rate-limited batch spanned multiple versions: $drained")
    assert(drained.flatten.sorted === Seq(1L, 2L, 3L))
    // backlog built while DOWN also drains bounded after restart
    (4 to 5).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    val all = batches.asScala.filter(_.nonEmpty).toSeq
    assert(all.forall(_.size == 1), s"unbounded batch after restart: $all")
    assert(all.flatten.sorted === (1L to 5L))
  }

  test("txnlog: source-to-sink lakehouse loop stays exactly-once across restart") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    TxnLog.append(spark, src, Seq(1L, 2L).toDF("id"))
    val ckpt = Files.createTempDirectory("graft-txnloop-ckpt-").toString
    // the full loop: txnlog SOURCE (versions as offsets) feeding the
    // txnlog SINK (txn markers as idempotence) — the two halves the
    // layer exposes, composed the way a real pipeline chains tables
    def startQ() = spark.readStream.format("txnlog")
      .option("path", src.root.toString).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        TxnLog.appendBatch(spark, dst, df, "loop", id); ()
      }.start()
    def dstRows() = TxnLog.read(spark, dst).collect()
      .map(_.getLong(0)).sorted.toSeq
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      assert(dstRows() === Seq(1L, 2L))
      TxnLog.append(spark, src, Seq(3L).toDF("id"))
      q1.processAllAvailable()
      assert(dstRows() === Seq(1L, 2L, 3L))
    } finally q1.stop()
    // rows committed upstream while the pipeline is DOWN flow through
    // after restart — once: the source resumes from the engine
    // checkpoint, the sink fences replayed batch ids
    TxnLog.append(spark, src, Seq(4L, 5L).toDF("id"))
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(dstRows() === (1L to 5L))
    } finally q2.stop()
  }

  test("txnlog: batch format reads push filters to the scan and time-travel by option") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L, 2L).toDF("id").coalesce(1)) // v0
    TxnLog.append(spark, t, Seq(3L, 4L).toDF("id").coalesce(1)) // v1
    (0L to 1L).foreach { v =>
      Files.setLastModifiedTime(t.logDir.resolve(f"$v%020d.log"),
        java.nio.file.attribute.FileTime.fromMillis(2000000L + v * 60000L))
    }
    // plain read: the snapshot through the format short name
    val df = spark.read.format("txnlog")
      .option("path", t.root.toString).load()
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (1L to 4L))
    // the scan is a REAL parquet relation: predicates push down
    val filtered = df.filter($"id" > 2L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,2"),
      s"filter did not reach the scan:\n${plan.take(600)}")
    assert(filtered.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // time travel by version and by timestamp options
    assert(spark.read.format("txnlog").option("path", t.root.toString)
      .option("versionAsOf", "0").load()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(spark.read.format("txnlog").option("path", t.root.toString)
      .option("timestampAsOf", "2000001")
      .load().collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // the SQL surface: a view over the format
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_txv USING txnlog " +
      s"OPTIONS (path '${t.root}')")
    try {
      assert(spark.sql("SELECT sum(id) AS s FROM graft_txv")
        .head().getLong(0) === 10L)
    } finally spark.sql("DROP VIEW IF EXISTS graft_txv")
  }

  test("txnlog: format writes — append appends, overwrite is one atomic replace with a log-resolved feed") {
    import spark.implicits._
    val t = freshTable()
    def write(rows: Seq[Long], mode: String): Unit =
      rows.toDF("id").coalesce(1).write.format("txnlog")
        .mode(mode).option("path", t.root.toString).save()
    write(Seq(1L, 2L), "append")  // v0
    write(Seq(3L), "append")      // v1
    write(Seq(10L, 11L), "overwrite") // v2: atomic replace
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10L, 11L))
    // history: the old table is still one time-travel away
    assert(TxnLog.read(spark, t, Some(1L)).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L, 3L))
    // the replace's change feed is log-resolved at zero copy: old
    // rows as deletes (referencing the removed files), new as inserts
    val (ins, del) = TxnLog.changes(spark, t, 1L, 2L)
    assert(ins.collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
    assert(del.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(TxnLog.history(t).map(_._2) === Seq("APPEND", "APPEND", "REPLACE"))
    // errorifexists refuses a live table; ignore no-ops
    intercept[IllegalStateException] { write(Seq(99L), "errorifexists") }
    write(Seq(99L), "ignore")
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10L, 11L))
  }

  test("txnlog: a mid-stream schema evolution fails the stream; a restart picks the column up") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L).toDF("id"))
    val ckpt = Files.createTempDirectory("graft-txnsev-ckpt-").toString
    val cols = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    def startQ() = spark.readStream.format("txnlog")
      .option("path", t.root.toString).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) cols.add(df.columns.toSeq); ()
      }.start()
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      assert(cols.asScala.toSeq === Seq(Seq("id")))
      // a column-adding commit mid-stream must FAIL the query —
      // silently projecting the new column away is data loss
      TxnLog.append(spark, t, Seq((2L, "x")).toDF("id", "tag"))
      intercept[Exception] { q1.processAllAvailable() }
    } finally q1.stop()
    // the restart re-reads the registered schema: new column flows
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(cols.asScala.toSeq.last.sorted === Seq("id", "tag"))
    } finally q2.stop()
  }

  test("txnlog: log expiry keeps the checkpointed tail replayable and fails expired reads loudly") {
    val t = freshTable()
    (0 until 13).foreach(i =>
      assert(TxnLog.appendBatch(spark, t, oneRowDf(i.toLong), "app", i.toLong)))
    assert(TxnLog.expireLog(t) === 10) // logs v0..v9, summarized by v10.ckpt
    // everything at or above the checkpoint replays exactly
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === (0L until 13L))
    assert(TxnLog.read(spark, t, Some(10L)).collect().map(_.getLong(0))
      .sorted.toSeq === (0L until 11L))
    assert(TxnLog.lastBatch(t, "app") === Some(12L))
    // a read below the retained range fails loudly, naming it
    val e = intercept[IllegalArgumentException] {
      TxnLog.read(spark, t, Some(5L))
    }
    assert(e.getMessage.contains("retained"))
    // an incremental range inside the tail resolves; one reaching
    // into the expired region refuses rather than under-delivering
    val (ins, _) = TxnLog.changes(spark, t, 10L, 12L)
    assert(ins.collect().map(_.getLong(0)).sorted.toSeq === Seq(11L, 12L))
    intercept[IllegalArgumentException] {
      TxnLog.changes(spark, t, 5L, 12L)
    }
    // a FRESH stream still starts (backlog = the latest snapshot)
    val ckpt = Files.createTempDirectory("graft-txnexp-ckpt-").toString
    import scala.jdk.CollectionConverters._
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("txnlog")
      .option("path", t.root.toString).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0))); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.asScala.toSeq.sorted === (0L until 13L))
  }

  test("txnlog: expired delete commits release their change files to vacuumChanges") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, (0L until 100L).toDF("id").coalesce(1))
    TxnLog.delete(spark, t, col("id") < 10L) // v1: writes a change file
    def cdcFiles() = {
      import scala.jdk.CollectionConverters._
      if (!Files.isDirectory(t.cdcDir)) Seq.empty
      else Files.walk(t.cdcDir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
    }
    assert(cdcFiles().nonEmpty)
    // while the delete commit is retained, its change file is pinned
    assert(TxnLog.vacuumChanges(t) === 0)
    // march to the next checkpoint, expire the head of the log
    (2 to 10).foreach(i => TxnLog.append(spark, t, oneRowDf(i * 1000L)))
    assert(TxnLog.expireLog(t) > 0)
    // the delete commit is gone from the log: its change file frees
    assert(TxnLog.vacuumChanges(t) === 1)
    assert(cdcFiles().isEmpty)
    // the table itself is untouched
    assert(TxnLog.read(spark, t).count() === 99L)
  }

  test("txnlog: racing acks never leave the cursor missing or torn") {
    val t = freshTable()
    (1 to 4).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    TxnLog.ack(t, "etl", 0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1L to 3L).map { v =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = TxnLog.ack(t, "etl", v)
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // the cursor file exists and holds one of the acked versions —
    // never absent (no full-table re-delivery), never partial
    val cur = Files.readString(t.logDir.resolve(".cursor-etl")).trim.toLong
    assert((1L to 3L).contains(cur), s"cursor regressed to $cur")
  }

  test("txnlog: delete with a NULL-evaluating predicate keeps those rows (SQL condition-is-true contract)") {
    import spark.implicits._
    val t = freshTable()
    // v is nullable: the predicate v > 10 is NULL on the null rows
    val rows = Seq((1L, Some(5L)), (2L, Some(15L)), (3L, None),
      (4L, Some(20L)), (5L, None))
    TxnLog.append(spark, t, rows.toDF("id", "v").coalesce(1))
    val before = TxnLog.latestVersion(t)
    val vDel = TxnLog.delete(spark, t, col("v") > 10L)
    // null-predicate rows SURVIVE (they are not "condition is true")
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 3L, 5L))
    // and the change feed carries exactly the true-predicate rows
    val (_, del) = TxnLog.changes(spark, t, before, vDel)
    assert(del.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L))
  }

  test("txnlog: racing first writers with different columns both register their schema") {
    import spark.implicits._
    // empty table, two concurrent FIRST appends with different extra
    // columns: the exact-slot schema protocol makes the loser re-merge
    // against the winner, so neither column is ever dropped
    (0 until 3).foreach { _ =>
      val t = freshTable()
      val dfA = Seq((1L, "x")).toDF("id", "a")
      val dfB = Seq((2L, 9L)).toDF("id", "b")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxnLog.append(spark, t, dfA)
        })
        val fb = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxnLog.append(spark, t, dfB)
        })
        fa.get(); fb.get()
      } finally pool.shutdown()
      val reg = TxnLog.registeredSchema(t).get.fieldNames.toSet
      assert(reg === Set("id", "a", "b"),
        s"schema race dropped a column: registered $reg")
      // the registered schema null-fills each file's missing column
      val got = TxnLog.read(spark, t).collect()
      assert(got.length === 2)
    }
  }

  test("txnlog: zorder prunes for keys past 16 bits and refuses out-of-range keys") {
    import spark.implicits._
    val t = freshTable()
    // keys around 1e6 — aliasing in a 16-bit interleave would smear
    // the curve; 31 bits keep it exact
    val base = 1000000L
    val rows = (0L until 4096L).map(i =>
      (i, base + i % 64L * 1000L, base + (i / 64L) % 64L * 1000L))
    TxnLog.appendWithStats(spark, t,
      rows.toDF("id", "a", "b").repartition(4), Seq("a", "b"))
    TxnLog.compactZorder(spark, t, "a", "b", targetFiles = 16)
    val box = Seq(("a", base + 10000L, base + 20000L),
      ("b", base + 10000L, base + 20000L))
    val (kept, total) = TxnLog.plannedFilesBox(t, box)
    assert(total === 16 && kept <= total / 2,
      s"weak z pruning at large keys: $kept of $total")
    // pruned read ≡ full read under the same predicate
    val probe = TxnLog.readPrunedBox(spark, t, box)
      .filter($"a".between(box(0)._2, box(0)._3) &&
        $"b".between(box(1)._2, box(1)._3))
      .collect().map(_.getLong(0)).sorted
    val full = TxnLog.read(spark, t)
      .filter($"a".between(box(0)._2, box(0)._3) &&
        $"b".between(box(1)._2, box(1)._3))
      .collect().map(_.getLong(0)).sorted
    assert(probe.toSeq === full.toSeq && probe.nonEmpty)
    // a key column the manifest shows out of [0, 2^31) refuses loudly
    val bad = freshTable()
    TxnLog.appendWithStats(spark, bad,
      Seq((1L, -5L, 2L)).toDF("id", "a", "b").coalesce(1), Seq("a", "b"))
    val e = intercept[IllegalArgumentException] {
      TxnLog.compactZorder(spark, bad, "a", "b")
    }
    assert(e.getMessage.contains("alias on the z curve"))
  }

  test("txnlog: ignoreDeletes skips only pure-delete commits; ignoreChanges re-emits rewrite images") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1))                                            // v0
    TxnLog.delete(spark, t, col("id") === 1L)                  // v1 pure delete
    TxnLog.merge(spark, t, Seq((2L, "B"), (3L, "c")).toDF("id", "s")
      .coalesce(1), "id")                                      // v2 rewrite
    val to = TxnLog.latestVersion(t)
    // default: the delete commit fails the append feed
    intercept[IllegalStateException] {
      TxnLog.appendFeed(t, 0L, to, ignoreDeletes = false)
    }
    // ignoreDeletes alone: the pure delete is skipped, but the MERGE
    // (deletes AND new images) still fails — emitting its inserts
    // would double-count row 2 downstream
    val e = intercept[IllegalStateException] {
      TxnLog.appendFeed(t, 0L, to, ignoreDeletes = true)
    }
    assert(e.getMessage.contains("ignoreChanges"))
    // ignoreChanges: the merge's new images are re-emitted
    val files = TxnLog.appendFeed(t, 0L, to, ignoreDeletes = true,
      ignoreChanges = true)
    val rows = TxnLog.readFiles(spark, t, files,
      TxnLog.snapshot(t).schemaJson).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq((2L, "B"), (3L, "c")))
  }

  test("txnlog: DML locates its files through manifest stats — selective delete/merge opens a strict subset") {
    import spark.implicits._
    val t = freshTable()
    // 8 contiguous key ranges, one stats-bearing file each
    (0 until 8).foreach { i =>
      val rows = (i * 100 until (i + 1) * 100).map(k =>
        (k.toLong, s"s$k"))
      TxnLog.appendWithStats(spark, t, rows.toDF("k", "s").coalesce(1),
        Seq("k"))
    }
    // a range predicate on the tracked column prunes to ONE candidate
    val (cand, live) = TxnLog.plannedFilesDml(t, col("k").between(250L, 260L))
    assert(live === 8 && cand === 1, s"planned $cand of $live")
    // equality prunes too; conjuncts with an untranslatable arm still
    // prune on the translatable one
    assert(TxnLog.plannedFilesDml(t, col("k") === 425L)._1 === 1)
    assert(TxnLog.plannedFilesDml(t,
      col("k") >= 700L && col("s") =!= "x")._1 === 1)
    // untracked column / non-range predicate: full-scan fallback
    assert(TxnLog.plannedFilesDml(t, col("s") === "s10")._1 === 8)
    assert(TxnLog.plannedFilesDml(t, col("k") % 7L === 0L)._1 === 8)
    // the pruned delete removes exactly the predicate's rows and the
    // commit rewrote exactly the one candidate file
    val vDel = TxnLog.delete(spark, t, col("k").between(250L, 260L))
    assert(TxnLog.read(spark, t).count() === 800L - 11L)
    val (_, _, _, delRemoves, _) = TxnLog.history(t)
      .find(_._1 == vDel).get
    assert(delRemoves === 1L, s"delete rewrote $delRemoves files")
    // merge with source keys confined to one range: one file rewritten
    val src = Seq((310L, "u310"), (320L, "u320")).toDF("k", "s")
      .coalesce(1)
    val vM = TxnLog.merge(spark, t, src, "k")
    val (_, _, _, mrgRemoves, _) = TxnLog.history(t).find(_._1 == vM).get
    assert(mrgRemoves === 1L, s"merge rewrote $mrgRemoves files")
    assert(TxnLog.read(spark, t).filter(col("k") === 310L)
      .head().getString(1) === "u310")
    assert(TxnLog.read(spark, t).count() === 800L - 11L)
  }

  test("txnlog: mergeInto routes rows through first-matching WHEN clauses, CDF pinned, ambiguity refused") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
        .toDF("k", "v", "s").coalesce(1))
    val src = Seq(
      (1L, 100L, "A"), // matched, s.v >= 50      -> UPDATE v := t.v+s.v
      (2L, 5L, "B"),   // matched, s.v < 10       -> DELETE
      (3L, 20L, "C"),  // matched, NO clause fires -> untouched, no CDF
      (5L, 51L, "E"),  // unmatched, k odd         -> INSERT
      (6L, 60L, "F"))  // unmatched, k even        -> dropped
      .toDF("k", "v", "s").coalesce(1)
    val before = TxnLog.latestVersion(t)
    val v = TxnLog.mergeInto(spark, t, src, "k", Seq(
      TxnLog.MergeClause.Update(Some(col("s.v") >= 50L),
        Map("v" -> (col("t.v") + col("s.v")))),
      TxnLog.MergeClause.Delete(Some(col("s.v") < 10L)),
      TxnLog.MergeClause.Insert(Some(col("s.k") % 2 === 1))))
    val got = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got === Seq((1L, 110L, "a"), (3L, 30L, "c"), (4L, 40L, "d"),
      (5L, 51L, "E")))
    // change feed: old images of updated+deleted; new images of
    // updated+inserted; the untouched matched row (k=3) in NEITHER
    val (ins, del) = TxnLog.changes(spark, t, before, v)
    assert(del.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq === Seq((1L, 10L), (2L, 20L)))
    assert(ins.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq === Seq((1L, 110L), (5L, 51L)))
    // two source rows on one key: refused loudly, nothing committed
    val dup = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "v", "s")
    val e = intercept[IllegalArgumentException] {
      TxnLog.mergeInto(spark, t, dup, "k",
        Seq(TxnLog.MergeClause.Delete(None)))
    }
    assert(e.getMessage.contains("dedup the source"))
    assert(TxnLog.latestVersion(t) === v)
  }

  test("txnlog: mergeInto NOT MATCHED BY SOURCE clauses reconcile a full-sync snapshot") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"),
        (4L, 40L, "d"), (6L, 60L, "f")).toDF("k", "v", "s").coalesce(1))
    val src = Seq((1L, 100L, "A"), (5L, 50L, "E")).toDF("k", "v", "s")
      .coalesce(1)
    val before = TxnLog.latestVersion(t)
    val ver = TxnLog.mergeInto(spark, t, src, "k", Seq(
      TxnLog.MergeClause.Update(None, Map("v" -> col("s.v"))),
      TxnLog.MergeClause.Insert(None),
      TxnLog.MergeClause.BySourceDelete(Some(col("t.v") >= 40L)),
      TxnLog.MergeClause.BySourceUpdate(None,
        Map("s" -> org.apache.spark.sql.functions.lit("stale")))))
    // 1 updated from source; 2,3 absent from source -> marked stale;
    // 4,6 absent and v>=40 -> deleted; 5 inserted
    val got = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got === Seq((1L, 100L, "a"), (2L, 20L, "stale"),
      (3L, 30L, "stale"), (5L, 50L, "E")))
    // CDF: every touched row's old image; new images for upd/ins
    val (ins, del) = TxnLog.changes(spark, t, before, ver)
    assert(del.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 6L))
    assert(ins.collect().map(r => (r.getLong(0), r.getString(2))).sorted
      .toSeq === Seq((1L, "a"), (2L, "stale"), (3L, "stale"),
      (5L, "E")))
  }

  test("txnlog: mergeIntoKeys matches on composite keys; null key components never match") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L))
        .toDF("k1", "k2", "v").coalesce(1))
    val src = Seq((Some(1L), "a", 100L), (Some(2L), "b", 200L),
      (None: Option[Long], "a", 999L)).toDF("k1", "k2", "v").coalesce(1)
    val ver = TxnLog.mergeIntoKeys(spark, t, src, Seq("k1", "k2"), Seq(
      TxnLog.MergeClause.Update(None, Map("v" -> col("s.v"))),
      TxnLog.MergeClause.Insert(Some(col("s.k1").isNotNull))))
    // (1,a) updated; (1,b),(2,a) untouched; (2,b) inserted; the
    // null-k1 source row matches nothing and its insert cond drops it
    val got = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, "a", 100L), (1L, "b", 20L), (2L, "a", 30L),
      (2L, "b", 200L)))
    // ambiguity is judged on the FULL composite key: two rows sharing
    // k1 but not k2 are fine (above); sharing both refuses
    intercept[IllegalArgumentException] {
      TxnLog.mergeIntoKeys(spark, t,
        Seq((1L, "a", 1L), (1L, "a", 2L)).toDF("k1", "k2", "v"),
        Seq("k1", "k2"), Seq(TxnLog.MergeClause.Delete(None)))
    }
    // the SQL grammar takes the composite ON conjunction
    val root = t.root
    src.filter(col("k1").isNotNull).createOrReplaceTempView("graft_ck_src")
    spark.sql(
      s"""MERGE INTO txnlog.`$root` t USING graft_ck_src s
         |ON t.k1 = s.k1 AND t.k2 = s.k2
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "b"), (2L, "a")))
    assert(TxnLog.latestVersion(t) === ver + 1)
  }

  test("txnlog: mergeInto insert-only and delete-only degenerate forms") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1))
    // source matches nothing: pure conditional insert (one append)
    val v1 = TxnLog.mergeInto(spark, t,
      Seq((7L, 70L), (8L, 80L)).toDF("k", "v").coalesce(1), "k",
      Seq(TxnLog.MergeClause.Insert(Some(col("s.v") > 75L))))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 8L))
    // matched delete-only: a pure tombstone feed
    val v2 = TxnLog.mergeInto(spark, t,
      Seq((2L, 0L), (8L, 0L)).toDF("k", "v").coalesce(1), "k",
      Seq(TxnLog.MergeClause.Delete(None)))
    assert(v2 > v1)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L))
    // the delete-only commit streams as a rewrite: pure append feed
    // consumers with ignoreDeletes skip it (no insert images ride)
    assert(TxnLog.appendFeed(t, v1, v2, ignoreDeletes = true) === Nil)
  }

  test("txnlog: a blind append landing during OPTIMIZE commutes; a conflicting rewrite still refuses") {
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t, oneRowDf(1))                      // v0 -> f1
    TxnLog.append(spark, t, oneRowDf(2))                      // v1 -> f2
    val snap = TxnLog.snapshot(t)
    // replay OPTIMIZE's internals with an append interleaved between
    // its snapshot and its publish (the race, made deterministic)
    val stage = t.dataDir.resolve("compact-stage")
    TxnLog.read(spark, t).coalesce(1).write.parquet(stage.toString)
    val adds = Files.list(stage).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => s"add\t${t.root.relativize(p)}").toSeq
    TxnLog.append(spark, t, oneRowDf(3))                      // v2 lands first
    val v = TxnLog.commit(t, snap.version, adds = Nil,
      removes = snap.liveFiles, extra = adds :+ "cdc\tnone",
      reconcileDisjoint = true)
    assert(v === 3L, s"compaction rebased to v$v")
    // BOTH commits' rows survive — nothing lost, nothing doubled
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    assert(TxnLog.snapshot(t).liveFiles.length === 2) // compacted + appended
    // now an interleaved commit REWRITES a read-set file: refuse
    val snap2 = TxnLog.snapshot(t)
    TxnLog.delete(spark, t, col("id") === 3L) // rewrites the appended file
    val e = intercept[java.util.ConcurrentModificationException] {
      TxnLog.commit(t, snap2.version, adds = Nil,
        removes = snap2.liveFiles, extra = Seq("cdc\tnone"),
        reconcileDisjoint = true)
    }
    assert(e.getMessage.contains("read-set file"))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
  }

  test("txnlog: partitioned appends make pruning and drop-a-day metadata-only, CDF typed") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    val rows = Seq((1L, "2026-01-01", 10L), (2L, "2026-01-01", 20L),
      (3L, "2026-01-02", 30L), (4L, "2026-01-03", 40L))
    TxnLog.appendPartitioned(spark, t, rows.toDF("id", "day", "v"),
      Seq("day"))
    // the partition column is NOT in the files; reads reconstitute it
    val got = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got === rows.sorted)
    // partition-pruned read plans a strict subset of the live files
    val (kept, live) = TxnLog.plannedFilesPartition(t,
      Map("day" -> "2026-01-02"))
    assert(live >= 3 && kept < live, s"planned $kept of $live")
    assert(TxnLog.readPartition(spark, t, Map("day" -> "2026-01-01"))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // drop-a-day: ONE remove-only commit — no SparkSession in the
    // signature, no data file read or written
    val before = TxnLog.latestVersion(t)
    val vDrop = TxnLog.dropPartition(t, Map("day" -> "2026-01-01"))
    assert(vDrop === before + 1)
    val logLines = Files.readAllLines(
      t.logDir.resolve(f"$vDrop%020d.log")).asScala.filter(_.nonEmpty)
    assert(logLines.nonEmpty && logLines.forall(l =>
      l.startsWith("remove\t") || l.startsWith("cdc\t")),
      s"drop commit carries more than removes+cdc: $logLines")
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(3L, 4L))
    // the change feed delivers the dropped day as typed old images
    // (zero-copy: the cdc deletes reference the dropped data files)
    val (ins, del) = TxnLog.changes(spark, t, before, vDrop)
    assert(ins.count() === 0)
    assert(del.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .toSeq === Seq((1L, "2026-01-01"), (2L, "2026-01-01")))
    // time travel still sees the day before the drop
    assert(TxnLog.read(spark, t, Some(before)).count() === 4)
    // partition metadata round-trips through a replay checkpoint
    TxnLog.checkpoint(t, vDrop)
    assert(TxnLog.snapshot(t).filePartitions.nonEmpty)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((3L, "2026-01-02"), (4L, "2026-01-03")))
    // dropping an absent partition is a no-op
    assert(TxnLog.dropPartition(t, Map("day" -> "1999-01-01")) === vDrop)
    // the append feed reconstitutes partition columns (the drop is a
    // pure delete commit, skipped under ignoreDeletes; the feed
    // replays the original append's files — all four rows, typed)
    val feed = TxnLog.readFeedBatch(spark, t, before - 1, vDrop,
      ignoreDeletes = true, ignoreChanges = false,
      TxnLog.registeredSchema(t).get.json)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(feed === Seq((1L, "2026-01-01"), (2L, "2026-01-01"),
      (3L, "2026-01-02"), (4L, "2026-01-03")))
  }

  test("txnlog: readStream with readChangeFeed delivers deletes as typed change rows and converges") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1))
    val ckpt = Files.createTempDirectory("graft-txncdfstream-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    def startQ() = spark.readStream.format("txnlog")
      .option("path", t.root.toString)
      .option("readChangeFeed", "true")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got.add((r.getLong(0), r.getString(1), r.getString(2)))); ()
      }.start()
    val q = startQ()
    try {
      q.processAllAvailable()
      // initial backlog: one insert wave
      assert(got.asScala.toSeq.sorted ===
        Seq((1L, "a", "insert"), (2L, "b", "insert")))
      // a delete commit mid-stream arrives as TYPED delete events —
      // the fail-or-skip posture of the append feed is gone here
      TxnLog.delete(spark, t, col("id") === 1L)
      // a merge arrives as delete-old + insert-new; compaction stays
      // invisible; a plain append arrives as inserts
      TxnLog.merge(spark, t, Seq((2L, "B")).toDF("id", "s").coalesce(1),
        "id")
      TxnLog.compact(spark, t)
      TxnLog.append(spark, t, Seq((3L, "c")).toDF("id", "s").coalesce(1))
      q.processAllAvailable()
      val events = got.asScala.toSeq
      assert(events.sorted === Seq(
        (1L, "a", "delete"), (1L, "a", "insert"), (2L, "B", "insert"),
        (2L, "b", "delete"), (2L, "b", "insert"), (3L, "c", "insert")))
      // replay convergence: inserts minus deletes == the snapshot
      val net = events.foldLeft(Map.empty[(Long, String), Int]) {
        case (m, (id, s, "insert")) => m.updated((id, s),
          m.getOrElse((id, s), 0) + 1)
        case (m, (id, s, _)) => m.updated((id, s),
          m.getOrElse((id, s), 0) - 1)
      }.filter(_._2 > 0).keySet
      val snap = TxnLog.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(net === snap, s"CDF replay diverged: $net vs $snap")
      // an isolated delete-only micro-batch (no insert files at all)
      TxnLog.delete(spark, t, col("id") === 3L)
      q.processAllAvailable()
      assert(got.asScala.toSeq.count(_ == (3L, "c", "delete")) === 1)
    } finally q.stop()
  }

  test("txnlog: history walks stay bounded — LIMIT reads only the newest files; expireLog caps the default walk") {
    val t = freshTable()
    // 30 raw append commits (metadata only: history never opens data)
    (0 until 30).foreach(i =>
      TxnLog.commit(t, base = -1L, adds = Seq(s"data/x/f$i.parquet")))
    // LIMIT n = DESCRIBE HISTORY LIMIT n: exactly the newest n rows
    val tail = TxnLog.history(t, limit = 5)
    assert(tail.map(_._1) === Seq(25L, 26L, 27L, 28L, 29L))
    assert(tail.forall(_._2 == "APPEND"))
    // expireLog caps the DEFAULT walk: only retained commits remain
    // (checkpoints land every 10 commits; newest covers v20)
    val expired = TxnLog.expireLog(t)
    assert(expired > 0)
    val all = TxnLog.history(t)
    assert(all.map(_._1) === (20L to 29L),
      s"retained audit should start at the newest checkpoint: ${all.map(_._1)}")
    // versionAt shares the retention-bounded listing
    assert(TxnLog.versionAt(t, System.currentTimeMillis()) === 29L)
  }

  test("txnlog: compactSmall rewrites only small files, per partition, in one commit") {
    import spark.implicits._
    val t = freshTable()
    // one big file + five tiny single-row appends
    TxnLog.append(spark, t,
      (1000L until 11000L).map(i => (i, i % 7L)).toDF("k", "v")
        .coalesce(1))
    (0L until 5L).foreach(i =>
      TxnLog.append(spark, t, Seq((i, i)).toDF("k", "v").coalesce(1)))
    val bigRel = TxnLog.snapshot(t).liveFiles.head
    val v = TxnLog.compactSmall(spark, t, minFileBytes = 5000L)
    val snap = TxnLog.snapshot(t)
    // the big file is untouched (same manifest entry); tinies merged
    assert(snap.liveFiles.contains(bigRel))
    assert(snap.liveFiles.length === 2, snap.liveFiles.mkString(","))
    assert(TxnLog.read(spark, t).count() === 10005L)
    // a second pass finds a single small file: nothing to do
    assert(TxnLog.compactSmall(spark, t, 5000L) === v)
    // partitioned table: small files compact WITHIN their partition,
    // tokens re-emitted, metadata-only drop still works after
    val pt = freshTable()
    (0 until 2).foreach { i =>
      TxnLog.appendPartitioned(spark, pt,
        Seq((i.toLong, "d1", 1L), (i + 10L, "d2", 2L))
          .toDF("id", "day", "x"), Seq("day"))
    }
    assert(TxnLog.snapshot(pt).liveFiles.length >= 4)
    TxnLog.compactSmall(spark, pt, minFileBytes = 100000L)
    val psnap = TxnLog.snapshot(pt)
    assert(psnap.liveFiles.length === 2, psnap.liveFiles.mkString(","))
    assert(psnap.filePartitions.size === 2) // tokens survived
    assert(TxnLog.read(spark, pt).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((0L, "d1"), (1L, "d1"), (10L, "d2"), (11L, "d2")))
    TxnLog.dropPartition(pt, Map("day" -> "d1"))
    assert(TxnLog.read(spark, pt).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10L, 11L))
  }

  test("txnlog: DML on a partitioned table reconstitutes columns and delete preserves the layout") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L),
        (4L, "d2", 40L)).toDF("id", "day", "v"), Seq("day"))
    // a predicate ON THE PARTITION COLUMN works (reconstituted, not
    // null-filled) and survivors restage THROUGH the layout
    TxnLog.delete(spark, t, col("day") === "d1" && col("v") > 15L)
    val got = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, "d1", 10L), (3L, "d2", 30L), (4L, "d2", 40L)))
    // layout preserved: every live file still carries its part token,
    // so drop-a-day stays metadata-only after the delete
    val snap = TxnLog.snapshot(t)
    assert(snap.liveFiles.forall(snap.filePartitions.contains),
      s"delete flattened files out of the layout: ${snap.liveFiles}")
    TxnLog.dropPartition(t, Map("day" -> "d1"))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(3L, 4L))
    // merge on a partitioned table keeps values correct AND restages
    // the touched sliver (survivors + new images) THROUGH the layout —
    // a CDC-synced partitioned table must not erode under steady DML
    TxnLog.merge(spark, t,
      Seq((3L, "d2", 300L)).toDF("id", "day", "v").coalesce(1), "id")
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      .toSeq === Seq((3L, "d2", 300L), (4L, "d2", 40L)))
    val msnap = TxnLog.snapshot(t)
    assert(msnap.liveFiles.forall(msnap.filePartitions.contains),
      s"merge flattened files out of the layout: ${msnap.liveFiles}")
    // partition pruning still plans a strict subset after the merge
    val (mPlanned, mLive) = TxnLog.plannedFilesPartition(t, Map("day" -> "d2"))
    assert(mPlanned === mLive) // only d2 remains: all files carry it
    assert(TxnLog.plannedFilesPartition(t, Map("day" -> "d1"))._1 === 0)
    // the batch-format relation reconstitutes partition columns
    // (filters on them prune scan groups; values never null-fill)
    val viaFormat = spark.read.format("txnlog")
      .option("path", t.root.toString).load()
    assert(viaFormat.filter(col("day") === "d2")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((3L, 300L), (4L, 40L)))
    assert(viaFormat.count() === 2L)
  }

  test("txnlog: streams over partitioned tables reconstitute the partition column; drops arrive as typed CDF deletes") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1"), (2L, "d1")).toDF("id", "day"), Seq("day"))
    val ckpt = Files.createTempDirectory("graft-txnpstream-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val q = spark.readStream.format("txnlog")
      .option("path", t.root.toString)
      .option("readChangeFeed", "true")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got.add((r.getLong(0), r.getString(1), r.getString(2)))); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.asScala.toSeq.sorted ===
        Seq((1L, "d1", "insert"), (2L, "d1", "insert")))
      // a partitioned append mid-stream arrives with the column
      // reconstituted, never null-filled
      TxnLog.appendPartitioned(spark, t,
        Seq((3L, "d2")).toDF("id", "day"), Seq("day"))
      // a metadata-only partition drop arrives as typed delete events
      // whose partition values come from the zero-copy old files
      TxnLog.dropPartition(t, Map("day" -> "d1"))
      q.processAllAvailable()
      assert(got.asScala.toSeq.sorted === Seq(
        (1L, "d1", "delete"), (1L, "d1", "insert"),
        (2L, "d1", "delete"), (2L, "d1", "insert"),
        (3L, "d2", "insert")))
    } finally q.stop()
    // the plain append feed also reconstitutes (drop skipped via
    // ignoreDeletes — it is a pure delete commit)
    val rows = TxnLog.readFeedBatch(spark, t, 0L,
      TxnLog.latestVersion(t), ignoreDeletes = true,
      ignoreChanges = false, TxnLog.registeredSchema(t).get.json)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows === Seq((3L, "d2")))
  }

  test("txnlog: review fixes — floor resume, partitioned OPTIMIZE, null partition, zero-copy vacuum pin, null-key sources") {
    import spark.implicits._
    // (1) a stream resuming at the version just below the expireLog
    // floor replays its (fully retained) range instead of crashing
    val t1 = freshTable()
    (1 to 12).foreach(i => TxnLog.append(spark, t1, oneRowDf(i.toLong)))
    TxnLog.expireLog(t1) // floor = v10 (checkpoint interval)
    val rows = TxnLog.readFeedBatch(spark, t1, 9L, 11L,
      ignoreDeletes = false, ignoreChanges = false,
      TxnLog.registeredSchema(t1).get.json)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(11L, 12L)) // v10 + v11 adds
    // (2) OPTIMIZE keeps the partition layout; zorder refuses a
    // partition column as a clustering key
    val t2 = freshTable()
    (0 until 2).foreach(i => TxnLog.appendPartitioned(spark, t2,
      Seq((i.toLong, "d1"), (i + 10L, "d2")).toDF("id", "day"),
      Seq("day")))
    TxnLog.compact(spark, t2, targetFiles = 1)
    val snap2 = TxnLog.snapshot(t2)
    assert(snap2.liveFiles.nonEmpty &&
      snap2.liveFiles.forall(snap2.filePartitions.contains),
      s"OPTIMIZE flattened the layout: ${snap2.liveFiles}")
    TxnLog.dropPartition(t2, Map("day" -> "d1"))
    assert(TxnLog.read(spark, t2).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10L, 11L))
    intercept[IllegalArgumentException] {
      TxnLog.compactZorder(spark, t2, "day", "id")
    }
    // (3) the null partition reads back (null-safe residual filter)
    val t3 = freshTable()
    TxnLog.appendPartitioned(spark, t3,
      Seq((1L, Some("d1")), (2L, None: Option[String])).toDF("id", "day"),
      Seq("day"))
    assert(TxnLog.read(spark, t3).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq ===
      Seq((1L, Some("d1")), (2L, None)))
    assert(TxnLog.readPartition(spark, t3,
      Map("day" -> "__HIVE_DEFAULT_PARTITION__")).collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // (4) vacuum pins zero-copy change files while the referencing
    // commit is retained; expireLog releases them
    val t4 = freshTable()
    TxnLog.append(spark, t4, oneRowDf(1))
    TxnLog.replace(spark, t4, oneRowDf(2)) // references v0's file as cdc
    assert(TxnLog.vacuum(t4, graceMs = 0L) === 0,
      "vacuum reclaimed a change file the retained log references")
    val (_, del4) = TxnLog.changes(spark, t4, 0L, 1L)
    assert(del4.collect().map(_.getLong(0)).toSeq === Seq(1L))
    (1 to 10).foreach(i => TxnLog.append(spark, t4, oneRowDf(100L + i)))
    TxnLog.expireLog(t4)
    assert(TxnLog.vacuum(t4, graceMs = 0L) >= 1,
      "expired zero-copy change files should be reclaimable")
    // (5) multiple null-key source rows are NOT ambiguous (they can
    // never match) and route through NOT MATCHED
    val t5 = freshTable()
    TxnLog.append(spark, t5, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    TxnLog.mergeIntoKeys(spark, t5,
      Seq((None: Option[Long], "x"), (None: Option[Long], "y"))
        .toDF("k", "s").coalesce(1), Seq("k"),
      Seq(TxnLog.MergeClause.Insert(None)))
    assert(TxnLog.read(spark, t5).count() === 3L)
  }

  test("txnlog: compaction preserves rows; vacuum frees dead files and breaks only pre-compaction time travel") {
    val t = freshTable()
    (1 to 3).foreach(i => TxnLog.append(spark, t, oneRowDf(i.toLong)))
    val vCompact = TxnLog.compact(spark, t)
    assert(vCompact === 3L)
    assert(TxnLog.snapshot(t).liveFiles.size === 1)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    // v1 still replays pre-vacuum
    assert(TxnLog.read(spark, t, Some(1L)).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val deleted = TxnLog.vacuum(t)
    assert(deleted === 3) // the three original single-row files
    // latest unaffected, pre-compaction history gone (the VACUUM trade)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    intercept[Exception] {
      TxnLog.read(spark, t, Some(1L)).collect()
    }
  }

  test("txnlog: merge and mergeInto restage through the partition layout — drop-a-day stays zero-copy under a steady DML feed") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L),
        (4L, "d3", 40L)).toDF("id", "day", "v"), Seq("day"))
    // whole-row merge: update one d1 row, insert a d3 row
    TxnLog.merge(spark, t,
      Seq((1L, "d1", 11L), (9L, "d3", 90L)).toDF("id", "day", "v")
        .coalesce(1), "id")
    val s1 = TxnLog.snapshot(t)
    assert(s1.liveFiles.forall(s1.filePartitions.contains),
      s"merge flattened files out of the layout: ${s1.liveFiles}")
    // conditional mergeInto: update the d2 row, insert a d4 row
    TxnLog.mergeInto(spark, t,
      Seq((3L, "d2", 300L), (5L, "d4", 50L)).toDF("id", "day", "v")
        .coalesce(1), "id",
      Seq(TxnLog.MergeClause.Update(None, Map("v" -> col("s.v"))),
        TxnLog.MergeClause.Insert(None)))
    val s2 = TxnLog.snapshot(t)
    assert(s2.liveFiles.forall(s2.filePartitions.contains),
      s"mergeInto flattened files out of the layout: ${s2.liveFiles}")
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      .toSeq === Seq((1L, "d1", 11L), (2L, "d1", 20L), (3L, "d2", 300L),
        (4L, "d3", 40L), (5L, "d4", 50L), (9L, "d3", 90L)))
    // partition pruning plans a strict subset after both merges
    val (planned, live) = TxnLog.plannedFilesPartition(t, Map("day" -> "d2"))
    assert(planned >= 1 && planned < live,
      s"d2 probe plans $planned of $live after the merges")
    // dropPartition is STILL metadata-only (no SparkSession in the
    // signature): one remove-only commit, and the dropped day's rows
    // arrive as typed CDF deletes with the column reconstituted
    val before = TxnLog.latestVersion(t)
    val vDrop = TxnLog.dropPartition(t, Map("day" -> "d1"))
    assert(vDrop === before + 1)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(3L, 4L, 5L, 9L))
    val (_, del) = TxnLog.changes(spark, t, before, vDrop)
    assert(del.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .toSeq === Seq((1L, "d1"), (2L, "d1")))
  }

  test("txnlog: hive-escaped partition values round-trip write → DML → checkpoint → replay") {
    import spark.implicits._
    val t = freshTable()
    // values exercising the writer's escape set, plus the null
    // sentinel — ':' '=' '%' '/' would silently fail to match a spec
    // if tokens and state disagreed on the value domain
    val days = Seq("d:1", "d=2", "d%3", "d/4", null)
    val rows = days.zipWithIndex.flatMap { case (d, i) =>
      Seq((i * 10L, Option(d), i * 100L), (i * 10L + 1L, Option(d),
        i * 100L + 1L))
    }
    TxnLog.appendPartitioned(spark, t,
      rows.toDF("id", "day", "v"), Seq("day"))
    val snap = TxnLog.snapshot(t)
    assert(snap.liveFiles.forall(snap.filePartitions.contains))
    // the recorded values are DECODED — the user's spec matches as typed
    for ((d, i) <- days.zipWithIndex if d != null) {
      val got = TxnLog.readPartition(spark, t, Map("day" -> d))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(i * 10L, i * 10L + 1L), s"readPartition($d)")
      val (planned, live) = TxnLog.plannedFilesPartition(t, Map("day" -> d))
      assert(planned < live, s"spec '$d' did not prune")
    }
    // a delete on one escaped partition restages survivors with the
    // value RE-ESCAPED into its token (escapePart round-trip)
    TxnLog.delete(spark, t, col("day") === "d:1" && col("id") === 0L)
    val afterDel = TxnLog.read(spark, t)
      .filter(col("day") === "d:1").collect().map(_.getLong(0)).toSeq
    assert(afterDel === Seq(1L))
    // checkpoint rewrites every token from decoded state; replay from
    // it must see the same domain (values AND the null sentinel)
    val v = TxnLog.latestVersion(t)
    TxnLog.checkpoint(t, v)
    TxnLog.expireLog(t)
    val replayed = TxnLog.snapshot(t)
    assert(replayed.liveFiles.forall(replayed.filePartitions.contains))
    assert(TxnLog.readPartition(spark, t, Map("day" -> "d=2"))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
    assert(TxnLog.read(spark, t).filter(col("day").isNull)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(40L, 41L))
    // dropPartition on an escaped value is still metadata-only
    val vd = TxnLog.dropPartition(t, Map("day" -> "d%3"))
    assert(vd > v)
    assert(TxnLog.read(spark, t).filter(col("day") === "d%3").count() === 0L)
    // a malformed %-sequence someone hand-wrote passes through
    // verbatim (Spark's unescapePathName parity) instead of crashing;
    // signed "hex" ('%+5') is malformed too — parseInt would take it
    assert(TxnLog.unescapePart("c=10%x2") === "c=10%x2")
    assert(TxnLog.unescapePart("trail%4") === "trail%4")
    assert(TxnLog.unescapePart("10%+5") === "10%+5")
    assert(TxnLog.unescapePart("%3A%3D") === ":=")
  }

  test("txnlog: repeated merges leave no checkpointed source blocks pinned") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, 10L)).toDF("k", "v").coalesce(1))
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    val before = persisted()
    (1 to 3).foreach { i =>
      TxnLog.merge(spark, t,
        Seq((1L, i * 100L)).toDF("k", "v").coalesce(1), "k")
      TxnLog.mergeInto(spark, t,
        Seq((1L, i + 1000L)).toDF("k", "v").coalesce(1), "k",
        Seq(TxnLog.MergeClause.Update(None, Map("v" -> col("s.v")))))
    }
    // releaseCheckpoint unregisters synchronously (block cleanup is
    // async); a short poll absorbs any scheduler lag
    val deadline = System.currentTimeMillis() + 10000L
    while (persisted() > before && System.currentTimeMillis() < deadline)
      Thread.sleep(50L)
    assert(persisted() <= before,
      s"merges left ${persisted() - before} checkpointed RDD(s) registered")
  }

  test("txnlog: row-level UPDATE rewrites only matching slivers, pins CDF, honors null predicates and the partition layout") {
    import spark.implicits._
    val t = freshTable()
    // 4 single-file commits with stats on k: a selective UPDATE must
    // open a strict subset of files (the stats-pruned DML locate)
    (0 until 4).foreach(i => TxnLog.appendWithStats(spark, t,
      Seq((i * 10L, i * 100L)).toDF("k", "v").coalesce(1), Seq("k")))
    val before = TxnLog.latestVersion(t)
    val (cand, live) = TxnLog.plannedFilesDml(t, col("k") === 20L)
    assert(live === 4 && cand === 1, s"UPDATE locate plans $cand of $live")
    val v = TxnLog.update(spark, t, Map("v" -> (col("v") + 5L)),
      col("k") === 20L)
    assert(v === before + 1)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((0L, 0L), (10L, 100L), (20L, 205L), (30L, 300L)))
    // CDF: exactly (old image as delete, new image as insert)
    val (ins, del) = TxnLog.changes(spark, t, before, v)
    assert(del.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((20L, 200L)))
    assert(ins.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((20L, 205L)))
    // a NULL-evaluating predicate updates NOTHING for that row (SQL's
    // condition-is-true contract), and no-match returns the version
    val t2 = freshTable()
    TxnLog.append(spark, t2,
      Seq((1L, Some(5L)), (2L, None)).toDF("k", "nv").coalesce(1))
    TxnLog.update(spark, t2, Map("k" -> (col("k") + 100L)),
      col("nv") > 1L) // null on k=2 → row untouched
    assert(TxnLog.read(spark, t2).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq === Seq((2L, -1L), (101L, 5L)))
    val vSame = TxnLog.latestVersion(t2)
    assert(TxnLog.update(spark, t2, Map("k" -> lit(0L)),
      col("k") > 1000L) === vSame)
    // unknown SET column refuses loudly — even when the predicate
    // matches NOTHING (a migration script's typo must not pass its
    // dry run on an empty partition)
    val e = intercept[IllegalArgumentException] {
      TxnLog.update(spark, t2, Map("nope" -> lit(1L)), lit(true))
    }
    assert(e.getMessage.contains("unknown column"))
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.update(spark, t2, Map("nope" -> lit(1L)), col("k") > 1000L)
    }
    assert(e2.getMessage.contains("unknown column"))
    // partitioned: survivors and new images restage THROUGH the
    // layout; updating the PARTITION column moves the row to its new
    // partition directory
    val pt = freshTable()
    TxnLog.appendPartitioned(spark, pt,
      Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L))
        .toDF("id", "day", "v"), Seq("day"))
    TxnLog.update(spark, pt, Map("day" -> lit("d9")), col("id") === 2L)
    val snap = TxnLog.snapshot(pt)
    assert(snap.liveFiles.forall(snap.filePartitions.contains),
      s"update flattened files out of the layout: ${snap.liveFiles}")
    assert(TxnLog.readPartition(spark, pt, Map("day" -> "d9"))
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    val vp = TxnLog.dropPartition(pt, Map("day" -> "d9")) // still zero-copy
    assert(TxnLog.read(spark, pt).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 3L) && vp > 0L)
  }

  test("txnlog: three-column zorder prunes every dimension from the manifest — the 2-col layout cannot") {
    import spark.implicits._
    val t = freshTable()
    // an 8×8×8 lattice — three tenant/date/key style dimensions
    val rows = (0L until 4096L).map(i =>
      (i, i % 8L * 100L, (i / 8L) % 8L * 100L, (i / 64L) % 8L * 100L))
    TxnLog.appendWithStats(spark, t,
      rows.toDF("id", "a", "b", "c").repartition(4), Seq("a", "b", "c"))
    TxnLog.compactZorderKeys(spark, t, Seq("a", "b", "c"),
      targetFiles = 16)
    val box = Seq(("a", 0L, 100L), ("b", 0L, 100L), ("c", 0L, 100L))
    val (kept3, total3) = TxnLog.plannedFilesBox(t, box)
    assert(total3 === 16 && kept3 <= total3 / 2,
      s"weak 3-D z pruning: $kept3 of $total3")
    // the third dimension is what the 2-col layout CANNOT prune:
    // under zorder(a, b) every file spans the full c range, so a
    // c-probe plans the whole table; the 3-col interleave keeps c
    // ranges tight per file too
    val t2 = freshTable()
    TxnLog.appendWithStats(spark, t2,
      rows.toDF("id", "a", "b", "c").repartition(4), Seq("a", "b", "c"))
    TxnLog.compactZorder(spark, t2, "a", "b", targetFiles = 16)
    val cProbe = Seq(("c", 0L, 0L))
    val (kept2c, _) = TxnLog.plannedFilesBox(t2, cProbe)
    val (kept3c, _) = TxnLog.plannedFilesBox(t, cProbe)
    assert(kept2c === 16, s"2-col layout unexpectedly pruned c: $kept2c")
    assert(kept3c < kept2c,
      s"3-col zorder ($kept3c files) not tighter on c than 2-col ($kept2c)")
    // pruned read ≡ full read under the same predicate
    val probe = TxnLog.readPrunedBox(spark, t, box)
      .filter($"a" <= 100L && $"b" <= 100L && $"c" <= 100L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val full = TxnLog.read(spark, t)
      .filter($"a" <= 100L && $"b" <= 100L && $"c" <= 100L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(probe === full && probe.nonEmpty)
    // 62/3 = 20 bits per key: the range check tightens accordingly
    val bad = freshTable()
    TxnLog.appendWithStats(spark, bad,
      Seq((1L, 1L << 21, 2L, 3L)).toDF("id", "a", "b", "c").coalesce(1),
      Seq("a", "b", "c"))
    val e = intercept[IllegalArgumentException] {
      TxnLog.compactZorderKeys(spark, bad, Seq("a", "b", "c"))
    }
    assert(e.getMessage.contains("alias on the z curve"))
  }

  test("txnlog: the partitioned relation replays the log ONCE for a multi-scan query") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1", 10L), (2L, "d2", 20L)).toDF("id", "day", "v"),
      Seq("day"))
    val schema = TxnLog.registeredSchema(t).get
    val rel = new graft.sources.TxnLogPartitionedRelation(
      spark.sqlContext, t, Some(TxnLog.latestVersion(t)), schema)
    val df = spark.baseRelationToDataFrame(rel)
    // a self-join scans the relation twice; the log replay and
    // grouped-plan build must happen once (memoized base)
    val joined = df.alias("l").join(df.alias("r"), Seq("id"))
      .select(col("l.day"), col("r.v"))
    assert(joined.collect().length === 2)
    assert(rel.logReads.get() === 1,
      s"partitioned relation replayed the log ${rel.logReads.get()} times")
  }

  test("txnlog: ADD COLUMNS evolves the registered schema metadata-only; old files null-fill, history keeps its shape") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    val v0 = TxnLog.latestVersion(t)
    val v1 = TxnLog.addColumns(t, StructType.fromDDL("v BIGINT"))
    assert(v1 === v0 + 1)
    // the old file null-fills the new column without a rewrite
    val evolved = TxnLog.read(spark, t)
    assert(evolved.columns.toSeq === Seq("k", "s", "v"))
    assert(evolved.collect().map(r =>
      (r.getLong(0), r.isNullAt(2))).toSeq === Seq((1L, true)))
    // new appends carry it; time travel below keeps the OLD shape
    TxnLog.append(spark, t,
      Seq((2L, "b", 20L)).toDF("k", "s", "v").coalesce(1))
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sorted.toSeq === Seq((1L, -1L), (2L, 20L)))
    assert(TxnLog.read(spark, t, Some(v0)).columns.toSeq === Seq("k", "s"))
    // idempotent re-add no-ops; a type change refuses loudly
    assert(TxnLog.addColumns(t, StructType.fromDDL("v BIGINT")) ===
      TxnLog.latestVersion(t))
    val e = intercept[IllegalArgumentException] {
      TxnLog.addColumns(t, StructType.fromDDL("v STRING"))
    }
    assert(e.getMessage.contains("non-additive"))
  }

  test("txnlog: mergeSchema write-path evolution — a widened+extended batch lands schema and data in ONE commit; without the option the widening refuses") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq(1, 2).toDF("k").select(col("k").cast(IntegerType)).coalesce(1))
    val v0 = TxnLog.latestVersion(t)
    // a WIDER incoming type without the option refuses, pointing at
    // both escape hatches (the explicit ALTER and the writer option)
    val refuse = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, Seq(3L).toDF("k").coalesce(1))
    }
    assert(refuse.getMessage.contains("mergeSchema"), refuse.getMessage)
    assert(TxnLog.latestVersion(t) === v0, "refused write left a commit")
    // the evolving writer: k widened int->long AND a new column v —
    // ONE commit carries the protocol bump, the schema action and
    // the data (the atomic schema-evolution contract)
    Seq((3L, 30L)).toDF("k", "v").coalesce(1)
      .write.format("txnlog").mode("append")
      .option("mergeSchema", "true")
      .option("path", t.root.toString).save()
    assert(TxnLog.latestVersion(t) === v0 + 1,
      "evolving append was not one atomic commit")
    val snap = TxnLog.snapshot(t)
    val reg = TxnLog.registeredSchema(t).get
    assert(reg("k").dataType === LongType)
    assert(reg.fieldNames.toSeq === Seq("k", "v"))
    assert(snap.minReader >= 2L,
      s"write-side widening must stamp the type-widening protocol " +
        s"floor, got ${snap.minReader}")
    // old narrow rows promote in-scan and null-fill the new column
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq === Seq((1L, -1L), (2L, -1L), (3L, 30L)))
    // time travel below the evolution keeps the narrow shape
    assert(TxnLog.read(spark, t, Some(v0)).schema("k").dataType ===
      IntegerType)
    // a STILL-incompatible change refuses even under the option
    val bad = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, Seq("oops").toDF("k"), allowWiden = true)
    }
    assert(bad.getMessage.contains("non-additive"), bad.getMessage)
  }

  test("txnlog: MERGE WITH SCHEMA EVOLUTION — new source columns and widened types land with the merge in ONE commit; plain MERGE keeps refusing") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1, "a"), (2, "b")).toDF("k", "s")
        .select(col("k").cast(IntegerType), col("s")).coalesce(1))
    val v0 = TxnLog.latestVersion(t)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO txnlog.`${t.root}` AS t
         |USING (SELECT CAST(2 AS BIGINT) AS k, 'B' AS s, 99L AS w
         |       UNION ALL
         |       SELECT CAST(5 AS BIGINT) AS k, 'e' AS s, 55L AS w) AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(TxnLog.latestVersion(t) === v0 + 1,
      "evolving merge was not one atomic commit")
    val reg = TxnLog.registeredSchema(t).get
    assert(reg.fieldNames.toSeq === Seq("k", "s", "w"))
    assert(reg("k").dataType === LongType)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq ===
      Seq((1L, "a", -1L), (2L, "B", 99L), (5L, "e", 55L)))
    // plain MERGE without the clause keeps both refusals: SET * with
    // a target column the source lacks, and the widening
    val strict = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO txnlog.`${t.root}` AS t
           |USING (SELECT 1L AS k, 'x' AS s, 1L AS w, 9L AS z) AS s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.z = s.z
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(strict.getMessage.contains("unknown column") ||
      strict.getMessage.contains("non-additive"), strict.getMessage)
  }

  test("txnlog: column DEFAULTs freeze with no Spark job at DDL time") {
    // frozenDefault folds the constant on the DRIVER via Catalyst's
    // constant folding — the r20 shape ran one 1-row job per
    // defaulted column (plan.head()), putting N tiny jobs on every
    // interactive CREATE (r20 verdict wrong #2)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val loc = Files.createTempDirectory("graft-dflt0-").resolve("t")
    sc.addSparkListener(listener)
    try {
      spark.sql(s"CREATE TABLE txnlog.`$loc` (k BIGINT, " +
        "a BIGINT DEFAULT 7, b STRING DEFAULT upper('fr'), " +
        "c DOUBLE DEFAULT 1.5 + 2.5, d STRING DEFAULT NULL) USING txnlog")
      Thread.sleep(500) // let the listener bus drain
      assert(jobs.get === 0,
        s"DDL with defaults launched ${jobs.get} Spark job(s)")
    } finally sc.removeSparkListener(listener)
    // the driver-folded values serve exactly as head()'s did
    spark.sql(s"INSERT INTO txnlog.`$loc` (k) VALUES (1)")
    val r = spark.sql(s"SELECT a, b, c, d FROM txnlog.`$loc`").head()
    assert(r.getLong(0) === 7L && r.getString(1) === "FR" &&
      r.getDouble(2) === 4.0 && r.isNullAt(3))
    // the gate's refusals are unchanged: non-constant, non-castable
    val nd = intercept[Exception] {
      spark.sql(s"CREATE TABLE txnlog.`${loc}2` " +
        "(k BIGINT, r DOUBLE DEFAULT rand()) USING txnlog")
    }
    assert(nd.getMessage.contains("non-deterministic"), nd.getMessage)
    val bad = intercept[Exception] {
      spark.sql(s"CREATE TABLE txnlog.`${loc}3` " +
        "(k BIGINT, n BIGINT DEFAULT 'notanumber') USING txnlog")
    }
    assert(bad.getMessage.contains("DEFAULT"), bad.getMessage)
  }

  test("txnlog: general replaceWhere scope probe keeps STRING partition tokens that look numeric") {
    import spark.implicits._
    val t = freshTable()
    // a string partition column whose tokens parse as integers: the
    // staged-read scope probe must see the REGISTERED string ("0012",
    // length 4), not Spark's partition-type INFERENCE (int 12 —
    // which made string predicates mis-evaluate and refuse valid
    // replaces, r20 verdict wrong #1)
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "0012"), (2L, "7")).toDF("id", "p"), Seq("p"))
    val v = TxnLog.replaceWhereExpr(spark, t,
      Seq((10L, "0012")).toDF("id", "p"), length(col("p")) === 4)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ===
      Seq((2L, "7"), (10L, "0012")))
    // leading zeros survive the round-trip (not re-minted as "12")
    assert(TxnLog.read(spark, t).filter(col("id") === 10L)
      .head().getString(1) === "0012")
    // genuinely out-of-scope rows still refuse with no commit
    val stray = intercept[IllegalArgumentException] {
      TxnLog.replaceWhereExpr(spark, t,
        Seq((11L, "7")).toDF("id", "p"), length(col("p")) === 4)
    }
    assert(stray.getMessage.contains("outside the predicate"))
    assert(TxnLog.latestVersion(t) === v)
  }

  test("txnlog: arbitrary-predicate replaceWhere — one atomic delete-matching + insert-validated commit; untouched files never read") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((10L, 1L, "a"), (11L, 2L, "a"), (20L, 5L, "b"), (21L, 6L, "b"))
        .toDF("id", "v", "p").repartitionByRange(2, col("id")),
      Seq("p"), statsCols = Seq("id"))
    val before = TxnLog.snapshot(t)
    // the general form: a NON-partition predicate (v >= 5) — files
    // holding no matching row must survive untouched
    val untouched = before.liveFiles.filter(rel =>
      before.filePartitions(rel)("p") == "a").toSet
    val v1 = TxnLog.replaceWhereExpr(spark, t,
      Seq((30L, 7L, "b"), (31L, 8L, "c")).toDF("id", "v", "p"),
      col("v") >= 5L)
    assert(v1 === before.version + 1, "not one atomic commit")
    val after = TxnLog.snapshot(t)
    assert(untouched.subsetOf(after.liveFiles.toSet),
      "an arbitrary replaceWhere touched out-of-scope files")
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq ===
      Seq((10L, 1L, "a"), (11L, 2L, "a"), (30L, 7L, "b"), (31L, 8L, "c")))
    // survivors restaged THROUGH the layout (no flattening)
    assert(after.liveFiles.forall(after.filePartitions.contains),
      s"replaceWhereExpr flattened the layout: ${after.liveFiles}")
    // exact CDF: matched old rows delete, incoming rows insert
    val (ins, del) = TxnLog.changes(spark, t, before.version, v1)
    assert(del.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(20L, 21L))
    assert(ins.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(30L, 31L))
    // every incoming row must satisfy the predicate — validated on
    // the STAGED output, refusing loudly with no commit
    val stray = intercept[IllegalArgumentException] {
      TxnLog.replaceWhereExpr(spark, t,
        Seq((1L, 1L, "a")).toDF("id", "v", "p"), col("v") >= 5L)
    }
    assert(stray.getMessage.contains("outside the predicate"),
      stray.getMessage)
    assert(TxnLog.latestVersion(t) === v1, "refused replace committed")
    // a NULL-evaluating predicate row matches nothing (SQL's
    // condition-is-true contract): nothing matched + empty input =
    // no commit at all
    assert(TxnLog.replaceWhereExpr(spark, t,
      spark.emptyDataset[(Long, Long, String)].toDF("id", "v", "p"),
      col("v") > 100L) === v1)
    // an insert-only outcome (predicate matches nothing) is one
    // commit whose feed is a plain insert wave — delivered once
    val v2 = TxnLog.replaceWhereExpr(spark, t,
      Seq((90L, 900L, "z")).toDF("id", "v", "p"), col("v") >= 900L)
    assert(v2 === v1 + 1)
    val (ins2, del2) = TxnLog.changes(spark, t, v1, v2)
    assert(del2.isEmpty && ins2.collect().map(_.getLong(0)).toSeq ===
      Seq(90L))
    // the claim semantics: ANY racing commit (even a blind append —
    // it could land rows in the predicate's scope) refuses the
    // stale replace instead of silently surviving it
    val stale = TxnLog.snapshot(t)
    TxnLog.append(spark, t, Seq((91L, 901L, "z")).toDF("id", "v", "p"))
    intercept[java.util.ConcurrentModificationException] {
      TxnLog.replaceWhereExpr(spark, t,
        Seq((92L, 902L, "z")).toDF("id", "v", "p"), col("v") >= 900L,
        snap0 = Some(stale))
    }
    // the incoming shape MERGES against the registered schema: a new
    // column registers in the same commit (additive contract) rather
    // than landing in files every pinned read silently drops
    TxnLog.replaceWhereExpr(spark, t,
      Seq((95L, 905L, "z", 5L)).toDF("id", "v", "p", "extra"),
      col("v") >= 905L)
    assert(TxnLog.registeredSchema(t).get.fieldNames.toSeq ===
      Seq("id", "v", "p", "extra"))
    assert(TxnLog.read(spark, t).filter(col("id") === 95L)
      .select(col("extra")).head().getLong(0) === 5L)
    // whole-table replace on a dv-bearing table: the feed's delete
    // side is the LIVE rows only (a raw file ref would re-deliver
    // the dv-dead row)
    val t9 = freshTable()
    TxnLog.append(spark, t9, Seq(1L, 2L).toDF("id").coalesce(1))
    TxnLog.deleteDv(spark, t9, col("id") === 1L)
    val v9 = TxnLog.replace(spark, t9, Seq(5L).toDF("id"))
    val (ins9, del9) = TxnLog.changes(spark, t9, v9 - 1, v9)
    assert(del9.collect().map(_.getLong(0)).toSeq === Seq(2L),
      "replace CDF re-delivered a dv-dead row")
    assert(ins9.collect().map(_.getLong(0)).toSeq === Seq(5L))
    // an overwrite of an EMPTIED table is a plain insert wave: the
    // feed delivers each row ONCE (no removes → adds auto-count,
    // cdc refs would double)
    TxnLog.delete(spark, t9, lit(true))
    val v10 = TxnLog.replace(spark, t9, Seq(7L).toDF("id"))
    val (ins10, del10) = TxnLog.changes(spark, t9, v10 - 1, v10)
    assert(del10.isEmpty &&
      ins10.collect().map(_.getLong(0)).toSeq === Seq(7L),
      "empty-live-set replace double-delivered its insert wave")
    // a WIDER incoming type refuses without the mergeSchema opt-in;
    // with it, the widened schema lands in the replace's one commit
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val t11 = freshTable()
    TxnLog.append(spark, t11,
      Seq(1).toDF("k").select(col("k").cast(IntegerType)).coalesce(1))
    val wide = intercept[IllegalArgumentException] {
      TxnLog.replaceWhereExpr(spark, t11, Seq(2L).toDF("k"),
        col("k") >= 2L)
    }
    assert(wide.getMessage.contains("mergeSchema"), wide.getMessage)
    TxnLog.replaceWhereExpr(spark, t11, Seq(2L).toDF("k"),
      col("k") >= 2L, allowWiden = true)
    assert(TxnLog.registeredSchema(t11).get("k").dataType === LongType)
    assert(TxnLog.read(spark, t11).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L))
  }

  test("txnlog: column DEFAULT values — pre-evolution reads backfill the default, omitted INSERT columns stamp it, explicit NULL stays NULL") {
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val t = freshTable()
    // CREATE-time default on s
    spark.sql(s"CREATE TABLE txnlog.`${t.root}` " +
      "(k BIGINT, s STRING DEFAULT 'en') USING txnlog")
    // an omitted column takes the default (stamped into the file);
    // an explicit NULL stays NULL — the two must stay distinguishable
    spark.sql(s"INSERT INTO txnlog.`${t.root}` (k) VALUES (1)")
    spark.sql(s"INSERT INTO txnlog.`${t.root}` VALUES (2, NULL)")
    // a writer whose FRAME omits the column entirely: the file
    // physically lacks it, and the read backfills EXISTS_DEFAULT
    TxnLog.append(spark, t, Seq(3L).toDF("k"))
    def rows() = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) "<null>" else r.getString(1))).sorted.toSeq
    assert(rows() === Seq((1L, "en"), (2L, "<null>"), (3L, "en")))
    // ADD COLUMN ... DEFAULT: EVERY pre-evolution row reads the
    // default (not NULL) with no rewrite; the commit demands v4
    // readers (an older reader would serve NULL)
    val v0 = TxnLog.latestVersion(t)
    spark.sql(s"ALTER TABLE txnlog.`${t.root}` " +
      "ADD COLUMNS (q INT DEFAULT 7)")
    assert(TxnLog.latestVersion(t) === v0 + 1)
    assert(TxnLog.snapshot(t).minReader === 4L,
      s"defaults must bump the protocol floor, got " +
        s"${TxnLog.snapshot(t).minReader}")
    def q(): Seq[(Long, Long)] = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getAs[Number](2).longValue))
      .sorted.toSeq
    assert(q() === Seq((1L, 7L), (2L, 7L), (3L, 7L)),
      "pre-evolution rows must backfill the DEFAULT, not NULL")
    // a post-evolution omitted column stamps it; time travel below
    // the evolution keeps the old shape
    spark.sql(s"INSERT INTO txnlog.`${t.root}` (k) VALUES (4)")
    assert(q() === Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)))
    assert(TxnLog.read(spark, t, Some(v0)).columns.toSeq ===
      Seq("k", "s"))
    // interplay with WIDENING: the default survives the retype
    TxnLog.widenColumn(t, "q", LongType)
    assert(q() === Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)),
      "widening dropped the column default")
    // interplay with COLUMN MAPPING: rename keeps the default wired
    // to the physical name old files lack
    TxnLog.renameColumn(t, "q", "r")
    assert(TxnLog.read(spark, t).columns.toSeq === Seq("k", "s", "r"))
    assert(q() === Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)),
      "rename dropped the column default")
    // refusals: a non-constant default, and a default that cannot
    // cast to the column type
    val nonConst = intercept[Exception] {
      spark.sql(s"ALTER TABLE txnlog.`${t.root}` " +
        "ADD COLUMNS (z BIGINT DEFAULT k + 1)")
    }
    assert(nonConst.getMessage.contains("DEFAULT"), nonConst.getMessage)
    val badCast = intercept[Exception] {
      spark.sql(s"ALTER TABLE txnlog.`${t.root}` " +
        "ADD COLUMNS (z BIGINT DEFAULT 'abc')")
    }
    assert(badCast.getMessage.contains("DEFAULT"), badCast.getMessage)
    // a NON-DETERMINISTIC default refuses: EXISTS_DEFAULT is frozen
    // at DDL time and served on every later scan
    val nondet = intercept[Exception] {
      spark.sql(s"ALTER TABLE txnlog.`${t.root}` " +
        "ADD COLUMNS (z DOUBLE DEFAULT rand())")
    }
    assert(nondet.getMessage.contains("non-deterministic"),
      nondet.getMessage)
    // nested types keep parsing through the DEFAULT-aware DDL path
    // (top-level-comma split honors <> and () nesting)
    val t2 = freshTable()
    spark.sql(s"CREATE TABLE txnlog.`${t2.root}` (m MAP<STRING, INT>, " +
      "d DECIMAL(10,2), tag STRING DEFAULT 'x') USING txnlog")
    assert(TxnLog.registeredSchema(t2).get.fieldNames.toSeq ===
      Seq("m", "d", "tag"))
    assert(TxnLog.defaultSql(
      TxnLog.registeredSchema(t2).get("tag")).contains("'x'"))
    // NOT NULL + DEFAULT NULL: an omitting writer still refuses —
    // the backfill would be the very NULL the constraint forbids
    val t3 = freshTable()
    spark.sql(s"CREATE TABLE txnlog.`${t3.root}` " +
      "(k BIGINT, c INT DEFAULT NULL) USING txnlog")
    spark.sql(s"INSERT INTO txnlog.`${t3.root}` VALUES (1, 5)")
    TxnLog.addNotNull(spark, t3, "c")
    val omits = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t3, Seq(2L).toDF("k"))
    }
    assert(omits.getMessage.contains("NOT NULL c"), omits.getMessage)
    // MERGE's column-list INSERT takes declared defaults for the
    // unlisted columns too (SQL INSERT's contract; was NULL-fill)
    spark.sql(
      s"""MERGE INTO txnlog.`${t.root}` AS t
         |USING (SELECT 50L AS k) AS s
         |ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)""".stripMargin)
    val merged = TxnLog.read(spark, t).filter(col("k") === 50L)
      .select(col("s"), col("r")).head()
    assert(merged.getString(0) === "en" &&
      merged.getAs[Number](1).longValue === 7L,
      s"MERGE INSERT did not default-fill: $merged")
    // a comparison operator inside a DEFAULT must not be read as a
    // type bracket — the next top-level comma still splits
    val t4 = freshTable()
    spark.sql(s"CREATE TABLE txnlog.`${t4.root}` " +
      "(a BOOLEAN DEFAULT 1 < 2, b INT) USING txnlog")
    assert(TxnLog.registeredSchema(t4).get.fieldNames.toSeq ===
      Seq("a", "b"))
    assert(TxnLog.defaultSql(TxnLog.registeredSchema(t4).get("a"))
      .contains("true"))
  }

  test("txnlog: SHALLOW CLONE — zero-copy fork, metadata carried, independent divergence, vacuum matrix, clone-from-history") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val src = freshTable()
    TxnLog.appendPartitioned(spark, src,
      Seq((1L, "a"), (2L, "a"), (10L, "b"), (11L, "b"))
        .toDF("id", "p").repartitionByRange(2, col("id")),
      Seq("p"), statsCols = Seq("id"))
    TxnLog.setProperties(src, Map("graft.enableDeletionVectors" -> "true"))
    TxnLog.deleteDv(spark, src, col("id") === 2L) // a dv rides the clone
    val srcSnapV = TxnLog.latestVersion(src)
    val dst = freshTable()
    TxnLog.shallowClone(src, dst)
    // the clone equals the source — rows, schema, layout, dv state,
    // properties, and NOT ONE data file was copied
    assert(TxnLog.read(spark, dst).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 10L, 11L))
    val dsnap = TxnLog.snapshot(dst)
    assert(dsnap.declaredPartCols === Seq("p"))
    assert(dsnap.properties.get("graft.enableDeletionVectors")
      .contains("true"))
    assert(dsnap.dvs.nonEmpty, "the source's deletion vector was lost")
    assert({
      val walk = Files.walk(dst.dataDir)
      try !walk.iterator().asScala
        .exists(p => p.toString.endsWith(".parquet"))
      finally walk.close()
    }, "SHALLOW CLONE copied data files")
    // partition pruning still works off the carried tokens
    assert(TxnLog.readPartition(spark, dst, Map("p" -> "b"))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
    // independent divergence: the clone's DML and appends never touch
    // the source, and the source's later writes never reach the clone
    TxnLog.append(spark, dst, Seq((20L, "c")).toDF("id", "p"))
    TxnLog.delete(spark, dst, col("id") === 1L)
    TxnLog.append(spark, src, Seq((99L, "z")).toDF("id", "p"))
    assert(TxnLog.read(spark, dst).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(10L, 11L, 20L))
    assert(TxnLog.read(spark, src).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 10L, 11L, 99L))
    // time travel on the clone: v0 IS the clone point
    assert(TxnLog.read(spark, dst, Some(0L)).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 10L, 11L))
    // clone-from-history (VERSION AS OF the pre-dv snapshot) + the
    // SQL spelling with a catalog-name destination — taken BEFORE any
    // source vacuum: a history clone references files the source may
    // have already rewritten, the documented horizon
    spark.sql("DROP TABLE IF EXISTS clone_cat")
    spark.sql(s"CREATE TABLE clone_cat SHALLOW CLONE txnlog.`${src.root}` " +
      s"VERSION AS OF 0")
    assert(spark.table("clone_cat").collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L, 10L, 11L),
      "clone-from-history must predate the dv delete")
    // an existing destination refuses; IF NOT EXISTS no-ops
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE clone_cat SHALLOW CLONE " +
        s"txnlog.`${src.root}`")
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    spark.sql(s"CREATE TABLE IF NOT EXISTS clone_cat SHALLOW CLONE " +
      s"txnlog.`${src.root}`")
    spark.sql("DROP TABLE IF EXISTS clone_cat")
    // DROP COLUMN tombstones ride the clone: re-adding the dropped
    // name on the CLONE would read the dropped column's bytes out of
    // the shared (absolute-ref) files
    val src2 = freshTable()
    TxnLog.append(spark, src2, Seq((1L, 9L)).toDF("id", "x"))
    TxnLog.dropColumn(src2, "x")
    val dst2 = freshTable()
    TxnLog.shallowClone(src2, dst2)
    val resur = intercept[IllegalArgumentException] {
      TxnLog.addColumns(dst2,
        org.apache.spark.sql.types.StructType.fromDDL("x BIGINT"))
    }
    assert(resur.getMessage.contains("DROPPED"), resur.getMessage)
    // vacuum matrix, clone side: candidates never name a source file
    // (the walk is under the clone's own trees by construction)
    val cloneCands = TxnLog.vacuumCandidates(dst, graceMs = 0L)
    assert(cloneCands.forall(!_.startsWith("/")),
      s"clone vacuum candidates reached outside its root: $cloneCands")
    TxnLog.vacuum(dst, graceMs = 0L)
    assert(TxnLog.read(spark, src).count() === 4L,
      "the clone's vacuum deleted source data")
    // vacuum matrix, source side: live files are never candidates, so
    // the fork stays readable; once the SOURCE removes and vacuums a
    // referenced file, the clone hits the documented horizon LOUDLY
    TxnLog.vacuum(src, graceMs = 0L)
    assert(TxnLog.read(spark, dst).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(10L, 11L, 20L))
    // OPTIMIZE localizes the clone — after it, no absolute source
    // refs remain and the source's vacuum horizon no longer applies
    TxnLog.compact(spark, dst)
    assert(TxnLog.snapshot(dst).liveFiles.forall(!_.startsWith("/")),
      "OPTIMIZE left absolute source references in the clone")
    TxnLog.delete(spark, src, col("id") === 10L) // src rewrites b
    TxnLog.vacuum(src, graceMs = 0L)
    assert(TxnLog.read(spark, dst).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(10L, 11L, 20L),
      "the localized clone must survive the source's vacuum")
  }

  test("txnlog: streaming sink mergeSchema — an evolved pipeline widens and extends inside its exactly-once micro-batch commits") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq(1).toDF("k").select(col("k").cast(IntegerType)).coalesce(1))
    val v0 = TxnLog.latestVersion(t)
    // the evolved pipeline: k now arrives as BIGINT plus a new column
    val ckpt = Files.createTempDirectory("graft-evock-").toString
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k", "v")
      .writeStream.format("txnlog")
      .option("path", t.root.toString)
      .option("checkpointLocation", ckpt)
      .option("mergeSchema", "true")
      .start()
    try {
      in.addData((2L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    assert(TxnLog.latestVersion(t) === v0 + 1,
      "evolved micro-batch was not one atomic commit")
    val reg = TxnLog.registeredSchema(t).get
    assert(reg("k").dataType === LongType &&
      reg.fieldNames.toSeq === Seq("k", "v"))
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq === Seq((1L, -1L), (2L, 20L)))
    // the fence survives the evolution: a replayed twin no-ops
    assert(!TxnLog.appendBatch(spark, t, Seq((2L, 20L)).toDF("k", "v"),
      "ck" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(ckpt.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString, 0L, allowWiden = true))
    // an incompatible retype fails the query loudly with or without
    // the option — mergeSchema admits only lossless widenings
    val ckpt2 = Files.createTempDirectory("graft-evock2-").toString
    val in2 = MemoryStream[(String, Long)]
    val q2 = in2.toDF().toDF("k", "v")
      .writeStream.format("txnlog")
      .option("path", t.root.toString)
      .option("checkpointLocation", ckpt2)
      .option("mergeSchema", "true")
      .start()
    val boom = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      in2.addData(("oops", 3L))
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(boom.getMessage.contains("non-additive") ||
      Option(boom.getCause).exists(_.getMessage.contains("non-additive")),
      boom.getMessage)
  }

  test("txnlog: RESTORE rolls back metadata-only — layout and CDF carried, vacuum horizon refused, restore-the-restore works") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1", 10L), (2L, "d2", 20L)).toDF("id", "day", "v"),
      Seq("day"))
    val v0 = TxnLog.latestVersion(t)
    TxnLog.appendPartitioned(spark, t,
      Seq((3L, "d3", 30L)).toDF("id", "day", "v"), Seq("day"))
    TxnLog.dropPartition(t, Map("day" -> "d1"))
    val v2 = TxnLog.latestVersion(t)
    // rollback: drops the d3 file, re-adds the d1 file — no data
    // file read or written (no SparkSession in the signature)
    val v3 = TxnLog.restore(t, v0)
    assert(v3 === v2 + 1)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      .toSeq === Seq((1L, "d1", 10L), (2L, "d2", 20L)))
    // partition tokens carried forward: pruning plans a strict
    // subset and drop-a-day is still metadata-only after the restore
    val snap = TxnLog.snapshot(t)
    assert(snap.liveFiles.forall(snap.filePartitions.contains),
      s"restore dropped partition metadata: ${snap.liveFiles}")
    val (planned, live) = TxnLog.plannedFilesPartition(t, Map("day" -> "d1"))
    assert(planned === 1 && live === 2)
    // the restore commit's own change feed: d3's row out, d1's back in
    val (ins, del) = TxnLog.changes(spark, t, v2, v3)
    assert(del.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((3L, "d3")))
    assert(ins.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .toSeq === Seq((1L, "d1")))
    // a restore is itself history: restoring BACK to the pre-restore
    // state works, and restoring to the current state is a no-op
    TxnLog.restore(t, v2)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(2L, 3L))
    val cur = TxnLog.latestVersion(t)
    assert(TxnLog.restore(t, cur) === cur)
    // the restore horizon is the vacuum horizon: reclaimed files
    // refuse loudly instead of committing adds that point at nothing
    val t2 = freshTable()
    (0 until 11).foreach(i => // v0..v10, auto-checkpoint at v10
      TxnLog.append(spark, t2, Seq((i.toLong, 0L)).toDF("k", "v")))
    TxnLog.compact(spark, t2) // v11 rewrites the live set (cdc none)
    TxnLog.expireLog(t2) // floor = v10; v10 stays replayable…
    TxnLog.vacuum(t2, graceMs = 0L) // …but its files are reclaimed
    val e = intercept[IllegalArgumentException] {
      TxnLog.restore(t2, 10L)
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
  }

  test("txnlog: the writeStream sink lands exactly-once commits; a restarted query never double-delivers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-sinkck-").toString
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("id", "s")
      .writeStream.format("txnlog")
      .option("path", t.root.toString)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      in.addData((3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // one commit per micro-batch, each fenced by a txn marker under
    // the digest-derived writer identity (64-bit prefix — two queries
    // on distinct checkpoints must never collide into one appId)
    val appId = "ck" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(ckpt.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    assert(TxnLog.lastBatch(t, appId).contains(1L))
    // restart on the SAME checkpoint: down-time rows arrive exactly
    // once; already-committed batches are fenced, not replayed
    in.addData((4L, "d"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(TxnLog.read(spark, t).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // the full native loop: readStream FROM one txnlog table,
    // writeStream INTO another — offsets and txn markers compose
    val dst = freshTable()
    val ckpt2 = Files.createTempDirectory("graft-sinkck2-").toString
    val loop = spark.readStream.format("txnlog")
      .option("path", t.root.toString).load()
      .writeStream.format("txnlog")
      .option("path", dst.root.toString)
      .option("checkpointLocation", ckpt2)
      .start()
    try loop.processAllAvailable() finally loop.stop()
    assert(TxnLog.read(spark, dst).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // a PARTITIONED target inherits its layout (tokens recorded)
    val pt = freshTable()
    TxnLog.appendPartitioned(spark, pt,
      Seq((0L, "d0")).toDF("id", "day"), Seq("day"))
    val ckpt3 = Files.createTempDirectory("graft-sinkck3-").toString
    val in3 = MemoryStream[(Long, String)]
    val q3 = in3.toDF().toDF("id", "day")
      .writeStream.format("txnlog")
      .option("path", pt.root.toString)
      .option("checkpointLocation", ckpt3)
      .start()
    try {
      in3.addData((1L, "d1"))
      q3.processAllAvailable()
    } finally q3.stop()
    val psnap = TxnLog.snapshot(pt)
    assert(psnap.liveFiles.forall(psnap.filePartitions.contains),
      s"sink flattened the layout: ${psnap.liveFiles}")
    assert(TxnLog.readPartition(spark, pt, Map("day" -> "d1"))
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("txnlog: a CDF stream resuming below the replay floor refuses zero-copy deletes it cannot reconstitute") {
    import spark.implicits._
    val t = freshTable()
    // 9 partitioned appends land v0..v8; v9 is a zero-copy partition
    // drop; v10 caps the range. The checkpoint at v10 becomes the
    // expire floor — a stream checkpointed at v9 survives, one at v8
    // (just below the floor after expiry) must refuse, not null-fill
    (0 until 9).foreach(i => TxnLog.appendPartitioned(spark, t,
      Seq((i.toLong, s"d${i % 3}")).toDF("id", "day"), Seq("day")))
    TxnLog.dropPartition(t, Map("day" -> "d0")) // v9: zero-copy deletes
    TxnLog.appendPartitioned(spark, t,
      Seq((100L, "d9")).toDF("id", "day"), Seq("day")) // v10
    TxnLog.checkpoint(t, 10L)
    TxnLog.expireLog(t) // retained: v10 only; floor = 10
    // resuming at v9 (range v10..v10, fully retained, no pre-floor
    // deletes) still works …
    val ok = TxnLog.readChangeFeedBatch(spark, t, 9L, 10L, schemaJson =
      TxnLog.registeredSchema(t).get.json)
    assert(ok._1.collect().map(_.getLong(0)).toSeq === Seq(100L))
    // the UNRESOLVABLE shape: the zero-copy drop is the floor commit
    // ITSELF, so the dropped files' partition metadata lived only in
    // pre-floor state (expired) — reading them flat would null-fill
    // the partition column; the batch must refuse instead
    val t3 = freshTable()
    (0 until 10).foreach(i => TxnLog.appendPartitioned(spark, t3,
      Seq((i.toLong, s"d${i % 3}")).toDF("id", "day"), Seq("day")))
    TxnLog.dropPartition(t3, Map("day" -> "d0")) // v10
    TxnLog.checkpoint(t3, 10L)
    TxnLog.expireLog(t3) // floor = 10 = the drop commit
    val ex = intercept[IllegalStateException] {
      TxnLog.readChangeFeedBatch(spark, t3, 9L, 10L,
        TxnLog.registeredSchema(t3).get.json)
    }
    assert(ex.getMessage.contains("fresh checkpoint"),
      s"wrong refusal: ${ex.getMessage}")
    // …but an UNPARTITIONED table's zero-copy deletes at the floor (a
    // REPLACE's old files) carry every column IN the file — the batch
    // must read them flat, not refuse (the footer check discriminates)
    val t4 = freshTable()
    (0 until 10).foreach(i =>
      TxnLog.append(spark, t4, Seq((i.toLong, 0L)).toDF("k", "v")))
    TxnLog.replace(spark, t4,
      Seq((100L, 1L)).toDF("k", "v").coalesce(1)) // v10: floor commit
    TxnLog.checkpoint(t4, 10L)
    TxnLog.expireLog(t4)
    val (ins4, del4) = TxnLog.readChangeFeedBatch(spark, t4, 9L, 10L,
      TxnLog.registeredSchema(t4).get.json)
    assert(ins4.collect().map(_.getLong(0)).toSeq === Seq(100L))
    assert(del4.collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 10L))
  }

  test("txnlog: add actions record file sizes; DETAIL and compactSmall read the manifest, not the filesystem") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 100L).toDF("id").coalesce(2))
    TxnLog.appendPartitioned(spark, t,
      Seq((200L, "d1"), (201L, "d2")).toDF("id", "day"), Seq("day"))
    val snap = TxnLog.snapshot(t)
    // every write path stamps size= tokens, and they match the disk
    assert(snap.liveFiles.forall(snap.fileSizes.contains),
      s"size-less adds: ${snap.liveFiles.filterNot(snap.fileSizes.contains)}")
    snap.liveFiles.foreach { rel =>
      assert(snap.fileSizes(rel) === Files.size(t.root.resolve(rel)),
        s"manifest size diverges from disk for $rel")
    }
    // sizes survive checkpoint replay and ride a restore forward
    val vPre = TxnLog.latestVersion(t)
    TxnLog.delete(spark, t, col("id") < 50L)
    TxnLog.restore(t, vPre)
    TxnLog.checkpoint(t, TxnLog.latestVersion(t))
    val snap2 = TxnLog.snapshot(t)
    assert(snap2.liveFiles.forall(snap2.fileSizes.contains),
      "sizes lost through restore/checkpoint")
    // DESCRIBE DETAIL sums the MANIFEST: growing a data file on disk
    // behind the log's back must not change the reported bytes
    val before = spark.sql(s"DESCRIBE DETAIL txnlog.`${t.root}`")
      .head().getLong(4)
    val victim = t.root.resolve(snap2.liveFiles.head)
    val origBytes = Files.readAllBytes(victim)
    Files.write(victim, origBytes ++ new Array[Byte](4096))
    try {
      val after = spark.sql(s"DESCRIBE DETAIL txnlog.`${t.root}`")
        .head().getLong(4)
      assert(after === before,
        "DESCRIBE DETAIL stat-walked the filesystem instead of the manifest")
    } finally Files.write(victim, origBytes)
    // compactSmall selects from MANIFEST sizes: a raw add whose size=
    // token claims a huge file must not be selected even though the
    // physical file is tiny (stat-based selection would take it)…
    val t2 = freshTable()
    TxnLog.append(spark, t2, Seq(1L).toDF("id").coalesce(1))
    TxnLog.append(spark, t2, Seq(2L).toDF("id").coalesce(1))
    val small = TxnLog.snapshot(t2).liveFiles.head
    val claimed = TxnLog.snapshot(t2).liveFiles.last
    // re-register the second file with a fabricated huge size
    TxnLog.commit(t2, TxnLog.latestVersion(t2), adds = Nil,
      extra = Seq(s"add\t$claimed\tsize=${1L << 40}"))
    val v0 = TxnLog.latestVersion(t2)
    assert(TxnLog.compactSmall(spark, t2, minFileBytes = 1L << 20) === v0,
      "compactSmall trusted the filesystem over the manifest " +
        "(needs >= 2 small files; the claimed-huge one must not count)")
    // …and a LEGACY add with no size token falls back to one stat
    val t3 = freshTable()
    TxnLog.append(spark, t3, Seq(1L).toDF("id").coalesce(1))
    val legacyRel = {
      val stage = t3.dataDir.resolve("legacy-stage")
      Seq(2L).toDF("id").coalesce(1).write.parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val s0 = Files.walk(stage)
      try s0.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => t3.root.relativize(p).toString).next()
      finally s0.close()
    }
    TxnLog.commit(t3, TxnLog.latestVersion(t3), adds = Seq(legacyRel))
    val snap3 = TxnLog.snapshot(t3)
    assert(!snap3.fileSizes.contains(legacyRel), "raw add grew a size")
    TxnLog.compactSmall(spark, t3, minFileBytes = 1L << 20)
    assert(TxnLog.snapshot(t3).liveFiles.length === 1,
      "legacy stat fallback missed the small pair")
    assert(TxnLog.read(spark, t3).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
  }

  test("txnlog: RENAME/DROP COLUMN are metadata-only through column mapping") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s").coalesce(1))
    TxnLog.append(spark, t,
      Seq((3L, 30L, "c")).toDF("k", "v", "s").coalesce(1))
    val v0 = TxnLog.latestVersion(t)
    val preFiles = TxnLog.snapshot(t).liveFiles.toSet
    // RENAME: one metadata commit, zero data files touched
    TxnLog.renameColumn(t, "v", "amount")
    assert(TxnLog.snapshot(t).liveFiles.toSet === preFiles,
      "rename rewrote data files")
    // old data reads under the NEW name
    val now = TxnLog.read(spark, t)
    assert(now.columns.toSeq === Seq("k", "amount", "s"))
    assert(now.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // time travel BELOW the rename shows the OLD name
    assert(TxnLog.read(spark, t, Some(v0)).columns.toSeq ===
      Seq("k", "v", "s"))
    // writes keep storing the PHYSICAL name: an append with the new
    // logical name lands files whose footers still say 'v'
    TxnLog.append(spark, t,
      Seq((4L, 40L, "d")).toDF("k", "amount", "s").coalesce(1))
    val newFile = TxnLog.snapshot(t).liveFiles.filterNot(preFiles).head
    assert(spark.read.parquet(t.root.resolve(newFile).toString)
      .columns.contains("v"), "append ignored the physical mapping")
    // DML through the mapping: SQL UPDATE on the renamed column, and
    // the CDF of the whole range reconstitutes under the NEW schema
    spark.sql(
      s"UPDATE txnlog.`${t.root}` SET amount = amount + 1 WHERE k = 4")
    assert(TxnLog.read(spark, t).filter($"k" === 4L).head().getLong(1)
      === 41L)
    val (ins, del) = TxnLog.changes(spark, t, v0, TxnLog.latestVersion(t))
    assert(ins.columns.contains("amount") && del.columns.contains("amount"))
    assert(ins.collect().map(_.getLong(1)).sorted.toSeq === Seq(40L, 41L))
    // a fresh column named like the pre-rename storage name refuses
    // (it would read the renamed column's bytes out of old files)
    val e1 = intercept[IllegalArgumentException] {
      TxnLog.addColumns(t, org.apache.spark.sql.types.StructType
        .fromDDL("v BIGINT"))
    }
    assert(e1.getMessage.contains("physical"), e1.getMessage)
    // DROP COLUMN: metadata-only; time travel still shows it; the
    // tombstone blocks resurrection; a different name is fine
    val vPreDrop = TxnLog.latestVersion(t)
    TxnLog.dropColumn(t, "s")
    assert(TxnLog.read(spark, t).columns.toSeq === Seq("k", "amount"))
    assert(TxnLog.read(spark, t, Some(vPreDrop)).columns.contains("s"))
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.addColumns(t, org.apache.spark.sql.types.StructType
        .fromDDL("s STRING"))
    }
    assert(e2.getMessage.contains("DROPPED"), e2.getMessage)
    TxnLog.addColumns(t, org.apache.spark.sql.types.StructType
      .fromDDL("note STRING"))
    assert(TxnLog.read(spark, t).columns.toSeq ===
      Seq("k", "amount", "note"))
    // OPTIMIZE after the evolution keeps values and re-stamps stats
    // under the new logical name (pruning works again)
    TxnLog.compactZorder(spark, t, "k", "amount", targetFiles = 2)
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 41L)))
    val (kept, total) = TxnLog.plannedFiles(t, "amount", 0L, 15L)
    assert(kept < total || total == 1, s"no pruning on renamed col: $kept/$total")
    // constraints migrate/guard: NOT NULL follows the rename; a CHECK
    // referencing the column blocks rename/drop until dropped
    val t2 = freshTable()
    TxnLog.append(spark, t2,
      Seq((1L, 5L)).toDF("k", "x").coalesce(1))
    TxnLog.addNotNull(spark, t2, "x")
    TxnLog.addCheck(spark, t2, "x_pos", "x >= 0")
    val e3 = intercept[IllegalArgumentException] {
      TxnLog.renameColumn(t2, "x", "y")
    }
    assert(e3.getMessage.contains("x_pos"), e3.getMessage)
    TxnLog.dropConstraint(t2, "x_pos")
    TxnLog.renameColumn(t2, "x", "y")
    val e4 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t2,
        Seq((2L, null.asInstanceOf[java.lang.Long]))
          .toDF("k", "y").coalesce(1))
    }
    assert(e4.getMessage.contains("NOT NULL y"), e4.getMessage)
    // partition columns refuse (the layout IS the name); SQL forms
    val pt = freshTable()
    TxnLog.appendPartitioned(spark, pt,
      Seq((1L, 7L, "d1")).toDF("id", "q", "day"), Seq("day"))
    val e5 = intercept[IllegalArgumentException] {
      TxnLog.renameColumn(pt, "day", "dt")
    }
    assert(e5.getMessage.contains("partition"), e5.getMessage)
    spark.sql(s"ALTER TABLE txnlog.`${pt.root}` RENAME COLUMN q TO qty")
    spark.sql(s"ALTER TABLE txnlog.`${pt.root}` DROP COLUMN qty")
    assert(TxnLog.read(spark, pt).columns.toSeq === Seq("id", "day"))
    assert(TxnLog.readPartition(spark, pt, Map("day" -> "d1"))
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // partitioned table + mapping: rewrite ops keep the layout AND
    // the mapping (merge restages through both)
    TxnLog.renameColumn(pt, "id", "ident")
    TxnLog.merge(spark, pt,
      Seq((1L, "d1"), (9L, "d2")).toDF("ident", "day"), "ident")
    val psnap = TxnLog.snapshot(pt)
    assert(psnap.liveFiles.forall(psnap.filePartitions.contains),
      "merge under mapping flattened the layout")
    assert(TxnLog.read(spark, pt).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 9L))
    // dropping a STATS-TRACKED column must not brick rewrites: the
    // orphaned manifest triples are excluded from re-stamping
    val st = freshTable()
    TxnLog.appendWithStats(spark, st,
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b").coalesce(1), Seq("a", "b"))
    TxnLog.dropColumn(st, "b")
    TxnLog.delete(spark, st, col("a") === 1L) // restages survivors
    TxnLog.compact(spark, st)                 // re-stamps live stats
    assert(TxnLog.read(spark, st).collect().map(_.getLong(0)).toSeq
      === Seq(3L))
    // restoring BELOW a rename restores the old schema even though
    // the live set is unchanged, and drops the migrated NOT NULL
    // instead of bricking every future write
    val rn = freshTable()
    TxnLog.append(spark, rn, Seq((1L, 2L)).toDF("k", "x").coalesce(1))
    val vPreRename = TxnLog.latestVersion(rn)
    TxnLog.addNotNull(spark, rn, "x")
    TxnLog.renameColumn(rn, "x", "y")
    TxnLog.restore(spark, rn, vPreRename)
    assert(TxnLog.read(spark, rn).columns.toSeq === Seq("k", "x"),
      "schema-only restore did not re-register the old shape")
    TxnLog.append(spark, rn,
      Seq((2L, null.asInstanceOf[java.lang.Long])).toDF("k", "x")
        .coalesce(1)) // the migrated 'y' constraint must be gone
    assert(TxnLog.read(spark, rn).count() === 2L)
  }

  test("txnlog: type widening, partition-scoped OPTIMIZE and startingVersion streams") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // WIDENING: one metadata commit; old narrow files promote in-scan
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").coalesce(1))
    val preFiles = TxnLog.snapshot(t).liveFiles.toSet
    val v0 = TxnLog.latestVersion(t)
    TxnLog.widenColumn(t, "i", LongType)
    spark.sql(s"ALTER TABLE txnlog.`${t.root}` ALTER COLUMN f TYPE DOUBLE")
    assert(TxnLog.snapshot(t).liveFiles.toSet === preFiles,
      "widening rewrote data files")
    val now = TxnLog.read(spark, t)
    assert(now.schema("i").dataType === LongType &&
      now.schema("f").dataType === DoubleType)
    assert(now.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      .toSeq === Seq((1L, 1.5), (2L, 2.5)))
    // time travel below keeps the narrow shape
    assert(TxnLog.read(spark, t, Some(v0)).schema("i").dataType
      === IntegerType)
    // narrow writers keep working (merged schema accepts narrower);
    // wide writes land wide; a mixed table reads uniformly wide
    TxnLog.append(spark, t, Seq((3, 3.5f)).toDF("i", "f").coalesce(1))
    TxnLog.append(spark, t,
      Seq((4L, 4.5d)).toDF("i", "f").coalesce(1))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L, 4L))
    // DML through the widened schema (locate + restage)
    TxnLog.update(spark, t, Map("f" -> lit(9.0d)), col("i") === 4L)
    assert(TxnLog.read(spark, t).filter(col("i") === 4L).head()
      .getDouble(1) === 9.0)
    // narrowing and non-numeric changes refuse
    val e1 = intercept[IllegalArgumentException] {
      TxnLog.widenColumn(t, "i", IntegerType)
    }
    assert(e1.getMessage.contains("widening"), e1.getMessage)
    // implicit widening through a WRITE refuses, naming the fix
    val t2 = freshTable()
    TxnLog.append(spark, t2, Seq((1, 2)).toDF("a", "b").coalesce(1))
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t2, Seq((3L, 4L)).toDF("a", "b").coalesce(1))
    }
    assert(e2.getMessage.contains("widen the column first"), e2.getMessage)
    // PARTITION-SCOPED OPTIMIZE: only the WHERE'd partition compacts
    val pt = freshTable()
    (0 until 4).foreach(i => TxnLog.appendPartitioned(spark, pt,
      Seq((i.toLong, "d1")).toDF("id", "day"), Seq("day")))
    (0 until 3).foreach(i => TxnLog.appendPartitioned(spark, pt,
      Seq((10L + i, "d2")).toDF("id", "day"), Seq("day")))
    spark.sql(s"OPTIMIZE txnlog.`${pt.root}` WHERE day = 'd1'")
    val ps = TxnLog.snapshot(pt)
    val byDay = ps.liveFiles.groupBy(r =>
      ps.filePartitions(r).getOrElse("day", "?"))
    assert(byDay("d1").length === 1, s"d1 not compacted: $byDay")
    assert(byDay("d2").length === 3, s"d2 was touched: $byDay")
    assert(TxnLog.read(spark, pt).count() === 7L)
    // WHERE on a non-partition column refuses; WHERE + ZORDER refuses
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE txnlog.`${pt.root}` WHERE id = '1'")
    }
    assert(e3.getMessage.contains("partition"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(
        s"OPTIMIZE txnlog.`${pt.root}` WHERE day = 'd1' ZORDER BY (a, b)")
    }
    assert(e4.getMessage.contains("ZORDER"), e4.getMessage)
    // STARTING VERSION: the stream skips the initial snapshot and
    // replays changes from the given version (inclusive)
    val st = freshTable()
    (0 until 3).foreach(i =>
      TxnLog.append(spark, st, Seq(i.toLong).toDF("id").coalesce(1)))
    val got = spark.readStream.format("txnlog")
      .option("path", st.root.toString)
      .option("startingVersion", "2")
      .load()
    val ckpt = Files.createTempDirectory("graft-svck-").toString
    val outRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = got.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows.synchronized {
          outRows ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(outRows.sorted.toSeq === Seq(2L),
      s"startingVersion=2 delivered $outRows (wanted only v2's row)")
    // "latest" delivers nothing old, only post-start commits
    val outRows2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("txnlog")
      .option("path", st.root.toString)
      .option("startingVersion", "latest")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows2.synchronized {
          outRows2 ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-svck2-").toString)
      .start()
    try {
      TxnLog.append(spark, st, Seq(99L).toDF("id").coalesce(1))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(outRows2.sorted.toSeq === Seq(99L),
      s"startingVersion=latest delivered $outRows2")
    // rate-limited offsets respect the skip: the high-water mark is
    // SEEDED from startingVersion, so maxVersionsPerBatch cannot
    // chain the stream from the origin and deliver the backlog the
    // option exists to skip
    val outRows3 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q3 = spark.readStream.format("txnlog")
      .option("path", st.root.toString)
      .option("startingVersion", "2")
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows3.synchronized {
          outRows3 ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-svck3-").toString)
      .start()
    try q3.processAllAvailable() finally q3.stop()
    assert(outRows3.sorted.toSeq === Seq(2L, 99L),
      s"rate-limited startingVersion stream delivered $outRows3 " +
        "(wanted exactly v2's and v3's rows)")
  }

  test("txnlog: the sink's Update mode upserts keyed state exactly-once across a restart") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft-updck-").toString
    val in = MemoryStream[Long]
    def start() = in.toDF().toDF("k")
      .groupBy($"k").agg(count(lit(1)).cast("long").as("n"))
      .writeStream.format("txnlog")
      .outputMode("update")
      .option("path", t.root.toString)
      .option("checkpointLocation", ckpt)
      .option("mergeKeys", "k")
      .start()
    def state(): Map[Long, Long] = TxnLog.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q1 = start()
    try {
      in.addData(1L, 2L, 1L)
      q1.processAllAvailable()
      assert(state() === Map(1L -> 2L, 2L -> 1L))
      // a later trigger UPDATES key 2 in place and INSERTS key 3 —
      // the Update-mode contract (only changed keys arrive)
      in.addData(2L, 3L)
      q1.processAllAvailable()
      assert(state() === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
    } finally q1.stop()
    // restart on the SAME checkpoint: the replayed/new batches
    // converge to the batch-twin aggregation, no double counting
    in.addData(1L, 3L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(state() === Map(1L -> 3L, 2L -> 2L, 3L -> 2L),
      s"restart diverged from the batch twin: ${state()}")
    // mode guardrail: Update without mergeKeys refuses at start
    val e = intercept[Exception] {
      in.toDF().toDF("k").groupBy($"k").count()
        .writeStream.format("txnlog").outputMode("update")
        .option("path", t.root.toString)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-updck2-").toString)
        .start()
    }
    assert(e.getMessage.contains("mergeKeys"), e.getMessage)
    // the DEGRADED (no key matched) path is fenced too: a replayed
    // insert-only batch routes through the marker-rechecking append,
    // never a blind one — rows land once
    val ut = freshTable()
    TxnLog.append(spark, ut,
      Seq((100L, 0L)).toDF("k", "n").coalesce(1)) // non-matching row
    val b = Seq((1L, 1L)).toDF("k", "n")
    assert(TxnLog.upsertBatch(spark, ut, b, Seq("k"), "fencespec", 0L))
    assert(!TxnLog.upsertBatch(spark, ut, b, Seq("k"), "fencespec", 0L),
      "replayed degraded-path batch was not fenced")
    assert(TxnLog.read(spark, ut).count() === 2L)
    // an explicit partition layout survives Update mode from the
    // FIRST batch (empty table) through later upsert batches
    val pt = freshTable()
    val ckpt3 = Files.createTempDirectory("graft-updck3-").toString
    val in2 = MemoryStream[(Long, String)]
    def startP() = in2.toDF().toDF("k", "day")
      .groupBy($"k", $"day").agg(count(lit(1)).cast("long").as("n"))
      .writeStream.format("txnlog").outputMode("update")
      .option("path", pt.root.toString)
      .option("checkpointLocation", ckpt3)
      .option("mergeKeys", "k,day")
      .partitionBy("day")
      .start()
    val qp = startP()
    try {
      in2.addData((1L, "d1"), (2L, "d2"))
      qp.processAllAvailable()
      in2.addData((1L, "d1"))
      qp.processAllAvailable()
    } finally qp.stop()
    val ps = TxnLog.snapshot(pt)
    assert(ps.filePartitions.nonEmpty &&
      ps.liveFiles.forall(ps.filePartitions.contains),
      s"Update-mode sink lost the partition layout: ${ps.liveFiles}")
    assert(TxnLog.read(spark, pt).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      .toSeq === Seq((1L, "d1", 2L), (2L, "d2", 1L)))
  }

  test("txnlog: NOT NULL / CHECK constraints refuse violating writes atomically") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      Seq((1L, 10L, "a")).toDF("k", "v", "s").coalesce(1))
    // declaration validates EXISTING rows: a check the data already
    // violates refuses instead of poisoning every future rewrite
    TxnLog.addNotNull(spark, t, "s")
    TxnLog.addCheck(spark, t, "v_pos", "v >= 0")
    val badDecl = intercept[IllegalArgumentException] {
      TxnLog.addCheck(spark, t, "v_big", "v >= 100")
    }
    assert(badDecl.getMessage.contains("existing"))
    val badCol = intercept[IllegalArgumentException] {
      TxnLog.addNotNull(spark, t, "nope")
    }
    assert(badCol.getMessage.contains("nope"))
    // violating writes refuse ATOMICALLY: version and rows unchanged
    val v0 = TxnLog.latestVersion(t)
    val e1 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, Seq((2L, -5L, "b")).toDF("k", "v", "s"))
    }
    assert(e1.getMessage.contains("v_pos"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t,
        Seq((2L, 5L, null.asInstanceOf[String])).toDF("k", "v", "s"))
    }
    assert(e2.getMessage.contains("NOT NULL s"), e2.getMessage)
    // a write OMITTING the NOT NULL column (would null-fill) refuses
    val e3 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, Seq((2L, 5L)).toDF("k", "v"))
    }
    assert(e3.getMessage.contains("omits"), e3.getMessage)
    assert(TxnLog.latestVersion(t) === v0)
    assert(TxnLog.read(spark, t).count() === 1L)
    // UPDATE whose new images violate refuses; table unchanged
    val e4 = intercept[IllegalArgumentException] {
      TxnLog.update(spark, t,
        Map("v" -> org.apache.spark.sql.functions.lit(-1L)),
        org.apache.spark.sql.functions.lit(true))
    }
    assert(e4.getMessage.contains("v_pos"))
    assert(TxnLog.read(spark, t).head().getLong(1) === 10L)
    // a conditional MERGE whose inserts violate refuses too
    val e5 = intercept[IllegalArgumentException] {
      TxnLog.mergeInto(spark, t,
        Seq((9L, -9L, "x")).toDF("k", "v", "s"), "k",
        Seq(TxnLog.MergeClause.Insert(None)))
    }
    assert(e5.getMessage.contains("v_pos"))
    assert(TxnLog.latestVersion(t) === v0)
    // constraints survive a checkpoint; valid writes pass
    TxnLog.checkpoint(t, v0)
    TxnLog.append(spark, t, Seq((3L, 30L, "c")).toDF("k", "v", "s"))
    assert(TxnLog.read(spark, t).count() === 2L)
    // sink contract: a refused batch never advances the txn marker,
    // so the RETRIED batch with fixed data still lands
    assert(TxnLog.appendBatch(spark, t,
      Seq((4L, 40L, "d")).toDF("k", "v", "s"), "conspec", 0L))
    val e6 = intercept[IllegalArgumentException] {
      TxnLog.appendBatch(spark, t,
        Seq((5L, -50L, "e")).toDF("k", "v", "s"), "conspec", 1L)
    }
    assert(e6.getMessage.contains("v_pos"))
    assert(TxnLog.lastBatch(t, "conspec") === Some(0L),
      "refused batch advanced the txn marker")
    assert(TxnLog.appendBatch(spark, t,
      Seq((5L, 50L, "e")).toDF("k", "v", "s"), "conspec", 1L))
    assert(TxnLog.lastBatch(t, "conspec") === Some(1L))
    // SQL DDL forms + drop reopens the gate
    val p = t.root.toString
    spark.sql(s"ALTER TABLE txnlog.`$p` DROP CONSTRAINT v_pos")
    spark.sql(s"ALTER TABLE txnlog.`$p` ALTER COLUMN s DROP NOT NULL")
    TxnLog.append(spark, t,
      Seq((6L, -60L, null.asInstanceOf[String])).toDF("k", "v", "s"))
    assert(TxnLog.read(spark, t).count() === 5L)
    spark.sql(s"DELETE FROM txnlog.`$p` WHERE k = 6")
    spark.sql(s"ALTER TABLE txnlog.`$p` ADD CONSTRAINT v_cap CHECK (v < 100)")
    spark.sql(s"ALTER TABLE txnlog.`$p` ALTER COLUMN s SET NOT NULL")
    val e7 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT INTO txnlog.`$p` VALUES (7, 700, 'g')")
    }
    assert(e7.getMessage.contains("v_cap"))
    // RESTORE that re-adds rows a since-declared constraint forbids:
    // metadata-only refuses (needs a scan), the validating overload
    // refuses on the violation itself
    val rt = freshTable()
    TxnLog.append(spark, rt, Seq((1L, -5L)).toDF("k", "v").coalesce(1))
    val vBad = TxnLog.latestVersion(rt)
    TxnLog.delete(spark, rt, col("v") < 0L)
    TxnLog.addCheck(spark, rt, "v_pos", "v >= 0") // live rows clean
    val mo = intercept[IllegalStateException] {
      TxnLog.restore(rt, vBad)
    }
    assert(mo.getMessage.contains("metadata-only"), mo.getMessage)
    val va = intercept[IllegalArgumentException] {
      TxnLog.restore(spark, rt, vBad)
    }
    assert(va.getMessage.contains("v_pos"), va.getMessage)
    assert(TxnLog.read(spark, rt).count() === 0L, "refused restore mutated")
    // unknown drop refuses; non-txnlog targets delegate natively
    val e8 = intercept[IllegalArgumentException] {
      TxnLog.dropConstraint(t, "no_such")
    }
    assert(e8.getMessage.contains("no_such"))
    val nf = intercept[Exception] {
      spark.sql("ALTER TABLE graft_no_such_con DROP CONSTRAINT x")
    }
    assert(nf.getMessage.contains("graft_no_such_con") ||
      nf.getMessage.toLowerCase.contains("parse"), nf.getMessage)
  }

  test("txnlog: table_changes plans TWO scans for any range length, reaches commit 0, stamps _commit_timestamp") {
    import spark.implicits._
    val t = freshTable()
    for (i <- 0 until 25)
      TxnLog.append(spark, t,
        Seq((i.toLong, i.toLong)).toDF("k", "v").coalesce(1))
    TxnLog.delete(spark, t, col("k") === 5L)
    val latest = TxnLog.latestVersion(t)
    val df = TxnLog.tableChanges(spark, t, 0L, latest)
    // from = 0 is inclusive of the origin commit: its adds are the
    // first insert wave, so commit 0's changes are reachable
    val rows = df.collect()
    assert(rows.count(_.getString(2) == "insert") === 25)
    assert(rows.count(_.getString(2) == "delete") === 1)
    assert(rows.exists(r => r.getString(2) == "insert" &&
      r.getLong(3) == 0L), "commit 0's insert wave is missing")
    // per-commit attribution survives the join form
    assert(rows.filter(_.getString(2) == "insert")
      .map(r => (r.getLong(0), r.getLong(3))).toSet ===
      (0 until 25).map(i => (i.toLong, i.toLong)).toSet)
    // _commit_timestamp is stamped (version-file mtime) and ordered
    // with the versions
    assert(rows.forall(!_.isNullAt(4)))
    // the PLAN is two file scans + the broadcast maps — never a
    // branch pair per commit (the 26-commit range would have planned
    // 52 branches in the union form)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length <= 2, s"table_changes planned ${scans.length} scans")
  }

  test("txnlog: protocol gating — feature commits stamp the reader floor; a newer log refuses loudly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, 2L)).toDF("k", "v").coalesce(1))
    // a fresh table demands nothing special: no protocol line
    assert(!Files.readAllLines(t.logDir.resolve(f"${0L}%020d.log"))
      .asScala.exists(_.startsWith("protocol")))
    // column mapping changes read semantics: the rename commit bumps
    // the floor in the same atomic commit
    val vRen = TxnLog.renameColumn(t, "v", "w")
    assert(Files.readAllLines(t.logDir.resolve(f"$vRen%020d.log"))
      .asScala.contains("protocol\t2"))
    // this engine reads its own v2 tables fine
    assert(TxnLog.read(spark, t).columns.toSeq === Seq("k", "w"))
    // deletion vectors stamp it too
    val t2 = freshTable()
    TxnLog.append(spark, t2,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val vDv = TxnLog.deleteDv(spark, t2, col("k") === 3L)
    assert(Files.readAllLines(t2.logDir.resolve(f"$vDv%020d.log"))
      .asScala.contains("protocol\t2"))
    // a log stamped by a FUTURE feature refuses with a named upgrade
    // message instead of silently misreading it
    val vOk = TxnLog.latestVersion(t)
    TxnLog.commit(t, vOk, adds = Nil, extra = Seq("protocol\t9"))
    val boom = intercept[IllegalArgumentException] {
      TxnLog.snapshot(t)
    }
    assert(boom.getMessage.contains("reader version 9") &&
      boom.getMessage.contains("upgrade"), boom.getMessage)
    // time travel BELOW the bump keeps working — old versions never
    // needed the feature
    assert(TxnLog.read(spark, t, Some(vOk)).count() === 1L)
    // the floor rides checkpoints
    TxnLog.checkpoint(t2, vDv)
    assert(Files.readAllLines(t2.logDir.resolve(f"$vDv%020d.ckpt"))
      .asScala.contains("protocol\t2"))
  }

  test("txnlog: a declared PARTITIONED BY layout binds every write; probing reads no longer mint metadata") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.registerSchema(t,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, day STRING"), Seq("day"))
    assert(TxnLog.latestVersion(t) === 0L)
    assert(TxnLog.declaredPartCols(t) === Seq("day"))
    assert(TxnLog.snapshot(t).partCols === Seq("day"))
    // a FLAT append routes through the declared layout — the
    // declaration, not the first writer, decides the physical shape
    TxnLog.append(spark, t,
      Seq((1L, "d1"), (2L, "d2")).toDF("k", "day"))
    val snap = TxnLog.snapshot(t)
    assert(snap.filePartitions.values.flatMap(_.get("day")).toSet ===
      Set("d1", "d2"))
    // partition ops work from the declared layout
    assert(TxnLog.readPartition(spark, t, Map("day" -> "d1"))
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // a mismatched EXPLICIT layout refuses by name
    val bad = intercept[IllegalArgumentException] {
      TxnLog.appendPartitioned(spark, t,
        Seq((3L, "d3")).toDF("k", "day"), Seq("k"))
    }
    assert(bad.getMessage.contains("declared PARTITIONED BY"),
      bad.getMessage)
    // the declaration survives checkpoints + expiry
    for (i <- 0 until 10)
      TxnLog.append(spark, t, Seq((10L + i, "d1")).toDF("k", "day"))
    TxnLog.expireLog(t)
    assert(TxnLog.declaredPartCols(t) === Seq("day"))
    // undeclared partition columns in the schema refuse at CREATE
    val t2 = freshTable()
    val unk = intercept[IllegalArgumentException] {
      TxnLog.registerSchema(t2,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"),
        Seq("zzz"))
    }
    assert(unk.getMessage.contains("zzz"), unk.getMessage)
    // a probing schema-carrying READ of an empty location mints
    // NOTHING (the r16 side effect is gone): it fails loudly, and a
    // later CREATE defines the table instead of merging into an
    // accident. The explicit createIfAbsent option keeps the
    // programmatic define-on-read workflow.
    val probe = freshTable()
    val e = intercept[Exception] {
      spark.read.format("txnlog")
        .schema("k BIGINT").load(probe.root.toString).collect()
    }
    assert(e.getMessage.contains("empty transaction log"), e.getMessage)
    assert(TxnLog.latestVersion(probe) === -1L)
    spark.read.format("txnlog").schema("k BIGINT")
      .option("createIfAbsent", "true")
      .load(probe.root.toString)
    assert(TxnLog.latestVersion(probe) === 0L)
  }

  test("txnlog: startingTimestamp streams from the first commit at or after the instant") {
    import spark.implicits._
    val st = freshTable()
    (0 until 3).foreach(i =>
      TxnLog.append(spark, st, Seq(i.toLong).toDF("id").coalesce(1)))
    // pin distinct, known commit instants (append timing is too fine)
    val t0 = 1700000000000L
    for (v <- 0L to 2L)
      Files.setLastModifiedTime(st.logDir.resolve(f"$v%020d.log"),
        java.nio.file.attribute.FileTime.fromMillis(t0 + v * 60000L))
    val outRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txnlog")
      .option("path", st.root.toString)
      .option("startingTimestamp", (t0 + 120000L).toString)
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows.synchronized {
          outRows ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stck-").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(outRows.sorted.toSeq === Seq(2L),
      s"startingTimestamp delivered $outRows (wanted only v2's row)")
    // an instant past every retained commit waits for the future
    // instead of replaying skipped history
    val outRows2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("txnlog")
      .option("path", st.root.toString)
      .option("startingTimestamp", (t0 + 999999999L).toString)
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows2.synchronized {
          outRows2 ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stck2-").toString)
      .start()
    try {
      TxnLog.append(spark, st, Seq(42L).toDF("id").coalesce(1))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(outRows2.sorted.toSeq === Seq(42L),
      s"future startingTimestamp delivered $outRows2")
    // both options together refuse (the failure may surface at
    // start or on the stream thread — catch either)
    val both = intercept[Exception] {
      val q3 = spark.readStream.format("txnlog")
        .option("path", st.root.toString)
        .option("startingVersion", "1")
        .option("startingTimestamp", "0")
        .load().writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-stck3-").toString)
        .foreachBatch {
          (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(both.toString.contains("not both") ||
      Option(both.getCause).exists(_.toString.contains("not both")),
      both.toString)
    // EXPIRED history: a startingTimestamp that cannot prove it
    // postdates expired commits refuses instead of silently resolving
    // to the retained floor (the TVF's checked contract, now shared
    // by the stream path)
    TxnLog.checkpoint(st, 3L)
    assert(TxnLog.expireLog(st) > 0) // earliest retained is now v3
    val expd = intercept[Exception] {
      val q5 = spark.readStream.format("txnlog")
        .option("path", st.root.toString)
        .option("startingTimestamp", (t0 + 120000L).toString)
        .load().writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-stck5-").toString)
        .foreachBatch {
          (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try q5.processAllAvailable() finally q5.stop()
    }
    assert(expd.toString.contains("expired") ||
      Option(expd.getCause).exists(_.toString.contains("expired")),
      expd.toString)
  }

  test("txnlog: review regressions — dv commits conflict with compaction, encoded paths match, batch sinks honor declared layouts") {
    import spark.implicits._
    // (1) a compaction rebasing past a concurrent DELETION-VECTOR
    // commit on a compacted file must REFUSE — its staged output was
    // read dv-unaware and would resurrect the deleted rows
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.append(spark, t,
      (10L until 20L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val snap = TxnLog.snapshot(t)
    val f0 = snap.liveFiles.head
    // stage a fake compacted file, then let a dv commit interleave
    val stagePath = t.dataDir.resolve("fake-compact")
    (0L until 20L).map(i => (i, i)).toDF("k", "v").coalesce(1)
      .write.parquet(stagePath.toString)
    val addRel = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stagePath).iterator().asScala
        .find(_.toString.endsWith(".parquet"))
        .map(p => t.root.relativize(p).toString).get
    }
    TxnLog.deleteDv(spark, t, col("k") === 3L) // lands v2, dv on f0
    val boom = intercept[java.util.ConcurrentModificationException] {
      TxnLog.commit(t, snap.version, adds = Nil,
        removes = snap.liveFiles,
        extra = Seq(s"add\t$addRel", "cdc\tnone"),
        reconcileDisjoint = true)
    }
    assert(boom.getMessage.contains("rewrote read-set file"),
      boom.getMessage)
    // a dv commit on a DISJOINT file still commutes (append rebasing)
    val t1b = freshTable()
    TxnLog.append(spark, t1b,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val s1b = TxnLog.snapshot(t1b)
    val stage1b = t1b.dataDir.resolve("compact-1b")
    (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1)
      .write.parquet(stage1b.toString)
    val add1b = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stage1b).iterator().asScala
        .find(_.toString.endsWith(".parquet"))
        .map(p => t1b.root.relativize(p).toString).get
    }
    TxnLog.append(spark, t1b, Seq((99L, 99L)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, t1b, col("k") === 99L) // dv on the NEW file
    val v1b = TxnLog.commit(t1b, s1b.version, adds = Nil,
      removes = s1b.liveFiles,
      extra = Seq(s"add\t$add1b", "cdc\tnone"), reconcileDisjoint = true)
    assert(v1b > s1b.version)
    assert(TxnLog.read(spark, t1b).count() === 10L) // 99 stays deleted
    // (2) a table root with SPACES and PERCENTS: deletion vectors,
    // the locating scan and table_changes all key on Spark's
    // URL-ENCODED _metadata.file_path — a raw-path key would
    // silently serve the deleted row here
    val oddRoot = java.nio.file.Files
      .createTempDirectory("graft dv%odd-").resolve("t")
    val t2 = TxnLog.Table(oddRoot)
    TxnLog.append(spark, t2,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, t2, col("k") === 4L)
    assert(TxnLog.snapshot(t2).dvs.size === 1,
      "dv fell back to copy-on-write under an encoded path")
    assert(TxnLog.read(spark, t2).count() === 9L)
    assert(TxnLog.read(spark, t2).filter($"k" === 4L).count() === 0L)
    val tc = TxnLog.tableChanges(spark, t2, 0L, TxnLog.latestVersion(t2))
    assert(tc.filter($"_change_type" === "insert").count() === 10L)
    assert(tc.filter($"_change_type" === "delete").count() === 1L)
    // (3) appendBatch honors a declared layout: unspecified routes
    // through it, mismatched refuses
    val t3 = freshTable()
    TxnLog.registerSchema(t3,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, day STRING"), Seq("day"))
    TxnLog.appendBatch(spark, t3,
      Seq((1L, "d1")).toDF("k", "day"), "app1", 0L)
    val s3 = TxnLog.snapshot(t3)
    assert(s3.filePartitions.values.flatMap(_.get("day")).toSeq ===
      Seq("d1"), "batch did not stage through the declared layout")
    val bad3 = intercept[IllegalArgumentException] {
      TxnLog.appendBatch(spark, t3,
        Seq((2L, "d2")).toDF("k", "day"), "app1", 1L, Seq("k"))
    }
    assert(bad3.getMessage.contains("declared PARTITIONED BY"))
    // (4) history labels a dv-reconciling restore RESTORE, not DELETE
    val t4 = freshTable()
    TxnLog.append(spark, t4,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val v4 = TxnLog.latestVersion(t4)
    TxnLog.deleteDv(spark, t4, col("k") === 4L)
    TxnLog.restore(t4, v4)
    assert(TxnLog.history(t4).last._2 === "RESTORE",
      TxnLog.history(t4).toString)
  }

  test("txnlog: CREATE TABLE on an existing location refuses without IF NOT EXISTS; quoted-key OPTIONS parse") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-crex-").resolve("t")
    val p = root.toString
    val t = TxnLog.Table(root)
    TxnLog.append(spark, t, Seq((1L, 2L)).toDF("k", "v").coalesce(1))
    val boom = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE txnlog.`$p` (a STRING, b DOUBLE) " +
        "USING txnlog PARTITIONED BY (a)")
    }
    assert(boom.getMessage.contains("already exists"), boom.getMessage)
    // the schema/layout were NOT silently swallowed
    assert(TxnLog.registeredSchema(t).get.fieldNames.toSeq ===
      Seq("k", "v"))
    assert(TxnLog.declaredPartCols(t).isEmpty)
    // IF NOT EXISTS no-ops per the SQL contract
    spark.sql(s"CREATE TABLE IF NOT EXISTS txnlog.`$p` " +
      "(a STRING, b DOUBLE) USING txnlog")
    assert(TxnLog.registeredSchema(t).get.fieldNames.toSeq ===
      Seq("k", "v"))
    // the quoted-key OPTIONS spelling parses the path, not the '='
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-crq-").resolve("t")
    spark.sql("DROP TABLE IF EXISTS crq_cat")
    spark.sql(s"CREATE TABLE crq_cat (k BIGINT) USING txnlog " +
      s"OPTIONS ('path'='${root2.toString}')")
    try {
      assert(TxnLog.latestVersion(TxnLog.Table(root2)) === 0L)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get("=").toAbsolutePath.resolve("_txnlog")))
    } finally spark.sql("DROP TABLE IF EXISTS crq_cat")
  }

  test("txnlog: TBLPROPERTIES ride the log; graft.enableDeletionVectors routes SQL DML merge-on-read") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files
      .createTempDirectory("graft-props-").resolve("t")
    val p = root.toString
    val t = TxnLog.Table(root)
    TxnLog.append(spark, t,
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    // SET / SHOW / UNSET round-trip, one metadata commit each
    spark.sql(s"ALTER TABLE txnlog.`$p` SET TBLPROPERTIES " +
      "('graft.enableDeletionVectors' = 'true', 'owner' = 'team data')")
    assert(spark.sql(s"SHOW TBLPROPERTIES txnlog.`$p`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("graft.enableDeletionVectors", "true"), ("owner", "team data")))
    // SQL DELETE now commits merge-on-read: no data file rewritten
    val before = dataFiles(t)
    spark.sql(s"DELETE FROM txnlog.`$p` WHERE k = 7")
    assert(dataFiles(t) === before, "DV-routed DELETE rewrote a file")
    assert(TxnLog.snapshot(t).dvs.size === 1)
    assert(TxnLog.read(spark, t).count() === 99L)
    // SQL UPDATE too: old position dead, new image appended
    spark.sql(s"UPDATE txnlog.`$p` SET v = v * 10 WHERE k = 8")
    assert(before.subsetOf(dataFiles(t)),
      "DV-routed UPDATE rewrote a pre-existing file")
    assert(TxnLog.read(spark, t).filter($"k" === 8L)
      .head().getLong(1) === 80L)
    // DESCRIBE DETAIL surfaces the new metadata columns (while the
    // vector is live — the copy-on-write delete below clears it)
    spark.sql(s"ALTER TABLE txnlog.`$p` ADD CONSTRAINT v_ok " +
      "CHECK (v >= 0)")
    val d = spark.sql(s"DESCRIBE DETAIL txnlog.`$p`").head()
    assert(d.getLong(6) === 2L, "min_reader should be 2 after a DV")
    assert(d.getLong(7) >= 1L, "num_dv_files missing")
    assert(d.getString(8).contains("CHECK v_ok"), d.getString(8))
    assert(d.getString(9).contains("owner=team data"), d.getString(9))
    // UNSET switches back to copy-on-write — the rewrite of the
    // DV-carrying file MATERIALIZES its vector away
    spark.sql(s"ALTER TABLE txnlog.`$p` UNSET TBLPROPERTIES " +
      "('graft.enableDeletionVectors')")
    spark.sql(s"DELETE FROM txnlog.`$p` WHERE k = 9")
    assert(TxnLog.read(spark, t).count() === 98L)
    assert(TxnLog.snapshot(t).dvs.isEmpty)
    assert(!TxnLog.propertiesOf(t).contains("graft.enableDeletionVectors"))
    // properties survive checkpoints + expiry
    TxnLog.checkpoint(t, TxnLog.latestVersion(t))
    TxnLog.expireLog(t)
    assert(TxnLog.propertiesOf(t) ===
      Map("owner" -> "team data"), TxnLog.propertiesOf(t).toString)
    // a non-txnlog SET TBLPROPERTIES still runs Spark's native plan
    spark.sql("DROP TABLE IF EXISTS props_plain")
    spark.sql("CREATE TABLE props_plain (k BIGINT) USING parquet")
    try {
      spark.sql("ALTER TABLE props_plain SET TBLPROPERTIES ('a' = 'b')")
      assert(spark.sql("SHOW TBLPROPERTIES props_plain").collect()
        .exists(r => r.getString(0) == "a" && r.getString(1) == "b"))
    } finally spark.sql("DROP TABLE IF EXISTS props_plain")
    // a declaration racing first data refuses instead of silently
    // dropping the layout (registerSchema's lost-slot contract)
    val t2 = freshTable()
    TxnLog.append(spark, t2, Seq((1L, "d1")).toDF("k", "day"))
    val lost = intercept[IllegalStateException] {
      TxnLog.registerSchema(t2,
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, day STRING"), Seq("day"))
    }
    assert(lost.getMessage.contains("already has commits"),
      lost.getMessage)
  }

  test("txnlog: second-review regressions — empty property values, overwrite vs declared layout, CREATE tail scoping, startingTimestamp persistence") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // (1) an EMPTY property value must round-trip, not brick replay
    // (split('\t') drops the trailing empty token)
    val t = freshTable()
    TxnLog.append(spark, t, Seq((1L, 2L)).toDF("k", "v").coalesce(1))
    TxnLog.setProperties(t, Map("note" -> ""))
    assert(TxnLog.propertiesOf(t) === Map("note" -> ""))
    TxnLog.checkpoint(t, TxnLog.latestVersion(t))
    assert(TxnLog.propertiesOf(t) === Map("note" -> ""))
    assert(TxnLog.read(spark, t).count() === 1L)
    // a tab in an UNSET key refuses instead of corrupting the log
    val tabKey = intercept[IllegalArgumentException] {
      TxnLog.unsetProperties(t, Seq("a\tb"))
    }
    assert(tabKey.getMessage.contains("bad property key"))
    // (2) overwrite honors a declared layout: a flat DataFrame
    // overwrite stages THROUGH it, a mismatched explicit one refuses
    val t2 = freshTable()
    TxnLog.registerSchema(t2,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, day STRING"), Seq("day"))
    TxnLog.append(spark, t2, Seq((1L, "d1")).toDF("k", "day"))
    TxnLog.replace(spark, t2,
      Seq((2L, "d2"), (3L, "d3")).toDF("k", "day"))
    val s2 = TxnLog.snapshot(t2)
    assert(s2.filePartitions.values.flatMap(_.get("day")).toSet ===
      Set("d2", "d3"), "overwrite flattened the declared layout")
    val badOv = intercept[IllegalArgumentException] {
      TxnLog.replace(spark, t2, Seq((4L, "d4")).toDF("k", "day"),
        Seq("k"))
    }
    assert(badOv.getMessage.contains("declared PARTITIONED BY"))
    // (3) CREATE-tail scoping: a TBLPROPERTIES key ending in "path"
    // or a value containing "PARTITIONED BY (...)" cannot hijack the
    // location or the layout — only OPTIONS(path)/LOCATION and the
    // structural clause count
    val root3 = java.nio.file.Files
      .createTempDirectory("graft-scope-").resolve("t")
    spark.sql("DROP TABLE IF EXISTS scope_cat")
    spark.sql(s"CREATE TABLE scope_cat (k BIGINT, day STRING) " +
      "USING txnlog PARTITIONED BY (day) " +
      s"OPTIONS (path '${root3.toString}') " +
      "TBLPROPERTIES ('data.path' = '/mnt/graft-nope', " +
      "'comment' = 'not PARTITIONED BY (zzz) either')")
    try {
      val t3 = TxnLog.Table(root3)
      assert(TxnLog.latestVersion(t3) === 0L)
      assert(TxnLog.declaredPartCols(t3) === Seq("day"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get("/mnt/graft-nope")))
    } finally spark.sql("DROP TABLE IF EXISTS scope_cat")
    // (4) a FAILED native CREATE leaves no minted log behind: the
    // catalog pre-check routes an existing name to Spark's own error
    // before any registration
    spark.sql("DROP TABLE IF EXISTS crex_pq")
    spark.sql("CREATE TABLE crex_pq (k BIGINT) USING parquet")
    try {
      val dup = intercept[Exception] {
        spark.sql("CREATE TABLE crex_pq (k BIGINT) USING txnlog")
      }
      assert(dup.getMessage.toLowerCase.contains("exists"),
        dup.getMessage)
      val defLoc = spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("crex_pq"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(defLoc.getPath).resolve("_txnlog")),
        "failed CREATE minted a v0 log inside the existing table")
    } finally spark.sql("DROP TABLE IF EXISTS crex_pq")
    // (5) startingTimestamp persists its resolution under the
    // stream's metadata path — a restart BEFORE the first offset
    // commit must not re-resolve past commits that landed during
    // the outage
    val st = freshTable()
    TxnLog.append(spark, st, Seq(1L).toDF("id").coalesce(1))
    val meta = java.nio.file.Files
      .createTempDirectory("graft-stm-").toString
    val provider = new graft.sources.TxnLogStreamProvider()
    val futureTs = (System.currentTimeMillis() + 3600000L).toString
    val params = Map("path" -> st.root.toString,
      "startingTimestamp" -> futureTs)
    provider.createSource(spark.sqlContext, meta, None, "txnlog", params)
    val marker = java.nio.file.Paths.get(meta)
      .resolve("graft-starting-version")
    assert(java.nio.file.Files.exists(marker),
      "startingTimestamp resolution was not persisted")
    val resolved = java.nio.file.Files.readString(marker).trim
    TxnLog.append(spark, st, Seq(2L).toDF("id").coalesce(1))
    TxnLog.append(spark, st, Seq(3L).toDF("id").coalesce(1))
    provider.createSource(spark.sqlContext, meta, None, "txnlog", params)
    assert(java.nio.file.Files.readString(marker).trim === resolved,
      "restart re-resolved startingTimestamp past mid-outage commits")
  }

  test("txnlog: a VALIDATED dv-reconciling restore emits an exact change feed") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 10L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    val v1 = TxnLog.latestVersion(t)
    TxnLog.deleteDv(spark, t, col("k").isin(3L, 4L))
    val v2 = TxnLog.latestVersion(t)
    val schemaJson = TxnLog.registeredSchema(t).get.json
    // restore BELOW the DV with the validating overload (the path
    // SQL RESTORE takes): the resurrected rows arrive as exact
    // insert events — the CDF STREAM can resolve the commit from the
    // log instead of refusing it as unexplained
    TxnLog.restore(spark, t, v1)
    val v3 = TxnLog.latestVersion(t)
    assert(TxnLog.read(spark, t).count() === 10L)
    val (ins, del) = TxnLog.readChangeFeedBatch(spark, t, v2, v3,
      schemaJson)
    assert(ins.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L), "resurrected rows missing from the feed")
    assert(del.count() === 0L)
    // the audit labels the resurrection wave RESTORE (cdc inserts
    // with no adds — an UPDATE would carry new-image add lines)
    assert(TxnLog.history(t).find(_._1 == v3).map(_._2) ===
      Some("RESTORE"), TxnLog.history(t).toString)
    // restore FORWARD onto the DV: the newly-dead rows are exact
    // delete events
    TxnLog.restore(spark, t, v2)
    val v4 = TxnLog.latestVersion(t)
    assert(TxnLog.read(spark, t).count() === 8L)
    val (ins2, del2) = TxnLog.readChangeFeedBatch(spark, t, v3, v4,
      schemaJson)
    assert(del2.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L))
    assert(ins2.count() === 0L)
    // changes() resolves the whole range from the log too: applying
    // inserts then deletes converges to the v4 snapshot
    val (ci, cd) = TxnLog.changes(spark, t, v2, v4)
    assert(ci.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    assert(cd.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // the METADATA-ONLY overload keeps the loud unexplained contract
    // (no session to stage row events with): a CDF stream refuses
    TxnLog.restore(t, v1)
    val v5 = TxnLog.latestVersion(t)
    val loud = intercept[IllegalStateException] {
      TxnLog.readChangeFeedBatch(spark, t, v4, v5, schemaJson)
    }
    assert(loud.getMessage.contains("cdc info"), loud.getMessage)
    // a dv-RESURRECTION is a row re-add for constraint purposes: a
    // rollback must not smuggle rows a since-declared CHECK forbids
    // past the write-time gate — metadata-only refuses (needs a
    // scan), the validating overload refuses on the violation itself
    val tc = freshTable()
    TxnLog.append(spark, tc,
      Seq((1L, -5L), (2L, 7L)).toDF("k", "v").coalesce(1))
    val vBad = TxnLog.latestVersion(tc)
    TxnLog.deleteDv(spark, tc, col("v") < 0L)
    TxnLog.addCheck(spark, tc, "v_pos", "v >= 0") // live rows clean
    val mo = intercept[IllegalStateException] {
      TxnLog.restore(tc, vBad)
    }
    assert(mo.getMessage.contains("metadata-only"), mo.getMessage)
    val va = intercept[IllegalArgumentException] {
      TxnLog.restore(spark, tc, vBad)
    }
    assert(va.getMessage.contains("v_pos") &&
      va.getMessage.contains("resurrected"), va.getMessage)
    assert(TxnLog.read(spark, tc).count() === 1L,
      "refused dv restore mutated the table")
    // constraints already present AT the target version gate nothing
    // — the restored rows were live under them, so a constrained
    // table keeps its metadata-only dv rollback
    val tp = freshTable()
    TxnLog.append(spark, tp, Seq((1L, 5L)).toDF("k", "v").coalesce(1))
    TxnLog.addCheck(spark, tp, "v_ok", "v >= 0")
    val vOk = TxnLog.latestVersion(tp)
    TxnLog.deleteDv(spark, tp, col("k") === 1L)
    TxnLog.restore(tp, vOk) // metadata-only, pre-existing constraint
    assert(TxnLog.read(spark, tp).count() === 1L)
  }

  test("txnlog: a VALIDATED MIXED restore (file moves + vector deltas) feeds exact row events") {
    import spark.implicits._
    // the shape an OPTIMIZE interleaved with dv DML produces: the
    // restore must remove the compacted file (which carries its own
    // vector), re-add a file that carried a vector at the target
    // version, and re-add a clean file — previously cdc-unexplained,
    // now an exact feed under the validating overload
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.append(spark, t,
      (100L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, t, col("k") === 5L) // dv on file A
    val vTgt = TxnLog.latestVersion(t) // A(dv 5) + B live
    val schemaJson = TxnLog.registeredSchema(t).get.json
    TxnLog.compact(spark, t) // OPTIMIZE: one merged file, dvs gone
    TxnLog.deleteDv(spark, t, col("k") === 150L) // dv on merged file
    val vPre = TxnLog.latestVersion(t)
    assert(TxnLog.read(spark, t).count() === 198L)
    // metadata-only CANNOT express this feed: loud unexplained
    val tTwin = freshTable() // twin history for the metadata-only path
    TxnLog.append(spark, tTwin,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, tTwin, col("k") === 1L)
    val twinTgt = TxnLog.latestVersion(tTwin)
    TxnLog.compact(spark, tTwin)
    TxnLog.restore(tTwin, twinTgt) // metadata-only mixed restore
    val loud = intercept[IllegalStateException] {
      TxnLog.readChangeFeedBatch(spark, tTwin,
        TxnLog.latestVersion(tTwin) - 1, TxnLog.latestVersion(tTwin),
        TxnLog.registeredSchema(tTwin).get.json)
    }
    assert(loud.getMessage.contains("cdc info"), loud.getMessage)
    // the VALIDATING overload (SQL RESTORE) feeds exact events
    spark.sql(s"RESTORE TABLE txnlog.`${t.root}` TO VERSION AS OF $vTgt")
    val vNow = TxnLog.latestVersion(t)
    assert(TxnLog.read(spark, t).count() === 199L) // k150 back, k5 dead
    val (ins, del) = TxnLog.readChangeFeedBatch(spark, t, vPre, vNow,
      schemaJson)
    // delete events: the merged file's LIVE rows (not its dv-dead
    // k150); insert events: A's live rows (not its dv-dead k5) + all
    // of B — net effect exactly {k150} resurrected
    val insK = ins.collect().map(_.getLong(0)).sorted.toSeq
    val delK = del.collect().map(_.getLong(0)).sorted.toSeq
    assert(delK === (0L until 200L).filterNot(k => k == 5L || k == 150L),
      s"delete side off: ${delK.take(8)}... n=${delK.length}")
    assert(insK === (0L until 200L).filterNot(_ == 5L),
      s"insert side off: ${insK.take(8)}... n=${insK.length}")
    // changes() resolves the SAME events from the log (no snapshot-
    // diff fallback: the diff would be the 1-row net, not the feed)
    val (ci, cd) = TxnLog.changes(spark, t, vPre, vNow)
    assert(ci.collect().map(_.getLong(0)).sorted.toSeq === insK)
    assert(cd.collect().map(_.getLong(0)).sorted.toSeq === delK)
    // applying inserts then deletes converges to the restored state
    assert(TxnLog.read(spark, t, Some(vPre)).unionAll(ci).exceptAll(cd)
      .collect().map(_.getLong(0)).sorted.toSeq ===
      TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq)
    // the restored table still reads through A's restamped vector
    assert(TxnLog.read(spark, t).filter($"k" === 5L).count() === 0L)
    assert(TxnLog.snapshot(t).dvs.values.toSeq === Seq("5"))
  }

  test("txnlog: a CDF stream delivers deletion-vector DML as typed events and converges") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 6L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    val ckpt = Files.createTempDirectory("graft-dvcdf-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    val q = spark.readStream.format("txnlog")
      .option("path", t.root.toString)
      .option("readChangeFeed", "true")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got.add((r.getLong(0), r.getLong(1), r.getString(2)))); ()
      }.start()
    try {
      q.processAllAvailable()
      got.clear() // past the initial insert wave
      // a merge-on-read DELETE arrives as typed delete events — no
      // file was rewritten, the change files carry the rows
      TxnLog.deleteDv(spark, t, col("k") === 2L)
      // a merge-on-read UPDATE arrives as the (delete old, insert
      // new) pair — the new image is an appended data file the
      // commit references, never double-counted
      TxnLog.updateDv(spark, t, Map("v" -> (col("v") + 1L)),
        col("k") === 3L)
      q.processAllAvailable()
      assert(got.asScala.toSeq.sorted === Seq(
        (2L, 20L, "delete"), (3L, 30L, "delete"), (3L, 31L, "insert")),
        got.asScala.toSeq.sorted.toString)
      // compaction MATERIALIZES the vectors invisibly (cdc none)
      got.clear()
      TxnLog.compact(spark, t)
      q.processAllAvailable()
      assert(got.isEmpty, s"compaction leaked into the CDF: $got")
      assert(TxnLog.snapshot(t).dvs.isEmpty)
    } finally q.stop()
  }

  private def dataFiles(t: TxnLog.Table): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(t.root.resolve("data"))
    try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
      .map(p => t.root.relativize(p).toString).toSet
    finally s.close()
  }

  test("txnlog: deletion vectors — a one-row DELETE commits without rewriting any data file") {
    import spark.implicits._
    val t = freshTable()
    // three files, 100 rows each
    for (g <- 0 until 3)
      TxnLog.appendWithStats(spark,
        t, (g * 100 until (g + 1) * 100).map(i => (i.toLong, i.toLong * 10))
          .toDF("k", "v").coalesce(1), Seq("k"))
    val before = dataFiles(t)
    val vPre = TxnLog.latestVersion(t)
    // merge-on-read delete of ONE row
    TxnLog.deleteDv(spark, t, col("k") === 150L)
    assert(dataFiles(t) === before,
      "deleteDv rewrote a data file — the whole point is not to")
    val snap = TxnLog.snapshot(t)
    assert(snap.dvs.size === 1, snap.dvs.toString)
    assert(snap.dvs.values.head === "50") // row 150 is index 50 of file 2
    // reads agree with the copy-on-write twin
    assert(TxnLog.read(spark, t).count() === 299L)
    assert(TxnLog.read(spark, t).filter($"k" === 150L).count() === 0L)
    // time travel below the DV still shows the row
    assert(TxnLog.read(spark, t, Some(vPre))
      .filter($"k" === 150L).count() === 1L)
    // manifest pruning composes: the locating scan still prunes
    val (kept, total) = TxnLog.plannedFilesDml(t, col("k") === 150L)
    assert(kept === 1 && total === 3)
    // a second delete on the SAME file merges the vector
    TxnLog.deleteDv(spark, t, col("k").isin(151L, 152L))
    assert(TxnLog.snapshot(t).dvs.values.head === "50-52")
    assert(TxnLog.read(spark, t).count() === 297L)
    // a re-run of the same predicate is a no-op (the locating scan
    // reads through the vector — dead rows never match again)
    val vNow = TxnLog.latestVersion(t)
    assert(TxnLog.deleteDv(spark, t, col("k") === 150L) === vNow)
    // the change feed resolves the DV commits from the log
    val (ins, del) = TxnLog.changes(spark, t, vPre, vNow)
    assert(ins.count() === 0L)
    assert(del.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(150L, 151L, 152L))
    // the append-feed stream refuses a DV commit by default and
    // skips it under ignoreDeletes (it is a pure-delete commit)
    val boom = intercept[IllegalStateException] {
      TxnLog.appendFeed(t, vPre, vNow, ignoreDeletes = false)
    }
    assert(boom.getMessage.contains("row-level deletes"), boom.getMessage)
    assert(TxnLog.appendFeed(t, vPre, vNow, ignoreDeletes = true).isEmpty)
    // OPTIMIZE materializes the vector away
    TxnLog.compact(spark, t)
    val after = TxnLog.snapshot(t)
    assert(after.dvs.isEmpty)
    assert(TxnLog.read(spark, t).count() === 297L)
    // history labels the DV commits as DELETE
    assert(TxnLog.history(t).map(_._2).count(_ == "DELETE") >= 2)
  }

  test("txnlog: deletion-vector UPDATE appends new images; heavy files fall back to copy-on-write") {
    import spark.implicits._
    val t = freshTable()
    for (g <- 0 until 2)
      TxnLog.append(spark, t,
        (g * 100 until (g + 1) * 100).map(i => (i.toLong, i.toLong))
          .toDF("k", "v").coalesce(1))
    val before = dataFiles(t)
    val vPre = TxnLog.latestVersion(t)
    // merge-on-read UPDATE of one row: old position dead, new image
    // appended — no pre-existing file rewritten
    TxnLog.updateDv(spark, t, Map("v" -> (col("v") * 100)),
      col("k") === 7L)
    assert(before.subsetOf(dataFiles(t)),
      "updateDv rewrote a pre-existing data file")
    assert(TxnLog.snapshot(t).dvs.size === 1)
    assert(TxnLog.read(spark, t).filter($"k" === 7L)
      .head().getLong(1) === 700L)
    assert(TxnLog.read(spark, t).count() === 200L)
    // CDF: the standard (delete old, insert new) pair
    val (ins, del) = TxnLog.changes(spark, t, vPre, TxnLog.latestVersion(t))
    assert(ins.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((7L, 700L)))
    assert(del.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((7L, 7L)))
    // history labels it UPDATE
    assert(TxnLog.history(t).map(_._2).contains("UPDATE"))
    // ABOVE the per-file threshold the file rewrites copy-on-write in
    // the same commit shape (no vector bigger than its file)
    val t2 = freshTable()
    TxnLog.append(spark, t2,
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val f2 = dataFiles(t2)
    TxnLog.deleteDv(spark, t2, col("k") < 50L, maxDvRowsPerFile = 10L)
    assert(TxnLog.snapshot(t2).liveFiles.toSet.intersect(f2) === Set.empty,
      "heavy file was not rewritten out of the live set")
    assert(TxnLog.snapshot(t2).dvs.isEmpty)
    assert(TxnLog.read(spark, t2).count() === 50L)
    // compactSmall PURGES a lone DV-carrying file regardless of size
    val t3 = freshTable()
    TxnLog.append(spark, t3,
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, t3, col("k") === 5L)
    assert(TxnLog.snapshot(t3).dvs.size === 1)
    TxnLog.compactSmall(spark, t3, minFileBytes = 1L)
    assert(TxnLog.snapshot(t3).dvs.isEmpty)
    assert(TxnLog.read(spark, t3).count() === 99L)
  }

  test("txnlog: deletion vectors survive checkpoints, restore below the DV resurrects, partitioned tables compose") {
    import spark.implicits._
    val t = freshTable()
    TxnLog.appendPartitioned(spark, t,
      Seq((1L, "d1"), (2L, "d1"), (3L, "d2"), (4L, "d2"))
        .toDF("k", "day").coalesce(1), Seq("day"))
    val vPre = TxnLog.latestVersion(t)
    TxnLog.deleteDv(spark, t, col("k") === 3L)
    val vDv = TxnLog.latestVersion(t)
    // partitioned read reconstitutes columns AND drops the dead row
    assert(TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "d1"), (2L, "d1"), (4L, "d2")))
    assert(TxnLog.readPartition(spark, t, Map("day" -> "d2"))
      .collect().map(_.getLong(0)).toSeq === Seq(4L))
    // the vector rides a checkpoint + log expiry
    TxnLog.checkpoint(t, vDv)
    TxnLog.expireLog(t)
    assert(TxnLog.snapshot(t).dvs.size === 1)
    assert(TxnLog.read(spark, t).count() === 3L)
    // RESTORE below the DV resurrects the row in one metadata commit
    // (the dv line clears); the commit carries no cdc refs, so
    // changes() resolves it through the exact snapshot diff
    TxnLog.restore(t, vDv) // no-op: same state
    assert(TxnLog.latestVersion(t) === vDv)
    TxnLog.checkpoint(t, vDv) // vPre is expired; restore needs it
    val t4 = freshTable()
    TxnLog.append(spark, t4,
      (0L until 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val v0 = TxnLog.latestVersion(t4)
    TxnLog.deleteDv(spark, t4, col("k") === 4L)
    assert(TxnLog.read(spark, t4).count() === 9L)
    TxnLog.restore(t4, v0)
    assert(TxnLog.snapshot(t4).dvs.isEmpty)
    assert(TxnLog.read(spark, t4).count() === 10L)
    val (rIns, rDel) = TxnLog.changes(spark, t4, v0 + 1,
      TxnLog.latestVersion(t4))
    assert(rIns.collect().map(_.getLong(0)).toSeq === Seq(4L))
    assert(rDel.count() === 0L)
  }

  test("txnlog: merge-on-read MERGE — one matched row rewrites no file, COW parity holds, CDF pinned") {
    import spark.implicits._
    // TWIN tables with identical 3-file content; one opts into
    // merge-on-read via the SQL property switch. The SAME statement
    // runs on both — results, live row sets and CDF events must agree
    // exactly (the copy-on-write parity contract).
    def seed(t: TxnLog.Table): Unit =
      for (g <- 0 until 3)
        TxnLog.append(spark, t,
          (g * 100 until (g + 1) * 100)
            .map(i => (i.toLong, i.toLong, s"s$i"))
            .toDF("k", "v", "s").coalesce(1))
    val cow = freshTable()
    val mor = freshTable()
    seed(cow); seed(mor)
    TxnLog.setProperties(mor,
      Map("graft.enableDeletionVectors" -> "true"))
    Seq((150L, 9999L, "upd"), (500L, 1L, "new"), (42L, -1L, "gone"))
      .toDF("k", "v", "s").createOrReplaceTempView("mor_src")
    val stmt = (p: java.nio.file.Path) =>
      s"""MERGE INTO txnlog.`$p` t USING mor_src s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, s = s.s
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val vPreCow = TxnLog.latestVersion(cow)
    val vPreMor = TxnLog.latestVersion(mor)
    val morBefore = dataFiles(mor)
    val morLiveBefore = TxnLog.snapshot(mor).liveFiles.toSet
    spark.sql(stmt(cow.root))
    spark.sql(stmt(mor.root))
    // the merge-on-read side rewrote NOTHING: every pre-existing
    // data file is still on disk AND still live (new-image/insert
    // files append alongside); the COW side rewrote its two touched
    // files
    assert(morBefore.subsetOf(dataFiles(mor)),
      "merge-on-read MERGE rewrote a pre-existing data file")
    assert(morLiveBefore.subsetOf(TxnLog.snapshot(mor).liveFiles.toSet),
      "merge-on-read MERGE removed a live file from the manifest")
    // touched rows 150 (file 1, index 50) and 42 (file 0, index 42)
    // dead-list via vectors; the UNtouched file 2 carries none
    val dvs = TxnLog.snapshot(mor).dvs
    assert(dvs.size === 2, dvs.toString)
    assert(dvs.values.toSet === Set("50", "42"), dvs.toString)
    // copy-on-write parity: identical row sets
    def all(t: TxnLog.Table) = TxnLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(all(mor) === all(cow))
    assert(TxnLog.read(spark, mor).count() === 300L) // -1 del, +1 ins
    assert(TxnLog.read(spark, mor).filter($"k" === 150L)
      .head().getLong(1) === 9999L)
    // CDF parity: both sides feed (delete old images, insert new
    // images + accepted inserts) — same events, resolved from the log
    def cdf(t: TxnLog.Table, vPre: Long) = {
      val (ins, del) = TxnLog.changes(spark, t, vPre,
        TxnLog.latestVersion(t))
      (ins.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
        del.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    assert(cdf(mor, vPreMor) === cdf(cow, vPreCow))
    assert(cdf(mor, vPreMor)._2 === Seq((42L, 42L), (150L, 150L)))
    // the locating scan reads THROUGH the new vectors: re-running the
    // same merge now routes 150 to UPDATE again (its new image is
    // live) but never resurrects 42
    assert(TxnLog.read(spark, mor).filter($"k" === 42L).count() === 0L)
    // HEAVY fallback per file: a merge touching more rows than the
    // row cap in one file rewrites that file copy-on-write in the
    // same commit — and ONLY that file
    val t2 = freshTable()
    seed(t2)
    val live2 = TxnLog.snapshot(t2).liveFiles
    val bigSrc = (100L until 200L).map(i => (i, -i, "x"))
      .toDF("k", "v", "s")
    TxnLog.mergeIntoKeys(spark, t2, bigSrc, Seq("k"),
      Seq(TxnLog.MergeClause.Update(None, Map("v" -> col("s.v")))),
      dvCaps = Some((10L, 65536L)))
    val snap2 = TxnLog.snapshot(t2)
    assert(snap2.dvs.isEmpty, "heavy file still carries a vector")
    assert(!snap2.liveFiles.contains(live2(1)),
      "heavy file was not rewritten out of the live set")
    assert(snap2.liveFiles.contains(live2(0)) &&
      snap2.liveFiles.contains(live2(2)),
      "an untouched file was rewritten")
    assert(TxnLog.read(spark, t2).filter($"v" < 0L).count() === 100L)
    // history labels the row-rewrite (a NO-remove dv merge shares the
    // dv UPDATE's action shape — dv + cdc pairs + new-image adds)
    assert(TxnLog.history(mor).map(_._2)
      .exists(op => op == "MERGE" || op == "UPDATE"))
    // the streaming Update-mode sink routes merge-on-read too: an
    // exactly-once keyed upsert on the dv-enabled table rewrites no
    // pre-existing file (the highest-frequency writer stops paying
    // per-file rewrites), and the fence still holds on replay
    val filesB4 = dataFiles(mor)
    val liveB4 = TxnLog.snapshot(mor).liveFiles.toSet
    assert(TxnLog.upsertBatch(spark, mor,
      Seq((150L, 5L, "sink")).toDF("k", "v", "s"), Seq("k"),
      "mdvapp", 0L))
    assert(filesB4.subsetOf(dataFiles(mor)),
      "dv-routed upsertBatch rewrote a pre-existing data file")
    assert(liveB4.subsetOf(TxnLog.snapshot(mor).liveFiles.toSet),
      "dv-routed upsertBatch removed a live file")
    assert(TxnLog.read(spark, mor).filter($"k" === 150L)
      .head().getLong(1) === 5L)
    assert(!TxnLog.upsertBatch(spark, mor,
      Seq((150L, 6L, "replay")).toDF("k", "v", "s"), Seq("k"),
      "mdvapp", 0L), "replayed batch was not fenced")
    assert(TxnLog.read(spark, mor).filter($"k" === 150L)
      .head().getLong(1) === 5L)
  }

  test("txnlog: dv split scan — the clean file scans bare with pushdown; only the dv file pays the anti-join") {
    import spark.implicits._
    val t = freshTable()
    for (g <- 0 until 2)
      TxnLog.append(spark, t,
        (g * 100 until (g + 1) * 100).map(i => (i.toLong, i.toLong))
          .toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, t, col("k") === 150L) // dv on file 2 only
    val df = TxnLog.read(spark, t).filter(col("k") > 10L)
    assert(df.count() === 188L) // 200 - 11 low keys - 1 dead
    val plan = df.queryExecution.sparkPlan
    val allScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    // exactly one anti-join (the dv probe), exactly two file scans
    // (the split), and the probe sits above exactly ONE of them — a
    // regression that routes every file through the probe branch
    // would put both scans under the join
    assert(joins.length === 1, s"want exactly one dv anti-join:\n$plan")
    assert(joins.head.joinType.toString == "LeftAnti",
      joins.head.joinType.toString)
    assert(allScans.length === 2, s"want the split's two scans:\n$plan")
    val probeScans = joins.head.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(probeScans.length === 1,
      s"only the dv-carrying file pays the row-index probe:\n$plan")
    // the clean subtree is a bare pushdown scan with no join above it
    val clean = allScans.filterNot(sc => probeScans.exists(_ eq sc))
    assert(clean.length === 1)
    assert(clean.head.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThan(k,10")),
      s"clean branch lost filter pushdown: ${clean.head.metadata}")
    // the dirty branch pushes the filter too (the probe is ABOVE a
    // real parquet scan, not a row-at-a-time wrapper)
    assert(probeScans.head.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThan(k,10")),
      s"probe branch lost filter pushdown: ${probeScans.head.metadata}")
  }

  test("txnlog: DML auto-retry — rewrites racing blind appends commit without user retry; overlapping rewrites and metadata shifts refuse") {
    import spark.implicits._
    // (1) a dv DELETE racing an append reconciles and commits — the
    // write-serializable contract: the interloper's new file was
    // never in the delete's read set
    val t = freshTable()
    TxnLog.append(spark, t, Seq(1L, 2L, 3L).toDF("id").coalesce(1))
    val stale0 = TxnLog.snapshot(t) // v0
    TxnLog.append(spark, t, Seq(10L).toDF("id").coalesce(1)) // v1 races
    val v = TxnLog.deleteDv(spark, t, col("id") === 2L,
      snap0 = Some(stale0))
    assert(v === 2L, s"dv delete did not rebase past the append (v$v)")
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 3L, 10L))
    // (2) the copy-on-write shapes reconcile the same way
    val stale1 = TxnLog.snapshot(t)
    TxnLog.append(spark, t, Seq(20L).toDF("id").coalesce(1)) // races
    TxnLog.delete(spark, t, col("id") === 3L, snap0 = Some(stale1))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 10L, 20L))
    val stale2 = TxnLog.snapshot(t)
    TxnLog.append(spark, t, Seq(30L).toDF("id").coalesce(1)) // races
    TxnLog.update(spark, t, Map("id" -> lit(11L)),
      col("id") === 10L, snap0 = Some(stale2))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 11L, 20L, 30L))
    // (3) a MERGE races an append the same way (unfenced only — the
    // streaming upsert sink keeps its outer fence-rechecking loop)
    val stale3 = TxnLog.snapshot(t)
    TxnLog.append(spark, t, Seq(40L).toDF("id").coalesce(1)) // races
    TxnLog.mergeIntoKeys(spark, t, Seq(1L).toDF("id"), Seq("id"),
      Seq(TxnLog.MergeClause.Delete(None)), snap0 = Some(stale3))
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(11L, 20L, 30L, 40L))
    // (4) two OVERLAPPING rewrites still refuse: the interloper
    // rewrote a file in this statement's read set
    val stale4 = TxnLog.snapshot(t)
    TxnLog.delete(spark, t, col("id") === 11L) // rewrites a read file
    val boom = intercept[java.util.ConcurrentModificationException] {
      TxnLog.delete(spark, t, col("id") === 20L, snap0 = Some(stale4))
    }
    assert(boom.getMessage.contains("read-set file"), boom.getMessage)
    // (5) a concurrent METADATA change (new constraint) refuses too:
    // the staged rewrite was never enforced against it
    val stale5 = TxnLog.snapshot(t)
    TxnLog.addNotNull(spark, t, "id")
    val meta = intercept[java.util.ConcurrentModificationException] {
      TxnLog.delete(spark, t, col("id") === 20L, snap0 = Some(stale5))
    }
    assert(meta.getMessage.contains("table metadata"), meta.getMessage)
    // the refusals lost nothing: state is exactly the two survivors
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(20L, 30L, 40L))
    // (6) a row-changing interloper on a DISJOINT file still refuses:
    // its ADDS may have moved rows into this statement's predicate
    // scope, which no file-set check can see (an UPDATE elsewhere
    // could re-key a row to match the racing DELETE's predicate)
    val t6 = freshTable()
    TxnLog.appendWithStats(spark, t6,
      (Seq(1L, 2L, 3L) ++ Seq(1000L, 1001L)).toDF("id")
        .repartitionByRange(2, col("id")), Seq("id"))
    val stale6 = TxnLog.snapshot(t6)
    // interloper rewrites the HIGH file — outside the delete's
    // stats-pruned read set
    TxnLog.update(spark, t6, Map("id" -> lit(1050L)),
      col("id") === 1000L)
    val rowCh = intercept[java.util.ConcurrentModificationException] {
      TxnLog.delete(spark, t6, col("id") < 100L, snap0 = Some(stale6))
    }
    assert(rowCh.getMessage.contains("row-changing"), rowCh.getMessage)
    // (7) the commute key is the DEDICATED `rowstate unchanged`
    // declaration, not the `cdc none` feed marker: an adversarial
    // interloper stamping `cdc none` while REWRITING ROWS (a marker
    // a future op could plausibly emit for feed-visibility reasons)
    // must refuse against a predicate statement — miscommuting here
    // would let the interloper's new rows slip into the predicate's
    // scope unseen
    val t7 = freshTable()
    TxnLog.appendWithStats(spark, t7,
      (Seq(1L, 2L, 3L) ++ Seq(1000L, 1001L)).toDF("id")
        .repartitionByRange(2, col("id")), Seq("id"))
    val stale7 = TxnLog.snapshot(t7)
    val hi = stale7.liveFiles.find(rel =>
      stale7.fileStats(rel)("id")._1 >= 1000L).get
    // the masquerader: rewrites the HIGH file (disjoint from the
    // racing delete's read set) into a re-keyed twin, stamping the
    // feed marker but — honestly — no rowstate declaration
    import scala.jdk.CollectionConverters._
    val twinStage = t7.root.resolve("data").resolve("twin")
    Seq(7L).toDF("id").coalesce(1).write.parquet(twinStage.toString)
    val twin = Files.list(twinStage).iterator().asScala
      .map(p => t7.root.relativize(p).toString)
      .find(_.endsWith(".parquet")).get
    TxnLog.commit(t7, stale7.version, adds = Seq(twin),
      removes = Seq(hi), extra = Seq("cdc\tnone"))
    val masq = intercept[java.util.ConcurrentModificationException] {
      TxnLog.deleteDv(spark, t7, col("id") < 100L, snap0 = Some(stale7))
    }
    assert(masq.getMessage.contains("row-changing"), masq.getMessage)
    // ...while a GENUINE logical no-op (partition-scoped OPTIMIZE of
    // a disjoint partition — the one emit point that stamps the
    // declaration) commutes with the same racing predicate
    val t8 = freshTable()
    TxnLog.appendPartitioned(spark, t8,
      Seq((1L, "a"), (2L, "a"), (10L, "b"), (11L, "b"), (12L, "b"))
        .toDF("id", "p").repartitionByRange(3, col("id")), Seq("p"),
      statsCols = Seq("id"))
    val stale8 = TxnLog.snapshot(t8)
    TxnLog.compactPartition(spark, t8, Map("p" -> "b")) // races, no-op
    val v8 = TxnLog.deleteDv(spark, t8, col("id") === 2L,
      snap0 = Some(stale8))
    assert(v8 === stale8.version + 2,
      s"predicate DML did not rebase past the compaction (v$v8)")
    assert(TxnLog.read(spark, t8).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 10L, 11L, 12L))
  }

  test("txnlog: a scattered delete past the encoded-size cap lands a SIDECAR — no rewrite, exact reads, bounded log; vacuum collects orphans") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = freshTable()
    TxnLog.append(spark, t,
      (0L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val before = dataFiles(t)
    // adversarial scatter: every other row dies. 100 single-index
    // ranges would encode to ~400 chars — past a 64-byte cap the
    // vector lands as a SIDECAR file referenced by an `@` token (the
    // old fallback rewrote the whole data file copy-on-write)
    TxnLog.deleteDv(spark, t, col("k") % 2L === 1L,
      maxDvBytesPerFile = 64L)
    val snap = TxnLog.snapshot(t)
    assert(snap.dvs.size === 1 &&
      snap.dvs.values.head.startsWith("@_dv/"),
      s"scattered delete did not land a sidecar ref: ${snap.dvs}")
    assert(dataFiles(t) === before,
      "sidecar-eligible scattered delete rewrote a data file")
    assert(TxnLog.read(spark, t).count() === 100L)
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).forall(
      _ % 2L == 0L), "sidecar vector served dead rows")
    // the sidecar itself decodes to the full dead set; every LOG line
    // stays below the byte cap (the point of the sidecar) and the
    // commit demands v3 readers
    val ranges = TxnLog.dvRanges(t, snap.dvs.values.head)
    assert(ranges.length === 100 && ranges.forall(r => r._1 == r._2))
    val dvLogLines = Files.list(t.logDir).iterator().asScala
      .filter(_.toString.endsWith(".log"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.startsWith("dv\t")).toSeq
    assert(dvLogLines.forall(_.split('\t')(2).length < 64L),
      s"a log line carries an over-cap vector token:\n" +
        dvLogLines.map(_.take(100)).mkString("\n"))
    assert(snap.minReader === 3L, s"sidecar commit floor: ${snap.minReader}")
    // checkpoints carry the tiny ref, not the vector; time travel and
    // CDF through the sidecar version replay exactly
    TxnLog.checkpoint(t, TxnLog.latestVersion(t))
    assert(TxnLog.read(spark, t).count() === 100L)
    assert(TxnLog.read(spark, t, Some(0L)).count() === 200L)
    // a restore BELOW the sidecar resurrects the rows (dv cleared)
    val preRestore = TxnLog.latestVersion(t)
    TxnLog.restore(spark, t, 0L)
    assert(TxnLog.read(spark, t).count() === 200L)
    TxnLog.restore(spark, t, preRestore) // back: ref restamps, exact
    assert(TxnLog.read(spark, t).count() === 100L)
    // vacuum: an ORPHANED sidecar (no retained ref) is reclaimed,
    // the referenced one survives — and DRY RUN (vacuumCandidates)
    // lists exactly what vacuum will delete, sidecars included
    val orphan = TxnLog.writeDvSidecar(t, "0-1")
    val dryRun = TxnLog.vacuumCandidates(t, graceMs = 0L)
    assert(dryRun.contains(orphan),
      s"DRY RUN omitted the orphan sidecar: $dryRun")
    assert(!dryRun.contains(snap.dvs.values.head.substring(1)),
      "DRY RUN listed a retained-referenced sidecar")
    assert(TxnLog.vacuum(t, graceMs = 0L) >= 1)
    assert(!Files.exists(t.root.resolve(orphan)), "orphan survived")
    assert(Files.exists(t.root.resolve(
      snap.dvs.values.head.substring(1))), "referenced sidecar died")
    assert(TxnLog.read(spark, t).count() === 100L)
    // the ROW cap still routes copy-on-write: the read-side anti-join
    // cost is bounded by rows, which a sidecar would not help
    val tr = freshTable()
    TxnLog.append(spark, tr,
      (0L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val beforeR = dataFiles(tr)
    TxnLog.deleteDv(spark, tr, col("k") % 2L === 1L,
      maxDvRowsPerFile = 10L)
    assert(TxnLog.snapshot(tr).dvs.isEmpty,
      "row-heavy delete stamped a vector")
    assert(TxnLog.snapshot(tr).liveFiles.toSet
      .intersect(beforeR) === Set.empty,
      "row-heavy file was not rewritten")
    assert(TxnLog.read(spark, tr).count() === 100L)
    // ...and the row cap bounds the MERGED vector, not just one
    // statement's slice: trickle deletes accumulate per file, and
    // unbounded accumulation is unbounded anti-join work on every
    // later read — the delete that pushes the merged vector past the
    // cap rewrites the file copy-on-write, materializing it away
    val ta = freshTable()
    TxnLog.append(spark, ta,
      (0L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    TxnLog.deleteDv(spark, ta, col("k") < 30L, maxDvRowsPerFile = 50L)
    assert(TxnLog.snapshot(ta).dvs.nonEmpty, "first slice not light")
    val beforeA = TxnLog.snapshot(ta).liveFiles.toSet
    TxnLog.deleteDv(spark, ta,
      col("k") >= 30L && col("k") < 60L, maxDvRowsPerFile = 50L)
    assert(TxnLog.snapshot(ta).dvs.isEmpty,
      "accumulated over-cap vector was not materialized away")
    assert(TxnLog.snapshot(ta).liveFiles.toSet
      .intersect(beforeA) === Set.empty,
      "merged-cap overflow did not rewrite the file")
    assert(TxnLog.read(spark, ta).count() === 140L)
    // the CONTIGUOUS twin of the same row count stays a light vector
    // under the same cap: one range — the ENCODING decides, not rows
    val t2 = freshTable()
    TxnLog.append(spark, t2,
      (0L until 200L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val f2 = dataFiles(t2)
    TxnLog.deleteDv(spark, t2, col("k") < 100L, maxDvBytesPerFile = 64L)
    assert(dataFiles(t2) === f2,
      "contiguous light delete rewrote a data file")
    assert(TxnLog.snapshot(t2).dvs.values.toSeq === Seq("0-99"))
    assert(TxnLog.read(spark, t2).count() === 100L)
    // a light pure DELETE runs exactly TWO jobs: one locating pass
    // (run-length ranges off the persisted scan) and the cdc
    // old-image write off the cache — the former two-pass locate
    // (counts, then indices) re-ran the predicate scan per pass
    val t3 = freshTable()
    TxnLog.append(spark, t3,
      (0L until 100L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val sc = spark.sparkContext
    sc.setJobGroup("graft-dv-locate", "dv locate job count", false)
    try TxnLog.deleteDv(spark, t3, col("k") === 5L)
    finally sc.clearJobGroup()
    def jobs(): Int =
      sc.statusTracker.getJobIdsForGroup("graft-dv-locate").length
    // the status store drains async: poll to a stable count
    val deadline = System.nanoTime + 10000000000L
    var n = jobs()
    var stable = 0
    while (stable < 3 && System.nanoTime < deadline) {
      Thread.sleep(100)
      val m = jobs()
      if (m == n) stable += 1 else { n = m; stable = 0 }
    }
    assert(n === 2, s"light dv DELETE ran $n jobs (want locate + cdc write)")
    assert(TxnLog.read(spark, t3).count() === 99L)
  }
}
