package graft.sources

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal ACID commit log for a parquet table directory — the
  * lakehouse transaction layer (snapshot isolation, time travel,
  * optimistic concurrency, compaction, vacuum) expressed against the
  * filesystem's atomic-namespace contract, the same primitive the
  * reference's job commit protocol serializes on (reference:
  * hadoop-mapreduce-project/.../output/FileOutputCommitter.java:1
  * rename-based commit; hadoop-common/.../fs/FileSystem.java:1
  * atomic create/rename semantics).
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>/part-*.parquet   -- immutable data files
  *   <root>/_txnlog/%020d.log            -- one action log per version
  * }}}
  *
  * A version file holds one tab-separated action per line
  * (`add <relpath>` / `remove <relpath>`), the analog of Delta Lake's
  * JSON action lines. A version COMMITS by hard-linking a fully
  * written temp file to its version-numbered name:
  * `Files.createLink` is a single atomic syscall that fails with
  * EEXIST when the slot is taken, so (a) exactly one writer wins each
  * version, (b) a version name never exists with partial content, and
  * (c) the log is dense and gap-free — a reader listing `_txnlog` can
  * never observe version N without every version below it. On HDFS
  * the same step is `create(path, overwrite=false)`; on an object
  * store, put-if-absent.
  *
  * Concurrency rules (optimistic): blind APPENDS retry into the next
  * slot — they conflict with nothing. Commits carrying REMOVES
  * (compaction, deletes) validated their read set at snapshot time,
  * so if any commit landed since, the rewrite is stale and aborts
  * with ConcurrentModificationException rather than resurrecting or
  * double-deleting rows.
  *
  * 100 TB posture: the log is metadata-scale (file lists, not data);
  * a snapshot read plans from the live-file manifest — no directory
  * listing of the data tree, no eventual-consistency exposure — and
  * commit coordination is O(1) regardless of table size.
  */
object TxnLog {

  /** `fileStats`: per live file, per column, the (min, max) embedded
    * in its add action — the manifest's data-skipping index. Files
    * added without stats (plain appends, compaction rewrites) simply
    * never prune: conservative, always correct. */
  final case class Snapshot(version: Long, liveFiles: Seq[String],
      fileStats: Map[String, Map[String, (Long, Long)]] = Map.empty)

  /** A table rooted at `root` (created if absent). */
  final case class Table(root: Path) {
    val logDir: Path = root.resolve("_txnlog")
    val dataDir: Path = root.resolve("data")
    Files.createDirectories(logDir)
    Files.createDirectories(dataDir)
  }

  private def versionOf(p: Path): Long = {
    val n = p.getFileName.toString
    n.stripSuffix(".log").toLong
  }

  /** Drain a directory stream EAGERLY and close it — Files.list/walk
    * hold an open directory fd until closed, and the log is listed on
    * every snapshot/latestVersion/lastBatch call, so an unclosed
    * stream here would leak fds for the life of the JVM. */
  private def listing(stream: java.util.stream.Stream[Path]): Seq[Path] =
    try stream.iterator().asScala.toSeq finally stream.close()

  private def versionFiles(t: Table): Seq[Path] =
    listing(Files.list(t.logDir))
      .filter(_.getFileName.toString.matches("\\d{20}\\.log"))
      .sortBy(versionOf)

  /** Latest committed version, or -1 for an empty table. */
  def latestVersion(t: Table): Long =
    versionFiles(t).lastOption.map(versionOf).getOrElse(-1L)

  /** Replay the action log through `asOf` (latest when None). The
    * live set is insertion-ordered so file order — and thus scan
    * planning — is deterministic across replays. */
  def snapshot(t: Table, asOf: Option[Long] = None): Snapshot = {
    val all = versionFiles(t)
    val upTo = asOf match {
      case Some(v) =>
        val have = all.filter(versionOf(_) <= v)
        require(have.nonEmpty && versionOf(have.last) == v,
          s"version $v does not exist in ${t.logDir} " +
            s"(latest=${latestVersion(t)})")
        have
      case None => all
    }
    require(upTo.nonEmpty, s"empty transaction log at ${t.logDir}")
    val live = new java.util.LinkedHashSet[String]()
    var stats = Map.empty[String, Map[String, (Long, Long)]]
    for (vf <- upTo; line <- Files.readAllLines(vf).asScala
         if line.nonEmpty) {
      line.split('\t') match {
        case Array("add", rel)    => live.add(rel)
        case arr if arr.length > 2 && arr(0) == "add" =>
          // stats-bearing add: trailing col:min:max triples
          live.add(arr(1))
          stats += arr(1) -> arr.drop(2).map { triple =>
            val Array(c, lo, hi) = triple.split(':')
            c -> (lo.toLong, hi.toLong)
          }.toMap
        case Array("remove", rel) =>
          live.remove(rel)
          stats -= rel
        case Array("txn", _, _) => () // streaming batch marker
        case other => throw new IllegalStateException(
          s"corrupt action in $vf: ${other.mkString("\t")}")
      }
    }
    Snapshot(versionOf(upTo.last), live.asScala.toSeq,
      stats.view.filterKeys(live.contains).toMap)
  }

  /** Atomically publish one version holding `adds`/`removes`.
    * `base` is the version the writer's read set was computed at
    * (latest at snapshot time; -1 for a fresh table). Returns the
    * committed version. */
  def commit(t: Table, base: Long, adds: Seq[String],
             removes: Seq[String] = Nil): Long = {
    val body = (removes.map(r => s"remove\t$r") ++
      adds.map(a => s"add\t$a")).mkString("", "\n", "\n")
    val tmp = t.logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, body)
    try {
      // A rewrite's read set is valid only if NOTHING landed after
      // `base`, so removes must claim exactly base+1 — EEXIST there IS
      // the conflict. Appends start from the freshest slot and walk up.
      var v = if (removes.nonEmpty) base + 1
              else math.max(latestVersion(t), base) + 1
      var committed = -1L
      while (committed < 0) {
        val target = t.logDir.resolve(f"$v%020d.log")
        try {
          Files.createLink(target, tmp)
          committed = v
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            if (removes.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"commit with removes based on stale snapshot v$base: " +
                  s"version $v was taken concurrently; recompute the " +
                  "rewrite against the current snapshot and retry")
            v += 1 // blind append: nothing to invalidate, take next slot
        }
      }
      committed
    } finally Files.deleteIfExists(tmp)
  }

  /** Attempt to publish `lines` as exactly version `v`; false when
    * the slot is already taken. The single-syscall link claim from
    * [[commit]], exposed for protocols that must re-validate their
    * read set between attempts. */
  private def tryPublish(t: Table, v: Long, lines: Seq[String]): Boolean = {
    val tmp = t.logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    try {
      Files.createLink(t.logDir.resolve(f"$v%020d.log"), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Highest streaming batch id `appId` has committed, if any. */
  def lastBatch(t: Table, appId: String): Option[Long] =
    versionFiles(t).flatMap(vf =>
      Files.readAllLines(vf).asScala.collect {
        case l if l.startsWith("txn\t") =>
          val Array(_, a, b) = l.split('\t')
          (a, b.toLong)
      }).filter(_._1 == appId).map(_._2).maxOption

  /** EXACTLY-ONCE streaming append — the foreachBatch sink contract:
    * the commit carries a `txn appId batchId` marker, and a replayed
    * batch (restart, retry, a racing twin) recognizes a marker at or
    * above its id and no-ops. The check-then-publish races through
    * the version-slot claim itself: each attempt targets exactly
    * latest+1, and an EEXIST loss re-reads the log — if the twin that
    * won WAS this batch, the re-check sees its marker and returns
    * false, so the pair (batch staged, marker linked) lands at most
    * once no matter how many writers replay it. Returns true iff THIS
    * call committed the batch; a false leaves only invisible staged
    * files, which vacuum reclaims. Contract: one app's batch ids are
    * SEQUENTIAL (the foreachBatch guarantee — batch b+1 only runs
    * after b committed), which is what makes the at-or-above fence
    * sound; concurrent independent writers are distinct appIds. */
  def appendBatch(s: SparkSession, t: Table, df: DataFrame,
                  appId: String, batchId: Long): Boolean = {
    require(appId.matches("[A-Za-z0-9_-]+"), s"bad app id: $appId")
    if (lastBatch(t, appId).exists(_ >= batchId)) return false
    val stage = t.dataDir.resolve(UUID.randomUUID().toString)
    df.write.parquet(stage.toString)
    val lines = stagedFiles(t, stage).map(a => s"add\t$a") :+
      s"txn\t$appId\t$batchId"
    while (true) {
      val base = latestVersion(t)
      if (lastBatch(t, appId).exists(_ >= batchId)) return false
      if (tryPublish(t, base + 1, lines)) return true
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stage `df` as parquet under a fresh uuid directory and commit it
    * as one append. The staged files are invisible to every reader
    * until the version link lands. */
  def append(s: SparkSession, t: Table, df: DataFrame): Long = {
    val base = latestVersion(t)
    val stage = t.dataDir.resolve(UUID.randomUUID().toString)
    df.write.parquet(stage.toString)
    commit(t, base, adds = stagedFiles(t, stage))
  }

  /** [[append]], plus per-file (min, max) of `statsCols` (long-typed
    * columns) embedded in the add actions — the write-side price of
    * manifest data skipping, paid once per commit with ONE aggregate
    * over the staged files (grouped by input_file_name), exactly how
    * a stats-collecting lakehouse writer works. */
  def appendWithStats(s: SparkSession, t: Table, df: DataFrame,
                      statsCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val base = latestVersion(t)
    val stage = t.dataDir.resolve(UUID.randomUUID().toString)
    df.write.parquet(stage.toString)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    val byFile = s.read.parquet(stage.toString)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // file-count-scale: one row per staged file
      .map { r =>
        val name = r.getString(0).split('/').last
        name -> statsCols.map(c =>
          s"$c:${r.getAs[Long](s"lo_$c")}:${r.getAs[Long](s"hi_$c")}")
      }.toMap
    val adds = stagedFiles(t, stage).map { rel =>
      byFile.get(rel.split('/').last) match {
        case Some(triples) => (rel +: triples).mkString("\t")
        case None          => rel
      }
    }
    commit(t, base, adds = adds)
  }

  /** Plan a range probe on `colName` from the MANIFEST: only live
    * files whose embedded stats intersect [lo, hi] reach the scan —
    * files without stats are kept (cannot skip, stays correct). At
    * 100 TB this is the query-planning step that touches no data
    * file at all. Returns the pruned frame; callers still apply
    * their own row-level predicate. */
  def readPruned(s: SparkSession, t: Table, colName: String,
                 lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(t, asOf)
    val keep = pruneFiles(snap, colName, lo, hi)
    val paths = (if (keep.nonEmpty) keep else snap.liveFiles)
      .map(rel => t.root.resolve(rel).toString)
    val df = s.read.parquet(paths: _*)
    if (keep.nonEmpty) df else df.limit(0)
  }

  private def pruneFiles(snap: Snapshot, colName: String,
                         lo: Long, hi: Long): Seq[String] =
    snap.liveFiles.filter { f =>
      snap.fileStats.get(f).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }

  /** (files planned, files live) for a probe — the skipping audit. */
  def plannedFiles(t: Table, colName: String, lo: Long,
                   hi: Long): (Int, Int) = {
    val snap = snapshot(t)
    (pruneFiles(snap, colName, lo, hi).length, snap.liveFiles.length)
  }

  private def stagedFiles(t: Table, stage: Path): Seq[String] =
    listing(Files.list(stage))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => t.root.relativize(p).toString).sorted

  /** OPTIMIZE: rewrite the current live files into `targetFiles`
    * compacted ones in one remove+add commit — logically a no-op,
    * physically fewer files. Fails (rather than losing a concurrent
    * append's rows) if any commit lands between snapshot and publish. */
  def compact(s: SparkSession, t: Table, targetFiles: Int = 1): Long = {
    val snap = snapshot(t)
    val stage = t.dataDir.resolve(UUID.randomUUID().toString)
    read(s, t, Some(snap.version)).coalesce(targetFiles)
      .write.parquet(stage.toString)
    commit(t, snap.version, adds = stagedFiles(t, stage),
      removes = snap.liveFiles)
  }

  /** Read the table at `asOf` (latest when None) straight from the
    * manifest — the scan plans over exactly the live files.
    * `mergeSchema=true` unions the live files' schemas (additive
    * evolution: a commit may add columns; older rows null-fill) at
    * the cost of reading every live footer — the demo form of what a
    * production log avoids by REGISTERING the schema in the log
    * itself; left off by default so ordinary reads stay
    * footer-count-independent. */
  def read(s: SparkSession, t: Table, asOf: Option[Long] = None,
           mergeSchema: Boolean = false): DataFrame = {
    val snap = snapshot(t, asOf)
    val paths = snap.liveFiles.map(rel => t.root.resolve(rel).toString)
    s.read.option("mergeSchema", mergeSchema).parquet(paths: _*)
  }

  /** Change-data-feed read: the row-level (inserts, deletes) between
    * snapshot `from` (exclusive) and `to` (inclusive). When no commit
    * in the range carries removes, the log IS the change feed —
    * inserts are exactly the rows of the files those commits added, a
    * metadata resolution plus a scan of only the new files (the shape
    * an incremental consumer runs every few minutes at 100 TB).
    * A range containing removes (rewrites, deletes) falls back to the
    * generic multiset row diff of the two snapshots — which is also
    * what PROVES a compaction commit contributes no logical change. */
  def changes(s: SparkSession, t: Table, from: Long,
              to: Long): (DataFrame, DataFrame) = {
    require(from <= to, s"empty change range: v$from..v$to")
    val snapFrom = snapshot(t, Some(from)) // validates `from` exists
    val range = versionFiles(t)
      .filter(p => versionOf(p) > from && versionOf(p) <= to)
    require(range.nonEmpty && versionOf(range.last) == to,
      s"version $to does not exist in ${t.logDir}")
    val actions = range.flatMap(vf => Files.readAllLines(vf).asScala)
      .filter(_.nonEmpty)
    if (!actions.exists(_.startsWith("remove\t"))) {
      val added = actions.collect {
        case a if a.startsWith("add\t") =>
          t.root.resolve(a.split('\t')(1)).toString
      }
      val none = read(s, t, Some(from)).limit(0)
      (if (added.isEmpty) none else s.read.parquet(added: _*), none)
    } else {
      // a snapshot CAN be empty (a delete-everything commit) — plan
      // it as the other side's schema with no rows
      val aFiles = snapFrom.liveFiles
      val bFiles = snapshot(t, Some(to)).liveFiles
      require(aFiles.nonEmpty || bFiles.nonEmpty,
        s"both snapshots v$from and v$to are empty")
      def rd(files: Seq[String], fallback: Seq[String]): DataFrame = {
        val use = if (files.nonEmpty) files else fallback
        val df = s.read.parquet(
          use.map(rel => t.root.resolve(rel).toString): _*)
        if (files.nonEmpty) df else df.limit(0)
      }
      val a = rd(aFiles, bFiles)
      val b = rd(bFiles, aFiles)
      (b.exceptAll(a), a.exceptAll(b))
    }
  }

  /** Incremental-sync consumer — the AvailableNow-style downstream a
    * 100 TB table feeds every few minutes. [[pending]] reads
    * everything that changed since the consumer's durable cursor;
    * the caller processes the batch, then [[ack]]s the delivered
    * version. A crash before the ack re-delivers the batch —
    * at-least-once, the standard contract — and the cursor file is
    * published with the same write-tmp-then-link atomicity as
    * versions, so it advances completely or not at all. Returns None
    * when already caught up. */
  def pending(s: SparkSession, t: Table,
              consumer: String): Option[(Long, DataFrame, DataFrame)] = {
    val from = cursorOf(t, consumer)
    val to = latestVersion(t)
    if (to <= from) None
    else if (from < 0)
      Some((to, read(s, t, Some(to)), read(s, t, Some(to)).limit(0)))
    else {
      val (ins, del) = changes(s, t, from, to)
      Some((to, ins, del))
    }
  }

  /** Durably advance `consumer`'s cursor to `version` (processed). */
  def ack(t: Table, consumer: String, version: Long): Unit = {
    val tmp = t.logDir.resolve(s".tmp-cursor-${UUID.randomUUID()}")
    Files.writeString(tmp, s"$version\n")
    try {
      Files.deleteIfExists(cursorPath(t, consumer))
      Files.createLink(cursorPath(t, consumer), tmp)
    } finally Files.deleteIfExists(tmp)
  }

  private def cursorPath(t: Table, consumer: String): Path = {
    require(consumer.matches("[A-Za-z0-9_-]+"), s"bad consumer id: $consumer")
    t.logDir.resolve(s".cursor-$consumer")
  }

  private def cursorOf(t: Table, consumer: String): Long = {
    val p = cursorPath(t, consumer)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** Delete every data file no longer live at the LATEST version.
    * Time travel to versions whose files are vacuumed stops working —
    * the same trade Delta's VACUUM makes. Production deployments gate
    * this behind a retention horizon (only files dead LONGER than the
    * longest plausible reader/time-travel window are deleted) so an
    * in-flight snapshot read can always finish; this immediate form
    * is the zero-retention setting of that contract. Returns deleted
    * count. */
  def vacuum(t: Table): Int = {
    val live = snapshot(t).liveFiles.toSet
    val all = listing(Files.walk(t.dataDir))
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => t.root.relativize(p).toString)
    val dead = all.filterNot(live)
    dead.foreach(rel => Files.deleteIfExists(t.root.resolve(rel)))
    dead.length
  }
}
