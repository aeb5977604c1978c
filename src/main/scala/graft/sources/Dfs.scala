package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** FsShell-equivalent utilities over the Hadoop FileSystem API (the
  * hadoop-hdfs client surface: ls/du/mkdir/rm). Driver-side metadata
  * ops — these are namenode calls, not data-path work, so no
  * distribution is involved (same as FsShell).
  *
  * Reference anchors (hadoop-common-project/hadoop-common/src/main/
  * java/org/apache/hadoop): fs/FileSystem.java:181 (the abstract FS
  * contract; getContentSummary :1824, listStatus :1907),
  * fs/shell/Ls.java:44 (the shell command this mirrors).
  */
object Dfs {
  private def fs(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(new Configuration()), p)
  }

  /** (name, isDir, length) per child. */
  def ls(path: String): Seq[(String, Boolean, Long)] = {
    val (f, p) = fs(path)
    f.listStatus(p).toSeq
      .map(st => (st.getPath.getName, st.isDirectory, st.getLen))
  }

  /** Total bytes under the path (du -s). */
  def du(path: String): Long = {
    val (f, p) = fs(path)
    f.getContentSummary(p).getLength
  }

  /** count: (dirs, files, bytes) under the path — the shell's
    * `hadoop fs -count` triple, one getContentSummary call
    * (reference fs/shell/Count.java). */
  def count(path: String): (Long, Long, Long) = {
    val (f, p) = fs(path)
    val cs = f.getContentSummary(p)
    (cs.getDirectoryCount, cs.getFileCount, cs.getLength)
  }

  def mkdirs(path: String): Boolean = { val (f, p) = fs(path); f.mkdirs(p) }

  def rm(path: String, recursive: Boolean = false): Boolean = {
    val (f, p) = fs(path)
    f.delete(p, recursive)
  }

  def exists(path: String): Boolean = { val (f, p) = fs(path); f.exists(p) }

  /** getmerge: concatenate a directory's part files (sorted by name,
    * the task-output order) into one local file — the classic way to
    * pull a small MR job result out of HDFS. Returns bytes written. */
  def getmerge(srcDir: String, dstFile: String): Long = {
    val (f, p) = fs(srcDir)
    val parts = f.listStatus(p).filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith(".") ||
        st.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
    val (df, dp) = fs(dstFile)
    val out = df.create(dp, true)
    try {
      var total = 0L
      parts.foreach { st =>
        val in = f.open(st.getPath)
        try {
          val buf = new Array[Byte](128 * 1024)
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) { out.write(buf, 0, n); total += n }
            n = in.read(buf)
          }
        } finally in.close()
      }
      total
    } finally out.close()
  }

  // ---- Metadata ops (reference: hadoop-common/.../fs/shell/
  // FsShellPermissions.java chmod/chown, SetReplication.java,
  // Stat.java, Touch.java) — namenode-only calls, like the shell ----

  /** chmod with an octal mode string ("640"); applies to the single
    * path (the -R walk is listStatus + recursion, same as the shell). */
  def chmod(path: String, octal: String): Unit = {
    val (f, p) = fs(path)
    f.setPermission(p, new org.apache.hadoop.fs.permission.FsPermission(
      Integer.parseInt(octal, 8).toShort))
  }

  /** chown / chgrp: either may be null to leave it unchanged (the
    * shell's `chown user:`, `chgrp group` forms). */
  def chown(path: String, owner: String, group: String): Unit = {
    val (f, p) = fs(path)
    f.setOwner(p, owner, group)
  }

  /** setrep: request a new replication factor; returns whether the
    * filesystem accepted it (local FS accepts and ignores — the
    * contract is the FileSystem API call, as with the shell). */
  def setrep(path: String, replication: Short): Boolean = {
    val (f, p) = fs(path)
    f.setReplication(p, replication)
  }

  /** stat: the fields `hadoop fs -stat %n %b %o %r %u %g %a %y` reads,
    * from one getFileStatus call. */
  case class Stat(name: String, isDir: Boolean, len: Long,
      blockSize: Long, replication: Short, owner: String, group: String,
      perm: String, mtimeMs: Long)

  def stat(path: String): Stat = {
    val (f, p) = fs(path)
    val st = f.getFileStatus(p)
    Stat(st.getPath.getName, st.isDirectory, st.getLen, st.getBlockSize,
      st.getReplication, st.getOwner, st.getGroup,
      st.getPermission.toString, st.getModificationTime)
  }

  /** touchz: create a zero-length file (fails if it exists, like the
    * shell). */
  def touchz(path: String): Unit = {
    val (f, p) = fs(path)
    require(!f.exists(p), s"touchz: $path already exists")
    f.create(p, false).close()
  }

  // ---- Copy / move / inspect (reference: hadoop-common/.../fs/shell/
  // CopyCommands.java cp, MoveCommands.java mv, Tail.java, Head.java,
  // Test.java, Truncate.java, Concat.java) — the daily-use file
  // manipulation slice. cp is the only data-path op (it streams
  // bytes); everything else is metadata or a bounded 1 KB read. ----

  /** cp: copy a file or directory tree. Streams bytes through the
    * FileSystem API (open/create), so it works across filesystems —
    * the shell's CommandWithDestination.copyFileToTarget does the
    * same. Returns bytes copied. */
  def cp(src: String, dst: String): Long = {
    val (sf, sp) = fs(src)
    val (df, dp) = fs(dst)
    val st = sf.getFileStatus(sp)
    if (st.isDirectory) {
      df.mkdirs(dp)
      sf.listStatus(sp).toSeq.sortBy(_.getPath.getName)
        .map(c => cp(c.getPath.toString,
          new Path(dp, c.getPath.getName).toString)).sum
    } else {
      val in = sf.open(sp)
      val out = df.create(dp, true)
      try {
        var total = 0L
        val buf = new Array[Byte](128 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) { out.write(buf, 0, n); total += n }
          n = in.read(buf)
        }
        total
      } finally { in.close(); out.close() }
    }
  }

  /** mv: rename within a filesystem (the shell's MoveCommands.Rename
    * — a pure namenode op, never a byte copy). */
  def mv(src: String, dst: String): Boolean = {
    val (f, sp) = fs(src)
    f.rename(sp, new Path(dst))
  }

  /** tail: the file's last `n` bytes (the shell shows the last 1 KB —
    * seek to len-n, one bounded read; never a full-file scan). */
  def tail(path: String, n: Int = 1024): Array[Byte] = {
    val (f, p) = fs(path)
    val len = f.getFileStatus(p).getLen
    val start = math.max(0L, len - n)
    val in = f.open(p)
    try {
      val buf = new Array[Byte]((len - start).toInt)
      in.readFully(start, buf)
      buf
    } finally in.close()
  }

  /** head: the file's first `n` bytes (shell Head.java — one bounded
    * read from offset 0). */
  def head(path: String, n: Int = 1024): Array[Byte] = {
    val (f, p) = fs(path)
    val len = math.min(f.getFileStatus(p).getLen, n.toLong).toInt
    val in = f.open(p)
    try {
      val buf = new Array[Byte](len)
      in.readFully(0L, buf)
      buf
    } finally in.close()
  }

  /** test: the shell's -e/-d/-f/-s/-z predicates as one call.
    * flag ∈ {e: exists, d: is dir, f: is file, s: non-empty file,
    * z: zero-length file}. */
  def test(path: String, flag: Char): Boolean = {
    val (f, p) = fs(path)
    flag match {
      case 'e' => f.exists(p)
      case 'd' => f.exists(p) && f.getFileStatus(p).isDirectory
      case 'f' => f.exists(p) && f.getFileStatus(p).isFile
      case 's' => f.exists(p) && f.getFileStatus(p).isFile &&
        f.getFileStatus(p).getLen > 0
      case 'z' => f.exists(p) && f.getFileStatus(p).getLen == 0
      case other => throw new IllegalArgumentException(
        s"test: unknown flag -$other")
    }
  }

  /** truncate to `newLength` bytes (shell Truncate.java →
    * FileSystem.truncate). HDFS truncates in place (may return false
    * while block recovery runs — same contract as the API);
    * filesystems that refuse truncate (the local ChecksumFileSystem)
    * get the same observable result via a streamed prefix rewrite. */
  def truncate(path: String, newLength: Long): Boolean = {
    val (f, p) = fs(path)
    try f.truncate(p, newLength)
    catch {
      case _: UnsupportedOperationException =>
        require(newLength <= f.getFileStatus(p).getLen,
          s"truncate: $newLength exceeds the file length")
        val tmp = new Path(p.getParent, "." + p.getName + ".trunc")
        val in = f.open(p)
        val out = f.create(tmp, true)
        try {
          var remaining = newLength
          val buf = new Array[Byte](128 * 1024)
          while (remaining > 0) {
            val n = in.read(buf, 0,
              math.min(buf.length.toLong, remaining).toInt)
            require(n > 0, s"truncate: unexpected EOF in $path")
            out.write(buf, 0, n)
            remaining -= n
          }
        } finally { in.close(); out.close() }
        f.delete(p, false)
        f.rename(tmp, p)
    }
  }

  /** concat: append `srcs` onto `target` (in order) and remove them —
    * the observable contract of the shell's Concat.java /
    * FileSystem.concat. HDFS does this as a namenode block-list
    * splice; filesystems that don't support concat (e.g. the local FS
    * used in specs) get the same result via a byte-level append, so
    * the operation is portable while HDFS keeps the zero-copy path. */
  def concat(target: String, srcs: Seq[String]): Unit = {
    val (f, tp) = fs(target)
    val srcPaths = srcs.map(new Path(_))
    try f.concat(tp, srcPaths.toArray)
    catch {
      case _: UnsupportedOperationException =>
        // streamed fallback: no file is ever buffered in memory
        val tmp = new Path(tp.getParent, "." + tp.getName + ".concat")
        require(f.rename(tp, tmp), s"concat: cannot stage $target")
        val out = f.create(tp, true)
        try (tmp +: srcPaths).foreach { sp =>
          val in = f.open(sp)
          try {
            val buf = new Array[Byte](128 * 1024)
            var n = in.read(buf)
            while (n >= 0) {
              if (n > 0) out.write(buf, 0, n)
              n = in.read(buf)
            }
          } finally in.close()
        } finally out.close()
        (tmp +: srcPaths).foreach(sp => f.delete(sp, false))
    }
  }

  // ---- Extended attributes + snapshots (reference: hadoop-common/
  // .../fs/shell/XAttrCommands.java, SnapshotCommands.java). The
  // native FileSystem calls are used where the filesystem implements
  // them (HDFS); filesystems that refuse (the local ChecksumFileSystem)
  // get the same OBSERVABLE contract through a portable fallback —
  // xattrs in a hidden sidecar file, snapshots as a real copy under
  // .snapshot/<name> (HDFS does the same read layout with zero-copy
  // namenode magic). POSIX ACLs are deliberately NOT emulated: the
  // permission story here is chmod/chown (FsPermission), and a
  // fallback ACL store nothing enforces would be contract theater. --

  private def xattrSidecar(p: Path) =
    new Path(p.getParent, "." + p.getName + ".xattr")

  private def readSidecar(f: FileSystem, p: Path): Map[String, Array[Byte]] = {
    val sc = xattrSidecar(p)
    if (!f.exists(sc)) Map.empty
    else {
      val in = f.open(sc)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8").split("\n")
          .filter(_.nonEmpty)
          .map { line =>
            val Array(k, v) = line.split("=", 2)
            k -> v.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
          }.toMap
      } finally in.close()
    }
  }

  private def writeSidecar(f: FileSystem, p: Path,
      attrs: Map[String, Array[Byte]]): Unit = {
    val sc = xattrSidecar(p)
    if (attrs.isEmpty) { f.delete(sc, false); () }
    else {
      val out = f.create(sc, true)
      try out.write(attrs.toSeq.sortBy(_._1).map { case (k, v) =>
        k + "=" + v.map("%02x".format(_)).mkString
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** setfattr -n name -v value */
  def setfattr(path: String, name: String, value: Array[Byte]): Unit = {
    val (f, p) = fs(path)
    try f.setXAttr(p, name, value)
    catch { case _: UnsupportedOperationException =>
      writeSidecar(f, p, readSidecar(f, p) + (name -> value))
    }
  }

  /** getfattr -n name; None when the attribute is absent. */
  def getfattr(path: String, name: String): Option[Array[Byte]] = {
    val (f, p) = fs(path)
    try Option(f.getXAttr(p, name))
    catch {
      case _: UnsupportedOperationException => readSidecar(f, p).get(name)
      case _: java.io.IOException => None // HDFS throws on absent attrs
    }
  }

  /** getfattr -d: every attribute name on the path, sorted. */
  def listfattr(path: String): Seq[String] = {
    val (f, p) = fs(path)
    try {
      import scala.jdk.CollectionConverters._
      f.listXAttrs(p).asScala.toSeq.sorted
    } catch { case _: UnsupportedOperationException =>
      readSidecar(f, p).keys.toSeq.sorted
    }
  }

  /** setfattr -x name */
  def removefattr(path: String, name: String): Unit = {
    val (f, p) = fs(path)
    try f.removeXAttr(p, name)
    catch { case _: UnsupportedOperationException =>
      writeSidecar(f, p, readSidecar(f, p) - name)
    }
  }

  /** createSnapshot: freeze `dir`'s current contents under
    * .snapshot/<name>. HDFS does this as a zero-copy namenode
    * operation; the fallback takes a real copy — same read contract
    * (the snapshot keeps serving the old bytes while the live dir
    * mutates), linear cost where HDFS pays O(1). Returns the
    * snapshot's path. */
  def createSnapshot(dir: String, name: String): String = {
    val (f, p) = fs(dir)
    try f.createSnapshot(p, name).toString
    catch { case _: UnsupportedOperationException =>
      val snap = new Path(new Path(p, ".snapshot"), name)
      require(!f.exists(snap), s"snapshot $name already exists")
      f.mkdirs(snap.getParent)
      f.listStatus(p).toSeq
        .filterNot(_.getPath.getName == ".snapshot")
        .foreach(st => cp(st.getPath.toString,
          new Path(snap, st.getPath.getName).toString))
      snap.toString
    }
  }

  /** deleteSnapshot: drop a named snapshot, leaving the live dir and
    * other snapshots untouched. */
  def deleteSnapshot(dir: String, name: String): Unit = {
    val (f, p) = fs(dir)
    try f.deleteSnapshot(p, name)
    catch { case _: UnsupportedOperationException =>
      f.delete(new Path(new Path(p, ".snapshot"), name), true); ()
    }
  }

  // ---- Trash / safe-delete (reference: hadoop-common/.../fs/
  // Trash.java, TrashPolicyDefault.java) -----------------------------
  //
  // The contract every operator leans on before a 100 TB `rm -r`:
  // deletes MOVE into a trash checkpoint first; a periodic expunge
  // deletes checkpoints older than the retention interval. Layout
  // mirrors the reference: <trashRoot>/Current/<name> for live
  // deletes, <trashRoot>/<yyyyMMddHHmmss>/ for checkpoints.

  private val checkpointFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC)

  /** Move `path` into the trash's Current dir instead of deleting it.
    * Name collisions get a nanotime suffix (the reference appends a
    * timestamp the same way). */
  def rmToTrash(path: String, trashRoot: String): Boolean = {
    val (f, p) = fs(path)
    if (!f.exists(p)) return false
    val current = new Path(trashRoot, "Current")
    f.mkdirs(current)
    var dest = new Path(current, p.getName)
    if (f.exists(dest))
      dest = new Path(current, p.getName + "." + System.nanoTime())
    f.rename(p, dest)
  }

  /** Roll Current into a timestamped checkpoint (no-op when empty). */
  def checkpointTrash(trashRoot: String, nowMs: Long): Boolean = {
    val (f, _) = fs(trashRoot)
    val current = new Path(trashRoot, "Current")
    if (!f.exists(current)) return false
    val stamp = checkpointFmt.format(java.time.Instant.ofEpochMilli(nowMs))
    f.rename(current, new Path(trashRoot, stamp))
  }

  /** Delete checkpoints older than `retentionMs`; returns how many
    * were expunged. Current is never touched. */
  def expungeTrash(trashRoot: String, retentionMs: Long, nowMs: Long): Int = {
    val (f, root) = fs(trashRoot)
    if (!f.exists(root)) return 0
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter(_.getPath.getName != "Current")
      .filter { st =>
        try {
          val t = java.time.LocalDateTime
            .parse(st.getPath.getName, checkpointFmt)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          nowMs - t >= retentionMs
        } catch { case _: Exception => false } // not a checkpoint dir
      }
      .count(st => f.delete(st.getPath, true))
  }
}
