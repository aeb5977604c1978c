package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

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

  /** df: (capacity, used, remaining) of the filesystem holding the
    * path — the shell's `hadoop fs -df` (reference
    * fs/shell/FsUsage.java Df), one FileSystem.getStatus call. */
  def df(path: String): (Long, Long, Long) = {
    val (f, p) = fs(path)
    val st = f.getStatus(p)
    (st.getCapacity, st.getUsed, st.getRemaining)
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

  /** Open a SYNCABLE write stream (reference fs/Syncable.java:1 —
    * the durability contract every log-writer relies on): the
    * returned `FSDataOutputStream` exposes `hflush()` (new readers
    * see every byte written so far, before the writer closes) and
    * `hsync()` (hflush + force to stable storage). On filesystems
    * whose output streams implement Syncable (HDFS pipelines) the
    * calls are native; elsewhere `FSDataOutputStream` documents the
    * fallback — flush the stream buffer — which on a local
    * filesystem still delivers the VISIBILITY half of the contract
    * (bytes reach the OS file; durability needs the native hsync).
    * Locally the raw (non-checksum) stream is opened: a mid-write
    * checksum SIDE FILE is undefined under Syncable — HDFS keeps
    * checksums in the write pipeline, not beside the file — and the
    * checksum read path tolerates its absence. */
  def createLogStream(path: String): org.apache.hadoop.fs.FSDataOutputStream = {
    val (f0, p) = fs(path)
    val f = f0 match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case x => x
    }
    f.create(p, true)
  }

  /** appendToFile (reference fs/shell/CopyCommands.java:385 — the
    * one FileSystem WRITE mode beyond create): append `data` to the
    * file, creating it if absent. Native `FileSystem.append` where
    * the filesystem supports it (HDFS); filesystems that refuse (the
    * local ChecksumFileSystem) get the same observable result via a
    * rewrite in the crash-safe write-new/swap/delete-old order —
    * a crash leaves either the old or the appended file. */
  def appendToFile(path: String, data: Array[Byte]): Unit = {
    val (f, p) = fs(path)
    if (!f.exists(p)) {
      val out = f.create(p, false)
      try out.write(data) finally out.close()
      return
    }
    try {
      val out = f.append(p)
      try out.write(data) finally out.close()
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        val tmp = new Path(p.getParent, "." + p.getName + ".append")
        val orig = new Path(p.getParent, "." + p.getName + ".orig")
        val in = f.open(p)
        val out = f.create(tmp, true)
        try {
          val buf = new Array[Byte](128 * 1024)
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) out.write(buf, 0, n)
            n = in.read(buf)
          }
          out.write(data)
        } finally { in.close(); out.close() }
        require(f.rename(p, orig), s"append: cannot set aside $path")
        require(f.rename(tmp, p), s"append: cannot publish $tmp")
        f.delete(orig, false)
        ()
    }
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
    * get the same observable result via a streamed prefix rewrite,
    * in write-new / swap / delete-old order: the original is renamed
    * aside only AFTER the complete truncated copy exists, so a crash
    * at any point leaves either the old file (under its name or the
    * .orig aside) or the new one — never neither (the HDFS in-place
    * truncate has the same old-or-new guarantee). */
  def truncate(path: String, newLength: Long): Boolean = {
    val (f, p) = fs(path)
    try f.truncate(p, newLength)
    catch {
      case _: UnsupportedOperationException =>
        require(newLength <= f.getFileStatus(p).getLen,
          s"truncate: $newLength exceeds the file length")
        val tmp = new Path(p.getParent, "." + p.getName + ".trunc")
        val orig = new Path(p.getParent, "." + p.getName + ".orig")
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
        // swap: original aside -> new into place -> drop the aside
        require(f.rename(p, orig), s"truncate: cannot set aside $path")
        require(f.rename(tmp, p), s"truncate: cannot publish $tmp")
        f.delete(orig, false)
        true
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
        // streamed fallback, crash-safe ordering: the concatenation
        // is built in a temp file while target and srcs stay intact,
        // then swapped in (aside -> publish -> cleanup) — a crash at
        // any point leaves either the original files or the finished
        // result, matching HDFS's atomic namenode block-splice.
        val tmp = new Path(tp.getParent, "." + tp.getName + ".concat")
        val orig = new Path(tp.getParent, "." + tp.getName + ".orig")
        val out = f.create(tmp, true)
        try (tp +: srcPaths).foreach { sp =>
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
        require(f.rename(tp, orig), s"concat: cannot set aside $target")
        require(f.rename(tmp, tp), s"concat: cannot publish $tmp")
        (orig +: srcPaths).foreach(sp => f.delete(sp, false))
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

  // Sidecar lines are hex(nameUtf8)=hex(value): hex-encoding the NAME
  // too means an attribute name containing '=' or '\n' round-trips
  // exactly instead of corrupting the split-on-'=' parse (names are
  // user-chosen; HDFS allows any string after the namespace prefix).
  private def hexEncode(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString
  private def hexDecode(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

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
            new String(hexDecode(k), "UTF-8") -> hexDecode(v)
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
        hexEncode(k.getBytes("UTF-8")) + "=" + hexEncode(v)
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

  // ---- find (reference: hadoop-common/.../fs/shell/find/Find.java,
  // Name.java, And.java — the expression-tree walk). The shell's only
  // shipped predicate is -name; the composable tree below adds the
  // size/mtime/type predicates every operator reaches for (GNU find
  // semantics) while keeping the reference's structure: one depth-
  // first walk, the expression applied to every visited status,
  // directories before their children, children in name order. ----

  sealed trait FindExpr {
    private[graft] def matches(st: FileStatus): Boolean
  }

  object FindExpr {
    private def globRegex(glob: String): scala.util.matching.Regex = {
      // *, ?, [...] as in fs/GlobPattern; everything else literal
      val sb = new StringBuilder
      glob.foreach {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case c if "\\.(){}+^$|".contains(c) => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      sb.toString.r
    }

    /** -name (ignoreCase = -iname): glob over the base name. */
    final case class Name(glob: String, ignoreCase: Boolean = false)
        extends FindExpr {
      private val re =
        globRegex(if (ignoreCase) glob.toLowerCase else glob)
      private[graft] def matches(st: FileStatus): Boolean = {
        val n = st.getPath.getName
        re.pattern.matcher(if (ignoreCase) n.toLowerCase else n).matches
      }
    }

    /** -size: '+' strictly larger, '-' strictly smaller, '=' exact,
      * in bytes (directories compare their status length, 0). */
    final case class Size(cmp: Char, bytes: Long) extends FindExpr {
      private[graft] def matches(st: FileStatus): Boolean = cmp match {
        case '+' => st.getLen > bytes
        case '-' => st.getLen < bytes
        case _   => st.getLen == bytes
      }
    }

    /** -mtime n (days, against the caller's clock): '+' modified more
      * than n days ago, '-' less, '=' within day n exactly. */
    final case class Mtime(cmp: Char, days: Long, nowMs: Long)
        extends FindExpr {
      private val DayMs = 86400000L
      private[graft] def matches(st: FileStatus): Boolean = {
        val age = nowMs - st.getModificationTime
        cmp match {
          case '+' => age > days * DayMs
          case '-' => age < days * DayMs
          case _   => age >= days * DayMs && age < (days + 1) * DayMs
        }
      }
    }

    /** -type f|d */
    final case class Type(t: Char) extends FindExpr {
      private[graft] def matches(st: FileStatus): Boolean =
        if (t == 'd') st.isDirectory else st.isFile
    }

    /** Implicit -a of the shell's expression tree. */
    final case class All(ps: Seq[FindExpr]) extends FindExpr {
      private[graft] def matches(st: FileStatus): Boolean =
        ps.forall(_.matches(st))
    }

    /** -o */
    final case class Any(ps: Seq[FindExpr]) extends FindExpr {
      private[graft] def matches(st: FileStatus): Boolean =
        ps.exists(_.matches(st))
    }

    /** ! */
    final case class Not(p: FindExpr) extends FindExpr {
      private[graft] def matches(st: FileStatus): Boolean = !p.matches(st)
    }
  }

  /** fs -find: every path under (and including) `root` matching the
    * expression, in the shell's print order — preorder DFS, children
    * sorted by name. Namenode-walk only, like the shell. */
  def find(root: String, expr: FindExpr): Seq[String] = {
    val (f, p) = fs(root)
    def walk(st: FileStatus): Seq[String] = {
      val self =
        if (expr.matches(st)) Seq(st.getPath.toString) else Seq.empty
      val kids =
        if (st.isDirectory)
          f.listStatus(st.getPath).toSeq.sortBy(_.getPath.getName)
            .flatMap(walk)
        else Seq.empty
      self ++ kids
    }
    walk(f.getFileStatus(p))
  }

  // ---- Display family (reference: hadoop-common/.../fs/shell/
  // Display.java — Text :116 decodes whatever the file is, Checksum
  // :176 prints the digest) -------------------------------------------

  /** fs -text: render a file as lines regardless of its on-disk
    * format — a SequenceFile becomes one "key\tvalue" line per
    * record, a compressed text file (codec resolved from the
    * extension, same as the shell's factory lookup) is decoded, and
    * anything else streams through as plain text. */
  def text(path: String): Seq[String] = {
    val (f, p) = fs(path)
    val magic = head(path, 3)
    val isSeq = magic.length == 3 &&
      magic(0) == 'S'.toByte && magic(1) == 'E'.toByte &&
      magic(2) == 'Q'.toByte
    if (isSeq) {
      import org.apache.hadoop.io.SequenceFile
      val conf = f.getConf
      val reader =
        new SequenceFile.Reader(conf, SequenceFile.Reader.file(p))
      try {
        val key = org.apache.hadoop.util.ReflectionUtils
          .newInstance(reader.getKeyClass, conf)
          .asInstanceOf[org.apache.hadoop.io.Writable]
        val value = org.apache.hadoop.util.ReflectionUtils
          .newInstance(reader.getValueClass, conf)
          .asInstanceOf[org.apache.hadoop.io.Writable]
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (reader.next(key, value)) out += s"$key\t$value"
        out.toSeq
      } finally reader.close()
    } else {
      val codec = new org.apache.hadoop.io.compress
        .CompressionCodecFactory(new Configuration()).getCodec(p)
      val raw = f.open(p)
      val in = if (codec != null) codec.createInputStream(raw) else raw
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
  }

  /** fs -checksum: hex digest of the file's raw bytes — MD5 of the
    * content, like distcp's cross-filesystem verifier (HDFS's
    * composite block CRCs are layout-dependent and famously not
    * comparable across filesystems; content MD5 is). */
  def checksum(path: String): String = {
    val (f, p) = fs(path)
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = f.open(p)
    try {
      val buf = new Array[Byte](128 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest.map("%02x".format(_)).mkString
  }

  // ---- Quotas (reference: hadoop-common/.../fs/shell/Count.java:100
  // showQuotas; hdfs setQuota/setSpaceQuota). HDFS keeps quotas on
  // the directory inode; where the native FS has none they live in
  // the same xattr store the rest of the metadata surface uses, and
  // the OBSERVABLE contract matches: count -q reports (quota,
  // remaining, spaceQuota, spaceRemaining, dirs, files, bytes), and
  // an enforced write under an exhausted quota is REFUSED with the
  // NS/DS exception split HDFS throws. Namespace usage counts every
  // name in the tree including the root dir itself (the HDFS rule);
  // space usage is content bytes at replication 1 (local FS). ----

  private val QuotaAttr = "graft.quota"

  class QuotaExceededException(msg: String)
    extends java.io.IOException(msg)
  /** namespace (name-count) quota violation — HDFS's
    * NSQuotaExceededException analog. */
  class NsQuotaExceededException(msg: String)
    extends QuotaExceededException(msg)
  /** diskspace quota violation — HDFS's DSQuotaExceededException
    * analog. */
  class DsQuotaExceededException(msg: String)
    extends QuotaExceededException(msg)

  /** hdfs dfsadmin -setQuota / -setSpaceQuota (-1 = unlimited). */
  def setQuota(dir: String, nsQuota: Long = -1L,
      spaceQuota: Long = -1L): Unit = {
    require(test(dir, 'd'), s"setQuota: $dir is not a directory")
    setfattr(dir, QuotaAttr, s"$nsQuota:$spaceQuota".getBytes("UTF-8"))
  }

  /** hdfs dfsadmin -clrQuota -clrSpaceQuota */
  def clearQuota(dir: String): Unit = removefattr(dir, QuotaAttr)

  private def quotaOf(dir: String): Option[(Long, Long)] =
    getfattr(dir, QuotaAttr).map { b =>
      val Array(ns, sp) = new String(b, "UTF-8").split(":", 2)
      (ns.toLong, sp.toLong)
    }

  /** count -q output row (quota fields are -1 = none/inf when no
    * quota is set, matching the shell's none/inf columns). */
  case class QuotaCount(quota: Long, quotaRemaining: Long,
      spaceQuota: Long, spaceRemaining: Long,
      dirs: Long, files: Long, bytes: Long)

  /** fs -count -q: the shell's seven-column quota view from one
    * content summary + the directory's quota record. */
  def countQ(dir: String): QuotaCount = {
    val (dirs, files, bytes) = count(dir)
    quotaOf(dir) match {
      case Some((ns, sp)) =>
        QuotaCount(
          quota = ns,
          quotaRemaining = if (ns < 0) -1L else ns - (dirs + files),
          spaceQuota = sp,
          spaceRemaining = if (sp < 0) -1L else sp - bytes,
          dirs = dirs, files = files, bytes = bytes)
      case None =>
        QuotaCount(-1L, -1L, -1L, -1L, dirs, files, bytes)
    }
  }

  /** Every ancestor of `p` (nearest first) carrying a quota. The
    * filesystem root is excluded: it has no parent to hold a sidecar
    * (and an all-of-/ quota is not a thing the shell sets either). */
  private def quotaAncestors(p: Path): Seq[(String, Long, Long)] =
    Iterator.iterate(p.getParent)(_.getParent)
      .takeWhile(a => a != null && a.getParent != null)
      .flatMap { a =>
        quotaOf(a.toString).map { case (ns, sp) => (a.toString, ns, sp) }
      }.toSeq

  /** The quota gate every enforced mutation runs: would adding
    * `newNames` names and `newBytes` bytes under `p` break any
    * ancestor's quota? Throws the HDFS-split exception if so. */
  private def checkQuota(p: Path, newNames: Long, newBytes: Long): Unit =
    quotaAncestors(p).foreach { case (dir, ns, sp) =>
      val (dirs, files, bytes) = count(dir)
      if (ns >= 0 && dirs + files + newNames > ns)
        throw new NsQuotaExceededException(
          s"NSQuotaExceeded: quota=$ns names=${dirs + files} " +
            s"adding=$newNames under $dir")
      if (sp >= 0 && bytes + newBytes > sp)
        throw new DsQuotaExceededException(
          s"DSQuotaExceeded: spaceQuota=$sp bytes=$bytes " +
            s"adding=$newBytes under $dir")
    }

  /** Quota-enforced file create — refuses (file untouched) when any
    * ancestor's namespace or space quota would be exceeded, exactly
    * the point HDFS's FSDirectory verifyQuota rejects the addBlock. */
  def createEnforced(path: String, data: Array[Byte]): Unit = {
    val (f, p) = fs(path)
    val existing =
      if (f.exists(p)) f.getFileStatus(p).getLen else -1L
    val newNames = if (existing < 0) 1L else 0L
    val newBytes = data.length.toLong - math.max(existing, 0L)
    checkQuota(p, newNames, newBytes)
    val out = f.create(p, true)
    try out.write(data) finally out.close()
  }

  /** Quota-enforced mkdir (one new name, zero bytes). */
  def mkdirsEnforced(path: String): Boolean = {
    val (f, p) = fs(path)
    if (f.exists(p)) return false
    checkQuota(p, newNames = 1L, newBytes = 0L)
    f.mkdirs(p)
  }
}
