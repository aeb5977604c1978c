package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, concat_ws}
import graft.operators.HadoopTools
import graft.sources.Tables

class HadoopToolsSpec extends AnyFunSuite {
  import TestSpark._

  test("counters (Observation) report alongside the action") {
    val (df, obs) = HadoopTools.withCounters(Tables.lineitem(spark, sf))
    val n = df.count()
    val row = obs.get
    assert(row("rows_seen") == n)
    assert(row("large_qty_rows").asInstanceOf[Long] > 0)
  }

  test("distCp copies every file with identical sizes") {
    val dst = Files.createTempDirectory("graft-distcp-").toString
    val copied = HadoopTools.distCp(spark, sf, dst)
    val srcFiles = new java.io.File(sf).listFiles().filter(_.isFile)
      .map(f => f.getName -> f.length()).toMap
    // ignore the .crc sidecars Hadoop's checksummed local FS writes
    val dstFiles = new java.io.File(dst).listFiles().filter(_.isFile)
      .filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.length()).toMap
    assert(copied == srcFiles.size)
    assert(dstFiles == srcFiles)
  }

  test("checksum-verified distCp catches a size-equal corrupted copy") {
    val dst = Files.createTempDirectory("graft-distcpv-").toString
    val report = HadoopTools.distCpVerified(spark, sf, dst).collect()
    assert(report.nonEmpty && report.forall(_.getBoolean(5)))
    // corrupt one destination file WITHOUT changing its size — the
    // exact failure a size-only compare (r2's distcp spec) accepts
    val victim = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).head
    val raf = new java.io.RandomAccessFile(victim, "rw")
    val pos = victim.length() / 2
    raf.seek(pos)
    val b = raf.read()
    raf.seek(pos)
    raf.write(b ^ 0xff)
    raf.close()
    val after = HadoopTools.verifyCopy(spark, sf, dst).collect()
    val bad = after.filter(!_.getBoolean(5))
    assert(bad.map(_.getString(0)).toSeq == Seq(victim.getName))
    // sizes still agree — only the checksum sees the corruption
    assert(bad.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("distCp -update copies only the delta and is idempotent") {
    val dst = Files.createTempDirectory("graft-distcpu-").toString
    val total = new java.io.File(sf).listFiles().count(_.isFile)
    // first run: cold destination, everything copies
    val (c1, s1) = HadoopTools.distCpUpdate(spark, sf, dst)
    assert(c1 == total && s1 == 0, s"cold run: copied $c1, skipped $s1")
    // second run: unchanged tree, nothing copies
    val (c2, s2) = HadoopTools.distCpUpdate(spark, sf, dst)
    assert(c2 == 0 && s2 == total, s"warm run: copied $c2, skipped $s2")
    // corrupt one destination byte (size preserved): exactly that one
    // file re-copies, and the tree verifies clean again
    val victim = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).head
    val raf = new java.io.RandomAccessFile(victim, "rw")
    raf.seek(victim.length() / 2)
    val b = raf.read(); raf.seek(victim.length() / 2); raf.write(b ^ 0xff)
    raf.close()
    // the checksummed local FS caches a .crc sidecar that now
    // mismatches the flipped byte; drop it so the re-read sees the
    // corrupted bytes rather than throwing ChecksumException
    new java.io.File(victim.getParent, "." + victim.getName + ".crc").delete()
    val (c3, s3) = HadoopTools.distCpUpdate(spark, sf, dst)
    assert(c3 == 1 && s3 == total - 1, s"delta run: copied $c3, skipped $s3")
    assert(HadoopTools.verifyCopy(spark, sf, dst).collect()
      .forall(_.getBoolean(5)))
  }

  test("hadoop-streaming pipe round-trips records through a process") {
    val n = graft.operators.StreamingPipe
      .pipe(spark, Tables.documents(spark, sf).select("doc_id"), "cat")
      .count()
    assert(n == 500)
  }

  test("dfs utilities: ls/du/count/mkdirs/exists/rm") {
    import graft.sources.Dfs
    val entries = Dfs.ls(sf)
    assert(entries.exists(_._1 == "lineitem.parquet"))
    assert(Dfs.du(sf) == entries.map(_._3).sum)
    // fs -count triple agrees with the listing and du
    val (dirs, files, bytes) = Dfs.count(sf)
    assert(files == entries.count(!_._2))
    assert(bytes == Dfs.du(sf))
    assert(dirs >= 1) // the path itself counts
    val tmp = Files.createTempDirectory("graft-dfs-").toString + "/x/y"
    assert(Dfs.mkdirs(tmp) && Dfs.exists(tmp))
    assert(Dfs.rm(tmp, recursive = true) && !Dfs.exists(tmp))
  }

  test("df reports filesystem capacity/used/remaining consistently") {
    import graft.sources.Dfs
    val (cap, used, rem) = Dfs.df(sf)
    assert(cap > 0, "capacity must be positive")
    assert(used >= 0 && rem >= 0)
    assert(used <= cap && rem <= cap)
    // the data under this path is part of what the fs reports used
    assert(used >= Dfs.du(sf))
  }

  test("getmerge concatenates part files into one local file") {
    import graft.sources.Dfs
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-gm-").toString + "/parts"
    Tables.documents(spark, sf)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
      .repartition(4).write.text(dir)
    val merged = Files.createTempDirectory("graft-gm-out-")
      .resolve("merged.txt").toString
    val written = Dfs.getmerge(dir, merged)
    assert(written > 0 && new java.io.File(merged).length() == written)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(merged))
    assert(lines.size() == 500, s"expected 500 merged lines, got ${lines.size}")
  }

  test("trash semantics: rm moves to Current, expunge honors retention") {
    import graft.sources.Dfs
    val root = Files.createTempDirectory("graft-trash-").toString
    val trash = root + "/.Trash"
    val victim = root + "/data.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(victim), "precious")
    // safe delete: gone from its path, recoverable from Current
    assert(Dfs.rmToTrash(victim, trash))
    assert(!Dfs.exists(victim))
    assert(Dfs.exists(trash + "/Current/data.txt"))
    // same-name delete doesn't clobber the trashed copy
    java.nio.file.Files.writeString(java.nio.file.Paths.get(victim), "v2")
    assert(Dfs.rmToTrash(victim, trash))
    assert(Dfs.ls(trash + "/Current").count(_._1.startsWith("data.txt")) == 2)
    // checkpoint + expunge: young checkpoint survives, old one goes
    val t0 = 1700000000000L
    assert(Dfs.checkpointTrash(trash, t0))
    assert(!Dfs.exists(trash + "/Current"))
    assert(Dfs.expungeTrash(trash, retentionMs = 86400000L, nowMs = t0 + 3600000L) == 0)
    assert(Dfs.expungeTrash(trash, retentionMs = 86400000L, nowMs = t0 + 2 * 86400000L) == 1)
    assert(Dfs.ls(trash).isEmpty)
  }

  test("pi estimate lands near pi") {
    val row = SparkEntry.queries("mr_pi")(spark, sf).collect()(0)
    val pi = row.getLong(2) / 10000.0
    assert(math.abs(pi - math.Pi) < 0.02, s"pi estimate $pi")
  }

  test("metadata ops: touchz/chmod/stat/setrep/chown complete the FsShell surface") {
    import graft.sources.Dfs
    val root = java.nio.file.Files
      .createTempDirectory("graft-meta-").toString
    val f = root + "/zero.dat"
    Dfs.touchz(f)
    assert(Dfs.exists(f))
    assert(intercept[IllegalArgumentException](Dfs.touchz(f))
      .getMessage.contains("already exists"))
    val st0 = Dfs.stat(f)
    assert(!st0.isDir && st0.len == 0 && st0.name == "zero.dat")
    assert(st0.blockSize > 0 && st0.mtimeMs > 0)
    Dfs.chmod(f, "640")
    assert(Dfs.stat(f).perm == "rw-r-----")
    Dfs.chmod(f, "755")
    assert(Dfs.stat(f).perm == "rwxr-xr-x")
    // local FS accepts (and ignores) replication requests — the API
    // contract the shell's setrep exercises
    assert(Dfs.setrep(f, 3))
    // chown to the current owner is the identity op every FS permits
    val cur = Dfs.stat(f)
    Dfs.chown(f, cur.owner, cur.group)
    assert(Dfs.stat(f).owner == cur.owner)
    Dfs.rm(root, recursive = true)
  }

  test("copy/inspect ops: cp/mv/tail/head/test/truncate/concat") {
    import graft.sources.Dfs
    val root = java.nio.file.Files
      .createTempDirectory("graft-cpmv-").toString
    def write(p: String, s: String) =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
    def read(p: String) =
      java.nio.file.Files.readString(java.nio.file.Paths.get(p))

    // cp: file copy is byte-exact; dir copy recurses
    write(root + "/a.txt", "alpha\n")
    assert(Dfs.cp(root + "/a.txt", root + "/a2.txt") == 6L)
    assert(read(root + "/a2.txt") == "alpha\n")
    Dfs.mkdirs(root + "/d/sub")
    write(root + "/d/one.txt", "1")
    write(root + "/d/sub/two.txt", "22")
    assert(Dfs.cp(root + "/d", root + "/dcopy") == 3L)
    assert(read(root + "/dcopy/one.txt") == "1" &&
      read(root + "/dcopy/sub/two.txt") == "22")

    // mv: rename, source gone
    assert(Dfs.mv(root + "/a2.txt", root + "/moved.txt"))
    assert(!Dfs.exists(root + "/a2.txt") &&
      read(root + "/moved.txt") == "alpha\n")

    // tail/head: bounded reads from either end
    val body = ("x" * 2000) + "THE-END"
    write(root + "/big.txt", body)
    assert(new String(Dfs.tail(root + "/big.txt", 7), "UTF-8") == "THE-END")
    assert(new String(Dfs.head(root + "/big.txt", 4), "UTF-8") == "xxxx")
    // n larger than the file returns the whole file, no error
    assert(new String(Dfs.tail(root + "/a.txt", 1024), "UTF-8") == "alpha\n")

    // test: -e/-d/-f/-s/-z
    assert(Dfs.test(root + "/d", 'e') && Dfs.test(root + "/d", 'd'))
    assert(Dfs.test(root + "/a.txt", 'f') && Dfs.test(root + "/a.txt", 's'))
    Dfs.touchz(root + "/empty.dat")
    assert(Dfs.test(root + "/empty.dat", 'z') &&
      !Dfs.test(root + "/empty.dat", 's'))
    assert(!Dfs.test(root + "/nope", 'e'))

    // truncate: keeps the prefix
    assert(Dfs.truncate(root + "/big.txt", 4))
    assert(read(root + "/big.txt") == "xxxx")

    // concat: target := target ++ srcs (in order), srcs removed —
    // the observable Concat.java contract, via the streamed fallback
    // on the local FS
    write(root + "/c0.txt", "AA")
    write(root + "/c1.txt", "BB")
    write(root + "/c2.txt", "CC")
    Dfs.concat(root + "/c0.txt", Seq(root + "/c1.txt", root + "/c2.txt"))
    assert(read(root + "/c0.txt") == "AABBCC")
    assert(!Dfs.exists(root + "/c1.txt") && !Dfs.exists(root + "/c2.txt"))
    // no staging residue
    assert(Dfs.ls(root).forall(!_._1.contains(".concat")))
    Dfs.rm(root, recursive = true)
  }

  test("xattrs and snapshots: set/get/list/remove, frozen reads") {
    import graft.sources.Dfs
    val root = java.nio.file.Files
      .createTempDirectory("graft-xattr-").toString
    def write(p: String, s: String) =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
    def read(p: String) =
      java.nio.file.Files.readString(java.nio.file.Paths.get(p))

    // xattr round-trip (XAttrCommands contract)
    write(root + "/data.txt", "payload")
    // names containing '=' or '\n' must round-trip exactly (the
    // sidecar hex-encodes names as well as values)
    Dfs.setfattr(root + "/data.txt", "user.k=odd\nname", "v1".getBytes)
    assert(new String(
      Dfs.getfattr(root + "/data.txt", "user.k=odd\nname").get) == "v1")
    Dfs.removefattr(root + "/data.txt", "user.k=odd\nname")
    assert(Dfs.getfattr(root + "/data.txt", "user.k=odd\nname").isEmpty)
    assert(Dfs.getfattr(root + "/data.txt", "user.owner").isEmpty)
    Dfs.setfattr(root + "/data.txt", "user.owner", "pipeline-a".getBytes)
    Dfs.setfattr(root + "/data.txt", "user.stage", "raw".getBytes)
    assert(new String(Dfs.getfattr(root + "/data.txt", "user.owner").get)
      == "pipeline-a")
    assert(Dfs.listfattr(root + "/data.txt")
      == Seq("user.owner", "user.stage"))
    // overwrite in place
    Dfs.setfattr(root + "/data.txt", "user.stage", "clean".getBytes)
    assert(new String(Dfs.getfattr(root + "/data.txt", "user.stage").get)
      == "clean")
    Dfs.removefattr(root + "/data.txt", "user.owner")
    assert(Dfs.getfattr(root + "/data.txt", "user.owner").isEmpty)
    assert(Dfs.listfattr(root + "/data.txt") == Seq("user.stage"))

    // snapshot: freeze, mutate the live dir, snapshot still serves
    // the old bytes (SnapshotCommands contract)
    Dfs.mkdirs(root + "/table")
    write(root + "/table/part-0.txt", "v1")
    val snap = Dfs.createSnapshot(root + "/table", "s1")
    write(root + "/table/part-0.txt", "v2-mutated")
    Dfs.touchz(root + "/table/part-1.txt")
    assert(read(root + "/table/part-0.txt") == "v2-mutated")
    assert(read(snap + "/part-0.txt") == "v1")
    assert(!Dfs.exists(snap + "/part-1.txt"))
    // a second snapshot coexists; deleting one leaves the other
    val snap2 = Dfs.createSnapshot(root + "/table", "s2")
    assert(read(snap2 + "/part-0.txt") == "v2-mutated")
    Dfs.deleteSnapshot(root + "/table", "s1")
    assert(!Dfs.exists(snap) && Dfs.exists(snap2))
    assert(read(root + "/table/part-0.txt") == "v2-mutated")
    Dfs.rm(root, recursive = true)
  }

  test("appendToFile: creates, appends, equals the concatenation") {
    import graft.sources.Dfs
    val root = Files.createTempDirectory("graft-append-").toString
    val p = root + "/log.txt"
    Dfs.appendToFile(p, "alpha ".getBytes("UTF-8"))   // create
    Dfs.appendToFile(p, "beta ".getBytes("UTF-8"))    // append
    Dfs.appendToFile(p, "gamma".getBytes("UTF-8"))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(p)) == "alpha beta gamma")
    // no swap residue next to the file
    val residue = new java.io.File(root).listFiles
      .map(_.getName).filter(n => n.contains(".append") || n.contains(".orig"))
    assert(residue.isEmpty, s"append residue: ${residue.toSeq}")
    Dfs.rm(root, recursive = true)
  }

  test("hflush visibility: readers see flushed bytes while the writer is open") {
    import graft.sources.Dfs
    val root = Files.createTempDirectory("graft-hflush-").toString
    val p = root + "/grow.log"
    def visible(): String =
      new String(Dfs.head(p, 1024), "UTF-8")
    val out = Dfs.createLogStream(p)
    try {
      // Syncable's visibility half: every hflushed prefix is readable
      // by a NEW reader before the writer closes (fs/Syncable.java:1)
      out.write("one ".getBytes("UTF-8"))
      out.hflush()
      assert(visible() == "one ", "hflushed bytes not visible to reader")
      out.write("two ".getBytes("UTF-8"))
      out.hsync() // hflush + stable storage; same visibility guarantee
      assert(visible() == "one two ")
      // un-flushed bytes sit in the stream buffer (io.file.buffer.size
      // is 4KB — 5 bytes cannot force a spill): this pins that the
      // local fallback makes hflush the ACTUAL visibility barrier,
      // not a no-op riding on write-through
      out.write("three".getBytes("UTF-8"))
      assert(visible() == "one two ",
        "bytes leaked to readers before hflush — barrier is vacuous")
      out.hflush()
      assert(visible() == "one two three")
    } finally out.close()
    // close changes nothing further for readers
    assert(visible() == "one two three")
    Dfs.rm(root, recursive = true)
  }

  test("find: predicate-tree search matches the reference's walk") {
    import graft.sources.Dfs
    import graft.sources.Dfs.FindExpr._
    val root = Files.createTempDirectory("graft-find-").toString
    def write(p: String, s: String) =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
    Dfs.mkdirs(root + "/logs/2024")
    Dfs.mkdirs(root + "/data")
    write(root + "/logs/app.log", "x" * 10)
    write(root + "/logs/2024/app.log", "x" * 5000)
    write(root + "/logs/2024/audit.LOG", "y" * 20)
    write(root + "/data/part-0.parquet", "z" * 100)
    def names(rs: Seq[String]) =
      rs.map(_.split('/').takeRight(2).mkString("/"))
    // -name glob over base names, preorder + name-sorted children
    assert(names(Dfs.find(root, Name("*.log")))
      == Seq("2024/app.log", "logs/app.log"))
    // -iname
    assert(Dfs.find(root, Name("*.log", ignoreCase = true)).length == 3)
    // -name -size composition (the shell's implicit -a)
    assert(names(Dfs.find(root, All(Seq(Name("*.log"), Size('+', 1000L)))))
      == Seq("2024/app.log"))
    // -type d matches dirs only, including the root itself
    val dirs = Dfs.find(root, Type('d'))
    assert(dirs.length == 4 && dirs.head.endsWith(root.split('/').last))
    // negation + disjunction compose
    assert(names(Dfs.find(root, All(Seq(Type('f'),
      Not(Any(Seq(Name("*.log"), Name("*.LOG"))))))))
      == Seq("data/part-0.parquet"))
    // -mtime: age the 2024 files 3 days, then split old vs new
    val now = System.currentTimeMillis()
    Seq("/logs/2024/app.log", "/logs/2024/audit.LOG").foreach { p =>
      assert(new java.io.File(root + p)
        .setLastModified(now - 3L * 86400000L - 60000L))
    }
    assert(names(Dfs.find(root, All(Seq(Type('f'), Mtime('+', 2, now)))))
      == Seq("2024/app.log", "2024/audit.LOG"))
    assert(Dfs.find(root, All(Seq(Type('f'), Mtime('-', 2, now))))
      .length == 2)
    Dfs.rm(root, recursive = true)
  }

  test("text/checksum render every staging like its direct reader") {
    import graft.sources.Dfs
    val root = Files.createTempDirectory("graft-text-").toString
    val lines = Seq("first line", "second line", "third")
    // plain text
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root + "/plain.txt"), lines.mkString("\n"))
    assert(Dfs.text(root + "/plain.txt") == lines)
    // gzip: codec resolved from the extension, like the shell factory
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(root + "/packed.gz"))
    gz.write(lines.mkString("\n").getBytes("UTF-8")); gz.close()
    assert(Dfs.text(root + "/packed.gz") == lines)
    // SequenceFile: one key\tvalue line per record
    val conf = new org.apache.hadoop.conf.Configuration()
    val w = org.apache.hadoop.io.SequenceFile.createWriter(conf,
      org.apache.hadoop.io.SequenceFile.Writer.file(
        new org.apache.hadoop.fs.Path(root + "/kv.seq")),
      org.apache.hadoop.io.SequenceFile.Writer.keyClass(
        classOf[org.apache.hadoop.io.LongWritable]),
      org.apache.hadoop.io.SequenceFile.Writer.valueClass(
        classOf[org.apache.hadoop.io.Text]))
    lines.zipWithIndex.foreach { case (s, i) =>
      w.append(new org.apache.hadoop.io.LongWritable(i),
        new org.apache.hadoop.io.Text(s))
    }
    w.close()
    assert(Dfs.text(root + "/kv.seq")
      == lines.zipWithIndex.map { case (s, i) => s"$i\t$s" })
    // checksum: content MD5, equal iff bytes equal
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root + "/copy.txt"), lines.mkString("\n"))
    assert(Dfs.checksum(root + "/plain.txt")
      == Dfs.checksum(root + "/copy.txt"))
    assert(Dfs.checksum(root + "/plain.txt")
      != Dfs.checksum(root + "/packed.gz"))
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(Dfs.checksum(root + "/plain.txt") == expect)
    Dfs.rm(root, recursive = true)
  }

  test("count -q quotas: usage reporting and over-quota write refusal") {
    import graft.sources.Dfs
    val root = Files.createTempDirectory("graft-quota-").toString
    Dfs.mkdirs(root + "/proj")
    // namespace quota 4 = the dir itself + 3 children (the HDFS rule:
    // every name in the tree counts, including the root)
    Dfs.setQuota(root + "/proj", nsQuota = 4L, spaceQuota = 100L)
    Dfs.createEnforced(root + "/proj/a.dat", Array.fill(30)('a'.toByte))
    Dfs.createEnforced(root + "/proj/b.dat", Array.fill(30)('b'.toByte))
    val q = Dfs.countQ(root + "/proj")
    assert(q.quota == 4L && q.quotaRemaining == 1L)
    assert(q.spaceQuota == 100L && q.spaceRemaining == 40L)
    assert(q.dirs == 1L && q.files == 2L && q.bytes == 60L)
    // space refusal: 41 more bytes would exceed 100
    intercept[Dfs.DsQuotaExceededException] {
      Dfs.createEnforced(root + "/proj/c.dat", Array.fill(41)('c'.toByte))
    }
    assert(!Dfs.exists(root + "/proj/c.dat"), "refused write left a file")
    // a fitting file still lands (quota gates, not blocks, writes)
    Dfs.createEnforced(root + "/proj/c.dat", Array.fill(10)('c'.toByte))
    // namespace refusal: the 4th child is one name too many
    intercept[Dfs.NsQuotaExceededException] {
      Dfs.createEnforced(root + "/proj/d.dat", Array.empty[Byte])
    }
    intercept[Dfs.NsQuotaExceededException] {
      Dfs.mkdirsEnforced(root + "/proj/subdir")
    }
    // overwriting an existing file adds no name: allowed within space
    Dfs.createEnforced(root + "/proj/c.dat", Array.fill(20)('c'.toByte))
    assert(Dfs.countQ(root + "/proj").bytes == 80L)
    // quotas on an ancestor gate writes deeper in the tree too
    Dfs.clearQuota(root + "/proj")
    Dfs.setQuota(root + "/proj", nsQuota = -1L, spaceQuota = 90L)
    Dfs.mkdirsEnforced(root + "/proj/nested")
    intercept[Dfs.DsQuotaExceededException] {
      Dfs.createEnforced(root + "/proj/nested/big.dat",
        Array.fill(20)('x'.toByte))
    }
    // clearing restores unlimited (-1/none columns)
    Dfs.clearQuota(root + "/proj")
    val cleared = Dfs.countQ(root + "/proj")
    assert(cleared.quota == -1L && cleared.spaceRemaining == -1L)
    Dfs.createEnforced(root + "/proj/nested/big.dat",
      Array.fill(500)('x'.toByte))
    Dfs.rm(root, recursive = true)
  }

  test("mount table: one logical namespace over two backends (viewfs analog)") {
    import graft.sources.{Dfs, MountTable}
    val warm = java.nio.file.Files.createTempDirectory("graft-mnt-warm-")
      .toString
    val cold = java.nio.file.Files.createTempDirectory("graft-mnt-cold-")
      .toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(warm, "x.txt"), "hello mounts")
    val mt = MountTable(Map(
      "/data/warm" -> warm, "/data/cold" -> cold))
    // internal dirs are synthesized by the view: "/" lists "data",
    // "/data" lists the two mount points, and both are read-only
    assert(mt.ls("/").map(_._1) == Seq("data"))
    assert(mt.ls("/data").map(_._1) == Seq("cold", "warm"))
    assert(mt.exists("/data") && mt.isInternal("/data"))
    intercept[org.apache.hadoop.security.AccessControlException] {
      mt.mkdirs("/data/new-top")
    }
    intercept[org.apache.hadoop.security.AccessControlException] {
      mt.rm("/data", recursive = true)
    }
    // resolution reaches through to the backends; shell ops follow
    assert(mt.exists("/data/warm/x.txt"))
    assert(mt.ls("/data/warm").map(_._1) == Seq("x.txt"))
    assert(mt.du("/data/warm/x.txt") == 12L)
    // copy CROSSES backends (bytes move, names stay per-mount)
    assert(mt.cp("/data/warm/x.txt", "/data/cold/x.txt") == 12L)
    assert(Dfs.exists(cold + "/x.txt"), "copy did not land on the cold backend")
    // rename across mount points is rejected — the viewfs contract
    intercept[java.io.IOException] {
      mt.mv("/data/warm/x.txt", "/data/cold/y.txt")
    }
    // same-mount rename works and stays on its backend
    assert(mt.mv("/data/warm/x.txt", "/data/warm/y.txt"))
    assert(Dfs.exists(warm + "/y.txt") && !Dfs.exists(warm + "/x.txt"))
    // longest-prefix resolution: a nested link shadows its parent
    val hot = java.nio.file.Files.createTempDirectory("graft-mnt-hot-")
      .toString
    val nested = MountTable(Map(
      "/data" -> warm, "/data/hot" -> hot))
    nested.mkdirs("/data/hot/d")
    assert(Dfs.exists(hot + "/d") && !Dfs.exists(warm + "/hot"),
      "nested link did not shadow its parent")
    assert(nested.exists("/data/y.txt"), "parent link lost its remainder")
    // fallback backend catches unlinked paths (linkFallback analog)
    val fb = MountTable(Map("/data/warm" -> warm), fallback = Some(cold))
    assert(fb.exists("/x.txt"), "fallback did not resolve an unlinked path")
    assert(fb.resolve("/x.txt") == cold + "/x.txt")
    // unlinked with NO fallback fails like NotInMountpointException
    intercept[java.io.FileNotFoundException] { mt.resolve("/elsewhere/f") }
    // the point of the exercise: Spark reads through the view
    val sp = TestSpark.spark
    graft.sources.Tables.nation(sp, TestSpark.sf)
      .write.parquet(mt.resolve("/data/cold/nation"))
    assert(sp.read.parquet(mt.resolve("/data/cold/nation")).count() == 25L)
  }

  test("fsck: structural audit flags truncated, clobbered and empty files") {
    import java.nio.file.{Files => JF, Paths, StandardOpenOption}
    val root = JF.createTempDirectory("graft-fsck-").toString
    def cp(name: String): java.nio.file.Path =
      JF.copy(Paths.get(sf, name), Paths.get(root, name))
    cp("nation.parquet"); cp("region.parquet")
    val truncated = cp("orders.parquet")
    JF.write(Paths.get(root, "notes.txt"), "hello".getBytes)
    JF.createFile(Paths.get(root, "empty.parquet"))
    JF.createFile(Paths.get(root, "_SUCCESS")) // metadata: must be skipped
    // truncate: tail magic gone — the half-uploaded-file shape
    val ch = java.nio.channels.FileChannel.open(truncated,
      StandardOpenOption.WRITE)
    ch.truncate(ch.size() - 16); ch.close()
    // clobbered head on an otherwise intact copy
    val clobbered = Paths.get(root, "events.parquet")
    JF.copy(Paths.get(sf, "events.parquet"), clobbered)
    val raf = new java.io.RandomAccessFile(clobbered.toFile, "rw")
    raf.seek(0); raf.writeBytes("XXXX"); raf.close()
    // every other audited format: stage one real file of each kind
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft-fsck-fmt-")
    def liftPart(sub: String, ext: String, name: String): Unit = {
      val part = new java.io.File(stage.resolve(sub).toString)
        .listFiles().filter(f => f.isFile && f.getName.endsWith(ext)).head
      JF.copy(part.toPath, Paths.get(root, name))
    }
    val two = Seq((1L, "a"), (2L, "b")).toDF("key", "value")
    two.write.orc(stage.resolve("orc").toString)
    liftPart("orc", ".orc", "data.orc")
    // fsck's avro check is the container magic (Obj\x01) — stage a
    // minimal header-correct file rather than spin up the RDD writer
    JF.write(Paths.get(root, "data.avro"),
      Array[Byte]('O', 'b', 'j', 1) ++ "syncmarker".getBytes)
    two.select(concat_ws("\t", col("key"), col("value")).as("value"))
      .write.option("compression", "gzip")
      .text(stage.resolve("gz").toString)
    liftPart("gz", ".gz", "data.txt.gz")
    two.select(col("key"), col("value"))
      .write.format(graft.sources.sequence.SequenceFileSource.NAME)
      .mode("overwrite").save(stage.resolve("seq").toString)
    val seqPart = new java.io.File(stage.resolve("seq").toString)
      .listFiles().filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_")).head
    JF.copy(seqPart.toPath, Paths.get(root, "data.seq"))
    // a gz whose frame magic was clobbered
    JF.write(Paths.get(root, "bad.txt.gz"), Array[Byte](0x50, 0x4b, 1, 2))
    val rows = HadoopTools.fsck(spark, root).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(rows.size == 11, s"expected 11 audited files, got $rows")
    assert(rows("nation.parquet") == "HEALTHY")
    assert(rows("region.parquet") == "HEALTHY")
    assert(rows("notes.txt") == "HEALTHY")
    assert(rows("data.orc") == "HEALTHY")
    assert(rows("data.avro") == "HEALTHY")
    assert(rows("data.txt.gz") == "HEALTHY")
    assert(rows("data.seq") == "HEALTHY")
    assert(rows("empty.parquet") == "EMPTY")
    assert(rows("orders.parquet") == "CORRUPT: tail magic")
    assert(rows("events.parquet") == "CORRUPT: head magic")
    assert(rows("bad.txt.gz") == "CORRUPT: head magic")
    assert(!rows.contains("_SUCCESS"))
  }
}
