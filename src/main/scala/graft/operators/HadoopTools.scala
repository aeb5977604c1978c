package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-expressions of the Hadoop tool surface (SURVEY.md §2): counters,
  * DistCp, TeraGen, and the Pi example.
  *
  * Reference anchors: file copy primitive = hadoop-common-project/
  * hadoop-common/src/main/java/org/apache/hadoop/fs/FileUtil.java:336;
  * the tools themselves live in hadoop-mapreduce-project/hadoop-tools,
  * which the vendored tree omits (its package index at
  * /root/reference/README.txt:26 lists it) — semantics are from the
  * public Hadoop examples.
  */
object HadoopTools {

  /** MR counters -> the Observation API: named aggregates collected on
    * the driver as a side effect of a normal action, no second job.
    * Returns (df, observation); callers read observation.get after an
    * action. */
  def withCounters(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("graft_counters")
    (df.observe(obs, count(lit(1)).as("rows_seen"),
      sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("large_qty_rows")),
      obs)
  }

  /** DistCp: the file list is parallelized across the cluster and each
    * task copies its files through the Hadoop FileSystem API — the
    * same shape as hadoop-tools' DistCp (driver plans, tasks copy).
    * Per-file imperative I/O is exactly the mapPartitions-tier use
    * case: there is no relational structure to declare. */
  def distCp(s: SparkSession, src: String, dst: String): Long = {
    val conf = new Configuration()
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val files = fs.listStatus(srcPath).filter(_.isFile)
      .map(_.getPath.toString).toSeq
    val confBc = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val dstStr = dst
    s.sparkContext.parallelize(files, math.max(files.size, 1))
      .map { f =>
        val c = confBc.value.value
        val from = new Path(f)
        val to = new Path(dstStr, from.getName)
        FileUtil.copy(from.getFileSystem(c), from,
          to.getFileSystem(c), to, false, true, c)
        1L
      }.sum().toLong
  }

  /** DistCp -update: the INCREMENTAL copy — each task re-copies its
    * file only when the destination is missing or differs (size, then
    * checksum; same skip criteria real DistCp's -update applies).
    * Returns (copied, skipped). Idempotent: a second run over an
    * unchanged tree copies nothing — the property that makes repeated
    * 100 TB sync jobs pay only for the delta. */
  def distCpUpdate(s: SparkSession, src: String, dst: String): (Long, Long) = {
    val conf = new Configuration()
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val files = fs.listStatus(srcPath).filter(_.isFile)
      .map(_.getPath.toString).toSeq
    val confBc = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val dstStr = dst
    val results = s.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .map { f =>
        val c = confBc.value.value
        val from = new Path(f)
        val to = new Path(dstStr, from.getName)
        val ffs = from.getFileSystem(c)
        val tfs = to.getFileSystem(c)
        val unchanged = tfs.exists(to) &&
          tfs.getFileStatus(to).getLen == ffs.getFileStatus(from).getLen &&
          md5Of(tfs, to) == md5Of(ffs, from)
        if (unchanged) (0L, 1L)
        else {
          FileUtil.copy(ffs, from, tfs, to, false, true, c)
          (1L, 0L)
        }
      }.collect()
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /** Per-file MD5 of a filesystem stream, computed where the task
    * runs — the integrity primitive behind checksum-verified copies.
    * (The reference exposes FileChecksum via the FileSystem contract
    * — hadoop-common/.../fs/CompositeCrcFileChecksum.java,
    * ChecksumFileSystem.java — but local/raw filesystems return null
    * there, so the digest is computed from the bytes themselves,
    * which also makes it comparable ACROSS filesystems, the case
    * composite-CRC checksums famously are not.) */
  private def md5Of(fs0: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    // hash the RAW bytes: on a ChecksumFileSystem a corrupted replica
    // would throw ChecksumException on read instead of letting the
    // verifier REPORT the mismatch (and the .crc sidecar itself can be
    // stale); the digest's whole job is to judge the bytes on disk
    val fs = fs0 match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](128 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Checksum verification of a completed copy: the file list fans out
    * across tasks and each task hashes BOTH sides of its files. This
    * is what real DistCp's verify step does — byte sizes alone accept
    * the size-equal-but-corrupt copy that checksums exist to catch.
    * Returns one row per source file:
    * (file, src_bytes, dst_bytes, src_md5, dst_md5, ok). */
  def verifyCopy(s: SparkSession, src: String, dst: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val conf = new Configuration()
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val files = fs.listStatus(srcPath).filter(_.isFile)
      .map(_.getPath.getName).toSeq
    val confBc = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val (srcStr, dstStr) = (src, dst)
    s.sparkContext.parallelize(files, math.max(files.size, 1))
      .map { name =>
        val c = confBc.value.value
        val from = new Path(srcStr, name)
        val to = new Path(dstStr, name)
        val ffs = from.getFileSystem(c)
        val tfs = to.getFileSystem(c)
        val srcBytes = ffs.getFileStatus(from).getLen
        val (dstBytes, dstMd5) =
          if (tfs.exists(to)) (tfs.getFileStatus(to).getLen, md5Of(tfs, to))
          else (-1L, "")
        val srcMd5 = md5Of(ffs, from)
        (name, srcBytes, dstBytes, srcMd5, dstMd5,
          srcBytes == dstBytes && srcMd5 == dstMd5)
      }
      .toDF("file", "src_bytes", "dst_bytes", "src_md5", "dst_md5", "ok")
  }

  /** DistCp with post-copy checksum verification: copies, then fails
    * loudly if any destination file's digest disagrees with its
    * source. Returns the per-file verification report. */
  def distCpVerified(s: SparkSession, src: String, dst: String): DataFrame = {
    distCp(s, src, dst)
    val report = verifyCopy(s, src, dst)
    val bad = report.filter(!col("ok")).count()
    if (bad > 0) throw new java.io.IOException(
      s"distcp verification failed for $bad file(s): $src -> $dst")
    report
  }

  /** TeraGen re-expressed: spark.range + deterministic derived columns
    * (rolling_hash keys), checksummed. Fully oracle-able because the
    * DuckDB side can generate the identical range and fold. */
  def teragen(s: SparkSession, d: String): DataFrame = {
    val n = 100000L
    s.range(n)
      .select(graft.functions.RollingHash.rollingHash(
        col("id").cast("string")).as("key"), col("id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("key")).as("checksum"),
        min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
  }

  /** TeraValidate: prove the range-partitioned global sort (the
    * TeraSort output contract) really is totally ordered, the way the
    * MR original did — each task validates ITS partition's order and
    * emits (first, last, checksum); only the tiny per-partition
    * boundary records meet a final single pass. No global window, no
    * second sort: the validation is as distributed as the sort. */
  def teraValidate(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val n = 100000L
    val sorted = s.range(n)
      .select(graft.functions.RollingHash.rollingHash(
        col("id").cast("string")).as("key"))
      .orderBy(col("key"))
      .as[Long]
    val perPart = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (!it.hasNext) Iterator.empty
      else {
        var prev = it.next()
        val first = prev
        var cnt = 1L
        var sum = prev
        var violations = 0L
        while (it.hasNext) {
          val v = it.next()
          if (v < prev) violations += 1
          prev = v; cnt += 1; sum += v
        }
        Iterator((pid, first, prev, cnt, sum, violations))
      }
    }.toDF("pid", "first", "last", "cnt", "sum", "violations")
    // boundary check over the per-partition records (32 rows, not 100k)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
    perPart
      .withColumn("prev_last", lag(col("last"), 1).over(w))
      .withColumn("boundary_violation",
        when(col("prev_last") > col("first"), 1L).otherwise(0L))
      .agg(sum(col("cnt")).as("n_rows"),
        sum(col("sum")).as("checksum"),
        (sum(col("violations")) + sum(col("boundary_violation")))
          .as("violations"))
  }

  /** The Pi example, hash-derived: dart i has integer coordinates
    * (x, y) = rolling-hash folds of md5 hex digests keyed by i, each
    * uniform in [0, P) with P = 2^31 - 1; the dart is inside the
    * quarter circle iff x² + y² < P² (pure 64-bit integer arithmetic:
    * 2·(P-1)² < 2^63). md5-then-fold makes the dart stream both
    * statistically uniform and EXACTLY reproducible in DuckDB SQL, so
    * unlike the classic per-mapper-seeded java.util.Random version
    * this one has a full hash-match oracle, while still fanning the
    * dart range across partitions like the MR Pi example fans mappers. */
  def piEstimate(s: SparkSession, d: String): DataFrame = {
    val n = 400000L
    def coord(salt: String) = graft.functions.RollingHash.rollingHash(
      md5(concat(lit(salt), col("id").cast("string")).cast("binary")))
    s.range(0, n, 1, 16)
      .select(coord("x").as("x"), coord("y").as("y"))
      .select((col("x") * col("x") + col("y") * col("y") <
        lit(2147483647L) * lit(2147483647L)).cast("long").as("inside"))
      .agg(sum(col("inside")).as("hits"), count(lit(1)).as("darts"))
      .withColumn("pi_x10000",
        expr("(40000 * hits) div darts")) // 4*hits/darts in fixed point
  }

  /** fsck analog: distributed structural-integrity audit of a lake
    * directory (reference: `hdfs fsck` — the vendored tree's hdfs
    * module documents it under hdfs/server/namenode/NamenodeFsck.java;
    * see also the shell checksum surface, fs/shell/Display.java).
    * HDFS fsck audits BLOCK health from namenode metadata; on a
    * delegated filesystem the block layer belongs to the store, so
    * the lake-level equivalent audits FORMAT health: the driver plans
    * (one recursive listing, namenode-scale like DistCp's), tasks
    * probe their files where they run — bounded positional reads
    * only, never a full-file scan, so a 100 TB tree costs one head
    * and one tail read per file:
    *  - .parquet: 4-byte "PAR1" magic at BOTH ends, and the footer
    *    length word must address inside the file — catches the two
    *    real-world corruptions (truncated upload, overwritten head)
    *    that make a scan fail hours later;
    *  - .seq: "SEQ" + version at head (SequenceFile.Reader's check);
    *  - .orc: "ORC" head magic; .avro: "Obj"+1 head magic;
    *  - .gz/.bz2/.zst/.lz4: the codec's frame magic at head;
    *  - anything else: the head read alone (readability probe).
    * Zero-length data files report EMPTY (fsck's "missing blocks"
    * moral equivalent), failures name the violated check. Returns
    * per-file rows (path, kind, bytes, status) + an aggregate is one
    * groupBy away; `_SUCCESS`/`.crc`/dot-files are metadata, skipped. */
  def fsck(s: SparkSession, root: String): DataFrame = {
    import s.implicits._
    val conf = new Configuration()
    val rootPath = new Path(root)
    val rfs = rootPath.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = rfs.listFiles(rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith(".") && !name.startsWith("_"))
        files += ((st.getPath.toString, st.getLen))
    }
    val confBc = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val rootStr = rootPath.toUri.getPath
    val probed = s.sparkContext
      .parallelize(files.toSeq, math.max(math.min(files.size, 64), 1))
      .map { case (f, len) =>
        val c = confBc.value.value
        val p = new Path(f)
        val kind = {
          val n = p.getName.toLowerCase
          val base = n.stripSuffix(".gz").stripSuffix(".bz2")
            .stripSuffix(".zst").stripSuffix(".lz4")
          val ext = base.substring(base.lastIndexOf('.') + 1)
          if (n != base) n.substring(n.lastIndexOf('.') + 1) else ext
        }
        def read(fs: org.apache.hadoop.fs.FileSystem, pos: Long,
            n: Int): Array[Byte] = {
          val buf = new Array[Byte](n)
          val in = fs.open(p)
          try { in.readFully(pos, buf, 0, n); buf }
          finally in.close()
        }
        val status =
          try {
            val fs0 = p.getFileSystem(c)
            val fs = fs0 match { // raw bytes: judge the disk, not the .crc
              case cf: org.apache.hadoop.fs.ChecksumFileSystem =>
                cf.getRawFileSystem
              case other => other
            }
            if (len == 0L) "EMPTY"
            else {
              val head = read(fs, 0L, math.min(len, 8L).toInt)
              def headIs(magic: Array[Byte]): Boolean =
                len >= magic.length && head.startsWith(magic)
              kind match {
                case "parquet" =>
                  if (!headIs("PAR1".getBytes)) "CORRUPT: head magic"
                  else if (len < 12L) "CORRUPT: shorter than any footer"
                  else {
                    val tail = read(fs, len - 8L, 8)
                    val footerLen = (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
                      ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
                    if (!(tail(4) == 'P' && tail(5) == 'A' &&
                          tail(6) == 'R' && tail(7) == '1'))
                      "CORRUPT: tail magic"
                    else if (footerLen + 12L > len)
                      "CORRUPT: footer length exceeds file"
                    else "HEALTHY"
                  }
                case "seq" =>
                  if (len >= 4L && headIs("SEQ".getBytes) &&
                      head(3) >= 0 && head(3) <= 6)
                    "HEALTHY"
                  else "CORRUPT: head magic"
                case "orc" =>
                  if (headIs("ORC".getBytes)) "HEALTHY"
                  else "CORRUPT: head magic"
                case "avro" =>
                  if (headIs(Array[Byte]('O', 'b', 'j', 1))) "HEALTHY"
                  else "CORRUPT: head magic"
                case "gz" =>
                  if (headIs(Array[Byte](0x1f, 0x8b.toByte))) "HEALTHY"
                  else "CORRUPT: head magic"
                case "bz2" =>
                  if (headIs("BZh".getBytes)) "HEALTHY"
                  else "CORRUPT: head magic"
                case "zst" =>
                  if (headIs(Array[Byte](0x28, 0xb5.toByte, 0x2f,
                    0xfd.toByte))) "HEALTHY"
                  else "CORRUPT: head magic"
                case "lz4" =>
                  if (headIs(Array[Byte](0x04, 0x22, 0x4d, 0x18))) "HEALTHY"
                  else "CORRUPT: head magic"
                case _ => "HEALTHY" // readability probe succeeded
              }
            }
          } catch {
            case e: java.io.IOException =>
              s"CORRUPT: unreadable (${e.getClass.getSimpleName})"
          }
        val rel = {
          val u = p.toUri.getPath
          if (u.startsWith(rootStr)) u.stripPrefix(rootStr).stripPrefix("/")
          else u
        }
        (rel, kind, len, status)
      }
    probed.toDF("path", "kind", "bytes", "status").orderBy(col("path"))
  }
}
