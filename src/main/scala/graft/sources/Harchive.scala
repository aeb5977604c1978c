package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Hadoop-archive (har) WRITE analog (reference fs/HarFileSystem.java:1
  * and the HadoopArchives tool it reads): pack a scatter of small
  * files into one `part-0` payload plus a TWO-LEVEL index —
  * `_index` (one line per entry: url-encoded path, kind, offset,
  * length or child list) sorted by path hash, and `_masterindex`
  * (fixed-size buckets of index lines: first hash, byte start/end),
  * so a single-entry lookup reads the small masterindex, seeks ONE
  * index bucket, then seeks the payload — never a directory walk,
  * never a full index scan. That is the namenode-pressure cure the
  * reference built har for: a million archived files cost three
  * filesystem objects.
  *
  * The archive is immutable once written (the reference contract —
  * har has no append); re-archiving is the only update path, which is
  * also why `create` writes to a fresh directory and refuses an
  * existing one. Hashes are the reference's String.hashCode of the
  * url-encoded path, so the layout is deterministic for a given tree.
  */
object Harchive {
  private val BucketSize = 16

  /** Raw (non-checksum) filesystem: the archive is EXACTLY three
    * objects — local .crc side files would double the object count
    * the format exists to minimize, and HDFS (the reference target)
    * keeps checksums in the pipeline, not beside the file. */
  private def fs(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val f = p.getFileSystem(new Configuration()) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case x => x
    }
    (f, p)
  }

  private def enc(rel: String): String =
    java.net.URLEncoder.encode(rel, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
  private def hashOf(encPath: String): Int = encPath.hashCode

  /** Archive every file under `srcDir` (recursively) into
    * `archiveDir` (must not exist): part-0 + _index + _masterindex.
    * Returns (nFiles, nDirs, payloadBytes). Payload order is
    * name-sorted for determinism; empty files carry (offset, 0). */
  def create(srcDir: String, archiveDir: String): (Long, Long, Long) = {
    val (sf, sp) = fs(srcDir)
    val (af, ap) = fs(archiveDir)
    require(!af.exists(ap), s"archive target exists: $archiveDir")
    af.mkdirs(ap)
    // walk: collect (relPath, isDir, len), name-sorted, root = ""
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Long)]
    def walk(p: Path, rel: String): Unit = {
      entries += ((rel, true, 0L))
      sf.listStatus(p).sortBy(_.getPath.getName).foreach { st =>
        val r = if (rel.isEmpty) st.getPath.getName
        else rel + "/" + st.getPath.getName
        if (st.isDirectory) walk(st.getPath, r)
        else entries += ((r, false, st.getLen))
      }
    }
    walk(sp, "")
    val files = entries.filter(!_._2).map(_._1).sorted
    val dirs = entries.filter(_._2).map(_._1).sorted
    // payload: concatenate name-sorted file bytes into part-0
    val offsets = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val part = af.create(new Path(ap, "part-0"), false)
    var off = 0L
    try files.foreach { rel =>
      val in = sf.open(new Path(sp, rel))
      var n = 0L
      try {
        val buf = new Array[Byte](128 * 1024)
        var r = in.read(buf)
        while (r >= 0) {
          if (r > 0) { part.write(buf, 0, r); n += r }
          r = in.read(buf)
        }
      } finally in.close()
      offsets(rel) = (off, n)
      off += n
    } finally part.close()
    // children per dir (names only, the reference's dir entries)
    val children = entries.groupBy { case (rel, _, _) =>
      if (rel.isEmpty) null
      else if (rel.contains('/')) rel.substring(0, rel.lastIndexOf('/'))
      else ""
    }
    def line(rel: String): String = {
      val e = enc(rel)
      if (dirs.contains(rel)) {
        val kids = children.getOrElse(rel, Seq.empty)
          .collect { case (r, _, _) if r != rel =>
            enc(r.substring(r.lastIndexOf('/') + 1)) }
          .sorted.mkString(",")
        s"$e dir part-0 0 0 $kids"
      } else {
        val (o, n) = offsets(rel)
        s"$e file part-0 $o $n -"
      }
    }
    // index sorted by (hash, encoded path) — the reference's layout,
    // so masterindex ranges are contiguous hash intervals
    val sorted = (dirs ++ files)
      .map(r => (hashOf(enc(r)), enc(r), line(r)))
      .sortBy { case (h, e, _) => (h, e) }
    val indexBytes = sorted.map(_._3 + "\n").mkString.getBytes(UTF_8)
    val outIdx = af.create(new Path(ap, "_index"), false)
    try outIdx.write(indexBytes) finally outIdx.close()
    // masterindex: per bucket of BucketSize lines,
    // "firstHash byteStart byteEnd"
    val master = new StringBuilder
    var pos = 0L
    sorted.grouped(BucketSize).foreach { g =>
      val len = g.map(_._3.getBytes(UTF_8).length + 1L).sum
      master.append(s"${g.head._1} $pos ${pos + len}\n")
      pos += len
    }
    val outM = af.create(new Path(ap, "_masterindex"), false)
    try outM.write(master.toString.getBytes(UTF_8)) finally outM.close()
    (files.size.toLong, dirs.size.toLong, off)
  }

  private def readFully(f: FileSystem, p: Path, at: Long,
      len: Long): Array[Byte] = {
    val buf = new Array[Byte](len.toInt)
    val in = f.open(p)
    try { in.readFully(at, buf); buf } finally in.close()
  }

  /** Single-entry lookup: masterindex bucket -> one index range ->
    * parsed line, or None. The index is never read whole. */
  private def lookup(archiveDir: String,
      rel: String): Option[(String, String, Long, Long, String)] = {
    val (af, ap) = fs(archiveDir)
    val e = enc(rel)
    val h = hashOf(e)
    val buckets = new String(
      readFully(af, new Path(ap, "_masterindex"), 0,
        af.getFileStatus(new Path(ap, "_masterindex")).getLen), UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map { l =>
        val a = l.split(" ")
        (a(0).toInt, a(1).toLong, a(2).toLong)
      }
    // candidate buckets: hash-sorted contiguous layout, so the entry
    // lives in a bucket with firstHash <= h whose successor starts at
    // >= h (equal hashes may span a boundary — check every such one)
    val cand = buckets.indices.filter { i =>
      buckets(i)._1 <= h &&
        (i == buckets.length - 1 || buckets(i + 1)._1 >= h)
    }
    cand.iterator.flatMap { i =>
      val (_, start, end) = buckets(i)
      new String(readFully(af, new Path(ap, "_index"), start, end - start),
        UTF_8)
        .split("\n").filter(_.nonEmpty)
        .map(_.split(" ", 6))
        .find(a => a(0) == e)
        .map(a => (a(0), a(1), a(3).toLong, a(4).toLong, a(5)))
    }.nextOption()
  }

  /** The archived bytes of `rel`, or None if not archived. */
  def read(archiveDir: String, rel: String): Option[Array[Byte]] =
    lookup(archiveDir, rel).collect { case (_, "file", off, len, _) =>
      val (af, ap) = fs(archiveDir)
      readFully(af, new Path(ap, "part-0"), off, len)
    }

  /** Child names of an archived directory ("" = root), or None. */
  def ls(archiveDir: String, rel: String): Option[Seq[String]] =
    lookup(archiveDir, rel).collect { case (_, "dir", _, _, kids) =>
      if (kids.isEmpty) Seq.empty
      else kids.split(",").toSeq.filter(_.nonEmpty).map(dec).sorted
    }
}
