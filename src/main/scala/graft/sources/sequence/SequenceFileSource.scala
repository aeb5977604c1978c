package graft.sources.sequence

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for SequenceFile(LongWritable, Text) — the
  * reference's own container format (reference: hadoop-common-project/
  * hadoop-common/src/main/java/org/apache/hadoop/io/SequenceFile.java:207,
  * Writer :838, Reader :1701) surfaced as a first-class Spark table:
  *
  *   spark.read.format("graft.sources.sequence.SequenceFileSource")
  *     .load(path)  // => (key long, value string)
  *
  * One input partition per file (SequenceFiles are only split-safe at
  * sync markers; per-file is the conservative contract, matching what
  * MapReduce's SequenceFileInputFormat does for unsplittable codecs).
  * Rows are produced directly as InternalRow — no RDD bridge, no
  * Row->InternalRow conversion layer.
  */
class SequenceFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SequenceFileSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // schema is fixed by the (LongWritable, Text) record format —
    // reject a caller-provided schema that differs rather than
    // silently discarding it (compare names + types, not nullability)
    if (schema != null) {
      val want = SequenceFileSource.schema.fields.map(f => (f.name, f.dataType))
      val got = schema.fields.map(f => (f.name, f.dataType))
      require(got.sameElements(want),
        s"${SequenceFileSource.NAME} has the fixed schema " +
          s"${SequenceFileSource.schema.simpleString} (LongWritable key, " +
          s"Text value); user schema ${schema.simpleString} is not supported")
    }
    val paths = SequenceFileSource.resolvePaths(properties)
    require(paths.nonEmpty,
      s"${SequenceFileSource.NAME} requires a path: " +
        "spark.read.format(...).load(path) or .option(\"path\", path)")
    new SeqTable(paths)
  }
}

object SequenceFileSource {
  val schema: StructType = new StructType()
    .add("key", LongType).add("value", StringType)
  val NAME = "graft.sources.sequence.SequenceFileSource"

  /** Single `path` property or the JSON-array `paths` property Spark
    * sets for multi-path load(p1, p2, ...). */
  private[sequence] def resolvePaths(
      properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readValue(js, classOf[Array[String]]).toSeq
    }
    (single ++ multi).distinct
  }
}

private class SeqTable(paths: Seq[String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"sequencefile(${paths.mkString(",")})"
  override def schema(): StructType = SequenceFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(paths)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1,
      s"${SequenceFileSource.NAME}: writes require exactly one path, " +
        s"got $paths")
    val codec = info.options().getOrDefault("compression", "none")
    require(Set("none", "record", "block")(codec),
      s"${SequenceFileSource.NAME}: compression must be none|record|block, " +
        s"got '$codec'")
    val sorted = info.options().getBoolean("sorted", false)
    new SeqWriteBuilder(paths.head, info.queryId(), codec, sorted)
  }
}

/** Write side: one SequenceFile per input partition under the target
  * directory (the exact layout MapReduce's SequenceFileOutputFormat
  * produced, so MR-era readers and this source's own reader both
  * consume it). Overwrite mode is supported via SupportsTruncate. */
private class SeqWriteBuilder(path: String, queryId: String, codec: String,
    sorted: Boolean) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new SeqBatchWrite(path, queryId, doTruncate, codec, sorted)
  }
}

/** Job-atomic commit protocol, the same staging discipline as the
  * reference's FileOutputCommitter (hadoop-mapreduce-client-core's
  * commit algorithm; see also hadoop-common/.../fs/FileUtil.java for
  * the rename primitive): every task writes into a JOB-scoped hidden
  * staging directory `.graft-staging-<queryId>` and nothing under the
  * visible directory is touched until EVERY task has committed.
  * BatchWrite.commit then performs the truncate (overwrite mode) and
  * renames the staged files into place; BatchWrite.abort deletes only
  * this job's staging dir. Consequences:
  *  - a job that fails mid-write leaves the previous table contents
  *    fully intact (the r2 protocol deleted the old data up front);
  *  - two jobs appending to the same path cannot see or delete each
  *    other's in-flight files (staging dirs are queryId-unique);
  *  - within the staging dir, task attempts write to attempt-unique
  *    temp names and rename on task commit — Spark's commit
  *    coordinator guarantees one committing attempt per partition, so
  *    speculative/zombie attempts never corrupt a staged file;
  *  - committed names carry (partitionId, taskId), so append mode
  *    cannot clobber earlier part files.
  * Readers (this source's and the MR-era one) skip '.'-prefixed
  * entries, so a live staging dir is invisible to them. */
private class SeqBatchWrite(path: String, queryId: String,
    truncate: Boolean, codec: String, sorted: Boolean) extends BatchWrite {
  private def conf = new Configuration()
  private def stagingDir = new Path(path, s".graft-staging-$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = stagingDir.getFileSystem(conf)
    fs.mkdirs(stagingDir) // creates the (possibly new) target dir too
    new SeqWriterFactory(stagingDir.toString, codec, sorted)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (truncate) {
      // drop the previous table contents only now, with every new
      // part staged and fsynced; other jobs' staging dirs survive
      fs.listStatus(p).filterNot(_.getPath.getName.startsWith("."))
        .foreach(st => fs.delete(st.getPath, true))
    }
    messages.foreach { case SeqCommit(file) =>
      val staged = new Path(file)
      val dest = new Path(p, staged.getName)
      if (!fs.rename(staged, dest)) {
        throw new java.io.IOException(
          s"${SequenceFileSource.NAME}: job commit failed: $staged -> $dest")
      }
    }
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf)
    fs.delete(stagingDir, true)
  }
}

private class SeqWriterFactory(stagingDir: String, codec: String,
    sorted: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new SeqWriter(stagingDir, partitionId, taskId, codec, sorted)
}

private case class SeqCommit(file: String) extends WriterCommitMessage

private class SeqWriter(stagingDir: String, partitionId: Int, taskId: Long,
    codec: String, sorted: Boolean) extends DataWriter[InternalRow] {
  private val conf = new Configuration()
  private val tmp = new Path(f"$stagingDir/.inprogress-$partitionId%05d-$taskId")
  private val staged = new Path(f"$stagingDir/part-$partitionId%05d-$taskId")
  // record/block compression = the reference's own SequenceFile modes
  // (io/SequenceFile.java CompressionType); DefaultCodec is the
  // in-JVM zlib codec, so no native library dependency
  private val compression = codec match {
    case "record" => SequenceFile.CompressionType.RECORD
    case "block" => SequenceFile.CompressionType.BLOCK
    case _ => SequenceFile.CompressionType.NONE
  }
  private val writer = SequenceFile.createWriter(conf,
    SequenceFile.Writer.file(tmp),
    SequenceFile.Writer.keyClass(classOf[LongWritable]),
    SequenceFile.Writer.valueClass(classOf[Text]),
    SequenceFile.Writer.compression(compression,
      new org.apache.hadoop.io.compress.DefaultCodec()))
  private val key = new LongWritable()
  private val value = new Text()
  // MapFile.Writer's sorted-key contract (reference io/MapFile.java
  // checkKey: "key out of order"): with option("sorted", true) every
  // appended key must be >= its predecessor WITHIN the file, so a
  // run written from a range-partitioned sorted DataFrame yields
  // files that are each sorted and mutually range-disjoint — the
  // input shape SortedMerge consumes without re-sorting.
  private var lastKey: Long = Long.MinValue

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"${SequenceFileSource.NAME}: null key/value not representable " +
        "in SequenceFile(LongWritable, Text) records")
    val k = row.getLong(0)
    if (sorted && k < lastKey) {
      throw new java.io.IOException(
        s"${SequenceFileSource.NAME}: key out of order: $k after $lastKey " +
          "(sorted=true requires nondecreasing keys per partition — " +
          "sort the DataFrame by the key column before writing)")
    }
    lastKey = k
    key.set(k)
    value.set(row.getUTF8String(1).getBytes)
    writer.append(key, value)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val fs = tmp.getFileSystem(conf)
    if (!fs.rename(tmp, staged)) {
      throw new java.io.IOException(
        s"${SequenceFileSource.NAME}: task commit failed: $tmp -> $staged")
    }
    SeqCommit(staged.toString)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = tmp.getFileSystem(conf)
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

private class SeqScanBuilder(paths: Seq[String]) extends ScanBuilder {
  override def build(): Scan = new SeqScan(paths)
}

private class SeqScan(paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = SequenceFileSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = paths.toArray.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(new Configuration())
      require(fs.exists(p),
        s"${SequenceFileSource.NAME}: path does not exist: $path")
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .filterNot(_.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      else Array(path)
    }
    files.map(SeqPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory
}

private case class SeqPartition(file: String) extends InputPartition

private class SeqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SeqReader(partition.asInstanceOf[SeqPartition].file)
}

private class SeqReader(file: String) extends PartitionReader[InternalRow] {
  private val conf = new Configuration()
  private val reader = new SequenceFile.Reader(conf,
    SequenceFile.Reader.file(new Path(file)))
  private val key = new LongWritable()
  private val value = new Text()

  override def next(): Boolean = reader.next(key, value)

  override def get(): InternalRow =
    InternalRow(key.get(), UTF8String.fromBytes(value.copyBytes()))

  override def close(): Unit = reader.close()
}
