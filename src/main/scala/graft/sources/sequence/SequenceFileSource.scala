package graft.sources.sequence

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
      properties: util.Map[String, String]): Table =
    new SeqTable(properties.get("path"))
}

object SequenceFileSource {
  val schema: StructType = new StructType()
    .add("key", LongType).add("value", StringType)
  val NAME = "graft.sources.sequence.SequenceFileSource"
}

private class SeqTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sequencefile($path)"
  override def schema(): StructType = SequenceFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(path)
}

private class SeqScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new SeqScan(path)
}

private class SeqScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = SequenceFileSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .filterNot(_.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      else Array(path)
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
