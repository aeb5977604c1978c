package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hadoop I/O surface re-expressed (SURVEY.md §2 sources):
  * the reference's input/output formats and codecs map onto Spark's
  * DataFrame sources plus the classic hadoopFile RDD bridge for
  * SequenceFile itself. Reference anchors (under
  * hadoop-common-project/hadoop-common/src/main/java/org/apache/hadoop):
  * io/SequenceFile.java:207, io/Text.java:53, io/LongWritable.java:32,
  * io/compress/GzipCodec.java:42.
  *
  * Everything round-trips through a caller-supplied scratch dir; the
  * read side returns DataFrames so the same query oracles can verify
  * fidelity after a format hop.
  */
object Formats {

  /** TextInput/TextOutput: one string column per line. */
  def writeText(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    codec.fold(w)(c => w.option("compression", c)).text(path)
  }
  def readText(s: SparkSession, path: String): DataFrame = s.read.text(path)

  /** Delimited text with header + explicit schema on read (the
    * Hive-style CSV tables Hadoop pipelines exchanged). */
  def writeCsv(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("header", "true")
    codec.fold(w)(c => w.option("compression", c)).csv(path)
  }
  def readCsv(s: SparkSession, path: String, schemaDDL: String): DataFrame =
    s.read.option("header", "true").schema(schemaDDL).csv(path)

  /** Line-delimited JSON. */
  def writeJson(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }
  def readJson(s: SparkSession, path: String, schemaDDL: String): DataFrame =
    s.read.schema(schemaDDL).json(path)

  /** SequenceFile(LongWritable, Text) — hadoop-common's own container
    * format, via the classic RDD bridge. Key = doc_id, value = text. */
  def writeSequence(df: DataFrame, path: String): Unit =
    df.select(col("doc_id").cast("long"), col("text"))
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .saveAsSequenceFile(path)

  /** Reads via the DataSource V2 connector (one partition per file,
    * rows produced as InternalRow with no RDD bridge). */
  def readSequence(s: SparkSession, path: String): DataFrame =
    s.read.format(graft.sources.sequence.SequenceFileSource.NAME)
      .load(path)
      .select(col("key").as("doc_id"), col("value").as("text"))

  /** The classic RDD bridge, kept as the comparison path. */
  def readSequenceRdd(s: SparkSession, path: String): DataFrame = {
    val sp = s
    import sp.implicits._
    s.sparkContext
      .sequenceFile(path, classOf[LongWritable], classOf[Text])
      .map { case (k, v) => (k.get(), v.toString) }
      .toDF("doc_id", "text")
  }

  /** Avro data files through the MR AvroKey formats — the reference's
    * Avro serializer surface (hadoop-common io/serializer/avro/
    * AvroSerialization.java: Avro records as first-class MR
    * key/values): schema'd records in a splittable, sync-marked
    * container. Schema objects and GenericRecords are NOT
    * java-serializable, so the schema travels as its JSON string and
    * is re-parsed inside each partition; field values are reduced to
    * primitives in the same map that sees the (reused) record. */
  private val avroDocSchema =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"lang","type":"string"},
      |{"name":"n_chars","type":"long"}]}""".stripMargin

  def writeAvro(df: DataFrame, path: String): Unit = {
    val schemaStr = avroDocSchema
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    org.apache.avro.mapreduce.AvroJob.setOutputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(schemaStr))
    df.select(col("doc_id").cast("long"), col("lang"),
        col("n_chars").cast("long"))
      .rdd.mapPartitions { it =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaStr)
        it.map { r =>
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("doc_id", r.getLong(0))
          rec.put("lang", r.getString(1))
          rec.put("n_chars", r.getLong(2))
          (new org.apache.avro.mapred.AvroKey[
             org.apache.avro.generic.GenericRecord](rec),
           org.apache.hadoop.io.NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(path,
        classOf[org.apache.avro.mapred.AvroKey[
          org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable],
        classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[
          org.apache.avro.generic.GenericRecord]],
        job.getConfiguration)
  }

  def readAvro(s: SparkSession, path: String): DataFrame = {
    val sp = s
    import sp.implicits._
    s.sparkContext.newAPIHadoopFile(path,
      classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[
        org.apache.avro.generic.GenericRecord]],
      classOf[org.apache.avro.mapred.AvroKey[
        org.apache.avro.generic.GenericRecord]],
      classOf[org.apache.hadoop.io.NullWritable])
      .map { case (k, _) =>
        val rec = k.datum() // extract NOW: the reader reuses the key
        (rec.get("doc_id").asInstanceOf[Long],
          rec.get("lang").toString,
          rec.get("n_chars").asInstanceOf[Long])
      }
      .toDF("doc_id", "lang", "n_chars")
  }

  /** Columnar ORC (the other Hadoop-ecosystem columnar container). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Small-files compaction — the classic HDFS operational problem
    * (every tiny file is a namenode object and a task): rewrite a
    * directory into ceil(bytes/target) files. Returns the new file
    * count. */
  def compact(s: SparkSession, path: String, out: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(path)).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    s.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(out)
    new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
  }

  /** Hive-style partitioned layout (the HDFS dir-per-key convention):
    * partition pruning on read is the point at scale. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
