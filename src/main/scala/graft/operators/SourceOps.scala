package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

/** Format round-trip operators (SURVEY.md §2 sources): each routes a
  * table through a non-parquet format (the reference's I/O surface)
  * and aggregates the result; the DuckDB oracle aggregates the
  * original parquet, so any fidelity loss in the format hop fails the
  * hash compare.
  */
object SourceOps {

  private def scratch(prefix: String): String =
    graft.sources.TempDirs.scratch(prefix).resolve("data").toString

  /** orders -> gzip CSV -> read(schema) -> per-status totals. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-csv-")
    Formats.writeCsv(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")),
      path, codec = Some("gzip"))
    Formats.readCsv(s, path,
      "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** customer -> line-JSON -> read(schema) -> per-segment totals. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-json-")
    Formats.writeJson(
      Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal")),
      path)
    Formats.readJson(s, path,
      "c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** documents -> Avro data files (MR AvroKey formats, reference
    * io/serializer/avro/AvroSerialization.java) -> read -> per-lang
    * totals; any fidelity loss in the schema'd record hop fails the
    * parquet-side oracle. */
  def avroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-avro-")
    Formats.writeAvro(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("n_chars")),
      path)
    Formats.readAvro(s, path)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"))
  }

  /** part -> ORC -> read -> per-brand stats. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-orc-")
    Formats.writeOrc(
      Tables.part(s, d).select(col("p_partkey"), col("p_brand"),
        col("p_retailprice"), col("p_size")),
      path)
    Formats.readOrc(s, path)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("p_retailprice") * 100).cast("long")).as("price_cents"),
        sum(col("p_size").cast("long")).as("sum_size"))
      .orderBy(col("p_brand"))
  }

  /** documents -> SequenceFile(LongWritable, Text) -> read -> corpus
    * stats. Exercises hadoop-common's own container format through the
    * RDD bridge. */
  def sequenceRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-seq-")
    Formats.writeSequence(Tables.documents(s, d), path)
    Formats.readSequence(s, path)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** documents -> plain text lines ("doc_id\ttext", the
    * TextInputFormat shape every classic MapReduce job consumed) ->
    * read back -> corpus stats. Line-oriented text is splittable, so
    * at 100 TB each HDFS block becomes one input split, exactly as
    * the reference's TextInputFormat planned it. The tab split uses
    * limit=2 so tabs inside text survive; embedded NEWLINES would
    * split records — the same record-boundary constraint
    * TextInputFormat itself has (escape or switch container formats
    * for multi-line payloads). */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-text-")
    Tables.documents(s, d)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
      .write.mode("overwrite").text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(element_at(col("kv"), 1).cast("long").as("doc_id"),
        element_at(col("kv"), 2).as("text"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Percent-escape exactly the characters that break the line/field
    * framing of "id\ttext" records: '%' -> %25, newline -> %0A,
    * carriage return -> %0D, tab -> %09. CR must be escaped too:
    * Hadoop's LineRecordReader treats bare CR and CRLF as record
    * delimiters just like LF, so an unescaped \r in the payload would
    * split one record into two. After escaping, every '%' is followed
    * by one of the four codes, so the unescape replaces (specific
    * codes first, %25 last) are unambiguous — no lookbehind, plain
    * codegen `replace` calls. This is the custom-InputFormat role
    * from the reference world (records with embedded newlines) done
    * as pure column expressions. */
  private def escapeLine(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "%", "%25"), "\n", "%0A"), "\r", "%0D"), "\t", "%09")

  private def unescapeLine(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "%0A", "\n"), "%0D", "\r"), "%09", "\t"), "%25", "%")

  /** documents -> ESCAPED text lines -> read -> corpus stats. Unlike
    * `textRoundtrip` (which documents the embedded-newline limitation
    * of raw TextInputFormat framing), this path survives newlines and
    * tabs INSIDE the payload: records are escaped to one physical
    * line on write and restored on read, so the format stays
    * splittable line-oriented text while carrying multi-line records.
    * SourcesSpec proves byte fidelity on a corpus with embedded
    * newlines/tabs; the oracle proves zero loss on the real corpus. */
  def textEscapedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-textesc-")
    Tables.documents(s, d)
      .select(concat_ws("\t",
        col("doc_id"), escapeLine(col("text"))).as("value"))
      .write.mode("overwrite").text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(element_at(col("kv"), 1).cast("long").as("doc_id"),
        unescapeLine(element_at(col("kv"), 2)).as("text"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Spec hook: the escaped round-trip as (doc_id, text) rows, for
    * byte-fidelity checks on synthetic multi-line corpora. */
  private[graft] def textEscapedRows(s: SparkSession,
      docs: DataFrame): DataFrame = {
    val path = scratch("graft-textesc-rows-")
    docs.select(concat_ws("\t",
        col("doc_id"), escapeLine(col("text"))).as("value"))
      .write.mode("overwrite").text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(element_at(col("kv"), 1).cast("long").as("doc_id"),
        unescapeLine(element_at(col("kv"), 2)).as("text"))
  }

  /** documents -> bzip2-compressed text lines -> read -> corpus stats.
    * bzip2 is the reference's SPLITTABLE text codec (hadoop-common/
    * .../io/compress/BZip2Codec.java implements
    * SplittableCompressionCodec): a 100 TB corpus compressed with a
    * non-splittable codec becomes one task per FILE, so the codec
    * choice is itself a scale decision. Spark's line reader re-syncs
    * at bzip2 block boundaries, so one large file still fans out
    * across tasks — SourcesSpec proves the multi-split read plan. */
  def textBzip2Roundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-bz2-")
    Tables.documents(s, d)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
      .write.mode("overwrite").option("compression", "bzip2").text(path)
    s.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(element_at(col("kv"), 1).cast("long").as("doc_id"),
        element_at(col("kv"), 2).as("text"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** orders -> lz4-compressed CSV -> read -> per-status totals. The
    * fast-codec family (reference io/compress/Lz4Codec.java; snappy is
    * the same trade): cheap CPU, NOT splittable — the write side must
    * keep individual files block-sized or the read side loses its
    * parallelism. Fidelity proven against the parquet oracle like the
    * gzip path. */
  def csvLz4Roundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-lz4-")
    Formats.writeCsv(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")),
      path, codec = Some("lz4"))
    Formats.readCsv(s, path,
      "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** orders -> snappy-compressed CSV -> read -> per-status totals.
    * Snappy is the reference's DEFAULT fast codec (hadoop-common/.../
    * io/compress/SnappyCodec.java; since HADOOP-17125 it runs on the
    * pure-Java snappy-java binding, no native libhadoop) and the
    * de-facto default block codec of parquet/ORC deployments. Same
    * trade as lz4: cheap CPU, NOT splittable — one task per file on
    * read, so the writer must keep files block-sized. Fidelity proven
    * against the parquet oracle like the gzip/lz4 paths. */
  def csvSnappyRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-snappy-")
    Formats.writeCsv(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")),
      path, codec = Some("snappy"))
    Formats.readCsv(s, path,
      "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Three interleaved SORTED SequenceFile runs of orders, staged once
    * per (JVM, input dir): run r holds the keys with o_orderkey % 3 == r
    * (so runs overlap across the whole key space and a correct merge
    * must truly interleave), each written through the sorted sink —
    * orderBy gives a range-partitioned sorted write, so every file is
    * sorted and files within a run are range-disjoint. */
  private val sortedRunStage =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  private[graft] def sortedRuns(s: SparkSession, d: String): Seq[String] =
    sortedRunStage.computeIfAbsent(d, _ =>
      (0 until 3).map { r =>
        val path = scratch(s"graft-sortedrun$r-")
        Tables.orders(s, d)
          .filter(pmod(col("o_orderkey"), lit(3)) === r)
          .select(col("o_orderkey").as("key"),
            round(col("o_totalprice") * 100).cast("long")
              .cast("string").as("value"))
          .orderBy(col("key"))
          .write.format(graft.sources.sequence.SequenceFileSource.NAME)
          .option("sorted", "true").mode("overwrite").save(path)
        path
      })

  /** Merge-k-sorted-runs as an oracle-backed query: 3 interleaved
    * sorted runs -> SortedMerge (no shuffle, no sort — see
    * SortedMerge's scaladoc) -> ORDER-SENSITIVE verification. The
    * `key_chain` column is the mod-2^31-1 hash chain
    * h = (h*31 + key) % M folded over the keys IN MERGED ORDER, so a
    * single transposition anywhere in the billion-row stream changes
    * the result — this is how "output is globally sorted" becomes a
    * value the DuckDB oracle (which folds over ORDER BY o_orderkey)
    * can hash-compare. The chain combines distributively: each task
    * returns (rows, chain, 31^rows mod M) and the driver folds the
    * partition summaries in partition order — constant-size driver
    * data, same tier as the two-level prefix sum. */
  def sortedMerge(s: SparkSession, d: String): DataFrame = {
    val M = 2147483647L
    val merged = graft.sources.sequence.SortedMerge
      .mergeSorted(s, sortedRuns(s, d), slices = 16)
    val parts = merged.select(col("key"),
        col("value").cast("long").as("cents"))
      .rdd.mapPartitionsWithIndex { case (pid, it) =>
        var n = 0L; var chain = 0L; var pow = 1L
        var sum = 0L; var minK = Long.MaxValue; var maxK = Long.MinValue
        var last = Long.MinValue; var ordered = true
        it.foreach { r =>
          val k = r.getLong(0)
          if (k < last) ordered = false
          last = k
          chain = (chain * 31 + k) % M
          pow = (pow * 31) % M
          n += 1; sum += r.getLong(1)
          if (k < minK) minK = k
          if (k > maxK) maxK = k
        }
        Iterator((pid, n, chain, pow, sum, minK, maxK, ordered))
      }.collect().sortBy(_._1)
    // partition chains fold in partition id order; ascending partition
    // ranges + per-partition order = global order
    var chain = 0L; var rows = 0L; var cents = 0L
    var minKey = Long.MaxValue; var maxKey = Long.MinValue
    var prevMax = Long.MinValue; var ordered = true
    parts.foreach { case (_, n, c, pow, sum, mn, mx, ord) =>
      if (n > 0) {
        chain = (chain * pow + c) % M
        rows += n; cents += sum
        if (!ord || mn < prevMax) ordered = false
        prevMax = mx
        if (mn < minKey) minKey = mn
        if (mx > maxKey) maxKey = mx
      }
    }
    require(ordered, "sortedMerge: merged stream is out of order")
    val sp = s
    import sp.implicits._
    Seq((rows, minKey, maxKey, cents, chain))
      .toDF("n_rows", "min_key", "max_key", "sum_cents", "key_chain")
  }

  /** One sorted bucketed table per (JVM, input dir) for keyed lookups —
    * the MapFile analog staged once, probed many times. */
  private val bucketedStage =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // ---- SetFile / ArrayFile analogs (reference io/SetFile.java:1,
  // io/ArrayFile.java:1) ---------------------------------------------

  /** The distinct order-placing customer keys as a keys-only SORTED
    * SequenceFile run, staged once per (JVM, input dir) — SetFile's
    * layout exactly: a sorted sequence of keys with empty values,
    * existing purely to answer membership. */
  private[graft] def setFileTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(s"$d|setfile", _ => {
      val path = scratch("graft-setfile-")
      Tables.orders(s, d)
        .select(col("o_custkey").as("key")).distinct()
        .withColumn("value", lit(""))
        .orderBy(col("key"))
        .write.format(graft.sources.sequence.SequenceFileSource.NAME)
        .option("sorted", "true").mode("overwrite").save(path)
      path
    })

  private[graft] val SET_PROBES = Seq(1L, 2L, 7L, 500L, 999999L)

  /** SetFile membership: probe a fixed key list against the keys-only
    * sorted table. The probe set is the tiny side, so the plan is one
    * scan of the key table with an IN predicate (map-only) followed by
    * a join against the <= |probes|-row survivor set — never a shuffle
    * of the keys. At 100 TB the key table is billions of rows and this
    * shape still reads it exactly once (or less, once a source prunes
    * on the pushed IN). */
  def setMembership(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val keys = s.read
      .format(graft.sources.sequence.SequenceFileSource.NAME)
      .load(setFileTable(s, d))
      .select(col("key"))
    val found = keys.filter(col("key").isin(SET_PROBES: _*)).distinct()
    SET_PROBES.toDF("probe_key")
      .join(found, col("probe_key") === col("key"), "left")
      .select(col("probe_key"),
        when(col("key").isNotNull, 1L).otherwise(0L).as("present"))
      .orderBy(col("probe_key"))
  }

  private[graft] val ARRAY_POSITIONS = Seq(0L, 699L, 1400L)

  /** ArrayFile lookup: the i-th record of orders in o_orderkey order,
    * WITHOUT a global single-partition window. zipWithIndex is the
    * two-level distributed prefix sum (one tiny per-partition count
    * job, then offset-shifted local indices — the same pattern as
    * mm_shard_manifest), so global positions exist at any scale; the
    * probe then keeps only the requested positions. This is the
    * reference's ArrayFile seek-by-index re-expressed: the "index"
    * is the count manifest instead of a sidecar file. */
  def arrayLookup(s: SparkSession, d: String): DataFrame = {
    val want = ARRAY_POSITIONS.toSet
    val sorted = Tables.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
    val sp = s
    import sp.implicits._
    sorted.rdd.zipWithIndex()
      .filter { case (_, i) => want(i) }
      .map { case (r, i) => (i, r.getLong(0), r.getLong(1)) }
      .toDF("pos", "o_orderkey", "cents")
      .orderBy(col("pos"))
  }

  /** Keyed point lookup through a SORTED BUCKETED table — the Spark
    * native of the reference's indexed containers (hadoop-common/.../
    * io/MapFile.java: sorted data file + index for point lookups;
    * BloomMapFile.java adds a membership filter). Bucketing hashes
    * o_orderkey into 8 files; a literal equality/IN predicate lets the
    * scan open ONLY the matching buckets (SelectedBucketsCount in the
    * plan — SourcesSpec asserts 1 of 8), and within a bucket the
    * sorted layout gives parquet row-group stats their best pruning.
    * At 100 TB this is the difference between a full-table scan and
    * reading 1/N of the files for every keyed probe. */
  def bucketedLookup(s: SparkSession, d: String): DataFrame = {
    val table = bucketedTable(s, d)
    // keep the BUCKETED scan for point probes: the auto-disable rule
    // only credits bucketing when a join/agg needs its distribution,
    // so it would silently fall back to a full-file scan here and
    // throw away the 1-of-8 bucket pruning this operator exists for.
    // The override lives in a CLONED session (shared SparkContext +
    // catalog, private SQLConf) so the shared session's planner is
    // untouched — conf is consulted at plan time, after this method
    // returns, so a set/restore on the shared session would either
    // not apply or leak to every later query.
    val scoped = s.newSession()
    scoped.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    scoped.table(table)
      .filter(col("o_orderkey").isin(42L, 777L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_orderkey"))
  }

  /** Stage (once per input dir) orders as an external table bucketed
    * AND sorted by o_orderkey. Returns the catalog table name. */
  private[graft] def bucketedTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(d, _ => {
      val name = "graft_orders_bkt_" + java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(d.getBytes).getMostSignificantBits
          & Long.MaxValue)
      if (!s.catalog.tableExists(name)) {
        val path = scratch("graft-bkt-")
        Tables.orders(s, d)
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", path)
          .saveAsTable(name)
      }
      name
    })

  /** orders -> zstd-compressed parquet -> read -> totals. Proves the
    * codec path (zstd is the 100 TB default: ~gzip ratio at lz4-ish
    * speed) preserves every value bit-for-bit vs the oracle over the
    * uncompressed original. */
  def parquetZstdRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-zstd-")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite")
      .option("compression", "zstd").parquet(path)
    s.read.parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** documents scattered into many small files -> compacted to
    * ceil(bytes/target) files -> read back -> corpus stats. The
    * classic HDFS small-files remedy (every tiny file is a namenode
    * object and one task) as an oracle-backed query: the DuckDB side
    * aggregates the original table, so the scatter+compact hop must
    * lose nothing. The spec additionally pins the file-count
    * arithmetic; here the compaction target is sized to force a real
    * multi-file -> fewer-files rewrite at any SF. */
  def compactionRoundtrip(s: SparkSession, d: String): DataFrame = {
    val scatter = scratch("graft-scatter-")
    val compacted = scratch("graft-compacted-")
    Tables.documents(s, d).repartition(50)
      .write.mode("overwrite").parquet(scatter)
    Formats.compact(s, scatter, compacted, targetBytes = 4L * 1024 * 1024)
    s.read.parquet(compacted)
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Co-located fact-fact join through two bucketed-and-sorted tables
    * (orders ⋈ lineitem on orderkey, both bucketed 8 ways on their
    * join key): the sort-merge join consumes the on-disk bucketing and
    * ordering, so NEITHER side shuffles or sorts at query time — the
    * plan a 100 TB warehouse pre-pays at write time (SourcesSpec pins
    * the zero-exchange plan; this query pins the RESULT against the
    * plain-parquet oracle). */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val lt = bucketedFactTable(s, d, "lineitem", "l_orderkey",
      Tables.lineitem(_, _).select(col("l_orderkey"), col("l_extendedprice")))
    val ot = bucketedFactTable(s, d, "orders", "o_orderkey",
      Tables.orders(_, _).select(col("o_orderkey"), col("o_orderpriority")))
    s.table(ot)
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Keyed RANGE lookup — the other half of the MapFile contract
    * (point probes go through hash buckets, `bucketedLookup`; range
    * scans need RANGE layout, since hash bucketing scatters a key
    * interval across every bucket). orders is staged once as
    * range-partitioned files, each sorted within, so every file
    * carries a disjoint key interval: a BETWEEN predicate prunes at
    * parquet row-group granularity via min/max stats, reading a tiny
    * slice of each qualifying file and virtually nothing of the rest —
    * the sorted-data-file scan MapFile.Reader performed, sharded.
    * SourcesSpec asserts the scan's output-row count stays orders of
    * magnitude under the table size. */
  def rangeLookup(s: SparkSession, d: String): DataFrame = {
    val path = rangeTable(s, d)
    s.read.parquet(path)
      .filter(col("o_orderkey").between(1000L, 1099L))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Stage (once per JVM + input dir) orders as range-partitioned,
    * within-file-sorted parquet; returns the path. */
  private[graft] def rangeTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(s"$d|orders-range", _ => {
      val path = scratch("graft-range-")
      Tables.orders(s, d)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Stage (once per JVM + input dir + name) a table bucketed AND
    * sorted by `key` into 8 buckets; returns the catalog name. */
  private[graft] def bucketedFactTable(s: SparkSession, d: String,
      name: String, key: String,
      load: (SparkSession, String) => DataFrame): String =
    bucketedStage.computeIfAbsent(s"$d|$name", _ => {
      val tag = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(s"$d|$name".getBytes)
          .getMostSignificantBits & Long.MaxValue)
      val tbl = s"graft_${name}_bkt_$tag"
      if (!s.catalog.tableExists(tbl)) {
        val path = scratch(s"graft-bkt-$name-")
        load(s, d)
          .write.mode("overwrite")
          .bucketBy(8, key).sortBy(key)
          .option("path", path)
          .saveAsTable(tbl)
      }
      tbl
    })

  // ---- Bloom-filtered keyed lookup (BloomMapFile analog) -----------

  /** Bloom sidecar geometry: m bits per data file, k hash probes per
    * key. At ~4k keys/file (16 files at sf0.1) the fill factor stays
    * ~17%, so the per-key false-positive rate is (0.17)^3 ≈ 0.5%. */
  private val BloomBits = 1 << 16
  private val BloomK = 3

  /** Probe position i for a key: md5-then-fold (the reservoir of
    * independent, DuckDB-expressible hash functions every sketch in
    * this repo draws from), reduced mod m. */
  private def bloomPos(key: org.apache.spark.sql.Column, i: Int) =
    graft.functions.RollingHash.rollingHash(
      md5(concat(lit(s"bloom$i-"), key.cast("string")).cast("binary"))
    ) % BloomBits

  /** Stage (once per JVM + input dir) orders hash-distributed into 16
    * parquet files plus a `_bloom` SIDECAR: one row per data file
    * holding the file's bloom bit-position set over o_orderkey — the
    * exact layout contract of the reference's BloomMapFile
    * (hadoop-common/.../io/BloomMapFile.java: a MapFile plus a
    * `bloom` file consulted before the index). Returns the data path. */
  private[graft] def bloomTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(s"$d|orders-bloom", _ => {
      val path = scratch("graft-bloomtbl-")
      Tables.orders(s, d)
        .repartition(16, col("o_orderkey"))
        .write.mode("overwrite").parquet(path)
      val positions = s.read.parquet(path)
        .select(input_file_name().as("file"), col("o_orderkey").as("k"))
        .select(col("file"), explode(array(
          (0 until BloomK).map(i => bloomPos(col("k"), i)): _*)).as("pos"))
      positions.groupBy(col("file"))
        .agg(sort_array(collect_set(col("pos"))).as("bits"))
        .coalesce(1)
        .write.mode("overwrite").parquet(path + "_bloom")
      path
    })

  /** Which data files MAY contain any of `probes`: join the probes'
    * bloom positions against the sidecar entirely in Spark (a file is
    * a candidate for a key iff all k positions are set), then collect
    * ONLY the candidate file list — file-count-scale, never
    * data-scale. No false negatives by construction; false positives
    * just read one extra file and are removed by the exact filter. */
  private[graft] def bloomCandidates(s: SparkSession, path: String,
      probes: Seq[Long]): Seq[String] = {
    import s.implicits._
    val pp = probes.toDF("k")
      .select(array((0 until BloomK).map(i => bloomPos(col("k"), i)): _*)
        .as("pp"))
    s.read.parquet(path + "_bloom")
      .crossJoin(broadcast(pp))
      .filter(expr("forall(pp, p -> array_contains(bits, p))"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Keyed lookup through the bloom sidecar — the BloomMapFile upgrade
    * to `bucketedLookup`: membership is tested BEFORE any data file is
    * opened, so a probe for an absent key costs k sidecar probes and
    * (usually) zero data I/O, and present keys open only their ~1
    * candidate file of 16. The probe set includes a key absent at
    * every SF to exercise exactly that path. At 100 TB the sidecar is
    * file-count-scale (8 KB per file), read via one tiny scan — the
    * same economics that made BloomMapFile worth a second file. */
  def bloomLookup(s: SparkSession, d: String): DataFrame = {
    val path = bloomTable(s, d)
    val probes = Seq(42L, 777L, 4242L, 900000007L) // last: absent at any SF
    val cands = bloomCandidates(s, path, probes)
    val pruned =
      if (cands.isEmpty) s.read.parquet(path).limit(0)
      else s.read.parquet(cands: _*)
    pruned
      .filter(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_orderkey"))
  }

  /** Schema evolution: two parquet batches written at different
    * "schema versions" (v2 adds a column), read back as ONE table via
    * mergeSchema — the lakehouse answer to the reference world's
    * writable-schema SequenceFiles and Avro evolution rules. Old rows
    * surface the new column as NULL; the aggregate proves both
    * batches' data and the null-fill survive. At 100 TB schema
    * migration by rewrite is off the table, so additive evolution at
    * READ time is the operative contract (footer merging costs one
    * pass over file metadata, not data). */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-evolve-")
    val orders = Tables.orders(s, d)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(path)
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      .write.mode("append").parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        count(col("total_cents")).as("n_with_price"),
        sum(coalesce(col("total_cents"), lit(0L))).as("total_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Nested-type round-trip: orders grouped into one array<struct>
    * row per customer, written as genuinely NESTED parquet (repeated
    * group in the file footer), read back, and flattened with a
    * lateral-view explode — the §3 data-model path (documents with
    * attachments, events with property lists) the flat round-trips
    * don't touch. sort_array makes the nesting deterministic; the
    * oracle aggregates the flat table, so any fidelity loss in
    * nest → file → un-nest fails the hash. */
  def nestedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-nested-")
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(col("o_orderkey"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))))
        .as("orders"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .select(col("o_custkey"), explode(col("orders")).as("o"))
      .groupBy(col("o.o_orderstatus").as("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o.cents")).as("total_cents"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy(col("o_orderstatus"))
  }

  // ---- Z-order clustered layout ------------------------------------

  /** Morton value — hoisted to [[graft.functions.ZOrder]] (r12) so
    * the transaction log's OPTIMIZE ZORDER shares one definition. */
  private def zValue(a: String, b: String) =
    graft.functions.ZOrder.zValue(a, b)

  /** Stage (once per JVM + input dir) lineitem clustered by
    * z(l_partkey, l_suppkey) into range-partitioned, within-sorted
    * parquet with SMALL row groups (64 KB), so row-group min/max stats
    * on BOTH keys stay tight. A single-column sort gives one tight
    * dimension and one useless one; the z curve keeps both bounded —
    * the multi-dimensional clustering every lakehouse format offers,
    * built from plain Spark writes. */
  private[graft] def zorderTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(s"$d|lineitem-zorder", _ => {
      val path = scratch("graft-zorder-")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
        .withColumn("z", zValue("l_partkey", "l_suppkey"))
        .repartitionByRange(16, col("z"))
        .sortWithinPartitions(col("z"))
        .drop("z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
      path
    })

  /** The UNclustered control for the spec: same data, same row-group
    * size, sorted by an unrelated key. */
  private[graft] def linearTable(s: SparkSession, d: String): String =
    bucketedStage.computeIfAbsent(s"$d|lineitem-linear", _ => {
      val path = scratch("graft-linear-")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
      path
    })

  /** Two-dimensional box probe over the z-clustered table: both range
    * predicates push to the parquet scan, and because the layout
    * clusters BOTH dimensions, row-group stats exclude almost every
    * group (the spec reads scan metrics against the linear control).
    * At 100 TB this is the difference between reading ~the result and
    * reading every row that matches one dimension. */
  def zorderLookup(s: SparkSession, d: String): DataFrame =
    s.read.parquet(zorderTable(s, d))
      .filter(col("l_partkey").between(100L, 200L) &&
        col("l_suppkey").between(5L, 20L))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("price_cents"),
        min(col("l_orderkey")).as("min_order"),
        max(col("l_orderkey")).as("max_order"))

  /** Lakehouse transaction log (sources/TxnLog.scala): lineitem lands
    * in four append commits (v0-v3, one l_orderkey%4 slice each), then
    * an OPTIMIZE rewrite (v4) compacts the live set in one
    * remove+add commit. The result unions a TIME-TRAVEL read at v1
    * (exactly slices 0-1 — snapshot isolation over the manifest, no
    * directory listing) with the latest read (all rows THROUGH the
    * compaction — the oracle equality proves the rewrite is logically
    * invariant). Commit atomicity, the concurrent-writer race, stale
    * rewrite refusal, and vacuum semantics are pinned in TxnLogSpec. */
  /** The five-commit demo table both txnlog queries drive: four
    * append commits (v0-v3, one l_orderkey%4 slice each) + an
    * OPTIMIZE rewrite (v4) compacting the live set. */
  private def txnlogDemoTable(s: SparkSession,
      d: String): graft.sources.TxnLog.Table = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnlog-").resolve("tbl"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    // the four slice appends stage concurrently and commit in order
    // (appendSlices, guide §2.6) — history and per-commit file sets
    // identical to the sequential loop, the staging wave overlapped
    graft.sources.TxnLog.appendSlices(s, t,
      (0 until 4).map(i => li.filter(col("l_orderkey") % 4 === i)))
    graft.sources.TxnLog.compact(s, t)
    t
  }

  private def txnlogProfile(df: DataFrame): DataFrame =
    df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))

  def txnlogSnapshot(s: SparkSession, d: String): DataFrame = {
    val t = txnlogDemoTable(s, d)
    def profile(df: DataFrame, tag: String): DataFrame =
      txnlogProfile(df).withColumn("snap", lit(tag))
    profile(graft.sources.TxnLog.read(s, t, Some(1L)), "v1")
      .unionByName(profile(graft.sources.TxnLog.read(s, t), "latest"))
      .orderBy(col("snap"), col("l_returnflag"))
  }

  /** Change-data-feed read over the same five-commit table: the
    * incremental-consumer primitive. v1→v3 spans append-only commits,
    * so TxnLog.changes resolves it from the LOG — a metadata walk
    * plus a scan of exactly the added files, the few-minute
    * incremental-sync shape at 100 TB. v1→latest crosses the
    * compaction rewrite — since r12 ALSO log-resolved (the rewrite
    * stamps `cdc none`, so the range never diffs two snapshots; the
    * raw-commit fallback diff is pinned in TxnLogSpec instead). Both
    * ranges must produce the SAME inserts (slices 2-3) and ZERO
    * deletes — the oracle equality proves the rewrite is row-level
    * invisible to a change consumer. Delete groups ride through the
    * union: any unexpected delete row breaks the hash. */
  def txnlogChanges(s: SparkSession, d: String): DataFrame = {
    val t = txnlogDemoTable(s, d)
    def tagged(df: DataFrame, vrange: String, change: String): DataFrame =
      txnlogProfile(df).withColumn("vrange", lit(vrange))
        .withColumn("change", lit(change))
    val (insFast, delFast) = graft.sources.TxnLog.changes(s, t, 1L, 3L)
    val (insDiff, delDiff) = graft.sources.TxnLog.changes(s, t, 1L, 4L)
    tagged(insFast, "v1..v3", "insert")
      .unionByName(tagged(delFast, "v1..v3", "delete"))
      .unionByName(tagged(insDiff, "v1..latest", "insert"))
      .unionByName(tagged(delDiff, "v1..latest", "delete"))
      .orderBy(col("vrange"), col("change"), col("l_returnflag"))
  }

  /** OPTIMIZE ZORDER through the transaction log — src_zorder_lookup
    * one level up, the same two-level story as src_txnlog_skipping:
    * lineitem lands in four appends, then `TxnLog.compactZorder`
    * rewrites the live set clustered on the Morton interleave of
    * (l_partkey, l_suppkey) with BOTH dimensions' (min, max) embedded
    * in the add actions, so a 2-D box probe prunes files from the
    * MANIFEST before any footer opens (TxnLogSpec reads the planning
    * audit: the box plans a strict subset of the clustered files and
    * a plain compaction control cannot prune the box at all). The
    * oracle is the flat-table filter. */
  def txnlogZorder(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnz-").resolve("tbl"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    graft.sources.TxnLog.appendSlices(s, t,
      (0 until 4).map(p => li.filter(col("l_orderkey") % 4 === p)),
      Seq("l_partkey", "l_suppkey")) // §2.6 overlapped staging wave
    graft.sources.TxnLog.compactZorder(s, t, "l_partkey", "l_suppkey")
    graft.sources.TxnLog.readPrunedBox(s, t,
      Seq(("l_partkey", 100L, 200L), ("l_suppkey", 5L, 20L)))
      .filter(col("l_partkey").between(100L, 200L) &&
        col("l_suppkey").between(5L, 20L))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
        min(col("l_orderkey")).as("min_order"),
        max(col("l_orderkey")).as("max_order"))
  }

  /** Row-level DELETE through the transaction log: lineitem lands in
    * two append commits, then `TxnLog.delete` removes every row of
    * one l_orderkey slice — rewriting ONLY the files that contain
    * matches and writing the removed rows out as cdc change files in
    * the same atomic commit. The result unions the post-delete table
    * profile with the profile of the change-feed DELETE rows read
    * back through `TxnLog.changes` (log-resolved — no snapshot diff),
    * so the oracle equality proves both that the delete removed
    * exactly the predicate's rows and that the recorded change files
    * replay them exactly. At 100 TB a selective delete touches a
    * sliver of the table and its change feed is a metadata read plus
    * a scan of just the change files. */
  def txnlogDelete(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txndel-").resolve("tbl"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    graft.sources.TxnLog.appendSlices(s, t, // §2.6 overlapped staging
      (0 until 2).map(i => li.filter(col("l_orderkey") % 2 === i)))
    val base = graft.sources.TxnLog.latestVersion(t) // v1
    val vDel = graft.sources.TxnLog.delete(s, t, col("l_orderkey") % 10 === 3)
    val (_, del) = graft.sources.TxnLog.changes(s, t, base, vDel)
    txnlogProfile(graft.sources.TxnLog.read(s, t))
      .withColumn("side", lit("latest"))
      .unionByName(txnlogProfile(del).withColumn("side", lit("deleted")))
      .orderBy(col("side"), col("l_returnflag"))
  }

  /** MERGE (upsert) through the transaction log — the op a CDC-fed
    * lakehouse table runs every sync: orders (minus the %5==0 keys)
    * lands in two append commits, then a source of EVERY even key —
    * doubled price — merges in: even keys already present get
    * REPLACED, the %10==0 keys (absent from the table) get INSERTED.
    * The result unions the post-merge profile with the merge's own
    * change feed (old images as deletes, new images as inserts, all
    * log-resolved), so the oracle equality pins replace-vs-insert
    * routing AND the CDF contract in one hash. Only files containing
    * matched keys rewrite — at 100 TB the cost is one key join plus
    * the touched sliver. */
  def txnlogMerge(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnmrg-").resolve("tbl"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base = o.filter(col("o_orderkey") % 5 =!= 0)
    graft.sources.TxnLog.appendSlices(s, t, // §2.6 overlapped staging
      (0 until 2).map(p => base.filter(col("o_orderkey") % 2 === p)))
    val src = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val preV = graft.sources.TxnLog.latestVersion(t)
    val vM = graft.sources.TxnLog.merge(s, t, src, "o_orderkey")
    val (ins, del) = graft.sources.TxnLog.changes(s, t, preV, vM)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(del).withColumn("side", lit("deleted")))
      .unionByName(prof(ins).withColumn("side", lit("inserted")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** Conditional MERGE through the transaction log — the WHEN-clause
    * form a tombstoned CDC feed needs, all three clause kinds in ONE
    * commit: orders (minus the %5==0 keys) lands in two appends, then
    * a source of every %3==0 key merges with
    * WHEN MATCHED AND s.price > 150k THEN UPDATE SET price = t+s
    * (column-level — the other columns keep their values),
    * WHEN MATCHED AND s.price <= 50k THEN DELETE, and
    * WHEN NOT MATCHED AND even-key THEN INSERT; matched rows in the
    * 50k..150k band hit NO clause and stay untouched — crucially they
    * appear in NEITHER side of the change feed. The result unions the
    * post-merge profile with both CDF sides, so the oracle equality
    * pins first-match clause routing, the untouched band, column-level
    * assignment, and the (delete old images, insert new images) feed
    * in one hash. TxnLogSpec pins the ambiguous-source refusal and
    * the degenerate forms. */
  def txnlogMergeInto(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnmic-").resolve("tbl"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base = o.filter(col("o_orderkey") % 5 =!= 0)
    graft.sources.TxnLog.appendSlices(s, t, // §2.6 overlapped staging
      (0 until 2).map(p => base.filter(col("o_orderkey") % 2 === p)))
    val src = o.filter(col("o_orderkey") % 3 === 0)
    val preV = graft.sources.TxnLog.latestVersion(t)
    val vM = graft.sources.TxnLog.mergeInto(s, t, src, "o_orderkey", Seq(
      graft.sources.TxnLog.MergeClause.Update(
        Some(col("s.o_totalprice") > 150000.0),
        Map("o_totalprice" ->
          (col("t.o_totalprice") + col("s.o_totalprice")))),
      graft.sources.TxnLog.MergeClause.Delete(
        Some(col("s.o_totalprice") <= 50000.0)),
      graft.sources.TxnLog.MergeClause.Insert(
        Some(col("s.o_orderkey") % 2 === 0))))
    val (ins, del) = graft.sources.TxnLog.changes(s, t, preV, vM)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(del).withColumn("side", lit("deleted")))
      .unionByName(prof(ins).withColumn("side", lit("inserted")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** DESCRIBE HISTORY over the transaction log — the audit surface a
    * lakehouse table exposes: one row per commit with the operation
    * inferred from the commit's action shape (append / streaming
    * append / OPTIMIZE / DELETE / MERGE) and its add/remove/
    * change-file counts, resolved from the log alone (no data file
    * touched). The demo drives one commit of each kind with
    * single-file staging so the counts are layout-deterministic, and
    * the oracle pins the full audit table as literals — any drift in
    * the commit protocol's action shapes breaks the hash. */
  def txnlogHistory(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnhist-").resolve("tbl"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
    def slice(i: Int): DataFrame =
      li.filter(col("l_orderkey") % 2 === i).coalesce(1)
    graft.sources.TxnLog.appendSlices(s, t,
      Seq(slice(0), slice(1)))                               // v0-v1 APPEND
    graft.sources.TxnLog.compact(s, t)                       // v2 OPTIMIZE
    graft.sources.TxnLog.delete(s, t,
      col("l_orderkey") % 10 === 3)                          // v3 DELETE
    graft.sources.TxnLog.merge(s, t,
      li.filter(col("l_orderkey") % 10 === 4)
        .withColumn("l_quantity", col("l_quantity") * 2).coalesce(1),
      "l_orderkey")                                          // v4 MERGE
    graft.sources.TxnLog.appendBatch(s, t,
      li.filter(col("l_orderkey") % 10 === 7).coalesce(1),
      "hist", 0L)                                            // v5 STREAMING
    val sp = s
    import sp.implicits._
    graft.sources.TxnLog.history(t)
      .toDF("version", "operation", "n_adds", "n_removes", "n_cdc")
      .orderBy(col("version"))
  }

  /** The change-data feed resolved FROM THE LOG across a full mixed
    * history — append, append, OPTIMIZE, row-level DELETE, append:
    * every rewrite in the range explains itself (`cdc none` from the
    * compaction, change files from the delete), so `changes(v0,
    * latest)` never diffs two snapshots; it scans exactly the files
    * the appends added plus the recorded change files. The feed is
    * the change EVENT stream: a second-slice row that the delete later
    * removed appears on BOTH sides (applying inserts then deletes
    * converges to the latest snapshot — the standard CDF contract the
    * oracle replays directly against lineitem). */
  def txnlogCdf(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txncdf-").resolve("tbl"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    def slice(i: Int) = li.filter(col("l_orderkey") % 3 === i)
    graft.sources.TxnLog.appendSlices(s, t,
      Seq(slice(0), slice(1)))                           // v0-v1
    graft.sources.TxnLog.compact(s, t)                   // v2 (cdc none)
    graft.sources.TxnLog.delete(s, t,
      col("l_quantity") >= 45.0)                         // v3 (cdc files)
    graft.sources.TxnLog.append(s, t, slice(2))          // v4
    val (ins, del) = graft.sources.TxnLog.changes(s, t, 0L,
      graft.sources.TxnLog.latestVersion(t))
    txnlogProfile(ins).withColumn("change", lit("insert"))
      .unionByName(txnlogProfile(del).withColumn("change", lit("delete")))
      .orderBy(col("change"), col("l_returnflag"))
  }

  /** Hive-partitioned tables THROUGH the transaction log — partition
    * metadata in the add actions (`part=col=val`), so three ops are
    * metadata-only at any table size: the partition-pruned read (only
    * the partition's files are planned), the partition column itself
    * (reconstituted as a typed literal, never stored in the files),
    * and [[TxnLog.dropPartition]] — retention's drop-a-day as ONE
    * remove-only commit whose cdc lines reference the dropped files
    * zero-copy (no data file read or written; the API takes no
    * SparkSession). lineitem lands partitioned by l_returnflag, the
    * R partition drops, and the result unions the post-drop profile,
    * the drop's own change feed (the R rows, partition column
    * reconstituted), and a pruned single-partition read — pinning
    * layout, drop, CDF, and prune in one hash. TxnLogSpec pins the
    * commit shape (removes+cdc only) and the planned-file subset. */
  def txnlogPartitioned(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnpart-").resolve("tbl"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    graft.sources.TxnLog.appendPartitioned(s, t, li, Seq("l_returnflag"))
    val before = graft.sources.TxnLog.latestVersion(t)
    val vDrop = graft.sources.TxnLog.dropPartition(t,
      Map("l_returnflag" -> "R"))
    val (_, del) = graft.sources.TxnLog.changes(s, t, before, vDrop)
    val pruned = graft.sources.TxnLog.readPartition(s, t,
      Map("l_returnflag" -> "A"))
    txnlogProfile(graft.sources.TxnLog.read(s, t))
      .withColumn("side", lit("latest"))
      .unionByName(txnlogProfile(del).withColumn("side", lit("dropped")))
      .unionByName(txnlogProfile(pruned).withColumn("side", lit("pruned")))
      .orderBy(col("side"), col("l_returnflag"))
  }

  /** The SQL DML surface end-to-end — every statement here runs as
    * SQL TEXT through the injected parser (GraftSqlParser, wired via
    * spark.sql.extensions), not the Scala API: DELETE FROM prunes a
    * key slice, MERGE INTO routes a doubled-price source through
    * conditional UPDATE/DELETE/INSERT clauses, and OPTIMIZE compacts
    * — a logical no-op the oracle equality proves. The target
    * addresses by path (the Delta `format.\`/path\`` convention);
    * ExtensionsSpec pins the catalog-table form, VACUUM, and ZORDER.
    * Requires a session built with the graft extensions (every main
    * and test session in this library is). */
  def txnlogSqlDml(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnsql-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o.filter(col("o_orderkey") % 4 =!= 3))
    s.sql(s"DELETE FROM txnlog.`$root` WHERE o_orderkey % 10 = 1")
    o.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("graft_sqldml_src")
    s.sql(
      s"""MERGE INTO txnlog.`$root` t USING graft_sqldml_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_totalprice > 200000 THEN
         |  UPDATE SET o_totalprice = s.o_totalprice
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(s"OPTIMIZE txnlog.`$root`")
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  /** FULL-SYNC reconciliation MERGE — the WHEN NOT MATCHED BY SOURCE
    * clause family that mirrors a snapshot into a table (the missing
    * third of the clause triad; Delta's notMatchedBySource): the
    * source is the NEW truth for the even keys, so matched rows take
    * the source price, unmatched source rows insert, and target rows
    * ABSENT from the source either delete (cheap ones) or get flagged
    * stale — their presence puts every live file in the rewrite set,
    * the semantics of a reconciliation read. Driven as SQL TEXT
    * through the injected parser, so the statement grammar for BY
    * SOURCE clauses is oracle-pinned too; both CDF sides ride the
    * hash. */
  def txnlogMergeSync(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnsync-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o.filter(col("o_orderkey") % 5 =!= 0))
    o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("graft_sync_src")
    val before = graft.sources.TxnLog.latestVersion(t)
    s.sql(
      s"""MERGE INTO txnlog.`$root` t USING graft_sync_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.o_totalprice <= 100000 THEN
         |  DELETE
         |WHEN NOT MATCHED BY SOURCE THEN
         |  UPDATE SET o_orderstatus = 'Z'""".stripMargin)
    val ver = graft.sources.TxnLog.latestVersion(t)
    val (ins, del) = graft.sources.TxnLog.changes(s, t, before, ver)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(del).withColumn("side", lit("deleted")))
      .unionByName(prof(ins).withColumn("side", lit("inserted")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** Row-level UPDATE — the most-typed DML statement after DELETE —
    * driven end-to-end as SQL TEXT through the injected parser
    * (`UPDATE txnlog.\`p\` SET … WHERE …` → TxnLog.update: stats-
    * pruned locate, sliver rewrite, CDF delete+insert images), then
    * audited from three angles the oracle hash pins together: the
    * latest table state, BOTH sides of the change feed, and the
    * PRE-UPDATE rows read back through SQL time travel
    * (`SELECT … VERSION AS OF v`) — the statement a SQL-first user
    * types right after DESCRIBE HISTORY shows them the version. */
  def txnlogUpdate(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnupd-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o)
    val v0 = graft.sources.TxnLog.latestVersion(t)
    s.sql(
      s"""UPDATE txnlog.`$root`
         |SET o_totalprice = o_totalprice * 2, o_orderstatus = 'U'
         |WHERE o_orderkey % 10 = 1""".stripMargin)
    val v1 = graft.sources.TxnLog.latestVersion(t)
    val (ins, del) = graft.sources.TxnLog.changes(s, t, v0, v1)
    val before = s.sql(
      s"""SELECT * FROM txnlog.`$root` VERSION AS OF $v0
         |WHERE o_orderkey % 10 = 1""".stripMargin)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(before).withColumn("side", lit("before")))
      .unionByName(prof(del).withColumn("side", lit("deleted")))
      .unionByName(prof(ins).withColumn("side", lit("inserted")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** The SQL WRITE path: `INSERT INTO` (append commits) and
    * `INSERT OVERWRITE` (one atomic replace) against a txnlog path
    * target, closing SQL CRUD — a SQL-first user never needs the
    * Scala API. Two INTO commits land the odd/even halves of orders
    * (each one version), then an OVERWRITE replaces the table with
    * the %3 slice; the oracle pins the final state AND the
    * pre-overwrite state read back through `VERSION AS OF` — the
    * atomic-replace + time-travel contract in one hash. */
  def txnlogInsert(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnins-")
      .resolve("tbl")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.createOrReplaceTempView("graft_ins_src")
    s.sql(
      s"""INSERT INTO txnlog.`$root`
         |SELECT * FROM graft_ins_src WHERE o_orderkey % 2 = 0""".stripMargin)
    s.sql(
      s"""INSERT INTO txnlog.`$root`
         |SELECT * FROM graft_ins_src WHERE o_orderkey % 2 = 1""".stripMargin)
    val t = graft.sources.TxnLog.Table(root)
    val vPre = graft.sources.TxnLog.latestVersion(t)
    s.sql(
      s"""INSERT OVERWRITE txnlog.`$root`
         |SELECT * FROM graft_ins_src WHERE o_orderkey % 3 = 0""".stripMargin)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(s.sql(
        s"SELECT * FROM txnlog.`$root` VERSION AS OF $vPre"))
        .withColumn("side", lit("pre_overwrite")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** RESTORE — the lakehouse rollback, METADATA-ONLY through the
    * commit log (TxnLog.restore takes no SparkSession: the live-set
    * diff against the restored snapshot becomes one remove+re-add
    * commit, partition tokens and stats carried forward; no data file
    * is read or written). The demo mirrors the fat-finger incident a
    * rollback exists for: a partitioned orders table loses a whole
    * status partition to a zero-copy drop, then
    * `RESTORE TABLE … TO VERSION AS OF v` as SQL text brings it back;
    * the oracle hash pins the restored table equal to the original
    * AND the restore commit's own change feed (the re-added rows as
    * typed inserts, nothing deleted — metadata-only both ways). */
  def txnlogRestore(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnrestore-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendPartitioned(s, t, o, Seq("o_orderstatus"))
    val v0 = graft.sources.TxnLog.latestVersion(t)
    graft.sources.TxnLog.dropPartition(t, Map("o_orderstatus" -> "F"))
    val v1 = graft.sources.TxnLog.latestVersion(t)
    s.sql(s"RESTORE TABLE txnlog.`$root` TO VERSION AS OF $v0")
    val v2 = graft.sources.TxnLog.latestVersion(t)
    val (ins, del) = graft.sources.TxnLog.changes(s, t, v1, v2)
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(graft.sources.TxnLog.read(s, t)).withColumn("side", lit("latest"))
      .unionByName(prof(ins).withColumn("side", lit("restored")))
      .unionByName(prof(del).withColumn("side", lit("deleted")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** Manifest data skipping — the lakehouse file-pruning story on top
    * of the transaction log: orders lands in 8 append commits, each
    * one contiguous o_orderkey range staged as one sorted file with
    * its (min, max) EMBEDDED IN THE ADD ACTION
    * (TxnLog.appendWithStats), so a BETWEEN probe plans from the
    * manifest alone — TxnLogSpec pins that the narrow probe reaches
    * the scan with 1-2 of the 8 files and that an out-of-domain probe
    * plans ZERO files without touching data. This is src_range_lookup
    * one level up: there parquet row-group stats prune after the file
    * opens; here the COMMIT LOG prunes before any file is listed or
    * opened — at 100 TB, query planning that reads no data at all.
    * The oracle is the same filter on the flat table. */
  def txnlogSkipping(s: SparkSession, d: String): DataFrame = {
    val t = graft.sources.TxnLog.Table(
      graft.sources.TempDirs.scratch("graft-txnskip-").resolve("tbl"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    // catalog-scale scalar: the key domain, to cut 8 contiguous ranges
    val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)
    val step = maxKey / 8 + 1
    graft.sources.TxnLog.appendSlices(s, t, // §2.6 overlapped staging
      (0 until 8).map(i =>
        o.filter(col("o_orderkey") >= i * step &&
          col("o_orderkey") < (i + 1) * step)
          .sortWithinPartitions(col("o_orderkey")).coalesce(1)),
      Seq("o_orderkey"))
    graft.sources.TxnLog.readPruned(s, t, "o_orderkey", 1000L, 1200L)
      .filter(col("o_orderkey").between(1000L, 1200L))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  /** PER-QUERY snapshot resolution — the seam where a lakehouse SQL
    * user most easily reads stale data: a temp view created over
    * `txnlog.\`/p\`` must serve commits that land AFTER its creation
    * (the reference resolves relations per query; an eager parse-time
    * pin would freeze the view's file list forever and break after
    * vacuum). The view is created over the ODD half, the EVEN half
    * lands afterwards through SQL INSERT, and the profile reads
    * THROUGH THE VIEW — a stale pin would halve every group. The
    * 'pinned' side reads `VERSION AS OF v0` through a second view,
    * proving time-traveled references still pin. Oracle: the same
    * two profiles straight off orders. */
  def txnlogView(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnview-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o.filter(col("o_orderkey") % 2 === 1))
    val v0 = graft.sources.TxnLog.latestVersion(t)
    s.sql(s"CREATE OR REPLACE TEMP VIEW graft_live_v AS " +
      s"SELECT * FROM txnlog.`$root`")
    s.sql(s"CREATE OR REPLACE TEMP VIEW graft_pin_v AS " +
      s"SELECT * FROM txnlog.`$root` VERSION AS OF $v0")
    o.filter(col("o_orderkey") % 2 === 0)
      .createOrReplaceTempView("graft_view_src")
    s.sql(s"INSERT INTO txnlog.`$root` SELECT * FROM graft_view_src")
    def prof(df: DataFrame): DataFrame = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
    prof(s.table("graft_live_v")).withColumn("side", lit("through_view"))
      .unionByName(prof(s.table("graft_pin_v"))
        .withColumn("side", lit("pinned")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** Table CONSTRAINTS — NOT NULL and named CHECKs declared in one
    * metadata commit and enforced on EVERY write path with an atomic
    * refusal (nothing commits, the txn marker never advances): the
    * data-quality gate a lakehouse ingest runs. Two violating SQL
    * INSERTs are attempted and must refuse (their refusals are
    * counted into the audit row — if either landed, the 'latest'
    * profile would also drift); a post-refusal UPDATE that satisfies
    * the constraints lands. Oracle: the final table profiled off
    * orders plus the hardcoded audit row. */
  def txnlogConstraints(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txncon-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o)
    s.sql(s"ALTER TABLE txnlog.`$root` ADD CONSTRAINT price_pos " +
      "CHECK (o_totalprice >= 0)")
    s.sql(s"ALTER TABLE txnlog.`$root` ALTER COLUMN o_orderstatus " +
      "SET NOT NULL")
    var refused = 0L
    try s.sql(s"INSERT INTO txnlog.`$root` VALUES (1, 'X', -5.0)")
    catch { case e: IllegalArgumentException
      if e.getMessage.contains("price_pos") => refused += 1 }
    try s.sql(s"INSERT INTO txnlog.`$root` VALUES (2, NULL, 5.0)")
    catch { case e: IllegalArgumentException
      if e.getMessage.contains("NOT NULL") => refused += 1 }
    // a conforming write still lands under the declared constraints
    s.sql(s"UPDATE txnlog.`$root` SET o_totalprice = o_totalprice + 1 " +
      "WHERE o_orderkey % 100 = 7")
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(refused).as("n_rows"),
        lit(0L).as("price_cents"), lit(0L).as("key_sum"),
        lit("refused").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** RENAME/DROP COLUMN through COLUMN MAPPING — schema evolution
    * beyond additive, as ONE metadata commit each (the registered
    * schema carries a logical→physical name indirection; no data
    * file is rewritten — the demo renames o_totalprice to price,
    * UPDATEs through the new name, drops o_custkey, and the whole
    * pipeline — mapped reads, DML locate/restage, time travel —
    * keeps working). The 'latest' side reads THROUGH the mapping via
    * SQL; the 'pre_rename' side time-travels below the rename and
    * reads the OLD column name (each version's schema is its own).
    * Oracle: the doubled slice off orders, and the original for the
    * pinned side. */
  def txnlogRename(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnren-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o)
    val v0 = graft.sources.TxnLog.latestVersion(t)
    s.sql(s"ALTER TABLE txnlog.`$root` RENAME COLUMN o_totalprice TO price")
    s.sql(s"ALTER TABLE txnlog.`$root` DROP COLUMN o_custkey")
    s.sql(s"UPDATE txnlog.`$root` SET price = price * 2 " +
      "WHERE o_orderkey % 10 = 3")
    val latest = s.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
         |    AS price_cents,
         |  sum(o_orderkey) AS key_sum
         |FROM txnlog.`$root` GROUP BY 1""".stripMargin)
    val before = s.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |    AS price_cents,
         |  sum(o_orderkey) AS key_sum
         |FROM txnlog.`$root` VERSION AS OF $v0 GROUP BY 1""".stripMargin)
    latest.withColumn("side", lit("latest"))
      .unionByName(before.withColumn("side", lit("pre_rename")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** DELETION VECTORS — merge-on-read row-level DML: a selective
    * DELETE and UPDATE against a multi-file table commit WITHOUT
    * rewriting any pre-existing data file (the dv action records the
    * dead row indices; reads anti-filter in-scan on Spark's own
    * _metadata.row_index). Both ops hit FIXED key windows (700-799
    * deleted, 800-899 doubled) inside the first of four key-range
    * files — constant matched-row counts at any scale factor, so the
    * merge-on-read path never flips to the copy-on-write fallback as
    * data grows, and the stats-tracked key column lets the manifest
    * box prune the locating scan to that one file. The audit row
    * pins the contract into the hash: exactly one DV-carrying file
    * and a flag that every original file is STILL LIVE — if either
    * op had fallen back to copy-on-write, both would drift. Oracle:
    * orders with the deleted window removed and the updated window
    * doubled. */
  def txnlogDv(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txndv-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendWithStats(s, t,
      o.repartitionByRange(4, col("o_orderkey")), Seq("o_orderkey"))
    val before = graft.sources.TxnLog.snapshot(t).liveFiles.toSet
    // FIXED key windows, not modulo slices: the matched-row count per
    // file stays constant at any scale factor, so the merge-on-read
    // path (and the audit row pinning it) never silently flips to
    // copy-on-write past the per-file DV threshold; the windows also
    // exercise manifest box pruning before the locating scan
    graft.sources.TxnLog.deleteDv(s, t,
      col("o_orderkey").between(700, 799))
    graft.sources.TxnLog.updateDv(s, t,
      Map("o_totalprice" -> (col("o_totalprice") * 2)),
      col("o_orderkey").between(800, 899))
    val snap = graft.sources.TxnLog.snapshot(t)
    val kept = if (before.subsetOf(snap.liveFiles.toSet)) 1L else 0L
    // PRESENCE flag, not a file count: the windows' key ranges can
    // straddle a range-partition boundary at small scale factors
    // (RangePartitioner samples), so "how many files carry a vector"
    // is SF-dependent; "merge-on-read ran and nothing fell back to
    // copy-on-write" is the contract and holds at every SF
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(if (snap.dvs.nonEmpty) 1L else 0L).as("n_rows"),
        lit(kept).as("price_cents"), lit(0L).as("key_sum"),
        lit("dv").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** MERGE clause parity — `UPDATE SET *` (every target column from
    * the source) and `INSERT (cols) VALUES` (align by name,
    * NULL-fill unlisted columns), the two clause forms every Delta
    * MERGE tutorial leads with. The target holds the odd keys; the
    * source re-prices keys with `% 10 < 2`: its odd members match
    * (star-updated to status 'U', tripled price), its even members
    * insert through the column list with a NULL price — the
    * n_null_price column pins the NULL-fill into the hash. Oracle:
    * the same merge as a LEFT JOIN + anti-union off orders. */
  def txnlogMergeForms(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnmf-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.append(s, t, o.filter(col("o_orderkey") % 2 === 1))
    o.filter(col("o_orderkey") % 10 < 2)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 3).as("o_totalprice"))
      .createOrReplaceTempView("graft_mf_src")
    s.sql(
      s"""MERGE INTO txnlog.`$root` t USING graft_mf_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus)
         |  VALUES (s.o_orderkey, s.o_orderstatus)""".stripMargin)
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(round(col("o_totalprice") * 100).cast("long"),
          lit(0L))).as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L))
          .as("n_null_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** MERGE-ON-READ MERGE — the same WHEN-clause MERGE shape run with
    * `graft.enableDeletionVectors` set: matched DELETE/UPDATE rows
    * dead-list their OLD positions via `dv` lines instead of
    * rewriting the files that hold them (new images and inserts
    * append), so a CDC upsert against a 100 TB table stops paying
    * whole-file rewrites. FIXED key windows (700-749 deleted via the
    * negative-price marker clause, 750-799 re-priced, the same window
    * shifted +20M inserted) keep the matched-row count constant at
    * any scale factor — the light path never silently flips to
    * copy-on-write as data grows, and the stats-tracked key prunes
    * the locate to the window's key-range files. The audit row pins
    * the contract into the hash: at least one deletion vector was
    * stamped (the merge-on-read path actually ran) and every
    * original file is STILL LIVE (nothing fell back to
    * copy-on-write; exact file counts would depend on sampled range
    * boundaries). Oracle: the merged result expressed as a CASE +
    * anti-union off orders. */
  def txnlogMergeDv(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnmdv-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendWithStats(s, t,
      o.repartitionByRange(4, col("o_orderkey")), Seq("o_orderkey"))
    graft.sources.TxnLog.setProperties(t,
      Map("graft.enableDeletionVectors" -> "true"))
    val win = o.filter(col("o_orderkey").between(700, 799))
    win.filter(col("o_orderkey") < 750)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        lit(-1.0).as("o_totalprice")) // the DELETE marker clause
      .unionByName(win.filter(col("o_orderkey") >= 750)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice")))
      .unionByName(win.select(
        (col("o_orderkey") + 20000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
      .createOrReplaceTempView("graft_mdv_src")
    val before = graft.sources.TxnLog.snapshot(t).liveFiles.toSet
    s.sql(
      s"""MERGE INTO txnlog.`$root` t USING graft_mdv_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_totalprice < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice,
         |  o_orderstatus = s.o_orderstatus
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val snap = graft.sources.TxnLog.snapshot(t)
    val kept = if (before.subsetOf(snap.liveFiles.toSet)) 1L else 0L
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(if (snap.dvs.nonEmpty) 1L else 0L).as("n_rows"),
        lit(kept).as("price_cents"), lit(0L).as("key_sum"),
        lit("dv").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** DDL-FIRST CREATE — `CREATE TABLE (cols) USING txnlog
    * PARTITIONED BY (col)`: the schema, the partition LAYOUT and a
    * CHECK constraint all exist at version 0, before any data; the
    * INSERT then routes through the declared layout with no
    * PARTITION clause (the declaration, not the first writer,
    * decides the physical shape). The audit row pins: partition
    * count pre-data (0), the distinct-status partition count after
    * the insert, and a flag that a one-partition read plans fewer
    * files than live (metadata pruning off the declared layout).
    * Oracle: the same profile plus the distinct count off orders. */
  def txnlogCreate(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txncr-")
      .resolve("tbl")
    val p = root.toString
    s.sql(s"CREATE TABLE txnlog.`$p` (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING txnlog " +
      "PARTITIONED BY (o_orderstatus)")
    s.sql(s"ALTER TABLE txnlog.`$p` ADD CONSTRAINT price_pos " +
      "CHECK (o_totalprice >= 0)")
    val preParts = s.sql(s"SHOW PARTITIONS txnlog.`$p`").count()
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .createOrReplaceTempView("graft_cr_src")
    s.sql(s"INSERT INTO txnlog.`$p` SELECT * FROM graft_cr_src")
    val t = graft.sources.TxnLog.Table(root)
    val nParts = s.sql(s"SHOW PARTITIONS txnlog.`$p`").count()
    val (planned, live) = graft.sources.TxnLog
      .plannedFilesPartition(t, Map("o_orderstatus" -> "F"))
    val prunes = if (planned < live) 1L else 0L
    s.sql(s"SELECT * FROM txnlog.`$p`").groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(nParts).as("n_rows"),
        lit(preParts).as("price_cents"), lit(prunes).as("key_sum"),
        lit("audit").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** PARTITION-SCOPED OVERWRITE — Delta's `replaceWhere` (the
    * writer-option spelling; SQL `INSERT OVERWRITE ... PARTITION`
    * rides the same [[graft.sources.TxnLog.replaceWhere]]): the 'F'
    * partition's rows are replaced by their re-priced twins in ONE
    * atomic commit — the backfill idiom on partitioned tables, where
    * DELETE + INSERT is two commits with a visible gap. The audit
    * row pins the scope into the hash: exactly one commit landed,
    * every out-of-scope file is STILL LIVE (nothing else was
    * touched), and every in-scope file is GONE. Oracle: orders with
    * the F partition doubled. */
  def txnlogReplaceWhere(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnrw-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendPartitioned(s, t, o, Seq("o_orderstatus"))
    val before = graft.sources.TxnLog.snapshot(t)
    val outScope = before.liveFiles.filter(rel =>
      !before.filePartitions.getOrElse(rel, Map.empty)
        .get("o_orderstatus").contains("F")).toSet
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
      .write.format("txnlog").mode("overwrite")
      .option("replaceWhere", "o_orderstatus = 'F'")
      .option("path", root.toString).save()
    val snap = graft.sources.TxnLog.snapshot(t)
    val oneCommit = if (snap.version == before.version + 1) 1L else 0L
    val keptOut = if (outScope.subsetOf(snap.liveFiles.toSet)) 1L else 0L
    val inGone = if (snap.liveFiles.toSet.intersect(
        before.liveFiles.toSet -- outScope).isEmpty) 1L else 0L
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(oneCommit).as("n_rows"),
        lit(keptOut).as("price_cents"), lit(inGone).as("key_sum"),
        lit("rw").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** DV SIDECARS — the adversarial SCATTERED delete (every other key
    * in a fixed 200-key window: 100 single-row ranges whose merged
    * encoding blows any sane inline cap): instead of the old
    * copy-on-write fallback — a full rewrite of the file that holds
    * the window — the vector lands as a compact gzipped sidecar
    * under `_dv/`, referenced by a ~50-byte `@` token the log and
    * every later checkpoint carry. The audit row pins the contract:
    * the stamped token IS a sidecar ref, every original file is
    * STILL LIVE (no rewrite), and the commit demands protocol-v3
    * readers. Fixed window ⇒ constant matched rows at any SF; the
    * stats-tracked key prunes the locate to the window's file.
    * Oracle: orders with the odd members of the window removed. */
  def txnlogDvSidecar(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnsc-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendWithStats(s, t,
      o.repartitionByRange(4, col("o_orderkey")), Seq("o_orderkey"))
    val before = graft.sources.TxnLog.snapshot(t).liveFiles.toSet
    graft.sources.TxnLog.deleteDv(s, t,
      col("o_orderkey").between(700, 899) && col("o_orderkey") % 2 === 1,
      maxDvBytesPerFile = 64L)
    val snap = graft.sources.TxnLog.snapshot(t)
    val sidecar =
      if (snap.dvs.values.exists(_.startsWith("@_dv/"))) 1L else 0L
    val kept = if (before.subsetOf(snap.liveFiles.toSet)) 1L else 0L
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(sidecar).as("n_rows"),
        lit(kept).as("price_cents"),
        lit(snap.minReader).as("key_sum"),
        lit("dv").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** WRITE-PATH SCHEMA EVOLUTION — Delta's `mergeSchema` writer
    * option: the table starts narrow (INT cents, no status); the
    * second batch arrives WIDE (BIGINT cents) with a NEW column, and
    * ONE commit lands the widened+extended schema action AND the
    * data (the atomic evolution contract — no prior ALTER). The
    * audit row pins: exactly one commit, the registered type is
    * BIGINT, and the commit stamped the type-widening protocol
    * floor. Old rows promote in-scan and null-fill the new column
    * (bucketed as `__pre__`). Oracle: orders with evens pre-shape,
    * odds evolved. */
  def txnlogEvolveWrite(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnev-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
    graft.sources.TxnLog.append(s, t,
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("int")
            .as("price_cents")))
    val before = graft.sources.TxnLog.snapshot(t)
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("o_orderstatus"))
      .write.format("txnlog").mode("append")
      .option("mergeSchema", "true")
      .option("path", root.toString).save()
    val snap = graft.sources.TxnLog.snapshot(t)
    val oneCommit = if (snap.version == before.version + 1) 1L else 0L
    val widened = if (graft.sources.TxnLog.registeredSchema(t)
        .exists(_("price_cents").dataType ==
          org.apache.spark.sql.types.LongType)) 1L else 0L
    graft.sources.TxnLog.read(s, t)
      .groupBy(coalesce(col("o_orderstatus"), lit("__pre__"))
        .as("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(oneCommit).as("n_rows"),
        lit(widened).as("price_cents"),
        lit(snap.minReader).as("key_sum"),
        lit("evolve").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** ARBITRARY-PREDICATE replaceWhere (Delta ≥ 1.1's general form):
    * a NON-partition key-window predicate replaces its rows with
    * re-priced twins in ONE atomic delete-matching+insert-validated
    * commit. The audit row pins: one commit, and every file whose
    * key stats MISS the window is still live (the stats-pruned
    * locate never touched it). Fixed window ⇒ the rewritten slice is
    * SF-stable. Oracle: orders with the window's prices doubled. */
  def txnlogReplaceWhereExpr(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txnrwe-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendWithStats(s, t,
      o.repartitionByRange(4, col("o_orderkey")), Seq("o_orderkey"))
    val before = graft.sources.TxnLog.snapshot(t)
    graft.sources.TxnLog.replaceWhereExpr(s, t,
      o.filter(col("o_orderkey").between(700, 899))
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice")),
      col("o_orderkey").between(700, 899))
    val snap = graft.sources.TxnLog.snapshot(t)
    val oneCommit = if (snap.version == before.version + 1) 1L else 0L
    val outScope = before.liveFiles.filter(rel =>
      before.fileStats.get(rel).flatMap(_.get("o_orderkey"))
        .exists { case (lo, hi) => hi < 700 || lo > 899 })
    val kept =
      if (outScope.nonEmpty &&
        outScope.forall(snap.liveFiles.contains)) 1L else 0L
    graft.sources.TxnLog.read(s, t).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(oneCommit).as("n_rows"),
        lit(kept).as("price_cents"), lit(0L).as("key_sum"),
        lit("rwe").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** SHALLOW CLONE — the zero-copy fork: the clone's v0 references
    * the source's files (audit pins: not one parquet byte under the
    * clone's data tree at clone time), then DIVERGES — the clone
    * drops the F partition, the source appends a sentinel, and
    * neither sees the other's change (audit pins the source row
    * count). Oracle: orders without the F rows (the clone's final
    * state). */
  def txnlogClone(s: SparkSession, d: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val srcRoot = graft.sources.TempDirs.scratch("graft-txncl-")
      .resolve("src")
    val dstRoot = graft.sources.TempDirs.scratch("graft-txncl-")
      .resolve("dst")
    val src = graft.sources.TxnLog.Table(srcRoot)
    val dst = graft.sources.TxnLog.Table(dstRoot)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.TxnLog.appendPartitioned(s, src, o,
      Seq("o_orderstatus"))
    val srcRows = graft.sources.TxnLog.read(s, src).count()
    graft.sources.TxnLog.shallowClone(src, dst)
    val zeroCopy = {
      val walk = Files.walk(dst.dataDir) // close: fd-safety convention
      try {
        if (!walk.iterator().asScala
          .exists(_.toString.endsWith(".parquet"))) 1L else 0L
      } finally walk.close()
    }
    // divergence: metadata-only partition drop on the CLONE, an
    // append on the SOURCE — each invisible to the other
    graft.sources.TxnLog.dropPartition(dst,
      Map("o_orderstatus" -> "F"))
    graft.sources.TxnLog.append(s, src,
      s.range(1).select(lit(-1L).as("o_orderkey"),
        lit("Z").as("o_orderstatus"), lit(0.0).as("o_totalprice")))
    val isolated =
      if (graft.sources.TxnLog.read(s, src).count() == srcRows + 1 &&
        graft.sources.TxnLog.read(s, dst)
          .filter(col("o_orderstatus") === "Z").count() == 0) 1L
      else 0L
    graft.sources.TxnLog.read(s, dst).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(zeroCopy).as("n_rows"),
        lit(isolated).as("price_cents"), lit(0L).as("key_sum"),
        lit("clone").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** CREATE OR REPLACE TABLE — the idempotent-notebook DDL: a
    * narrow seeded table is atomically REDEFINED (new schema, new
    * declared layout, CTAS data) in ONE commit; history is retained
    * below it. The audit row pins: one commit for the replace, the
    * declared layout took, and every staged file records its tokens.
    * Oracle: orders (the replacing CTAS's result). */
  def txnlogCreateOrReplace(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txncor-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    s.sql(s"CREATE TABLE txnlog.`$root` (k BIGINT) USING txnlog")
    s.sql(s"INSERT INTO txnlog.`$root` VALUES (1)")
    val before = graft.sources.TxnLog.snapshot(t)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .createOrReplaceTempView("graft_cor_src")
    s.sql(s"CREATE OR REPLACE TABLE txnlog.`$root` USING txnlog " +
      "PARTITIONED BY (o_orderstatus) AS " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice " +
      "FROM graft_cor_src")
    val snap = graft.sources.TxnLog.snapshot(t)
    val oneCommit = if (snap.version == before.version + 1) 1L else 0L
    val declared =
      if (snap.declaredPartCols == Seq("o_orderstatus")) 1L else 0L
    val layoutOk =
      if (snap.liveFiles.forall(snap.filePartitions.contains)) 1L
      else 0L
    s.sql(s"SELECT * FROM txnlog.`$root`").groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("o_orderstatus"),
        lit(oneCommit).as("n_rows"),
        lit(declared).as("price_cents"), lit(layoutOk).as("key_sum"),
        lit("cor").as("side")))
      .orderBy(col("side"), col("o_orderstatus"))
  }

  /** COLUMN DEFAULT VALUES: a CREATE-time default (lang 'en') stamps
    * omitted INSERT columns; an ADD COLUMN ... DEFAULT 7 backfills
    * every PRE-EVOLUTION row with 7 (not NULL) on read, no rewrite;
    * post-evolution explicit values (including NULL) stand. The
    * audit row pins the v4 protocol floor the defaulted schema
    * demands. Oracle: evens pre-evolution ('en', 7), odds
    * post-evolution (NULL lang, 9). */
  def txnlogDefaults(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TempDirs.scratch("graft-txndef-")
      .resolve("tbl")
    val t = graft.sources.TxnLog.Table(root)
    s.sql(s"CREATE TABLE txnlog.`$root` " +
      "(o_orderkey BIGINT, lang STRING DEFAULT 'en') USING txnlog")
    Tables.orders(s, d).select(col("o_orderkey"))
      .createOrReplaceTempView("graft_def_src")
    s.sql(s"INSERT INTO txnlog.`$root` (o_orderkey) " +
      "SELECT o_orderkey FROM graft_def_src WHERE o_orderkey % 2 = 0")
    s.sql(s"ALTER TABLE txnlog.`$root` ADD COLUMNS (q INT DEFAULT 7)")
    s.sql(s"INSERT INTO txnlog.`$root` " +
      "SELECT o_orderkey, NULL, 9 FROM graft_def_src " +
      "WHERE o_orderkey % 2 = 1")
    val snap = graft.sources.TxnLog.snapshot(t)
    graft.sources.TxnLog.read(s, t)
      .groupBy(coalesce(col("lang"), lit("__null__")).as("lang"),
        col("q").cast("long").as("q"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"))
      .withColumn("side", lit("latest"))
      .unionByName(s.range(1).select(
        lit("__audit__").as("lang"), lit(snap.minReader).as("q"),
        lit(1L).as("n_rows"), lit(0L).as("key_sum"),
        lit("def").as("side")))
      .orderBy(col("side"), col("lang"), col("q"))
  }

  /** lineitem -> hive-partitioned parquet by returnflag -> filtered
    * read. Partition pruning must make the R-only read touch one
    * directory; the oracle is the same filter on the flat parquet. */
  def partitionedPrune(s: SparkSession, d: String): DataFrame = {
    val path = scratch("graft-part-")
    Formats.writePartitioned(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"),
        col("l_returnflag")),
      path, Seq("l_returnflag"))
    Formats.readPartitioned(s, path)
      .filter(col("l_returnflag") === "R")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
  }
}
