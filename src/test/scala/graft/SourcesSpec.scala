package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SourceOps
import graft.sources.{Formats, Tables}

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("parquet modular encryption: column keys, ciphertext on disk, wrong-key refusal") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pqenc-")
    val path = dir.resolve("enc").toString
    val hc = spark.sparkContext.hadoopConfiguration
    def b64(seed: Int) = java.util.Base64.getEncoder.encodeToString(
      Array.tabulate[Byte](16)(i => (seed + i).toByte))
    val (kf, kc, bad) = (b64(1), b64(101), b64(53))
    def setKeys(list: String): Unit = {
      hc.set("parquet.crypto.factory.class",
        "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
      hc.set("parquet.encryption.kms.client.class",
        "graft.sources.GraftKmsClient")
      hc.set(graft.sources.GraftKmsClient.KeyListProp, list)
      // parquet caches unwrapped keys per access token — purge so a
      // key-list change actually reaches the next read
      org.apache.parquet.crypto.keytools.KeyToolkit
        .removeCacheEntriesForAllTokens()
    }
    try {
      setKeys(s"kf:$kf, kc:$kc")
      (0 until 100).map(i => (i.toLong, s"SECRETPAYLOAD-$i", i * 2L))
        .toDF("id", "secret_text", "open_val")
        .coalesce(1).write
        .option("parquet.encryption.footer.key", "kf")
        .option("parquet.encryption.column.keys", "kc:secret_text")
        .mode("overwrite").parquet(path)
      // ciphertext on disk: encrypted-footer files trade the PAR1
      // magic for PARE, and the secret column's plaintext is absent
      val part = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val raw = java.nio.file.Files.readAllBytes(part.toPath)
      assert(new String(raw.takeRight(4), "US-ASCII") == "PARE",
        "encrypted-footer file must end with the PARE magic")
      assert(new String(raw.take(4), "US-ASCII") == "PARE",
        "encrypted-footer file must start with the PARE magic")
      val needle = "SECRETPAYLOAD".getBytes("US-ASCII")
      assert(!raw.sliding(needle.length).exists(_.sameElements(needle)),
        "secret column plaintext leaked to disk")
      // the right keys decrypt transparently through the reader
      val back = spark.read.parquet(path)
        .orderBy(col("id")).collect()
      assert(back.length == 100)
      assert(back(7).getString(1) == "SECRETPAYLOAD-7")
      assert(back(7).getLong(2) == 14L)
      // wrong COLUMN key: the footer opens but the column refuses
      setKeys(s"kf:$kf, kc:$bad")
      val colErr = intercept[Exception] {
        spark.read.parquet(path).select(col("secret_text")).collect()
      }
      val chain = Iterator.iterate(colErr: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.toString.toLowerCase).mkString(" | ")
      assert(chain.matches("(?s).*(tag|gcm|decrypt).*"),
        s"unexpected wrong-column-key failure: $chain")
      // wrong FOOTER key: nothing opens at all
      setKeys(s"kf:$bad, kc:$kc")
      intercept[Exception] {
        spark.read.parquet(path).select(col("open_val")).collect()
      }
      // no crypto config at all: the PARE file must not read as plain
      hc.unset("parquet.crypto.factory.class")
      intercept[Exception] {
        spark.read.parquet(path).count()
      }
    } finally {
      hc.unset("parquet.crypto.factory.class")
      hc.unset("parquet.encryption.kms.client.class")
      hc.unset(graft.sources.GraftKmsClient.KeyListProp)
      org.apache.parquet.crypto.keytools.KeyToolkit
        .removeCacheEntriesForAllTokens()
    }
  }

  test("har write analog: 50-file scatter round-trips through part+index") {
    import graft.sources.Harchive
    val rng = new scala.util.Random(42)
    val src = Files.createTempDirectory("graft-har-src-").toString
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = java.nio.file.Paths.get(src, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
      ()
    }
    // 50 files scattered over nested dirs, varied sizes incl. empty
    val payloads = (0 until 50).map { i =>
      val rel = s"d${i % 5}/sub${i % 3}/f$i.dat"
      val bytes = if (i == 17) Array.emptyByteArray
      else Array.fill(rng.nextInt(4000) + 1)(rng.nextInt.toByte)
      put(rel, bytes)
      rel -> bytes
    }.toMap
    val arch = Files.createTempDirectory("graft-har-")
      .resolve("scatter.har").toString
    val (nf, nd, bytes) = Harchive.create(src, arch)
    assert(nf == 50 && bytes == payloads.values.map(_.length.toLong).sum)
    assert(nd == 1L + 5 + 15, s"dir entries: $nd") // root + d* + d*/sub*
    // exactly three filesystem objects — the whole point of har
    val objs = new java.io.File(arch).listFiles().map(_.getName).sorted
    assert(objs.toSeq == Seq("_index", "_masterindex", "part-0"))
    // every file reads back bit-identical through the two-level index
    payloads.foreach { case (rel, want) =>
      val got = Harchive.read(arch, rel)
      assert(got.exists(_.sameElements(want)), s"$rel corrupt or missing")
    }
    // the archive lists as one logical dir tree
    assert(Harchive.ls(arch, "").get == (0 until 5).map(i => s"d$i"))
    assert(Harchive.ls(arch, "d0").get == Seq("sub0", "sub1", "sub2"))
    val d0s0 = Harchive.ls(arch, "d0/sub0").get
    assert(d0s0.nonEmpty && d0s0.forall(_.endsWith(".dat")))
    // misses are None, not errors; files don't ls, dirs don't read
    assert(Harchive.read(arch, "nope.dat").isEmpty)
    assert(Harchive.ls(arch, "d0/sub0/missing").isEmpty)
    assert(Harchive.read(arch, "d0").isEmpty)
    assert(Harchive.ls(arch, payloads.keys.head).isEmpty)
    // immutable: a second create into the same target refuses
    intercept[IllegalArgumentException](Harchive.create(src, arch))
  }

  test("partitioned write lays out one directory per key and prunes reads") {
    val path = Files.createTempDirectory("graft-part-spec-").resolve("t").toString
    Formats.writePartitioned(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_returnflag")),
      path, Seq("l_returnflag"))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs.forall(_.startsWith("l_returnflag=")), s"layout: $dirs")
    assert(dirs.size >= 2)
    val plan = Formats.readPartitioned(spark, path)
      .filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      "pruning filter missing from scan:\n" + plan)
  }

  test("compaction rewrites many small files into few") {
    val scatter = Files.createTempDirectory("graft-scatter-").resolve("s").toString
    Tables.lineitem(spark, sf).repartition(40)
      .write.mode("overwrite").parquet(scatter)
    val smallFiles = new java.io.File(scatter).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles >= 30, s"expected scattered input, got $smallFiles")
    val out = Files.createTempDirectory("graft-compact-").resolve("c").toString
    val nOut = Formats.compact(spark, scatter, out)
    assert(nOut <= 2, s"compaction produced $nOut files")
    assert(spark.read.parquet(out).count() == 6000)
  }

  test("gzip text round-trip preserves every line") {
    val path = Files.createTempDirectory("graft-text-spec-").resolve("t").toString
    val src = Tables.documents(spark, sf).select(col("text"))
    Formats.writeText(src, path, codec = Some("gzip"))
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".txt.gz")), s"no gzip part files: ${files.toSeq}")
    assert(Formats.readText(spark, path).count() == src.count())
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bkt")
    // force the SMJ path: at test scale the planner would broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("v", col("l_quantity") * col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: the sort-merge join must not re-shuffle
      assert(plan.contains("SortMergeJoin"), "expected SMJ:\n" + plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join re-shuffled:\n" + plan)
      assert(joined.count() == 6000) // every lineitem matches its order
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("sequence file round-trip preserves ids and text (V2 source)") {
    val path = Files.createTempDirectory("graft-seq-spec-").resolve("t").toString
    Formats.writeSequence(Tables.documents(spark, sf), path)
    val back = Formats.readSequence(spark, path)
    assert(back.count() == 500)
    val orig = Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    back.collect().foreach { r =>
      assert(orig(r.getLong(0)) == r.getString(1))
    }
    // V2 connector and the RDD bridge agree row-for-row
    val rdd = Formats.readSequenceRdd(spark, path)
    assert(back.orderBy("doc_id").collect().toSeq ==
      rdd.orderBy("doc_id").collect().toSeq)
    // one input partition per file
    assert(back.rdd.getNumPartitions ==
      new java.io.File(path).listFiles().count(f =>
        f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_")))
  }

  test("sequence file V2 WRITE path round-trips and MR-era reader agrees") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-seqw-spec-")
      .resolve("t").toString
    val src = graft.sources.sequence.SequenceFileSource.NAME
    Tables.documents(spark, sf)
      .select(col("doc_id").as("key"), col("text").as("value"))
      .write.format(src).mode("overwrite").save(path)
    // overwrite works (TRUNCATE capability)
    Tables.documents(spark, sf)
      .select(col("doc_id").as("key"), col("text").as("value"))
      .write.format(src).mode("overwrite").save(path)
    val back = spark.read.format(src).load(path)
    assert(back.count() == 500)
    val orig = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    back.collect().foreach(r => assert(orig(r.getLong(0)) == r.getString(1)))
    // the classic hadoop RDD reader consumes the V2-written files too
    val rdd = Formats.readSequenceRdd(spark, path)
    assert(rdd.count() == 500)
  }

  test("sorted sequence sink enforces the MapFile key-order contract") {
    import spark.implicits._
    val src = graft.sources.sequence.SequenceFileSource.NAME
    val dir = Files.createTempDirectory("graft-seqsort-spec-")
    // out-of-order keys in one partition must fail the write job
    val bad = Seq((5L, "e"), (2L, "b"), (9L, "i"))
      .toDF("key", "value").coalesce(1)
    val ex = intercept[Exception] {
      bad.write.format(src).option("sorted", "true")
        .mode("overwrite").save(dir.resolve("bad").toString)
    }
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
    assert(causes(ex).exists(_.contains("key out of order")),
      s"wrong failure: ${causes(ex)}")
    // the failed job must leave nothing visible (job-atomic staging)
    val badDir = new java.io.File(dir.resolve("bad").toString)
    assert(!badDir.exists() || badDir.listFiles().forall(f =>
      f.getName.startsWith(".") || f.getName.startsWith("_")),
      "aborted sorted write leaked visible files")
    // a sorted write passes and round-trips
    val good = Seq((2L, "b"), (5L, "e"), (9L, "i"))
      .toDF("key", "value").coalesce(1)
    good.write.format(src).option("sorted", "true")
      .mode("overwrite").save(dir.resolve("good").toString)
    val back = spark.read.format(src).load(dir.resolve("good").toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq((2L, "b"), (5L, "e"), (9L, "i")))
  }

  test("mergeSorted interleaves 3 sorted runs in global order with no sort/exchange") {
    val dirs = graft.operators.SourceOps.sortedRuns(spark, sf)
    val merged = graft.sources.sequence.SortedMerge
      .mergeSorted(spark, dirs, slices = 8)
    // plan check: the merge consumes pre-sorted runs — its plan must
    // contain neither a Sort nor any Exchange (q9 SORTS; this MERGES)
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"merge plan re-sorts:\n$plan")
    assert(!plan.contains("Exchange"), s"merge plan shuffles:\n$plan")
    // order check: keys strictly ascend across the whole collected
    // stream (partitions collect in partition-id order)
    val keys = merged.select("key").collect().map(_.getLong(0))
    assert(keys.length == Tables.orders(spark, sf).count())
    keys.sliding(2).foreach { case Array(a, b) =>
      assert(a < b, s"merge out of order: $a then $b")
    }
    // content check: merged == union of the runs
    val total = dirs.map(d =>
      spark.read.format(graft.sources.sequence.SequenceFileSource.NAME)
        .load(d).count()).sum
    assert(keys.length.toLong == total)
  }

  test("escaped text round-trip survives embedded newlines and tabs byte-for-byte") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nasty = Seq(
      (1L, "plain single line"),
      (2L, "two\nphysical\nlines"),
      (3L, "tab\there and % percent and %0A literal escape-code"),
      (4L, "trailing newline\n"),
      (5L, "%25%0A%09 pre-escaped-looking payload \n\t mixed"),
      // bare CR and CRLF are record delimiters to Hadoop's line
      // reader too — they must survive inside a payload
      (6L, "carriage\rreturn and crlf\r\npair and trailing cr\r"))
    val back = graft.operators.SourceOps
      .textEscapedRows(spark, nasty.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.foreach { case (id, text) =>
      assert(back(id) == text, s"doc $id mangled: ${back(id)}")
    }
  }

  test("bzip2 text is SPLITTABLE: one large file plans multiple input slices") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-bzsplit-")
    val bz = dir.resolve("bz").toString
    val gz = dir.resolve("gz").toString
    // ~40k lines in ONE file per codec
    val lines = spark.range(40000)
      .select(concat(lit("line-"), col("id"), lit(" "),
        md5(col("id").cast("string"))).as("value"))
      .coalesce(1)
    val sn = dir.resolve("sn").toString
    lines.write.option("compression", "bzip2").text(bz)
    lines.write.option("compression", "gzip").text(gz)
    lines.write.option("compression", "snappy").text(sn)
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val bzParts = spark.read.text(bz).rdd.getNumPartitions
      val gzParts = spark.read.text(gz).rdd.getNumPartitions
      val snParts = spark.read.text(sn).rdd.getNumPartitions
      // the splittable codec fans one file out across tasks;
      // the non-splittable ones are stuck with a single task per file
      assert(bzParts > 1, s"bzip2 file read as $bzParts split(s)")
      assert(gzParts == 1, s"gzip file unexpectedly split ($gzParts)")
      assert(snParts == 1, s"snappy file unexpectedly split ($snParts)")
      // and the split read loses nothing; snappy round-trips intact
      assert(spark.read.text(bz).count() == 40000)
      assert(spark.read.text(sn).count() == 40000)
    } finally saved match {
      case Some(v) => conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("malformed records: captured, dropped, or failed per mode (skip-bad-records analog)") {
    import org.apache.spark.sql.functions._
    // the reference skipped crashing inputs with
    // mapreduce.map.skip.maxrecords + counters; Spark's read modes
    // are the declarative equivalent: PERMISSIVE quarantines the bad
    // line in _corrupt_record (the counter AND the record),
    // DROPMALFORMED silently skips, FAILFAST refuses the batch
    val dir = Files.createTempDirectory("graft-badrec-")
    val path = dir.resolve("in.jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{"id": 3 BROKEN
        |not json at all
        |{"id": 4, "v": "fine"}
        |""".stripMargin)
    val schema = "id LONG, v STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(path).cache()
    assert(permissive.count() == 5)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(permissive.filter(col("_corrupt_record").isNull)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 4L))
    val dropped = spark.read.schema("id LONG, v STRING")
      .option("mode", "DROPMALFORMED").json(path)
    assert(dropped.count() == 3)
    val failing = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, v STRING")
        .option("mode", "FAILFAST").json(path).collect()
    }
    assert(failing.getMessage.contains("Malformed") ||
      String.valueOf(failing.getCause).contains("Malformed"))
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    import org.apache.spark.sql.functions._
    // the daily-ETL idiom at 100 TB: re-run one day's partition
    // without clobbering the table. Static overwrite mode would drop
    // EVERY partition; dynamic replaces only partitions present in
    // the incoming write.
    val dir = Files.createTempDirectory("graft-dynpart-")
      .resolve("t").toString
    val sp = spark
    import sp.implicits._
    val conf = spark.conf
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = conf.getOption(key)
    try {
      Seq((1L, "2024-01-01", "v1"), (2L, "2024-01-02", "v1"),
          (3L, "2024-01-03", "v1"))
        .toDF("id", "day", "payload")
        .write.partitionBy("day").parquet(dir)
      conf.set(key, "dynamic")
      // rewrite ONLY day 2
      Seq((20L, "2024-01-02", "v2")).toDF("id", "day", "payload")
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      val got = spark.read.parquet(dir)
        .select(col("id"), col("day").cast("string"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got == Set((1L, "2024-01-01", "v1"),
        (20L, "2024-01-02", "v2"), (3L, "2024-01-03", "v1")))
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("small-files read path packs many files into few splits (HAR analog)") {
    import org.apache.spark.sql.functions._
    // the reference solved many-small-files by ARCHIVING them
    // (fs/HarFileSystem.java: pack files, read through an index,
    // no rewrite of the data into fewer records). Spark's scan
    // planner solves the READ side without any archive: file
    // bin-packing puts many small files into one input slice, with
    // openCostInBytes as the per-file seek tax. src_compaction is
    // the rewrite-side complement.
    val dir = Files.createTempDirectory("graft-har-")
    // a 50-file scatter, ~2-3 KB each
    spark.range(5000)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .repartition(50)
      .write.parquet(dir.resolve("scatter").toString)
    val files = new java.io.File(dir.resolve("scatter").toString)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(files >= 40, s"expected a ~50-file scatter, got $files")
    val conf = spark.conf
    val savedMax = conf.getOption("spark.sql.files.maxPartitionBytes")
    val savedOpen = conf.getOption("spark.sql.files.openCostInBytes")
    try {
      // defaults (128 MB / 4 MB): the whole scatter is a handful of
      // splits — each task reads MANY files
      conf.set("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      conf.set("spark.sql.files.openCostInBytes", (4L << 20).toString)
      val df = spark.read.parquet(dir.resolve("scatter").toString)
      val packed = df.rdd.getNumPartitions
      assert(packed * 4 <= files,
        s"$files files should pack into few splits, got $packed")
      assert(df.count() == 5000)
      // with a zero open cost and a tiny split target the same layout
      // fans out — proving the packing is the CONF's doing, and the
      // per-file seek tax is what keeps a 100 TB listing from
      // becoming one task per tiny file
      conf.set("spark.sql.files.maxPartitionBytes", "8192")
      conf.set("spark.sql.files.openCostInBytes", "0")
      val scattered = spark.read.parquet(dir.resolve("scatter").toString)
        .rdd.getNumPartitions
      assert(scattered > packed,
        s"expected more splits at tiny target ($scattered vs $packed)")
    } finally {
      savedMax match {
        case Some(v) => conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => conf.unset("spark.sql.files.maxPartitionBytes")
      }
      savedOpen match {
        case Some(v) => conf.set("spark.sql.files.openCostInBytes", v)
        case None => conf.unset("spark.sql.files.openCostInBytes")
      }
    }
  }

  test("bucketed lookup scans exactly one bucket (MapFile-analog point probe)") {
    import org.apache.spark.sql.functions._
    val table = graft.operators.SourceOps.bucketedTable(spark, sf)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val probe = spark.table(table).filter(col("o_orderkey") === 42L)
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not fire:\n${plan.take(1200)}")
      // no shuffle either: the probe is a scan + filter, nothing else
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
      // result agrees with the flat parquet
      val expect = Tables.orders(spark, sf)
        .filter(col("o_orderkey") === 42L).count()
      assert(probe.count() == expect && expect == 1)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bloom lookup consults the sidecar before opening data files") {
    import graft.operators.SourceOps
    val path = SourceOps.bloomTable(spark, sf)
    val total = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(total == 16, s"expected 16 data files, got $total")
    // present keys admit only their own file(s), not the table
    val present = SourceOps.bloomCandidates(spark, path, Seq(42L, 777L))
    assert(present.nonEmpty && present.size < total,
      s"no file pruning: ${present.size} of $total files")
    // an absent key should open (almost) nothing — false positives are
    // possible but the deterministic hashes make the outcome stable
    val absent = SourceOps.bloomCandidates(spark, path, Seq(900000007L))
    assert(absent.size <= 1, s"absent key admitted ${absent.size} files")
    // no false negatives: the pruned lookup equals the flat-table scan
    val got = SparkEntry.queries("src_bloom_lookup")(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq.sorted
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderkey").isin(42L, 777L, 4242L, 900000007L))
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == want && got.nonEmpty, s"got $got, want $want")
  }

  test("nested round-trip writes a genuinely nested file and sliding windows double-count") {
    // the written file must carry array<struct>, not a flattened blob
    val path = java.nio.file.Files
      .createTempDirectory("graft-nested-spec-").resolve("t").toString
    Tables.orders(spark, sf).limit(100)
      .groupBy(col("o_custkey"))
      .agg(collect_list(struct(col("o_orderkey"))).as("orders"))
      .write.parquet(path)
    val schema = spark.read.parquet(path).schema
    assert(schema("orders").dataType.isInstanceOf[
      org.apache.spark.sql.types.ArrayType])
    // hopping windows: every event lands in exactly size/hop = 2
    // windows, so window counts sum to 2x the event count
    val win = SparkEntry.queries("q32_sliding_windows")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(win == 2 * events, s"window membership $win != 2x$events")
  }

  test("z-order layout prunes row groups a single-key sort cannot") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.SourceOps
    // sf0.01: the 2-D box hits 512 of 60000 rows — selective enough
    // for row-group stats to matter
    val d01 = "/root/testdata/sf0.01"
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("l_partkey").between(100L, 200L) &&
          col("l_suppkey").between(5L, 20L))
        .agg(count(lit(1)).as("n"))
      q.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case s: FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(st.plan)
        case other => other.children.flatMap(scans)
      }
      scans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    val z = scannedRows(SourceOps.zorderTable(spark, d01))
    val linear = scannedRows(SourceOps.linearTable(spark, d01))
    // both dimensions stay tight on the z curve: the scan emits a
    // fraction of what the unrelated-sort control reads
    assert(z < linear / 2, s"z-order scanned $z vs linear $linear")
    assert(z < 60000 / 4, s"z-order scanned $z of 60000")
  }

  test("range lookup prunes row groups via the sorted range layout") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val q = SparkEntry.queries("src_range_lookup")(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(1)).sum == 100) // 100 keys hit
    // descend through AQE stage boundaries (QueryStageExec keeps its
    // materialized subtree in `plan`, not in `children`)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(st.plan)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan)
    assert(scan.nonEmpty, "no file scan found")
    assert(scan.head.metadata("PushedFilters").contains("GreaterThanOrEqual"),
      s"range predicate not pushed: ${scan.head.metadata("PushedFilters")}")
    // min/max row-group stats + the sorted layout keep the scan to a
    // sliver of the table (1500 orders at sf0.001; a full scan would
    // read them all)
    val scanned = scan.map(_.metrics("numOutputRows").value).sum
    val total = Tables.orders(spark, sf).count()
    assert(scanned < total / 2,
      s"row-group pruning ineffective: scanned $scanned of $total")
  }

  test("sequence V2 write supports block compression, readable by both readers") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-seqc-spec-")
    val plain = dir.resolve("plain").toString
    val packed = dir.resolve("packed").toString
    val src = graft.sources.sequence.SequenceFileSource.NAME
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("key"), col("text").as("value")).coalesce(1)
    docs.write.format(src).mode("overwrite").save(plain)
    docs.write.format(src).mode("overwrite")
      .option("compression", "block").save(packed)
    def bytes(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).map(_.length).sum
    assert(bytes(packed) < bytes(plain),
      s"block compression did not shrink: ${bytes(packed)} vs ${bytes(plain)}")
    // both the V2 reader and the MR-era RDD reader decode it
    assert(spark.read.format(src).load(packed).count() == 500)
    assert(Formats.readSequenceRdd(spark, packed).count() == 500)
    // unknown codec names are rejected, not ignored
    intercept[Exception] {
      docs.write.format(src).mode("overwrite")
        .option("compression", "zstd").save(packed)
    }
  }

  test("bucketed-join query consumes on-disk bucketing: no join-side shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = SparkEntry.queries("src_bucketed_join")(spark, sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(900)}")
      // the only exchanges allowed are AFTER the join (groupBy priority,
      // final orderBy) — never a re-shuffle of either join key
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join re-shuffled a join side:\n${plan.take(1200)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("sequence V2 overwrite is job-atomic: a failed job leaves old data intact") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-seqa-spec-")
      .resolve("t").toString
    val src = graft.sources.sequence.SequenceFileSource.NAME
    Tables.documents(spark, sf)
      .select(col("doc_id").as("key"), col("text").as("value"))
      .write.format(src).mode("overwrite").save(path)
    // overwrite attempt whose tasks fail mid-write (null value trips
    // the writer's representability check) — under the r2 protocol
    // this destroyed the old table before any task ran
    val poisoned = Tables.documents(spark, sf)
      .select(col("doc_id").as("key"),
        when(col("doc_id") % 100 === 0, lit(null).cast("string"))
          .otherwise(col("text")).as("value"))
    intercept[Exception] {
      poisoned.write.format(src).mode("overwrite").save(path)
    }
    // previous contents fully readable, nothing partial is visible
    val back = spark.read.format(src).load(path)
    assert(back.count() == 500,
      "failed overwrite damaged the previous table contents")
    // and the failed job's staging dir was cleaned up on abort
    val leftovers = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(".graft-staging"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(",")}")
  }

  test("avro round-trip preserves every record and field") {
    val path = Files.createTempDirectory("graft-avro-spec-")
      .resolve("t").toString
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Formats.writeAvro(src, path)
    val back = Formats.readAvro(spark, path)
    assert(back.count() == 500)
    // field-exact: anti-join both ways is empty
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    // the container really is Avro data files (magic header "Obj\x01")
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)),
      "output is not an Avro object container file")
  }

  test("setfile analog: keys-only table is sorted, membership flags match the data") {
    import org.apache.spark.sql.functions._
    val table = SourceOps.setFileTable(spark, sf)
    // the staged run honors SetFile's contract: sorted keys, no values
    val back = spark.read
      .format(graft.sources.sequence.SequenceFileSource.NAME)
      .load(table).collect()
    assert(back.forall(_.getString(1).isEmpty), "SetFile values must be empty")
    val keys = back.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted && keys.distinct == keys)
    val expect = keys.toSet
    val got = SourceOps.setMembership(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    SourceOps.SET_PROBES.foreach { p =>
      assert(got(p) == (if (expect(p)) 1L else 0L), s"probe $p")
    }
  }

  test("arrayfile analog: positional lookup equals the window-ranked answer") {
    import org.apache.spark.sql.functions._
    val got = SourceOps.arrayLookup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey"))
    val expect = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .filter(col("pos").isin(SourceOps.ARRAY_POSITIONS: _*))
      .select("pos", "o_orderkey", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == expect && got.size == SourceOps.ARRAY_POSITIONS.size)
  }
}
