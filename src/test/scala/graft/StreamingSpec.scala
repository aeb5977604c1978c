package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming jobs must agree with their batch twins on the same data:
  * the parquet file drives one micro-batch via processAllAvailable. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly counts equal batch q19") {
    val q = EventStreams.hourlyCounts(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly")
      .start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits windows the watermark has closed; compare
    // those against the batch result restricted to the same hours
    val streamed = spark.table("hourly")
      .select("hour", "event_type", "n", "value_cents").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val batch = SparkEntry.queries("q19_event_windows")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed.nonEmpty, "streaming emitted no closed windows")
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: streamed=$v batch=${batch.get(k)}")
    }
  }

  test("native session_window: stream equals batch, batch equals lag-gap") {
    import org.apache.spark.sql.expressions.Window
    // batch run of the SAME aggregation (session_window works in batch)
    val batchDf = graft.sources.Tables.events(spark, sf)
    val batch = EventStreams.sessionWindows(batchDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(batch.nonEmpty)
    // lag-gap reference with >= new-session semantics (half-open
    // windows: a successor exactly gap later is a NEW session)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val ref = batchDf
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("us") - col("prev") >= 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"),
        (max(col("us")) + lit(1800000000L)).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(batch == ref,
      "native session_window diverges from the lag-gap formulation")
    // streaming: append mode emits only watermark-closed sessions;
    // every emitted session must equal its batch twin exactly
    val q = EventStreams.sessionWindows(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("session_windows")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("session_windows").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.nonEmpty, "stream emitted no closed sessions")
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v),
        s"session $k: streamed=$v batch=${batch.get(k)}")
    }
  }

  test("streaming dedup by key drops watermark-window duplicates") {
    // duplicate every event by unioning the stream with itself;
    // dropDuplicates on the key must restore the original count
    val ev = EventStreams.readEvents(spark, sf)
    val q = ev.union(ev)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_stream").count() == 1000) // sf0.001 events
  }

  test("sessionization runs on the RocksDB state store (production backend)") {
    // the HDFS-backed in-memory store is the test default; RocksDB is
    // what a 100 TB deployment uses (state >> heap). Same results.
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q = EventStreams.sessionize(EventStreams.readEvents(spark, sf))
        .writeStream.outputMode("append")
        .format("memory").queryName("sessions_rocks")
        .start()
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("sessions_rocks").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = SparkEntry.queries("q21_sessionize")(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch)
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("transformWithState sessionization equals batch q21 (Spark 4 state API)") {
    // the new arbitrary-state API is implemented only on RocksDB —
    // which is also the production backend
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q = EventStreams.sessionizeTws(EventStreams.readEvents(spark, sf))
        .writeStream.outputMode("update")
        .format("memory").queryName("sessions_tws")
        .start()
      q.processAllAvailable()
      q.stop()
      // update mode re-emits a user's snapshot each batch; the toMap
      // keeps the last (cumulative) row per user
      val streamed = spark.table("sessions_tws").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = SparkEntry.queries("q21_sessionize")(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch)
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("transformWithState timers expire idle users' session state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sp = spark
      import sp.implicits._
      implicit val ctx = spark.sqlContext
      val base = 1700000000000L
      def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val events = mem.toDF().toDF("user_id", "ts")
      val q = EventStreams.sessionizeTws(events)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_expiry")
        .start()
      // batch 1: two users, two events each in one session
      mem.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      // batch 2: only user 1 stays active; the sentinel advances the
      // watermark far past user 2's last event + gap, so user 2's
      // timer fires and their state is DROPPED
      mem.addData((1L, ts(240)))
      q.processAllAvailable()
      // batch 3: drain once more so the expiry batch's metrics land
      mem.addData((1L, ts(241)))
      q.processAllAvailable()
      val stateRows = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten
          .map(_.numRowsTotal))
        .headOption.getOrElse(-1L)
      // user 2 expired; user 1 (and only user 1) still holds state
      assert(stateRows == 1L,
        s"expected exactly 1 surviving state row, got $stateRows")
      // the totals snapshots are still cumulative and correct: user 1
      // saw 4 events / 2 sessions (gap between min 5 and min 240),
      // user 2 saw 2 events / 1 session before expiring
      val last = spark.table("tws_expiry").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(last(1L) == (4L, 2L) && last(2L) == (2L, 1L))
      // RESET-ON-RETURN (the documented caveat): user 2's state was
      // dropped by the timer, so when they come back their fold
      // restarts from zero — the new snapshot counts ONLY the new
      // events (1 event, 1 session), regressing the (2,1) row above
      // under upsert semantics rather than resuming it
      mem.addData((2L, ts(242)))
      q.processAllAvailable()
      val returned = spark.table("tws_expiry").collect()
        .filter(_.getLong(0) == 2L)
        .map(r => (r.getLong(1), r.getLong(2)))
      q.stop()
      assert(returned.contains((1L, 1L)),
        s"expired user's return must restart from zero: ${returned.mkString(",")}")
      assert(!returned.contains((3L, 2L)),
        "expired user's return must NOT resume the dropped totals")
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("transformWithState state survives a checkpointed restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sp = spark
      import sp.implicits._
      implicit val ctx = spark.sqlContext
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tws-ckpt-").toString
      val base = 1700000000000L
      def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      // the memory sink refuses checkpoint recovery; foreachBatch is
      // the restartable sink (same harness as the file-source spec)
      val seen = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
      def start() = EventStreams
        .sessionizeTws(mem.toDF().toDF("user_id", "ts"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStreams.UserSessions],
           _: Long) =>
            b.collect().foreach(u =>
              seen.put(u.user_id, (u.n_events, u.n_sessions)))
            ()
        }
        .start()
      // run 1: user 1 opens a session
      val q1 = start()
      mem.addData((1L, ts(0)), (1L, ts(5)))
      q1.processAllAvailable()
      q1.stop()
      assert(seen.get(1L) == (2L, 1L))
      // run 2 against the SAME checkpoint: a third event within the
      // gap must extend the CHECKPOINTED session — 3 events, still 1
      // session — not start over from empty state
      val q2 = start()
      mem.addData((1L, ts(10)))
      q2.processAllAvailable()
      q2.stop()
      assert(seen.get(1L) == (3L, 1L),
        s"state did not survive the restart: ${seen.get(1L)}")
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("TTL dedup on RocksDB: drops within-horizon dups, re-admits after expiry, state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sp = spark
      import sp.implicits._
      implicit val ctx = spark.sqlContext
      val base = 1700000000000L
      def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val docs = mem.toDF().toDF("doc_id", "text", "ts")
      val q = graft.streaming.DocumentStreams
        .ingestDedupTtl(docs, "0 seconds", ttlMs = 30 * 60000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("ttl_dedup")
        .start()
      // batch 1: two distinct docs -> both emitted
      mem.addData((1L, "doc one", ts(0)), (2L, "doc two", ts(0)))
      q.processAllAvailable()
      // batch 2: duplicate of doc one inside the 30-min TTL -> dropped
      mem.addData((3L, "doc one", ts(10)))
      q.processAllAvailable()
      // batch 3: unrelated doc far in the future advances the watermark
      // way past every sighting + TTL
      mem.addData((4L, "tick", ts(120)))
      q.processAllAvailable()
      // batch 4: doc one again, 110 min after its last sighting -> its
      // fingerprint fell out of the horizon, so it is re-admitted
      mem.addData((5L, "doc one", ts(125)))
      q.processAllAvailable()
      val emitted = spark.table("ttl_dedup").collect()
        .map(_.getLong(0)).toSet
      q.stop()
      assert(emitted == Set(1L, 2L, 4L, 5L),
        s"horizon semantics broken, emitted: $emitted")
      // bounded state: only fingerprints inside the final horizon
      // survive ("tick" + re-admitted "doc one"); doc two's state was
      // expired by the timeout even though its fp never re-arrived
      val stateRows = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
        .headOption.getOrElse(-1L)
      assert(stateRows >= 0 && stateRows <= 2,
        s"state not bounded by the TTL horizon: $stateRows rows")
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("streaming document ingest: quality gate + incremental dedup") {
    val docs = graft.streaming.DocumentStreams.readDocuments(spark, sf)
    // double-deliver the corpus: dedup must keep one copy per
    // distinct fingerprint that passes the quality gate
    val q = graft.streaming.DocumentStreams.ingest(docs.union(docs))
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_ingest")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("doc_ingest")
    val batchExpected = graft.sources.Tables.documents(spark, sf)
      .withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .filter(col("n_tokens") >= 10)
      .select(md5(lower(trim(col("text"))).cast("binary")).as("fp"))
      .distinct().count()
    assert(streamed.count() == batchExpected)
    assert(streamed.select("fp").distinct().count() == batchExpected)
  }

  test("streaming curation: gopher gate + pii scrub rollup equals batch pipeline_v2") {
    // the SAME single-projection curation row feeds batch and stream
    // (TextAnalysis.curationRows is row-local, so it lifts to a
    // streaming frame unchanged); the per-source rollup runs in
    // complete mode and its final state must equal the batch rollup
    val docs = graft.streaming.DocumentStreams.readDocuments(spark, sf)
    val rolled = graft.operators.TextAnalysis
      .curationRows(docs.select(col("doc_id"), col("text"), col("source")))
      .filter(col("kept") === 1L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("pii_hits")).as("n_pii_hits"),
        sum(col("len_clean")).as("clean_len_sum"),
        sum(graft.functions.RollingHash.rollingHash(col("clean_fp")))
          .as("clean_fp_fold_sum"))
    val q = rolled.writeStream.outputMode("complete")
      .format("memory").queryName("curation_rollup")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curation_rollup").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    val batch = SparkEntry.queries("txt_pipeline_v2")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(streamed == batch, "streaming rollup diverges from batch")
  }

  test("AvailableNow drains a multi-file backlog in bounded micro-batches") {
    // the 100 TB reprocessing story: a large backlog must stream
    // through as MANY bounded batches (maxFilesPerTrigger), not one
    // giant batch that needs the whole corpus's worth of memory —
    // and AvailableNow must still terminate when the backlog drains
    val dir = java.nio.file.Files
      .createTempDirectory("graft-backlog-").resolve("in").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.repartition(4).write.parquet(dir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); total.addAndGet(b.count()); ()
      }
      .start()
    q.awaitTermination(120000)
    assert(batches.get() >= 4, s"backlog not chunked: ${batches.get()} batch(es)")
    assert(total.get() == 500L, s"rows lost in re-chunking: ${total.get()}")
  }

  test("checkpointed restart resumes where it left off, not from zero") {
    // the durability half of incremental processing: a second run
    // against the same checkpoint must see ONLY files that arrived
    // after the first run drained — restart-safe exactly-once source
    // accounting, the property a 100 TB continuous-ingest job lives on
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val older = docs.filter(col("doc_id") < 250)
    val newer = docs.filter(col("doc_id") >= 250)
    older.write.parquet(in)
    def drain(): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.schema(docs.schema).parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          total.addAndGet(b.count()); ()
        }
        .start()
      q.awaitTermination(120000)
      total.get()
    }
    assert(drain() == older.count())
    newer.write.mode("append").parquet(in)
    assert(drain() == newer.count(),
      "restarted query reprocessed already-committed files")
  }

  test("foreachBatch lands micro-batches in the transactional SequenceFile sink") {
    // the streaming -> storage bridge: each micro-batch appends through
    // the DSv2 writer, so every batch gets the job-atomic staging
    // protocol (a failed batch can never leave partial files visible)
    val out = java.nio.file.Files
      .createTempDirectory("graft-stream-seq-").resolve("t").toString
    val src = graft.sources.sequence.SequenceFileSource.NAME
    val docs = graft.streaming.DocumentStreams.readDocuments(spark, sf)
    val q = docs
      .select(col("doc_id").as("key"), col("text").as("value"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format(src).mode("append").save(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format(src).load(out)
    assert(back.count() == 500)
    // MR-era reader consumes the streamed table too
    assert(graft.sources.Formats.readSequenceRdd(spark, out).count() == 500)
  }

  test("CDC upsert sink: micro-batches merge latest-wins, equal to the batch merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft-upsert-sink-").toString
    val table = root + "/table"
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.UpsertSink.start(
      mem.toDF().toDF("key", "payload", "version"),
      table, root + "/ckpt")
    try {
      // batch 1: three inserts
      mem.addData((1L, "a1", 1L), (2L, "b1", 1L), (3L, "c1", 1L))
      q.processAllAvailable()
      // batch 2: update key 2, insert key 4
      mem.addData((2L, "b2", 2L), (4L, "d1", 1L))
      q.processAllAvailable()
      // batch 3: update keys 1 and 4
      mem.addData((1L, "a3", 3L), (4L, "d2", 2L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(table).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("a3", 3L), 2L -> ("b2", 2L),
      3L -> ("c1", 1L), 4L -> ("d2", 2L)))
    // equals the BATCH merge of the whole change log in one shot
    val log = Seq((1L, "a1", 1L), (2L, "b1", 1L), (3L, "c1", 1L),
      (2L, "b2", 2L), (4L, "d1", 1L), (1L, "a3", 3L), (4L, "d2", 2L))
      .toDF("key", "payload", "version")
    val batchTwin = graft.streaming.UpsertSink
      .merge(log, root + "/absent")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got == batchTwin)
    // no staging/retired residue next to the table
    val leftovers = new java.io.File(root).listFiles
      .map(_.getName).filter(n => n.contains("staging") || n.contains("retired"))
    assert(leftovers.isEmpty, s"publish residue: ${leftovers.toSeq}")
  }

  test("CDC upsert sink: replay recovers a table stranded mid-publish") {
    // crash window of the two-rename swap: the table was retired but
    // the staged merge never landed. A replayed batch must restore the
    // retired copy before merging — merging against a falsely-empty
    // table would silently drop every prior row.
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-upsert-crash-").toString
    val table = root + "/table"
    val b0 = Seq((1L, "a1", 1L), (2L, "b1", 1L))
      .toDF("key", "payload", "version")
    graft.streaming.UpsertSink.publish(b0, table, 0L)
    val fs = new Path(table).getFileSystem(new Configuration())
    assert(fs.rename(new Path(table), new Path(table + ".retired-1")))
    fs.mkdirs(new Path(table + ".staging-1")) // half-written staging
    val b1 = Seq((2L, "b2", 2L), (3L, "c1", 1L))
      .toDF("key", "payload", "version")
    graft.streaming.UpsertSink.publish(b1, table, 1L)
    val got = spark.read.parquet(table).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("a1", 1L), 2L -> ("b2", 2L), 3L -> ("c1", 1L)),
      "replay after mid-publish crash lost prior rows")
    // recovery also swept the crash residue
    val leftovers = new java.io.File(root).listFiles
      .map(_.getName).filter(n => n.contains("staging") || n.contains("retired"))
    assert(leftovers.isEmpty, s"crash residue: ${leftovers.toSeq}")
  }

  test("stream-static enrichment join equals the batch join, stateless") {
    import graft.sources.Tables
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val q = EventStreams.enrichWithDim(EventStreams.readEvents(spark, sf), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched")
      .start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    val streamed = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3)))
      .toMap
    val batch = EventStreams.enrichWithDim(
        Tables.events(spark, sf).select(
          col("event_id"), col("user_id"), col("event_type")), dim)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3)))
      .toMap
    assert(streamed.size == 1000 && streamed == batch)
    // every event user resolved a segment (dim covers the id space)
    assert(streamed.values.forall(_._3 != "(none)"))
    // stateless: the join keeps NO streaming state rows at all
    assert(progress == null || progress.stateOperators.isEmpty ||
      progress.stateOperators.forall(_.numRowsTotal == 0))
  }

  test("stream-stream interval join equals its batch twin") {
    val q = EventStreams.purchaseClickJoin(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin on the same data
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER join: null rows flush only when the watermark closes the window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = EventStreams.purchaseClickJoinOuter(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssoj")
      .start()
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    input.addData(rows)
    q.processAllAvailable()
    // before any watermark advance, no unmatched purchase may have
    // flushed a null row for event times near the stream head
    val early = spark.table("ssoj").collect().count(_.isNullAt(1))
    // two sentinel batches, each advancing BOTH event-time columns
    // (the global watermark is the MIN of the two sides — a
    // click-only sentinel would leave the purchase watermark behind
    // the last real purchase forever): batch N's watermark derives
    // from batch N-1's max, so the first pair raises it and the
    // second runs under it, flushing the last in-horizon unmatched
    // purchases deterministically (processAllAvailable does not wait
    // for no-data batches). Sentinels use disjoint negative users so
    // they can never join; sentinel purchases are filtered out below.
    val maxTs = rows.map(_._2.getTime).max
    Seq(10L, 11L).foreach { h =>
      input.addData(Seq(
        (-1L, new java.sql.Timestamp(maxTs + h * 3600 * 1000), -1L, "click"),
        (-2L, new java.sql.Timestamp(maxTs + h * 3600 * 1000), -2L,
          "purchase")))
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("ssoj").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .filter(_._1 >= 0).toSet // drop flushed sentinel purchases
    // batch twin: full LEFT join on the same data
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"), "left_outer")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(streamed == batch,
      s"extra=${(streamed -- batch).take(8)} missing=${(batch -- streamed).take(8)}")
    val nulls = streamed.count(_._2.isEmpty)
    assert(nulls > 0, "corpus has no organic purchases — test is vacuous")
    assert(nulls >= early,
      "null rows must not shrink after the watermark advances")
  }

  test("stream-stream FULL OUTER join equals the batch full outer after both watermarks close") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = EventStreams.purchaseClickJoinFull(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssfoj")
      .start()
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    input.addData(rows)
    q.processAllAvailable()
    // sentinel pairs advance BOTH event-time columns (global
    // watermark = min of the sides), as in the left-outer spec;
    // disjoint negative users so sentinels can never join real rows
    val maxTs = rows.map(_._2.getTime).max
    Seq(10L, 11L).foreach { h =>
      input.addData(Seq(
        (-1L, new java.sql.Timestamp(maxTs + h * 3600 * 1000), -1L, "click"),
        (-2L, new java.sql.Timestamp(maxTs + h * 3600 * 1000), -2L,
          "purchase")))
      q.processAllAvailable()
    }
    q.stop()
    def key(r: org.apache.spark.sql.Row): (Option[Long], Option[Long]) =
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))
    // drop flushed sentinel rows (either side negative)
    val streamed = spark.table("ssfoj").collect().map(key)
      .filter { case (p, c) =>
        p.forall(_ >= 0) && c.forall(_ >= 0) }.toSet
    // batch twin: full outer on the same data
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"), "full_outer")
      .select("purchase_id", "click_id").collect().map(key).toSet
    assert(streamed == batch,
      s"extra=${(streamed -- batch).take(8)} missing=${(batch -- streamed).take(8)}")
    // the CDC shape is exercised from BOTH directions: organic
    // purchases AND unconverted clicks each produced null rows
    assert(streamed.exists { case (p, c) => p.nonEmpty && c.isEmpty },
      "no purchase-side null rows — full outer is degenerate")
    assert(streamed.exists { case (p, c) => p.isEmpty && c.nonEmpty },
      "no click-side null rows — full outer is degenerate")
  }

  test("streaming heavy hitters: micro-batch CMS equals the batch sketch, state constant") {
    // documents stream in as micro-batches (maxFilesPerTrigger=1 over a
    // 4-file staging of the corpus); the streaming aggregation folds
    // every batch into the constant d*w counter table. After the drain,
    // the top-10 computed FROM THE STREAMED SKETCH must equal batch
    // txt_heavy_hitters — sketch parity, not just top-k parity.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cms-stream-").resolve("in").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.repartition(4).write.parquet(dir)
    val q = graft.streaming.DocumentStreams.cmsCells(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream")
      .start()
    q.processAllAvailable()
    // streaming state = the counter table itself: bounded by d*w cells
    val stateRows = q.recentProgress.reverse
      .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .headOption.getOrElse(-1L)
    q.stop()
    assert(stateRows > 0 && stateRows <= 4 * 2048,
      s"CMS state not constant-bounded: $stateRows rows")
    val streamedSketch = spark.table("cms_stream")
    val w = graft.operators.TextAnalysis.words(docs)
    val fromStream = graft.operators.TextAnalysis
      .estimateTopK(w, streamedSketch).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = SparkEntry.queries("txt_heavy_hitters")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fromStream == batch)
  }

  test("stateful sessionization equals batch q21") {
    val q = EventStreams.sessionize(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("q21_sessionize")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }
}
