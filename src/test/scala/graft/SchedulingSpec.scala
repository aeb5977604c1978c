package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-tenant scheduling story — the Spark-native analog of the
  * reference's resource-manager third (hadoop-yarn-project/.../
  * scheduler/capacity/CapacityScheduler.java:1 — queue capacities and
  * preemption-free fair sharing) and of MR1 speculative execution
  * (the slow-task re-launch in the JobTracker): FAIR scheduler pools
  * with weights/minShares keep a small interactive query from being
  * starved by a saturating batch job, and `spark.speculation` detects
  * stragglers and submits speculative attempts. Pool + speculation
  * confs live on the shared TestSpark session (context-level).
  */
class SchedulingSpec extends AnyFunSuite {
  import TestSpark._

  test("FAIR pools: interactive work is not starved by a saturating batch job") {
    val sc = spark.sparkContext
    // batch: 24 tasks x 400ms over 4 cores = 6 full waves (~2.4s),
    // submitted FIRST — under FIFO the 1-task interactive job would
    // queue behind all 24 tasks and see the full batch latency
    @volatile var batchSum = 0.0
    @volatile var interactiveMs = Long.MaxValue
    @volatile var failure: Option[Throwable] = None
    val batch = new Thread(() => {
      try {
        sc.setLocalProperty("spark.scheduler.pool", "batch")
        batchSum = sc.parallelize(1 to 24, 24)
          .map { i => Thread.sleep(400); i.toDouble }.sum()
      } catch { case t: Throwable => failure = Some(t) }
      finally sc.setLocalProperty("spark.scheduler.pool", null)
    })
    val inter = new Thread(() => {
      try {
        sc.setLocalProperty("spark.scheduler.pool", "interactive")
        Thread.sleep(300) // let the batch job occupy every core first
        val t0 = System.nanoTime()
        val r = sc.parallelize(1 to 4, 1).map(_ * 2).sum()
        interactiveMs = (System.nanoTime() - t0) / 1000000
        assert(r == 20.0)
      } catch { case t: Throwable => failure = Some(t) }
      finally sc.setLocalProperty("spark.scheduler.pool", null)
    })
    val t0 = System.nanoTime()
    batch.start(); inter.start()
    inter.join(30000); batch.join(60000)
    val batchMs = (System.nanoTime() - t0) / 1000000
    failure.foreach(throw _)
    assert(batchSum == (1 to 24).map(_.toDouble).sum)
    assert(batchMs >= 2000, s"batch finished implausibly fast: ${batchMs}ms")
    // the interactive pool's minShare seats the query at the first
    // free slot (one 400ms wave) instead of behind the whole queue
    assert(interactiveMs < batchMs / 2,
      s"interactive starved: ${interactiveMs}ms vs batch ${batchMs}ms")
  }

  test("weighted pools: 2:1 task-seat share between two saturating tenants") {
    // The CapacityScheduler guarantee re-expressed in Spark terms:
    // two pools (gold weight 2, silver weight 1) each submit a
    // saturating job of identical 200ms tasks on 4 seats. FAIR
    // scheduling equalizes runningTasks/weight, so gold holds ~2/3 of
    // the seats and completes ~2x silver's tasks over any contention
    // window. PREEMPTION IS A NON-GOAL: shares apply at seat
    // ASSIGNMENT time only — a running task is never killed to
    // rebalance (Spark has no pool preemption), which is why the
    // assertion measures throughput share, not instantaneous seats.
    import org.apache.spark.scheduler.{SparkListener,
      SparkListenerJobStart, SparkListenerTaskEnd}
    val sc = spark.sparkContext
    val stagePool =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val done = Map(
      "gold" -> new java.util.concurrent.atomic.AtomicInteger,
      "silver" -> new java.util.concurrent.atomic.AtomicInteger)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val pool = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.scheduler.pool")))
          .getOrElse("default")
        if (done.contains(pool))
          e.stageIds.foreach(sid => stagePool.put(sid, pool))
        ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        Option(stagePool.get(e.stageId)).foreach(p =>
          done(p).incrementAndGet())
        ()
      }
    }
    sc.addSparkListener(listener)
    @volatile var failure: Option[Throwable] = None
    // silver's completed count the moment gold drains = the share
    // observed over gold's whole (fully contended) lifetime
    @volatile var silverAtGoldEnd = -1
    try {
      val nTasks = 40
      def saturate(pool: String): Thread = new Thread(() => {
        try {
          sc.setLocalProperty("spark.scheduler.pool", pool)
          val s = sc.parallelize(1 to nTasks, nTasks)
            .map { i => Thread.sleep(200); i.toLong }.sum()
          assert(s == (1 to nTasks).sum.toDouble)
          if (pool == "gold") silverAtGoldEnd = done("silver").get
        } catch { case t: Throwable => failure = Some(t) }
        finally sc.setLocalProperty("spark.scheduler.pool", null)
      })
      val gold = saturate("gold"); val silver = saturate("silver")
      gold.start(); silver.start()
      gold.join(60000); silver.join(60000)
      failure.foreach(throw _)
      assert(done("gold").get == nTasks && done("silver").get == nTasks)
      // gold drained first (it had the larger share), while silver
      // still had pending work — contention covered the whole window
      assert(silverAtGoldEnd >= 0 && silverAtGoldEnd < nTasks,
        s"silver finished before gold ($silverAtGoldEnd) — no contention")
      // observed share: gold ran 40 tasks while silver ran ~20.
      // Wave granularity and listener lag blur the edges; accept
      // anything clearly weighted (ratio 40/silverAtGoldEnd in
      // [1.3, 4]) rather than flaking on exact 2.0
      val ratio = nTasks.toDouble / math.max(silverAtGoldEnd, 1)
      info(f"gold:silver throughput share $ratio%.2f (want ~2)")
      assert(ratio >= 1.3 && ratio <= 4.0,
        f"share $ratio%.2f not ~2:1 (silver=$silverAtGoldEnd at gold end)")
    } finally sc.removeSparkListener(listener)
  }

  test("speculation: a straggler is detected and a speculative attempt submitted") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted}
    val sc = spark.sparkContext
    val speculated = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onSpeculativeTaskSubmitted(
          e: SparkListenerSpeculativeTaskSubmitted): Unit = {
        speculated.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      // 15 x 50ms + one 4s straggler: once the 75th-percentile
      // runtime closes (~4 waves), the scheduler's own
      // checkSpeculatableTasks() pass flags the straggler at 2x
      // median and submits a speculative attempt. Local mode never
      // starts the timer that runs that pass (TaskSchedulerImpl.start
      // gates on !isLocal) so the spec drives the same public entry
      // point; the copy is never PLACED (one host), so the original's
      // result is the one collected, deterministically.
      val job = new Thread(() => {
        val sum = sc.parallelize(1 to 16, 16).map { i =>
          Thread.sleep(if (i == 7) 4000 else 50); i.toLong
        }.sum()
        assert(sum == (1 to 16).sum.toDouble)
      })
      job.start()
      val deadline = System.currentTimeMillis() + 3500
      while (speculated.get < 1 && System.currentTimeMillis() < deadline) {
        org.apache.spark.SchedulerProbe.checkSpeculatableTasks(sc)
        Thread.sleep(100)
      }
      job.join(30000)
      assert(speculated.get >= 1,
        "scheduler never submitted a speculative attempt for the straggler")
    } finally sc.removeSparkListener(listener)
  }
}
