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
