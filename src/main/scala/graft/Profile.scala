package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: run chosen queries N times each in one JVM and report
  * wall seconds plus scheduler counters (jobs / stages / tasks and
  * summed task time) per run, so overhead-dominated queries (many
  * tiny stages) can be told apart from compute-bound ones. Same
  * session config as Bench; noop sink; not part of the driver
  * contract.
  *
  * Usage: runMain graft.Profile <sfDir> <reps> <query>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.sources.TxnLogCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    // SPARK_GRAFT_PROF_STAGES=1: per-stage (tasks, taskSec, name) dump
    // after each rep — attributes a regression to its operator chain
    val stageDetail = sys.env.get("SPARK_GRAFT_PROF_STAGES").contains("1")
    val stageRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          if (stageDetail) stageRows.add((st.stageInfo.stageId,
            st.stageInfo.numTasks,
            Option(st.stageInfo.taskMetrics)
              .map(_.executorRunTime).getOrElse(0L),
            st.stageInfo.name.takeWhile(_ != '\n').take(120)))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    try run("q1_pricing_summary") catch { case _: Throwable => () } // warmup
    graft.operators.Dedup.stageShingles(spark, sfDir)

    names.foreach { n =>
      (1 to reps).foreach { rep =>
        synchronized { jobs = 0; stages = 0; tasks = 0; taskMs = 0L }
        stageRows.clear()
        val t0 = System.nanoTime()
        try run(n) catch {
          case e: Throwable => println(s"PROF $n rep$rep FAILED: $e")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        // brief settle so straggling listener events land in this rep
        Thread.sleep(150)
        println(f"PROF $n%-32s rep$rep wall=$wall%7.3f jobs=$jobs%3d " +
          f"stages=$stages%4d tasks=$tasks%5d taskSec=${taskMs / 1e3}%8.2f")
        if (stageDetail) {
          import scala.jdk.CollectionConverters._
          stageRows.asScala.toSeq.sortBy(-_._3).take(12).foreach {
            case (id, nt, ms, nm) =>
              println(f"  STAGE $id%4d tasks=$nt%4d runSec=${ms / 1e3}%7.2f  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
