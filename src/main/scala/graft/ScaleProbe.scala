package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the same queries against two data dirs and print the
  * scaling ratio — evidence for the would-it-hold-at-N× question.
  *
  * Usage: runMain graft.ScaleProbe <dirSmall> <dirBig> <q1,q2,...>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(small, big, qcsv) = args.take(3)
    val names = qcsv.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.TxnLogCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    time(names.head, small)
    println(f"${"query"}%-22s ${"small"}%8s ${"big"}%8s ratio")
    names.foreach { n =>
      val a = time(n, small)
      val b = time(n, big)
      println(f"$n%-22s $a%8.2f $b%8.2f ${b / a}%5.1fx")
    }
    spark.stop()
  }
}
