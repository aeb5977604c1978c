package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop Streaming re-expressed: pipe records through an external
  * process per partition (the streaming-jar contract: stdin lines in,
  * stdout lines out). RDD.pipe is the direct equivalent — each task
  * launches the command once and streams its partition through it.
  */
object StreamingPipe {
  def pipe(s: SparkSession, df: DataFrame, command: String): DataFrame = {
    val sp = s
    import sp.implicits._
    df.toJSON.rdd.pipe(command).toDF("line")
  }
}
