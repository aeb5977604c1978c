package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{classic, DataFrame, Row}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one internal seam a V1 streaming `Source` implementation
  * needs: `getBatch` must hand the engine a DataFrame whose leaves
  * are flagged `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only constructors for such a frame — `Dataset.ofRows`,
  * `internalCreateDataFrame` — are `private[sql]`. This object lives
  * under the `org.apache.spark.sql` package purely to cross that
  * visibility line, exactly the way external connectors (Delta's
  * DeltaSource among them) bridge the same seam; it contains no
  * copied Spark code. */
object StreamShim {

  /** Re-issue `df`'s analyzed plan with its relation leaves marked
    * streaming, so a V1 `Source.getBatch` can return an ordinary
    * parquet scan. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val plan = cdf.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
    }
    classic.Dataset.ofRows(cdf.sparkSession, plan)
  }
}
