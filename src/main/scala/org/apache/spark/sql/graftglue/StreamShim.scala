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

  /** The sink-side mirror of [[asStreamingBatch]]: a V1 `Sink`'s
    * `addBatch` receives a DataFrame backed by the engine's
    * IncrementalExecution, which ordinary writers refuse ("write on
    * streaming dataset"). Re-issue its rows as a plain batch frame —
    * the micro-batch's physical plan executes ONCE here and the
    * copied rows feed the sink's writer, the same shape Spark's own
    * V1 sinks use. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
    cdf.sparkSession.internalCreateDataFrame(rdd, cdf.schema,
      isStreaming = false)
  }

  /** A DataFrame over an analyzed logical plan — `Dataset.ofRows` is
    * private[sql]; a command that must execute a CTAS query plan
    * itself (to stage it through a partition layout) crosses the
    * line here. */
  def ofRows(session: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      plan)

  /** Build the V1 `StreamingRelation` a path-addressed
    * `readStream.format(...)` plans, over an explicit option map and
    * PRESERVED output attributes — what the catalog-name streaming
    * rewrite substitutes for a `StreamingRelationV2`, so a stream on
    * a table NAME runs the same proven source as a stream on its
    * path. `DataSource` and the relation constructor are
    * private[sql], hence this bridge. */
  def streamingRelation(session: org.apache.spark.sql.SparkSession,
      className: String, options: Map[String, String],
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      sparkSession = session.asInstanceOf[classic.SparkSession],
      className = className,
      options = options)
    org.apache.spark.sql.execution.streaming.runtime
      .StreamingRelation(ds, className, output)
  }

  /** Resolve a plain parquet `BaseRelation` over an explicit file
    * list — what a `RelationProvider` must hand back so a custom
    * format's batch reads plan as ordinary HadoopFsRelation scans
    * (whole-stage codegen, filter pushdown, column pruning), instead
    * of an opaque RDD[Row]. `DataSource.resolveRelation` is the
    * constructor Spark's own paths use; it is private[sql], hence
    * this bridge. */
  def resolveParquet(session: org.apache.spark.sql.SparkSession,
                     paths: Seq[String],
                     schema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.sources.BaseRelation =
    org.apache.spark.sql.execution.datasources.DataSource(
      sparkSession = session.asInstanceOf[classic.SparkSession],
      className = "parquet",
      paths = paths,
      userSpecifiedSchema = schema).resolveRelation()
}
