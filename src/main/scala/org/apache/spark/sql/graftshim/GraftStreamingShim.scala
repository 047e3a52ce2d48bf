package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` doorway a V1 streaming `Source` needs:
  * `getBatch` must return a DataFrame whose logical plan is flagged
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * way to stamp that flag on an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * package-private to `org.apache.spark.sql`. This shim lives in a
  * subpackage purely to reach it; it is the long-standing pattern for
  * out-of-tree V1 sources (file-based connectors did the same before
  * DSv2). No behavior lives here: the plan, pruning, and dv semantics
  * all stay in graft.sources.
  */
object GraftStreamingShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The mirror direction, for a V1 `Sink.addBatch`: the incoming frame
    * is an incremental-execution plan that must not be re-analyzed or
    * re-triggered by a batch write — re-materialize it as a plain batch
    * frame over the already-planned RDD (the standard V1 sink rule).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }
}
