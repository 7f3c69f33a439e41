package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Compile-time-checked bridge to the one `private[sql]` API a V1
  * streaming Source needs: tagging a batch DataFrame `isStreaming` so
  * MicroBatchExecution accepts it from `getBatch` (the same call
  * FileStreamSource makes internally). Living under
  * `org.apache.spark.sql` makes the access a normal method call the
  * compiler verifies against the Spark jars on every build — unlike the
  * reflective `getMethod("internalCreateDataFrame", ...)` it replaces,
  * which would only fail at runtime if a Spark upgrade moved the method.
  */
object StreamingInternals {

  /** Wrap an InternalRow RDD as a streaming-tagged DataFrame. */
  def streamingDataFrame(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
