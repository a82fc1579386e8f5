package org.apache.spark.sql.graftglue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access shim for `SparkSession.internalCreateDataFrame` (private[sql]):
  * wraps an RDD[InternalRow] in a DataFrame without a Row round trip. This
  * is the standard extension-point pattern for high-throughput sources that
  * produce Catalyst rows directly — the public `createDataFrame(RDD[Row])`
  * would re-encode every row through the external Row representation,
  * exactly the copy the graft fast path exists to avoid. Lives under
  * org.apache.spark.sql only to satisfy the Scala access scope; no Spark
  * internals are modified. */
object GraftSqlBridge {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
