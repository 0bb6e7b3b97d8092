package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** The single place this library touches Spark-internal APIs.
  *
  * Spark 4 made `Column` backend-agnostic (Spark Connect); the classic
  * Expression↔Column converters (`org.apache.spark.sql.classic.
  * ExpressionUtils`) became `private[sql]`. Wrapping custom Catalyst
  * expressions as Columns therefore needs this shim placed inside the
  * `org.apache.spark.sql` namespace — the established pattern used by
  * Catalyst-extension libraries. Everything else in the engine lives in
  * `graft.*` and uses only public Spark API.
  *
  * `toRdd`/`internalCreateDataFrame` expose the InternalRow boundary so the
  * block encode/decode kernels can run without the external-Row boxing round
  * trip (`DeserializeToObject createexternalrow` → `SerializeFromObject`)
  * that a typed `Dataset.mapPartitions` inserts — at 100 TB every value
  * would be boxed twice.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** physical InternalRow RDD of a DataFrame's executed plan */
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd

  /** DataFrame over raw InternalRows (inverse of toRdd) */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Hadoop Configuration shipped to executors broadcast-style (Spark's
    * own SerializableConfiguration is private[spark]; this wrapper keeps
    * the private type out of public signatures). The `format("graft")`
    * connector's partition readers open parquet data files with it. */
  final class HadoopConfBroadcast private[graftshim] (
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = bc.value.value
  }

  def hadoopConfBroadcast(spark: SparkSession): HadoopConfBroadcast =
    new HadoopConfBroadcast(spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)))

  /** root path of a file-source scan node (LogicalRelation over
    * HadoopFsRelation — both private[sql] in Spark 4), or None. Lets
    * optimizer rules recognize a graft table scan by its directory layout
    * without reaching into internals anywhere else. */
  def fileScanRootPath(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[String] =
    plan match {
      case org.apache.spark.sql.execution.datasources.LogicalRelationWithTable(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _) =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
}
