package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.core.Kmv

/** Union-merge of [[graft.core.Kmv]] NDV sketches as a typed Aggregator —
  * how per-block sketches roll up to per-(part, column) manifest rows at
  * encode time, and manifest rows roll up to a table-wide NDV in
  * [[graft.plans.EncodePipeline.tableStats]]. Catalyst runs the partial /
  * final merge (map-side combine), and KMV unions are exact set semantics,
  * so the rollup introduces no bias at any fan-in.
  *
  * Null / poison inputs ABSORB: one block whose values cannot be enumerated
  * makes the whole group's NDV unknown (finish → SQL NULL) — an unknown
  * must never silently undercount. Callers feed
  * `coalesce(blob_ndv_sketch(b), lit(Kmv.poison))` so SQL-null inputs are
  * explicit poison rather than Aggregator-skipped rows. */
object KmvMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Kmv.empty
  override def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] = Kmv.merge(b, v)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Kmv.merge(a, b)
  // the output encoder is non-nullable, so poison leaves the aggregation as
  // the 1-byte marker; callers translate it to SQL NULL (metadata()) or feed
  // it straight back into Kmv.estimate, which answers null for poison
  override def finish(r: Array[Byte]): Array[Byte] =
    if (r == null) Kmv.poison else r
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()

  /** the untyped aggregate column (usable in relational groupBy.agg) */
  def of(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this, ExpressionEncoder[Array[Byte]]()).apply(c)
}
