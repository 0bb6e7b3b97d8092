package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key over 1–8 long columns: sorting by this
  * single value interleaves the columns' orders bit by bit, so a rewrite
  * clustered on it gives EVERY participating column locality — range
  * probes on any of them skip most blocks by zone maps, the Iceberg
  * z-order rewrite strategy.
  *
  * Like Iceberg's implementation, each input is first NORMALIZED against
  * its column's value bounds [lo, hi] into a 64/k-bit integer — without
  * this, columns whose values occupy only low bits (ids, counts: the
  * common case) would interleave constant high bits and the key would
  * collapse. Bounds are supplied per column (EncodePipeline.rewriteZOrdered
  * derives them with one aggregate scan); values outside clamp to the
  * edge. The normalized lanes weave round-robin from the MSB; NULL
  * normalizes to lo (sorts below every in-range value). The key is
  * order-preserving per axis at granularity (hi−lo)/2^(64/k) — ties are
  * fine for clustering. */
case class ZOrderKey(children: Seq[Expression], los: Seq[Long], his: Seq[Long])
    extends Expression {
  require(children.nonEmpty && children.size <= 8, "zorder_key takes 1..8 columns")
  require(los.size == children.size && his.size == children.size,
    "zorder_key needs one [lo, hi] bound pair per column")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects bigint columns, got ${children.map(_.dataType.simpleString).mkString(",")}")

  @transient private lazy val loArr = los.toArray
  @transient private lazy val hiArr = his.toArray

  override def eval(input: InternalRow): Any = {
    val k = children.length
    val vs = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      vs(i) = if (v == null) loArr(i) else v.asInstanceOf[Long]
      i += 1
    }
    ZOrderKey.interleave(vs, loArr, hiArr)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zv")
    val loRef = ctx.addReferenceObj("zlos", loArr, "long[]")
    val hiRef = ctx.addReferenceObj("zhis", hiArr, "long[]")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? $loRef[$i] : ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
            |$childCode
            |long[] $arr = new long[${children.size}];
            |$fill
            |long ${ev.value} = graft.functions.ZOrderKey.interleave($arr, $loRef, $hiRef);
            |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ZOrderKey =
    copy(children = cs)
}

object ZOrderKey {
  /** normalize each value into a 64/k-bit lane against its bounds (double
    * math — 53-bit precision far exceeds the lane width), weave lanes
    * round-robin from the MSB, left-align. The result's sign bit is the
    * first lane's top bit flipped back so Spark's SIGNED long sort
    * realizes the Morton order. */
  def interleave(vs: Array[Long], los: Array[Long], his: Array[Long]): Long = {
    val k = vs.length
    val bits = 64 / k
    // k = 1 keeps 63 bits (a double cannot hold 2^64−1 exactly; the top
    // bit going unused cannot change any ordering)
    val laneMax = if (bits >= 63) Long.MaxValue else (1L << bits) - 1
    val lanes = new Array[Long](k)
    var j = 0
    while (j < k) { lanes(j) = normalize(vs(j), los(j), his(j), laneMax); j += 1 }
    var m = 0L
    var i = 0
    while (i < bits) {
      j = 0
      while (j < k) {
        m = (m << 1) | ((lanes(j) >>> (bits - 1 - i)) & 1L)
        j += 1
      }
      i += 1
    }
    (m << (64 - bits * k)) ^ Long.MinValue
  }

  private def normalize(v: Long, lo: Long, hi: Long, laneMax: Long): Long = {
    if (hi <= lo) return 0L
    if (v <= lo) return 0L
    if (v >= hi) return laneMax
    // (v - lo) may overflow Long when the bounds span the full domain —
    // go through doubles (clustering needs no exactness)
    val frac = (v.toDouble - lo.toDouble) / (hi.toDouble - lo.toDouble)
    val f = if (frac < 0.0) 0.0 else if (frac > 1.0) 1.0 else frac
    (f * laneMax.toDouble).toLong
  }
}
