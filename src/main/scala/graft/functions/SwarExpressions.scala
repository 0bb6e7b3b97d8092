package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.core.LaneSpec

/** The reference's packed-word operator surface as Spark scalar expressions
  * over LongType words (SURVEY.md §2.1 rows 2,7-21). Lane widths are
  * expression parameters (fixed per plan, like pint's template parameters —
  * pint.hpp:758); the LaneSpec with its masks is built once per expression
  * instance, mirroring the reference's compile-time mask derivation
  * (pint.hpp:288-360).
  */
object SwarOp {
  val AddWrap = "add_wrap"                  // pint.hpp:826-838
  val AddSatU = "add_unsigned_saturate"     // pint.hpp:840-855
  val AddSatS = "add_signed_saturate"       // pint.hpp:857-866
  val SubWrap = "sub_wrap"                  // pint.hpp:870-884
  val SubSatU = "sub_unsigned_saturate"     // pint.hpp:886-908
  val SubSatS = "sub_signed_saturate"       // pint.hpp:910-919
  val MinU = "min_unsigned"                 // pint.hpp:936-950
  val MaxU = "max_unsigned"                 // pint.hpp:952-966
  val MinS = "min_signed"                   // pint.hpp:968-985
  val MaxS = "max_signed"                   // pint.hpp:987-1004
  val all: Seq[String] = Seq(AddWrap, AddSatU, AddSatS, SubWrap, SubSatU, SubSatS,
    MinU, MaxU, MinS, MaxS)
}

/** lane-wise binary op on two packed words */
case class SwarBinaryOp(left: Expression, right: Expression, widths: Seq[Int], op: String)
    extends BinaryExpression with CodegenFallback {
  require(SwarOp.all.contains(op), s"unknown swar op $op")
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = s"swar_$op"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    op match {
      case SwarOp.AddWrap => spec.addWrap(x, y)
      case SwarOp.AddSatU => spec.addSatU(x, y)
      case SwarOp.AddSatS => spec.addSatS(x, y)
      case SwarOp.SubWrap => spec.subWrap(x, y)
      case SwarOp.SubSatU => spec.subSatU(x, y)
      case SwarOp.SubSatS => spec.subSatS(x, y)
      case SwarOp.MinU    => spec.minU(x, y)
      case SwarOp.MaxU    => spec.maxU(x, y)
      case SwarOp.MinS    => spec.minS(x, y)
      case SwarOp.MaxS    => spec.maxS(x, y)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SwarBinaryOp =
    copy(left = l, right = r)
}

/** pack N lane columns into one word, truncating (pint make_truncate,
  * pint.hpp:592-601) */
case class SwarPack(children: Seq[Expression], widths: Seq[Int])
    extends Expression with CodegenFallback {
  require(children.length == widths.length, "one child per lane")
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "swar_pack"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    spec.pack(vs)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SwarPack =
    copy(children = cs)
}

/** unpack lane `index`, zero- or sign-extended (pint get / get_signed,
  * pint.hpp:799-822) */
case class SwarGet(child: Expression, widths: Seq[Int], index: Int, signed: Boolean)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = if (signed) "swar_get_signed" else "swar_get"
  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[Long]
    if (signed) spec.getSigned(w, index) else spec.get(w, index)
  }
  override protected def withNewChildInternal(newChild: Expression): SwarGet =
    copy(child = newChild)
}

/** project lanes [from,until) into a narrower packed word (pint slice,
  * pint.hpp:923-932) */
case class SwarSlice(child: Expression, widths: Seq[Int], from: Int, until: Int)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = "swar_slice"
  override def nullSafeEval(input: Any): Any =
    spec.slice(input.asInstanceOf[Long], from, until)._2
  override protected def withNewChildInternal(newChild: Expression): SwarSlice =
    copy(child = newChild)
}

/** per-lane shift with lane clipping and overshift→0 (pint.hpp:1006-1029) */
case class SwarShift(child: Expression, widths: Seq[Int], amount: Int, leftShift: Boolean)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = if (leftShift) "swar_shift_left" else "swar_shift_right"
  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[Long]
    if (leftShift) spec.shiftLeft(w, amount) else spec.shiftRightU(w, amount)
  }
  override protected def withNewChildInternal(newChild: Expression): SwarShift =
    copy(child = newChild)
}
