package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

import graft.core.{BitPack, LaneSpec}

/** The reference's packed-word operator surface as Spark scalar expressions
  * over LongType words (SURVEY.md §2.1 rows 2,7-21). Lane widths are
  * expression parameters (fixed per plan, like pint's template parameters —
  * pint.hpp:758); the LaneSpec with its masks is built once per expression
  * instance, mirroring the reference's compile-time mask derivation
  * (pint.hpp:288-360).
  *
  * Every operator implements `doGenCode`: the generated Java is the same
  * branch-free masked shift-and-or straight-line form as the reference's
  * kernels (pint.hpp:826-838 et al.), with all lane masks folded to Long
  * literals at plan time — so the ops run inside whole-stage codegen and
  * participate in common-subexpression elimination (a CodegenFallback
  * version was measured re-evaluating each packed op once per lane read).
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

private[functions] object SwarCodegen {
  /** unrolled `spread`: lane-top flag bits → full-lane all-ones masks.
    * One multiply-by-constant-mask per lane, branch-free — the runtime analog
    * of pint's general (type-2) saturation-mask strategy (pint.hpp:492-542),
    * with lane offsets constant-folded. */
  def spread(spec: LaneSpec, src: String): String =
    spec.widths.indices.map { i =>
      val top = spec.offsets(i) + spec.widths(i) - 1
      s"(((($src) >>> $top) & 1L) * ${spec.laneMask(i)}L)"
    }.mkString("(", " | ", ")")
}

/** lane-wise binary op on two packed words */
case class SwarBinaryOp(left: Expression, right: Expression, widths: Seq[Int], op: String)
    extends BinaryExpression {
  require(SwarOp.all.contains(op), s"unknown swar op $op")
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = s"swar_$op"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val full = s"${spec.fullMask}L"
      val hi = s"${spec.hiMask}L"
      val m1 = s"${spec.fullMask & ~spec.hiMask}L"
      val loM1 = s"${spec.loMask & spec.fullMask & ~spec.hiMask}L"
      val hiLo = s"${spec.hiMask & spec.loMask}L"
      def spr(src: String) = SwarCodegen.spread(spec, src)
      // straight-line SWAR identities, masks constant-folded (pint.hpp:826-884)
      def addWrapOf(x: String, y: String) =
        s"(((($x & $m1) + ($y & $m1)) ^ (($x ^ $y) & $hi)) & $full)"
      def subWrapStmts(nb: String, d: String, x: String, y: String) =
        s"""long $nb = ~$y & $full;
           |long $d = ((($x & $m1) + ($nb & $m1) + $loM1) ^ (($x ^ $nb) & $hi) ^ $hiLo) & $full;
           |""".stripMargin
      def borrowOf(d: String, x: String, y: String) =
        s"(((~$x & $y) | (~($x ^ $y) & $d)) & $hi)"
      op match {
        case SwarOp.AddWrap =>
          s"${ev.value} = ${addWrapOf(a, b)};"
        case SwarOp.SubWrap =>
          val nb = ctx.freshName("nb"); val d = ctx.freshName("d")
          subWrapStmts(nb, d, a, b) + s"${ev.value} = $d;"
        case SwarOp.AddSatU =>
          val s1 = ctx.freshName("sum"); val fl = ctx.freshName("carry")
          s"""long $s1 = ${addWrapOf(a, b)};
             |long $fl = ((($a & $b) | (($a | $b) & ~$s1)) & $hi);
             |${ev.value} = $s1 | ${spr(fl)};""".stripMargin
        case SwarOp.SubSatU =>
          val nb = ctx.freshName("nb"); val d = ctx.freshName("d"); val fl = ctx.freshName("borrow")
          subWrapStmts(nb, d, a, b) +
            s"""long $fl = ${borrowOf(d, a, b)};
               |${ev.value} = $d & ~${spr(fl)};""".stripMargin
        case SwarOp.AddSatS =>
          val s1 = ctx.freshName("sum"); val ovf = ctx.freshName("ovf")
          val m = ctx.freshName("mask"); val neg = ctx.freshName("neg")
          s"""long $s1 = ${addWrapOf(a, b)};
             |long $ovf = (~($a ^ $b)) & ($s1 ^ $a) & $hi;
             |long $m = ${spr(ovf)};
             |long $neg = ${spr(s"$a & $ovf & $hi")};
             |${ev.value} = (((($m & ~$hi) & ~$neg) | (($hi & $m) & $neg)) & $m) | ($s1 & ~$m);""".stripMargin
        case SwarOp.SubSatS =>
          val nb = ctx.freshName("nb"); val d = ctx.freshName("d"); val ovf = ctx.freshName("ovf")
          val m = ctx.freshName("mask"); val neg = ctx.freshName("neg")
          subWrapStmts(nb, d, a, b) +
            s"""long $ovf = ($a ^ $b) & ($d ^ $a) & $hi;
               |long $m = ${spr(ovf)};
               |long $neg = ${spr(s"$a & $ovf & $hi")};
               |${ev.value} = (((($m & ~$hi) & ~$neg) | (($hi & $m) & $neg)) & $m) | ($d & ~$m);""".stripMargin
        case SwarOp.MinU | SwarOp.MaxU | SwarOp.MinS | SwarOp.MaxS =>
          val signed = op == SwarOp.MinS || op == SwarOp.MaxS
          val isMin = op == SwarOp.MinU || op == SwarOp.MinS
          // sign-bias into unsigned order for the signed variants (pint.hpp:968-1004)
          val ax = if (signed) s"($a ^ $hi)" else a
          val bx = if (signed) s"($b ^ $hi)" else b
          val nb = ctx.freshName("nb"); val d = ctx.freshName("d")
          val m = ctx.freshName("mask")
          val (x, y) = if (isMin) (a, b) else (b, a)
          subWrapStmts(nb, d, ax, bx) +
            s"""long $m = ${spr(borrowOf(d, ax, bx))};
               |${ev.value} = ($x & $m) | ($y & ~$m);""".stripMargin
      }
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SwarBinaryOp =
    copy(left = l, right = r)
}

/** pack N lane columns into one word, truncating (pint make_truncate,
  * pint.hpp:592-601) */
case class SwarPack(children: Seq[Expression], widths: Seq[Int])
    extends Expression {
  require(children.length == widths.length, "one child per lane")
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "swar_pack"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"swar_pack expects bigint lanes, got ${children.map(_.dataType.simpleString).mkString(",")}")
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    // fold of (value & laneMask) << offset, masks constant (pint.hpp:390-407)
    val packed = evals.zipWithIndex.map { case (e, i) =>
      s"((${e.value} & ${BitPack.maskFor(widths(i))}L) << ${spec.offsets(i)})"
    }.mkString(" | ")
    val anyNull =
      if (nullable) evals.map(e => s"${e.isNull}").mkString("(", " || ", ")") else "false"
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
            |$childCode
            |boolean ${ev.isNull} = $anyNull;
            |long ${ev.value} = ${ev.isNull} ? 0L : ($packed);
            |""".stripMargin)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SwarPack =
    copy(children = cs)
}

/** unpack lane `index`, zero- or sign-extended (pint get / get_signed,
  * pint.hpp:799-822) */
case class SwarGet(child: Expression, widths: Seq[Int], index: Int, signed: Boolean)
    extends UnaryExpression {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = if (signed) "swar_get_signed" else "swar_get"
  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[Long]
    if (signed) spec.getSigned(w, index) else spec.get(w, index)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val off = spec.offsets(index)
      val w = widths(index)
      val get = s"(($c >>> $off) & ${BitPack.maskFor(w)}L)"
      if (signed && w < 64) s"(($get << ${64 - w}) >> ${64 - w})" else get
    })
  override protected def withNewChildInternal(newChild: Expression): SwarGet =
    copy(child = newChild)
}

/** project lanes [from,until) into a narrower packed word (pint slice,
  * pint.hpp:923-932) */
case class SwarSlice(child: Expression, widths: Seq[Int], from: Int, until: Int)
    extends UnaryExpression {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = "swar_slice"
  override def nullSafeEval(input: Any): Any =
    spec.slice(input.asInstanceOf[Long], from, until)._2
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val subMask = BitPack.maskFor(widths.slice(from, until).sum)
      s"(($c >>> ${spec.offsets(from)}) & ${subMask}L)"
    })
  override protected def withNewChildInternal(newChild: Expression): SwarSlice =
    copy(child = newChild)
}

/** per-lane shift with lane clipping and overshift→0 (pint.hpp:1006-1029);
  * the keep mask is a plan-time constant, so codegen is one shift + one AND
  * (pint's equal-width fast path generalized, pint.hpp:661-667) */
case class SwarShift(child: Expression, widths: Seq[Int], amount: Int, leftShift: Boolean)
    extends UnaryExpression {
  @transient private lazy val spec = LaneSpec(widths.toArray)
  override def dataType: DataType = LongType
  override def prettyName: String = if (leftShift) "swar_shift_left" else "swar_shift_right"
  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[Long]
    if (leftShift) spec.shiftLeft(w, amount) else spec.shiftRightU(w, amount)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      if (amount <= 0) s"($c & ${spec.fullMask}L)"
      else if (amount >= 64) "0L"
      else if (leftShift) s"(($c << $amount) & ${spec.shiftLeftKeep(amount)}L)"
      else s"(($c >>> $amount) & ${spec.shiftRightKeep(amount)}L)"
    })
  override protected def withNewChildInternal(newChild: Expression): SwarShift =
    copy(child = newChild)
}
