package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Bloom, Codecs}

/** analysis-time input validation (ADVICE r1): a mistyped column fails the
  * query at analysis instead of a ClassCastException on an executor.
  * (Spark 4 made ExpectsInputTypes/AbstractDataType private[sql]; plain
  * checkInputDataTypes overrides are the supported route.) */
private[functions] object TypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def expect(cond: Boolean, msg: => String): TypeCheckResult =
    if (cond) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(msg)
  def isArrayOf(dt: DataType, elem: DataType): Boolean = dt match {
    case ArrayType(e, _) => e == elem
    case _ => false
  }
}

/** Shared eval kernels for the codec expressions — called from both
  * interpreted eval and the generated Java (object methods compile to static
  * forwarders, so `graft.functions.CodecRuntime.x(...)` works in codegen). */
object CodecRuntime {
  def encodeLongs(input: ArrayData, forced: Int): Array[Byte] = {
    val n = input.numElements()
    val vs = new Array[Long](n)
    var nulls: Array[Boolean] = null
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) {
        if (nulls == null) nulls = new Array[Boolean](n)
        nulls(i) = true
      } else vs(i) = input.getLong(i)
      i += 1
    }
    if (nulls != null) Codecs.encodeLongsN(vs, nulls)
    else if (forced < 0) Codecs.encodeLongs(vs)
    else Codecs.encodeLongsAs(vs, forced)
  }

  def decodeLongs(blob: Array[Byte]): ArrayData = {
    val (vs, nulls) = Codecs.decodeLongsN(blob)
    if (nulls == null) UnsafeArrayData.fromPrimitiveArray(vs)
    else {
      val boxed = new Array[Any](vs.length)
      var i = 0
      while (i < vs.length) { if (!nulls(i)) boxed(i) = vs(i); i += 1 }
      new GenericArrayData(boxed)
    }
  }

  def encodeStrings(input: ArrayData, forced: Int): Array[Byte] = {
    val vs = new Array[Array[Byte]](input.numElements())
    var i = 0
    var hasNull = false
    while (i < vs.length) {
      if (input.isNullAt(i)) hasNull = true
      else vs(i) = input.getUTF8String(i).getBytes
      i += 1
    }
    if (hasNull) Codecs.encodeStrsN(vs)._1
    else if (forced < 0) Codecs.encodeStrs(vs)
    else Codecs.encodeStrsAs(vs, forced)
  }

  def decodeStrings(blob: Array[Byte]): ArrayData = {
    // slice views over the blob/dictionary/shared-FSST buffer — no
    // per-value byte[] copy (Codecs.StrView)
    val v = Codecs.decodeStrsView(blob)
    val out = new Array[Any](v.n)
    var i = 0
    while (i < v.n) {
      if (v.lens(i) >= 0) out(i) = UTF8String.fromBytes(v.buf, v.offs(i), v.lens(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def encodeBinary(input: ArrayData, forced: Int): Array[Byte] = {
    val vs = new Array[Array[Byte]](input.numElements())
    var i = 0
    var hasNull = false
    while (i < vs.length) {
      if (input.isNullAt(i)) hasNull = true else vs(i) = input.getBinary(i)
      i += 1
    }
    if (hasNull) Codecs.encodeStrsN(vs)._1
    else if (forced < 0) Codecs.encodeStrs(vs)
    else Codecs.encodeStrsAs(vs, forced)
  }

  def decodeBinary(blob: Array[Byte]): ArrayData =
    new GenericArrayData(Codecs.decodeStrsN(blob).asInstanceOf[Array[Any]])

  def blobCodec(blob: Array[Byte]): UTF8String = UTF8String.fromString(Codecs.codecOf(blob))

  def blobPage(blob: Array[Byte]): Boolean = Codecs.isPageCompressed(blob)

  def countEq(blob: Array[Byte], v: Long): Long = Codecs.countEqLong(blob, v)
  def countEq(blob: Array[Byte], v: UTF8String): Long = Codecs.countEqStr(blob, v.getBytes)
  def countEq(blob: Array[Byte], v: Array[Byte]): Long = Codecs.countEqStr(blob, v)

  def bloomMaybe(bm: Array[Byte], v: Long): Boolean = Bloom.maybe(bm, Bloom.hashLong(v))
  def bloomMaybe(bm: Array[Byte], v: UTF8String): Boolean = Bloom.maybe(bm, Bloom.hashBytes(v.getBytes))
  def bloomMaybe(bm: Array[Byte], v: Array[Byte]): Boolean = Bloom.maybe(bm, Bloom.hashBytes(v))
}

/** Catalyst expressions wrapping the codec kernels. Each operates on one
  * column *block* (an array column assembled per partition or per group) and
  * returns / consumes the self-describing blob of Codecs.scala — the Spark
  * expression analog of the reference's pack/unpack kernels
  * (pint.hpp:390-407, 799-822) generalized to whole blocks.
  *
  * Codegen is a single static call: each eval encodes/decodes thousands of
  * values so the kernel amortizes, but staying out of CodegenFallback keeps
  * the expressions inside whole-stage pipelines and eligible for
  * common-subexpression elimination.
  */
case class EncodeLongs(child: Expression, forced: Int = -1)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_longs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(TypeChecks.isArrayOf(child.dataType, LongType),
      s"encode_longs expects array<bigint>, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.encodeLongs(input.asInstanceOf[ArrayData], forced)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.encodeLongs($c, $forced)")
  override protected def withNewChildInternal(newChild: Expression): EncodeLongs =
    copy(child = newChild)
}

case class DecodeLongs(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "decode_longs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"decode_longs expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.decodeLongs(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.decodeLongs($c)")
  override protected def withNewChildInternal(newChild: Expression): DecodeLongs =
    copy(child = newChild)
}

case class EncodeStrings(child: Expression, forced: Int = -1)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_strings"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(TypeChecks.isArrayOf(child.dataType, StringType),
      s"encode_strings expects array<string>, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.encodeStrings(input.asInstanceOf[ArrayData], forced)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.encodeStrings($c, $forced)")
  override protected def withNewChildInternal(newChild: Expression): EncodeStrings =
    copy(child = newChild)
}

case class DecodeStrings(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "decode_strings"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"decode_strings expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.decodeStrings(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.decodeStrings($c)")
  override protected def withNewChildInternal(newChild: Expression): DecodeStrings =
    copy(child = newChild)
}

case class EncodeBinary(child: Expression, forced: Int = -1)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_binary"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(TypeChecks.isArrayOf(child.dataType, BinaryType),
      s"encode_binary expects array<binary>, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.encodeBinary(input.asInstanceOf[ArrayData], forced)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.encodeBinary($c, $forced)")
  override protected def withNewChildInternal(newChild: Expression): EncodeBinary =
    copy(child = newChild)
}

case class DecodeBinary(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = true)
  override def prettyName: String = "decode_binary"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"decode_binary expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.decodeBinary(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.decodeBinary($c)")
  override protected def withNewChildInternal(newChild: Expression): DecodeBinary =
    copy(child = newChild)
}

/** Encoded-domain predicate: number of values in the blob equal to `value`,
  * computed from headers/dictionaries/compressed spans without materializing
  * the block (Codecs.countEqStr/countEqLong — dict code counting, FoR range
  * skipping, deterministic-FSST compressed compare). */
case class BlobCountEq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_count_eq"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(left.dataType == BinaryType &&
      Seq(LongType, IntegerType, StringType, BinaryType).contains(right.dataType),
      s"blob_count_eq expects (binary, bigint|int|string|binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(blob: Any, v: Any): Any = {
    val b = blob.asInstanceOf[Array[Byte]]
    v match {
      case l: java.lang.Long    => Codecs.countEqLong(b, l)
      case s: UTF8String        => Codecs.countEqStr(b, s.getBytes)
      case bs: Array[Byte]      => Codecs.countEqStr(b, bs)
      case i: java.lang.Integer => Codecs.countEqLong(b, i.longValue())
      case other => throw new IllegalArgumentException(s"blob_count_eq: unsupported value $other")
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.CodecRuntime.countEq($b, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BlobCountEq =
    copy(left = l, right = r)
}

/** Encoded-domain range predicate: values in [lo, hi], zone-map accept/reject
  * from the FoR/bitpack/RLE headers, decode only for straddling blocks. */
case class BlobCountBetween(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_count_between"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(first.dataType == BinaryType &&
      second.dataType == LongType && third.dataType == LongType,
      s"blob_count_between expects (binary, bigint, bigint), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  override def nullSafeEval(blob: Any, lo: Any, hi: Any): Any =
    Codecs.countBetweenLong(blob.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Long], hi.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, lo, hi) => s"graft.core.Codecs.countBetweenLong($b, $lo, $hi)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): BlobCountBetween =
    copy(first = f, second = s, third = t)
}

/** Encoded-domain `array_contains(decode_*(blob), v)` with identical
  * three-valued semantics: true if found; null if absent but the block holds
  * nulls; false otherwise. Installed by graft.plans.EncodedFilterRule so a
  * filter over a decoded block never actually decodes it. */
case class BlobContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "blob_contains"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(left.dataType == BinaryType &&
      Seq(LongType, IntegerType, StringType, BinaryType).contains(right.dataType),
      s"blob_contains expects (binary, bigint|int|string|binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(blob: Any, v: Any): Any = {
    val b = blob.asInstanceOf[Array[Byte]]
    val n = v match {
      case l: java.lang.Long    => Codecs.countEqLong(b, l)
      case s: UTF8String        => Codecs.countEqStr(b, s.getBytes)
      case bs: Array[Byte]      => Codecs.countEqStr(b, bs)
      case i: java.lang.Integer => Codecs.countEqLong(b, i.longValue())
      case other => throw new IllegalArgumentException(s"blob_contains: unsupported value $other")
    }
    if (n > 0) java.lang.Boolean.TRUE
    else if (Codecs.blobHasNulls(b)) null
    else java.lang.Boolean.FALSE
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) => {
      val n = ctx.freshName("cnt")
      s"""long $n = graft.functions.CodecRuntime.countEq($b, $v);
         |if ($n > 0L) { ${ev.value} = true; }
         |else if (graft.core.Codecs.blobHasNulls($b)) { ${ev.isNull} = true; }
         |else { ${ev.value} = false; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BlobContains =
    copy(left = l, right = r)
}

/** Encoded-domain `exists(decode_longs(blob), x -> x BETWEEN lo AND hi)` with
  * identical three-valued semantics: true if any value falls in [lo, hi];
  * null if none do but the block holds nulls (each null element makes the
  * lambda null); false otherwise. Installed by graft.plans.EncodedFilterRule
  * — zone-map accept/reject from the FoR/bitpack/RLE headers means most
  * blocks answer without decoding (Codecs.countBetweenLong). */
case class BlobContainsBetween(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "blob_contains_between"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(first.dataType == BinaryType &&
      second.dataType == LongType && third.dataType == LongType,
      s"blob_contains_between expects (binary, bigint, bigint), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  override def nullSafeEval(blob: Any, lo: Any, hi: Any): Any = {
    val b = blob.asInstanceOf[Array[Byte]]
    val n = Codecs.countBetweenLong(b, lo.asInstanceOf[Long], hi.asInstanceOf[Long])
    if (n > 0) java.lang.Boolean.TRUE
    else if (Codecs.blobHasNulls(b)) null
    else java.lang.Boolean.FALSE
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, lo, hi) => {
      val n = ctx.freshName("cnt")
      s"""long $n = graft.core.Codecs.countBetweenLong($b, $lo, $hi);
         |if ($n > 0L) { ${ev.value} = true; }
         |else if (graft.core.Codecs.blobHasNulls($b)) { ${ev.isNull} = true; }
         |else { ${ev.value} = false; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): BlobContainsBetween =
    copy(first = f, second = s, third = t)
}

/** string bounds compare as UTF-8 bytes (identical to the UTF8_BINARY
  * string order): accept either BinaryType or StringType bound children */
private[functions] object StrBounds {
  def asBytes(v: Any): Array[Byte] = v match {
    case null => null
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
  }
  def gen(bound: Expression, value: String): String =
    if (bound.dataType == StringType) s"$value.getBytes()" else value
}

/** Encoded-domain string range count: values within the byte-string
  * interval [lo, hi] (unsigned-lexicographic = Spark's UTF8_BINARY string
  * order; a NULL bound is unbounded on that side; per-side inclusive flags).
  * Dict blocks answer from the sorted dictionary header — the payload
  * strings are never rebuilt (Codecs.countBetweenStr). Bounds are
  * BinaryType; the SQL builders cast string literals. */
case class BlobCountBetweenStr(blob: Expression, lo: Expression, hi: Expression,
                               loInc: Boolean = true, hiInc: Boolean = true)
    extends Expression {
  override def children: Seq[Expression] = Seq(blob, lo, hi)
  override def nullable: Boolean = blob.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_count_between_str"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(blob.dataType == BinaryType &&
      Seq(BinaryType, StringType).contains(lo.dataType) &&
      Seq(BinaryType, StringType).contains(hi.dataType),
      s"blob_count_between_str expects (binary, binary|string, binary|string), got " +
        s"(${blob.dataType.simpleString}, ${lo.dataType.simpleString}, ${hi.dataType.simpleString})")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = blob.eval(input)
    if (b == null) return null
    Codecs.countBetweenStr(b.asInstanceOf[Array[Byte]],
      StrBounds.asBytes(lo.eval(input)), loInc,
      StrBounds.asBytes(hi.eval(input)), hiInc)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val b = blob.genCode(ctx); val l = lo.genCode(ctx); val h = hi.genCode(ctx)
    val loB = ctx.freshName("loB"); val hiB = ctx.freshName("hiB")
    ev.copy(code = code"""
      ${b.code}
      ${l.code}
      ${h.code}
      boolean ${ev.isNull} = ${b.isNull};
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        byte[] $loB = ${l.isNull} ? (byte[]) null : ${StrBounds.gen(lo, l.value.toString)};
        byte[] $hiB = ${h.isNull} ? (byte[]) null : ${StrBounds.gen(hi, h.value.toString)};
        ${ev.value} = graft.core.Codecs.countBetweenStr(${b.value}, $loB, $loInc, $hiB, $hiInc);
      }""")
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BlobCountBetweenStr =
    copy(blob = c(0), lo = c(1), hi = c(2))
}

/** Encoded-domain `exists(decode_strings(blob), x -> x in [lo, hi])` with
  * identical three-valued semantics: true if any value falls in the range;
  * null if none do but the block holds nulls; false otherwise. */
case class BlobContainsBetweenStr(blob: Expression, lo: Expression, hi: Expression,
                                  loInc: Boolean = true, hiInc: Boolean = true)
    extends Expression {
  override def children: Seq[Expression] = Seq(blob, lo, hi)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "blob_contains_between_str"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(blob.dataType == BinaryType &&
      Seq(BinaryType, StringType).contains(lo.dataType) &&
      Seq(BinaryType, StringType).contains(hi.dataType),
      s"blob_contains_between_str expects (binary, binary|string, binary|string), got " +
        s"(${blob.dataType.simpleString}, ${lo.dataType.simpleString}, ${hi.dataType.simpleString})")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = blob.eval(input)
    if (b == null) return null
    val bb = b.asInstanceOf[Array[Byte]]
    val n = Codecs.countBetweenStr(bb,
      StrBounds.asBytes(lo.eval(input)), loInc,
      StrBounds.asBytes(hi.eval(input)), hiInc)
    if (n > 0) java.lang.Boolean.TRUE
    else if (Codecs.blobHasNulls(bb)) null
    else java.lang.Boolean.FALSE
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val b = blob.genCode(ctx); val l = lo.genCode(ctx); val h = hi.genCode(ctx)
    val loB = ctx.freshName("loB"); val hiB = ctx.freshName("hiB")
    val n = ctx.freshName("cnt")
    ev.copy(code = code"""
      ${b.code}
      ${l.code}
      ${h.code}
      boolean ${ev.isNull} = ${b.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        byte[] $loB = ${l.isNull} ? (byte[]) null : ${StrBounds.gen(lo, l.value.toString)};
        byte[] $hiB = ${h.isNull} ? (byte[]) null : ${StrBounds.gen(hi, h.value.toString)};
        long $n = graft.core.Codecs.countBetweenStr(${b.value}, $loB, $loInc, $hiB, $hiInc);
        if ($n > 0L) { ${ev.value} = true; }
        else if (graft.core.Codecs.blobHasNulls(${b.value})) { ${ev.isNull} = true; }
      }""")
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BlobContainsBetweenStr =
    copy(blob = c(0), lo = c(1), hi = c(2))
}

/** exact null count recorded in a blob's null-wrapper bitmap (0 for
  * unwrapped blobs) — the manifest's Iceberg null_value_counts parity. */
case class BlobNullCount(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_null_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_null_count expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    Codecs.nullCountOf(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Codecs.nullCountOf($c)")
  override protected def withNewChildInternal(newChild: Expression): BlobNullCount =
    copy(child = newChild)
}

/** header-derived [min, max] bounds of a long blob — the zone-map /
  * Iceberg-manifest lower_bound/upper_bound column of the metadata table.
  * Null for all-null blocks. */
case class BlobRange(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "blob_range"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_range expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val r = Codecs.rangeOfLong(input.asInstanceOf[Array[Byte]])
    if (r == null) null
    else org.apache.spark.sql.catalyst.InternalRow(r._1, r._2)
  }
  override protected def withNewChildInternal(newChild: Expression): BlobRange =
    copy(child = newChild)
}

/** EXACT attained statistics of a long blob — struct(min, max, sum, cnt),
  * null for an all-null block. The companion of [[BlobRange]]: blob_range is
  * the header-derived REPRESENTABLE range (cheap, prune-sound, hi not
  * necessarily attained); blob_stats decodes once and reports attained
  * min/max plus the wrapping 64-bit sum and non-null count — what the
  * manifest's scan-free aggregate columns (value_min/value_max/value_sum)
  * are built from at encode time. */
case class BlobStatsLong(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("min", LongType, nullable = false),
    StructField("max", LongType, nullable = false),
    // null sum = the block's true sum overflows a signed 64-bit long
    // ("stats unavailable" downstream — consumers decline, never serve a
    // wrapped number); min/max/cnt stay exact
    StructField("sum", LongType, nullable = true),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "blob_stats"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_stats expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val s = Codecs.statsOfLong(input.asInstanceOf[Array[Byte]])
    if (s == null) null
    else org.apache.spark.sql.catalyst.InternalRow(s.min, s.max,
      if (s.sumValid) s.sum else null, s.count)
  }
  override protected def withNewChildInternal(newChild: Expression): BlobStatsLong =
    copy(child = newChild)
}

/** truncated [lo, hi] byte-string bounds of a string blob — the string
  * counterpart of blob_range (Iceberg manifest string lower_bound /
  * upper_bound, 16-byte truncation: lo a plain prefix, hi incremented to
  * stay an upper bound, null hi = unbounded). Null for all-null blocks. */
case class BlobRangeStr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lo", BinaryType, nullable = false),
    StructField("hi", BinaryType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "blob_range_str"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_range_str expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any = {
    val r = Codecs.rangeOfStr(input.asInstanceOf[Array[Byte]])
    if (r == null) null
    else org.apache.spark.sql.catalyst.InternalRow(r._1, r._2)
  }
  override protected def withNewChildInternal(newChild: Expression): BlobRangeStr =
    copy(child = newChild)
}

/** Build a [[graft.core.Bloom]] filter over a blob's non-null values — the
  * `bm_<col>` sibling column written at encode time for opted-in columns
  * (Parquet/Iceberg bloom-filter parity at our block grain). Null when the
  * block is all-null or the values aren't locally enumerable (shared-dict
  * codecs); readers treat a null filter as "no claim". */
case class BlobBloom(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "blob_bloom"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_bloom expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    Bloom.ofBlob(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.core.Bloom.ofBlob($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): BlobBloom =
    copy(child = newChild)
}

/** Build a [[graft.core.Kmv]] distinct-count sketch over a blob's non-null
  * values — the `ndv_sketch` manifest column written at encode time (the
  * analog of the DataSketches theta sketches Iceberg persists in Puffin
  * files for engine CBO). Null when the block's values are not locally
  * enumerable without a symbol-table decompression pass (shared-dict codes,
  * FSST/raw text) — aggregation treats null as poison ("NDV unknowable"). */
case class BlobNdvSketch(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "blob_ndv_sketch"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_ndv_sketch expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    graft.core.Kmv.ofBlob(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.core.Kmv.ofBlob($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): BlobNdvSketch =
    copy(child = newChild)
}

/** Bloom membership probe: FALSE proves the value is absent from the block;
  * TRUE means "maybe". Standard null propagation — readers wrap with
  * coalesce(..., true) so blocks without filters (mixed-era files,
  * all-null blocks, maintenance rewrites) stay conservatively kept. Probe
  * doubles via double_bits(v) (long blobs hash the stored bit patterns). */
case class BloomMaybe(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_maybe"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(left.dataType == BinaryType &&
      Seq(LongType, IntegerType, StringType, BinaryType).contains(right.dataType),
      s"bloom_maybe expects (binary, bigint|int|string|binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(bm: Any, v: Any): Any = {
    val b = bm.asInstanceOf[Array[Byte]]
    v match {
      case l: java.lang.Long    => CodecRuntime.bloomMaybe(b, l.longValue())
      case i: java.lang.Integer => CodecRuntime.bloomMaybe(b, i.longValue())
      case s: UTF8String        => CodecRuntime.bloomMaybe(b, s)
      case bs: Array[Byte]      => CodecRuntime.bloomMaybe(b, bs)
      case other => throw new IllegalArgumentException(s"bloom_maybe: unsupported value $other")
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.CodecRuntime.bloomMaybe($b, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMaybe =
    copy(left = l, right = r)
}

/** codec name stored in a blob header (for metadata/metrics queries). */
case class BlobCodec(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "blob_codec"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_codec expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.blobCodec(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.blobCodec($c)")
  override protected def withNewChildInternal(newChild: Expression): BlobCodec =
    copy(child = newChild)
}

/** whether the stored blob carries the transparent compressed-page layer
  * (zstd or legacy DEFLATE) — a page property, reported separately from the
  * inner codec name exactly as Parquet separates encoding from page
  * compression. */
case class BlobPageCompressed(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "blob_page"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == BinaryType,
      s"blob_page expects binary blob, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    CodecRuntime.blobPage(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecRuntime.blobPage($c)")
  override protected def withNewChildInternal(newChild: Expression): BlobPageCompressed =
    copy(child = newChild)
}

/** minimal bits to represent an unsigned long — the runtime analog of the
  * reference's width selection (pint.hpp:724-734,789-795). */
case class BitsNeeded(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bits_needed"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == LongType,
      s"bits_needed expects bigint, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    graft.core.BitPack.bitsNeeded(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(java.lang.Math.max(64 - java.lang.Long.numberOfLeadingZeros($c), 1))")
  override protected def withNewChildInternal(newChild: Expression): BitsNeeded =
    copy(child = newChild)
}

/** lossless double ↔ raw long bits (lets the long-codec suite cover
  * double/float columns; IEEE-754 bit pattern, no rounding). */
case class DoubleBits(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == DoubleType,
      s"double_bits expects double, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)
}

case class BitsDouble(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bits_double"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect(child.dataType == LongType,
      s"bits_double expects bigint, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.longBitsToDouble(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsDouble =
    copy(child = newChild)
}
