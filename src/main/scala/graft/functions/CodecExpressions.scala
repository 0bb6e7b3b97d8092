package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Codecs

/** Catalyst expressions wrapping the codec kernels. Each operates on one
  * column *block* (an array column assembled per partition or per group) and
  * returns / consumes the self-describing blob of Codecs.scala — the Spark
  * expression analog of the reference's pack/unpack kernels
  * (pint.hpp:390-407, 799-822) generalized to whole blocks.
  *
  * CodegenFallback is deliberate: each eval call encodes/decodes thousands of
  * values, so the per-call virtual dispatch is noise; the kernels themselves
  * are tight primitive loops the JIT vectorizes.
  */
case class EncodeLongs(child: Expression, forced: Int = -1)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_longs"
  override def nullSafeEval(input: Any): Any = {
    val vs = input.asInstanceOf[ArrayData].toLongArray()
    if (forced < 0) Codecs.encodeLongs(vs) else Codecs.encodeLongsAs(vs, forced)
  }
  override protected def withNewChildInternal(newChild: Expression): EncodeLongs =
    copy(child = newChild)
}

case class DecodeLongs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "decode_longs"
  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(Codecs.decodeLongs(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): DecodeLongs =
    copy(child = newChild)
}

case class EncodeStrings(child: Expression, forced: Int = -1)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_strings"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val vs = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < vs.length) { vs(i) = arr.getUTF8String(i).getBytes; i += 1 }
    if (forced < 0) Codecs.encodeStrs(vs) else Codecs.encodeStrsAs(vs, forced)
  }
  override protected def withNewChildInternal(newChild: Expression): EncodeStrings =
    copy(child = newChild)
}

case class DecodeStrings(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "decode_strings"
  override def nullSafeEval(input: Any): Any = {
    val out = Codecs.decodeStrs(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(out.map(UTF8String.fromBytes(_)))
  }
  override protected def withNewChildInternal(newChild: Expression): DecodeStrings =
    copy(child = newChild)
}

case class EncodeBinary(child: Expression, forced: Int = -1)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_binary"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val vs = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < vs.length) { vs(i) = arr.getBinary(i); i += 1 }
    if (forced < 0) Codecs.encodeStrs(vs) else Codecs.encodeStrsAs(vs, forced)
  }
  override protected def withNewChildInternal(newChild: Expression): EncodeBinary =
    copy(child = newChild)
}

case class DecodeBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "decode_binary"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Codecs.decodeStrs(input.asInstanceOf[Array[Byte]]).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(newChild: Expression): DecodeBinary =
    copy(child = newChild)
}

/** codec name stored in a blob header (for metadata/metrics queries). */
case class BlobCodec(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "blob_codec"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Codecs.codecOf(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): BlobCodec =
    copy(child = newChild)
}

/** minimal bits to represent an unsigned long — the runtime analog of the
  * reference's width selection (pint.hpp:724-734,789-795). */
case class BitsNeeded(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bits_needed"
  override def nullSafeEval(input: Any): Any =
    graft.core.BitPack.bitsNeeded(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): BitsNeeded =
    copy(child = newChild)
}

/** lossless double ↔ raw long bits (lets the long-codec suite cover
  * double/float columns; IEEE-754 bit pattern, no rounding). */
case class DoubleBits(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): DoubleBits =
    copy(child = newChild)
}

case class BitsDouble(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bits_double"
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.longBitsToDouble(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): BitsDouble =
    copy(child = newChild)
}
