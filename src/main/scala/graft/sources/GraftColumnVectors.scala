package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Codecs

/** Read-only ColumnVector views over one decoded block's arrays — ZERO
  * copies: long values read straight from the decode kernel's Array[Long],
  * strings materialize as UTF8String VIEWS over the shared StrView buffer
  * (the same slice-view discipline the row readers use). Delete-vector
  * survivors are applied through an optional `live` indirection (null =
  * every position survives), so vectors never compact or rewrite anything.
  * Spark's ColumnarToRow / whole-stage codegen reads these exactly like its
  * own parquet vectors — per-value virtual getters, no materialization. */
private[sources] abstract class GraftVector(dt: DataType) extends ColumnVector(dt) {
  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls: Int = 0
  override def isNullAt(rowId: Int): Boolean = false
  override def getBoolean(rowId: Int): Boolean = unsupported()
  override def getByte(rowId: Int): Byte = unsupported()
  override def getShort(rowId: Int): Short = unsupported()
  override def getInt(rowId: Int): Int = unsupported()
  override def getLong(rowId: Int): Long = unsupported()
  override def getFloat(rowId: Int): Float = unsupported()
  override def getDouble(rowId: Int): Double = unsupported()
  override def getArray(rowId: Int): ColumnarArray = unsupported()
  override def getMap(ordinal: Int): ColumnarMap = unsupported()
  override def getDecimal(rowId: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    unsupported()
  override def getUTF8String(rowId: Int): UTF8String = unsupported()
  override def getBinary(rowId: Int): Array[Byte] = unsupported()
  override def getChild(ordinal: Int): ColumnVector = unsupported()
  private def unsupported(): Nothing =
    throw new UnsupportedOperationException(s"graft vector over $dt")
}

/** canonical-long column: the decode kernel's arrays, source-typed getters */
private[sources] final class GraftLongsVector(
    dt: DataType, vals: Array[Long], nulls: Array[Boolean], live: Array[Int])
    extends GraftVector(dt) {
  @inline private def at(rowId: Int): Int = if (live == null) rowId else live(rowId)
  override def hasNull: Boolean = nulls != null
  override def numNulls: Int = {
    if (nulls == null) return 0
    var c = 0; var i = 0
    val n = if (live == null) vals.length else live.length
    while (i < n) { if (nulls(at(i))) c += 1; i += 1 }
    c
  }
  override def isNullAt(rowId: Int): Boolean = nulls != null && nulls(at(rowId))
  override def getLong(rowId: Int): Long = vals(at(rowId))
  override def getInt(rowId: Int): Int = vals(at(rowId)).toInt
  override def getShort(rowId: Int): Short = vals(at(rowId)).toShort
  override def getByte(rowId: Int): Byte = vals(at(rowId)).toByte
  override def getDouble(rowId: Int): Double =
    java.lang.Double.longBitsToDouble(vals(at(rowId)))
  override def getFloat(rowId: Int): Float =
    java.lang.Double.longBitsToDouble(vals(at(rowId))).toFloat
}

/** string column: UTF8String views over the block's shared decode buffer */
private[sources] final class GraftStringVector(sv: Codecs.StrView, live: Array[Int])
    extends GraftVector(StringType) {
  @inline private def at(rowId: Int): Int = if (live == null) rowId else live(rowId)
  override def hasNull: Boolean = true // cheap over-approximation; isNullAt decides
  override def numNulls: Int = {
    var c = 0; var i = 0
    val n = if (live == null) sv.n else live.length
    while (i < n) { if (sv.lens(at(i)) < 0) c += 1; i += 1 }
    c
  }
  override def isNullAt(rowId: Int): Boolean = sv.lens(at(rowId)) < 0
  override def getUTF8String(rowId: Int): UTF8String = {
    val i = at(rowId)
    val len = sv.lens(i)
    // defensive: a getter reached for a null slot (a read schema that
    // declares the column non-nullable skips the isNullAt branch in
    // codegen) must not build a negative-length string
    if (len < 0) UTF8String.EMPTY_UTF8
    else UTF8String.fromBytes(sv.buf, sv.offs(i), len)
  }
}

/** binary column: the decoded per-value byte arrays, returned as-is */
private[sources] final class GraftBinaryVector(vals: Array[Array[Byte]], live: Array[Int])
    extends GraftVector(BinaryType) {
  @inline private def at(rowId: Int): Int = if (live == null) rowId else live(rowId)
  override def hasNull: Boolean = true
  override def numNulls: Int = {
    var c = 0; var i = 0
    val n = if (live == null) vals.length else live.length
    while (i < n) { if (vals(at(i)) == null) c += 1; i += 1 }
    c
  }
  override def isNullAt(rowId: Int): Boolean = vals(at(rowId)) == null
  override def getBinary(rowId: Int): Array[Byte] = vals(at(rowId))
}

/** `_file` metadata column: one constant string for the whole file */
private[sources] final class GraftConstStringVector(v: UTF8String)
    extends GraftVector(StringType) {
  override def getUTF8String(rowId: Int): UTF8String = v
}

/** `_block` metadata column: one constant int per block */
private[sources] final class GraftConstIntVector(v: Int)
    extends GraftVector(IntegerType) {
  override def getInt(rowId: Int): Int = v
}

/** `_pos` metadata column: the ORIGINAL block position of each survivor */
private[sources] final class GraftPosVector(live: Array[Int])
    extends GraftVector(IntegerType) {
  override def getInt(rowId: Int): Int = if (live == null) rowId else live(rowId)
}

/** a column absent from this file's era (schema evolution): all null.
  * Getters return zero values instead of throwing — a read schema that
  * declares the column non-nullable makes codegen skip the isNullAt
  * branch, and Spark's own vectors return buffer zeros in that case. */
private[sources] final class GraftAllNullVector(dt: DataType, n: Int)
    extends GraftVector(dt) {
  override def hasNull: Boolean = true
  override def numNulls: Int = n
  override def isNullAt(rowId: Int): Boolean = true
  override def getBoolean(rowId: Int): Boolean = false
  override def getByte(rowId: Int): Byte = 0
  override def getShort(rowId: Int): Short = 0
  override def getInt(rowId: Int): Int = 0
  override def getLong(rowId: Int): Long = 0L
  override def getFloat(rowId: Int): Float = 0f
  override def getDouble(rowId: Int): Double = 0d
  override def getUTF8String(rowId: Int): UTF8String = UTF8String.EMPTY_UTF8
  override def getBinary(rowId: Int): Array[Byte] = Array.emptyByteArray
}
