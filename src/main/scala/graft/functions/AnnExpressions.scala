package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF (inverted-file) ANN support: nearest-centroid assignment.
  *
  * The centroid matrix is a plan-time constant (trained driver-side on a
  * deterministic sample — see TextOps.ivfTopK), so assignment is one scalar
  * expression: for each vector, the indices of the `nprobe` centroids with
  * highest cosine similarity. With nprobe = 1 this partitions the collection
  * into clusters (the inverted file); queries probe several clusters to trade
  * recall for candidate volume — candidates meet queries in an equi-join on
  * centroid id, never a cross product.
  */
case class IvfAssign(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_assign"

  // centroid L2 norms, precomputed once per plan
  @transient private lazy val cnorm: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      val d = math.min(n, cent.length)
      var j = 0
      while (j < d) { dot += v(j) * cent(j); j += 1 }
      sims(c) = if (cnorm(c) == 0.0) Double.NegativeInfinity else dot / cnorm(c)
      c += 1
    }
    // top-nprobe by similarity (selection over <=256 centroids; ties by index)
    val picked = new Array[Int](nprobe)
    val used = new Array[Boolean](centroids.length)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < centroids.length) {
        if (!used(c) && sims(c) > bestSim) { best = c; bestSim = sims(c) }
        c += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(picked)
  }
  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** Random-hyperplane signature, packed: bit p of the output = sign of the
  * dot product with pseudo-hyperplane p (Rademacher ±1 entries from
  * splitmix64 of (plane, dim) — deterministic, seedless). Returns
  * ⌈planes/64⌉ longs. The r2 Column-algebra formulation (nested
  * transform/aggregate lambdas) interpreted planes × dim closures PER ROW —
  * the dominant cost of embedding dedup candidate generation; this is the
  * same arithmetic as one primitive loop. Vectors with equal direction get
  * identical signatures (the guaranteed-recall property the planted-copy
  * oracle relies on). */
case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    val words = new Array[Long]((planes + 63) >> 6)
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val base = p.toLong << 32
      var d = 0
      while (d < n) {
        // ±1 from the low bit of the (plane, dim) hash
        val sign = 1.0 - 2.0 * (graft.core.Bits.mix(base | d) & 1L)
        dot += v(d) * sign
        d += 1
      }
      if (dot >= 0) words(p >> 6) |= 1L << (p & 63)
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(words)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** LSH band keys from a packed hyperplane signature: band b covers bits
  * [b·rows, (b+1)·rows), mixed with the band index so equal bit groups in
  * different bands land in different buckets. Cheap bit extraction — the
  * signature is computed once (HyperplaneSig) and both the band keys and
  * the hamming pre-filter read it. */
case class BandKeysFromSig(child: Expression, planes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands >= 1 && planes % bands == 0, s"bands $bands must divide planes $planes")
  private val rows = planes / bands
  require(rows <= 64, "band width must fit one word")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys_from_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val words = new Array[Long](arr.numElements())
    var i = 0
    while (i < words.length) { words(i) = arr.getLong(i); i += 1 }
    val keys = new Array[Long](bands)
    val rowMask = if (rows >= 64) -1L else (1L << rows) - 1
    var b = 0
    while (b < bands) {
      val bit = b * rows
      val w = bit >> 6
      val off = bit & 63
      var bits = words(w) >>> off
      if (off + rows > 64 && w + 1 < words.length) bits |= words(w + 1) << (64 - off)
      keys(b) = graft.core.Bits.mix((bits & rowMask) ^ (b.toLong * 0x9e3779b97f4a7c15L))
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }
  override protected def withNewChildInternal(newChild: Expression): BandKeysFromSig =
    copy(child = newChild)
}
