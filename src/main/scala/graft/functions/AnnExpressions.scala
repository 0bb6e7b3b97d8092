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
