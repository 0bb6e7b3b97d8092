package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** A/B harness for the V2 connector's read path (not part of the driver
  * contract): the same full-table aggregate over a graft table with the
  * vectorized ColumnarBatch readers vs the row-based fallback
  * (-Dgraft.columnar). Visits alternate R,C,R,C,... so host drift hits
  * both sides equally; reports per-visit seconds and MB/s over the
  * table's RAW (decoded) bytes, then medians.
  *
  * Run: sbt "runMain graft.ScanBench [rows] [cores] [visits]" */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 400000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val visits = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = s"/dev/shm/graft-scanbench-$rows"
    if (!new java.io.File(s"$out/meta").exists()) {
      val docs = WebDocGen.dataset(spark, rows, 128).toDF()
      EncodePipeline.run(docs, "url", out, partitions = 64, blockSize = 4096)
    }
    val rawBytes = spark.read.parquet(s"$out/meta")
      .agg(sum(col("raw_bytes"))).head().getLong(0)

    val longsOnly = sys.env.get("SCANBENCH_LONGS").exists(_.toBoolean)
    def visit(columnar: Boolean): Double = {
      System.setProperty("graft.columnar", columnar.toString)
      val t0 = System.nanoTime()
      val r =
        if (longsOnly)
          // narrow long projection: decode cost minimal, read-path overhead
          // (row boxing vs vector getters) dominates
          spark.read.format("graft").load(out)
            .groupBy((col("warc_ts").cast("long") % 1000).as("b"))
            .agg(count(lit(1)).as("n"), max(col("warc_ts").cast("long")))
            .agg(sum(col("n")), count(lit(1)), max(lit(rows)))
            .head()
        else
          // touches every column: string lengths, binary length, long max
          spark.read.format("graft").load(out)
            .agg(sum(length(col("url"))), sum(length(col("text"))),
              sum(length(col("html"))), max(col("warc_ts").cast("long")),
              count(col("lang")).as("n"))
            .head()
      val n = if (longsOnly) r.getLong(0) else r.getLong(4)
      require(n == rows, s"row count drift: $n")
      (System.nanoTime() - t0) / 1e9
    }

    visit(columnar = true) // warm JIT + page cache for both paths
    visit(columnar = false)
    val rowT = scala.collection.mutable.ArrayBuffer[Double]()
    val colT = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to visits).foreach { i =>
      val r = visit(columnar = false)
      val c = visit(columnar = true)
      rowT += r; colT += c
      println(f"[scanbench] visit $i: row=$r%6.2fs (${rawBytes / r / 1e6}%7.1f MB/s)  " +
        f"columnar=$c%6.2fs (${rawBytes / c / 1e6}%7.1f MB/s)")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val (mr, mc) = (med(rowT.toSeq), med(colT.toSeq))
    println(f"[scanbench] rows=$rows raw=${rawBytes / 1e6}%.1f MB  " +
      f"median row=$mr%6.2fs (${rawBytes / mr / 1e6}%7.1f MB/s)  " +
      f"columnar=$mc%6.2fs (${rawBytes / mc / 1e6}%7.1f MB/s)  " +
      f"speedup=${mr / mc}%5.2fx")
    spark.stop()
  }
}
