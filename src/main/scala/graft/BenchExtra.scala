package graft

import org.apache.spark.sql.SparkSession

/** r6 optimization-round measurement harness (Bench.scala is frozen by the
  * driver contract). Runs the declared SparkEntry queries like Bench does —
  * same session config, same `fn(spark, sfDir).collect()` action — but
  * REPEATS each query (default 3) and reports per-query min + samples, so a
  * hypervisor steal storm on this heavily contended host cannot masquerade
  * as (or mask) a code-level regression. Prints ONE JSON line.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_QUERY_FILTER
  * (comma list; default all), SPARK_GRAFT_REPEATS (default 3).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val qFilter = sys.env.get("SPARK_GRAFT_QUERY_FILTER").map(_.split(",").toSet)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => qFilter.forall(_.contains(n)) }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
    var r = 0
    while (r < repeats) {
      names.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"$name rep=$r")
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).collect() } catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = samples.getOrElse(name, Nil) :+ dt
      }
      r += 1
    }
    val mins = samples.toSeq.sortBy(_._1).map { case (n, ss) =>
      f""""$n":${ss.min}%.3f"""
    }.mkString("{", ",", "}")
    val all = samples.toSeq.sortBy(_._1).map { case (n, ss) =>
      s""""$n":[${ss.map(x => f"$x%.3f").mkString(",")}]"""
    }.mkString("{", ",", "}")
    val total = samples.values.map(_.min).sum
    println(f"""{"metric":"min_total","value":$total%.3f,"unit":"sec","repeats":$repeats,"queries_min":$mins,"queries_samples":$all,"sf":"$sfDir"}""")
    spark.stop()
  }
}
