package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** Stage-isolation diagnostics for the encode pipeline (not part of the
  * driver contract): times generation, shuffle+sort, and encode separately
  * at a given core count. Run: sbt "runMain graft.DiagBench <cores> <rows>" */
object DiagBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val rows = if (args.length > 1) args(1).toLong else 200000L
    val parts = sys.env.getOrElse("DIAG_PARTS", (cores * 4).toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // <200 reducers would pick BypassMergeSortShuffleWriter: 128 writers
      // x 128 tasks of buffered lz4 streams. Force the serialized
      // (tungsten-sort) writer instead - one sorter, one spill file per task.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.shuffle.compress", sys.env.getOrElse("DIAG_SHUF_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("DIAG_SHUF_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage run/GC/shuffle times
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%4d " +
          f"run=${m.executorRunTime / 1e3}%7.1fs gc=${m.jvmGCTime / 1e3}%6.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"shW=${m.shuffleWriteMetrics.writeTime / 1e9}%5.1fs " +
          f"shRwait=${m.shuffleReadMetrics.fetchWaitTime / 1e3}%5.1fs " +
          f"${sc.stageInfo.name.take(40)}")
      }
    })

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = WebDocGen.dataset(spark, rows, parts).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("generate+cache")(docs.count())

    val partExpr = EncodePipeline.saltedHostPart("url", parts, 4)
    t("partexpr only") {
      docs.select(sum(partExpr.cast("long"))).head()
    }
    t("shuffle+sort only") {
      docs.withColumn("__part", partExpr)
        .repartition(parts, col("__part"))
        .sortWithinPartitions(col("__part"), col("url"))
        .select(count(lit(1))).head()
    }
    (1 to 3).foreach { i =>
      t(s"full encode pass $i") {
        val enc = EncodePipeline.encode(docs, "url", parts, 4096, Some(partExpr))
        enc.select(sum(octet_length(col("e_text")))).head()
      }
    }
    // bench-equivalent full pass: encode -> persist -> agg -> decode -> count
    (1 to 3).foreach { i =>
      t(s"bench-like pass $i (enc+persist+agg+decode)") {
        val enc = EncodePipeline.encode(docs, "url", parts, 4096, Some(partExpr))
        enc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        enc.agg(sum(expr("r_url + r_warc_ts + r_html + r_text + r_lang")),
          sum(expr("octet_length(e_url) + octet_length(e_warc_ts) + octet_length(e_html) + " +
            "octet_length(e_text) + octet_length(e_lang)"))).head()
        val n = EncodePipeline.decode(enc, docs.schema).count()
        enc.unpersist()
        if (n == 42) println("")
      }
    }

    // single-thread codec cost on the same data, for comparison
    val texts = docs.select("text").limit(20000).collect().map(_.getString(0).getBytes("UTF-8"))
    val htmls = docs.select("html").limit(20000).collect().map(_.getAs[Array[Byte]](0))
    val tb = texts.map(_.length.toLong).sum + htmls.map(_.length.toLong).sum
    t(f"1-thread fsst 20k rows (${tb / 1e6}%.0f MB)") {
      graft.core.Codecs.encodeStrs(texts)
      graft.core.Codecs.encodeStrs(htmls)
    }
    spark.stop()
  }
}
