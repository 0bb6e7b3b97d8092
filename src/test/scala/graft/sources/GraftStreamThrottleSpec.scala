package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.plans.EncodePipeline

/** Streaming admission control — Delta rate-limit parity: the plain source
  * paces by `maxFilesPerTrigger`, the change feed by `maxGensPerTrigger`
  * (one unit = one commit's generation window), and both honor
  * Trigger.AvailableNow (the end target pins at stream start, so a bounded
  * backfill terminates even while writers keep committing; files/gens
  * committed after start wait for the next run from the checkpoint). */
class GraftStreamThrottleSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_throttle").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def docs(n: Int) = WebDocGen.dataset(spark, n, 4).toDF()

  test("maxFilesPerTrigger paces the plain source; AvailableNow terminates a bounded backfill") {
    val d = docs(240)
    val out = tmpDir() + "/t"
    // base (2 files) + two tracked appends (2 files each) = 6 data files
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64)
    (1 to 2).foreach { b =>
      val more = docs(60).withColumn("url", concat(col("url"), lit(s"#$b")))
      assert(EncodePipeline.appendCommit(more, "url", out, partitions = 2,
        blockSize = 64, batchId = b.toLong))
    }
    val nFiles = EncodePipeline.currentFiles(spark, out).size
    assert(nFiles === 6)
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(out)
      .select("url")
      .writeStream.format("memory").queryName("graft_thr_files")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      // AvailableNow: the query drains the pinned target and STOPS on its own
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
      assert(spark.table("graft_thr_files").count() === 240L + 60L + 60L)
      assert(spark.table("graft_thr_files").select("url").distinct().count() === 360L)
      // pacing: one file per micro-batch → at least nFiles non-empty batches
      // (an uncapped source would bundle several files into fewer batches);
      // no single batch can span two base files (url-hash skew makes exact
      // per-file counts unstable, but two base files together are >= 240)
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= nFiles,
        s"expected >= $nFiles paced batches, saw $nonEmpty non-empty of ${q.recentProgress.length}")
      assert(q.recentProgress.filter(_.numInputRows > 0).forall(_.numInputRows < 240L),
        "a single batch read rows spanning more than one data file")
    } finally q.stop()
  }

  test("maxGensPerTrigger paces a change-feed history replay one commit per batch") {
    val d = docs(200)
    val out = tmpDir() + "/t"
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64) // gen 0
    (1 to 2).foreach { b =>
      val more = docs(40).withColumn("url", concat(col("url"), lit(s"#$b")))
      assert(EncodePipeline.appendCommit(more, "url", out, partitions = 2,
        blockSize = 64, batchId = b.toLong))
    }
    val delPred = pmod(xxhash64(col("url")), lit(10)) === 3
    val nDel = EncodePipeline.deleteWhereLazy(spark, out, d.schema, delPred) // gen 3
    assert(nDel > 0)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingGen", "0")
      .option("maxGensPerTrigger", "1").load(out)
      .select("url", "_change_type")
      .writeStream.format("memory").queryName("graft_thr_gens")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow CDC query did not terminate")
      val t = spark.table("graft_thr_gens")
      assert(t.filter(col("_change_type") === "insert").count() === 280L)
      assert(t.filter(col("_change_type") === "delete").count() === nDel)
      // each (row, change) streams exactly once across the paced windows
      assert(t.select("url", "_change_type").distinct().count() === 280L + nDel)
      // pacing: 4 generation windows (gen 0..3) → at least 4 non-empty batches
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 4,
        s"expected >= 4 paced CDC batches, saw $nonEmpty of ${q.recentProgress.length}")
    } finally q.stop()
  }

  test("throttled continuous stream still drains everything with processAllAvailable") {
    val d = docs(150)
    val out = tmpDir() + "/t"
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64)
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(out)
      .select("url")
      .writeStream.format("memory").queryName("graft_thr_drain")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // drains across multiple 1-file batches
      assert(spark.table("graft_thr_drain").count() === 150L)
      // a commit landing mid-stream (no AvailableNow pin) drains too
      val more = docs(50).withColumn("url", concat(col("url"), lit("#x")))
      assert(EncodePipeline.appendCommit(more, "url", out, partitions = 2,
        blockSize = 64, batchId = 1L))
      q.processAllAvailable()
      assert(spark.table("graft_thr_drain").count() === 200L)
    } finally q.stop()
  }
}
