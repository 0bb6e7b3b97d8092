package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.plans.EncodePipeline

/** Streaming CHANGE FEED: `readStream.format("graft")
  * .option("readChangeFeed", "true")` — Delta CDF / Iceberg changelog
  * parity. Micro-batches are generation windows; each emits the window's
  * net row-level changes with `_change_type`, planned at file grain
  * (window-added files + vector-diff blocks only). */
class GraftCdcStreamSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdcstream").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def docs(n: Int) = WebDocGen.dataset(spark, n, 4).toDF()

  test("change feed from gen 0: history, appends, MOR deletes and updates stream as net changes") {
    val d = docs(300)
    val out = tmpDir() + "/t"
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64) // gen 0
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingGen", "0").load(out)
      .select("url", "lang", "_change_type")
      .writeStream.format("memory").queryName("graft_cdf_t1")
      .outputMode("append").start()
    try {
      // full-history start: the base snapshot streams as inserts
      q.processAllAvailable()
      val t = () => spark.table("graft_cdf_t1")
      assert(t().filter(col("_change_type") === "insert").count() === 300L)
      assert(t().filter(col("_change_type") === "delete").count() === 0L)

      // an append commit streams its rows exactly once, as inserts
      val more = docs(120).withColumn("url", concat(col("url"), lit("#a")))
      assert(EncodePipeline.appendCommit(more, "url", out, partitions = 2,
        blockSize = 64, batchId = 1L))
      q.processAllAvailable()
      assert(t().filter(col("_change_type") === "insert").count() === 420L)
      assert(t().select("url", "_change_type").distinct().count() === 420L)

      // a merge-on-read delete streams the masked rows as deletes, values
      // intact (decoded from the pre-window file state)
      val delPred = pmod(xxhash64(col("url")), lit(10)) === 4
      val nDel = EncodePipeline.deleteWhereLazy(spark, out, d.schema, delPred)
      assert(nDel > 0)
      q.processAllAvailable()
      val dels = t().filter(col("_change_type") === "delete")
      assert(dels.count() === nDel)
      // the deleted urls are exactly the ones the predicate selected from
      // what was live (base ∪ append)
      val expected = d.select("url").union(more.select("url")).filter(delPred)
      assert(dels.select("url").exceptAll(expected).isEmpty)
      assert(expected.exceptAll(dels.select("url")).isEmpty)

      // a MOR update is one atomic snapshot: delete (old values) + insert
      // (new values) pairs for every matched live row
      val updPred = pmod(xxhash64(col("url")), lit(10)) === 7
      val nUpd = EncodePipeline.updateWhereLazy(spark, out, d.schema, "url",
        updPred, Map("lang" -> lit("zz")), partitions = 2, blockSize = 64)
      assert(nUpd > 0)
      q.processAllAvailable()
      assert(t().filter(col("_change_type") === "delete").count() === nDel + nUpd)
      val updIns = t().filter(col("_change_type") === "insert" && col("lang") === "zz")
      assert(updIns.count() === nUpd)
      // each updated url appears exactly once as a zz-insert
      assert(updIns.select("url").distinct().count() === nUpd)
    } finally q.stop()
  }

  test("change feed default start: only commits after the stream begins are emitted") {
    val d = docs(200)
    val out = tmpDir() + "/t"
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(out)
      .select("url", "_change_type")
      .writeStream.format("memory").queryName("graft_cdf_t2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_cdf_t2").count() === 0L)
      val more = docs(80).withColumn("url", concat(col("url"), lit("#b")))
      assert(EncodePipeline.appendCommit(more, "url", out, partitions = 2,
        blockSize = 64, batchId = 1L))
      q.processAllAvailable()
      val rows = spark.table("graft_cdf_t2")
      assert(rows.count() === 80L)
      assert(rows.filter(col("_change_type") === "insert").count() === 80L)
      assert(rows.filter(!col("url").endsWith("#b")).count() === 0L)
    } finally q.stop()
  }

  test("change feed fails loudly when a rewrite lands inside a window") {
    val d = docs(200)
    val out = tmpDir() + "/t"
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 16)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(out)
      .select("url", "_change_type")
      .writeStream.format("memory").queryName("graft_cdf_t3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // compaction rewrites streamed files: file-grain CDC cannot cross it
      assert(EncodePipeline.compact(spark, out, d.schema, blockSize = 2048).nonEmpty)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(m => m.contains("rewrote") || m.contains("rewritten")))
    } finally q.stop()
  }
}
