package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming dedup over MemoryStream micro-batches: first occurrences pass,
  * duplicates are suppressed (built-in watermark path) or reported as
  * running duplicate mass (stateful path). */
class StreamingDedupSpec extends SparkTestBase {

  import org.apache.spark.sql.functions._

  /** checkpoints on tmpfs: state-store file creates spawn a chmod process
    * each (see SparkTestBase) — keep them off slow disk */
  private def shmCheckpoint(): String = {
    val d = new java.io.File("/dev/shm/graft-test-ckpt")
    d.mkdirs()
    java.nio.file.Files.createTempDirectory(d.toPath, "q").toFile.getAbsolutePath
  }

  test("dropDuplicatesWithinWatermark path emits one row per distinct text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingDedup.exactWithinWatermark(docs, "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .option("checkpointLocation", shmCheckpoint())
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "alpha", t0), (2L, "alpha", t0), (3L, "beta", t0))
    q.processAllAvailable()
    in.addData((4L, "alpha", t0), (5L, "gamma", t0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT text FROM dedup_wm").collect().map(_.getString(0)).sorted
    assert(rows.toSeq === Seq("alpha", "beta", "gamma"))
  }

  test("stateful path reports running suppressed-duplicate mass per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one state partition: each state-store file create spawns a chmod
    // process (no Hadoop native IO here) and hypervisor steal storms turn
    // spawns into seconds — the semantics under test don't need parallelism
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val out = StreamingDedup.exactStateful(docs, "doc_id", "text", ttlMs = 0L) // NoTimeout: see scaladoc
    val q = out.writeStream.format("memory").queryName("dedup_state")
      .option("checkpointLocation", shmCheckpoint())
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
    q.processAllAvailable()
    in.addData((4L, "alpha"))
    q.processAllAvailable()
    q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val rows = spark.sql("SELECT id, dups FROM dedup_state").as[(Long, Long)].collect().toSet
    // first alpha emits (1, 0); in-batch duplicate emits (1, 1);
    // cross-batch duplicate emits (1, 2) from restored state; beta emits (3, 0)
    assert(rows === Set((1L, 0L), (1L, 1L), (1L, 2L), (3L, 0L)))
  }

  test("stateful path handles negative ids (presence is not a -1 sentinel)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val out = StreamingDedup.exactStateful(docs, "doc_id", "text", ttlMs = 0L)
    val q = out.writeStream.format("memory").queryName("dedup_neg")
      .option("checkpointLocation", shmCheckpoint())
      .outputMode(OutputMode.Append()).start()
    // hash-derived ids are legitimately negative; a -1L "no first yet"
    // sentinel would treat the restored state as absent every batch and
    // re-emit later duplicates as fresh firsts with a reset count
    in.addData((-7L, "alpha"))
    q.processAllAvailable()
    in.addData((8L, "alpha"), (9L, "alpha"))
    q.processAllAvailable()
    q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val rows = spark.sql("SELECT id, dups FROM dedup_neg").as[(Long, Long)].collect().toSet
    assert(rows === Set((-7L, 0L), (-7L, 1L), (-7L, 2L)))
  }
}
