package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Overwrite as a snapshot ([[EncodePipeline.replaceCommit]]): an INSERT
  * OVERWRITE keeps history — current reads see only the new contents, time
  * travel below the overwrite sees the old table (merge-on-read vectors
  * included), rollback restores it metadata-only, and vacuum reclaims the
  * superseded files only when asked. The connector's SaveMode.Overwrite and
  * SQL INSERT OVERWRITE both route here on file-tracked tables. */
class OverwriteSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("url"), col("warc_ts"), col("text"), col("lang"),
        md5(col("html")).as("h"))
      .collect().map(_.mkString("|")).sorted

  private def kindOf(out: String, gen: Int): String =
    EncodePipeline.snapshots(spark, out)
      .filter(col("gen") === gen).head().getString(1)

  test("replaceCommit: current = new contents; history stays readable") {
    val all = WebDocGen.dataset(spark, 600, 4).toDF()
    val base = all.filter(pmod(xxhash64(col("url")), lit(3)) === 0)
    val batch = all.filter(pmod(xxhash64(col("url")), lit(3)) === 1)
    val neu = all.filter(pmod(xxhash64(col("url")), lit(3)) === 2)
      .withColumn("url", concat(col("url"), lit("#v2")))
    val out = tmpDir("graft_ow")
    EncodePipeline.run(base, "url", out, partitions = 4, blockSize = 64) // gen 0
    assert(EncodePipeline.appendCommit(batch, "url", out, 4, 64, batchId = 1L)) // gen 1
    val filesBefore = EncodePipeline.currentFiles(spark, out).map(_._2).toSet
    val g = EncodePipeline.replaceCommit(neu, "url", out, partitions = 4,
      blockSize = 64) // gen 2
    assert(g === 2)
    // the old bytes are still on disk — the overwrite moved metadata only
    filesBefore.foreach(f => assert(new java.io.File(new java.net.URI(
      if (f.startsWith("file:")) f else s"file:$f").getPath).exists(), f))
    // current = exactly the new contents
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, all.schema)) ===
      sortedRows(neu))
    // time travel below the overwrite = the old table
    assert(sortedRows(EncodePipeline.decodeSharedAt(spark, out, all.schema, 1)) ===
      sortedRows(base.unionByName(batch)))
    assert(sortedRows(EncodePipeline.decodeSharedAt(spark, out, all.schema, 0)) ===
      sortedRows(base))
    assert(kindOf(out, 2) === "overwrite")
    // an append AFTER the overwrite is additive on top of the new floor
    val extra = neu.limit(10).withColumn("url", concat(col("url"), lit("#x")))
    assert(EncodePipeline.appendCommit(extra, "url", out, 4, 64, batchId = 5L))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, all.schema)) ===
      sortedRows(neu.unionByName(extra)))
    // rollback across the overwrite restores the old table metadata-only
    EncodePipeline.rollbackTo(spark, out, 1)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, all.schema)) ===
      sortedRows(base.unionByName(batch)))
    // vacuum now reclaims the rolled-away overwrite generation's files
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, all.schema)) ===
      sortedRows(base.unionByName(batch)))
  }

  test("overwrite above live merge-on-read deletes: vectors stay in history") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    val neu = d.limit(50).withColumn("url", concat(col("url"), lit("#v2")))
    val out = tmpDir("graft_ow_mor")
    EncodePipeline.run(d, "url", out, partitions = 4, blockSize = 64) // gen 0
    val nDel = EncodePipeline.deleteWhereLazy(spark, out, d.schema,
      col("lang") === "de") // gen 1
    assert(nDel > 0)
    EncodePipeline.replaceCommit(neu, "url", out, partitions = 4,
      blockSize = 64) // gen 2
    // current = the new contents; the old vectors are inert (their target
    // files are no longer listed) but still apply to time travel below
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, d.schema)) ===
      sortedRows(neu))
    assert(EncodePipeline.decodeSharedAt(spark, out, d.schema, 1).count() ===
      d.count() - nDel)
    assert(EncodePipeline.decodeSharedAt(spark, out, d.schema, 1)
      .filter(col("lang") === "de").count() === 0L)
  }

  test("empty overwrite = TRUNCATE as a snapshot") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val out = tmpDir("graft_ow_trunc")
    EncodePipeline.run(d, "url", out, partitions = 4, blockSize = 64) // gen 0
    val g = EncodePipeline.replaceCommit(d.limit(0), "url", out,
      partitions = 4, blockSize = 64) // gen 1: all parts tombstone
    assert(g === 1)
    assert(EncodePipeline.decodeShared(spark, out, d.schema).count() === 0L)
    assert(kindOf(out, 1) === "overwrite")
    // the rows are one rollback away
    EncodePipeline.rollbackTo(spark, out, 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, d.schema)) ===
      sortedRows(d))
  }

  test("connector overwrite and SQL INSERT OVERWRITE keep time travel") {
    val d = WebDocGen.dataset(spark, 240, 4).toDF()
    val neu = d.limit(60).withColumn("url", concat(col("url"), lit("#v2")))
    val out = tmpDir("graft_ow_conn")
    d.write.format("graft").option("key", "url").option("partitions", "3")
      .option("blockSize", "64").save(out)
    neu.write.format("graft").option("key", "url").mode("overwrite").save(out)
    val cur = spark.read.format("graft").load(out)
    assert(cur.count() === 60L)
    assert(cur.filter(col("url").endsWith("#v2")).count() === 60L)
    // option("gen") time travel below the overwrite sees the original table
    assert(spark.read.format("graft").option("gen", "0").load(out).count() === 240L)
    assert(EncodePipeline.snapshots(spark, out)
      .filter(col("kind") === "overwrite").count() === 1L)
  }
}
