package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Copy-on-write row-level UPDATE: partial-part rewrites, SQL three-valued
  * logic, self-referencing assignments, key-assignment rejection, time
  * travel, and file reclamation. */
class UpdateSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_update").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("url"), col("warc_ts"), col("text"), col("lang"),
        md5(col("html")).as("h"))
      .collect().map(_.mkString("|")).sorted

  private def currentFiles(out: String): Map[Int, Set[String]] = {
    val dir = new java.io.File(s"$out/data")
    dir.listFiles().filter(d => d.isDirectory && d.getName.startsWith("__part="))
      .map(d => d.getName.stripPrefix("__part=").toInt ->
        d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).map(_.getName).toSet).toMap
  }

  test("update rewrites only affected parts; assignments see the old row") {
    val docs = WebDocGen.dataset(spark, 600, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 64)
    val before = currentFiles(out)
    // rows confined to parts 0 and 1, found empirically like DeleteSpec
    val dec0 = EncodePipeline.decode(
      EncodePipeline.readData(spark, out), docs.schema, None, keepPart = true)
    val urls01 = dec0.filter(col("__part") < 2 && length(col("text")) % 3 === 0)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls01.nonEmpty)
    val n = EncodePipeline.updateWhere(spark, out, docs.schema, "url",
      col("url").isin(urls01.toSeq: _*),
      Map("lang" -> lit("xx"),
          "text" -> concat(col("text"), lit(" [updated]"))),
      blockSize = 64)
    assert(n === urls01.size.toLong)
    val expect = sortedRows(docs.select(
      col("url"), col("warc_ts"), col("html"),
      when(col("url").isin(urls01.toSeq: _*), concat(col("text"), lit(" [updated]")))
        .otherwise(col("text")).as("text"),
      when(col("url").isin(urls01.toSeq: _*), lit("xx"))
        .otherwise(col("lang")).as("lang")))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    // parts 2 and 3 untouched on disk
    val after = currentFiles(out)
    (2 to 3).foreach(p => assert(after(p) === before(p)))
    // time travel sees the pre-update rows until vacuum
    assert(sortedRows(EncodePipeline.decode(
      EncodePipeline.readDataAt(spark, out, 0), docs.schema)) === sortedRows(docs))
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
  }

  test("NULL predicate leaves the row unchanged (SQL UPDATE three-valued logic)") {
    val docs = WebDocGen.dataset(spark, 300, 4).toDF()
      .withColumn("lang", when(length(col("text")) % 5 === 0, lit(null)).otherwise(col("lang")))
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 64)
    // pred is NULL on null-lang rows: they must stay unchanged
    val n = EncodePipeline.updateWhere(spark, out, docs.schema, "url",
      col("lang") =!= "en", Map("text" -> lit("redacted")))
    assert(n === docs.filter(col("lang").isNotNull && col("lang") =!= "en").count())
    val expect = sortedRows(docs.select(
      col("url"), col("warc_ts"), col("html"),
      when(col("lang").isNotNull && col("lang") =!= "en", lit("redacted"))
        .otherwise(col("text")).as("text"),
      col("lang")))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
  }

  test("assigning the partitioning key or an unknown column is rejected; no-op matches return 0") {
    val docs = WebDocGen.dataset(spark, 100, 2).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    intercept[IllegalArgumentException] {
      EncodePipeline.updateWhere(spark, out, docs.schema, "url",
        lit(true), Map("url" -> lit("x")))
    }
    intercept[IllegalArgumentException] {
      EncodePipeline.updateWhere(spark, out, docs.schema, "url",
        lit(true), Map("nope" -> lit("x")))
    }
    assert(EncodePipeline.updateWhere(spark, out, docs.schema, "url",
      lit(false), Map("lang" -> lit("xx"))) === 0L)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) ===
      sortedRows(docs))
  }

  test("update composes with delete and appends across generations") {
    val docs = WebDocGen.dataset(spark, 500, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 32)
    assert(EncodePipeline.updateWhere(spark, out, docs.schema, "url",
      length(col("text")) % 4 === 1, Map("lang" -> lit("qq")), blockSize = 32) > 0L)
    val upd = docs.select(
      col("url"), col("warc_ts"), col("html"), col("text"),
      when(length(col("text")) % 4 === 1, lit("qq")).otherwise(col("lang")).as("lang"))
    assert(EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      col("lang") === "qq", blockSize = 32) ===
      docs.filter(length(col("text")) % 4 === 1).count())
    val afterDel = upd.filter(col("lang") =!= "qq")
    import spark.implicits._
    val extra = spark.range(500, 540).map(i => WebDocGen.make(i)).toDF()
    assert(EncodePipeline.appendCommit(extra, "url", out, 4, 32, batchId = 7L))
    val expect = sortedRows(afterDel.unionByName(extra))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
  }
}
