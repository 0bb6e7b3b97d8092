package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Copy-on-write row-level DELETE: partial-part rewrites, full-part
  * tombstones, SQL three-valued logic, generation supersede across
  * readers, time travel, and file reclamation. */
class DeleteSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_delete").toFile
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

  test("delete rewrites only affected parts; untouched files stay byte-identical") {
    val docs = WebDocGen.dataset(spark, 600, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 64)
    val before = currentFiles(out)
    // a predicate hitting SOME parts: delete one lang bucket's rows whose
    // url lands in parts 0 and 1 only — find such a slice empirically
    val dec0 = EncodePipeline.decode(
      EncodePipeline.readData(spark, out), docs.schema, None, keepPart = true)
    val urls01 = dec0.filter(col("__part") < 2 && length(col("text")) % 3 === 0)
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls01.nonEmpty)
    val n = EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      col("url").isin(urls01.toSeq: _*), blockSize = 64)
    assert(n === urls01.size.toLong)
    val expect = sortedRows(docs.filter(!col("url").isin(urls01.toSeq: _*)))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    // parts 2 and 3 untouched on disk; 0 and 1 rewritten
    val after = currentFiles(out)
    (2 to 3).foreach(p => assert(after(p) === before(p)))
    // vacuum reclaims the superseded generation of parts 0/1
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    // deleting the same rows again is a no-op
    assert(EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      col("url").isin(urls01.toSeq: _*), blockSize = 64) === 0L)
  }

  test("fully-emptied parts tombstone; readers and vacuum agree") {
    val docs = WebDocGen.dataset(spark, 400, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 64)
    val dec0 = EncodePipeline.decode(
      EncodePipeline.readData(spark, out), docs.schema, None, keepPart = true)
    val part0Urls = dec0.filter(col("__part") === 0)
      .select("url").collect().map(_.getString(0)).toSet
    assert(part0Urls.nonEmpty)
    val n = EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      col("url").isin(part0Urls.toSeq: _*))
    assert(n === part0Urls.size.toLong)
    val expect = sortedRows(docs.filter(!col("url").isin(part0Urls.toSeq: _*)))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    // the pruned readers resolve generations through the same choke point
    assert(EncodePipeline.readData(spark, out)
      .filter(col("__part") === 0).count() === 0L)
    // time travel still sees the full table until vacuum expires it
    assert(sortedRows(EncodePipeline.decode(
      EncodePipeline.readDataAt(spark, out, 0), docs.schema)) === sortedRows(docs))
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(new java.io.File(s"$out/data/__part=0").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith(".")) === 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
  }

  test("NULL predicate keeps the row (SQL DELETE three-valued logic)") {
    val docs = WebDocGen.dataset(spark, 300, 4).toDF()
      .withColumn("lang", when(length(col("text")) % 5 === 0, lit(null)).otherwise(col("lang")))
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 64)
    // pred is NULL on null-lang rows: they must survive
    val n = EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      col("lang") =!= "en")
    val expect = sortedRows(docs.filter(col("lang").isNull || col("lang") === "en"))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect)
    assert(n === docs.filter(col("lang").isNotNull && col("lang") =!= "en").count())
  }

  test("delete composes with compaction and appends") {
    val docs = WebDocGen.dataset(spark, 500, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 4, blockSize = 32)
    assert(EncodePipeline.deleteWhere(spark, out, docs.schema, "url",
      length(col("text")) % 4 === 1, blockSize = 32) > 0L)
    val expect1 = docs.filter(length(col("text")) % 4 =!= 1)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === sortedRows(expect1))
    // an append after the delete lands on the current generation
    import spark.implicits._
    val extra = spark.range(500, 560).map(i => WebDocGen.make(i)).toDF()
    assert(EncodePipeline.appendCommit(extra, "url", out, 4, 32, batchId = 9L))
    val expect2 = sortedRows(expect1.unionByName(extra))
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect2)
    // whole-part compaction then rewrites the mixed generations into one
    assert(EncodePipeline.compact(spark, out, docs.schema, blockSize = 256).nonEmpty)
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(sortedRows(EncodePipeline.decodeShared(spark, out, docs.schema)) === expect2)
  }
}
