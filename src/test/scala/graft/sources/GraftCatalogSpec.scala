package graft.sources

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** GraftCatalog: graft tables as plain SQL identifiers (Iceberg-catalog
  * usage shape) with the connector's pushdown stack underneath. */
class GraftCatalogSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", d.getAbsolutePath)
    d.getAbsolutePath
  }

  test("SELECT / SHOW TABLES / DROP over catalog identifiers") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    EncodePipeline.run(d, "url", s"$warehouse/db1/t1", partitions = 2, blockSize = 64)
    assert(spark.sql("SELECT count(*) FROM gcat.db1.t1").head().getLong(0) === 300L)
    // grouped agg + filter run through the connector (residual-checked)
    val perLang = spark.sql(
      "SELECT lang, count(*) AS n FROM gcat.db1.t1 WHERE length(text) > 0 GROUP BY lang")
    assert(perLang.collect().map(_.getLong(1)).sum === 300L)
    // global agg is manifest-served even through SQL (LocalScan underneath)
    val mm = spark.sql("SELECT min(warc_ts), max(warc_ts) FROM gcat.db1.t1").head()
    val exp = d.agg(min(col("warc_ts")), max(col("warc_ts"))).head()
    assert(mm.getTimestamp(0) === exp.getTimestamp(0))
    assert(mm.getTimestamp(1) === exp.getTimestamp(1))
    // listing sees exactly the table directories (schema.json present)
    val listed = spark.sql("SHOW TABLES IN gcat.db1").collect().map(_.getString(1))
    assert(listed.toSeq === Seq("t1"))
    // a second table in another namespace
    EncodePipeline.run(d.limit(50), "url", s"$warehouse/db2/t2", partitions = 2, blockSize = 64)
    assert(spark.sql("SELECT count(*) FROM gcat.db2.t2").head().getLong(0) === 50L)
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0)).toSet
      === Set("db1", "db2"))
    // DROP TABLE removes the directory; the identifier stops resolving
    spark.sql("DROP TABLE gcat.db2.t2")
    intercept[AnalysisException] { spark.sql("SELECT * FROM gcat.db2.t2").collect() }
    assert(!new java.io.File(s"$warehouse/db2/t2").exists())
  }

  test("INSERT INTO / INSERT OVERWRITE land pipeline commits through SQL") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    EncodePipeline.run(d, "url", s"$warehouse/db3/t3", partitions = 2, blockSize = 64)
    d.limit(40).withColumn("url", concat(col("url"), lit("#ins")))
      .createOrReplaceTempView("ins_src")
    spark.sql("INSERT INTO gcat.db3.t3 SELECT * FROM ins_src")
    assert(spark.sql("SELECT count(*) FROM gcat.db3.t3").head().getLong(0) === 240L)
    // appended rows are real, decodable rows
    assert(spark.sql("SELECT count(*) FROM gcat.db3.t3 WHERE url LIKE '%#ins'")
      .head().getLong(0) === 40L)
    // a second identical INSERT is a NEW batch (SQL INSERT is not replay-keyed)
    spark.sql("INSERT INTO gcat.db3.t3 SELECT * FROM ins_src")
    assert(spark.sql("SELECT count(*) FROM gcat.db3.t3").head().getLong(0) === 280L)
    // INSERT OVERWRITE replaces the table contents — as a SNAPSHOT: the
    // pre-overwrite generation stays one option("gen") away
    val genBefore = EncodePipeline.snapshots(spark, s"$warehouse/db3/t3")
      .agg(org.apache.spark.sql.functions.max(col("gen"))).head().getInt(0)
    spark.sql("INSERT OVERWRITE gcat.db3.t3 SELECT * FROM ins_src")
    assert(spark.sql("SELECT count(*) FROM gcat.db3.t3").head().getLong(0) === 40L)
    assert(spark.read.format("graft").option("gen", genBefore.toString)
      .load(s"$warehouse/db3/t3").count() === 280L)
  }

  test("DELETE FROM routes to merge-on-read vectors; zero data rewrite") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val dir = s"$warehouse/db4/t4"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64)
    def dataFiles: Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data")).map(_.getAbsolutePath).toSet
    }
    val before = dataFiles
    val expected = d.filter(col("lang") === "de" || col("lang") === "fr").count()
    assert(expected > 0)
    spark.sql("DELETE FROM gcat.db4.t4 WHERE lang IN ('de', 'fr')")
    assert(spark.sql("SELECT count(*) FROM gcat.db4.t4").head().getLong(0)
      === 200L - expected)
    assert(spark.sql("SELECT count(*) FROM gcat.db4.t4 WHERE lang IN ('de','fr')")
      .head().getLong(0) === 0L)
    // merge-on-read: the data files are byte-identical, only vectors landed
    assert(dataFiles === before)
    assert(new java.io.File(s"$dir/deletes").exists())
    // second delete composes; 3VL — NULL-predicate rows are kept
    spark.sql("DELETE FROM gcat.db4.t4 WHERE url LIKE 'https://www.host1.%'")
    val left = spark.sql("SELECT count(*) FROM gcat.db4.t4").head().getLong(0)
    val exp2 = d.filter(!col("lang").isin("de", "fr") &&
      !col("url").startsWith("https://www.host1.")).count()
    assert(left === exp2)
    // untranslatable predicates route through the delta row-level path
    // (GraftRowLevelSpec covers it in depth) — never a silent partial apply
    val exp3 = d.filter(!col("lang").isin("de", "fr") &&
      !col("url").startsWith("https://www.host1.") &&
      !(length(col("text")) % 2 === 0)).count()
    spark.sql("DELETE FROM gcat.db4.t4 WHERE length(text) % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM gcat.db4.t4").head().getLong(0) === exp3)
  }

  test("CREATE TABLE is refused with guidance; missing tables raise cleanly") {
    warehouse // force catalog registration
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db1.tnew (x BIGINT) USING graft").collect()
    }
    assert(ex.getMessage.contains("created by writing") ||
      ex.getCause != null && ex.getCause.getMessage.contains("created by writing"))
    intercept[AnalysisException] { spark.sql("SELECT * FROM gcat.db1.nope").collect() }
  }

  test("metadata tables resolve as db.t.snapshots / .files identifiers") {
    val d = WebDocGen.dataset(spark, 120, 4).toDF()
    val dir = s"$warehouse/db5/t5"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64)
    EncodePipeline.appendCommit(d.limit(20), "url", dir, 2, 64, batchId = 1L)
    val snaps = spark.sql(
      "SELECT gen, kind, n_rows FROM gcat.db5.t5.snapshots ORDER BY gen").collect()
    assert(snaps.map(_.getString(1)).toSeq === Seq("base", "append"))
    assert(snaps.map(_.getLong(2)).sum === 140L)
    // .files lists exactly the generation-current data files
    val nFiles = spark.sql("SELECT count(*) FROM gcat.db5.t5.files").head().getLong(0)
    assert(nFiles === EncodePipeline.currentFiles(spark, dir).size)
    // a metadata suffix under a NON-table parent still raises cleanly
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM gcat.db5.nope.snapshots").collect()
    }
  }

  test("db.t.changes reads the per-commit changelog as a SQL identifier") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val dir = s"$warehouse/db6/t6"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64) // gen 0
    val more = d.limit(30).withColumn("url", concat(col("url"), lit("#c")))
    assert(EncodePipeline.appendCommit(more, "url", dir, 2, 64, batchId = 1L))
    val pred = col("lang") === "fr"
    val nDel = EncodePipeline.deleteWhereLazy(spark, dir, d.schema, pred) // gen 2
    assert(nDel > 0)
    // per-commit history: EVERY row ever inserted appears as an insert in
    // its committing generation; the MOR delete's masked rows appear again
    // as gen-2 deletes (not netted away — Iceberg changelog semantics)
    val byType = spark.sql(
      "SELECT _change_type, count(*) AS n FROM gcat.db6.t6.changes GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") === d.count() + more.count())
    assert(byType("delete") === nDel)
    // _change_gen attributes each change to its commit
    val byGen = spark.sql(
      "SELECT _change_gen, _change_type, count(*) AS n FROM gcat.db6.t6.changes " +
      "GROUP BY 1, 2").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byGen((0, "insert")) === d.count())
    assert(byGen((1, "insert")) === more.count())
    assert(byGen((2, "delete")) === nDel)
    // SQL predicates compose above the feed
    assert(spark.sql(
      "SELECT count(*) FROM gcat.db6.t6.changes WHERE _change_type = 'delete'")
      .head().getLong(0) === nDel)
    // a .changes suffix under a NON-table parent raises cleanly
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM gcat.db6.nope.changes").collect()
    }
  }
}
