package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** SQL stored procedures (`CALL pcat.system.<proc>`): the maintenance
  * lifecycle — compact, vacuum, rollback, materialize_deletes, clustering
  * rewrites — callable as one-statement SQL with one-row result relations
  * (Iceberg procedure parity over Spark 4's ProcedureCatalog). */
class GraftProcedureSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pwh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcat.root", d.getAbsolutePath)
    d.getAbsolutePath
  }

  test("compact / rollback / vacuum via CALL: content preserved, history honored") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val added = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val dir = s"$warehouse/db/t1"
    EncodePipeline.run(base, "url", dir, partitions = 3, blockSize = 64)
    EncodePipeline.appendCommit(added, "url", dir, 3, 64, batchId = 1L)
    val baseCount = base.count()
    val allCount = d.count()

    // compact re-blocks the fragmented parts; the table reads identically
    val packed = spark.sql("CALL pcat.system.compact(table => 'db.t1', block_size => 256)")
    assert(packed.columns.toSeq === Seq("parts_rewritten"))
    assert(packed.head().getInt(0) > 0)
    assert(spark.sql("SELECT count(*) FROM pcat.db.t1").head().getLong(0) === allCount)

    // positional args work too; rollback undoes the compaction AND the append
    val g = spark.sql("CALL pcat.system.rollback('db.t1', 1)").head().getInt(0)
    assert(g > 1)
    assert(spark.sql("SELECT count(*) FROM pcat.db.t1").head().getLong(0) === allCount)
    spark.sql("CALL pcat.system.rollback('db.t1', 0)")
    assert(spark.sql("SELECT count(*) FROM pcat.db.t1").head().getLong(0) === baseCount)

    // vacuum reclaims the rolled-away generations' files
    assert(spark.sql("CALL pcat.system.vacuum(table => 'db.t1')").head().getInt(0) > 0)
    assert(spark.sql("SELECT count(*) FROM pcat.db.t1").head().getLong(0) === baseCount)
  }

  test("materialize_deletes via CALL folds SQL DELETE vectors into the data") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val dir = s"$warehouse/db/t2"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64)
    val nDel = d.filter(col("lang") === "de").count()
    assert(nDel > 0)
    spark.sql("DELETE FROM pcat.db.t2 WHERE lang = 'de'")
    assert(new java.io.File(s"$dir/deletes").exists())
    val folded = spark.sql("CALL pcat.system.materialize_deletes(table => 'db.t2')")
      .head().getLong(0)
    assert(folded === nDel)
    assert(!new java.io.File(s"$dir/deletes").exists())
    assert(spark.sql("SELECT count(*) FROM pcat.db.t2").head().getLong(0)
      === d.count() - nDel)
  }

  test("clustering rewrites via CALL preserve contents; discovery lists procedures") {
    val d = WebDocGen.dataset(spark, 240, 4).toDF()
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = s"$warehouse/db/t3"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64)
    val zr = spark.sql(
      "CALL pcat.system.rewrite_zordered(table => 'db.t3', z_cols => 'warc_ts,n_chars')")
    assert(zr.head().getInt(0) > 0)
    assert(spark.sql("SELECT count(*) FROM pcat.db.t3").head().getLong(0) === d.count())
    val sr = spark.sql(
      "CALL pcat.system.rewrite_sorted(table => 'db.t3', sort_cols => 'warc_ts')")
    assert(sr.head().getInt(0) > 0)
    assert(spark.sql("SELECT count(*) FROM pcat.db.t3").head().getLong(0) === d.count())
    // unknown procedures fail loudly (Spark wraps the catalog's error in
    // FAILED_TO_LOAD_ROUTINE; the inventory rides in the cause)
    val e = intercept[Exception] { spark.sql("CALL pcat.system.nope('db.t3')") }
    assert(e.getMessage.contains("nope"))
    // discovery: SHOW-style listing through the catalog API
    val cat = spark.sessionState.catalogManager.catalog("pcat")
      .asInstanceOf[GraftCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name()).toSet
      .contains("compact"))
  }

  test("analyze via CALL recomputes manifest stats as a metadata-only snapshot") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    val dir = s"$warehouse/db/t4"
    EncodePipeline.run(d, "url", dir, partitions = 2, blockSize = 64)
    val genBefore = EncodePipeline.snapshots(spark, dir)
      .agg(max(col("gen"))).head().getInt(0)
    val r = spark.sql("CALL pcat.system.analyze(table => 'db.t4')")
    assert(r.head().getInt(0) === genBefore + 1)
    // the analyze generation appears in the SQL history with its own kind
    val kinds = spark.sql(
      "SELECT kind FROM pcat.db.t4.snapshots ORDER BY gen").collect().map(_.getString(0))
    assert(kinds.last === "analyze")
    // contents unchanged, stats table serves NDV through SQL
    assert(spark.sql("SELECT count(*) FROM pcat.db.t4").head().getLong(0) === 300L)
    val ndv = spark.sql(
      "SELECT n_distinct FROM pcat.db.t4.stats WHERE column = 'lang'").head().getLong(0)
    assert(ndv === d.select(countDistinct(col("lang"))).head().getLong(0))
  }
}
