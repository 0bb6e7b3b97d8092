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
    // .stats = scan-free per-column aggregates + manifest NDV as SQL
    val st = spark.sql(
      "SELECT column, n_rows, n_distinct, distinct_exact FROM gcat.db5.t5.stats " +
      "WHERE column = 'lang'").head()
    assert(st.getLong(1) === 140L)
    val expLang = d.select(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("lang"))).head().getLong(0)
    assert(st.getLong(2) === expLang && st.getBoolean(3))
    // poisoned (FSST) text column: NDV honestly unknown
    val tx = spark.sql(
      "SELECT n_distinct FROM gcat.db5.t5.stats WHERE column = 'text'").head()
    assert(tx.isNullAt(0))
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

  test("CREATE TABLE AS SELECT encodes the query result into a new table") {
    val d = WebDocGen.dataset(spark, 240, 4).toDF()
    d.createOrReplaceTempView("ctas_src")
    // TBLPROPERTIES steer the encode like df.write options
    spark.sql(
      "CREATE TABLE gcat.db7.c1 TBLPROPERTIES('key'='url', 'partitions'='3', " +
      "'blockSize'='64') AS SELECT url, lang, warc_ts FROM ctas_src")
    assert(spark.sql("SELECT count(*) FROM gcat.db7.c1").head().getLong(0) === 240L)
    assert(spark.sql("SELECT count(DISTINCT url) FROM gcat.db7.c1")
      .head().getLong(0) === d.select("url").distinct().count())
    // a REAL pipeline table: persisted placement law + manifest-backed reads
    val spec = EncodePipeline.readPartSpec(spark, s"$warehouse/db7/c1").get
    assert(spec.kind === "hash" && spec.key === "url" && spec.partitions === 3)
    assert(spark.read.format("graft").load(s"$warehouse/db7/c1").count() === 240L)
    // creating over an existing table is refused
    intercept[AnalysisException] {
      spark.sql("CREATE TABLE gcat.db7.c1 AS SELECT * FROM ctas_src")
    }

    // PARTITIONED BY takes the placement law as the name-encoded transform
    // (the same functions the scan reports for storage-partitioned joins)
    spark.sql("CREATE TABLE gcat.db7.c2 PARTITIONED BY (graft_part_host_4_2(url)) " +
      "AS SELECT url, lang FROM ctas_src")
    val hostSpec = EncodePipeline.readPartSpec(spark, s"$warehouse/db7/c2").get
    assert(hostSpec.kind === "host" && hostSpec.key === "url" &&
      hostSpec.partitions === 4 && hostSpec.salts === 2)
    assert(spark.sql("SELECT count(*) FROM gcat.db7.c2").head().getLong(0) === 240L)
    // a non-placement transform is refused with guidance
    val exT = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db7.c3 PARTITIONED BY (days(warc_ts)) " +
        "AS SELECT url, warc_ts FROM ctas_src")
    }
    assert(exT.getMessage.contains("placement transform") ||
      (exT.getCause != null && exT.getCause.getMessage.contains("placement transform")))
    assert(!new java.io.File(s"$warehouse/db7/c3").exists())
  }

  test("REPLACE TABLE AS SELECT commits a replacing snapshot; failed CTAS leaves no table") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    d.createOrReplaceTempView("rtas_src")
    spark.sql("CREATE TABLE gcat.db8.r1 TBLPROPERTIES('blockSize'='64') " +
      "AS SELECT url, lang FROM rtas_src")
    val genBefore = EncodePipeline.snapshots(spark, s"$warehouse/db8/r1")
      .agg(max(col("gen"))).head().getInt(0)
    // REPLACE = a replacing snapshot: history stays one option("gen") away
    spark.sql("REPLACE TABLE gcat.db8.r1 AS SELECT url, lang FROM rtas_src LIMIT 50")
    assert(spark.sql("SELECT count(*) FROM gcat.db8.r1").head().getLong(0) === 50L)
    assert(spark.read.format("graft").option("gen", genBefore.toString)
      .load(s"$warehouse/db8/r1").count() === 200L)
    // CREATE OR REPLACE on a fresh identifier creates
    spark.sql("CREATE OR REPLACE TABLE gcat.db8.r2 AS SELECT url FROM rtas_src LIMIT 10")
    assert(spark.sql("SELECT count(*) FROM gcat.db8.r2").head().getLong(0) === 10L)
    // REPLACE of a missing table is refused
    intercept[AnalysisException] {
      spark.sql("REPLACE TABLE gcat.db8.nope AS SELECT url FROM rtas_src")
    }

    // a CTAS whose query FAILS at execution aborts: no directory survives
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db8.boom AS SELECT CASE WHEN length(url) > 0 " +
        "THEN raise_error('boom') ELSE url END AS url FROM rtas_src")
    }
    assert(!new java.io.File(s"$warehouse/db8/boom").exists())
    intercept[AnalysisException] { spark.sql("SELECT * FROM gcat.db8.boom").collect() }
    // an EMPTY create is refused loudly (a fresh manifest needs first rows);
    // nothing is left behind
    val exE = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db8.empty AS SELECT url FROM rtas_src WHERE 1 = 0")
    }
    assert(exE.getMessage.contains("zero rows") ||
      (exE.getCause != null && exE.getCause.getMessage.contains("zero rows")))
    assert(!new java.io.File(s"$warehouse/db8/empty").exists())
    // but an empty REPLACE of a file-tracked table is a legal snapshot
    spark.sql("REPLACE TABLE gcat.db8.r2 AS SELECT url FROM rtas_src WHERE 1 = 0")
    assert(spark.sql("SELECT count(*) FROM gcat.db8.r2").head().getLong(0) === 0L)
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema; committed rows null-fill") {
    val d = WebDocGen.dataset(spark, 120, 4).toDF()
    d.createOrReplaceTempView("alter_src")
    spark.sql("CREATE TABLE gcat.db9.a1 TBLPROPERTIES('blockSize'='64') " +
      "AS SELECT url, lang FROM alter_src")
    spark.sql("ALTER TABLE gcat.db9.a1 ADD COLUMNS (score BIGINT)")
    // the evolved schema is visible and every committed row reads NULL
    assert(spark.table("gcat.db9.a1").schema.fieldNames.toSeq
      === Seq("url", "lang", "score"))
    assert(spark.sql("SELECT count(*) FROM gcat.db9.a1 WHERE score IS NULL")
      .head().getLong(0) === 120L)
    // later INSERTs carry real values alongside the null-filled era
    spark.sql("INSERT INTO gcat.db9.a1 " +
      "SELECT concat(url, '#n'), lang, 7 FROM alter_src LIMIT 10")
    assert(spark.sql("SELECT count(*) FROM gcat.db9.a1 WHERE score = 7")
      .head().getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM gcat.db9.a1").head().getLong(0) === 130L)
    // NOT NULL adds, renames, drops, retypes are refused (they would orphan
    // or invent committed data) — and refusal leaves the schema untouched
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db9.a1 ADD COLUMNS (nn BIGINT NOT NULL)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db9.a1 RENAME COLUMN lang TO language")
    }
    intercept[Exception] { spark.sql("ALTER TABLE gcat.db9.a1 DROP COLUMN lang") }
    assert(spark.table("gcat.db9.a1").schema.fieldNames.toSeq
      === Seq("url", "lang", "score"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel through SQL") {
    val d = WebDocGen.dataset(spark, 160, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val added = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val dir = s"$warehouse/db10/tt"
    EncodePipeline.run(base, "url", dir, partitions = 2, blockSize = 64)     // gen 0
    val tMid = System.currentTimeMillis()
    Thread.sleep(30) // separate the two commits' manifest mtimes
    assert(EncodePipeline.appendCommit(added, "url", dir, 2, 64, batchId = 1L)) // gen 1
    // snapshots carry their commit instants, in order
    val snaps = spark.sql(
      "SELECT gen, committed_at FROM gcat.db10.tt.snapshots ORDER BY gen").collect()
    assert(snaps.length === 2 && snaps.forall(_.getTimestamp(1) != null))
    assert(snaps(0).getTimestamp(1).getTime < snaps(1).getTimestamp(1).getTime)
    // VERSION AS OF: generation number and named tag both resolve
    assert(spark.sql("SELECT count(*) FROM gcat.db10.tt VERSION AS OF 0")
      .head().getLong(0) === base.count())
    EncodePipeline.createTag(spark, dir, "v0", gen = 0)
    assert(spark.sql("SELECT count(*) FROM gcat.db10.tt VERSION AS OF 'v0'")
      .head().getLong(0) === base.count())
    // TIMESTAMP AS OF: an instant between the commits sees only the base
    assert(spark.sql("SELECT count(*) FROM gcat.db10.tt " +
        s"TIMESTAMP AS OF timestamp_millis(${tMid}L)").head().getLong(0)
      === base.count())
    assert(spark.sql("SELECT count(*) FROM gcat.db10.tt " +
        s"TIMESTAMP AS OF timestamp_millis(${System.currentTimeMillis()}L)")
      .head().getLong(0) === d.count())
    // the pathed connector takes the same instant as an option
    assert(spark.read.format("graft").option("timestampAsOf", tMid.toString)
      .load(dir).count() === base.count())
    // an instant before the first commit fails loudly
    val ex = intercept[Exception] {
      spark.sql("SELECT count(*) FROM gcat.db10.tt " +
        "TIMESTAMP AS OF timestamp_millis(1000)").collect()
    }
    assert(ex.getMessage.contains("no commit") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("no commit")))
  }
}
