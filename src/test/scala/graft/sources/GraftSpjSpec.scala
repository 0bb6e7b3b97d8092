package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.plans.EncodePipeline

/** Storage-partitioned joins: co-specced graft tables join shuffle-free
  * through the catalog (KeyGroupedPartitioning + FunctionCatalog), and the
  * scalar placement function agrees exactly with the Column placement law. */
class GraftSpjSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_spj_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.root", d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def withSpjConf[T](body: => T): T = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("produceResult matches the Column placement law (hash and host)") {
    val urls = WebDocGen.dataset(spark, 300, 4).toDF().select("url")
      .union(spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row("no-scheme-at-all"),
        org.apache.spark.sql.Row("ftp://x/"),
        org.apache.spark.sql.Row(""),
        org.apache.spark.sql.Row(null)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url",
            org.apache.spark.sql.types.StringType, nullable = true)))))
    for (spec <- Seq(EncodePipeline.PartSpec("hash", "url", 7, 1),
                     EncodePipeline.PartSpec("host", "url", 5, 4))) {
      val fn = GraftPartFunction(spec.kind, spec.partitions, spec.salts)
      val rows = urls.select(col("url"), spec.expr.as("expected")).collect()
      rows.foreach { r =>
        val in = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](if (r.isNullAt(0)) null
                     else org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
        assert(fn.produceResult(in).intValue() === r.getInt(1),
          s"${spec.kind} mismatch on url=${if (r.isNullAt(0)) "NULL" else r.getString(0)}")
      }
    }
  }

  test("co-specced tables join through the catalog with ZERO shuffles") {
    val d = WebDocGen.dataset(spark, 400, 4).toDF()
    EncodePipeline.run(d, "url", s"$warehouse/db/a", partitions = 4, blockSize = 64)
    EncodePipeline.run(
      d.limit(250).withColumn("lang", concat(col("lang"), lit("x"))),
      "url", s"$warehouse/db/b", partitions = 4, blockSize = 64)
    withSpjConf {
      val j = spark.sql(
        """SELECT a.url, a.lang AS la, b.lang AS lb
          |FROM spj.db.a a JOIN spj.db.b b ON a.url = b.url""".stripMargin)
      assert(j.count() === 250L)
      assert(j.filter(col("lb") === concat(col("la"), lit("x"))).count() === 250L)
      val shuffles = j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"expected a storage-partitioned join, got:\n${j.queryExecution.executedPlan}")
    }
  }

  test("long-keyed tables bind the hash law and join shuffle-free") {
    val docs = sf("documents")
    // scalar/Column parity on a LONG key
    val fn = GraftPartFunction("hash", 7, 1).bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .asInstanceOf[GraftPartFunction]
    docs.select(col("doc_id"),
        EncodePipeline.hashPart("doc_id", 7).as("expected")).collect().foreach { r =>
      val in = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](r.getLong(0)))
      assert(fn.produceResult(in).intValue() === r.getInt(1))
    }
    EncodePipeline.run(docs, "doc_id", s"$warehouse/db/l1", partitions = 4, blockSize = 256)
    EncodePipeline.run(docs.withColumn("n_chars", col("n_chars") * 2L),
      "doc_id", s"$warehouse/db/l2", partitions = 4, blockSize = 256)
    withSpjConf {
      val j = spark.sql(
        """SELECT a.doc_id, a.n_chars AS ca, b.n_chars AS cb
          |FROM spj.db.l1 a JOIN spj.db.l2 b ON a.doc_id = b.doc_id""".stripMargin)
      assert(j.count() === docs.count())
      assert(j.filter(col("cb") =!= col("ca") * 2L).count() === 0L)
      assert(j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s
      }.isEmpty, s"long-key SPJ fell back:\n${j.queryExecution.executedPlan}")
    }
  }

  test("appends follow the table's placement law; SPJ survives them") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    // host-partitioned table: appends must reuse the host law, not plain hash
    EncodePipeline.run(d.limit(200), "url", s"$warehouse/db/h1", partitions = 4,
      blockSize = 64, useHostPartitioner = true)
    val extra = d.filter(col("url").isNotNull).orderBy(col("url").desc).limit(100)
    EncodePipeline.appendCommit(extra, "url", s"$warehouse/db/h1",
      partitions = 4, blockSize = 64, batchId = 11L)
    // placement invariant: every key maps to exactly the part its law says
    val spec = EncodePipeline.readPartSpec(spark, s"$warehouse/db/h1").get
    assert(spec.kind === "host" && spec.partitions === 4 && spec.salts === 4)
    val placed = EncodePipeline.decode(
        EncodePipeline.readData(spark, s"$warehouse/db/h1"), d.schema,
        None, keepPart = true)
      .select(col("__part"), spec.expr.as("law"))
    assert(placed.filter(col("__part") =!= col("law")).count() === 0L)
    // and a second host table written the same way joins shuffle-free
    EncodePipeline.run(d, "url", s"$warehouse/db/h2", partitions = 4,
      blockSize = 64, useHostPartitioner = true)
    withSpjConf {
      val j = spark.sql(
        "SELECT a.url FROM spj.db.h1 a JOIN spj.db.h2 b ON a.url = b.url")
      assert(j.count() > 0L)
      assert(j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s
      }.isEmpty, s"host SPJ fell back:\n${j.queryExecution.executedPlan}")
    }
  }
}
