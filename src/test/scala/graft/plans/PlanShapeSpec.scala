package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Plan-shape assertions: the properties that matter at 100 TB — filters
  * reaching the parquet scan, partition pruning on the encoded table, column
  * pruning of untouched blob columns, broadcast of small join sides — pinned
  * as tests so a refactor can't silently regress them. */
class PlanShapeSpec extends SparkTestBase {

  private lazy val encDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toFile.getAbsolutePath
    val docs = WebDocGen.dataset(spark, 1000, 4).toDF()
    EncodePipeline.run(docs, "url", dir, partitions = 8, blockSize = 128)
    dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("source filters are pushed to the parquet scan") {
    val df = sf("documents").filter(col("n_chars") > 100).select("doc_id", "lang")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"), plan)
    // and only the needed columns are read
    assert(plan.contains("ReadSchema") && !plan.contains("text"), plan)
  }

  test("encoded table reads prune partitions on __part") {
    val df = spark.read.parquet(s"$encDir/data").filter(col("__part") === 3)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*\\(__part#\\d+ = 3\\)".r.findFirstIn(plan).isDefined, plan)
  }

  test("single-column metadata queries prune the other blob columns") {
    val df = spark.read.parquet(s"$encDir/data").select(octet_length(col("e_lang")))
    val plan = planOf(df)
    assert(plan.contains("e_lang") && !plan.contains("e_html"), plan)
  }

  test("readData uses a broadcast semi-join against committed parts") {
    val plan = planOf(EncodePipeline.readData(spark, encDir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("decode is join-free (zip+explode, no shuffle)") {
    val docs = WebDocGen.dataset(spark, 100, 2).toDF()
    val enc = EncodePipeline.encode(docs, "url", 2, 64)
    val plan = planOf(EncodePipeline.decode(enc, docs.schema))
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Generate explode"), plan)
  }
}
