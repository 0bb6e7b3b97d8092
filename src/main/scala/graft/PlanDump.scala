package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** Dumps formatted physical plans of the core pipeline + representative
  * queries (source for PLANS.md). Run: sbt "runMain graft.PlanDump" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // AQE off for the dumps only: the AdaptiveSparkPlan wrapper hides the
      // WholeStageCodegen `*(n)` span markers the plan commentary cites
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $title =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    val docs = WebDocGen.dataset(spark, 2000, 4).toDF()
    val enc = EncodePipeline.encode(docs, "url", 8, 512,
      Some(EncodePipeline.saltedHostPart("url", 8, 4)))
    dump("encode pipeline (InternalRow block kernel over ONE shuffle)", enc)
    dump("decode (join-free, shuffle-free in-place block expansion)",
      EncodePipeline.decode(enc, docs.schema))
    dump("encoded-domain pushdown (blob_contains, no decode under the filter)",
      enc.filter(org.apache.spark.sql.functions.array_contains(
        graft.functions.decode_strings(col("e_lang")), "de")))
    dump("encoded-domain RANGE pushdown (blob_contains_between, no decode)",
      enc.filter(expr("exists(decode_longs(e_warc_ts), x -> x BETWEEN 1 AND 2000000000000000)")))
    dump("encoded-domain STRING range pushdown (blob_contains_between_str)",
      enc.filter(expr("exists(decode_strings(e_lang), x -> x >= 'd' AND x < 'e')")))
    dump("verify (single full-outer join on key)",
      EncodePipeline.verifyRoundTrip(docs, EncodePipeline.decode(enc, docs.schema), "url"))

    val sf = "/root/testdata/sf0.001"
    dump("filter+projection pushdown on parquet",
      spark.read.parquet(s"$sf/documents.parquet").filter(col("n_chars") > 100)
        .select("doc_id", "lang"))
    dump("q_swar_arith (whole-stage codegen over packed words)",
      SparkEntry.queries("q_swar_arith")(spark, sf))
    dump("minhash LSH candidate join (shuffle on band key, no cross product)",
      graft.operators.TextOps.minhashDupPairs(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text"))
    dump("ANN brute force (broadcast small query side)",
      graft.operators.TextOps.bruteForceTopK(
        spark.read.parquet(s"$sf/embeddings.parquet"),
        spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 5),
        "vec_id", "embedding", 5))
    dump("ANN IVF (centroid equi-join probing, no cross product)",
      graft.operators.TextOps.ivfTopK(
        spark.read.parquet(s"$sf/embeddings.parquet"),
        spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 5),
        "vec_id", "embedding", 5, nCentroids = 8, nprobe = 2, sampleN = 256))
    spark.stop()
  }
}
