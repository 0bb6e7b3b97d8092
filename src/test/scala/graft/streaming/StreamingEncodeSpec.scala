package graft.streaming

import graft.SparkTestBase
import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** File-source streaming encode: two landed batches → both encoded, decoded
  * table matches the union bit-identically. */
class StreamingEncodeSpec extends SparkTestBase {

  test("streaming encode processes landed files into the block layout") {
    val in = java.nio.file.Files.createTempDirectory("graft_stream_in").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toFile.getAbsolutePath

    val batch1 = WebDocGen.dataset(spark, 300, 2).toDF()
    batch1.write.mode("append").parquet(in)

    val schema = batch1.schema
    val q = StreamingEncode.start(spark, in, out, schema, "url", partitions = 4, blockSize = 64)
    q.processAllAvailable()

    // land a second batch while the query is live
    import spark.implicits._
    val batch2 = spark.range(300, 500).map(i => WebDocGen.make(i)).toDF()
    batch2.write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()

    // streamed output is a first-class tracked table: the manifest-aware
    // reader resolves it, not just a raw directory scan
    val decoded = EncodePipeline.decodeShared(spark, out, schema)
    assert(decoded.count() === 500L)
    val all = WebDocGen.dataset(spark, 500, 2).toDF()
    val summary = EncodePipeline.verifyRoundTrip(all, decoded, "url").head()
    assert(summary.getLong(1) === 0L)
    // metadata landed per batch, with file tracking
    val meta = spark.read.parquet(s"$out/meta")
    assert(meta.select("wave").distinct().count() === 2L)
    assert(meta.filter(org.apache.spark.sql.functions.col("data_files").isNull).count() === 0L)

    // replaying a committed batch id is a manifest-detected no-op
    assert(!EncodePipeline.appendCommit(batch1, "url", out, 4, 64, batchId = 0L))

    // two batches fragmented the parts; compaction + vacuum unify them and
    // the decoded table is unchanged
    val compacted = EncodePipeline.compact(spark, out, schema, blockSize = 512)
    assert(compacted.nonEmpty)
    assert(EncodePipeline.vacuum(spark, out) > 0)
    val after = EncodePipeline.decodeShared(spark, out, schema)
    assert(EncodePipeline.verifyRoundTrip(all, after, "url").head().getLong(1) === 0L)
    assert(after.count() === 500L)
  }

  test("inline maintenance: compactEvery runs the compact+vacuum pair between batches") {
    val in = java.nio.file.Files.createTempDirectory("graft_stream_in2").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out2").toFile.getAbsolutePath
    val batch1 = WebDocGen.dataset(spark, 250, 2).toDF()
    batch1.write.mode("append").parquet(in)
    val schema = batch1.schema
    // compactEvery=2: maintenance fires after the second committed batch
    val q = StreamingEncode.start(spark, in, out, schema, "url", partitions = 4,
      blockSize = 32, compactEvery = 2, compactBlockSize = 512)
    q.processAllAvailable()
    import spark.implicits._
    val batch2 = spark.range(250, 500).map(i => WebDocGen.make(i)).toDF()
    batch2.write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    // the table went through a generation bump (compaction ran) and decodes
    // to the exact union
    val meta = spark.read.option("mergeSchema", "true").parquet(s"$out/meta")
    assert(meta.columns.contains("gen"))
    val all = WebDocGen.dataset(spark, 500, 2).toDF()
    val dec = EncodePipeline.decodeShared(spark, out, schema)
    assert(dec.count() === 500L)
    assert(EncodePipeline.verifyRoundTrip(all, dec, "url").head().getLong(1) === 0L)
  }
}
