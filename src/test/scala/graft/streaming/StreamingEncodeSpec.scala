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

    val enc = spark.read.parquet(s"$out/data")
    val decoded = EncodePipeline.decode(enc, schema)
    assert(decoded.count() === 500L)
    val all = WebDocGen.dataset(spark, 500, 2).toDF()
    val summary = EncodePipeline.verifyRoundTrip(all, decoded, "url").head()
    assert(summary.getLong(1) === 0L)
    // metadata landed per batch
    val meta = spark.read.parquet(s"$out/meta")
    assert(meta.select("wave").distinct().count() === 2L)
  }
}
