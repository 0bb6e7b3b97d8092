package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multimodal plumbing tests: schemas, expressions, batch shape, determinism.
  * (Pixel decode is a documented stub — what's tested is the Spark-side
  * contract a real codec would plug into.) */
class MediaOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("image metadata parses from the binary payload; garbage is flagged") {
    val df = MediaOps.fakeMediaTable(spark, 40, 4)
      .filter($"media_type" === "image/fake")
      .select($"doc_id", MediaOps.image_meta($"payload").as("m"))
    val rows = df.select($"m.valid", $"m.width", $"m.height", $"m.channels").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)))
    assert(rows.forall(r => r.getInt(1) >= 32 && r.getInt(2) >= 24 && r.getInt(3) === 3))
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
      .select(MediaOps.image_meta($"payload").as("m")).select($"m.valid").head()
    assert(!bad.getBoolean(0))
  }

  test("resize rewrites dimensions deterministically") {
    val df = MediaOps.fakeMediaTable(spark, 20, 2).filter($"media_type" === "image/fake")
    val resized = df.select($"doc_id",
      MediaOps.image_meta(MediaOps.image_resize($"payload", 224, 224)).as("m"))
    val rows = resized.select($"m.width", $"m.height").collect()
    assert(rows.forall(r => r.getInt(0) === 224 && r.getInt(1) === 224))
    // determinism across runs
    val a = df.select(MediaOps.image_resize($"payload", 224, 224)).collect().map(_.getAs[Array[Byte]](0))
    val b = df.select(MediaOps.image_resize($"payload", 224, 224)).collect().map(_.getAs[Array[Byte]](0))
    a.zip(b).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
  }

  test("feature extraction yields unit-norm vectors usable by the ANN operators") {
    val df = MediaOps.fakeMediaTable(spark, 64, 4).filter($"media_type" === "image/fake")
      .select($"doc_id".as("vec_id"), MediaOps.image_feature($"payload", 32).as("embedding"))
    val norms = df.select(TextOps.l2Norm($"embedding".cast("array<double>")).as("n")).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
    // plugs straight into the similarity-search operator
    val top = TextOps.bruteForceTopK(df, df.filter($"vec_id" === 0L), "vec_id", "embedding", 3).collect()
    assert(top.length === 3)
  }

  test("frame sampling explodes videos into image payloads") {
    val vids = MediaOps.fakeMediaTable(spark, 40, 4).filter($"media_type" === "video/fake")
    val frames = vids.select($"doc_id", explode(MediaOps.frame_sample($"payload", 4)).as("frame"))
      .select($"doc_id", MediaOps.image_meta($"frame").as("m"))
    val rows = frames.select($"m.valid", $"m.width").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(0) && r.getInt(1) === 64))
  }

  test("batch-shaped processing sees fixed-size batches, not rows or whole partitions") {
    val df = MediaOps.fakeMediaTable(spark, 100, 2)
    val batchSizes = MediaOps.processBatches(df, "doc_id", "payload", batchSize = 16, partitions = 4) {
      batch => Iterator.single(batch.size)
    }.collect()
    assert(batchSizes.sum === 100)
    assert(batchSizes.max <= 16)
    assert(batchSizes.count(_ == 16) >= 4) // mostly full batches
  }
}
