package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Named snapshot references (Iceberg tags): `createTag` pins a generation
  * under a name, `option("tag")` reads resolve it, [[EncodePipeline.vacuum]]
  * protects every file the tagged snapshot references, and the fold/expiry
  * operations refuse to silently break a tag. */
class TagSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("tags pin generations; vacuum keeps tagged files; drop releases them") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val added = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val out = tmpDir("graft_tag")
    EncodePipeline.run(base, "url", out, partitions = 3, blockSize = 64) // gen 0
    assert(EncodePipeline.createTag(spark, out, "v1") === 0)
    EncodePipeline.appendCommit(added, "url", out, 3, 64, batchId = 1L) // gen 1
    assert(EncodePipeline.compact(spark, out, d.schema, blockSize = 256).nonEmpty) // gen 2
    // the compaction superseded gen 0/1 files, but v1 pins gen 0: vacuum
    // must keep its files even though no CURRENT manifest row lists them
    EncodePipeline.vacuum(spark, out)
    assert(spark.read.format("graft").option("tag", "v1").load(out).count()
      === base.count())
    // gen 1's files were tagged by nothing and ARE reclaimed — reading the
    // untagged superseded generation now fails (history expired), while the
    // tag still resolves
    assert(EncodePipeline.readTags(spark, out) === Map("v1" -> 0))
    // dropping the tag releases the files to the next vacuum
    assert(EncodePipeline.dropTag(spark, out, "v1"))
    assert(!EncodePipeline.dropTag(spark, out, "v1"))
    assert(EncodePipeline.vacuum(spark, out) > 0)
    // current reads never depended on the tag
    assert(spark.read.format("graft").load(out).count() === d.count())
    // a tag on vacuumed history is refused (it would pin a lie)
    intercept[IllegalArgumentException] {
      EncodePipeline.createTag(spark, out, "late", 0)
    }
    // unknown tags fail loudly with the inventory
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("tag", "nope").load(out).count()
    }
  }

  test("vacuum retain_last keeps the newest N generations time-travelable " +
       "(Iceberg expire_snapshots parity)") {
    val d = WebDocGen.dataset(spark, 240, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val added = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val out = tmpDir("graft_retain")
    EncodePipeline.run(base, "url", out, partitions = 2, blockSize = 64) // gen 0
    EncodePipeline.appendCommit(added, "url", out, 2, 64, batchId = 1L)  // gen 1
    assert(EncodePipeline.compact(spark, out, d.schema, blockSize = 256)
      .nonEmpty) // gen 2 supersedes the gen-0/1 files
    // retention window covers all three generations: nothing reclaims and
    // history stays readable
    assert(EncodePipeline.vacuum(spark, out, retainLast = 3) === 0)
    assert(spark.read.format("graft").option("gen", "1").load(out).count()
      === d.count())
    assert(spark.read.format("graft").option("gen", "0").load(out).count()
      === base.count())
    // default retention (current only) expires the superseded files
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(spark.read.format("graft").load(out).count() === d.count())
  }

  test("materializeDeletes refuses to expire vector history a tag applies") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val out = tmpDir("graft_tag_mor")
    EncodePipeline.run(d, "url", out, partitions = 2, blockSize = 64) // gen 0
    val nDel = EncodePipeline.deleteWhereLazy(spark, out, d.schema,
      col("lang") === "de") // gen 1 vectors
    assert(nDel > 0)
    EncodePipeline.createTag(spark, out, "after.del") // pins gen 1
    val e = intercept[IllegalArgumentException] {
      EncodePipeline.materializeDeletes(spark, out, d.schema, "url", blockSize = 64)
    }
    assert(e.getMessage.contains("after.del"))
    // the tagged read applies the vectors it protects
    assert(spark.read.format("graft").option("tag", "after.del").load(out)
      .filter(col("lang") === "de").count() === 0L)
    // dropping the tag unblocks the fold
    EncodePipeline.dropTag(spark, out, "after.del")
    assert(EncodePipeline.materializeDeletes(spark, out, d.schema, "url",
      blockSize = 64) === nDel)
  }

  test("create_tag / drop_tag via CALL") {
    val wh = tmpDir("graft_tag_wh")
    spark.conf.set("spark.sql.catalog.tcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tcat.root", wh)
    val d = WebDocGen.dataset(spark, 120, 4).toDF()
    EncodePipeline.run(d, "url", s"$wh/db/t", partitions = 2, blockSize = 64)
    d.limit(30).createOrReplaceTempView("tag_src")
    spark.sql("INSERT INTO tcat.db.t SELECT * FROM tag_src") // gen 1
    assert(spark.sql("CALL tcat.system.create_tag(table => 'db.t', tag => 'v1', gen => 0)")
      .head().getInt(0) === 0)
    assert(spark.read.format("graft").option("tag", "v1").load(s"$wh/db/t").count()
      === d.count())
    assert(spark.sql("CALL tcat.system.drop_tag(table => 'db.t', tag => 'v1')")
      .head().getBoolean(0))
  }
}
