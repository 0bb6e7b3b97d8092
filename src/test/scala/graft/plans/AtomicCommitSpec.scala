package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Atomic snapshot commits: delete vectors are transaction-tagged and INERT
  * until their snapshot-marker row lands in the manifest; updateWhereLazy /
  * commitDelta ride the marker in the SAME single-file manifest append as
  * their insert rows, so a crash before that one append leaves the table
  * byte-for-byte unchanged and vacuum reclaims the orphans. */
class AtomicCommitSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_atomic").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def metaFiles(out: String): Set[String] =
    new java.io.File(s"$out/meta").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getName).toSet

  private def deleteFiles(out: String): Set[String] = {
    val d = new java.io.File(s"$out/deletes")
    if (!d.exists()) Set.empty
    else d.listFiles().filter(f => f.getName.endsWith(".parquet") &&
      !f.getName.startsWith(".")).map(_.getName).toSet
  }

  test("uncommitted-txn delete vectors are inert; their marker activates them") {
    val docs = WebDocGen.dataset(spark, 300, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    val n0 = EncodePipeline.decodeShared(spark, out, docs.schema).count()
    assert(n0 === 300L)

    // simulate a delta commit that crashed before its manifest append:
    // vectors staged under a txn that never got a marker
    val aFile = EncodePipeline.currentFiles(spark, out)
      .map(f => EncodePipeline.fileSuffix(f._2)).head
    import spark.implicits._
    Seq((aFile, 0, Array[Byte](0xff.toByte), 99, "txn-crashed"))
      .toDF("file", "block", "bitmap", "gen", "txn")
      .write.mode("append").parquet(s"$out/deletes")
    // INERT: reads, counts, time travel all unchanged
    assert(EncodePipeline.decodeShared(spark, out, docs.schema).count() === 300L)
    assert(spark.read.format("graft").load(out).count() === 300L)
    assert(EncodePipeline.loadDeletes(spark, out).isEmpty)

    // a real delete commits its own txn: only ITS vectors apply
    val n = EncodePipeline.deleteWhereLazy(spark, out, docs.schema,
      length(col("text")) % 4 === 1)
    assert(n > 0)
    assert(EncodePipeline.decodeShared(spark, out, docs.schema).count() === 300L - n)
    // the crashed txn's block-0 wipeout bitmap still doesn't apply
    val survivors = EncodePipeline.decodeShared(spark, out, docs.schema).count()
    assert(survivors === 300L - n, "crashed-txn vectors must stay inert")
  }

  test("vacuum reclaims inert-txn vector files, keeps committed ones applying") {
    val docs = WebDocGen.dataset(spark, 240, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    val n = EncodePipeline.deleteWhereLazy(spark, out, docs.schema,
      length(col("text")) % 5 === 2)
    assert(n > 0)
    val committedDvFiles = deleteFiles(out)
    // orphan from a crashed commit
    val aFile = EncodePipeline.currentFiles(spark, out)
      .map(f => EncodePipeline.fileSuffix(f._2)).head
    import spark.implicits._
    Seq((aFile, 0, Array[Byte](0x01.toByte), 88, "txn-orphan"))
      .toDF("file", "block", "bitmap", "gen", "txn")
      .write.mode("append").parquet(s"$out/deletes")
    assert(deleteFiles(out).size > committedDvFiles.size)
    // vacuum is AGE-GATED (an in-flight commit's staged vectors must not be
    // raced): with the default 15-min threshold the fresh orphan survives...
    assert(EncodePipeline.vacuum(spark, out) === 0)
    assert(deleteFiles(out).size > committedDvFiles.size)
    // ...and with the threshold at zero it is reclaimed
    System.setProperty("graft.vacuum.dvMinAgeMs", "0")
    try {
      val reclaimed = EncodePipeline.vacuum(spark, out)
      assert(reclaimed >= 1, "vacuum must reclaim the inert vector file")
    } finally System.clearProperty("graft.vacuum.dvMinAgeMs")
    assert(deleteFiles(out) === committedDvFiles, "committed vectors survive vacuum")
    assert(EncodePipeline.decodeShared(spark, out, docs.schema).count() === 240L - n)
  }

  test("reclaiming the LAST vector file leaves a readable table (no empty dir)") {
    val docs = WebDocGen.dataset(spark, 180, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    // the table's ONLY vector file is an uncommitted orphan
    val aFile = EncodePipeline.currentFiles(spark, out)
      .map(f => EncodePipeline.fileSuffix(f._2)).head
    import spark.implicits._
    Seq((aFile, 0, Array[Byte](0x01.toByte), 77, "txn-solo-orphan"))
      .toDF("file", "block", "bitmap", "gen", "txn")
      .write.mode("append").parquet(s"$out/deletes")
    System.setProperty("graft.vacuum.dvMinAgeMs", "0")
    try assert(EncodePipeline.vacuum(spark, out) >= 1)
    finally System.clearProperty("graft.vacuum.dvMinAgeMs")
    // the deletes dir must not survive parquet-less (schema inference would
    // fail every subsequent read)
    assert(!new java.io.File(s"$out/deletes").exists())
    assert(EncodePipeline.decodeShared(spark, out, docs.schema).count() === 180L)
    assert(spark.read.format("graft").load(out).count() === 180L)
    // second vacuum is a no-op, not a crash
    assert(EncodePipeline.vacuum(spark, out) === 0)
  }

  test("updateWhereLazy commits append + delete as ONE single-file manifest append") {
    val docs = WebDocGen.dataset(spark, 300, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    val before = metaFiles(out)
    val n = EncodePipeline.updateWhereLazy(spark, out, docs.schema, "url",
      length(col("text")) % 3 === 0, Map("lang" -> lit("zz")), partitions = 2,
      blockSize = 64)
    assert(n > 0)
    val added = metaFiles(out) -- before
    assert(added.size === 1,
      s"expected ONE manifest file for the atomic snapshot, got ${added.size}")
    // the one file carries both the insert batch rows and the delete marker,
    // and the marker's txn matches the staged vectors' txn
    val newMeta = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/meta/${added.head}")
    assert(newMeta.filter(col("column") === "__dv_marker").count() === 1L)
    assert(newMeta.filter(col("column") =!= "__dv_marker").count() > 0L)
    val markerTxn = newMeta.filter(col("column") === "__dv_marker")
      .select("txn").head().getString(0)
    assert(markerTxn != null)
    val dvTxns = spark.read.option("mergeSchema", "true").parquet(s"$out/deletes")
      .select("txn").distinct().collect().map(_.getString(0)).toSet
    assert(dvTxns === Set(markerTxn))
    // end state: updated rows visible exactly once
    val dec = EncodePipeline.decodeShared(spark, out, docs.schema)
    assert(dec.count() === 300L)
    assert(dec.filter(col("lang") === "zz").count() === n)
  }

  test("mixed-era vectors: legacy rows without txn still apply by generation") {
    val docs = WebDocGen.dataset(spark, 200, 4).toDF()
    val out = tmpDir()
    EncodePipeline.run(docs, "url", out, partitions = 2, blockSize = 64)
    // decode one real block position so the legacy vector hits a real row:
    // delete position 0 of block 0 of one file, pre-txn era (no txn column)
    val aFile = EncodePipeline.currentFiles(spark, out)
      .map(f => EncodePipeline.fileSuffix(f._2)).head
    import spark.implicits._
    Seq((aFile, 0, Array[Byte](0x01.toByte), 0))
      .toDF("file", "block", "bitmap", "gen")
      .write.mode("append").parquet(s"$out/deletes")
    // applies with no marker at all (legacy semantics preserved)
    assert(EncodePipeline.decodeShared(spark, out, docs.schema).count() === 199L)
    // a txn-era commit lands beside it: both apply
    val n = EncodePipeline.deleteWhereLazy(spark, out, docs.schema,
      length(col("text")) % 7 === 3)
    // n was computed against the legacy-filtered table, so exactly n more go
    val left = EncodePipeline.decodeShared(spark, out, docs.schema).count()
    assert(left === 199L - n,
      s"legacy + txn vectors must both apply (left=$left, n=$n)")
  }
}
