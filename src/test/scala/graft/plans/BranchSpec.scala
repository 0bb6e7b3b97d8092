package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Branches + write-audit-publish (Iceberg branch refs / fast-forward):
  * [[EncodePipeline.appendToBranch]] lands snapshots invisible to main
  * readers, `option("branch")` / `db.t.branch_<name>` audit them, and
  * [[EncodePipeline.fastForward]] publishes atomically with one manifest
  * append. Rollback unpublishes; vacuum protects staged files; divergence
  * guards refuse unsafe publishes. */
class BranchSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("write-audit-publish: staged commits invisible until fastForward; " +
       "time travel cuts below the marker; rollback unpublishes") {
    val d = WebDocGen.dataset(spark, 300, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val staged = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val out = tmpDir("graft_branch")
    EncodePipeline.run(base, "url", out, partitions = 3, blockSize = 64) // gen 0
    assert(EncodePipeline.createBranch(spark, out, "audit") === 0)
    assert(EncodePipeline.appendToBranch(staged, "url", out, 3, "audit",
      blockSize = 64, batchId = 1L)) // gen 1, ref = audit
    // WRITE: main readers see none of it; the branch read sees main + staged
    assert(spark.read.format("graft").load(out).count() === base.count())
    assert(spark.read.format("graft").option("branch", "audit").load(out)
      .count() === d.count())
    val dicts = try EncodePipeline.loadDicts(spark, out)
                catch { case _: Exception => Map.empty[Long, graft.core.Codecs.DictTable] }
    assert(EncodePipeline.decode(
      EncodePipeline.readDataBranch(spark, out, "audit"), d.schema,
      if (dicts.isEmpty) None else Some(dicts)).count() === d.count())
    // AUDIT passes → PUBLISH: one atomic marker append, zero data bytes
    val pubGen = EncodePipeline.fastForward(spark, out, "audit")
    assert(pubGen === 2)
    assert(spark.read.format("graft").load(out).count() === d.count())
    // exactly-once per value after publish (no duplicate visibility)
    assert(spark.read.format("graft").load(out).select("url").distinct().count()
      === d.count())
    // time travel below the marker still hides the branch
    assert(spark.read.format("graft").option("gen", "1").load(out).count()
      === base.count())
    // ...but a BRANCH read time-traveled below the marker still shows the
    // audit state as it existed then: the registry base stays at creation,
    // publish progress is derived from the markers
    assert(spark.read.format("graft").option("branch", "audit")
      .option("gen", "1").load(out).count() === d.count())
    // a published branch keeps working: base advanced, nothing re-publishes
    assert(EncodePipeline.fastForward(spark, out, "audit") === 2) // no-op
    // rollback across the publish unpublishes (metadata-only)
    EncodePipeline.rollbackTo(spark, out, 1)
    assert(spark.read.format("graft").load(out).count() === base.count())
  }

  test("vacuum protects staged branch files; dropBranch releases them; " +
       "re-created branch does not resurrect orphans") {
    val d = WebDocGen.dataset(spark, 240, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(3)) === 0)
    val stagedA = d.filter(pmod(xxhash64(col("url")), lit(3)) === 1)
    val stagedB = d.filter(pmod(xxhash64(col("url")), lit(3)) === 2)
    val out = tmpDir("graft_branch_vac")
    EncodePipeline.run(base, "url", out, partitions = 2, blockSize = 64) // gen 0
    EncodePipeline.createBranch(spark, out, "wip")
    assert(EncodePipeline.appendToBranch(stagedA, "url", out, 2, "wip",
      blockSize = 64, batchId = 1L))
    // staged files are main-invisible but REGISTERED: vacuum must keep them
    assert(EncodePipeline.vacuum(spark, out) === 0)
    assert(spark.read.format("graft").option("branch", "wip").load(out).count()
      === base.count() + stagedA.count())
    // dropping the branch abandons the staged commits; vacuum reclaims
    assert(EncodePipeline.dropBranch(spark, out, "wip"))
    assert(!EncodePipeline.dropBranch(spark, out, "wip"))
    assert(EncodePipeline.vacuum(spark, out) > 0)
    assert(spark.read.format("graft").load(out).count() === base.count())
    // re-creating the name must NOT resurrect the orphaned generation: the
    // branch read scopes to gen > the NEW base, so the dropped incarnation's
    // rows (files already vacuumed) never plan — and the dropped rows'
    // batch_id must not block re-staging the corrected batch under the
    // SAME id (the stream saw the original batch fail its audit)
    EncodePipeline.createBranch(spark, out, "wip")
    assert(spark.read.format("graft").option("branch", "wip").load(out)
      .count() === base.count())
    assert(EncodePipeline.appendToBranch(stagedB, "url", out, 2, "wip",
      blockSize = 64, batchId = 1L)) // reuses the dropped incarnation's id
    EncodePipeline.fastForward(spark, out, "wip")
    assert(spark.read.format("graft").load(out).count()
      === base.count() + stagedB.count())
  }

  test("divergence guards: replacing main commits always refuse; additive " +
       "divergence needs allowDivergence") {
    val d = WebDocGen.dataset(spark, 200, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(3)) === 0)
    val staged = d.filter(pmod(xxhash64(col("url")), lit(3)) === 1)
    val late = d.filter(pmod(xxhash64(col("url")), lit(3)) === 2)
    val out = tmpDir("graft_branch_div")
    EncodePipeline.run(base, "url", out, partitions = 2, blockSize = 64) // gen 0
    EncodePipeline.createBranch(spark, out, "aud")
    assert(EncodePipeline.appendToBranch(staged, "url", out, 2, "aud",
      blockSize = 64, batchId = 1L))
    // additive main append after the base: strict fast-forward refuses,
    // merge-publish succeeds
    assert(EncodePipeline.appendCommit(late, "url", out, 2, 64, batchId = 2L))
    val e1 = intercept[IllegalArgumentException] {
      EncodePipeline.fastForward(spark, out, "aud")
    }
    assert(e1.getMessage.contains("allowDivergence"))
    EncodePipeline.fastForward(spark, out, "aud", allowDivergence = true)
    assert(spark.read.format("graft").load(out).count() === d.count())
    // a REPLACING commit (compaction) after a new branch's base always
    // refuses — its floor would hide the staged rows
    EncodePipeline.createBranch(spark, out, "aud2")
    assert(EncodePipeline.appendToBranch(staged.limit(10), "url", out, 2, "aud2",
      blockSize = 64, batchId = 3L))
    assert(EncodePipeline.compact(spark, out, d.schema, blockSize = 256).nonEmpty)
    val e2 = intercept[IllegalArgumentException] {
      EncodePipeline.fastForward(spark, out, "aud2", allowDivergence = true)
    }
    assert(e2.getMessage.contains("replacing"))
    // unknown branches fail loudly with the inventory
    intercept[IllegalArgumentException] {
      EncodePipeline.appendToBranch(staged, "url", out, 2, "nope", 64, 9L)
    }
    // a main-side MOR delete is a pure marker generation (part -1, zero
    // files re-listed): it must NOT read as replacing — merge-publish works
    EncodePipeline.dropBranch(spark, out, "aud2")
    EncodePipeline.createBranch(spark, out, "aud3")
    assert(EncodePipeline.appendToBranch(staged.limit(5), "url", out, 2, "aud3",
      blockSize = 64, batchId = 10L))
    val nBefore = spark.read.format("graft").load(out).count()
    val nDel = EncodePipeline.deleteWhereLazy(spark, out, d.schema,
      pmod(xxhash64(col("url")), lit(7)) === 0)
    assert(nDel > 0)
    EncodePipeline.fastForward(spark, out, "aud3", allowDivergence = true)
    assert(spark.read.format("graft").load(out).count() === nBefore - nDel + 5)
  }

  test("connector branch writes: option(\"branch\") Append stages invisibly; " +
       "other modes refuse") {
    val d = WebDocGen.dataset(spark, 160, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val staged = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val out = tmpDir("graft_branch_w")
    EncodePipeline.run(base, "url", out, partitions = 2, blockSize = 64)
    EncodePipeline.createBranch(spark, out, "stage")
    staged.write.format("graft").option("branch", "stage")
      .mode("append").save(out)
    assert(spark.read.format("graft").load(out).count() === base.count())
    assert(spark.read.format("graft").option("branch", "stage").load(out)
      .count() === d.count())
    EncodePipeline.fastForward(spark, out, "stage")
    assert(spark.read.format("graft").load(out).count() === d.count())
    // non-append branch writes refuse loudly
    intercept[IllegalArgumentException] {
      staged.write.format("graft").option("branch", "stage")
        .mode("overwrite").save(out)
    }
  }

  test("spark.wap.branch session gate: appends stage on the branch, " +
       "mutating writes refuse") {
    val d = WebDocGen.dataset(spark, 140, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val staged = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val out = tmpDir("graft_wap_conf")
    EncodePipeline.run(base, "url", out, partitions = 2, blockSize = 64)
    EncodePipeline.createBranch(spark, out, "wap")
    spark.conf.set("spark.wap.branch", "wap")
    try {
      // a plain append under the gate stages instead of committing to main
      staged.write.format("graft").mode("append").save(out)
      assert(spark.read.format("graft").load(out).count() === base.count())
      assert(spark.read.format("graft").option("branch", "wap").load(out)
        .count() === d.count())
      // overwrite under the gate would replace main outside the audit flow
      intercept[UnsupportedOperationException] {
        staged.write.format("graft").mode("overwrite").save(out)
      }
    } finally spark.conf.unset("spark.wap.branch")
    EncodePipeline.fastForward(spark, out, "wap")
    assert(spark.read.format("graft").load(out).count() === d.count())
  }

  test("SQL surface: CALL create_branch/fast_forward/drop_branch, " +
       "db.t.branch_<name>, VERSION AS OF '<branch>'") {
    val wh = tmpDir("graft_branch_wh")
    spark.conf.set("spark.sql.catalog.bcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bcat.root", wh)
    val d = WebDocGen.dataset(spark, 150, 4).toDF()
    val base = d.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val staged = d.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    EncodePipeline.run(base, "url", s"$wh/db/t", partitions = 2, blockSize = 64)
    assert(spark.sql("CALL bcat.system.create_branch(table => 'db.t', branch => 'qa')")
      .head().getInt(0) === 0)
    EncodePipeline.appendToBranch(staged, "url", s"$wh/db/t", 2, "qa",
      blockSize = 64, batchId = 1L)
    // audit reads via the catalog: metadata-table-style and VERSION AS OF
    assert(spark.sql("SELECT count(*) FROM bcat.db.t").head().getLong(0)
      === base.count())
    assert(spark.sql("SELECT count(*) FROM bcat.db.t.branch_qa").head().getLong(0)
      === d.count())
    assert(spark.sql("SELECT count(*) FROM bcat.db.t VERSION AS OF 'qa'")
      .head().getLong(0) === d.count())
    val pub = spark.sql("CALL bcat.system.fast_forward(table => 'db.t', branch => 'qa')")
      .head().getInt(0)
    assert(pub > 0)
    assert(spark.sql("SELECT count(*) FROM bcat.db.t").head().getLong(0)
      === d.count())
    assert(spark.sql("CALL bcat.system.drop_branch(table => 'db.t', branch => 'qa')")
      .head().getBoolean(0))
    // SQL writes through a branch identifier STAGE (never leak to main);
    // row-level DML on a branch identifier refuses loudly
    spark.sql("CALL bcat.system.create_branch(table => 'db.t', branch => 'qa2')")
    // the `refs` metadata table lists branches and tags (Iceberg parity)
    assert(spark.sql("SELECT type FROM bcat.db.t.refs WHERE name = 'qa2'")
      .head().getString(0) === "branch")
    val nMain = spark.sql("SELECT count(*) FROM bcat.db.t").head().getLong(0)
    spark.sql("INSERT INTO bcat.db.t.branch_qa2 " +
      "SELECT url, warc_ts, html, text, lang FROM bcat.db.t LIMIT 7")
    assert(spark.sql("SELECT count(*) FROM bcat.db.t").head().getLong(0) === nMain)
    assert(spark.sql("SELECT count(*) FROM bcat.db.t.branch_qa2").head().getLong(0)
      === nMain + 7)
    val eDel = intercept[Throwable] {
      spark.sql("DELETE FROM bcat.db.t.branch_qa2 WHERE lang = 'en'").collect()
    }
    val msgs = Iterator.iterate(eDel)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("not supported"), msgs)
    spark.sql("CALL bcat.system.fast_forward(table => 'db.t', branch => 'qa2')")
    assert(spark.sql("SELECT count(*) FROM bcat.db.t").head().getLong(0)
      === nMain + 7)
  }
}
