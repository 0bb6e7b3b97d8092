package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for all suites (spark_guide.md: one session
  * per suite via lazy val; sessions are reused across suites by getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // tmpfs scratch + no checkpoint checksum twins: every state-store file
    // create goes through Hadoop RawLocalFileSystem.setPermission, which
    // SPAWNS a chmod process (no native IO in this container) — the 4.1
    // checksum manager doubles the file count and a hypervisor steal storm
    // stretches each spawn to seconds (observed: a 4-row stateful
    // micro-batch pinned for 15+ min in Thread.start0 under chmod storms)
    .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  def sf(name: String, dir: String = "/root/testdata/sf0.001"): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
