package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.WebDocGen

/** Schema evolution on the encoded table (Iceberg read-side parity):
  * columns resolve by NAME; parts written before a column was added read
  * it as null; a narrower target schema ignores extra columns; compaction
  * under the new schema materializes the migration; IS NULL pruning stays
  * correct for parts that predate the column. */
class SchemaEvolutionSpec extends SparkTestBase {

  test("added column null-fills old parts; narrow schema ignores extras; compaction migrates") {
    val all = WebDocGen.dataset(spark, 400, 4).toDF()
    val half1 = all.filter(pmod(unix_micros(col("warc_ts")), lit(2L)) === 0)
    val half2 = all.filter(pmod(unix_micros(col("warc_ts")), lit(2L)) =!= 0)
    val n1 = half1.count(); val n2 = half2.count()
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toFile.getAbsolutePath

    // era 1: schema WITHOUT lang; era 2: full schema appended as a batch
    EncodePipeline.run(half1.drop("lang"), "url", out, partitions = 4, blockSize = 64)
    assert(EncodePipeline.appendCommit(half2, "url", out, 4, 64, batchId = 7L))

    // read under the NEW schema: era-1 rows carry null lang, era-2 rows
    // their real values (bit-identical through verifyRoundTrip)
    val dec = EncodePipeline.decodeShared(spark, out, all.schema)
    assert(dec.count() === n1 + n2)
    assert(dec.filter(col("lang").isNull).count() === n1)
    val era2 = dec.filter(col("lang").isNotNull)
    assert(EncodePipeline.verifyRoundTrip(half2, era2, "url").head().getLong(1) === 0L)

    // read under the OLD schema: the extra column is simply not asked for
    val decV1 = EncodePipeline.decodeShared(spark, out, all.drop("lang").schema)
    assert(decV1.columns.toSeq === all.drop("lang").columns.toSeq)
    assert(decV1.count() === n1 + n2)

    // IS NULL pruning must KEEP the parts that predate the column (they
    // are all-null for it despite having no manifest rows that say so)
    val pruned = EncodePipeline.readDataPrunedIsNull(spark, out, "lang")
    val prunedNulls = EncodePipeline.decode(pruned, all.schema)
      .filter(col("lang").isNull).count()
    assert(prunedNulls === n1)
    // ...while a genuinely null-free column still prunes everything
    assert(EncodePipeline.survivingPartsIsNull(spark, out, "url").isEmpty)

    // compaction under the new schema rewrites old parts with materialized
    // all-null blocks; the decoded table is unchanged
    assert(EncodePipeline.compact(spark, out, all.schema, blockSize = 512).nonEmpty)
    val after = EncodePipeline.decodeShared(spark, out, all.schema)
    assert(after.count() === n1 + n2)
    assert(after.filter(col("lang").isNull).count() === n1)
    assert(EncodePipeline.verifyRoundTrip(half2,
      after.filter(col("lang").isNotNull), "url").head().getLong(1) === 0L)
  }
}
