package graft

/** The driver's two direct entry points: `entry` (flagship) and the
  * queries/oracle maps' integrity. */
class EntrySpec extends SparkTestBase {

  test("flagship entry returns a verified summary row with zero mismatches") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("rows") === 2000L)
    assert(r.getAs[Long]("mismatches") === 0L)
    assert(r.getAs[Long]("raw_bytes") > r.getAs[Long]("encoded_bytes"))
    assert(r.getAs[Double]("compression_ratio") > 2.0)
  }

  test("every oracle key has a matching query; queries are non-empty") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  test("all queries run at sf0.001 and return rows") {
    val slow = Set("q_minhash_dups", "q_ann_lsh_recall") // covered by Verify/Bench runs
    SparkEntry.queries.filterNot(q => slow(q._1)).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").collect().length
      assert(n > 0, s"$name returned no rows")
    }
  }
}
