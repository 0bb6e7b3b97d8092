package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{encode_longs, decode_longs, encode_strings, decode_strings,
  blob_codec, bits_needed, swar_pack, swar_get, swar_get_signed, swar_add_wrap,
  swar_add_sat_u, swar_sub_wrap, swar_min_u, swar_max_s, swar_shift_left, swar_slice}

/** Column-level API over real testdata parquet. */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("encode/decode longs round-trips event ids through the auto codec") {
    val events = sf("events")
    val out = events.groupBy((col("event_id") % 7).as("g"))
      .agg(sort_array(collect_list($"user_id")).as("vals"))
      .select($"g", $"vals", decode_longs(encode_longs($"vals")).as("back"),
        blob_codec(encode_longs($"vals")).as("codec"))
      .withColumn("ok", $"vals" === $"back")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("ok")))
  }

  test("encode/decode strings round-trips document text") {
    val docs = sf("documents")
    val out = docs.groupBy((col("doc_id") % 5).as("g"))
      .agg(collect_list($"text").as("vals"))
      .select($"vals", decode_strings(encode_strings($"vals")).as("back"),
        blob_codec(encode_strings($"vals")).as("codec"))
      .withColumn("ok", $"vals" === $"back")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.forall(_.getAs[String]("codec") == "fsst")) // prose compresses
  }

  test("dict selected for low-cardinality lang column") {
    val docs = sf("documents")
    val codec = docs.agg(collect_list($"lang").as("vals"))
      .select(blob_codec(encode_strings($"vals"))).head().getString(0)
    assert(Set("dict", "rle_dict").contains(codec))
  }

  test("BitWidthHistogram aggregator matches the relational groupBy form") {
    import spark.implicits._
    val ids = sf("events").select(col("user_id").cast("long")).as[Long]
    val hist = ids.select(BitWidthHistogram.histogram).head()
    assert(hist.length === 65)
    val relational = sf("events")
      .groupBy(bits_needed(col("user_id")).as("w")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    relational.foreach { case (w, n) => assert(hist(w) === n, s"width $w") }
    assert(hist.sum === ids.count())
  }

  test("bits_needed matches DuckDB-style length(bin(x)) semantics") {
    val df = Seq(0L, 1L, 2L, 255L, 256L, 1L << 40).toDF("v")
    val got = df.select(bits_needed($"v")).as[Int].collect().toSeq
    assert(got === Seq(1, 1, 2, 8, 9, 41))
  }

  test("every SWAR op: whole-stage-codegen result equals the kernel on random words") {
    // differential test over the generated-Java path: each op evaluated via
    // DataFrame (codegen) must equal LaneSpec (the scala kernel the golden
    // pint vectors pin). Mixed widths incl. a 1-bit lane.
    import graft.core.LaneSpec
    import graft.functions._
    val widths = Seq(3, 1, 7, 10, 11)
    val spec = LaneSpec(widths.toArray)
    val rnd = new scala.util.Random(99)
    val rows = Seq.fill(400)((rnd.nextLong() & spec.fullMask, rnd.nextLong() & spec.fullMask))
    val df = rows.toDF("a", "b").cache()
    val binOps: Seq[(String, org.apache.spark.sql.Column, (Long, Long) => Long)] = Seq(
      ("add_wrap", swar_add_wrap($"a", $"b", widths), spec.addWrap),
      ("add_sat_u", swar_add_sat_u($"a", $"b", widths), spec.addSatU),
      ("add_sat_s", swar_add_sat_s($"a", $"b", widths), spec.addSatS),
      ("sub_wrap", swar_sub_wrap($"a", $"b", widths), spec.subWrap),
      ("sub_sat_u", swar_sub_sat_u($"a", $"b", widths), spec.subSatU),
      ("sub_sat_s", swar_sub_sat_s($"a", $"b", widths), spec.subSatS),
      ("min_u", swar_min_u($"a", $"b", widths), spec.minU),
      ("max_u", swar_max_u($"a", $"b", widths), spec.maxU),
      ("min_s", swar_min_s($"a", $"b", widths), spec.minS),
      ("max_s", swar_max_s($"a", $"b", widths), spec.maxS))
    binOps.foreach { case (name, colExpr, model) =>
      val got = df.select($"a", $"b", colExpr.as("r")).collect()
      got.foreach { r =>
        assert(r.getLong(2) === model(r.getLong(0), r.getLong(1)),
          s"$name(${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
    // shifts incl. overshift, per-lane gets (both signednesses), slice
    (0 to 12).foreach { amt =>
      val got = df.select($"a", swar_shift_left($"a", widths, amt).as("l"),
        swar_shift_right_u($"a", widths, amt).as("r")).collect()
      got.foreach { r =>
        assert(r.getLong(1) === spec.shiftLeft(r.getLong(0), amt), s"shl $amt")
        assert(r.getLong(2) === spec.shiftRightU(r.getLong(0), amt), s"shr $amt")
      }
    }
    widths.indices.foreach { i =>
      val got = df.select($"a", swar_get($"a", widths, i).as("u"),
        swar_get_signed($"a", widths, i).as("s")).collect()
      got.foreach { r =>
        assert(r.getLong(1) === spec.get(r.getLong(0), i))
        assert(r.getLong(2) === spec.getSigned(r.getLong(0), i))
      }
    }
    val gotSl = df.select($"a", swar_slice($"a", widths, 1, 4).as("sl")).collect()
    gotSl.foreach(r => assert(r.getLong(1) === spec.slice(r.getLong(0), 1, 4)._2))
    df.unpersist()
  }

  test("swar ops on lineitem lanes match plain SQL arithmetic") {
    val widths = Seq(4, 8, 8)
    val li = sf("lineitem")
      .select($"l_linenumber".cast("long").as("ln"),
        $"l_quantity".cast("long").as("qty"),
        (($"l_discount" * 100).cast("long")).as("disc"))
    val packed = li.select($"ln", $"qty", $"disc",
      swar_pack(widths, $"ln", $"qty", $"disc").as("w"))
    // lanes survive pack/get
    val bad1 = packed.filter(
      swar_get($"w", widths, 0) =!= $"ln" % 16 ||
      swar_get($"w", widths, 1) =!= $"qty" % 256 ||
      swar_get($"w", widths, 2) =!= $"disc" % 256).count()
    assert(bad1 === 0)
    // add_wrap == per-lane modular add
    val b = packed.select($"ln", $"qty", $"disc", $"w",
      swar_add_wrap($"w", swar_pack(widths, lit(3L), lit(200L), lit(7L)), widths).as("s"))
    val bad2 = b.filter(
      swar_get($"s", widths, 0) =!= ($"ln" + 3) % 16 ||
      swar_get($"s", widths, 1) =!= ($"qty" + 200) % 256 ||
      swar_get($"s", widths, 2) =!= ($"disc" + 7) % 256).count()
    assert(bad2 === 0)
    // saturating add clamps at lane max
    val c = packed.select($"ln", $"qty",
      swar_add_sat_u($"w", swar_pack(widths, lit(14L), lit(250L), lit(0L)), widths).as("s"))
    val bad3 = c.filter(
      swar_get($"s", widths, 0) =!= least($"ln" + 14, lit(15)) ||
      swar_get($"s", widths, 1) =!= least($"qty" + 250, lit(255))).count()
    assert(bad3 === 0)
    // sub_wrap, min, signed max, shift, slice, signed get
    val d = packed.select($"ln", $"qty", $"disc", $"w",
      swar_sub_wrap($"w", swar_pack(widths, lit(1L), lit(1L), lit(1L)), widths).as("sub"),
      swar_min_u($"w", swar_pack(widths, lit(2L), lit(30L), lit(5L)), widths).as("mn"),
      swar_max_s($"w", swar_pack(widths, lit(-1L), lit(10L), lit(3L)), widths).as("mx"),
      swar_shift_left($"w", widths, 2).as("sh"),
      swar_slice($"w", widths, 1, 3).as("sl"))
    val bad4 = d.filter(
      swar_get($"sub", widths, 0) =!= pmod($"ln" - 1, lit(16)) ||
      swar_get($"mn", widths, 1) =!= least($"qty" % 256, lit(30)) ||
      swar_get_signed($"mx", widths, 2) =!= greatest(
        when($"disc" % 256 >= 128, $"disc" % 256 - 256).otherwise($"disc" % 256), lit(3)) ||
      swar_get($"sh", widths, 1) =!= ($"qty" % 256) * 4 % 256 ||
      swar_get($"sl", Seq(8, 8), 0) =!= $"qty" % 256).count()
    assert(bad4 === 0)
  }
}
