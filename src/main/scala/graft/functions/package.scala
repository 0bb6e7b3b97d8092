package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Bridge.{column => toCol, expression => toExpr}

import graft.core.Codecs

/** Column-level API of the engine — codec kernels and the reference's
  * packed-word operator surface as Spark functions (SURVEY.md §2.1 mapping
  * column). All are Catalyst expressions, so they participate in the
  * optimizer and run inside whole-stage-codegen pipelines via eval.
  */
package object functions {

  // ---- codec suite over column blocks (array columns) ----
  def encode_longs(c: Column): Column = toCol(EncodeLongs(toExpr(c)))
  def encode_longs_as(c: Column, codec: String): Column =
    toCol(EncodeLongs(toExpr(c), codecId(codec, long = true)))
  def decode_longs(c: Column): Column = toCol(DecodeLongs(toExpr(c)))

  def encode_strings(c: Column): Column = toCol(EncodeStrings(toExpr(c)))
  def encode_strings_as(c: Column, codec: String): Column =
    toCol(EncodeStrings(toExpr(c), codecId(codec, long = false)))
  def decode_strings(c: Column): Column = toCol(DecodeStrings(toExpr(c)))

  def encode_binary(c: Column): Column = toCol(EncodeBinary(toExpr(c)))
  def decode_binary(c: Column): Column = toCol(DecodeBinary(toExpr(c)))

  def blob_codec(c: Column): Column = toCol(BlobCodec(toExpr(c)))
  def blob_page(c: Column): Column = toCol(BlobPageCompressed(toExpr(c)))
  def blob_count_eq(blob: Column, v: Column): Column = toCol(BlobCountEq(toExpr(blob), toExpr(v)))
  def blob_contains(blob: Column, v: Column): Column = toCol(BlobContains(toExpr(blob), toExpr(v)))
  def blob_count_between(blob: Column, lo: Column, hi: Column): Column =
    toCol(BlobCountBetween(toExpr(blob), toExpr(lo), toExpr(hi)))
  def blob_contains_between(blob: Column, lo: Column, hi: Column): Column =
    toCol(BlobContainsBetween(toExpr(blob), toExpr(lo), toExpr(hi)))
  def blob_range(blob: Column): Column = toCol(BlobRange(toExpr(blob)))
  def blob_stats(blob: Column): Column = toCol(BlobStatsLong(toExpr(blob)))
  def blob_range_str(blob: Column): Column = toCol(BlobRangeStr(toExpr(blob)))
  def blob_null_count(blob: Column): Column = toCol(BlobNullCount(toExpr(blob)))
  /** Count of encoded string values in [lo, hi]. A NULL bound is UNBOUNDED
    * on that side (how one-sided ranges are spelled — there is no "maximum
    * string" literal), deliberately unlike SQL comparison null-propagation. */
  def blob_count_between_str(blob: Column, lo: Column, hi: Column,
                             loInc: Boolean = true, hiInc: Boolean = true): Column =
    toCol(BlobCountBetweenStr(toExpr(blob), toExpr(lo), toExpr(hi), loInc, hiInc))
  /** 3VL exists over the range; NULL bound = unbounded (see
    * [[blob_count_between_str]]). */
  def blob_contains_between_str(blob: Column, lo: Column, hi: Column,
                                loInc: Boolean = true, hiInc: Boolean = true): Column =
    toCol(BlobContainsBetweenStr(toExpr(blob), toExpr(lo), toExpr(hi), loInc, hiInc))
  /** per-block Bloom filter over a blob's non-null values (null = no claim:
    * all-null block or shared-dict codec). */
  def blob_bloom(blob: Column): Column = toCol(BlobBloom(toExpr(blob)))
  /** FALSE proves absence; wrap with coalesce(.., lit(true)) when the filter
    * column may be null (mixed-era files). Probe doubles via double_bits. */
  def bloom_maybe(bm: Column, v: Column): Column = toCol(BloomMaybe(toExpr(bm), toExpr(v)))
  /** per-block KMV distinct-count sketch (null = NDV unknowable locally:
    * shared-dict / FSST / raw codecs — see [[graft.core.Kmv.ofBlob]]). */
  def blob_ndv_sketch(blob: Column): Column = toCol(BlobNdvSketch(toExpr(blob)))
  /** Morton clustering key over 1–8 bigint columns, normalized against the
    * supplied per-column [lo, hi] value bounds — sort by it
    * (EncodePipeline.rewriteSorted / rewriteZOrdered, which derives the
    * bounds) to give every participating column zone-map locality at once. */
  def zorder_key(cols: Seq[Column], los: Seq[Long], his: Seq[Long]): Column =
    toCol(ZOrderKey(cols.map(toExpr), los, his))
  def bits_needed(c: Column): Column = toCol(BitsNeeded(toExpr(c)))
  def double_bits(c: Column): Column = toCol(DoubleBits(toExpr(c)))
  def bits_double(c: Column): Column = toCol(BitsDouble(toExpr(c)))

  private def codecId(name: String, long: Boolean): Int = (name, long) match {
    case ("const", true)     => Codecs.ConstLong
    case ("bitpack", true)   => Codecs.BitPackId
    case ("for", true)       => Codecs.ForId
    case ("delta", true)     => Codecs.DeltaId
    case ("rle", true)       => Codecs.RleLong
    case ("alp", true)       => Codecs.AlpLong
    case ("tzfor", true)     => Codecs.TzForId
    case ("const", false)    => Codecs.ConstStr
    case ("raw", false)      => Codecs.RawStr
    case ("dict", false)     => Codecs.DictId
    case ("rle_dict", false) => Codecs.RleDict
    case ("fsst", false)     => Codecs.FsstId
    case ("prefix", false)   => Codecs.PrefixStr
    case other               => throw new IllegalArgumentException(s"unknown codec $other")
  }

  // ---- packed-word SWAR surface (pint public API, SURVEY.md §2.1) ----
  def swar_pack(widths: Seq[Int], lanes: Column*): Column =
    toCol(SwarPack(lanes.map(toExpr), widths))
  def swar_get(word: Column, widths: Seq[Int], index: Int): Column =
    toCol(SwarGet(toExpr(word), widths, index, signed = false))
  def swar_get_signed(word: Column, widths: Seq[Int], index: Int): Column =
    toCol(SwarGet(toExpr(word), widths, index, signed = true))
  def swar_slice(word: Column, widths: Seq[Int], from: Int, until: Int): Column =
    toCol(SwarSlice(toExpr(word), widths, from, until))
  def swar_add_wrap(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.AddWrap))
  def swar_add_sat_u(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.AddSatU))
  def swar_add_sat_s(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.AddSatS))
  def swar_sub_wrap(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.SubWrap))
  def swar_sub_sat_u(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.SubSatU))
  def swar_sub_sat_s(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.SubSatS))
  def swar_min_u(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.MinU))
  def swar_max_u(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.MaxU))
  def swar_min_s(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.MinS))
  def swar_max_s(a: Column, b: Column, widths: Seq[Int]): Column =
    toCol(SwarBinaryOp(toExpr(a), toExpr(b), widths, SwarOp.MaxS))
  def swar_shift_left(word: Column, widths: Seq[Int], amount: Int): Column =
    toCol(SwarShift(toExpr(word), widths, amount, leftShift = true))
  def swar_shift_right_u(word: Column, widths: Seq[Int], amount: Int): Column =
    toCol(SwarShift(toExpr(word), widths, amount, leftShift = false))
}
