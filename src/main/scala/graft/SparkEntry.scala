package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions._
import graft.operators.TextOps
import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2; the
  * SQL-expressible ones carry a DuckDB oracle in `oracleSql` (identical
  * column names/types both sides); codec round-trips are *self-checking*:
  * they return an `n_mismatch` column the oracle pins to 0, so DuckDB
  * verifies bit-identical decode without re-implementing the codec.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** unique SQL-catalog names per call: Spark caches catalog instances by
    * name, so a reused name would pin the first run's warehouse root */
  private val catalogSeq = new java.util.concurrent.atomic.AtomicInteger()

  /** group rows, collect a long column into sorted block arrays, encode with
    * `codec` (or auto), decode, and count value mismatches — returns
    * (n_rows, n_mismatch) plus optional extra aggregates computed later.
    * Callers pass `id DIV 4096`-style group keys so BLOCK SIZE (not block
    * count) is the constant: a fixed group count would grow each
    * collect_list row linearly with the table (single-task skew / OOM at
    * 100× scale); the production path caps at blockSize the same way
    * (EncodePipeline.BlockIterator). */
  private def longRoundTrip(df: DataFrame, valueCol: Column, groups: Column,
                            codec: Option[String]): DataFrame = {
    val blocks = df.groupBy(groups.as("g"))
      .agg(sort_array(collect_list(valueCol)).as("vals"))
    val enc = codec.map(c => encode_longs_as(col("vals"), c)).getOrElse(encode_longs(col("vals")))
    blocks.select(col("vals"), decode_longs(enc).as("back"))
      .select(size(col("vals")).as("n"),
        when(col("vals") === col("back"), 0).otherwise(size(col("vals"))).as("bad"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        sum(col("bad")).cast("long").as("n_mismatch"))
  }

  private def strRoundTrip(df: DataFrame, valueCol: Column, groups: Column,
                           codec: Option[String]): DataFrame = {
    val blocks = df.groupBy(groups.as("g"))
      .agg(sort_array(collect_list(valueCol)).as("vals"))
    val enc = codec.map(c => encode_strings_as(col("vals"), c)).getOrElse(encode_strings(col("vals")))
    blocks.select(col("vals"), decode_strings(enc).as("back"))
      .select(size(col("vals")).as("n"),
        when(col("vals") === col("back"), 0).otherwise(size(col("vals"))).as("bad"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        sum(col("bad")).cast("long").as("n_mismatch"))
  }

  /** Flagship on sf=0.001 (driver smoke-checks rows>0): synthesize the
    * north-rule WebDoc table, run the full encode→decode→verify pipeline,
    * and report correctness + compression in one row. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = WebDocGen.dataset(spark, 2000, 8).toDF()
    val enc = EncodePipeline.encode(docs, "url", partitions = 8, blockSize = 512,
      partExpr = Some(EncodePipeline.saltedHostPart("url", 8, 4))).cache()
    val decoded = EncodePipeline.decode(enc, docs.schema)
    val verify = EncodePipeline.verifyRoundTrip(docs, decoded, "url")
    val meta = EncodePipeline.metadata(enc, docs.schema)
      .agg(sum("raw_bytes").as("raw_bytes"), sum("encoded_bytes").as("encoded_bytes"))
    val out = verify.crossJoin(meta)
      .select(col("rows"), col("mismatches"), col("raw_bytes"), col("encoded_bytes"),
        round(col("raw_bytes") / col("encoded_bytes"), 2).as("compression_ratio"))
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- codec round-trips (self-checking; oracle pins n_mismatch = 0) ----
    "q_bitpack_roundtrip" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      longRoundTrip(e, col("user_id"), expr("event_id DIV 4096"), Some("bitpack"))
    }),
    "q_delta_ts_roundtrip" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .select(unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      val rt = longRoundTrip(e, col("us"), expr("event_id DIV 4096"), Some("delta"))
      rt.crossJoin(e.agg(min(col("us")).as("min_us"), max(col("us")).as("max_us")))
    }),
    "q_for_roundtrip" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val rt = longRoundTrip(li, col("l_orderkey"), expr("(l_orderkey * 8 + l_linenumber) DIV 4096"), Some("for"))
      rt.crossJoin(li.agg(sum(col("l_orderkey")).cast("long").as("sum_key")))
    }),
    "q_rle_roundtrip" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      longRoundTrip(li, col("l_linenumber").cast("long"), expr("(l_orderkey * 8 + l_linenumber) DIV 4096"), Some("rle"))
    }),
    "q_dict_roundtrip" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val rt = strRoundTrip(d, col("lang"), expr("doc_id DIV 4096"), Some("dict"))
      rt.crossJoin(d.agg(countDistinct(col("lang")).cast("long").as("n_langs")))
    }),
    "q_fsst_roundtrip" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val rt = strRoundTrip(d, col("text"), expr("doc_id DIV 4096"), Some("fsst"))
      rt.crossJoin(d.agg(sum(octet_length(col("text"))).cast("long").as("total_bytes")))
    }),
    "q_prefix_roundtrip" -> ((s, dir) => {
      // front coding (Parquet DELTA_BYTE_ARRAY analog): sort_array gives the
      // sorted block shape the codec targets; oracle pins bit-identical
      // decode plus the total byte mass the lengths must reconstruct
      val d = tbl(s, dir, "documents")
      val rt = strRoundTrip(d, col("source"), expr("doc_id DIV 4096"), Some("prefix"))
      rt.crossJoin(d.agg(sum(octet_length(col("source"))).cast("long").as("total_bytes")))
    }),
    "q_auto_roundtrip" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val a = longRoundTrip(e, col("user_id"), expr("event_id DIV 4096"), None)
      val b = strRoundTrip(e, col("event_type"), expr("event_id DIV 4096"), None)
      a.select(col("n_rows").as("nr1"), col("n_mismatch").as("m1"))
        .crossJoin(b.select(col("n_rows").as("nr2"), col("n_mismatch").as("m2")))
        .select((col("nr1") + col("nr2")).as("n_values"), (col("m1") + col("m2")).as("n_mismatch"))
    }),
    "q_alp_roundtrip" -> ((s, dir) => {
      // ALP (decimal-scaled doubles): 2-decimal prices travel the long path
      // as IEEE bit patterns; the selector must pick alp UNFORCED on every
      // block with enough values to probe, and decode bit-exactly (the
      // n_mismatch pin). sum_cents re-derives the VALUES in DuckDB, so a
      // bit-faithful but value-corrupting codec cannot pass.
      val grp = expr("(l_orderkey * 8 + l_linenumber) DIV 4096")
      val li = tbl(s, dir, "lineitem")
        .select(double_bits(col("l_extendedprice")).as("bits"),
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val rt = longRoundTrip(li, col("bits"), grp, Some("alp"))
      val pick = li.groupBy(grp.as("g"))
        .agg(sort_array(collect_list(col("bits"))).as("vals"))
        .select(size(col("vals")).as("n"), blob_codec(encode_longs(col("vals"))).as("c"))
        .filter(col("n") >= 8) // sub-probe blocks legitimately fall back
        .agg(count(lit(1)).cast("long").as("n_blocks"),
          sum(when(col("c") === "alp", 1L).otherwise(0L)).cast("long").as("n_alp"))
      val agg = li.agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("sum_cents"))
      rt.crossJoin(pick).crossJoin(agg)
    }),
    "q_tzfor_roundtrip" -> ((s, dir) => {
      // TZ-FOR (common-trailing-zero shift): embeddings re-laid out
      // DIM-MAJOR — one block per (vector-range, dimension) — so each block
      // holds one dimension's float-upcast doubles: 29 zero mantissa bits
      // that FOR/delta can't see (sign-crossing bit patterns pin them at
      // width 64) and ALP rejects (float mantissas aren't decimal at e<=14)
      val em = tbl(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(expr("vec_id DIV 4096 * 256 + pos").as("g"),
          double_bits(col("col").cast("double")).as("bits"))
      val rt = longRoundTrip(em, col("bits"), col("g"), Some("tzfor"))
      val pick = em.groupBy(col("g"))
        .agg(sort_array(collect_list(col("bits"))).as("vals"))
        .select(size(col("vals")).as("n"), blob_codec(encode_longs(col("vals"))).as("c"))
        .filter(col("n") >= 8)
        .agg(count(lit(1)).cast("long").as("n_blocks"),
          sum(when(col("c") === "tzfor", 1L).otherwise(0L)).cast("long").as("n_tzfor"))
      rt.crossJoin(pick)
    }),

    // ---- analyzer / selector statistics (oracle-checked aggregations) ----
    "q_bitwidth_hist" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(bits_needed(col("user_id")).as("width"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("width"))
    }),
    "q_codec_stats" -> ((s, dir) => {
      tbl(s, dir, "events").agg(
        count(lit(1)).cast("long").as("n_rows"),
        min(col("user_id")).cast("long").as("min_user"),
        max(col("user_id")).cast("long").as("max_user"),
        countDistinct(col("user_id")).cast("long").as("ndv_user"),
        min(col("event_id")).cast("long").as("min_event"),
        max(col("event_id")).cast("long").as("max_event"))
    }),
    "q_run_count" -> ((s, dir) => {
      // scale-correct run counting: per-range-partition pass + boundary
      // stitch (TextOps.orderedRunCount) instead of a single-partition window
      TextOps.orderedRunCount(tbl(s, dir, "events"), "event_id", "event_type")
    }),
    "q_dict_viability" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val lang = d.agg(lit("lang").as("column_name"), count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col("lang")).cast("long").as("ndv"))
      val source = d.agg(lit("source").as("column_name"), count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col("source")).cast("long").as("ndv"))
      lang.unionAll(source).orderBy(col("column_name"))
    }),

    // ---- packed-word SWAR surface (oracle = plain modular arithmetic) ----
    "q_swar_arith" -> ((s, dir) => {
      val W = Seq(4, 8, 8)
      val li = tbl(s, dir, "lineitem").select(
        col("l_linenumber").cast("long").as("ln"),
        floor(col("l_quantity")).cast("long").as("qty"),
        floor(col("l_discount") * 100).cast("long").as("disc"))
      val packed = li.select(col("ln"), col("qty"), col("disc"),
        swar_pack(W, col("ln"), col("qty"), col("disc")).as("w"))
      val k = swar_pack(W, lit(3L), lit(200L), lit(7L))
      val k2 = swar_pack(W, lit(14L), lit(250L), lit(0L))
      val k3 = swar_pack(W, lit(9L), lit(60L), lit(1L))
      val k4 = swar_pack(W, lit(2L), lit(30L), lit(5L))
      // signed-op constants: raw lanes chosen so signed interpretations mix
      // positive, negative, and saturating outcomes across the data range
      // (ln ∈ [1,7], qty ∈ [1,50], disc ∈ [0,10])
      val k5 = swar_pack(W, lit(6L), lit(100L), lit(120L)) // sval (6, 100, 120)
      val k6 = swar_pack(W, lit(12L), lit(200L), lit(250L)) // sval (-4, -56, -6)
      val k7 = swar_pack(W, lit(3L), lit(25L), lit(5L))
      val k8 = swar_pack(W, lit(5L), lit(160L), lit(8L)) // sval (5, -96, 8)
      val k9 = swar_pack(W, lit(14L), lit(30L), lit(130L)) // sval (-2, 30, -126)
      val k10 = swar_pack(W, lit(12L), lit(220L), lit(250L))
      packed.select(
        (swar_get(swar_add_wrap(col("w"), k, W), W, 0) +
          swar_get(swar_add_wrap(col("w"), k, W), W, 1) +
          swar_get(swar_add_wrap(col("w"), k, W), W, 2)).as("aw"),
        (swar_get(swar_add_sat_u(col("w"), k2, W), W, 0) +
          swar_get(swar_add_sat_u(col("w"), k2, W), W, 1) +
          swar_get(swar_add_sat_u(col("w"), k2, W), W, 2)).as("as_"),
        (swar_get(swar_sub_wrap(col("w"), k3, W), W, 0) +
          swar_get(swar_sub_wrap(col("w"), k3, W), W, 1) +
          swar_get(swar_sub_wrap(col("w"), k3, W), W, 2)).as("sw"),
        (swar_get(swar_min_u(col("w"), k4, W), W, 0) +
          swar_get(swar_max_u(col("w"), k4, W), W, 1) +
          swar_get(swar_min_u(col("w"), k4, W), W, 2)).as("mm"),
        (swar_get(swar_shift_left(col("w"), W, 2), W, 0) +
          swar_get(swar_shift_left(col("w"), W, 2), W, 1) +
          swar_get(swar_shift_left(col("w"), W, 2), W, 2)).as("sh"),
        (swar_get(swar_slice(col("w"), W, 1, 3), Seq(8, 8), 0) +
          swar_get(swar_slice(col("w"), W, 1, 3), Seq(8, 8), 1)).as("sl"),
        (swar_get_signed(swar_add_sat_s(col("w"), k5, W), W, 0) +
          swar_get_signed(swar_add_sat_s(col("w"), k5, W), W, 1) +
          swar_get_signed(swar_add_sat_s(col("w"), k5, W), W, 2) +
          swar_get_signed(swar_add_sat_s(col("w"), k6, W), W, 0) +
          swar_get_signed(swar_add_sat_s(col("w"), k6, W), W, 1) +
          swar_get_signed(swar_add_sat_s(col("w"), k6, W), W, 2)).as("ass"),
        (swar_get(swar_sub_sat_u(col("w"), k7, W), W, 0) +
          swar_get(swar_sub_sat_u(col("w"), k7, W), W, 1) +
          swar_get(swar_sub_sat_u(col("w"), k7, W), W, 2)).as("ssu"),
        (swar_get_signed(swar_sub_sat_s(col("w"), k8, W), W, 0) +
          swar_get_signed(swar_sub_sat_s(col("w"), k8, W), W, 1) +
          swar_get_signed(swar_sub_sat_s(col("w"), k8, W), W, 2)).as("sss"),
        (swar_get_signed(swar_min_s(col("w"), k9, W), W, 0) +
          swar_get_signed(swar_max_s(col("w"), k9, W), W, 1) +
          swar_get_signed(swar_min_s(col("w"), k9, W), W, 2)).as("mms"),
        (swar_get_signed(swar_add_wrap(col("w"), k10, W), W, 0) +
          swar_get_signed(swar_add_wrap(col("w"), k10, W), W, 1) +
          swar_get_signed(swar_add_wrap(col("w"), k10, W), W, 2)).as("gs"),
        (swar_get(swar_shift_right_u(col("w"), W, 2), W, 0) +
          swar_get(swar_shift_right_u(col("w"), W, 2), W, 1) +
          swar_get(swar_shift_right_u(col("w"), W, 2), W, 2)).as("sr"))
        .agg(sum(col("aw")).cast("long").as("s_addwrap"),
          sum(col("as_")).cast("long").as("s_addsat"),
          sum(col("sw")).cast("long").as("s_subwrap"),
          sum(col("mm")).cast("long").as("s_minmax"),
          sum(col("sh")).cast("long").as("s_shift"),
          sum(col("sl")).cast("long").as("s_slice"),
          sum(col("ass")).cast("long").as("s_addsats"),
          sum(col("ssu")).cast("long").as("s_subsatu"),
          sum(col("sss")).cast("long").as("s_subsats"),
          sum(col("mms")).cast("long").as("s_minmaxs"),
          sum(col("gs")).cast("long").as("s_getsigned"),
          sum(col("sr")).cast("long").as("s_shiftr"))
    }),

    // ---- table pipeline metrics ----
    // oracle pins raw_bytes exactly (8 B/long, UTF-8 length/string) and
    // encoded < raw per column; codec choices live in q_codec_plan
    "q_compression_ratio" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val enc = EncodePipeline.encode(d, "doc_id", partitions = 8, blockSize = 1024)
      EncodePipeline.metadata(enc, d.schema)
        .groupBy(col("column").as("column_name")).agg(
          sum(col("raw_bytes")).cast("long").as("raw_bytes"),
          (sum(col("encoded_bytes")) < sum(col("raw_bytes"))).as("encoded_lt_raw"))
        .orderBy(col("column_name"))
    }),
    "q_page_compress" -> ((s, dir) => {
      // the transparent compressed-page layer (the Parquet encoding-vs-page-
      // compression separation; zstd default, legacy DEFLATE readable):
      // pipeline blobs carry an outermost page when it saves ≥1/16 of the
      // bytes; decode, views
      // and every zone kernel unwrap at entry. The oracle pins bit-identical
      // decode THROUGH the page layer (count/byte-mass/char-sum aggregates
      // of the decoded table against the raw parquet) plus that pages
      // actually engaged on the text column while still beating raw bytes.
      val d = tbl(s, dir, "documents")
      val enc = EncodePipeline.encode(d, "doc_id", partitions = 8, blockSize = 4096)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = enc.agg(
        (sum(when(blob_page(col("e_text")), 1L).otherwise(0L)) > 0L).as("page_used"),
        (sum(octet_length(col("e_text"))) < sum(col("r_text"))).as("enc_lt_raw"))
      val dec = EncodePipeline.decode(enc, d.schema)
      dec.agg(count(lit(1)).cast("long").as("n_rows"),
          sum(octet_length(col("text"))).cast("long").as("text_bytes"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .crossJoin(stats)
    }),
    "q_shared_dict" -> ((s, dir) => {
      // per-partition shared dictionaries end-to-end: documents'
      // low-cardinality source/lang columns encode against once-per-
      // partition dictionaries stored in the manifest side-structure
      // (outDir/dicts, content-addressed); blocks carry only rebased codes.
      // decodeShared resolves them via broadcast + the JVM registry; the
      // oracle checks the DECODED table, and shared_used pins that the
      // shared codec actually carried source blocks (the per-block size
      // competition reliably favors it for a 20-value dictionary).
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_sdict_q").toFile
      out.deleteOnExit()
      EncodePipeline.run(d, "doc_id", out.getAbsolutePath, partitions = 8,
        blockSize = 1024, sharedDictCols = Seq("source", "lang"))
      val sharedUsed = EncodePipeline.readData(s, out.getAbsolutePath)
        .agg((sum(when(blob_codec(col("e_source")).startsWith("shared"), 1L)
          .otherwise(0L)) > 0L).as("shared_used"))
      val dec = EncodePipeline.decodeShared(s, out.getAbsolutePath, d.schema)
      dec.groupBy(col("source")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("lang")).as("min_lang"),
          max(col("lang")).as("max_lang"))
        .crossJoin(broadcast(sharedUsed))
        .orderBy(col("source"))
    }),
    "q_stats_agg" -> ((s, dir) => {
      // SCAN-FREE aggregates (Iceberg "aggregate over manifests" parity):
      // encode documents with n_chars nulled on doc_id%7=0, then answer
      // count(*)/count(col)/nulls/min/max/sum per column ENTIRELY from the
      // manifest — tableStats opens zero data files (exact value_min/max/
      // sum/count columns written at encode time). The oracle recomputes
      // the same aggregates from the raw table; string columns report
      // counts only (manifest string bounds are truncated — not attained).
      val d = tbl(s, dir, "documents").withColumn("n_chars",
        when(pmod(col("doc_id"), lit(7)) === 0, lit(null).cast("long"))
          .otherwise(col("n_chars")))
      val out = java.nio.file.Files.createTempDirectory("graft_stats_q").toFile
      out.deleteOnExit()
      EncodePipeline.run(d, "doc_id", out.getAbsolutePath, partitions = 8, blockSize = 1024)
      EncodePipeline.tableStats(s, out.getAbsolutePath, d.schema)
        .select(col("column").as("column_name"), col("n_rows"), col("n_values"),
          col("n_nulls"), col("v_min"), col("v_max"), col("v_sum"))
        .orderBy(col("column_name"))
    }),
    "q_ndv" -> ((s, dir) => {
      // Manifest NDV sketches (Iceberg Puffin theta-sketch parity, at the
      // manifest grain): encode documents, then answer per-column distinct
      // counts from the manifest's KMV sketches ONLY — tableStats opens
      // zero data files. Low-cardinality columns stay below the sketch's
      // K=1024 → EXACT, pinned against DuckDB count(DISTINCT); columns
      // that may saturate K at scale pin the estimator's 10% accuracy
      // contract instead of the estimate; FSST text is unenumerable by
      // design (no metadata-time decompression) → NDV NULL, never a guess.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_ndv_q").toFile
      out.deleteOnExit()
      EncodePipeline.run(d, "doc_id", out.getAbsolutePath, partitions = 8, blockSize = 1024)
      val st = EncodePipeline.tableStats(s, out.getAbsolutePath, d.schema)
      val truth = d.agg(countDistinct(col("doc_id")).as("t_id"),
        countDistinct(col("n_chars")).as("t_nc")).head()
      val pinned = st.filter(col("column").isin("lang", "source", "text"))
        .select(col("column").as("column_name"), col("n_distinct").as("ndv"),
          col("distinct_exact").as("ndv_exact"))
      def estOk(name: String, t: Long) = st.filter(col("column") === name)
        .select(lit(name + "_est_ok").as("column_name"),
          when(abs(col("n_distinct") - t) * 10 <= t, 1L).otherwise(0L)
            .cast("long").as("ndv"),
          lit(null).cast("boolean").as("ndv_exact"))
      pinned.unionAll(estOk("doc_id", truth.getLong(0)))
        .unionAll(estOk("n_chars", truth.getLong(1)))
        .orderBy(col("column_name"))
    }),
    "q_analyze" -> ((s, dir) => {
      // ANALYZE TABLE end-to-end (Iceberg compute-table-stats parity):
      // encode documents in two commits, strip the manifest's stats/NDV
      // columns to simulate a table committed before the statistics era
      // (tableStats refuses such manifests rather than undercount), CALL
      // system.analyze to recompute them METADATA-ONLY, then serve exact
      // aggregates + NDV from the manifest alone (zero data files opened).
      // Pins: the pre-analyze refusal fired, the analyze generation appears
      // in the snapshot history under its own kind, the data files are
      // listed verbatim (byte-identical layout), and every recomputed stat
      // matches DuckDB recomputation from the raw table.
      val d = tbl(s, dir, "documents")
      val base = d.filter(pmod(col("doc_id"), lit(4)) < 3)
      val extra = d.filter(pmod(col("doc_id"), lit(4)) === 3)
      val wh = java.nio.file.Files.createTempDirectory("graft_analyze_q").toFile
      wh.deleteOnExit()
      val t = s"${wh.getAbsolutePath}/db/t"
      EncodePipeline.run(base, "doc_id", t, partitions = 8, blockSize = 1024)
      EncodePipeline.appendCommit(extra, "doc_id", t, 8, 1024, batchId = 1L)
      // strip the stats era in place (same surgery as the mixed-era specs)
      val metaPath = java.nio.file.Paths.get(s"$t/meta")
      val stripped = s.read.option("mergeSchema", "true").parquet(metaPath.toString)
        .drop("null_value_count", "value_min", "value_max", "value_sum",
          "value_count", "ndv_sketch").cache()
      stripped.count()
      val tmp = s"${wh.getAbsolutePath}/meta_tmp"
      stripped.write.parquet(tmp)
      stripped.unpersist()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(metaPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), metaPath)
      val refusedBefore =
        try { EncodePipeline.tableStats(s, t, d.schema).collect(); false }
        catch { case _: IllegalStateException => true }
      val filesBefore = EncodePipeline.currentFiles(s, t).toSet
      val cat = s"gana_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      s.sql(s"CALL $cat.system.analyze(table => 'db.t')").collect()
      val kindOk = EncodePipeline.snapshots(s, t).collect().last.getString(1) == "analyze"
      val filesOk = EncodePipeline.currentFiles(s, t).toSet == filesBefore
      val st = EncodePipeline.tableStats(s, t, d.schema).collect()
        .map(r => r.getString(0) -> r).toMap
      val id = st("doc_id"); val nc = st("n_chars"); val lg = st("lang")
      s.range(1).select(
        lit(id.getLong(1)).cast("long").as("n_rows"),
        lit(id.getLong(4)).cast("long").as("min_id"),
        lit(id.getLong(5)).cast("long").as("max_id"),
        lit(id.getLong(6)).cast("long").as("sum_id"),
        lit(nc.getLong(6)).cast("long").as("sum_chars"),
        lit(lg.getLong(7)).cast("long").as("ndv_lang"),
        lit(lg.getBoolean(8)).as("ndv_lang_exact"),
        lit(refusedBefore).as("refused_before"),
        lit(kindOk).as("kind_analyze"),
        lit(filesOk).as("files_unchanged"))
    }),
    "q_v2_scan" -> ((s, dir) => {
      // the DataSource V2 connector end-to-end, as SQL users consume the
      // engine: write via df.write.format("graft") (pipeline commit under
      // the hood), read via spark.read.format("graft") with a pushed
      // range filter (zone-map part pruning; residual-checked above the
      // scan), column pruning to the touched blobs, and a grouped
      // aggregate. The oracle recomputes from the raw table.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_v2_q").toFile
      out.deleteOnExit()
      val t = out.getAbsolutePath + "/t"
      d.write.format("graft").option("key", "doc_id")
        .option("partitions", "8").option("blockSize", "1024").save(t)
      s.read.format("graft").load(t)
        .filter(col("doc_id") >= 100L && col("lang") >= "a")
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .orderBy(col("lang"))
    }),
    "q_stream_sink" -> ((s, dir) => {
      // the NATIVE V2 STREAMING SINK end-to-end: a file-source stream over
      // the raw parquet table lands in a graft table via
      // writeStream.format("graft") — executor-side law-placed block
      // encoding, one atomic single-file manifest commit per epoch,
      // exactly-once by epochId — then the streamed table reads back
      // through the connector. Exactly-once is pinned by the aggregate
      // equality itself (a duplicated or dropped epoch changes
      // n_docs/sum_chars), and epochs_committed >= 1 pins that the rows
      // actually travelled the streaming commit path.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_ssink_q").toFile
      out.deleteOnExit()
      val t = out.getAbsolutePath + "/t"
      // the file stream source needs a DIRECTORY basePath; the testdata
      // table is a single file — stage it into one (repartitioned so the
      // stream sees several files, i.e. a real multi-epoch shape)
      val in = out.getAbsolutePath + "/in"
      d.repartition(4).write.parquet(in)
      val q = s.readStream.schema(d.schema).option("maxFilesPerTrigger", "2")
        .parquet(in)
        .writeStream.format("graft")
        .option("checkpointLocation", out.getAbsolutePath + "/ckpt")
        .start(t)
      q.processAllAvailable()
      q.stop()
      val epochs = s.read.option("mergeSchema", "true").parquet(t + "/meta")
        .select(col("batch_id")).distinct().count()
      s.read.format("graft").load(t)
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .withColumn("epochs_committed_ok", lit(epochs >= 1L))
        .orderBy(col("lang"))
    }),
    "q_v2_agg" -> ((s, dir) => {
      // manifest-served AGGREGATE PUSHDOWN pinned hard: after the table
      // commits, its data files are DELETED — the global aggregates below
      // still answer, because the connector's SupportsPushDownAggregates
      // serves them from the manifest through a LocalScan that plans zero
      // input partitions. Any silent regression to a real scan would error
      // on the missing files rather than pass with wrong provenance.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_v2agg_q").toFile
      out.deleteOnExit()
      val t = out.getAbsolutePath + "/t"
      d.write.format("graft").option("key", "doc_id")
        .option("partitions", "8").option("blockSize", "1024").save(t)
      def nuke(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(nuke)
        f.delete()
      }
      nuke(new java.io.File(t + "/data"))
      s.read.format("graft").load(t).agg(
        count(lit(1)).cast("long").as("n_rows"),
        count(col("n_chars")).cast("long").as("n_chars_vals"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        sum(col("doc_id")).cast("long").as("sum_id"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
    }),
    "q_sql_dml" -> ((s, dir) => {
      // the SQL DML lifecycle over CATALOG identifiers, as a warehouse user
      // drives it: df.write.format("graft") creates the table, INSERT INTO
      // lands a tracked append commit (V2→V1 write hook into the pipeline's
      // single-shuffle plan), DELETE FROM lands merge-on-read positional
      // vectors (sql_mor pins every data file byte-identical + the deletes/
      // side structure present — zero rewrite), and the final SELECT groups
      // through the connector's pushdown stack. Oracle replays the
      // insert+delete algebraically in DuckDB.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val wh = java.nio.file.Files.createTempDirectory("graft_sqldml_q").toFile
      wh.deleteOnExit()
      val cat = s"gsql_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      val tdir = s"${wh.getAbsolutePath}/dbq/docs"
      d.write.format("graft").option("key", "doc_id")
        .option("partitions", "8").option("blockSize", "1024").save(tdir)
      d.createOrReplaceTempView("sql_dml_src")
      s.sql(s"INSERT INTO $cat.dbq.docs " +
        "SELECT doc_id + 1000000, text, lang, source, n_chars " +
        "FROM sql_dml_src WHERE doc_id % 25 = 7")
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$tdir/data"))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(f => f.getAbsolutePath -> f.length()).toMap
      }
      val before = files()
      s.sql(s"DELETE FROM $cat.dbq.docs WHERE doc_id >= 100 AND doc_id < 300")
      val sqlMor = files() == before && new java.io.File(s"$tdir/deletes").exists()
      s.sql(s"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(min(doc_id) AS BIGINT) AS min_id, " +
          "CAST(max(doc_id) AS BIGINT) AS max_id " +
          s"FROM $cat.dbq.docs GROUP BY lang ORDER BY lang")
        .withColumn("sql_mor", lit(sqlMor))
    }),
    "q_ctas" -> ((s, dir) => {
      // SQL CREATE TABLE AS SELECT: the catalog is a StagingTableCatalog,
      // so CTAS encodes the query result into a brand-new pipeline table
      // (TBLPROPERTIES steer key/partitions/blockSize) and REPLACE TABLE
      // AS SELECT commits a REPLACING SNAPSHOT whose predecessor stays one
      // option("gen") away. time_travel_ok pins the pre-replace generation
      // still reading the full original rowset; the final SELECT groups
      // through the connector. Oracle replays CTAS + REPLACE in DuckDB.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 6)
      val wh = java.nio.file.Files.createTempDirectory("graft_ctas_q").toFile
      wh.deleteOnExit()
      val cat = s"gsql_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      d.createOrReplaceTempView("ctas_src_q")
      s.sql(s"CREATE TABLE $cat.dbq.ct TBLPROPERTIES('key'='doc_id', " +
        "'partitions'='8', 'blockSize'='1024') " +
        "AS SELECT doc_id, lang, n_chars FROM ctas_src_q")
      val tdir = s"${wh.getAbsolutePath}/dbq/ct"
      val genBefore = EncodePipeline.snapshots(s, tdir)
        .agg(max(col("gen"))).head().getInt(0)
      s.sql(s"REPLACE TABLE $cat.dbq.ct " +
        "AS SELECT doc_id, lang, n_chars FROM ctas_src_q WHERE doc_id % 2 = 0")
      val travelOk = s.read.format("graft").option("gen", genBefore.toString)
        .load(tdir).count() == d.count()
      s.sql(s"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(min(doc_id) AS BIGINT) AS min_id, " +
          "CAST(max(doc_id) AS BIGINT) AS max_id " +
          s"FROM $cat.dbq.ct GROUP BY lang ORDER BY lang")
        .withColumn("time_travel_ok", lit(travelOk))
    }),
    "q_asof" -> ((s, dir) => {
      // SQL time travel: VERSION AS OF pins a generation (or an Iceberg-
      // style named tag), TIMESTAMP AS OF resolves a wall-clock instant
      // against the manifest files' own commit times (every commit is one
      // atomic manifest append — its file mtime IS the snapshot instant,
      // derived retroactively with zero write-path changes). An instant
      // captured between two commits must see exactly the first.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 7)
      val wh = java.nio.file.Files.createTempDirectory("graft_asof_q").toFile
      wh.deleteOnExit()
      val cat = s"gsql_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      val path = s"${wh.getAbsolutePath}/dbq/tt"
      EncodePipeline.run(d.filter(col("doc_id") % 3 === 1), "doc_id", path,
        partitions = 8, blockSize = 1024) // gen 0
      val tMid = System.currentTimeMillis()
      Thread.sleep(30) // separate the commits' manifest mtimes
      EncodePipeline.appendCommit(d.filter(col("doc_id") % 3 =!= 1), "doc_id",
        path, partitions = 8, blockSize = 1024, batchId = 1L) // gen 1
      EncodePipeline.createTag(s, path, "first", gen = 0)
      def one(q: String): Long = s.sql(q).head().getLong(0)
      val nV0 = one(s"SELECT count(*) FROM $cat.dbq.tt VERSION AS OF 0")
      val nTag = one(s"SELECT count(*) FROM $cat.dbq.tt VERSION AS OF 'first'")
      val nTs = one(s"SELECT count(*) FROM $cat.dbq.tt " +
        s"TIMESTAMP AS OF timestamp_millis(${tMid}L)")
      val tsOk = s.sql(s"SELECT * FROM $cat.dbq.tt.snapshots ORDER BY gen")
        .select("committed_at").collect().map(_.getTimestamp(0))
        .sliding(2).forall(w => w.forall(_ != null) &&
          (w.length < 2 || !w(0).after(w(1))))
      s.sql("SELECT CAST(count(*) AS BIGINT) AS n_cur, " +
          s"CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM $cat.dbq.tt")
        .withColumn("n_v0", lit(nV0).cast("long"))
        .withColumn("n_tag", lit(nTag).cast("long"))
        .withColumn("n_ts", lit(nTs).cast("long"))
        .withColumn("ts_ordered", lit(tsOk))
    }),
    "q_spj" -> ((s, dir) => {
      // STORAGE-PARTITIONED JOIN end-to-end: two tables written under the
      // same placement spec (hash(doc_id) into 8 parts) join through the
      // SQL catalog with ZERO shuffles — the scan reports
      // KeyGroupedPartitioning over the name-encoded placement transform,
      // GraftCatalog's FunctionCatalog resolves it, and Spark lines the
      // co-part files up directly (the Iceberg bucket-join pattern; at
      // 100 TB this is the difference between a fleet-wide exchange and
      // none). `spj` pins the executed join plan shuffle-free; the oracle
      // recomputes the join algebra in DuckDB.
      val d = tbl(s, dir, "documents")
      val wh = java.nio.file.Files.createTempDirectory("graft_spj_q").toFile
      wh.deleteOnExit()
      val cat = s"gspj_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      EncodePipeline.run(d, "doc_id", s"${wh.getAbsolutePath}/db/a",
        partitions = 8, blockSize = 1024)
      EncodePipeline.run(
        d.filter(col("doc_id") % 3 === 0).withColumn("n_chars", col("n_chars") + 11L),
        "doc_id", s"${wh.getAbsolutePath}/db/b", partitions = 8, blockSize = 1024)
      val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set(keys(0), "true"); s.conf.set(keys(1), "-1"); s.conf.set(keys(2), "false")
      try {
        val j = s.sql(s"SELECT a.lang, a.n_chars AS ca, b.n_chars AS cb " +
          s"FROM $cat.db.a a JOIN $cat.db.b b ON a.doc_id = b.doc_id")
        val spj = j.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }.isEmpty
        j.groupBy(col("lang")).agg(
            count(lit(1)).cast("long").as("n_join"),
            sum(col("cb") - col("ca")).cast("long").as("sum_delta"))
          .withColumn("spj", lit(spj))
          .orderBy(col("lang"))
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),
    "q_sql_update" -> ((s, dir) => {
      // SQL UPDATE via the delta row-level path: the predicate is NOT
      // source-filter-translatable, so Spark rewrites through
      // GraftRowLevelOperation — originals land in positional delete
      // vectors, updated versions re-encode as law-placed block files,
      // ZERO existing data bytes rewritten (`mor` pins pre-existing files
      // byte-identical + the deletes/ side structure present). The oracle
      // replays the update algebraically in DuckDB.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val wh = java.nio.file.Files.createTempDirectory("graft_sqlupd_q").toFile
      wh.deleteOnExit()
      val cat = s"gupd_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      val tdir = s"${wh.getAbsolutePath}/dbu/docs"
      EncodePipeline.run(d, "doc_id", tdir, partitions = 8, blockSize = 1024)
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$tdir/data"))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(f => f.getAbsolutePath -> f.length()).toMap
      }
      val before = files()
      s.sql(s"UPDATE $cat.dbu.docs SET lang = concat(lang, '!'), " +
        "n_chars = n_chars + 1000 WHERE length(text) % 2 = 0")
      val after = files()
      val mor = before.forall { case (p, n) => after.get(p).contains(n) } &&
        new java.io.File(s"$tdir/deletes").exists()
      s.sql(s"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
          s"FROM $cat.dbu.docs GROUP BY lang ORDER BY lang")
        .withColumn("mor", lit(mor))
    }),
    "q_sql_merge" -> ((s, dir) => {
      // SQL MERGE INTO via the delta row-level path (the SQL twin of
      // q_merge's DataFrame API): matched rows update (vector-delete +
      // law-placed re-insert), unmatched rows insert as fresh block files.
      // The oracle recomputes the merged table in DuckDB.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val wh = java.nio.file.Files.createTempDirectory("graft_sqlmrg_q").toFile
      wh.deleteOnExit()
      val cat = s"gmrg_${catalogSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", wh.getAbsolutePath)
      val tdir = s"${wh.getAbsolutePath}/dbm/docs"
      EncodePipeline.run(d, "doc_id", tdir, partitions = 8, blockSize = 1024)
      val repl = d.filter(col("doc_id") % 10 === 3)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 500L)
      val ins = d.filter(col("doc_id") % 25 === 7)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      repl.unionByName(ins).createOrReplaceTempView("sql_merge_src")
      s.sql(s"MERGE INTO $cat.dbm.docs t USING sql_merge_src s " +
        "ON t.doc_id = s.doc_id " +
        "WHEN MATCHED THEN UPDATE SET lang = s.lang, n_chars = s.n_chars " +
        "WHEN NOT MATCHED THEN INSERT *")
      s.sql(s"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        s"FROM $cat.dbm.docs GROUP BY lang ORDER BY lang")
    }),
    "q_runtime_filter" -> ((s, dir) => {
      // RUNTIME FILTERING (dynamic part pruning): the fact table is written
      // range-partitioned on doc_id, the dim side's selective filter only
      // materializes at execution — Spark hands the dim's join-key values
      // back to the scan (SupportsRuntimeFiltering), and the manifest's
      // attained zone maps drop whole part directories that plan-time
      // pushdown could not touch. At fleet scale this is the dim→fact join
      // reading 4 parts instead of the table. `pruned` pins (via the scan's
      // probe) that parts were actually dropped at runtime; the oracle
      // replays the join in DuckDB.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_rf_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath + "/t"
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 256,
        customPart = Some(least(floor(col("doc_id") / lit(64)), lit(7)).cast("int")))
      val fact = s.read.format("graft").load(path)
      val dim = d.select(col("doc_id").as("k"))
        .filter(pmod(col("k"), lit(25)) === 7 && col("k") < 100)
      // at sf-test scale the dim side's byte estimate rivals the fact's, so
      // the default cost heuristic (fallback ratio 0.5) sees no benefit;
      // raise the assumed selectivity for this query's own execution window
      // (restored below) — at fleet scale the default heuristic fires on its
      // own because the fact dwarfs any dim
      val ratioKey = "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
      val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
      val saved = Seq(ratioKey, statsKey).map(k => k -> s.conf.getOption(k))
      s.conf.set(ratioKey, "1000"); s.conf.set(statsKey, "false")
      val row =
        try fact.join(dim, fact("doc_id") === dim("k"))
          .agg(count(lit(1)).cast("long").as("n_join"),
               sum(col("n_chars")).cast("long").as("sum_chars"))
          .head()
        finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      val pruned = graft.sources.GraftScan.runtimeFilterProbe.getOrDefault(path, 0)
      s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(row.getLong(0), row.getLong(1), pruned > 0)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_join",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("sum_chars",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("pruned",
            org.apache.spark.sql.types.BooleanType, nullable = false))))
    }),
    "q_compact" -> ((s, dir) => {
      // table-format maintenance end-to-end: write fragmented (under-filled
      // 16-value blocks), COMPACT to full 2048-value blocks (generation-
      // superseding manifest append), VACUUM the superseded files, decode
      // through the generation-resolved readers. The oracle checks the
      // decoded table; `compacted` pins that the rewrite actually ran
      // (all 8 parts), shrank the block count, and reclaimed files.
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_compact_q").toFile
      out.deleteOnExit()
      EncodePipeline.run(d, "doc_id", out.getAbsolutePath, partitions = 8, blockSize = 16)
      val blocksBefore = EncodePipeline.readData(s, out.getAbsolutePath).count()
      val nCompacted = EncodePipeline.compact(s, out.getAbsolutePath, d.schema, blockSize = 2048).size
      val blocksAfter = EncodePipeline.readData(s, out.getAbsolutePath).count()
      val removed = EncodePipeline.vacuum(s, out.getAbsolutePath)
      EncodePipeline.decodeShared(s, out.getAbsolutePath, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(nCompacted == 8 && blocksAfter < blocksBefore && removed > 0).as("compacted"))
    }),
    "q_binpack" -> ((s, dir) => {
      // file-subset maintenance: a well-packed base commit plus three tiny
      // streaming-shaped appends; compactSmallFiles packs ONLY the tiny
      // commits — the oracle checks the decoded union, `packed` pins that
      // every part packed, files were reclaimed, and the base generation's
      // files stayed byte-untouched on disk
      val d = tbl(s, dir, "documents")
      val out = java.nio.file.Files.createTempDirectory("graft_binpack_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      // scale-relative small threshold: appends land ~n/32 rows/part
      // (< n/16), the base ~5n/32 (>= n/16), at any fixture size
      val bs = math.max(4, (d.count() / 16).toInt)
      EncodePipeline.run(d.filter(col("doc_id") % 8 < 5), "doc_id", path,
        partitions = 4, blockSize = bs)
      def files(): Map[Int, Set[String]] = {
        val dd = new java.io.File(s"$path/data")
        dd.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__part="))
          .map(f => f.getName.stripPrefix("__part=").toInt ->
            f.listFiles().filter(x => x.isFile && x.getName.endsWith(".parquet") &&
              !x.getName.startsWith(".")).map(_.getName).toSet).toMap
      }
      val baseFiles = files()
      (5 to 7).foreach { r =>
        EncodePipeline.appendCommit(d.filter(col("doc_id") % 8 === r), "doc_id",
          path, 4, bs, batchId = r.toLong)
      }
      val nPacked = EncodePipeline.compactSmallFiles(s, path, d.schema, blockSize = bs).size
      val removed = EncodePipeline.vacuum(s, path)
      val after = files()
      val baseKept = baseFiles.forall { case (p, fs) => fs.subsetOf(after(p)) }
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(nPacked == 4 && removed > 0 && baseKept).as("packed"))
    }),
    "q_delete" -> ((s, dir) => {
      // copy-on-write row-level DELETE end-to-end: encode documents, DELETE
      // a slice under a predicate with a NULL region (doc_id%11==0 rows get
      // a NULL pred and must SURVIVE — SQL DELETE three-valued logic),
      // vacuum the superseded generation, decode through the generation-
      // resolved readers. The oracle recomputes the survivors in DuckDB;
      // n_deleted pins the return count, tt_ok pins that pre-delete time
      // travel saw the full table and vacuum reclaimed files.
      // pmod-sampled ~1/8 subset: identical DML semantics without paying
      // five full-table encodes per correctness sweep (q_null_roundtrip's
      // pattern); the oracle applies the same doc_id % 8 = 3 filter
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_delete_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      val nAll = d.count()
      val pred = when(col("doc_id") % 11 === 0, lit(null).cast("boolean"))
        .otherwise(col("doc_id") % 7 === 2)
      val nDel = EncodePipeline.deleteWhere(s, path, d.schema, "doc_id", pred,
        blockSize = 1024)
      val ttRows = EncodePipeline.decode(
        EncodePipeline.readDataAt(s, path, 0), d.schema).count()
      val removed = EncodePipeline.vacuum(s, path)
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(nDel).cast("long").as("n_deleted"),
        lit(ttRows == nAll && removed > 0).as("tt_ok"))
    }),
    "q_update_lazy" -> ((s, dir) => {
      // merge-on-read row-level UPDATE end-to-end: updated versions of the
      // matching rows (doc_id%17==0 gets a NULL pred and stays unchanged —
      // 3VL) land as a tracked append, originals become position-delete
      // vectors; zero_rewrite pins every PRE-EXISTING data file
      // byte-identical. Oracle recomputes the updated table in DuckDB.
      // pmod-sampled ~1/8 subset: identical DML semantics without paying
      // five full-table encodes per correctness sweep (q_null_roundtrip's
      // pattern); the oracle applies the same doc_id % 8 = 3 filter
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_morupd_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$path/data"))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(f => f.getAbsolutePath -> f.length()).toMap
      }
      val before = files()
      val pred = when(col("doc_id") % 17 === 0, lit(null).cast("boolean"))
        .otherwise(col("doc_id") % 5 === 2)
      def metaFiles(): Set[String] = new java.io.File(s"$path/meta").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(_.getName).toSet
      val metaBefore = metaFiles()
      val nUpd = EncodePipeline.updateWhereLazy(s, path, d.schema, "doc_id", pred,
        Map("lang" -> lit("yy"), "n_chars" -> (col("n_chars") + 250L)),
        partitions = 8, blockSize = 1024)
      val after = files()
      val zeroRewrite = before.forall { case (f, len) => after.get(f).contains(len) }
      // atomic snapshot: the insert batch's manifest rows AND the delete
      // marker land in exactly ONE new manifest file (one atomic rename)
      val atomicCommit = (metaFiles() -- metaBefore).size == 1
      EncodePipeline.decodeShared(s, path, d.schema)
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .withColumn("n_updated", lit(nUpd).cast("long"))
        .withColumn("zero_rewrite", lit(zeroRewrite))
        .withColumn("atomic_commit", lit(atomicCommit))
        .orderBy(col("lang"))
    }),
    "q_merge" -> ((s, dir) => {
      // MERGE INTO by key (upsert) end-to-end: doc_id%10==3 rows are
      // REPLACED (lang→'xx', n_chars+500), doc_id%25==7 rows re-key to
      // doc_id+1000000 and INSERT as a tracked batch append. The oracle
      // recomputes the merged table in DuckDB; n_replaced/n_inserted pin
      // the returned counts.
      // pmod-sampled ~1/8 subset: identical DML semantics without paying
      // five full-table encodes per correctness sweep (q_null_roundtrip's
      // pattern); the oracle applies the same doc_id % 8 = 3 filter
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_merge_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      val repl = d.filter(col("doc_id") % 10 === 3)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 500L)
      val ins = d.filter(col("doc_id") % 25 === 7)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val (nRep, nIns) = EncodePipeline.mergeByKey(s, path, d.schema, "doc_id",
        repl.unionByName(ins), partitions = 8, blockSize = 1024)
      EncodePipeline.decodeShared(s, path, d.schema)
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .withColumn("n_replaced", lit(nRep).cast("long"))
        .withColumn("n_inserted", lit(nIns).cast("long"))
        .orderBy(col("lang"))
    }),
    "q_merge_lazy" -> ((s, dir) => {
      // merge-on-read MERGE (upsert) end-to-end: the SAME merge as q_merge
      // but zero-rewrite — matched originals become position-delete
      // vectors, every update row appends, both in ONE atomic snapshot.
      // zero_rewrite pins every pre-existing data file byte-identical;
      // atomic_commit pins the single-manifest-file snapshot; the oracle
      // recomputes the merged table in DuckDB (same SQL as q_merge).
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_mergelazy_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$path/data"))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(f => f.getAbsolutePath -> f.length()).toMap
      }
      def metaFiles(): Set[String] = new java.io.File(s"$path/meta").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(_.getName).toSet
      val before = files()
      val metaBefore = metaFiles()
      val repl = d.filter(col("doc_id") % 10 === 3)
        .withColumn("lang", lit("xx"))
        .withColumn("n_chars", col("n_chars") + 500L)
      val ins = d.filter(col("doc_id") % 25 === 7)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val (nRep, nIns) = EncodePipeline.mergeByKeyLazy(s, path, d.schema, "doc_id",
        repl.unionByName(ins), partitions = 8, blockSize = 1024)
      val after = files()
      val zeroRewrite = before.forall { case (f, len) => after.get(f).contains(len) }
      val atomicCommit = (metaFiles() -- metaBefore).size == 1
      EncodePipeline.decodeShared(s, path, d.schema)
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .withColumn("n_replaced", lit(nRep).cast("long"))
        .withColumn("n_inserted", lit(nIns).cast("long"))
        .withColumn("zero_rewrite", lit(zeroRewrite))
        .withColumn("atomic_commit", lit(atomicCommit))
        .orderBy(col("lang"))
    }),
    "q_delete_lazy" -> ((s, dir) => {
      // merge-on-read row-level DELETE end-to-end: position-delete bitmaps
      // land in the deletes/ side structure with ZERO data bytes rewritten
      // (zero_rewrite pins every data file byte-identical), scans apply
      // them, and materializeDeletes folds them into a copy-on-write
      // rewrite that decodes to the same table (mat_ok pins fold count,
      // side-structure removal, and post-fold equality). NULL pred keeps
      // (doc_id%9==0 region). Oracle recomputes survivors in DuckDB.
      // pmod-sampled ~1/8 subset: identical DML semantics without paying
      // five full-table encodes per correctness sweep (q_null_roundtrip's
      // pattern); the oracle applies the same doc_id % 8 = 3 filter
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_mor_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$path/data"))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(f => f.getAbsolutePath -> f.length()).toMap
      }
      val before = files()
      val pred = when(col("doc_id") % 9 === 0, lit(null).cast("boolean"))
        .otherwise(col("doc_id") % 6 === 3)
      val nDel = EncodePipeline.deleteWhereLazy(s, path, d.schema, pred)
      val zeroRewrite = files() == before
      val morRows = EncodePipeline.decodeShared(s, path, d.schema).count()
      val folded = EncodePipeline.materializeDeletes(s, path, d.schema, "doc_id",
        blockSize = 1024)
      val matOk = folded == nDel && !new java.io.File(s"$path/deletes").exists() &&
        EncodePipeline.decodeShared(s, path, d.schema).count() == morRows
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(nDel).cast("long").as("n_deleted"),
        lit(zeroRewrite).as("zero_rewrite"),
        lit(matOk).as("mat_ok"))
    }),
    "q_rollback" -> ((s, dir) => {
      // snapshot rollback end-to-end (Iceberg rollback-to-snapshot): encode,
      // COW-update (gen 1), MOR-delete (gen 2), then roll back to 1 (undoes
      // the delete — vectors abandoned by the marker, zero bytes moved) and
      // to 0 (undoes the update — old files re-listed). rb1_ok pins the
      // intermediate state, vacuumed pins history expiry, and the final
      // aggregate must equal the ORIGINAL table — the DuckDB oracle
      // recomputes it from the raw parquet untouched by any DML.
      // pmod-sampled ~1/8 subset (q_null_roundtrip's pattern).
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 6)
      val out = java.nio.file.Files.createTempDirectory("graft_rollback_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      val predU = col("doc_id") % 5 === 4
      val nUpd = EncodePipeline.updateWhere(s, path, d.schema, "doc_id", predU,
        Map("lang" -> lit("rr"), "n_chars" -> (col("n_chars") + 100L)),
        blockSize = 1024) // gen 1 (copy-on-write)
      val nDel = EncodePipeline.deleteWhereLazy(s, path, d.schema,
        col("doc_id") % 7 === 1) // gen 2 (merge-on-read vectors)
      def state(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("n_chars")),
          count(when(col("lang") === "rr", 1))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val updatedExp = d
        .withColumn("lang", when(predU, lit("rr")).otherwise(col("lang")))
        .withColumn("n_chars",
          when(predU, col("n_chars") + 100L).otherwise(col("n_chars")))
      EncodePipeline.rollbackTo(s, path, 1) // undo the delete only
      val rb1Ok = state(EncodePipeline.decodeShared(s, path, d.schema)) ==
        state(updatedExp)
      EncodePipeline.rollbackTo(s, path, 0) // undo everything
      val vacuumed = EncodePipeline.vacuum(s, path) > 0
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(nUpd).cast("long").as("n_updated"),
        lit(nDel).cast("long").as("n_deleted"),
        lit(rb1Ok).as("rb1_ok"),
        lit(vacuumed).as("vacuumed"))
    }),
    "q_wap" -> ((s, dir) => {
      // write-audit-publish end-to-end (Iceberg branch refs + fast-forward):
      // the even half of a pmod-sampled subset is the base table; branch
      // "audit" stages the odd half as commits INVISIBLE to main readers
      // (hidden_ok), the audit read sees main + staged (branch_ok), then
      // fastForward publishes atomically — one marker row, zero data bytes.
      // travel_ok pins time travel below the marker (the branch stays
      // hidden in history). The final aggregate over the published table
      // must equal the FULL subset — the DuckDB oracle recomputes it from
      // the raw parquet untouched by any branch machinery.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(16)) === 9)
      val base = d.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
      val staged = d.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1)
      val out = java.nio.file.Files.createTempDirectory("graft_wap_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(base, "doc_id", path, partitions = 8, blockSize = 1024)
      EncodePipeline.createBranch(s, path, "audit")
      EncodePipeline.appendToBranch(staged, "doc_id", path, 8, "audit",
        blockSize = 1024, batchId = 1L)
      val nBase = base.count()
      val hiddenOk = // staged commits invisible to main readers
        EncodePipeline.decodeShared(s, path, d.schema).count() == nBase
      val branchOk = // the audit read sees main + staged
        s.read.format("graft").option("branch", "audit").load(path)
          .count() == d.count()
      val pubGen = EncodePipeline.fastForward(s, path, "audit")
      val travelOk = // below the marker the branch stays hidden
        s.read.format("graft").option("gen", (pubGen - 1).toString).load(path)
          .count() == nBase
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(hiddenOk).as("hidden_ok"),
        lit(branchOk).as("branch_ok"),
        lit(travelOk).as("travel_ok"))
    }),
    "q_cdc" -> ((s, dir) => {
      // change-data-capture end-to-end: base table (gen 0), append a batch
      // (gen 1 — every commit is its own snapshot), MOR-delete (gen 2),
      // then readChangesBetween(0, 2) must emit exactly the NET changes:
      // inserts = the appended rows not deleted inside the window, deletes
      // = base rows the window's vectors masked. fast_ok pins that the
      // append/MOR window took the file-delta fast path (no Except in the
      // optimized plan — only the added files and vector-hit blocks are
      // read). The oracle recomputes both sides from the raw parquet.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 2)
      val out = java.nio.file.Files.createTempDirectory("graft_cdc_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      val base = d.filter(col("doc_id") % 3 =!= 0)
      val added = d.filter(col("doc_id") % 3 === 0)
      EncodePipeline.run(base, "doc_id", path, partitions = 8, blockSize = 1024)
      EncodePipeline.appendCommit(added, "doc_id", path, partitions = 8,
        blockSize = 1024, batchId = 1L) // gen 1
      EncodePipeline.deleteWhereLazy(s, path, d.schema,
        col("doc_id") % 10 === 4) // gen 2
      val ch = EncodePipeline.readChangesBetween(s, path, d.schema, 0, 2)
      val fastOk = !ch.queryExecution.optimizedPlan.toString.contains("Except")
      ch.agg(
        sum(when(col("_change_type") === "insert", 1).otherwise(0))
          .cast("long").as("n_ins"),
        sum(when(col("_change_type") === "delete", 1).otherwise(0))
          .cast("long").as("n_del"),
        sum(when(col("_change_type") === "insert", col("n_chars")))
          .cast("long").as("ins_chars"),
        sum(when(col("_change_type") === "delete", col("n_chars")))
          .cast("long").as("del_chars"),
        sum(when(col("_change_type") === "insert", col("doc_id")))
          .cast("long").as("ins_ids"),
        sum(when(col("_change_type") === "delete", col("doc_id")))
          .cast("long").as("del_ids"),
        lit(fastOk).as("fast_ok"))
    }),
    "q_cdc_stream" -> ((s, dir) => {
      // the STREAMING CHANGE FEED end-to-end (Delta CDF parity):
      // readStream.format("graft").option("readChangeFeed") over a table
      // that commits base (gen 0) + append (gen 1) before the stream
      // starts and a MOR delete (gen 2) mid-stream. startingGen 0 replays
      // the full history as inserts in the first window; the delete's
      // window then streams the newly-masked rows as _change_type=delete
      // with their pre-delete values — each planned at file grain
      // (window-added files + vector-diff blocks only). exactly_once pins
      // that no (doc_id, change) pair streams twice across windows.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 6)
      val out = java.nio.file.Files.createTempDirectory("graft_cdcs_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath + "/t"
      val base = d.filter(col("doc_id") % 3 =!= 0)
      val added = d.filter(col("doc_id") % 3 === 0)
      EncodePipeline.run(base, "doc_id", path, partitions = 8, blockSize = 1024)
      EncodePipeline.appendCommit(added, "doc_id", path, partitions = 8,
        blockSize = 1024, batchId = 1L) // gen 1
      val q = s.readStream.format("graft")
        .option("readChangeFeed", "true").option("startingGen", "0").load(path)
        .writeStream.format("memory").queryName("graft_cdcs_q")
        .option("checkpointLocation", out.getAbsolutePath + "/ckpt")
        .outputMode("append").start()
      try {
        q.processAllAvailable() // window (-1, 1]: full history as inserts
        EncodePipeline.deleteWhereLazy(s, path, d.schema,
          col("doc_id") % 10 === 4) // gen 2
        q.processAllAvailable() // window (1, 2]: the masked rows as deletes
      } finally q.stop()
      val ch = s.table("graft_cdcs_q")
      val once = ch.select(col("doc_id"), col("_change_type")).distinct().count() ==
        ch.count()
      ch.agg(
        sum(when(col("_change_type") === "insert", 1).otherwise(0))
          .cast("long").as("n_ins"),
        sum(when(col("_change_type") === "delete", 1).otherwise(0))
          .cast("long").as("n_del"),
        sum(when(col("_change_type") === "insert", col("n_chars")))
          .cast("long").as("ins_chars"),
        sum(when(col("_change_type") === "delete", col("n_chars")))
          .cast("long").as("del_chars"),
        sum(when(col("_change_type") === "insert", col("doc_id")))
          .cast("long").as("ins_ids"),
        sum(when(col("_change_type") === "delete", col("doc_id")))
          .cast("long").as("del_ids"),
        lit(once).as("exactly_once"))
    }),
    "q_stream_throttle" -> ((s, dir) => {
      // streaming ADMISSION CONTROL end-to-end (Delta rate-limit parity):
      // a change-feed history replay over base + 2 appends, paced at ONE
      // generation window per micro-batch (maxGensPerTrigger=1) under
      // Trigger.AvailableNow — the bounded-backfill shape: the stream
      // drains the pinned target across >= 3 paced batches and TERMINATES
      // on its own. paced_ok pins >= 3 non-empty batches (an uncapped
      // source replays everything in one); exactly_once pins no row
      // streaming twice across the paced windows.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 5)
      val out = java.nio.file.Files.createTempDirectory("graft_thr_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath + "/t"
      EncodePipeline.run(d.filter(col("doc_id") % 3 === 1), "doc_id", path,
        partitions = 8, blockSize = 1024) // gen 0
      EncodePipeline.appendCommit(d.filter(col("doc_id") % 3 === 2), "doc_id",
        path, partitions = 8, blockSize = 1024, batchId = 1L) // gen 1
      EncodePipeline.appendCommit(d.filter(col("doc_id") % 3 === 0), "doc_id",
        path, partitions = 8, blockSize = 1024, batchId = 2L) // gen 2
      val q = s.readStream.format("graft")
        .option("readChangeFeed", "true").option("startingGen", "0")
        .option("maxGensPerTrigger", "1").load(path)
        .writeStream.format("memory").queryName("graft_thr_q")
        .option("checkpointLocation", out.getAbsolutePath + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      val terminated = q.awaitTermination(180000L)
      val paced = q.recentProgress.count(_.numInputRows > 0) >= 3
      q.stop()
      val t = s.table("graft_thr_q")
      val once = t.select("doc_id").distinct().count() == t.count()
      t.agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("doc_id")).cast("long").as("sum_ids"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        lit(terminated).as("terminated"),
        lit(paced).as("paced_ok"),
        lit(once).as("exactly_once"))
    }),
    "q_history" -> ((s, dir) => {
      // snapshot-history metadata surface: a base run, a tracked append,
      // and an atomic MOR update produce three generations whose kinds and
      // per-commit row counts snapshots() reports; DuckDB re-derives every
      // count from the same pmod splits. (Iceberg history/snapshots
      // metadata-table parity.)
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 4)
      val out = java.nio.file.Files.createTempDirectory("graft_hist_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      val base = d.filter(col("doc_id") % 16 === 4)
      val added = d.filter(col("doc_id") % 16 === 12)
      EncodePipeline.run(base, "doc_id", path, partitions = 8, blockSize = 1024)
      EncodePipeline.appendCommit(added, "doc_id", path, partitions = 8,
        blockSize = 1024, batchId = 3L)
      EncodePipeline.updateWhereLazy(s, path, d.schema, "doc_id",
        col("doc_id") % 5 === 1, Map("lang" -> lit("hh")),
        partitions = 8, blockSize = 1024)
      EncodePipeline.snapshots(s, path)
        .select(col("gen"), col("kind"), col("n_rows"))
    }),
    "q_overwrite" -> ((s, dir) => {
      // INSERT OVERWRITE as a snapshot (replaceCommit): base table (gen 0),
      // overwrite with a disjoint transformed slice (gen 1 — REPLACING, zero
      // old bytes touched). Current reads see only the new contents, time
      // travel below the overwrite sees the base, and rollbackTo(0) restores
      // it metadata-only; kind_ok pins the snapshots() classification. The
      // oracle recomputes every aggregate from the raw parquet.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 7)
      val out = java.nio.file.Files.createTempDirectory("graft_ow_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      val base = d.filter(col("doc_id") % 3 =!= 0)
      val neu = d.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
      EncodePipeline.run(base, "doc_id", path, partitions = 8, blockSize = 1024)
      EncodePipeline.replaceCommit(neu, "doc_id", path, partitions = 8,
        blockSize = 1024) // gen 1
      val cur = EncodePipeline.decodeShared(s, path, d.schema)
        .agg(count(lit(1)).cast("long"), sum(col("n_chars")).cast("long")).head()
      val old = EncodePipeline.decodeSharedAt(s, path, d.schema, 0)
        .agg(count(lit(1)).cast("long"), sum(col("n_chars")).cast("long")).head()
      val kindOk = EncodePipeline.snapshots(s, path)
        .filter(col("gen") === 1).head().getString(1) == "overwrite"
      EncodePipeline.rollbackTo(s, path, 0)
      EncodePipeline.decodeShared(s, path, d.schema).agg(
        count(lit(1)).cast("long").as("n_rb"),
        sum(col("n_chars")).cast("long").as("chars_rb"),
        lit(cur.getLong(0)).cast("long").as("n_cur"),
        lit(cur.getLong(1)).cast("long").as("chars_cur"),
        lit(old.getLong(0)).cast("long").as("n_old"),
        lit(old.getLong(1)).cast("long").as("chars_old"),
        lit(kindOk).as("kind_ok"))
    }),
    "q_procedures" -> ((s, dir) => {
      // the SQL maintenance lifecycle in one flow: a graft catalog, INSERT
      // INTO (tracked append), CALL system.compact (re-blocks the two
      // commits per part), DELETE FROM (MOR vectors), CALL
      // system.materialize_deletes (folds them), CALL system.vacuum
      // (reclaims superseded files). The oracle recomputes the final table
      // from the raw parquet; n_folded pins the fold count and the flags
      // pin that each procedure did real work.
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 1)
      val wh = java.nio.file.Files.createTempDirectory("graft_proc_q").toFile
      wh.deleteOnExit()
      s.conf.set("spark.sql.catalog.qcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.qcat.root", wh.getAbsolutePath)
      val base = d.filter(col("doc_id") % 16 === 1)
      val added = d.filter(col("doc_id") % 16 === 9)
      EncodePipeline.run(base, "doc_id", s"${wh.getAbsolutePath}/db/t",
        partitions = 8, blockSize = 1024)
      added.createOrReplaceTempView("proc_q_src")
      s.sql("INSERT INTO qcat.db.t SELECT * FROM proc_q_src")
      val packed = s.sql(
        "CALL qcat.system.compact(table => 'db.t', block_size => 1024)")
        .head().getInt(0)
      s.sql("DELETE FROM qcat.db.t WHERE doc_id % 6 = 3")
      val folded = s.sql(
        "CALL qcat.system.materialize_deletes(table => 'db.t')").head().getLong(0)
      val vacuumed = s.sql("CALL qcat.system.vacuum(table => 'db.t')")
        .head().getInt(0)
      // CALL system.rewrite_manifests: the commit-per-file manifest dir
      // compacts to ONE file; the final read below must serve identically
      // off it (history/replay rows verbatim — see rewriteManifests doc)
      val rwRemoved = s.sql(
        "CALL qcat.system.rewrite_manifests(table => 'db.t')").head().getInt(0)
      val oneManifest = new java.io.File(s"${wh.getAbsolutePath}/db/t/meta")
        .listFiles().count(_.getName.endsWith(".parquet")) == 1
      s.sql("SELECT * FROM qcat.db.t").agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"),
        lit(folded).cast("long").as("n_folded"),
        lit(packed > 0).as("compact_ok"),
        lit(vacuumed > 0).as("vacuum_ok"),
        lit(rwRemoved > 0 && oneManifest).as("rewrite_manifests_ok"))
    }),
    "q_update" -> ((s, dir) => {
      // copy-on-write row-level UPDATE end-to-end: encode documents, UPDATE
      // a slice (doc_id%13==0 rows get a NULL pred and must stay UNCHANGED
      // — SQL UPDATE three-valued logic) with assignments that reference
      // the old row (n_chars + 1000), vacuum, decode. The oracle recomputes
      // the updated table in DuckDB; n_updated pins the return count and
      // tt_ok pins pre-update time travel + file reclamation.
      // pmod-sampled ~1/8 subset: identical DML semantics without paying
      // five full-table encodes per correctness sweep (q_null_roundtrip's
      // pattern); the oracle applies the same doc_id % 8 = 3 filter
      val d = tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(8)) === 3)
      val out = java.nio.file.Files.createTempDirectory("graft_update_q").toFile
      out.deleteOnExit()
      val path = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", path, partitions = 8, blockSize = 1024)
      val sumBefore = d.agg(sum(col("n_chars"))).head().getLong(0)
      val pred = when(col("doc_id") % 13 === 0, lit(null).cast("boolean"))
        .otherwise(col("doc_id") % 5 === 1)
      val nUpd = EncodePipeline.updateWhere(s, path, d.schema, "doc_id", pred,
        Map("lang" -> lit("xx"), "n_chars" -> (col("n_chars") + 1000L)),
        blockSize = 1024)
      val ttSum = EncodePipeline.decode(
        EncodePipeline.readDataAt(s, path, 0), d.schema)
        .agg(sum(col("n_chars"))).head().getLong(0)
      val removed = EncodePipeline.vacuum(s, path)
      EncodePipeline.decodeShared(s, path, d.schema)
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .crossJoin(broadcast(
          EncodePipeline.decodeShared(s, path, d.schema).agg(
            lit(nUpd).cast("long").as("n_updated"),
            lit(ttSum == sumBefore && removed > 0).as("tt_ok"))))
        .orderBy(col("lang"))
    }),
    "q_null_roundtrip" -> ((s, dir) => {
      // inject nulls into long + string columns, encode → decode, and report
      // oracle-checkable null counts and non-null checksums. A pmod-sampled
      // ~1/8 subset pins exactly the same semantics without re-encoding the
      // whole table per correctness probe (r2 spent 20.5 s here at sf0.1)
      val e = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(8)) === 3)
        .select(
          col("event_id"),
          when(pmod(col("event_id"), lit(7)) === 0, lit(null)).otherwise(col("user_id")).as("user_id"),
          when(pmod(col("event_id"), lit(5)) === 0, lit(null)).otherwise(col("event_type")).as("event_type"))
      val enc = EncodePipeline.encode(e, "event_id", partitions = 8, blockSize = 512)
      val dec = EncodePipeline.decode(enc, e.schema)
      dec.agg(count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).cast("long").as("n_null_user"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).cast("long").as("n_null_type"),
        sum(col("user_id")).cast("long").as("sum_user"),
        sum(length(col("event_type"))).cast("long").as("sum_type_len"))
    }),
    "q_encoded_filter" -> ((s, dir) => {
      // encoded-domain predicate: count matches from dict headers/compressed
      // spans only — no block is ever decoded (Codecs.countEqStr)
      val d = tbl(s, dir, "documents")
      val enc = EncodePipeline.encode(d, "doc_id", partitions = 8, blockSize = 512)
      enc.agg(
        sum(blob_count_eq(col("e_lang"), lit("de"))).cast("long").as("n_de"),
        sum(blob_count_eq(col("e_lang"), lit("zz"))).cast("long").as("n_zz"),
        sum(blob_count_eq(col("e_doc_id"), lit(7L))).cast("long").as("n_id7"),
        sum(blob_count_between(col("e_doc_id"), lit(100L), lit(199L))).cast("long").as("n_id_range"),
        sum(blob_count_between(col("e_n_chars"), lit(0L), lit(Long.MaxValue))).cast("long").as("n_all"),
        // the optimizer-rule forms: exists(...) → blob_contains_between and
        // size(filter(...)) → blob_count_between — decoded-block predicates
        // that never decode (EncodedFilterRule); values pinned by the oracle
        sum(when(expr("exists(decode_longs(e_doc_id), x -> x BETWEEN 300 AND 399)"),
          blob_count_between(col("e_doc_id"), lit(300L), lit(399L))).otherwise(0L))
          .cast("long").as("n_id_range2"),
        sum(expr("size(filter(decode_longs(e_doc_id), x -> x >= 400 AND x < 500))"))
          .cast("long").as("n_id_range3"),
        // STRING range forms: rewrite to blob_count_between_str /
        // blob_contains_between_str — sorted-dictionary interval counting,
        // zero string decode (EncodedFilterRule string patterns)
        sum(expr("size(filter(decode_strings(e_lang), x -> x >= 'd' AND x < 'e'))"))
          .cast("long").as("n_lang_range"),
        sum(when(expr("exists(decode_strings(e_lang), x -> x >= 'e' AND x <= 'ez')"),
          blob_count_between_str(col("e_lang"), lit("e"), lit("ez"))).otherwise(0L))
          .cast("long").as("n_lang_range2"),
        // LIKE-prefix form (r5): startswith → [p, succ(p)) byte range over
        // the sorted dictionary — the canonical webtext url/source filter,
        // still zero decode (EncodedFilterRule StartsWith pattern)
        sum(expr("size(filter(decode_strings(e_source), x -> x LIKE 'src1%'))"))
          .cast("long").as("n_src_prefix"),
        sum(when(expr("exists(decode_strings(e_source), x -> startswith(x, 'src2'))"),
          expr("size(filter(decode_strings(e_source), x -> startswith(x, 'src2')))"))
          .otherwise(0L)).cast("long").as("n_src_prefix2"),
        // IN-list form (r5): contains/count-eq disjunction, zero decode
        sum(expr("size(filter(decode_strings(e_lang), x -> x IN ('en', 'de', 'fr')))"))
          .cast("long").as("n_lang_in"),
        sum(expr("size(filter(decode_longs(e_doc_id), x -> x IN " +
          "(CAST(5 AS BIGINT), CAST(50 AS BIGINT), CAST(500 AS BIGINT))))"))
          .cast("long").as("n_id_in"))
    }),
    "q_bloom_lookup" -> ((s, dir) => {
      // block-grain Bloom filters (Parquet/Iceberg bloom parity): fp is a
      // multiplicative hash of doc_id, so the doc_id-keyed placement leaves
      // every part AND block spanning the fp domain — zone maps prune
      // nothing, the bm_fp filters prove absence per block. Pins: the three
      // needle probes return exactly their rows (DuckDB re-derives by
      // doc_id), the absent probe returns none, and both probe families
      // kept under 1/4 of the blocks (bloom actually skipped; fp-noise-safe)
      val d = tbl(s, dir, "documents").select(col("doc_id"), col("lang"),
        expr("pmod(doc_id * 2654435761, 1000000007)").as("fp"))
      val out = java.nio.file.Files.createTempDirectory("graft_bloom_q").toFile
      out.deleteOnExit()
      val dir0 = out.getAbsolutePath
      EncodePipeline.run(d, "doc_id", dir0, partitions = 4, blockSize = 64,
        bloomCols = Seq("fp"))
      val targets = Seq(7L, 123L, 321L)
      val blocksTotal = EncodePipeline.readData(s, dir0).count()
      val probes = targets.map { did =>
        val v = (did * 2654435761L) % 1000000007L
        val pr = EncodePipeline.readDataPruned(s, dir0, "fp", v)
        (EncodePipeline.decode(pr, d.schema).filter(col("fp") === v), pr.count())
      }
      val hitRows = probes.map(_._1).reduce(_ unionAll _)
      val kept = probes.map(_._2).sum
      val absentPr = EncodePipeline.readDataPruned(s, dir0, "fp", 999999999L)
      val nAbsent = EncodePipeline.decode(absentPr, d.schema)
        .filter(col("fp") === 999999999L).count()
      hitRows.agg(count(lit(1)).cast("long").as("n_hits"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .withColumn("n_absent", lit(nAbsent))
        // needle probes keep <= 2 blocks each on average (true block + rare
        // false positives) out of >= 8 — absolute bounds, fp-noise-safe at
        // every sf tier (500 rows -> 8 blocks, 5000 -> ~80)
        .withColumn("bloom_pruned",
          lit(kept <= 2L * targets.size && blocksTotal >= 8L))
        .withColumn("bloom_pruned_absent", lit(absentPr.count() * 4 < blocksTotal))
    }),
    "q_zone_skip" -> ((s, dir) => {
      // block-grain ZONE MAPS in the V2 scan: the per-part key sort makes
      // consecutive blocks cover disjoint did slices, while mod-4 placement
      // leaves every PART spanning the whole domain — plan-time part pruning
      // keeps all parts, so only the per-block blob bounds (rangeOfLong on
      // the e_did header, the delta decode-based path) can skip. DuckDB
      // re-derives n_rows/sum_ids from the raw table (did >= affine(lo) is
      // exactly doc_id >= t); zone_pruned pins that the pushed range probe
      // decoded strictly under half the blocks a full scan does.
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") * 7 + 100000).as("did"), col("lang"))
      val out = java.nio.file.Files.createTempDirectory("graft_zone_q").toFile
      out.deleteOnExit()
      val dir0 = out.getAbsolutePath + "/t"
      EncodePipeline.run(d, "did", dir0, partitions = 4, blockSize = 32,
        customPart = Some(pmod(col("did"), lit(4)).cast("int")))
      val t0 = d.agg(max(col("doc_id"))).head.getLong(0) * 9L / 10L
      val lo = 100000L + 7L * t0 // did >= lo  <=>  doc_id >= t0
      graft.sources.ReaderDiag.blocksDecoded.set(0)
      val r = s.read.format("graft").load(dir0).filter(col("did") >= lo)
        .agg(count(lit(1)).cast("long"), sum(col("doc_id")).cast("long")).head
      val rangeBlocks = graft.sources.ReaderDiag.blocksDecoded.get()
      graft.sources.ReaderDiag.blocksDecoded.set(0)
      val nAll = s.read.format("graft").load(dir0)
        .filter(col("lang").isNotNull).count()
      val totalBlocks = graft.sources.ReaderDiag.blocksDecoded.get()
      s.range(1).select(lit(r.getLong(0)).as("n_rows"), lit(r.getLong(1)).as("sum_ids"),
        lit(nAll).as("n_all"),
        lit(rangeBlocks * 2 < totalBlocks).as("zone_pruned"))
    }),
    "q_cluster" -> ((s, dir) => {
      // sort-order maintenance (Iceberg rewrite-with-sort-order): the table
      // is keyed and key-sorted by did, so sid — a pseudorandom permutation
      // of doc_id — spans every block and a pushed range probe on it can
      // skip NOTHING. rewriteSorted(sid) re-clusters each part; the same
      // probe then decodes a contiguous band. cluster_pruned pins
      // post-rewrite block decodes strictly under half of pre-rewrite;
      // n_rows/sum_ids are re-derived by DuckDB from the same affine sid
      // definition; same_result pins pre/post scan agreement.
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") * 7 + 100000).as("did"),
          pmod(col("doc_id") * 2654435761L, lit(1000003L)).as("sid"), col("lang"))
      val out = java.nio.file.Files.createTempDirectory("graft_cluster_q").toFile
      out.deleteOnExit()
      val dir0 = out.getAbsolutePath + "/t"
      EncodePipeline.run(d, "did", dir0, partitions = 4, blockSize = 32)
      def probe(): (Long, Long, Long) = {
        graft.sources.ReaderDiag.blocksDecoded.set(0)
        val r = s.read.format("graft").load(dir0).filter(col("sid") >= 900000L)
          .agg(count(lit(1)).cast("long"), sum(col("doc_id")).cast("long")).head
        (r.getLong(0), r.getLong(1), graft.sources.ReaderDiag.blocksDecoded.get())
      }
      val (n0, s0, pre) = probe()
      EncodePipeline.rewriteSorted(s, dir0, d.schema, "did",
        Seq(col("sid")), blockSize = 32)
      val (n1, s1, post) = probe()
      s.range(1).select(lit(n1).as("n_rows"), lit(s1).as("sum_ids"),
        lit(post * 2 < pre).as("cluster_pruned"),
        lit(n0 == n1 && s0 == s1).as("same_result"))
    }),
    "q_codec_plan" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val blocks = e.select(unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("event_id"), col("user_id"), col("event_type"), col("props"))
        .groupBy(expr("event_id DIV 4096").as("g"))
        .agg(sort_array(collect_list(col("ts_us"))).as("ts_sorted"),
          collect_list(col("user_id")).as("uids"),
          collect_list(col("event_type")).as("types"),
          collect_list(col("props")).as("props"))
      blocks.select(
          blob_codec(encode_longs(col("ts_sorted"))).as("ts_codec"),
          blob_codec(encode_longs(col("uids"))).as("user_codec"),
          blob_codec(encode_strings(col("types"))).as("type_codec"),
          blob_codec(encode_strings(col("props"))).as("props_codec"))
        .groupBy(col("ts_codec"), col("user_codec"), col("type_codec"), col("props_codec"))
        .count().orderBy(col("count").desc)
    }),

    // ---- relational coverage: sort/limit/top-k and broadcast join ----
    "q_topk_sources" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("source")).limit(5)
    }),
    "q_join_revenue" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          // exact integer cents: double sum order differs across engines
          sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("revenue_cents"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- training-data-pipeline operators ----
    "q_dedup_exact" -> ((s, dir) => {
      TextOps.exactDupStats(tbl(s, dir, "documents"), "text")
    }),
    "q_token_stats" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("sum_tokens"),
          sum(length(col("text"))).cast("long").as("sum_chars"))
        .orderBy(col("lang"))
    }),
    "q_quality_stats" -> ((s, dir) => {
      // integer sums (not float averages): exactly comparable across engines
      tbl(s, dir, "documents")
        .select(col("lang"), TextOps.qualityStats(col("text")).as("q"))
        .groupBy(col("lang")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("q.n_chars")).cast("long").as("sum_chars"),
          sum(col("q.n_tokens")).cast("long").as("sum_tokens"),
          sum(col("q.n_alpha")).cast("long").as("sum_alpha"),
          sum(col("q.n_punct")).cast("long").as("sum_punct"))
        .orderBy(col("lang"))
    }),
    "q_lang_id" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("lang"), TextOps.langGuess(col("text")).as("guess"))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("guess") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
        .orderBy(col("lang"))
    }),
    "q_minhash_dups" -> ((s, dir) => {
      // weighted pair mass: intra-exact-dup pairs reconstructed arithmetically,
      // cross pairs LSH-found over distinct texts; oracle = exact all-pairs
      // 3-gram jaccard (integer j4 scale) in DuckDB
      val pairs = TextOps.minhashDupPairs(tbl(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.5)
      pairs.agg(coalesce(sum(col("n_pairs")), lit(0L)).cast("long").as("n_pairs"),
        coalesce(sum(col("j4") * col("n_pairs")), lit(0L)).cast("long").as("sum_j4"))
    }),
    "q_simhash_dups" -> ((s, dir) => {
      val pairs = TextOps.simhashDupPairs(tbl(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
      pairs.agg(coalesce(sum(col("n_pairs")), lit(0L)).cast("long").as("n_pairs"),
        coalesce(sum(col("hamming") * col("n_pairs")), lit(0L)).cast("long").as("sum_hamming"))
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      // exact bigram Jaccard over LSH-sourced candidates (no all-pairs join,
      // no id-range crutch); oracle = exact all-pairs bigram jaccard
      val pairs = TextOps.minhashDupPairs(tbl(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, k = 64, bands = 16, threshold = 0.4)
      pairs.agg(coalesce(sum(col("n_pairs")), lit(0L)).cast("long").as("n_pairs"),
        coalesce(max(col("j4")), lit(0L)).cast("long").as("max_j4"))
    }),
    "q_embed_dedup" -> ((s, dir) => {
      // embedding-cosine near-dup dedup with PLANTED duplicates: scaled
      // copies have cosine exactly 1 and identical hyperplane signatures, so
      // LSH recall is guaranteed — the oracle re-derives the same 500 pairs
      // by exact all-pairs cosine in DuckDB
      val emb = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val copies = emb.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("v"), x => x * 2.0).as("v"))
      TextOps.embeddingDupPairs(emb.unionAll(copies), "vec_id", "v", threshold = 0.9)
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(when(col("cosine") >= 0.99, 1L).otherwise(0L)).cast("long").as("n_exact"))
    }),
    "q_bpe_tokens" -> ((s, dir) => {
      // sub-word (BPE pre-tokenizer) counting vs whitespace counting over
      // structured JSON-ish props — several times denser, oracle-exact
      tbl(s, dir, "events").groupBy(col("event_type")).agg(
          count(lit(1)).cast("long").as("n_events"),
          sum(TextOps.bpeTokenCount(col("props"))).cast("long").as("sum_bpe_tokens"),
          sum(size(split(col("props"), " "))).cast("long").as("sum_ws_tokens"))
        .orderBy(col("event_type"))
    }),
    "q_fingerprint_dups" -> ((s, dir) => {
      // winnowing fingerprints (rolling-hash document fingerprinting): pairs
      // sharing >= 2 fingerprints via an inverted-index equi-join
      // the synthetic corpus draws from a ~100-word vocabulary, so common
      // 8-byte substrings are corpus-wide; copy-detection settings: drop
      // fingerprints in >4% of docs, demand 8 shared survivors
      val pairs = TextOps.fingerprintDupPairs(tbl(s, dir, "documents"), "doc_id", "text",
        k = 8, window = 16, minShared = 8, maxDocFreq = 20)
      pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
        coalesce(max(col("n_shared")), lit(0L)).cast("long").as("max_shared"))
    }),
    "q_media_pipeline" -> ((s, dir) => {
      // multimodal plumbing smoke: synthesized media table -> metadata decode,
      // resize, frame sampling, feature extraction over the REAL pure-Scala
      // BMP/WAV/AVI codecs (compressed formats stay declared stubs).
      // ONE union + ONE aggregation (r4 verdict item 4): the previous shape
      // ran eight independent 1-row aggregate jobs glued by crossJoins —
      // harmless at any scale (all 1-row sides) but eight serialized jobs;
      // per-kind expressions now run conditionally inside a single pass.
      import graft.operators.MediaOps
      val rows = MediaOps.fakeMediaTable(s, 400, 8).select(col("media_type"), col("payload"))
        .unionByName(MediaOps.fakeGifTable(s, 80, 8)
          .select(col("media_type"), col("payload")))
        .unionByName(MediaOps.fakePngTable(s, 60, 8)
          .select(col("media_type"), col("payload")))
        .unionByName(MediaOps.fakeAudioTable(s, 100, 8)
          .select(lit("audio/wav").as("media_type"), col("payload")))
        .unionByName(MediaOps.fakeAviTable(s, 40, 8)
          .select(lit("video/avi").as("media_type"), col("payload")))
        .unionByName(MediaOps.fakeAnimatedGifTable(s, 30, 8)
          .select(col("media_type"), col("payload")))
        .select(
          col("media_type").startsWith("image/").as("is_img"),
          (col("media_type") === "image/bmp").as("is_bmp"),
          (col("media_type") === "image/gif").as("is_gif"),
          (col("media_type") === "image/png").as("is_png"),
          (col("media_type") === "video/gif").as("is_agif"),
          (col("media_type") === "video/fake").as("is_vid"),
          (col("media_type") === "audio/wav").as("is_wav"),
          (col("media_type") === "video/avi").as("is_avi"),
          col("payload"))
        .select(col("*"),
          when(col("is_img"), MediaOps.image_meta(col("payload"))).as("m"),
          when(col("is_img"), MediaOps.image_meta(
            MediaOps.image_resize(col("payload"), 224, 224))).as("rm"),
          when(col("is_bmp"), MediaOps.pixel_checksum(col("payload"))).as("bmp_ck"),
          // real GIF87a/LZW decode path: checksum over the decoded canvas
          when(col("is_gif"), MediaOps.pixel_checksum(col("payload"))).as("gif_ck"),
          // real PNG path: inflate + un-filter, checksum the decoded pixels
          when(col("is_png"), MediaOps.pixel_checksum(col("payload"))).as("png_ck"),
          when(col("is_vid"), size(MediaOps.frame_sample(col("payload"), 4))).as("n_vid_frames"),
          when(col("is_img"), size(MediaOps.image_feature(col("payload"), 32))).as("feat_dims"),
          when(col("is_wav"), MediaOps.audio_meta(col("payload"))).as("am"),
          when(col("is_wav"), MediaOps.sample_checksum(col("payload"))).as("wav_ck"),
          when(col("is_wav"), MediaOps.audio_meta(
            MediaOps.audio_resample(col("payload"), 4000))).as("arm"),
          when(col("is_avi") || col("is_agif"), MediaOps.video_meta(col("payload"))).as("vm"),
          // every-2nd-frame sampling: each frame re-encodes as a real BMP and
          // flows through the real pixel decode, summed in place
          when(col("is_avi"), transform(MediaOps.frame_sample(col("payload"), 2),
            f => MediaOps.pixel_checksum(f))).as("avi_cks"),
          when(col("is_agif"), transform(MediaOps.frame_sample(col("payload"), 2),
            f => MediaOps.pixel_checksum(f))).as("agif_cks"))
      rows.agg(
        sum(when(col("is_img"), 1L).otherwise(0L)).as("n_images"),
        sum(when(col("m.valid"), 1L).otherwise(0L)).as("n_valid"),
        sum(col("m.width") * col("m.height") * col("m.channels")).as("total_pixels"),
        sum(when(col("rm.width") === 224 && col("rm.height") === 224, 1L).otherwise(0L)).as("n_resized"),
        sum(col("n_vid_frames")).as("n_frames"),
        sum(when(col("is_img"), 1L).otherwise(0L)).as("n_features"),
        max(col("feat_dims")).as("dims"),
        sum(when(col("is_bmp"), 1L).otherwise(0L)).as("n_bmp"),
        sum(col("bmp_ck")).as("bmp_pixel_sum"),
        sum(when(col("is_gif"), 1L).otherwise(0L)).as("n_gif"),
        sum(col("gif_ck")).as("gif_pixel_sum"),
        sum(when(col("is_png"), 1L).otherwise(0L)).as("n_png"),
        sum(col("png_ck")).as("png_pixel_sum"),
        sum(when(col("is_wav"), 1L).otherwise(0L)).as("n_wav"),
        sum(when(col("am.valid"), 1L).otherwise(0L)).as("n_wav_valid"),
        sum(col("wav_ck")).as("wav_sample_sum"),
        sum(when(col("arm.valid") && col("arm.sample_rate") === 4000, 1L).otherwise(0L)).as("n_wav_resampled"),
        sum(when(col("is_avi"), 1L).otherwise(0L)).as("n_avi"),
        sum(when(col("is_avi") && col("vm.valid"), col("vm.n_frames")).otherwise(0L)).as("n_avi_frames"),
        sum(size(col("avi_cks"))).as("n_avi_sampled"),
        sum(aggregate(col("avi_cks"), lit(0L), (a, x) => a + x)).as("avi_pixel_sum"),
        sum(when(col("is_agif"), 1L).otherwise(0L)).as("n_agif"),
        sum(when(col("is_agif") && col("vm.valid"), col("vm.n_frames")).otherwise(0L)).as("n_agif_frames"),
        sum(size(col("agif_cks"))).as("n_agif_sampled"),
        sum(aggregate(col("agif_cks"), lit(0L), (a, x) => a + x)).as("agif_pixel_sum"))
    }),
    "q_embed_dims" -> ((s, dir) => {
      tbl(s, dir, "embeddings").agg(
        count(lit(1)).cast("long").as("n_vecs"),
        max(size(col("embedding"))).cast("long").as("dims"))
    }),
    "q_ann_brute" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      TextOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_ann_lsh_recall" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val exact = TextOps.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = TextOps.lshTopK(emb, q, "vec_id", "embedding", 5, planes = 16, bands = 8)
        .select(col("query_id"), col("neighbor_id"))
      // left-join hits back onto ALL query ids so a zero-hit query counts
      // toward recall instead of vanishing from the groupBy
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      // integer outputs (total exact-top-5 hits recovered) so the oracle pin
      // is hash-robust; recall@5 = hits_at_5 / (5 * n_queries)
      q.select(col("vec_id").as("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("h"), lit(0L)).as("h"))
        .agg(count(lit(1)).as("n_queries"), sum(col("h")).as("hits_at_5"))
    }),
    "q_ann_ivf_recall" -> ((s, dir) => {
      // IVF tier: recall@5 vs brute force at nprobe=4 of 16 centroids (i.e.
      // scanning ~1/4 of the collection per query instead of all of it)
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      val exact = TextOps.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val cands = TextOps.ivfCandidatePairs(emb, q, "vec_id", "embedding",
        nCentroids = 16, nprobe = 4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      val approx = cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      // cand_frac pins the cost side of the recall trade-off: fraction of the
      // collection each query actually scored (nprobe/nCentroids of it)
      val cost = cands.agg(count(lit(1)).as("n_cand"))
        .crossJoin(emb.agg(count(lit(1)).as("n_total")))
        .crossJoin(q.agg(count(lit(1)).as("n_q")))
        .select(floor(col("n_cand") * 1000L / (col("n_total") * col("n_q")))
          .cast("long").as("cand_pm"))
      // integer outputs (hits recovered + candidates scanned per-mille) so
      // the oracle pin is hash-robust; recall@5 = hits_at_5 / (5 * n_queries)
      q.select(col("vec_id").as("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("h"), lit(0L)).as("h"))
        .agg(count(lit(1)).as("n_queries"), sum(col("h")).as("hits_at_5"))
        .crossJoin(cost)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_bitpack_roundtrip" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch FROM events",
    "q_delta_ts_roundtrip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST(min(epoch_us(ts)) AS BIGINT) AS min_us, CAST(max(epoch_us(ts)) AS BIGINT) AS max_us FROM events"),
    "q_for_roundtrip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST(sum(l_orderkey) AS BIGINT) AS sum_key FROM lineitem"),
    "q_rle_roundtrip" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch FROM lineitem",
    "q_dict_roundtrip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM documents"),
    "q_fsst_roundtrip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST(sum(strlen(text)) AS BIGINT) AS total_bytes FROM documents"),
    "q_prefix_roundtrip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST(sum(strlen(source)) AS BIGINT) AS total_bytes FROM documents"),
    "q_auto_roundtrip" ->
      "SELECT CAST(2 * count(*) AS BIGINT) AS n_values, CAST(0 AS BIGINT) AS n_mismatch FROM events",
    "q_alp_roundtrip" ->
      ("WITH b AS (SELECT (l_orderkey * 8 + l_linenumber) // 4096 AS g, count(*) AS n " +
        "FROM lineitem GROUP BY 1), big AS (SELECT count(*) AS nb FROM b WHERE n >= 8) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST((SELECT nb FROM big) AS BIGINT) AS n_blocks, " +
        "CAST((SELECT nb FROM big) AS BIGINT) AS n_alp, " + // selector pin: every probe-sized block picks alp
        "CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS sum_cents FROM lineitem"),
    "q_tzfor_roundtrip" ->
      ("WITH v AS (SELECT vec_id // 4096 * 256 + unnest(range(len(embedding))) AS g " +
        "FROM embeddings), " +
        "b AS (SELECT g, count(*) AS n FROM v GROUP BY 1), " +
        "big AS (SELECT count(*) AS nb FROM b WHERE n >= 8) " +
        "SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch, " +
        "CAST((SELECT nb FROM big) AS BIGINT) AS n_blocks, " +
        "CAST((SELECT nb FROM big) AS BIGINT) AS n_tzfor"), // selector pin: dim-major float blocks pick tzfor
    "q_bitwidth_hist" ->
      ("SELECT CAST(length(bin(user_id)) AS INT) AS width, CAST(count(*) AS BIGINT) AS n " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q_codec_stats" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(min(user_id) AS BIGINT) AS min_user, " +
        "CAST(max(user_id) AS BIGINT) AS max_user, CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_user, " +
        "CAST(min(event_id) AS BIGINT) AS min_event, CAST(max(event_id) AS BIGINT) AS max_event FROM events"),
    "q_run_count" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_runs FROM (SELECT event_type, " +
        "lag(event_type) OVER (ORDER BY event_id) AS prev FROM events) t " +
        "WHERE prev IS NULL OR prev <> event_type"),
    "q_dict_viability" ->
      ("SELECT * FROM (SELECT 'lang' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS ndv FROM documents UNION ALL " +
        "SELECT 'source' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(DISTINCT source) AS BIGINT) AS ndv FROM documents) ORDER BY column_name"),
    "q_swar_arith" -> {
      val pre = "WITH t AS (SELECT l_linenumber AS ln, CAST(floor(l_quantity) AS BIGINT) AS qty, " +
        "CAST(floor(l_discount * 100) AS BIGINT) AS disc FROM lineitem) "
      pre + "SELECT " +
        "CAST(sum((ln+3)%16 + (qty+200)%256 + (disc+7)%256) AS BIGINT) AS s_addwrap, " +
        "CAST(sum(least(ln+14,15) + least(qty+250,255) + least(disc+0,255)) AS BIGINT) AS s_addsat, " +
        "CAST(sum(((ln-9)%16+16)%16 + ((qty-60)%256+256)%256 + ((disc-1)%256+256)%256) AS BIGINT) AS s_subwrap, " +
        "CAST(sum(least(ln,2) + greatest(qty,30) + least(disc,5)) AS BIGINT) AS s_minmax, " +
        "CAST(sum((ln*4)%16 + (qty*4)%256 + (disc*4)%256) AS BIGINT) AS s_shift, " +
        "CAST(sum(qty + disc) AS BIGINT) AS s_slice, " +
        // signed saturating add vs k5 (6,100,120) and k6 (-4,-56,-6)
        "CAST(sum(least(ln+6,7) + least(qty+100,127) + least(disc+120,127) " +
        "+ (ln-4) + (qty-56) + (disc-6)) AS BIGINT) AS s_addsats, " +
        // unsigned saturating sub vs k7 (3,25,5): clamp at 0
        "CAST(sum(greatest(ln-3,0) + greatest(qty-25,0) + greatest(disc-5,0)) AS BIGINT) AS s_subsatu, " +
        // signed saturating sub vs k8 (5,-96,8): qty+96 clamps at 127
        "CAST(sum((ln-5) + least(qty+96,127) + (disc-8)) AS BIGINT) AS s_subsats, " +
        // signed min/max vs k9 (-2,30,-126): min_s(ln,-2)=-2, max_s(qty,30), min_s(disc,-126)=-126
        "CAST(sum(greatest(qty,30) - 128) AS BIGINT) AS s_minmaxs, " +
        // sign-extended reads of add_wrap(w, k10=(12,220,250)) lanes
        "CAST(sum(((ln+12)%16) - (CASE WHEN (ln+12)%16 >= 8 THEN 16 ELSE 0 END) " +
        "+ ((qty+220)%256) - (CASE WHEN (qty+220)%256 >= 128 THEN 256 ELSE 0 END) " +
        "+ ((disc+250)%256) - (CASE WHEN (disc+250)%256 >= 128 THEN 256 ELSE 0 END)) AS BIGINT) AS s_getsigned, " +
        // lane-wise logical right shift by 2
        "CAST(sum(ln//4 + qty//4 + disc//4) AS BIGINT) AS s_shiftr FROM t"
    },
    "q_topk_sources" ->
      ("SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents " +
        "GROUP BY source ORDER BY n DESC, source LIMIT 5"),
    "q_join_revenue" ->
      ("SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
        "CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS revenue_cents FROM orders " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_dedup_exact" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows, " +
        "CAST(max(c) AS BIGINT) AS max_group FROM (SELECT count(*) AS c FROM documents GROUP BY text) g"),
    "q_token_stats" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens, " +
        "CAST(sum(length(text)) AS BIGINT) AS sum_chars FROM documents GROUP BY lang ORDER BY lang"),
    "q_embed_dims" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_vecs, CAST(max(len(embedding)) AS BIGINT) AS dims " +
        "FROM embeddings"),
    // recall pins (NEXT r5 item 5): the query set and both index builds are
    // fully deterministic (seeded hyperplanes; driver k-means over a fixed
    // 2048-row sample), so the hit counts vs exact top-5 are constants at the
    // driver's verify scale (sf0.01). n_queries comes from the data; only the
    // approx side (not expressible in SQL) is pinned. LSH (16 planes, 8
    // bands): 25/25 exact neighbors recovered. IVF (16 centroids, nprobe=4):
    // 15/25 recovered while scoring 250 per-mille of collection x queries.
    "q_ann_lsh_recall" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(25 AS BIGINT) AS hits_at_5 " +
        "FROM embeddings WHERE vec_id < 5"),
    "q_ann_ivf_recall" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(15 AS BIGINT) AS hits_at_5, " +
        "CAST(250 AS BIGINT) AS cand_pm FROM embeddings WHERE vec_id < 5"),
    // classifier pin: LangGuess is a pure function of the text, and the
    // documents fixture is seeded, so the confusion counts are constants at
    // the driver's verify scale (sf0.01). The generator writes English-like
    // tokens under every lang label, so only the 'en' rows can score (160 of
    // 218); n_docs comes from the data, only the classifier side is pinned.
    "q_lang_id" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(CASE lang WHEN 'en' THEN 160 ELSE 0 END AS BIGINT) AS n_correct " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_bloom_lookup" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_hits, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "CAST(0 AS BIGINT) AS n_absent, true AS bloom_pruned, true AS bloom_pruned_absent " +
        "FROM documents WHERE doc_id IN (7, 123, 321)"),
    // zone-map pin: n_rows/sum_ids re-derived over the equivalent doc_id
    // threshold; zone_pruned asserts the engine-internal block-skip ratio
    "q_zone_skip" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "(SELECT CAST(count(lang) AS BIGINT) FROM documents) AS n_all, true AS zone_pruned " +
        "FROM documents WHERE doc_id >= (SELECT (max(doc_id)*9)//10 FROM documents)"),
    "q_cluster" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "TRUE AS cluster_pruned, TRUE AS same_result " +
        "FROM documents WHERE (doc_id * 2654435761) % 1000003 >= 900000"),
    // codec-selection pin: the auto-selector's choice per events block is
    // deterministic on the seeded fixture — every 4096-id block picks
    // delta(ts)/bitpack(user)/dict(type)/dict(props); the block count is
    // data-derived, only the four codec names are pinned.
    "q_codec_plan" ->
      ("SELECT 'delta' AS ts_codec, 'bitpack' AS user_codec, " +
        "'dict' AS type_codec, 'dict' AS props_codec, " +
        "CAST(count(DISTINCT event_id // 4096) AS BIGINT) AS count FROM events"),
    "q_quality_stats" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(length(text)) AS BIGINT) AS sum_chars, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens, " +
        "CAST(sum(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))) AS BIGINT) AS sum_alpha, " +
        "CAST(sum(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))) AS BIGINT) AS sum_punct " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_compression_ratio" ->
      ("SELECT * FROM (" +
        "SELECT 'doc_id' AS column_name, CAST(8 * count(*) AS BIGINT) AS raw_bytes, TRUE AS encoded_lt_raw FROM documents " +
        "UNION ALL SELECT 'lang', CAST(sum(strlen(lang)) AS BIGINT), TRUE FROM documents " +
        "UNION ALL SELECT 'n_chars', CAST(8 * count(*) AS BIGINT), TRUE FROM documents " +
        "UNION ALL SELECT 'source', CAST(sum(strlen(source)) AS BIGINT), TRUE FROM documents " +
        "UNION ALL SELECT 'text', CAST(sum(strlen(text)) AS BIGINT), TRUE FROM documents" +
        ") ORDER BY column_name"),
    "q_page_compress" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(strlen(text)) AS BIGINT) AS text_bytes, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "TRUE AS page_used, TRUE AS enc_lt_raw FROM documents"),
    "q_shared_dict" ->
      ("SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "min(lang) AS min_lang, max(lang) AS max_lang, TRUE AS shared_used " +
        "FROM documents GROUP BY source ORDER BY source"),
    "q_ndv" ->
      ("SELECT * FROM (" +
        "SELECT 'lang' AS column_name, CAST(count(DISTINCT lang) AS BIGINT) AS ndv, " +
        "TRUE AS ndv_exact FROM documents " +
        "UNION ALL SELECT 'source', CAST(count(DISTINCT source) AS BIGINT), TRUE FROM documents " +
        "UNION ALL SELECT 'text', CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN) " +
        "UNION ALL SELECT 'doc_id_est_ok', CAST(1 AS BIGINT), CAST(NULL AS BOOLEAN) " +
        "UNION ALL SELECT 'n_chars_est_ok', CAST(1 AS BIGINT), CAST(NULL AS BOOLEAN)" +
        ") ORDER BY column_name"),
    "q_analyze" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "CAST(sum(doc_id) AS BIGINT) AS sum_id, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS ndv_lang, " +
        "TRUE AS ndv_lang_exact, TRUE AS refused_before, " +
        "TRUE AS kind_analyze, TRUE AS files_unchanged FROM documents"),
    "q_stats_agg" ->
      ("WITH d AS (SELECT doc_id, text, lang, source, " +
        "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars FROM documents) " +
        "SELECT * FROM (" +
        "SELECT 'doc_id' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(doc_id) AS BIGINT) AS n_values, " +
        "CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls, " +
        "CAST(min(doc_id) AS BIGINT) AS v_min, CAST(max(doc_id) AS BIGINT) AS v_max, " +
        "CAST(sum(doc_id) AS BIGINT) AS v_sum FROM d " +
        "UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(lang) AS BIGINT), " +
        "CAST(count(*) - count(lang) AS BIGINT), NULL, NULL, NULL FROM d " +
        "UNION ALL SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT), " +
        "CAST(count(*) - count(n_chars) AS BIGINT), CAST(min(n_chars) AS BIGINT), " +
        "CAST(max(n_chars) AS BIGINT), CAST(sum(n_chars) AS BIGINT) FROM d " +
        "UNION ALL SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT), " +
        "CAST(count(*) - count(source) AS BIGINT), NULL, NULL, NULL FROM d " +
        "UNION ALL SELECT 'text', CAST(count(*) AS BIGINT), CAST(count(text) AS BIGINT), " +
        "CAST(count(*) - count(text) AS BIGINT), NULL, NULL, NULL FROM d" +
        ") ORDER BY column_name"),
    "q_v2_scan" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id " +
        "FROM documents WHERE doc_id >= 100 AND lang >= 'a' " +
        "GROUP BY lang ORDER BY lang"),
    // streaming-sink pin: the streamed table's grouped aggregate re-derived
    // over the raw table (exactly-once: any dup/dropped epoch breaks it)
    "q_stream_sink" ->
      ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "true AS epochs_committed_ok " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_v2_agg" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(n_chars) AS BIGINT) AS n_chars_vals, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "CAST(sum(doc_id) AS BIGINT) AS sum_id, " +
        "CAST(min(n_chars) AS BIGINT) AS min_chars, CAST(max(n_chars) AS BIGINT) AS max_chars, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents"),
    "q_sql_update" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "u AS (SELECT doc_id, " +
        "CASE WHEN length(text) % 2 = 0 THEN lang || '!' ELSE lang END AS lang, " +
        "CASE WHEN length(text) % 2 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars " +
        "FROM s) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, TRUE AS mor " +
        "FROM u GROUP BY lang ORDER BY lang"),
    "q_sql_merge" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "merged AS (" +
        "SELECT * FROM s WHERE doc_id % 10 <> 3 " +
        "UNION ALL SELECT doc_id, text, 'xx' AS lang, source, n_chars + 500 " +
        "FROM s WHERE doc_id % 10 = 3 " +
        "UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars " +
        "FROM s WHERE doc_id % 25 = 7) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM merged GROUP BY lang ORDER BY lang"),
    "q_runtime_filter" ->
      ("WITH dim AS (SELECT doc_id AS k FROM documents " +
        "WHERE doc_id % 25 = 7 AND doc_id < 100) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_join, " +
        "CAST(sum(f.n_chars) AS BIGINT) AS sum_chars, TRUE AS pruned " +
        "FROM documents f JOIN dim ON f.doc_id = dim.k"),
    "q_spj" ->
      ("WITH b AS (SELECT doc_id, n_chars + 11 AS n_chars FROM documents " +
        "WHERE doc_id % 3 = 0) " +
        "SELECT a.lang, CAST(count(*) AS BIGINT) AS n_join, " +
        "CAST(sum(b.n_chars - a.n_chars) AS BIGINT) AS sum_delta, " +
        "TRUE AS spj " +
        "FROM documents a JOIN b ON a.doc_id = b.doc_id " +
        "GROUP BY a.lang ORDER BY a.lang"),
    "q_sql_dml" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "t AS (SELECT * FROM s UNION ALL " +
        "SELECT doc_id + 1000000, text, lang, source, n_chars " +
        "FROM s WHERE doc_id % 25 = 7) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, TRUE AS sql_mor " +
        "FROM t WHERE NOT (doc_id >= 100 AND doc_id < 300) " +
        "GROUP BY lang ORDER BY lang"),
    "q_ctas" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 6 AND doc_id % 2 = 0) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, TRUE AS time_travel_ok " +
        "FROM s GROUP BY lang ORDER BY lang"),
    "q_asof" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 7), " +
        "v0 AS (SELECT * FROM s WHERE doc_id % 3 = 1) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_cur, " +
        "CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM v0) AS n_v0, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM v0) AS n_tag, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM v0) AS n_ts, " +
        "TRUE AS ts_ordered FROM s"),
    "q_compact" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "TRUE AS compacted FROM documents"),
    "q_binpack" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "TRUE AS packed FROM documents"),
    "q_delete" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s " +
        "WHERE doc_id % 11 <> 0 AND doc_id % 7 = 2) AS n_deleted, " +
        "TRUE AS tt_ok FROM s " +
        "WHERE NOT (doc_id % 11 <> 0 AND doc_id % 7 = 2)"),
    "q_update_lazy" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "u AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 17 <> 0 AND doc_id % 5 = 2 THEN 'yy' ELSE lang END AS lang, " +
        "CASE WHEN doc_id % 17 <> 0 AND doc_id % 5 = 2 THEN n_chars + 250 ELSE n_chars END AS n_chars " +
        "FROM s) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s " +
        "WHERE doc_id % 17 <> 0 AND doc_id % 5 = 2) AS n_updated, " +
        "TRUE AS zero_rewrite, TRUE AS atomic_commit " +
        "FROM u GROUP BY lang ORDER BY lang"),
    "q_merge" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "merged AS (" +
        "SELECT * FROM s WHERE doc_id % 10 <> 3 " +
        "UNION ALL SELECT doc_id, text, 'xx' AS lang, source, n_chars + 500 " +
        "FROM s WHERE doc_id % 10 = 3 " +
        "UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars " +
        "FROM s WHERE doc_id % 25 = 7) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 10 = 3) AS n_replaced, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 25 = 7) AS n_inserted " +
        "FROM merged GROUP BY lang ORDER BY lang"),
    "q_merge_lazy" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "merged AS (" +
        "SELECT * FROM s WHERE doc_id % 10 <> 3 " +
        "UNION ALL SELECT doc_id, text, 'xx' AS lang, source, n_chars + 500 " +
        "FROM s WHERE doc_id % 10 = 3 " +
        "UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars " +
        "FROM s WHERE doc_id % 25 = 7) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 10 = 3) AS n_replaced, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 25 = 7) AS n_inserted, " +
        "TRUE AS zero_rewrite, TRUE AS atomic_commit " +
        "FROM merged GROUP BY lang ORDER BY lang"),
    "q_delete_lazy" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s " +
        "WHERE doc_id % 9 <> 0 AND doc_id % 6 = 3) AS n_deleted, " +
        "TRUE AS zero_rewrite, TRUE AS mat_ok FROM s " +
        "WHERE NOT (doc_id % 9 <> 0 AND doc_id % 6 = 3)"),
    "q_rollback" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 6) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 5 = 4) AS n_updated, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 7 = 1) AS n_deleted, " +
        "TRUE AS rb1_ok, TRUE AS vacuumed FROM s"),
    "q_wap" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 16 = 9) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "TRUE AS hidden_ok, TRUE AS branch_ok, TRUE AS travel_ok FROM s"),
    "q_cdc" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 2), " +
        "ins AS (SELECT * FROM s WHERE doc_id % 3 = 0 AND doc_id % 10 <> 4), " +
        "del AS (SELECT * FROM s WHERE doc_id % 3 <> 0 AND doc_id % 10 = 4) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM ins) AS n_ins, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM del) AS n_del, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM ins) AS ins_chars, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM del) AS del_chars, " +
        "(SELECT CAST(sum(doc_id) AS BIGINT) FROM ins) AS ins_ids, " +
        "(SELECT CAST(sum(doc_id) AS BIGINT) FROM del) AS del_ids, " +
        "TRUE AS fast_ok"),
    "q_cdc_stream" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 6), " +
        "del AS (SELECT * FROM s WHERE doc_id % 10 = 4) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_ins, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM del) AS n_del, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM s) AS ins_chars, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM del) AS del_chars, " +
        "(SELECT CAST(sum(doc_id) AS BIGINT) FROM s) AS ins_ids, " +
        "(SELECT CAST(sum(doc_id) AS BIGINT) FROM del) AS del_ids, " +
        "TRUE AS exactly_once"),
    "q_stream_throttle" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 5) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "TRUE AS terminated, TRUE AS paced_ok, TRUE AS exactly_once FROM s"),
    "q_history" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 4) " +
        "SELECT CAST(0 AS INTEGER) AS gen, 'base' AS kind, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 16 = 4) AS n_rows " +
        "UNION ALL SELECT CAST(1 AS INTEGER), 'append', " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 16 = 12) " +
        "UNION ALL SELECT CAST(2 AS INTEGER), 'update', " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 5 = 1) " +
        "ORDER BY gen"),
    "q_overwrite" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 7), " +
        "b AS (SELECT * FROM s WHERE doc_id % 3 <> 0), " +
        "n AS (SELECT n_chars + 1000 AS n_chars FROM s WHERE doc_id % 3 = 0) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_rb, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM b) AS chars_rb, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM n) AS n_cur, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM n) AS chars_cur, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM b) AS n_old, " +
        "(SELECT CAST(sum(n_chars) AS BIGINT) FROM b) AS chars_old, " +
        "TRUE AS kind_ok"),
    "q_procedures" ->
      ("WITH s AS (SELECT * FROM documents " +
        "WHERE doc_id % 16 = 1 OR doc_id % 16 = 9), " +
        "kept AS (SELECT * FROM s WHERE doc_id % 6 <> 3) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s WHERE doc_id % 6 = 3) AS n_folded, " +
        "TRUE AS compact_ok, TRUE AS vacuum_ok, " +
        "TRUE AS rewrite_manifests_ok FROM kept"),
    "q_update" ->
      ("WITH s AS (SELECT * FROM documents WHERE doc_id % 8 = 3), " +
        "u AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 13 <> 0 AND doc_id % 5 = 1 THEN 'xx' ELSE lang END AS lang, " +
        "CASE WHEN doc_id % 13 <> 0 AND doc_id % 5 = 1 THEN n_chars + 1000 ELSE n_chars END AS n_chars " +
        "FROM s) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM s " +
        "WHERE doc_id % 13 <> 0 AND doc_id % 5 = 1) AS n_updated, " +
        "TRUE AS tt_ok FROM u GROUP BY lang ORDER BY lang"),
    "q_null_roundtrip" ->
      ("WITH e AS (SELECT event_id, " +
        "CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS user_id, " +
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS event_type " +
        "FROM events WHERE event_id % 8 = 3) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user, " +
        "CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_type, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_user, " +
        "CAST(sum(length(event_type)) AS BIGINT) AS sum_type_len FROM e"),
    "q_minhash_dups" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "d AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ') " +
        "for i in generate_series(1, greatest(len(toks)-2, 1))]) AS sh FROM t), " +
        "p AS (SELECT (CAST(10000 AS BIGINT) * len(list_intersect(a.sh, b.sh))) " +
        "// len(list_distinct(a.sh || b.sh)) AS j4 " +
        "FROM d a JOIN d b ON a.doc_id < b.doc_id) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(coalesce(sum(j4), 0) AS BIGINT) AS sum_j4 FROM p WHERE j4 >= 5000"),
    "q_ann_brute" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, " +
        "list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id != q.query_id), " +
        "r AS (SELECT query_id, neighbor_id, sim, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s) " +
        "SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(sim, 4) AS sim " +
        "FROM r WHERE rank <= 5 ORDER BY query_id, rank"),
    // deterministic-fixture pins (VERDICT r1 item 5): the generator is seeded,
    // so expected outputs are constants. q_media_pipeline's table is synthesized
    // in-query (dir-independent); q_simhash_dups is pinned at the driver's
    // verify scale (sf0.01).
    "q_simhash_dups" ->
      "SELECT CAST(23 AS BIGINT) AS n_pairs, CAST(37 AS BIGINT) AS sum_hamming",
    "q_fingerprint_dups" ->
      "SELECT CAST(15 AS BIGINT) AS n_pairs, CAST(35 AS BIGINT) AS max_shared",
    "q_media_pipeline" ->
      // bmp_pixel_sum re-derived independently (python splitmix64 over the
      // generator definition = 111418251): the REAL BMP decode path returns
      // exactly the pixel bytes that were encoded into the container
      ("SELECT CAST(440 AS BIGINT) AS n_images, CAST(440 AS BIGINT) AS n_valid, " +
        "CAST(2973228 AS BIGINT) AS total_pixels, CAST(440 AS BIGINT) AS n_resized, " +
        "CAST(650 AS BIGINT) AS n_frames, CAST(440 AS BIGINT) AS n_features, " +
        "CAST(32 AS BIGINT) AS dims, CAST(100 AS BIGINT) AS n_bmp, " +
        "CAST(111418251 AS BIGINT) AS bmp_pixel_sum, " +
        // GIF constants re-derived independently (python splitmix64 over the
        // seededPalettedRgb definition, 80 clips of 20..49 x 16..35): the
        // REAL GIF87a/LZW decode returns exactly the paletted pixels encoded
        "CAST(80 AS BIGINT) AS n_gif, CAST(25021775 AS BIGINT) AS gif_pixel_sum, " +
        // PNG constants re-derived independently (python splitmix64 over the
        // seededRgb definition, 60 images of 24..43 x 18..31): the REAL
        // inflate + un-filter decode returns exactly the bytes encoded
        "CAST(60 AS BIGINT) AS n_png, CAST(18617405 AS BIGINT) AS png_pixel_sum, " +
        // audio constants re-derived independently (python splitmix64 over
        // the seededPcm definition): 100 WAV clips, all valid, sample sum
        // -3287541, all 100 resample to 4 kHz with valid headers
        "CAST(100 AS BIGINT) AS n_wav, CAST(100 AS BIGINT) AS n_wav_valid, " +
        "CAST(-3287541 AS BIGINT) AS wav_sample_sum, CAST(100 AS BIGINT) AS n_wav_resampled, " +
        // AVI constants re-derived independently (python splitmix64 over the
        // fakeAviTable definition): 40 clips, 220 frames total, 120 sampled
        // at every-2nd, real-pixel checksum 19823810
        "CAST(40 AS BIGINT) AS n_avi, CAST(220 AS BIGINT) AS n_avi_frames, " +
        "CAST(120 AS BIGINT) AS n_avi_sampled, CAST(19823810 AS BIGINT) AS avi_pixel_sum, " +
        // animated-GIF constants re-derived independently (python splitmix64
        // over fakeAnimatedGifTable: 30 clips, 2..5 frames): 103 frames,
        // 59 sampled at every-2nd, real LZW-decoded pixel checksum 7546963
        "CAST(30 AS BIGINT) AS n_agif, CAST(103 AS BIGINT) AS n_agif_frames, " +
        "CAST(59 AS BIGINT) AS n_agif_sampled, CAST(7546963 AS BIGINT) AS agif_pixel_sum"),
    "q_embed_dedup" ->
      ("WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id + 1000000, list_transform(v, x -> x * 2) FROM e0), " +
        "p AS (SELECT list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) c " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(count(*) FILTER (c >= 0.99) AS BIGINT) AS n_exact FROM p WHERE c >= 0.9"),
    "q_bpe_tokens" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(len(regexp_extract_all(props, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]'))) AS BIGINT) AS sum_bpe_tokens, " +
        "CAST(sum(len(string_split(props, ' '))) AS BIGINT) AS sum_ws_tokens " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_encoded_filter" ->
      ("SELECT CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de, " +
        "CAST(0 AS BIGINT) AS n_zz, " +
        "CAST(sum(CASE WHEN doc_id = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_id7, " +
        "CAST(sum(CASE WHEN doc_id BETWEEN 100 AND 199 THEN 1 ELSE 0 END) AS BIGINT) AS n_id_range, " +
        "CAST(count(*) AS BIGINT) AS n_all, " +
        "CAST(sum(CASE WHEN doc_id BETWEEN 300 AND 399 THEN 1 ELSE 0 END) AS BIGINT) AS n_id_range2, " +
        "CAST(sum(CASE WHEN doc_id >= 400 AND doc_id < 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_id_range3, " +
        "CAST(sum(CASE WHEN lang >= 'd' AND lang < 'e' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_range, " +
        "CAST(sum(CASE WHEN lang >= 'e' AND lang <= 'ez' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_range2, " +
        "CAST(sum(CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_prefix, " +
        "CAST(sum(CASE WHEN source LIKE 'src2%' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_prefix2, " +
        "CAST(sum(CASE WHEN lang IN ('en', 'de', 'fr') THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_in, " +
        "CAST(sum(CASE WHEN doc_id IN (5, 50, 500) THEN 1 ELSE 0 END) AS BIGINT) AS n_id_in " +
        "FROM documents"),
    "q_ngram_jaccard" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "d AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+1], ' ') " +
        "for i in generate_series(1, greatest(len(toks)-1, 1))]) AS sh FROM t), " +
        "p AS (SELECT (CAST(10000 AS BIGINT) * len(list_intersect(a.sh, b.sh))) " +
        "// len(list_distinct(a.sh || b.sh)) AS j4 " +
        "FROM d a JOIN d b ON a.doc_id < b.doc_id) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(coalesce(max(j4), 0) AS BIGINT) AS max_j4 FROM p WHERE j4 >= 4000")
  )
}
