package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EncodePipeline
import graft.sources.WebDocGen

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, measures encode+decode pipeline throughput on the
  * synthetic WebDoc table, and — unless SPARK_GRAFT_SCALING=0 — evidences the
  * two-cluster-size scaling rule by running the identical pipeline at
  * local[LO] and local[HI] on the same input (sandbox stand-in for N vs 4N
  * executors; BASELINE.md). Prints ONE JSON line; also writes the raw
  * measurements to BENCH/LAST_RUN.md and appends BENCH/HISTORY.md
  * (BENCH/BASELINE.md is the manually curated cross-run record).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // <200 reducers would pick BypassMergeSortShuffleWriter: 128 writers
      // x 128 tasks of buffered lz4 streams. Force the serialized
      // (tungsten-sort) writer instead - one sorter, one spill file per task.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** one encode+decode+verify pass; returns (rawBytes, encodedBytes, encodeSec, decodeSec).
    * The input is materialized (cached) before the clock starts so the GB/s
    * numbers measure the pipeline, not the synthetic generator; `cached`
    * lets repeated passes over the same input share one generation. */
  private def pipelinePass(spark: SparkSession, rows: Long, partitions: Int,
                           cached: org.apache.spark.sql.DataFrame = null): (Long, Long, Double, Double) = {
    val docs = if (cached != null) cached else {
      val d = WebDocGen.dataset(spark, rows, partitions).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    val t0 = System.nanoTime()
    val enc = EncodePipeline.encode(docs, "url", partitions,
      blockSize = 4096, partExpr = Some(EncodePipeline.saltedHostPart("url", partitions, 4)))
    enc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = enc.agg(
      sum(expr("r_url + r_warc_ts + r_html + r_text + r_lang")).as("raw"),
      sum(expr("octet_length(e_url) + octet_length(e_warc_ts) + octet_length(e_html) + " +
        "octet_length(e_text) + octet_length(e_lang)")).as("enc")).head()
    val t1 = System.nanoTime()
    val decoded = EncodePipeline.decode(enc, docs.schema)
    val nDecoded = decoded.count()
    val t2 = System.nanoTime()
    require(nDecoded == rows, s"decode row count $nDecoded != $rows")
    val raw = agg.getLong(0); val encB = agg.getLong(1)
    enc.unpersist()
    if (cached == null) docs.unpersist()
    (raw, encB, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 400k rows ≈ 326 MB raw: big enough that the 32-core headline GB/s is
    // not dominated by per-job fixed overhead (~1-2 s)
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "400000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    var spark = session(cpus)

    // ---- two-parallelism scaling evidence (same input, same code) ----
    // Runs FIRST: the scaling pairs are the BASELINE.json north-rule
    // evidence and must land inside this JSON even if a steal storm or the
    // driver's wall budget cuts the run short downstream.
    // The host's EFFECTIVE CPU speed swings >8x under contention (identical
    // encode stages measured 25 vs 204 thread-CPU-seconds on different
    // windows), so a lo-level and a hi-level measured half an hour apart are
    // incomparable. Protocol: the input is snapshotted to parquet once, then
    // lo and hi sessions ALTERNATE (lo,hi,lo,hi,…) so each visit pair shares
    // one host window; the reported speedup is the MEDIAN of per-visit
    // ratios (drift cancels in the ratio), and thread probes bracket the
    // whole window to record the machine's own scaling ceiling.
    var scalingJson = ""
    var scalingMeasured: Seq[(Int, Int, Double, Double, Double, Double)] = Seq.empty
    var scalingProbe: Seq[(Int, Double)] = Seq.empty
    var scalingRows = 0L
    var scalingRaw = 0L
    if (doScaling) {
      // big enough that per-job fixed overhead (~1-2 s: scheduling 128 tasks,
      // plan compile) doesn't swamp the measured kernel+shuffle work, small
      // enough that 2 visits of both pairs fit the driver's budget even on a
      // slow host window (r2 lesson: 1.6M rows x 3 visits overran it)
      val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
      val visits = sys.env.getOrElse("SPARK_GRAFT_SCALE_VISITS", "2").toInt
      val inputPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_INPUT", "/dev/shm/graft-bench-input")
      var rawScale = 0L
      // snapshot the deterministic input once; every visit re-reads it (tmpfs)
      WebDocGen.dataset(spark, scaleRows, 128).toDF()
        .write.mode("overwrite").parquet(inputPath)
      def timedAt(cores: Int): Double = {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = session(cores)
        pipelinePass(spark, 20000L, 128) // warm this session's JIT/codegen
        val docs = spark.read.parquet(inputPath)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        docs.count()
        val (r, _, e, d) = pipelinePass(spark, scaleRows, 128, cached = docs)
        rawScale = r
        docs.unpersist()
        e + d
      }
      // machine-state probe BEFORE the pairs (see above: 8x swings)
      val probePre = threadProbe()
      // wall budget: never let a slow-host phase keep the driver's bench
      // from emitting its JSON line — skip remaining visits when exceeded
      val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toLong
      val benchStart = System.nanoTime()
      def elapsed = (System.nanoTime() - benchStart) / 1e9
      // 8->32 gets an extra visit: its per-visit cost is small (no 4-core
      // leg) and min-of-ratios then survives one in-visit steal storm — the
      // r3 first run lost the pair to a storm that pinned a 4-thread probe
      // at 14 MB/s (vs 669 minutes earlier). SPARK_GRAFT_SCALE_PAIRS
      // ("lo:hi,lo:hi") selects pairs for storm-dodging single-pair retries.
      val pairSpec = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIRS", "4:16,8:32")
      val pairs = pairSpec.split(",").toSeq.map { s =>
        val Array(lo, hi) = s.split(":")
        (lo.toInt, hi.toInt, if (hi.toInt >= 32) visits + 1 else visits)
      }
      val measured = pairs.flatMap { case (lo, hi, nVisits) =>
        val vs = (1 to nVisits).flatMap { v =>
          if (elapsed > budgetSec) {
            System.err.println(s"[bench] budget exceeded (${elapsed.toInt}s), skipping $lo->$hi visit $v")
            None
          } else {
            val tLo = timedAt(lo)
            val pMid = quickProbeMbps()
            val tHi = timedAt(hi)
            val pEnd = quickProbeMbps()
            Some((tLo, tHi, pMid, pEnd))
          }
        }
        if (vs.isEmpty) None
        else {
          // two estimators, robust to different failure modes: the median
          // per-visit ratio cancels BETWEEN-visit drift; min-lo/min-hi uses
          // each level's calmest window and survives WITHIN-visit drift
          // (a visit whose hi half hit a slow phase). Report the smaller
          // (conservative) as the headline speedup.
          val ratios = vs.map { case (l, h, _, _) => l / h }.sorted
          val medianRatio = ratios(ratios.length / 2)
          val minRatio = vs.map(_._1).min / vs.map(_._2).min
          val speedup = math.min(medianRatio, minRatio)
          // efficiency is fraction-of-ideal by definition; >1 can only be a
          // host-drift artifact (the raw speedup and per-visit ratios stay
          // in the JSON for the reader to judge)
          val eff = math.min(speedup / (hi.toDouble / lo), 1.0)
          Some((lo, hi, vs.map(_._1).min, vs.map(_._2).min, speedup, eff, vs))
        }
      }
      val probe = threadProbe()
      val gbHere = rawScale / 1e9
      val pairJson = measured.map { case (lo, hi, tLo, tHi, sp, eff, vs) =>
        val visitJson = vs.map { case (l, h, pm, pe) =>
          f"""{"sec_lo":$l%.3f,"sec_hi":$h%.3f,"ratio":${l / h}%.3f,""" +
            f""""probe_mid_mbps":$pm%.1f,"probe_end_mbps":$pe%.1f}"""
        }.mkString("[", ",", "]")
        f"""{"cores_lo":$lo,"cores_hi":$hi,"sec_lo":$tLo%.3f,"sec_hi":$tHi%.3f,""" +
          f""""gbps_lo":${gbHere / tLo}%.4f,"gbps_hi":${gbHere / tHi}%.4f,""" +
          f""""speedup":$sp%.3f,"efficiency":$eff%.3f,"visits":$visitJson}"""
      }.mkString("[", ",", "]")
      val probeJson = probe.map { case (n, mbps) => f"""{"threads":$n,"mbps":$mbps%.1f}""" }
        .mkString("[", ",", "]")
      val probePreJson = probePre.map { case (n, mbps) => f"""{"threads":$n,"mbps":$mbps%.1f}""" }
        .mkString("[", ",", "]")
      scalingJson = f""","scaling":{"rows":$scaleRows,"pairs":$pairJson,""" +
        f""""probe_pre":$probePreJson,"raw_thread_probe":$probeJson}"""
      scalingMeasured = measured.map(m => (m._1, m._2, m._3, m._4, m._5, m._6))
      scalingProbe = probe
      scalingRows = scaleRows
      scalingRaw = rawScale
      // scaling left `spark` at the last visit's core count — restore
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      spark = session(cpus)
    }

    // ---- per-query timings on the driver's testdata ----
    // (SPARK_GRAFT_QUERIES=0 skips them when iterating on pipeline scaling;
    // SPARK_GRAFT_QUERY_FILTER=a,b,c restricts to named queries)
    val qFilter = sys.env.get("SPARK_GRAFT_QUERY_FILTER").map(_.split(",").toSet)
    val results =
      if (sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") == "0") Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => qFilter.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).collect() } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }

    // ---- pipeline throughput at the session's parallelism ----
    val warm = pipelinePass(spark, math.min(benchRows / 4, 50000L).max(1000L), cpus * 4)
    val (raw, encB, encSec, decSec) = pipelinePass(spark, benchRows, cpus * 4)
    val gb = raw / 1e9

    if (doScaling)
      writeBaselineMd(scalingRows, raw, encB, encSec, decSec, scalingRaw / 1e9,
        scalingMeasured, scalingProbe)

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pipelineJson = f""""pipeline":{"rows":$benchRows,"raw_bytes":$raw,"encoded_bytes":$encB,""" +
      f""""ratio":${raw.toDouble / encB}%.3f,"encode_sec":$encSec%.3f,"decode_sec":$decSec%.3f,""" +
      f""""gbps_encode":${gb / encSec}%.4f,"gbps_decode":${gb / decSec}%.4f,"warm_encode_sec":${warm._3}%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",$pipelineJson$scalingJson}""")
    spark.stop()
  }

  // shared probe fixture (built once; threadProbe and the per-leg spot
  // checks must measure the HOST, not their own setup)
  private lazy val probeBuf: Array[Byte] = {
    val rnd = new scala.util.Random(42)
    val words = ("the of and to in is was for on that with as by at from it an " +
      "be this are which has had were their one all data page web site news").split(" ")
    val sb = new StringBuilder
    while (sb.length < (4 << 20)) sb.append(words(rnd.nextInt(words.length))).append(' ')
    sb.toString.getBytes("UTF-8")
  }
  private lazy val probeTable: graft.core.Fsst.SymbolTable =
    graft.core.Fsst.train(java.util.Arrays.copyOf(probeBuf, 1 << 14))

  /** sub-second host-speed spot check (2 threads, 1 rep) — brackets each
    * scaling leg so an in-visit steal storm is visible in the JSON (the
    * r3 first run's 8→32 pair was destroyed by a storm that pinned this
    * probe at 14 MB/s vs 669 MB/s minutes earlier) */
  private def quickProbeMbps(): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to 2).map(_ => new Thread(() => {
      val c = probeTable.compress(probeBuf); if (c.length == 0) println("")
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    2.0 * probeBuf.length / ((System.nanoTime() - t0) / 1e9) / 1e6
  }

  /** pure-JVM FSST-compress thread-scaling probe: the host ceiling. */
  private def threadProbe(): Seq[(Int, Double)] = {
    def run(threads: Int): Double = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ts = (1 to threads).map(_ => new Thread(() => {
          val c = probeTable.compress(probeBuf); if (c.length == 0) println("")
        }))
        ts.foreach(_.start()); ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }.min
      threads * probeBuf.length / best / 1e6
    }
    run(2)
    Seq(4, 8, 16, 32).map(n => n -> run(n))
  }

  private def writeBaselineMd(rows: Long, raw: Long, encB: Long, encSec: Double, decSec: Double,
                              gb: Double, pairs: Seq[(Int, Int, Double, Double, Double, Double)],
                              probe: Seq[(Int, Double)]): Unit = {
    val gbAll = raw / 1e9
    val pairRows = pairs.map { case (lo, hi, tLo, tHi, sp, eff) =>
      f"| encode+decode local[$lo] -> local[$hi] | $tLo%.2f s -> $tHi%.2f s | speedup $sp%.2fx of ${hi / lo}x ideal | efficiency $eff%.3f |"
    }.mkString("\n")
    val probeMap = probe.toMap
    val probePairs = Seq((4, 16), (8, 32)).flatMap { case (lo, hi) =>
      for { a <- probeMap.get(lo); b <- probeMap.get(hi) }
        yield f"| raw JVM threads $lo -> $hi (no Spark) | ${a}%.0f -> ${b}%.0f MB/s | speedup ${b / a}%.2fx | machine ceiling ${(b / a) / (hi / lo)}%.3f |"
    }.mkString("\n")
    val md =
      f"""# BENCH/LAST_RUN — latest bench output (see HISTORY.md for all runs)
         |
         |Input: deterministic synthetic WebDoc table (WebDocGen, seed fixed),
         |$rows rows per scaling pass, ${gb}%.3f GB raw across url/warc_ts/html/text/lang.
         |Machine: 32-vCPU container on a heavily contended host (bursty
         |hypervisor steal); numbers are min-of-N within this run — see
         |BENCH/BASELINE.md for the curated cross-run record.
         |
         || metric | value | | |
         ||---|---|---|---|
         || compression ratio (raw/encoded) | ${raw.toDouble / encB}%.3f | | |
         || encode throughput @ 32 cores | ${gbAll / encSec}%.4f GB/s | decode | ${gbAll / decSec}%.4f GB/s |
         |@PAIRS@
         |@PROBES@
         |""".stripMargin
        .replace("@PAIRS@", pairRows)
        .replace("@PROBES@", probePairs)
    val dir = new java.io.File("BENCH")
    dir.mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/LAST_RUN.md"), md)
    val histLine = new java.util.Date().toString + " | ratio=" + f"${raw.toDouble / encB}%.3f" +
      pairs.map { case (lo, hi, tLo, tHi, sp, eff) =>
        f" | $lo->$hi: $tLo%.1fs->$tHi%.1fs eff=$eff%.3f"
      }.mkString +
      probe.map { case (n, m) => f" | thr$n=${m}%.0fMB/s" }.mkString + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/HISTORY.md"), histLine,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
