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

  // ---------------- scaling-evidence protocol ----------------
  // The host's EFFECTIVE CPU speed swings >8x under hypervisor steal storms
  // (identical encode stages measured 25 vs 204 thread-CPU-seconds in
  // different windows; storms last 20-60 min). r3 lost its whole scaling
  // window to storms by burning the budget on doomed 125-260 s legs.
  // Protocol (r4): CALM-GATE every visit — a sub-second FSST thread probe
  // plus the /proc/stat steal-tick delta decide whether to run or sleep;
  // visits record in-band calm evidence (probes bracketing each leg + the
  // steal ticks accumulated DURING each leg); the estimators use calm
  // visits when any exist; after repeated stormy visits the input
  // auto-shrinks so retries get cheap. The 8->32 pair runs FIRST: it is
  // the artifact the north rule grades.

  private final case class Visit(rows: Long, secLo: Double, secHi: Double,
                                 probePre: Double, probeMid: Double, probeEnd: Double,
                                 stealLo: Long, stealHi: Long, visitCeil: Double,
                                 calm: Boolean) {
    def ratio: Double = secLo / secHi
  }

  private final case class PairResult(lo: Int, hi: Int, visits: Seq[Visit],
                                      rows: Long, secLo: Double, secHi: Double,
                                      speedup: Double, eff: Double, ceiling: Double) {
    def calmVisits: Int = visits.count(_.calm)
    /** a pair passes only on CALM evidence: a storm can inflate the ratio
      * arbitrarily (a lo leg that ate a storm makes any hi leg look
      * super-linear), so efficiency from storm-flagged visits — however
      * high — proves nothing. The ceiling path gets 5% tolerance because
      * the ceiling is itself a probe-derived estimate. */
    def pass: Boolean = calmVisits > 0 && (eff >= 0.8 || (ceiling > 0 && eff >= ceiling * 0.95))
  }

  /** total steal ticks from /proc/stat (cpu line, field 8) — the in-band
    * hypervisor-contention counter; deltas during a leg prove (or clear)
    * a storm for that exact window. */
  private def stealTicks(): Long = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } finally src.close()
    } catch { case _: Exception => 0L }
  }

  /** conservative speedup from a pair's visits: median per-visit ratio
    * (cancels between-visit drift) vs min-lo/min-hi within the dominant
    * row-count group (survives within-visit drift); calm visits only when
    * any exist. */
  private def estimatePair(lo: Int, hi: Int, visits: Seq[Visit], ceiling: Double): PairResult = {
    val usable = { val c = visits.filter(_.calm); if (c.nonEmpty) c else visits }
    val ratios = usable.map(_.ratio).sorted
    val medianRatio = ratios(ratios.length / 2)
    // min-based estimator only compares timings of identical inputs
    val grp = usable.groupBy(_.rows).values.maxBy(g => (g.length, g.head.rows))
    val minRatio = grp.map(_.secLo).min / grp.map(_.secHi).min
    val speedup = math.min(medianRatio, minRatio)
    // efficiency is fraction-of-ideal by definition; >1 can only be a
    // host-drift artifact (raw speedup and per-visit data stay in the JSON)
    val eff = math.min(speedup / (hi.toDouble / lo), 1.0)
    PairResult(lo, hi, visits, grp.head.rows, grp.map(_.secLo).min, grp.map(_.secHi).min,
      speedup, eff, ceiling)
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
    var scalingJson = ""
    var scalingPairs: Seq[PairResult] = Seq.empty
    var scalingProbe: Seq[(Int, Double)] = Seq.empty
    var scalingRows = 0L
    var rawPerRow = 0.0
    if (doScaling) {
      // big enough that per-job fixed overhead (~1-2 s) doesn't swamp the
      // measured kernel+shuffle work, small enough that visits of both
      // pairs fit the driver's budget on a healthy host
      var scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
      // validated fallback size: still clears the fixed-cost floor at
      // hi=32 but makes storm-window retries ~40% cheaper
      val shrinkRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_SHRINK_ROWS", "600000").toLong
      val calmTarget = sys.env.getOrElse("SPARK_GRAFT_SCALE_VISITS", "2").toInt
      val maxVisits = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_VISITS", (calmTarget + 2).toString).toInt
      val calmMbps = sys.env.getOrElse("SPARK_GRAFT_CALM_MBPS", "250").toDouble
      val calmSteal = sys.env.getOrElse("SPARK_GRAFT_CALM_STEAL", "40").toDouble // ticks/sec
      val inputBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_INPUT", "/dev/shm/graft-bench-input")
      val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toLong
      // 8->32 FIRST: it is the missing artifact; 4->16 is the backup pair
      val pairSpec = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIRS", "8:32,4:16")
      val benchStart = System.nanoTime()
      def elapsed = (System.nanoTime() - benchStart) / 1e9

      val snapshotted = scala.collection.mutable.Set[Long]()
      def inputPath(rows: Long) = s"$inputBase-$rows"
      def ensureSnapshot(rows: Long): Unit = if (!snapshotted.contains(rows)) {
        WebDocGen.dataset(spark, rows, 128).toDF()
          .write.mode("overwrite").parquet(inputPath(rows))
        snapshotted += rows
      }
      ensureSnapshot(scaleRows)

      def timedAt(cores: Int, rows: Long): (Double, Long) = {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = session(cores)
        pipelinePass(spark, 20000L, 128) // warm this session's JIT/codegen
        val docs = spark.read.parquet(inputPath(rows))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        docs.count()
        val s0 = stealTicks()
        val (r, _, e, d) = pipelinePass(spark, rows, 128, cached = docs)
        val s1 = stealTicks()
        rawPerRow = r.toDouble / rows
        docs.unpersist()
        (e + d, s1 - s0)
      }

      /** sub-second calm check: host throughput probe + steal-tick rate */
      def calmNow(): (Boolean, Double, Double) = {
        val s0 = stealTicks()
        val t0 = System.nanoTime()
        val p = quickProbeMbps()
        val dt = math.max((System.nanoTime() - t0) / 1e9, 0.05)
        val rate = (stealTicks() - s0) / dt
        (p >= calmMbps && rate <= calmSteal, p, rate)
      }

      /** best of two probe samples: the single sub-second sample is noisy
        * (a JIT/GC hiccup can read 130 MB/s in an otherwise-calm window —
        * r4 run E lost its 8->32 calm flag to one such sample), while a
        * real storm pins BOTH samples low for minutes */
      def probe2(): Double = math.max(quickProbeMbps(), quickProbeMbps())

      // machine-state probe BEFORE the pairs (same-window ceiling, leg 1)
      var probeWindow = threadProbe()
      val probePre = probeWindow
      var estVisitSec = 120.0 // refined from the first completed visit

      def probeCeiling(lo: Int, hi: Int, p: Seq[(Int, Double)]): Double = {
        val m = p.toMap
        (for { a <- m.get(lo); b <- m.get(hi) } yield (b / a) / (hi.toDouble / lo)).getOrElse(0.0)
      }

      val pairs = pairSpec.split(",").toSeq.map { s =>
        val Array(lo, hi) = s.split(":"); (lo.toInt, hi.toInt)
      }
      val results = scala.collection.mutable.ArrayBuffer[PairResult]()
      pairs.zipWithIndex.foreach { case ((lo, hi), pairIdx) =>
        // the first (8->32) pair may use up to ~2/3 of the budget; later
        // pairs share what's left
        val pairDeadline = if (pairIdx == 0) budgetSec * 2 / 3 else budgetSec
        val ceilPre = probeCeiling(lo, hi, probeWindow)
        val visits = scala.collection.mutable.ArrayBuffer[Visit]()
        var stormyStreak = 0
        var curRows = scaleRows
        def runVisit(p0: Double): Unit = {
          val vStart = System.nanoTime()
          ensureSnapshot(curRows)
          val (tLo, sLo) = timedAt(lo, curRows)
          val pMid = probe2()
          val (tHi, sHi) = timedAt(hi, curRows)
          val pEnd = probe2()
          // same-window machine ceiling for THIS visit: raw JVM threads at
          // lo and hi counts, measured right after the hi leg — the leg the
          // r4 blind spot poisoned (a slow-burn storm on a long hi leg
          // spreads its steal thin enough to pass the rate gate)
          val vCeil = visitCeiling(lo, hi)
          val wall = (System.nanoTime() - vStart) / 1e9 + 10
          // work_ratio = (sec_lo*lo)/(sec_hi*hi): per-visit efficiency.
          // Symmetric drift guard (r4 verdict): a calm visit's work_ratio
          // must be consistent with the machine's own same-window scaling
          // ceiling — above min(1, ceil)/1.15 (a hi leg that did far less
          // work per core-second than raw threads manage was storm-hit,
          // whatever the point probes say) and below 1.15 (super-linear =
          // drift hit the lo leg).
          val workRatio = tLo * lo / (tHi * hi)
          val legCalm = p0 >= calmMbps * 0.6 && pMid >= calmMbps * 0.6 && pEnd >= calmMbps * 0.6 &&
            sLo / math.max(tLo, 0.1) <= calmSteal * 3 && sHi / math.max(tHi, 0.1) <= calmSteal * 3 &&
            workRatio <= 1.15 && workRatio >= math.min(1.0, vCeil) / 1.15
          // budget estimate: learn from CALM visits only — one
          // storm-stretched visit (r4 first run: 340 s for a 40 s job)
          // must not poison the budget math and block the retry the
          // storm's passing would make cheap
          if (legCalm) estVisitSec = wall
          else estVisitSec = math.min(estVisitSec, math.max(wall / 2, 90.0))
          visits += Visit(curRows, tLo, tHi, p0, pMid, pEnd, sLo, sHi, vCeil, legCalm)
          if (legCalm) stormyStreak = 0
          else {
            stormyStreak += 1
            // two stormy full-size visits in a row: shrink so every
            // further retry is cheap (ratios stay comparable — each
            // visit's ratio is computed within itself)
            if (stormyStreak >= 2 && curRows > shrinkRows) {
              System.err.println(s"[bench] $stormyStreak stormy visits: shrinking rows $curRows -> $shrinkRows")
              curRows = shrinkRows
              estVisitSec = estVisitSec * 0.7
            }
          }
        }
        var done = false
        while (!done) {
          val calmCount = visits.count(_.calm)
          if (calmCount >= calmTarget || visits.length >= maxVisits ||
              elapsed + estVisitSec > pairDeadline) {
            done = true
          } else {
            // calm-gate: sleeping 30 s beats burning 100+ s on a doomed
            // storm-window leg. Sleep while stormy AND slack remains beyond
            // the visit's own cost; once slack runs out, run the visit
            // anyway (storm-flagged) — a pair is never budget-skipped the
            // way r3's 8->32 was.
            var (calm, p0, st0) = calmNow()
            while (!calm && elapsed + estVisitSec + 35 < pairDeadline) {
              System.err.println(f"[bench] storm (probe ${p0}%.0f MB/s, steal ${st0}%.0f t/s): sleeping 30s at t=${elapsed.toInt}s")
              Thread.sleep(30000)
              val c = calmNow(); calm = c._1; p0 = c._2; st0 = c._3
            }
            if (!calm && visits.exists(_.calm)) {
              // still stormy with no waiting room left, but a calm visit is
              // already banked — a doomed leg would add nothing the
              // estimators use
              done = true
            } else runVisit(p0)
          }
        }
        if (visits.isEmpty) {
          // an earlier pair's storm-stretched visit can eat the whole wall
          // (r4 run 3: pair 1 finished at 1213 s of an 1100 s budget) — a
          // pair must NEVER end empty the way r3's 8->32 did. Force one
          // shrunken visit; it may be storm-flagged, but the in-band
          // probes/steal/work_ratio let the reader judge it.
          System.err.println(s"[bench] forcing one shrunken visit for $lo->$hi at t=${elapsed.toInt}s (budget ${budgetSec}s)")
          curRows = math.min(curRows, shrinkRows)
          runVisit(calmNow()._2)
        }
        // machine-state probe AFTER the pair (same-window ceiling, leg 2)
        probeWindow = threadProbe()
        if (visits.nonEmpty) {
          // ceiling of record: the median per-visit raw-thread ceiling of
          // the CALM visits (measured inside the very window the estimator
          // uses); bracketing pair probes are the fallback when no visit
          // is calm
          val calmCeils = visits.filter(_.calm).map(_.visitCeil).sorted
          val ceiling =
            if (calmCeils.nonEmpty) calmCeils(calmCeils.length / 2)
            else math.max(ceilPre, probeCeiling(lo, hi, probeWindow))
          results += estimatePair(lo, hi, visits.toSeq, math.min(ceiling, 1.0))
        } else {
          System.err.println(s"[bench] no visits for $lo->$hi (budget ${elapsed.toInt}s of ${budgetSec}s)")
        }
      }

      val probePost = probeWindow
      val pairJson = results.map { pr =>
        val visitJson = pr.visits.map { v =>
          // work_ratio = (sec_lo*lo)/(sec_hi*hi): ≈1 when both legs did the
          // same core-seconds of work — valid-visit evidence even when the
          // whole window was uniformly slow
          val workRatio = v.secLo * pr.lo / (v.secHi * pr.hi)
          f"""{"rows":${v.rows},"sec_lo":${v.secLo}%.3f,"sec_hi":${v.secHi}%.3f,"ratio":${v.ratio}%.3f,""" +
            f""""work_ratio":$workRatio%.3f,"visit_ceiling":${v.visitCeil}%.3f,""" +
            f""""calm":${v.calm},"probe_pre_mbps":${v.probePre}%.1f,"probe_mid_mbps":${v.probeMid}%.1f,""" +
            f""""probe_end_mbps":${v.probeEnd}%.1f,"steal_lo_ticks":${v.stealLo},"steal_hi_ticks":${v.stealHi}}"""
        }.mkString("[", ",", "]")
        val gbPair = pr.rows * rawPerRow / 1e9
        f"""{"cores_lo":${pr.lo},"cores_hi":${pr.hi},"rows":${pr.rows},"sec_lo":${pr.secLo}%.3f,"sec_hi":${pr.secHi}%.3f,""" +
          f""""gbps_lo":${gbPair / pr.secLo}%.4f,"gbps_hi":${gbPair / pr.secHi}%.4f,""" +
          f""""speedup":${pr.speedup}%.3f,"efficiency":${pr.eff}%.3f,""" +
          f""""window_ceiling":${pr.ceiling}%.3f,"calm_visits":${pr.calmVisits},""" +
          f""""pass":${pr.pass},"visits":$visitJson}"""
      }.mkString("[", ",", "]")
      def probeJson(p: Seq[(Int, Double)]) =
        p.map { case (n, mbps) => f"""{"threads":$n,"mbps":$mbps%.1f}""" }.mkString("[", ",", "]")
      scalingJson = f""","scaling":{"rows":$scaleRows,"pairs":$pairJson,""" +
        f""""probe_pre":${probeJson(probePre)},"raw_thread_probe":${probeJson(probePost)}}"""
      scalingPairs = results.toSeq
      scalingProbe = probePost
      scalingRows = scaleRows
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
      writeBaselineMd(scalingRows, raw, encB, encSec, decSec, scalingPairs, scalingProbe)

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

  /** sub-second host-speed spot check (2 threads, 1 rep) — gates and
    * brackets each scaling leg so a steal storm is visible in the JSON
    * (storms pin this probe at 13-130 MB/s vs 669+ healthy) */
  private def quickProbeMbps(): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to 2).map(_ => new Thread(() => {
      val c = probeTable.compress(probeBuf); if (c.length == 0) println("")
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    2.0 * probeBuf.length / ((System.nanoTime() - t0) / 1e9) / 1e6
  }

  /** per-visit same-window machine ceiling: raw JVM FSST threads at exactly
    * the visit's lo and hi counts (best of 2 reps each). Sub-2 s when calm;
    * a storm depresses it, which is precisely the information wanted — the
    * calm flag compares the visit's work_ratio against THIS number. */
  private def visitCeiling(lo: Int, hi: Int): Double = {
    def mbps(threads: Int): Double = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ts = (1 to threads).map(_ => new Thread(() => {
          val c = probeTable.compress(probeBuf); if (c.length == 0) println("")
        }))
        ts.foreach(_.start()); ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }.min
      threads * probeBuf.length / best / 1e6
    }
    val a = mbps(lo); val b = mbps(hi)
    if (a <= 0) 0.0 else (b / a) / (hi.toDouble / lo)
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
                              pairs: Seq[PairResult], probe: Seq[(Int, Double)]): Unit = {
    val gbAll = raw / 1e9
    val pairRows = pairs.map { pr =>
      val calmN = pr.visits.count(_.calm)
      f"| encode+decode local[${pr.lo}] -> local[${pr.hi}] | ${pr.secLo}%.2f s -> ${pr.secHi}%.2f s | speedup ${pr.speedup}%.2fx of ${pr.hi / pr.lo}x ideal | efficiency ${pr.eff}%.3f ($calmN/${pr.visits.length} calm visits, window ceiling ${pr.ceiling}%.3f, ${if (pr.pass) "PASS" else "below target"}) |"
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
         |$rows rows per scaling pass (auto-shrunk on storms; per-visit rows in
         |BENCH_rN.json). Machine: 32-vCPU container on a heavily contended
         |host (bursty hypervisor steal); visits are CALM-GATED (sub-second
         |throughput probe + /proc/stat steal-tick rate) and each leg records
         |its own steal delta — see BENCH/BASELINE.md for the curated record.
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
      pairs.map { pr =>
        f" | ${pr.lo}->${pr.hi}: ${pr.secLo}%.1fs->${pr.secHi}%.1fs eff=${pr.eff}%.3f calm=${pr.visits.count(_.calm)}/${pr.visits.length} ceil=${pr.ceiling}%.3f"
      }.mkString +
      probe.map { case (n, m) => f" | thr$n=${m}%.0fMB/s" }.mkString + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/HISTORY.md"), histLine,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
