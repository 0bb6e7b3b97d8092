package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftshim.Bridge.{column => toCol, expression => toExpr}

/** Training-data-pipeline operators over document tables: tokenization,
  * quality stats, exact and near-duplicate detection (MinHash+LSH, SimHash,
  * n-gram Jaccard), language ID, and embedding similarity search.
  *
  * Everything is declarative Column algebra (higher-order array functions,
  * window functions, broadcast joins) so Catalyst plans and scales it; the
  * two scalar kernels that built-ins can't express (SimHash, language ID)
  * are custom expressions (graft.functions.TextExpressions).
  */
object TextOps {

  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** n-token shingles: ["a b c d"], n=2 → ["a b","b c","c d"] */
  def tokenShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    transform(sequence(lit(1), greatest(size(ts) - (n - 1), lit(1))),
      j => concat_ws(" ", slice(ts, j, lit(n))))
  }

  /** k MinHash signatures in one pass (custom expression — k nested Catalyst
    * lambdas over the shingle array would re-evaluate it k times) */
  def minhash(shingles: Column, k: Int): Column =
    toCol(graft.functions.MinHashSig(toExpr(shingles), k))

  /** LSH band keys: the signature split into `bands` hashed groups */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  def simhash(text: Column): Column = toCol(graft.functions.SimHash64(toExpr(tokens(text))))

  def langGuess(text: Column): Column = toCol(graft.functions.LangGuess(toExpr(text)))

  /** simple quality signals: char/token/alpha/punct counts plus the derived
    * ratios (the counts are integer-exact — cross-engine comparable). */
  def qualityStats(text: Column): Column = {
    val len = length(text).cast("double")
    struct(
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
      length(regexp_replace(text, "[^\\p{L}]", "")).as("n_alpha"),
      length(regexp_replace(text, "[^.,;:!?]", "")).as("n_punct"),
      (length(regexp_replace(text, "[^\\p{L}]", "")) / greatest(len, lit(1.0))).as("alpha_ratio"),
      (length(regexp_replace(text, "[^.,;:!?]", "")) / greatest(len, lit(1.0))).as("punct_ratio"),
      (len / greatest(tokenCount(text).cast("double"), lit(1.0))).as("mean_token_len"))
  }

  /** exact duplicate groups by full-text hash */
  def exactDupStats(df: DataFrame, text: String): DataFrame =
    df.groupBy(xxhash64(col(text)).as("h")).count()
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("count") > 1, col("count")).otherwise(0L)).cast("long").as("n_dup_rows"),
        max(col("count")).cast("long").as("max_group"))

  /** MinHash+LSH near-duplicate pairs, verified with exact shingle Jaccard.
    * Returns one row per *representative* pair:
    * (id_a, id_b, j4, n_pairs) where j4 = ⌊10000·|∩|/|∪|⌋ (integer-exact, no
    * float-order ambiguity) and n_pairs = number of underlying document pairs
    * the row stands for. Rows with id_a = id_b are intra-group pairs among
    * exact duplicates (j4 = 10000, n_pairs = C(g,2)).
    *
    * Scale path (the three defenses against the web's duplicate skew):
    * 1. exact-dedup pre-pass — LSH runs over DISTINCT texts only, so a
    *    million-fold exact duplicate contributes ONE signature, not 10^12
    *    candidate pairs; its pair mass is reconstructed arithmetically.
    * 2. candidates come only from LSH-band equi-joins (no all-pairs product).
    * 3. bucket cap — any band bucket holding > maxBucket distinct texts is
    *    dropped (a degenerate shingle cluster; true near-dups still meet in
    *    their other bands with overwhelming probability). */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, maxBucket: Int = 2000,
                      estMargin: Double = 0.2): DataFrame = {
    val thresholdJ4 = math.round(threshold * 10000).toInt
    val margin4 = math.round(estMargin * 10000).toInt
    // 1. exact-dedup: one representative (min id) + group size per distinct text
    val groups = df.groupBy(col(textCol).as("t"))
      .agg(min(col(idCol)).as("id"), count(lit(1)).as("g"))
    // materialize shingle sets + signatures once: they feed three joins, and
    // recomputing the tokenization per join side would dominate the runtime
    val base = groups.select(col("id"), col("g"),
      array_distinct(tokenShingles(col("t"), shingleN)).as("sh"))
      .withColumn("sig", minhash(col("sh"), k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"), explode(lshBands(col("sig"), bands, k / bands)).as("band"))
    // 3. bucket-size cap (skew guard)
    val capped = banded.join(
      banded.groupBy("band").agg(count(lit(1)).as("bc")).filter(col("bc") <= maxBucket),
      "band")
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // 4. signature-estimate pre-filter: the agreeing fraction of the k
    //    minhashes is an unbiased Jaccard estimate (σ ≈ √(J(1-J)/k)), so
    //    candidates estimated ≥ estMargin below threshold are dropped BEFORE
    //    the exact-verify join — the signatures are k longs, the shingle
    //    arrays are multi-KB, and band collisions over a small vocabulary
    //    make the estimate join ~10× cheaper in bytes shuffled than
    //    verifying every candidate. Exact verification still decides; the
    //    added miss probability (a true pair estimating k·estMargin/σ below
    //    its mean) is dominated by the banding miss probability itself.
    val withSigs = cands
      .join(base.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
    val agree = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    val likely = withSigs
      .filter(agree * lit(10000L) >= lit(math.max(0, thresholdJ4 - margin4).toLong) * k)
      .select("id_a", "id_b")
    val withSets = likely
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a"), col("g").as("g_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b"), col("g").as("g_b")), "id_b")
    val cross = withSets.select(col("id_a"), col("id_b"),
        expr("(CAST(10000 AS BIGINT) * size(array_intersect(sh_a, sh_b))) DIV size(array_union(sh_a, sh_b))").as("j4"),
        (col("g_a") * col("g_b")).as("n_pairs"))
      .filter(col("j4") >= thresholdJ4)
    // intra-group pairs among exact duplicates: jaccard is exactly 1
    val intra = base.filter(col("g") > 1)
      .select(col("id").as("id_a"), col("id").as("id_b"),
        lit(10000L).as("j4"), (col("g") * (col("g") - 1) / 2).cast("long").as("n_pairs"))
    cross.unionAll(intra)
  }

  /** SimHash near-duplicate pairs: self-join on 16-bit bands of the 64-bit
    * fingerprint (any pair within hamming ≤ 3 shares at least one exact band),
    * verified by bit_count(xor) ≤ maxHamming. Same exact-dedup pre-pass and
    * weighted-pair output as minhashDupPairs: (id_a, id_b, hamming, n_pairs),
    * id_a = id_b rows are intra-exact-duplicate groups (hamming 0). */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val groups = df.groupBy(col(textCol).as("t"))
      .agg(min(col(idCol)).as("id"), count(lit(1)).as("g"))
    val fp = groups.select(col("id"), col("g"), simhash(col("t")).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fp.select(col("id"), col("g"), col("f"),
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        shiftrightunsigned(col("f"), b * 16).bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("band"))
    val cross = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.f").bitwiseXOR(col("y.f"))).as("hamming"),
        (col("x.g") * col("y.g")).as("n_pairs")).distinct()
      .filter(col("hamming") <= maxHamming)
    val intra = fp.filter(col("g") > 1)
      .select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0).as("hamming"), (col("g") * (col("g") - 1) / 2).cast("long").as("n_pairs"))
    cross.unionAll(intra)
  }

  /** Count runs of equal `valueCol` in global `orderCol` order, at scale:
    * range-partition on the order column, count runs inside each partition
    * with one pass, then stitch partition boundaries with the tiny
    * per-partition (first, last) summary — no single-partition window, no
    * global sort of the data, only a P-row reduction.
    */
  def orderedRunCount(df: DataFrame, orderCol: String, valueCol: String,
                      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 2
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val summarySchema = StructType(Seq(
      StructField("min_order", LongType), StructField("runs", LongType),
      StructField("first_val", StringType), StructField("last_val", StringType)))
    val parts = df.select(col(orderCol).cast("long").as("o"), col(valueCol).cast("string").as("v"))
      .repartitionByRange(p, col("o"))
      .sortWithinPartitions(col("o"))
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var runs = 1L
          var last = first.getString(1)
          while (it.hasNext) {
            val r = it.next()
            if (r.getString(1) != last) { runs += 1; last = r.getString(1) }
          }
          Iterator(Row(first.getLong(0), runs, first.getString(1), last))
        }
      }(org.apache.spark.sql.Encoders.row(summarySchema))
      .collect().sortBy(_.getLong(0))
    var total = 0L
    var prevLast: String = null
    parts.foreach { r =>
      total += r.getLong(1)
      if (prevLast != null && r.getString(2) == prevLast) total -= 1
      prevLast = r.getString(3)
    }
    import spark.implicits._
    Seq(total).toDF("n_runs")
  }

  // ---- embedding similarity ----

  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** brute-force exact top-k cosine neighbors for a (small, broadcast) query
    * set against the full collection — the correctness baseline for ANN. */
  def bruteForceTopK(collection: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = collection.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Driver-side Lloyd k-means on a (small, deterministic) sample — vectors
    * L2-normalized so assignment by dot == cosine. Pure function of the
    * sample: fixed seeds-by-stride init, fixed iteration count. */
  private[operators] def kmeansCentroids(sample: Array[Array[Double]], k: Int,
                                         iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample(0).length
    val norm = sample.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v.clone() else v.map(_ / n)
    }
    val kk = math.min(k, norm.length)
    // stride init: evenly spaced sample points (sample order is deterministic)
    var cents = Array.tabulate(kk)(i => norm(i * norm.length / kk).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      norm.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < kk) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += v(j) * cents(c)(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c) // empty cluster: keep previous centroid
        else {
          var s = 0.0; var j = 0
          while (j < dim) { s += sums(c)(j) * sums(c)(j); j += 1 }
          val n = math.sqrt(s)
          if (n == 0.0) cents(c) else sums(c).map(_ / n)
        }
      }
      it += 1
    }
    cents
  }

  private def ivfAssign(v: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    toCol(graft.functions.IvfAssign(toExpr(v), cents, nprobe))

  /** IVF ANN: k-means centroids trained driver-side on a deterministic sample
    * (lowest-xxhash rows — stable at any parallelism), collection vectors
    * assigned to their nearest centroid in one map pass (no shuffle beyond
    * the candidate equi-join), queries probe the `nprobe` nearest clusters
    * and exact-rerank only those candidates. The scale path between
    * brute-force (exact, O(N·Q)) and LSH (fixed hash planes): recall/cost is
    * tunable per query via nprobe without re-indexing. */
  def ivfTopK(collection: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16, nprobe: Int = 4,
              sampleN: Int = 2048, iters: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    ivfCandidatePairs(collection, queries, idCol, vecCol, nCentroids, nprobe, sampleN, iters)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** the scored IVF candidate set (query_id, neighbor_id, sim) — exposed so
    * callers can pin the recall-vs-cost trade-off: candidate count / (|Q|·N)
    * is the scanned fraction the nprobe setting buys. */
  def ivfCandidatePairs(collection: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, nCentroids: Int = 16, nprobe: Int = 4,
                        sampleN: Int = 2048, iters: Int = 10): DataFrame = {
    val c = collection.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val sample = c.orderBy(xxhash64(col("neighbor_id"))).limit(sampleN)
      .collect().map(_.getSeq[Double](1).toArray)
    val cents = kmeansCentroids(sample, nCentroids, iters)
    val assigned = c.withColumn("cid", element_at(ivfAssign(col("cv"), cents, 1), 1))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cid", explode(ivfAssign(col("qv"), cents, nprobe)))
    probes.join(assigned, "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("sim"))
  }

  /** packed deterministic random-hyperplane signature (⌈planes/64⌉ longs) —
    * a native expression: the Column-algebra formulation interpreted
    * planes × dim lambda closures per row and dominated candidate-generation
    * cost (graft.functions.HyperplaneSig) */
  private def hyperplaneSig(v: Column, planes: Int): Column =
    toCol(graft.functions.HyperplaneSig(toExpr(v), planes))

  /** the signature split into `bands` hashed keys — vectors with equal
    * direction get identical keys in EVERY band (guaranteed recall for
    * exact-duplicate directions); nearby directions collide per band with
    * probability (1 - θ/π)^(planes/bands) */
  private def hyperplaneBandKeys(v: Column, planes: Int, bands: Int): Column =
    toCol(graft.functions.BandKeysFromSig(toExpr(hyperplaneSig(v, planes)), planes, bands))

  /** embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * generate candidates (band equi-join — no all-pairs product), exact
    * cosine verifies. Returns (id_a, id_b, cosine). The dedup counterpart of
    * lshTopK: same index, pair semantics instead of top-k.
    *
    * Banding geometry matters for PAIR queries much more than for top-k:
    * band selectivity is 2^(planes/bands) buckets, and candidate volume is
    * Σ bucket², so wide bands are mandatory — 48/6 = 8 bits/band puts two
    * UNRELATED vectors in the same bucket with p ≈ 1/256 per band while a
    * cosine-0.9 pair still collides in ≥1 band (and an exact-direction
    * duplicate with p = 1 in every band). A 2-bit band (the top-k default
    * reused naively) made candidates quadratic: measured 404 s on 10 k
    * vectors; CLUSTERED embeddings (label centroids) need 16-bit bands —
    * cluster members share most sign bits, so 8-bit buckets grew past the
    * cap and dropped true pairs. maxBucket drops degenerate buckets
    * outright (skew guard). */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 96, bands: Int = 6,
                        maxBucket: Int = 2000, estMargin: Double = 0.25): DataFrame = {
    // the packed hyperplane signature is computed ONCE per vector (planes ×
    // dim multiply-adds — the dominant map-side cost) and persisted; band
    // keys and the hamming pre-filter both derive from it downstream
    val base = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("sig", hyperplaneSig(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"),
      explode(toCol(graft.functions.BandKeysFromSig(toExpr(col("sig")), planes, bands))).as("band"))
    val capped = banded.join(
      banded.groupBy("band").agg(count(lit(1)).as("bc")).filter(col("bc") <= maxBucket),
      "band")
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // signature-hamming pre-filter: h/planes estimates θ/π, so requiring
    // cos(π·h/planes) ≥ threshold − estMargin bounds h ≤ maxH and drops
    // far-apart candidates BEFORE the join that ships full vectors — the
    // packed signature is ⌈planes/64⌉ longs vs dim doubles. Exact cosine
    // still decides every surviving pair; exact-direction duplicates have
    // h = 0 identically, so planted-copy recall stays deterministic.
    val cutoff = math.max(-1.0, math.min(1.0, threshold - estMargin))
    val maxH = math.floor(planes * math.acos(cutoff) / math.Pi).toLong
    val withSigs = cands
      .join(base.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
    val ham = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (a, b) => a + b)
    val likely = withSigs.filter(ham <= maxH).select("id_a", "id_b")
    likely
      .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** BPE-ish sub-word token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the pre-tokenizer split every
    * byte-pair-encoding vocabulary starts from) — versus whitespace counting,
    * structured text like JSON/HTML tokenizes several times denser. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"""), lit(0)))

  /** winnowing fingerprints of a document (WinnowFingerprints expression) */
  def winnow(text: Column, k: Int = 8, window: Int = 16): Column =
    toCol(graft.functions.WinnowFingerprints(toExpr(text), k, window))

  /** fingerprint-overlap near-duplicate pairs: inverted index on winnowing
    * fingerprints (explode → equi-join on fingerprint), ubiquitous
    * fingerprints dropped by a document-frequency cap (skew guard), pairs
    * kept when they share ≥ minShared fingerprints. Finds shared PASSAGES
    * (any common substring ≥ window+k-1 bytes shares a fingerprint) — the
    * copy-detection complement of whole-document MinHash. */
  def fingerprintDupPairs(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8, window: Int = 16, minShared: Int = 2,
                          maxDocFreq: Int = 100): DataFrame = {
    val fps = df.select(col(idCol).as("id"),
        explode(array_distinct(winnow(col(textCol), k, window))).as("fp"))
    val rare = fps.join(
      fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq), "fp")
    rare.as("x").join(rare.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** LSH-bucketed approximate top-k: random-hyperplane signatures (seeded,
    * deterministic), candidates share a signature band, exact cosine re-rank
    * within candidates. The scale path: no cross join, shuffle on band keys. */
  def lshTopK(collection: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 16, bands: Int = 4): DataFrame = {
    def bandKeys(v: Column): Column = hyperplaneBandKeys(v, planes, bands)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("band", explode(bandKeys(col("qv"))))
    val c = collection.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("band", explode(bandKeys(col("cv"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    q.join(c, "band")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv")).distinct()
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
