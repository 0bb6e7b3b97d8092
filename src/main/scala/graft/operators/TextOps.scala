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

  /** simple quality signals: length, alpha/punct/whitespace ratios, mean token
    * length, stopword-free ratio */
  def qualityStats(text: Column): Column = {
    val len = length(text).cast("double")
    struct(
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
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

  /** MinHash+LSH near-duplicate candidate pairs, verified with exact shingle
    * Jaccard. Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold.
    *
    * Scale path: candidates come only from LSH-bucket self-joins (shuffle on
    * band key — no all-pairs product); the Jaccard verification joins shingle
    * sets back by id. */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame = {
    // materialize shingle sets + signatures once: they feed three joins, and
    // recomputing the tokenization per join side would dominate the runtime
    val base = df.select(col(idCol).as("id"),
      array_distinct(tokenShingles(col(textCol), shingleN)).as("sh"))
      .withColumn("sig", minhash(col("sh"), k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"), explode(lshBands(col("sig"), bands, k / bands)).as("band"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val withSets = cands
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: self-join on 16-bit bands of the 64-bit
    * fingerprint (any pair within hamming ≤ 3 shares at least one exact band),
    * verified by bit_count(xor) ≤ maxHamming. */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash(col(textCol)).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fp.select(col("id"), col("f"),
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        shiftrightunsigned(col("f"), b * 16).bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("band"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.f").bitwiseXOR(col("y.f"))).as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
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

  /** LSH-bucketed approximate top-k: random-hyperplane signatures (seeded,
    * deterministic), candidates share a signature band, exact cosine re-rank
    * within candidates. The scale path: no cross join, shuffle on band keys. */
  def lshTopK(collection: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 16, bands: Int = 4): DataFrame = {
    // deterministic pseudo-random hyperplanes: sign pattern from xxhash64 of
    // (plane, dimension); dot sign per plane -> bit; banded like simhash
    def sigBits(v: Column): Column =
      transform(sequence(lit(0), lit(planes - 1)), p =>
        when(aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * (pmod(xxhash64(p, d), lit(2)).cast("double") * 2.0 - 1.0)),
          lit(0.0d), (acc, x) => acc + x) >= 0, 1L).otherwise(0L))
    def bandKeys(v: Column): Column = {
      val bits = sigBits(v)
      val rows = planes / bands
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(bits, b * rows + 1, lit(rows)))))
    }
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
