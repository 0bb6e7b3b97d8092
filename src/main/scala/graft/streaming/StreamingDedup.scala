package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for continuous document ingestion — the stream
  * counterpart of TextOps.exactDupStats / minhashDupPairs' exact pre-pass.
  *
  * Two surfaces, both Spark-first:
  *
  *  - `exactWithinWatermark`: the built-in state machine
  *    (`dropDuplicatesWithinWatermark` over a content hash + event-time
  *    watermark). State per key is evicted once the watermark passes, so
  *    state size tracks the dedup WINDOW, not stream lifetime — the only
  *    shape that survives an unbounded 100 TB/day crawl.
  *
  *  - `exactStateful`: `flatMapGroupsWithState` keyed by content hash with
  *    a processing-time TTL, for when the pipeline needs what the built-in
  *    cannot express: the emitted row carries HOW MANY duplicates were
  *    suppressed so far (duplicate-mass accounting, same bookkeeping the
  *    batch dedup reconstructs arithmetically).
  */
object StreamingDedup {

  /** Exact-verified streaming near-dup: the estimate-based candidate pairs
    * from `minhashNearDupPairs` stream-static-joined against a corpus
    * snapshot to compute the EXACT shingle Jaccard (integer j4 scale, the
    * batch operator's verify semantics) — candidates whose estimate passed
    * but whose true similarity misses the threshold are dropped. The
    * static side is broadcast-sized per executor lookup or a sort-merge
    * join at scale; only candidate ids (not shingle sets) ever enter
    * stream state. */
  def minhashNearDupVerified(docs: DataFrame, corpus: DataFrame,
                             idCol: String, textCol: String,
                             shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                             threshold: Double = 0.5, maxBucket: Int = 16,
                             ttlMs: Long = 3600000L,
                             estMargin: Double = 0.2): DataFrame = {
    import graft.operators.TextOps
    val thr4 = math.round(threshold * 10000)
    // NOTE: no stateful dedup here — chaining a second stateful operator
    // after flatMapGroupsWithState is restricted; a pair sharing several
    // bands yields duplicate verified rows, deduped per sink batch.
    // Candidates generate at (threshold - estMargin) on the σ≈√(J(1-J)/k)
    // signature estimate so borderline true pairs are not lost to estimate
    // noise — EXACT verification decides (the batch operator's estMargin).
    val cands = minhashNearDupPairs(docs, idCol, textCol, shingleN, k, bands,
        math.max(0.0, threshold - estMargin), maxBucket, ttlMs)
      .toDF().select(col("id_a"), col("id_b"))
    val sh = corpus.select(col(idCol).cast("long").as("id"),
      array_distinct(TextOps.tokenShingles(col(textCol), shingleN)).as("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("(CAST(10000 AS BIGINT) * size(array_intersect(sh_a, sh_b))) DIV size(array_union(sh_a, sh_b))").as("j4"))
      .filter(col("j4") >= thr4)
  }

  /** first occurrence per text within the watermark window; duplicates
    * arriving inside the window are dropped, state evicts afterward. */
  def exactWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                           delay: String): DataFrame = {
    docs
      .withColumn("__h", xxhash64(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
  }

  final case class DedupIn(id: Long, h: Long)
  final case class DedupOut(id: Long, h: Long, dups: Long)

  final case class NearDupIn(id: Long, sig: Seq[Long], band: Long,
                             ts: java.sql.Timestamp)
  final case class NearDupOut(id_a: Long, id_b: Long, est4: Long, band: Long,
                              ts: java.sql.Timestamp)

  /** `minhashNearDupPairs` with the band-duplicate emissions collapsed: each
    * near-dup pair surfaces EXACTLY once (the fool-proof form — callers need
    * no per-sink-batch dedupe). With an event-time column, the collapse runs
    * through `dropDuplicatesWithinWatermark(id_a, id_b)` so its state is
    * watermark-bounded like the band state itself (chained stateful
    * operators — Append-mode flatMapGroupsWithState followed by a
    * watermark-scoped dedup — the shape an unbounded crawl needs). Without
    * one, a plain `dropDuplicates` collapses pairs with stream-lifetime
    * state: fine for drain-and-assert harnesses and bounded backfills,
    * wrong for an unbounded stream — pass the timestamp there. */
  def minhashNearDupPairsDistinct(docs: DataFrame, idCol: String, textCol: String,
                                  tsCol: Option[String] = None,
                                  delay: String = "10 minutes",
                                  shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                                  threshold: Double = 0.5, maxBucket: Int = 16,
                                  ttlMs: Long = 3600000L): DataFrame = {
    val pairs = minhashNearDupPairs(docs, idCol, textCol, shingleN, k, bands,
      threshold, maxBucket, ttlMs, tsCol).toDF()
    tsCol match {
      case Some(_) =>
        // the emitted ts is the arriving (later) document's event time; the
        // watermark travels through the stateful operator chain (Spark ≥3.4
        // multi-stateful support), so pair-dedup state evicts with it
        pairs.withWatermark("ts", delay)
          .dropDuplicatesWithinWatermark("id_a", "id_b")
          .select(col("id_a"), col("id_b"), col("est4"), col("ts"))
      case None =>
        pairs.dropDuplicates("id_a", "id_b")
          .select(col("id_a"), col("id_b"), col("est4"))
    }
  }

  /** Streaming MinHash near-duplicate detection — the stream counterpart of
    * the batch TextOps.minhashDupPairs family. Each document's k-long
    * MinHash signature is split into LSH band keys; state lives PER BAND
    * BUCKET (up to `maxBucket` (id, signature) entries — the same skew
    * guard as the batch bucket cap), and an arriving document emits a
    * candidate pair for every stored signature whose agreeing fraction
    * est4 = ⌊10000·agree/k⌋ reaches the threshold. Only k-long signatures
    * ever enter state or the shuffle — never shingle sets — which is the
    * 100 TB shape (the batch operator's signature-estimate pre-filter made
    * the same trade; σ ≈ √(J(1-J)/k)).
    *
    * A pair sharing several bands emits once per shared band: use
    * [[minhashNearDupPairsDistinct]] for the exactly-once form (it chains a
    * watermark-bounded pair dedup), or dedupe per sink batch. With
    * ttlMs > 0 bucket state times out after inactivity (bounded state);
    * pass ttlMs = 0 (NoTimeout) in drain-and-assert harnesses — see
    * exactStateful's scaladoc for the ProcessingTimeTimeout trap. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                          threshold: Double = 0.5, maxBucket: Int = 16,
                          ttlMs: Long = 3600000L,
                          tsCol: Option[String] = None): Dataset[NearDupOut] = {
    import graft.operators.TextOps
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    val thr4 = math.round(threshold * 10000)
    val sig = TextOps.minhash(
      array_distinct(TextOps.tokenShingles(col(textCol), shingleN)), k)
    val ts = tsCol.map(col).getOrElse(lit(null).cast("timestamp"))
    docs
      .select(col(idCol).cast("long").as("id"), sig.as("sig"), ts.as("ts"))
      .select(col("id"), col("sig"),
        explode(TextOps.lshBands(col("sig"), bands, k / bands)).as("band"), col("ts"))
      .as[NearDupIn]
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], NearDupOut](
          OutputMode.Append(), timeoutConf) {
        (band: Long, rows: Iterator[NearDupIn], state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[NearDupOut]
            rows.foreach { r =>
              entries.foreach { case (oid, osig) =>
                if (oid != r.id) {
                  var agree = 0
                  var i = 0
                  while (i < k) { if (osig(i) == r.sig(i)) agree += 1; i += 1 }
                  val est4 = agree.toLong * 10000 / k
                  if (est4 >= thr4)
                    out += NearDupOut(math.min(oid, r.id), math.max(oid, r.id), est4, band, r.ts)
                }
              }
              if (entries.length < maxBucket && !entries.exists(_._1 == r.id))
                entries = (r.id, r.sig) :: entries
            }
            state.update(entries)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
  }

  /** keyed duplicate-mass accounting: for each content hash, emit the first
    * id immediately (dups = 0) and, on every later duplicate, an update row
    * with the running suppressed count. With ttlMs > 0, per-key state times
    * out that long after last activity (bounded state — the 100 TB
    * operating point); NOTE a processing-time timeout makes the engine run
    * timeout-check micro-batches CONTINUOUSLY even with no new data, which
    * is correct in production but means `processAllAvailable` never
    * quiesces — pass ttlMs = 0 (NoTimeout) in drain-and-assert harnesses. */
  def exactStateful(docs: DataFrame, idCol: String, textCol: String,
                    ttlMs: Long = 3600000L): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    docs
      .select(col(idCol).cast("long").as("id"), xxhash64(col(textCol)).as("h"))
      .as[DedupIn]
      .groupByKey(_.h)
      .flatMapGroupsWithState[(Long, Long), DedupOut](OutputMode.Append(), timeoutConf) {
        (h: Long, rows: Iterator[DedupIn], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // presence tracked explicitly (state.exists), NOT a -1 sentinel:
            // ids are arbitrary longs (hash-derived ids are legitimately
            // negative), so a sentinel in the value domain would re-emit
            // every later duplicate of a negative-id key as a fresh first
            var hasFirst = state.exists
            var first = 0L
            var count = 0L
            if (hasFirst) { val (f, c) = state.get; first = f; count = c }
            val out = Iterator.newBuilder[DedupOut]
            rows.foreach { r =>
              if (!hasFirst) { hasFirst = true; first = r.id; out += DedupOut(r.id, h, 0L) }
              else { count += 1; out += DedupOut(first, h, count) }
            }
            state.update((first, count))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
  }
}
