package graft.streaming

import graft.core.TagAttributes
import graft.pipeline.{ExtractJob, Turn, TurnOut}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of the extraction pipeline: the same per-turn
  * core (`ExtractJob.extractTurn`) applied to a streaming `Dataset[Turn]`,
  * plus watermarked windowed aggregation and custom conversation state via
  * `mapGroupsWithState`.
  *
  * The batch and streaming paths share one transform function, so per-turn
  * equality verified for batch carries over to the stream verbatim.
  */
object StreamingExtract {

  /** Per-turn extraction on a stream — stateless, so it runs map-side with
    * no state store at any scale.
    */
  def extractStream(turns: Dataset[Turn],
                    cfg: Map[String, TagAttributes] = TagAttributes.bbcodeCanonical): Dataset[TurnOut] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.map(t => ExtractJob.extractTurn(t, cfg)))
  }

  /** Main-content extraction on a stream: the same stateless map-side
    * shape as [[extractStream]], applying the DOM-heuristic boilerplate
    * removal per turn — batch/stream equality holds verbatim because both
    * faces call the same pure core.
    */
  def mainContentStream(turns: Dataset[Turn],
                        cfg: Map[String, TagAttributes] = Map.empty): Dataset[graft.pipeline.MainContentOut] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.map(t => ExtractJob.mainContentTurn(t, cfg)))
  }

  /** Windowed per-conversation turn counts with a watermark: late turns
    * beyond `lateness` are dropped, state is bounded by the watermark.
    */
  def windowedConvStats(turns: Dataset[Turn],
                        windowLen: String = "1 minute",
                        lateness: String = "2 minutes"): DataFrame =
    turns.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("n_chars"))

  /** Streaming exact dedup: drop turns whose normalized-content fingerprint
    * already appeared within the watermark horizon — the streaming face of
    * `DedupOps.exactDupRanks`. State is bounded by the watermark (expired
    * fingerprints age out), which is what keeps the dedup store finite on
    * an unbounded 10^12-turn stream.
    */
  def dedupStream(turns: Dataset[Turn], lateness: String = "10 minutes"): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    // null text must never dedup against other null-text turns (null keys
    // compare equal in dropDuplicates) — key those rows by their identity
    turns.toDF()
      .withColumn("fp", coalesce(graft.ops.TextOps.fingerprint(col("text")),
        concat_ws("\u0000", lit("null"), col("conv_id"), col("turn_idx"))))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
      .as[Turn]
  }

  /** Streaming decontamination filter: drop turns that share any word
    * `k`-gram with a STATIC benchmark corpus — the streaming face of
    * `DedupOps.contamination`. The bench side is reduced to its distinct
    * shingle set ONCE on the driver (fail-fast bounded: benchmarks are
    * small by the decontamination contract) and broadcast; the stream
    * filter is then stateless and map-side — no state store, no shuffle,
    * safe at any stream rate. Shingling uses the same
    * [[graft.ops.TextOps.shingles]] column as the batch operator, so
    * batch and stream agree on what counts as contaminated.
    */
  def decontaminateStream(turns: Dataset[Turn], bench: DataFrame,
                          benchTextCol: String = "text", k: Int = 13,
                          maxBenchShingles: Int = 5000000): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val benchDistinct = bench
      .select(explode(array_distinct(
        graft.ops.TextOps.shingles(col(benchTextCol), k))).as("s"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // guard BEFORE collecting: a counted-first overflow fails with a clear
    // message instead of the driver OOM the guard exists to prevent
    val nShingles = benchDistinct.count()
    if (nShingles > maxBenchShingles) {
      benchDistinct.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"decontaminateStream: bench shingle set has $nShingles distinct " +
          s"k-grams > $maxBenchShingles — too large to broadcast to a stream " +
          "filter; decontaminate in batch (DedupOps.contamination falls back " +
          "to a shuffle join) or raise the bound deliberately")
    }
    val benchSet = benchDistinct.as[String].collect().toSet
    benchDistinct.unpersist(blocking = false)
    val bc = spark.sparkContext.broadcast(benchSet)
    val hasHit = udf { (sh: Seq[String]) =>
      sh != null && sh.exists(bc.value.contains)
    }
    turns.toDF()
      .filter(!hasHit(graft.ops.TextOps.shingles(col("text"), k)))
      .as[Turn]
  }

  /** Streaming decontamination above the broadcast ceiling: where
    * [[decontaminateStream]] refuses (its raw bench shingle set would not
    * fit a stream-filter broadcast), this variant broadcasts a
    * fixed-size Bloom bitset instead — memory is `bitsPerKey` BITS per
    * bench shingle regardless of shingle length (a 10⁹-shingle benchmark
    * at the default 14 bits/key is a 1.75 GB bitset vs ~100 GB of raw
    * strings), built once per launch with
    * [[graft.ops.BloomOps.buildBloom]]'s partitioning-deterministic
    * treeAggregate.
    *
    * Semantics: a turn drops when ANY of its word k-grams probes positive.
    * No false negatives — every genuinely contaminated turn drops, same as
    * the exact filter. False positives OVER-drop clean turns at ≈
    * `shinglesPerTurn × 0.6185^bitsPerKey` (the optimal-hash Bloom rate:
    * ≈1.2×10⁻³ per shingle at 14 bits/key, ~1 in 800; use 20+ bits/key
    * for a ≤10⁻⁴ budget) — the safe failure direction for
    * decontamination; run the exact batch audit
    * ([[graft.ops.DedupOps.contaminationSpans]]) when per-row exactness
    * matters. Bench sets needing more than [[graft.ops.BloomOps.MaxBits]]
    * bits (~16 GiB, ~10¹⁰ shingles at 14 bits/key) fail fast with a clear
    * message instead of an array-size crash.
    *
    * The probe key mirrors the batch build exactly: Spark's
    * `xxhash64(xxhash64(shingle))` recomputed per element with catalyst's
    * own XXH64 (parity is asserted in StreamingSpec, so the stream can
    * never probe a different key space than the index it was built from).
    */
  def decontaminateStreamBloom(turns: Dataset[Turn], bench: DataFrame,
                               benchTextCol: String = "text", k: Int = 13,
                               bitsPerKey: Int = 14): Dataset[Turn] = {
    require(bitsPerKey >= 1 && bitsPerKey <= 64,
      s"bitsPerKey must be in [1,64]: $bitsPerKey")
    val spark = turns.sparkSession
    import spark.implicits._
    val benchSet = graft.ops.DedupOps.benchShingleSet(
      bench, benchTextCol, k, hashed = true)
    val n = benchSet.count()
    if (n == 0) { benchSet.unpersist(blocking = false); return turns }
    val numBits = ((n * bitsPerKey + 63) / 64) * 64
    if (numBits > graft.ops.BloomOps.MaxBits) {
      benchSet.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"decontaminateStreamBloom: $n bench shingles at $bitsPerKey " +
          s"bits/key need $numBits bits > BloomOps.MaxBits " +
          s"${graft.ops.BloomOps.MaxBits} (~16 GiB) — lower bitsPerKey or " +
          "split the benchmark across multiple filters")
    }
    val model = graft.ops.BloomOps.buildBloom(
      benchSet.select(xxhash64(col("sh")).as("h")),
      numBits, graft.ops.BloomOps.hashesFor(numBits, n))
    benchSet.unpersist(blocking = false)
    val bc = spark.sparkContext.broadcast(model)
    val hasHit = udf { (sh: Seq[String]) =>
      sh != null && sh.exists { s => bc.value.contains(sparkShingleKey(s)) }
    }
    turns.toDF()
      .filter(!hasHit(graft.ops.TextOps.shingles(col("text"), k)))
      .as[Turn]
  }

  /** Scala mirror of the batch-side bloom key `xxhash64(xxhash64(s))`
    * (both with Spark's default seed 42), via catalyst's own XXH64 —
    * StreamingSpec pins equality against the Column expression.
    */
  private[streaming] def sparkShingleKey(s: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    XXH64.hashLong(
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L),
      42L)
  }

  /** Stateless streaming LM-quality filter: keep turns whose bits-per-token
    * under the reference bigram model is ≤ `maxBits`. The model tables are
    * collected ONCE with [[graft.ops.LmOps.collectBigramModel]]'s
    * counted-first guard and broadcast — no state store, no shuffle, safe
    * at any stream rate; batch scoring stays the path for oversized
    * models. Turns with fewer than two tokens carry no bigram evidence and
    * are KEPT (the batch scorer's NULL contract — gate them on other
    * signals); the scalar scorer is exact-equality-locked to
    * [[graft.ops.LmOps.perplexityBits]], so stream and batch agree on
    * every document.
    */
  def perplexityFilterStream(turns: Dataset[Turn], bigrams: DataFrame,
                             unigrams: DataFrame, vocab: Long,
                             maxBits: Double,
                             maxModelEntries: Long = 20000000L): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val (biM, uniM) =
      graft.ops.LmOps.collectBigramModel(bigrams, unigrams, maxModelEntries)
    val bcBi = spark.sparkContext.broadcast(biM)
    val bcUni = spark.sparkContext.broadcast(uniM)
    val keep = udf { (text: String) =>
      graft.ops.LmOps.bitsLocal(text, bcBi.value, bcUni.value, vocab)
        .forall(_ <= maxBits)
    }
    turns.toDF().filter(keep(col("text"))).as[Turn]
  }

  /** One banded MinHash row of a streaming document (the shuffle unit of
    * [[nearDupStream]]): the full signature rides along so candidate pairs
    * are verified in-state by estimated Jaccard instead of a second
    * corpus lookup (the batch pipeline's re-fetch join has no streaming
    * equivalent without an external store).
    */
  final case class BandedDoc(id: Long, band: Int, bucket: Long,
                             sig: Array[Long], ts: java.sql.Timestamp)

  /** Per-(band,bucket) state: docs seen within the watermark horizon, plus
    * the max event time observed (the eviction clock — the timeout must be
    * anchored to event time, not the current watermark, which lags a batch
    * behind and would evict everything immediately on the first batch).
    */
  final case class BucketState(ids: Array[Long], sigs: Array[Array[Long]], maxTsMs: Long)

  /** An emitted near-dup candidate: `est_jaccard` is the matching-minhash
    * fraction (an unbiased Jaccard estimate); `ts` is the ARRIVING doc's
    * event time — usually the later of the pair, but a LATE arrival
    * (within the lateness horizon) pairing against an earlier-arrived,
    * later-timestamped mate carries the earlier time; anchor downstream
    * windowing on "detection-triggering arrival", not "max of the pair".
    * The same pair can surface from several bands — use
    * [[nearDupPairsStream]] when exactly-once pairs matter.
    */
  final case class NearDupHit(id_a: Long, id_b: Long, band: Int, est_jaccard: Double,
                              ts: java.sql.Timestamp)

  private[streaming] def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var same = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) same += 1; i += 1 }
    if (n == 0) 0.0 else same.toDouble / n
  }

  /** Streaming MinHash near-dup detection — the streaming face of
    * `DedupOps.minhashNearDups`: each incoming doc computes its signature
    * and LSH band hashes MAP-SIDE (one pass per row, raw text never enters
    * state or crosses the stateful shuffle); per-(band,bucket) groups hold
    * the (id, signature) of docs seen within the watermark horizon; a new
    * arrival emits one [[NearDupHit]] per stored bucket-mate whose
    * estimated Jaccard (matching-hash fraction) reaches `threshold`.
    *
    * State is bounded two ways, which is what keeps the store finite on an
    * unbounded 10^12-turn stream:
    *  - the event-time timeout evicts a bucket `latenessMs` past the
    *    watermark (dup detection only within the horizon — the streaming
    *    contract; historical dedup belongs to the batch pipeline);
    *  - `maxBucket` caps docs per bucket (the hot-bucket guard): a
    *    boilerplate bucket stops absorbing new signatures at the cap and
    *    later arrivals still compare against (and hit) the stored prefix.
    */
  def nearDupStream(docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    tsCol: String = "ts",
                    threshold: Double = 0.8, k: Int = 3,
                    numHashes: Int = 64, bands: Int = 16,
                    latenessMs: Long = 600000L,
                    maxBucket: Int = 1024): Dataset[NearDupHit] =
    nearDupCore(docs, idCol, textCol, tsCol, threshold, k, numHashes, bands,
      latenessMs, maxBucket, uniquePairs = false)

  /** First band (0-based) on which two signatures agree slice-for-slice,
    * -1 when none — the deterministic "owner" band of a candidate pair
    * (both group members hold full signatures, so every band's group
    * computes the same answer).
    */
  private[streaming] def firstEqualBand(a: Array[Long], b: Array[Long],
                                        bands: Int, rowsPerBand: Int): Int = {
    var band = 0
    while (band < bands) {
      var i = band * rowsPerBand
      val end = i + rowsPerBand
      var eq = i < a.length && end <= a.length && end <= b.length
      while (eq && i < end) { if (a(i) != b(i)) eq = false; i += 1 }
      if (eq) return band
      band += 1
    }
    -1
  }

  private def nearDupCore(docs: DataFrame,
                          idCol: String, textCol: String, tsCol: String,
                          threshold: Double, k: Int,
                          numHashes: Int, bands: Int,
                          latenessMs: Long, maxBucket: Int,
                          uniquePairs: Boolean): Dataset[NearDupHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .withWatermark(tsCol, s"$latenessMs milliseconds")
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.ops.DedupOps.minhashSignature(col(textCol), k, numHashes).as("sig"))
      .select(col("id"), col("ts"), col("sig"),
        posexplode(graft.ops.DedupOps.bandHashesOf(col("sig"), bands, numHashes / bands))
          .as(Seq("band", "bucket")))
      .select(col("id"), col("band"), col("bucket"), col("sig"), col("ts"))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Array.empty, Array.empty, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            rows.foreach { d =>
              var i = 0
              while (i < st.ids.length) {
                if (st.ids(i) != d.id) {
                  val est = estJaccard(st.sigs(i), d.sig)
                  // uniquePairs: emit ONLY from the pair's owner band (the
                  // first slice-equal band) — every band's group computes
                  // the same owner from the two full signatures, so exactly
                  // one group emits and no downstream stateful dedup is
                  // needed (a second stateful operator after
                  // flatMapGroupsWithState trips Spark's global-watermark
                  // correctness checker, and a second state store is pure
                  // cost). A pair cohabiting buckets ONLY via band-hash
                  // collisions (no genuinely equal band) has no owner and
                  // is dropped — the LSH candidate contract is "some band
                  // agrees", collision-only candidates are accidental.
                  if (est >= threshold &&
                      (!uniquePairs ||
                        firstEqualBand(st.sigs(i), d.sig, bands, rowsPerBand) == band))
                    out += NearDupHit(math.min(st.ids(i), d.id), math.max(st.ids(i), d.id),
                      band, est, d.ts)
                }
                i += 1
              }
              val ts = if (d.ts == null) st.maxTsMs else math.max(st.maxTsMs, d.ts.getTime)
              st =
                if (st.ids.length < maxBucket && !st.ids.contains(d.id))
                  BucketState(st.ids :+ d.id, st.sigs :+ d.sig, ts)
                else BucketState(st.ids, st.sigs, ts)
            }
            state.update(st)
            // evict when the watermark passes the newest member + horizon
            // (event-time anchored: the current watermark lags a batch)
            state.setTimeoutTimestamp(
              math.max(st.maxTsMs + latenessMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Exactly-once near-dup pairs: [[nearDupStream]]'s multi-band emission
    * means the same (id_a, id_b) surfaces once per matching band — every
    * caller that wants pairs, not band hits, must rediscover the dedup.
    * This variant emits each pair exactly once, from its OWNER band (the
    * first band where the two signatures agree slice-for-slice): every
    * band's bucket group holds both full signatures and computes the same
    * owner, so exactly one group emits — no second stateful operator, no
    * extra shuffle or state store, and no fight with Spark's
    * global-watermark correctness checker (which rejects any stateful
    * operator downstream of flatMapGroupsWithState: the naive
    * `dropDuplicatesWithinWatermark("id_a","id_b")` composition does not
    * plan).
    *
    * Contract deltas vs the band stream, both inherent to owner-band
    * dedup: (1) collision-only candidates (bucket cohabitation with NO
    * genuinely equal band) are dropped — the LSH contract is "some band
    * agrees", so these were accidental detections; (2) under hot-bucket
    * cap pressure, a pair whose owner-band bucket dropped the stored mate
    * is missed even when a later band still holds it — the cap already
    * forfeits per-bucket detection guarantees (same trade the batch
    * guard's skipped-pair accounting documents). Re-delivery of the same
    * doc id re-compares and can re-emit — exactly-once holds under
    * at-most-once delivery per id within the horizon.
    */
  def nearDupPairsStream(docs: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         tsCol: String = "ts",
                         threshold: Double = 0.8, k: Int = 3,
                         numHashes: Int = 64, bands: Int = 16,
                         latenessMs: Long = 600000L,
                         maxBucket: Int = 1024): Dataset[NearDupHit] =
    nearDupCore(docs, idCol, textCol, tsCol, threshold, k, numHashes, bands,
      latenessMs, maxBucket, uniquePairs = true)

  /** Running per-conversation state: turn count, char count, last index —
    * custom state via `mapGroupsWithState` with a processing-time idle
    * timeout: a conversation that receives no turns for `idleTimeout` is
    * evicted from the state store (its final snapshot is emitted with
    * `closed = true`), so dormant conversations cannot grow the store
    * without bound at 10^12-turn scale.
    */
  final case class ConvState(turns: Long, chars: Long, lastIdx: Int)
  final case class ConvUpdate(conv_id: String, turns: Long, chars: Long, last_idx: Int,
                              closed: Boolean)

  def conversationState(turns: Dataset[Turn],
                        idleTimeout: String = "30 minutes"): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvUpdate](GroupStateTimeout.ProcessingTimeTimeout) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val prev = state.getOption.getOrElse(ConvState(0, 0, -1))
            state.remove()
            ConvUpdate(convId, prev.turns, prev.chars, prev.lastIdx, closed = true)
          } else {
            val prev = state.getOption.getOrElse(ConvState(0, 0, -1))
            var turnsN = prev.turns
            var chars = prev.chars
            var last = prev.lastIdx
            rows.foreach { t =>
              turnsN += 1
              chars += (if (t.text == null) 0 else t.text.length)
              if (t.turn_idx > last) last = t.turn_idx
            }
            val next = ConvState(turnsN, chars, last)
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            ConvUpdate(convId, next.turns, next.chars, next.lastIdx, closed = false)
          }
      }
  }
}
