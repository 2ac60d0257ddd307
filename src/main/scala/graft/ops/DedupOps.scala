package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is shuffle-minimal —
  *  - exact dedup is one hash-aggregate on a 16-byte fingerprint (never
  *    shuffles full text);
  *  - MinHash/SimHash signatures are computed map-side (one pass per row),
  *    candidate generation shuffles only (band-key, id) pairs, and exact
  *    verification joins shingle sets back only for the candidate pairs;
  *  - near-dup pipelines run **exact-dedup first**: fingerprint-identical
  *    documents collapse to one representative before any LSH banding, so a
  *    boilerplate cluster of 10^6 identical pages contributes ONE row to the
  *    band join instead of an N² bucket explosion on a single reducer.
  *    Qualifying pairs are re-expanded from the fingerprint groups afterward
  *    (group members share the rep's shingle set by construction, so the
  *    expanded pairs carry exactly the rep pair's intersection/union);
  *  - residual hot buckets (near- but not exactly-identical boilerplate) are
  *    dropped by a size guard, with the number of skipped candidate pairs
  *    reported through an accumulator — capped coverage is never silent.
  */
object DedupOps {
  /** Rank duplicates within exact-fingerprint groups; `dup_rank = 1` is the
    * canonical survivor, everything else is droppable. This (id → rep)
    * representation is the form to persist at 10^12-doc scale — it is linear
    * in the corpus where the all-pairs form is quadratic in group size.
    */
  def exactDupRanks(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    df.withColumn("fp", fp)
      .withColumn("dup_rank", row_number().over(Window.partitionBy(col("fp")).orderBy(col(idCol))))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy(col("fp"))))
  }

  /** 64-bit string hash (xx-style avalanche over UTF-16 chars). */
  private[ops] def hash64(s: String): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0xc2b2ae3d27d4eb4fL
      h ^= h >>> 29
      i += 1
    }
    h * 0xff51afd7ed558ccdL
  }

  /** Cheap per-permutation integer mix: one multiply+xor-shift per (hash,
    * seed) — the standard "hash once, mix per permutation" MinHash trick.
    */
  private[ops] def mix(h: Long, seed: Long): Long = {
    var x = h ^ (seed * 0x9e3779b97f4a7c15L + 0xc2b2ae3d27d4eb4fL)
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^ (x >>> 29)
  }

  /** Map-side MinHash signature as an array<bigint> column of length
    * `numHashes`, from word `k`-shingles. One pass: each shingle is hashed
    * once, then `numHashes` integer mixes update the running minima — a
    * single typed UDF beats the equivalent 64-expression Catalyst tree,
    * which falls out of whole-stage codegen at this width (measured ~100×).
    */
  def minhashSignature(textCol: Column, k: Int = 3, numHashes: Int = 64): Column = {
    val sigUdf = udf { (shingles: Seq[String]) =>
      val mins = Array.fill(numHashes)(Long.MaxValue)
      if (shingles != null) {
        val it = shingles.iterator
        while (it.hasNext) {
          val h = hash64(it.next())
          var i = 0
          while (i < numHashes) {
            val v = mix(h, i)
            if (v < mins(i)) mins(i) = v
            i += 1
          }
        }
      }
      mins
    }
    sigUdf(TextOps.shingles(textCol, k))
  }

  /** Band-explode a signature column into (id, band, bucket) rows. */
  private def bandExplode(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
      .as(Seq("band", "bucket")))

  /** Self-join banded rows on (band, bucket) into unique candidate id
    * pairs, skipping buckets larger than `maxBucket` (the residual-skew
    * guard; dropped candidate-pair counts land in `skippedPairs`).
    */
  private def bucketJoin(banded: DataFrame, maxBucket: Int,
                         skippedPairs: Option[org.apache.spark.util.LongAccumulator]): DataFrame = {
    val guarded =
      if (maxBucket == Int.MaxValue) banded
      else {
        val sizes = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bsize"))
        skippedPairs.foreach { acc =>
          sizes.filter(col("bsize") > maxBucket)
            .select(sum((col("bsize") * (col("bsize") - 1) / 2).cast("long")).cast("long"))
            .collect().headOption.filterNot(_.isNullAt(0))
            .foreach(r => acc.add(r.getLong(0)))
        }
        banded.join(sizes.filter(col("bsize") <= maxBucket), Seq("band", "bucket"))
          .drop("bsize")
      }
    guarded.as("l").join(guarded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** LSH candidate pairs: band the signature into `bands` groups of
    * `numHashes/bands` rows, bucket-join on (band, band-hash), emit unique
    * id pairs. Only ids and 8-byte band hashes shuffle.
    *
    * Note: this utility recomputes the signature lineage per plan subtree
    * (identical subtrees dedupe via exchange reuse); for guarded or
    * repeated use, prefer [[minhashNearDups]], which persists the
    * signature stage.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 64, bands: Int = 16,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sig = df.select(col(idCol).as("id"), minhashSignature(col(textCol), k, numHashes).as("sig"))
    bucketJoin(bandExplode(sig, bands, numHashes / bands), maxBucket, None)
  }

  /** Exact n-gram Jaccard for given candidate pairs (columns id_a, id_b):
    * joins shingle sets back and computes |∩| / |∪| with native array ops.
    */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(col(textCol), k)).as("sh"))
    candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("union") === 0, lit(0.0)).otherwise(col("inter").cast("double") / col("union")))
      .select("id_a", "id_b", "inter", "union", "jaccard")
  }

  /** Expand representative-level pairs to full id pairs across fingerprint
    * groups, carrying the rep pair's metric columns (identical normalized
    * text ⇒ identical shingle sets/signatures). Emits id_a < id_b.
    */
  private def expandCross(repPairs: DataFrame, byRep: DataFrame,
                          carry: Seq[String]): DataFrame =
    repPairs
      .join(byRep.select(col("rep").as("id_a"), col("id").as("ma")), "id_a")
      .join(byRep.select(col("rep").as("id_b"), col("id").as("mb")), "id_b")
      .select(least(col("ma"), col("mb")).as("id_a") +:
        greatest(col("ma"), col("mb")).as("id_b") +: carry.map(col): _*)

  /** All (id_a < id_b, rep) pairs within each fingerprint group — exact
    * duplicates by construction.
    */
  private def withinGroupPairs(byRep: DataFrame): DataFrame =
    byRep.as("x").join(byRep.as("y"),
        col("x.rep") === col("y.rep") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("x.rep").as("rep"))

  /** Full MinHash-LSH near-dup pipeline: exact-dedup collapse → LSH
    * candidates over representatives → exact-Jaccard verify → expand back
    * to id pairs above `threshold`.
    *
    * The per-rep (shingle set, signature) stage feeds the band-explode AND
    * both sides of the verification join, so it is persisted for the run
    * (ids + hashes — ~2 orders smaller than raw text) and **unpersisted
    * before returning**: the returned frame is materialized into its own
    * (small, pairs-only) persisted handle first. Call
    * `result.unpersist()` when done with it.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, k: Int = 3,
                      numHashes: Int = 64, bands: Int = 16,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = df.sparkSession
    val skipped = spark.sparkContext.longAccumulator("graft.dedup.minhash.skippedCandidatePairs")

    val groups = df.select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
    // One fingerprint aggregate yields BOTH the fp→rep map and a
    // representative text per group (any member works: fingerprint-equal
    // texts normalize to the same token stream, hence identical shingles).
    // The map-side partial min() collapses a duplicate cluster inside each
    // input partition BEFORE the shuffle — the raw corpus text is never
    // joined/shuffled wholesale.
    val repAgg = df.select(TextOps.fingerprint(col(textCol)).as("fp"),
        col(idCol).as("id"), col(textCol).as("txt"))
      .groupBy("fp").agg(min(col("id")).as("rep"), min(col("txt")).as("t"))
    val reps = repAgg.select(col("fp"), col("rep"))
    val repDocs = repAgg.select(col("rep").as("id"), col("t"))
    // (id → rep) is consumed four times by the pair expansion — cache the
    // tiny id-pair map instead of recomputing its corpus-scan lineage
    val byRep = groups.join(reps, "fp").select(col("id"), col("rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val prepared = repDocs.select(col("id"),
        array_distinct(TextOps.shingles(col("t"), k)).as("sh"),
        minhashSignature(col("t"), k, numHashes).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val candidates = bucketJoin(
      bandExplode(prepared.select(col("id"), col("sig")), bands, numHashes / bands),
      maxBucket, Some(skipped))

    val sets = prepared.select(col("id"), col("sh"))
    val repPairs = candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("union") === 0, lit(0.0)).otherwise(col("inter").cast("double") / col("union")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "union", "jaccard")

    // within-group pairs are exact duplicates: jaccard 1 whenever the
    // shingle set is non-empty
    val repSetSize = prepared.select(col("id").as("rep"), size(col("sh")).as("nsh"))
    val within = withinGroupPairs(byRep)
      .join(repSetSize, "rep")
      .filter(col("nsh") > 0)
      .select(col("id_a"), col("id_b"), col("nsh").as("inter"), col("nsh").as("union"),
        lit(1.0).as("jaccard"))
    val expanded = expandCross(repPairs, byRep, Seq("inter", "union", "jaccard"))
      .unionByName(within)

    // Materialize into a pairs-only cache, then release the corpus-sized
    // intermediates. The returned (small) frame owns its own cache; callers
    // release it with result.unpersist() when done.
    val result = expanded.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    prepared.unpersist(blocking = false)
    byRep.unpersist(blocking = false)
    if (skipped.value > 0)
      org.slf4j.LoggerFactory.getLogger("graft.dedup").warn(
        s"minhashNearDups: bucket guard (maxBucket=$maxBucket) skipped ~${skipped.value} candidate pairs")
    result
  }

  /** 64-bit SimHash over token hashes: for each bit, sum ±1 weights over
    * tokens and take the sign. One-pass typed UDF for the same codegen-
    * width reason as [[minhashSignature]].
    */
  def simhash64(textCol: Column): Column = {
    val simUdf = udf { (toks: Seq[String]) =>
      val counts = new Array[Int](64)
      if (toks != null) {
        val it = toks.iterator
        while (it.hasNext) {
          val h = hash64(it.next())
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    simUdf(TextOps.tokens(lower(textCol)))
  }

  /** SimHash near-dup pairs: exact-dedup collapse → band the 64-bit hash
    * into 4×16-bit keys (Hamming ≤ 3 over 4 bands ⇒ at least one band
    * identical, so recall at the Hamming threshold is structural, not
    * probabilistic) → verify by exact Hamming distance → expand back to id
    * pairs. Hot-bucket guard as in [[minhashNearDups]].
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBucket: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    val skipped = spark.sparkContext.longAccumulator("graft.dedup.simhash.skippedCandidatePairs")

    val groups = df.select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
    // same one-aggregate rep derivation as minhashNearDups: no corpus join
    val repAgg = df.select(TextOps.fingerprint(col(textCol)).as("fp"),
        col(idCol).as("id"), col(textCol).as("txt"))
      .groupBy("fp").agg(min(col("id")).as("rep"), min(col("txt")).as("t"))
    val reps = repAgg.select(col("fp"), col("rep"))
    val repDocs = repAgg.select(col("rep").as("id"), col("t"))
    val byRep = groups.join(reps, "fp").select(col("id"), col("rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val sigs = repDocs.select(col("id"), simhash64(col("t")).as("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("id"), posexplode(array(
      (0 until 4).map(b => shiftrightunsigned(col("sim"), b * 16).bitwiseAND(0xffffL)): _*))
      .as(Seq("band", "bucket")))

    val cand = bucketJoin(banded, maxBucket, Some(skipped))
    val repPairs = cand
      .join(sigs.select(col("id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")

    val cross = expandCross(repPairs, byRep, Seq("hamming"))
    val within = withinGroupPairs(byRep)
      .select(col("id_a"), col("id_b"), lit(0).as("hamming"))

    val result = cross.unionByName(within).persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    sigs.unpersist(blocking = false)
    byRep.unpersist(blocking = false)
    if (skipped.value > 0)
      org.slf4j.LoggerFactory.getLogger("graft.dedup").warn(
        s"simhashNearDups: bucket guard (maxBucket=$maxBucket) skipped ~${skipped.value} candidate pairs")
    result
  }
}
