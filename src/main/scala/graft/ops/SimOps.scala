package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), all in native Catalyst expressions.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * streams the corpus once — no corpus shuffle, no NxN blowup; the LSH
  * variant buckets by random-hyperplane signature so each query only scans
  * its bucket (candidate set ~ corpus/2^bits per probe), which is the path
  * that survives a 100 TB corpus.
  */
object SimOps {
  /** Cosine similarity of two array<float/double> columns via native
    * higher-order functions (zip_with + aggregate); stays inside codegen.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * corpus rows. The query side is broadcast — corpus never shuffles.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane signature: bit i = sign of
    * dot(v, h_i) where h_i[j] = ±1 derived from a hash of (i, j). One-pass
    * typed UDF (a `bits`-wide Catalyst expression tree falls out of
    * codegen; the UDF reads the vector once).
    */
  def lshSignature(vec: Column, bits: Int): Column = {
    val sigUdf = udf { (v: Seq[Float]) =>
      var sig = 0L
      if (v != null) {
        var i = 0
        while (i < bits) {
          var dot = 0.0
          var j = 0
          while (j < v.length) {
            // ±1 pseudo-plane component from an avalanche of (i, j)
            var x = (i.toLong << 32 | j.toLong) * 0x9e3779b97f4a7c15L
            x ^= x >>> 33
            dot += (if ((x & 1L) == 0L) v(j) else -v(j))
            j += 1
          }
          if (dot > 0) sig |= (1L << i)
          i += 1
        }
      }
      sig
    }
    sigUdf(vec)
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path: a small set of coarse centroids partitions the corpus into
    * cells; a query scans only its `nprobe` nearest cells.
    *
    * Centroids are chosen deterministically (every corpus/k-th vector by
    * id order — a k-means iteration would drop in here); assignment is a
    * broadcast argmax over centroids, so building the index is one
    * map-side pass and the search shuffles nothing but the (cell, query)
    * routing table.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // Deterministic coarse centroids WITHOUT a global sort/window (a
    // single-reducer global row_number would not survive a large corpus):
    // hash-select ~nCells rows distributed, cap at nCells, number them on
    // the tiny collected side.
    val total = c.count()
    val stride = math.max(1L, total / nCells)
    val seeds = c.filter(pmod(xxhash64(col("neighbor_id")), lit(stride)) === 0)
      .limit(nCells * 2).collect().take(nCells)
    require(seeds.nonEmpty, "no centroid seeds selected")
    val spark = corpus.sparkSession
    val centroidRows = seeds.zipWithIndex.map { case (r, i) =>
      (i, r.getAs[scala.collection.Seq[Float]]("cv"))
    }.toSeq
    val centroids = broadcast(spark.createDataFrame(centroidRows)
      .toDF("cell", "centroid"))

    // assign each corpus vector to its nearest centroid (broadcast argmax)
    val assigned = c.join(centroids)
      .withColumn("csim", cosine(col("cv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("neighbor_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") === 1)
      .select(col("cell"), col("neighbor_id"), col("cv"))

    // route each query to its nprobe nearest cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val routed = broadcast(q.join(centroids)
      .withColumn("csim", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell")))

    // scan only the probed cells
    routed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** LSH-bucketed approximate top-k: join queries to corpus rows sharing
    * the same `bits`-bit hyperplane signature, rank by exact cosine within
    * the bucket. Recall is tunable via `bits` (fewer bits → bigger buckets
    * → higher recall, more compute).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), bits).as("sig")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), bits).as("sig"))
    q.join(c, Seq("sig")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
