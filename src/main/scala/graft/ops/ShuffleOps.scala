package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus ordering for training-data pipelines: the global
  * shuffle that fixes example order before sharding/packing. Training runs
  * need an order that is (a) pseudo-random w.r.t. the source layout, (b)
  * reproducible across re-runs and partition layouts, and (c) computable
  * without a single-task total sort — `ORDER BY rand()` fails (a reproducer)
  * and `row_number() OVER (ORDER BY key)` fails (c): Spark plans a global
  * window as ONE partition, pulling the whole corpus through one task.
  */
object ShuffleOps {

  /** Globally shuffle by the md5 of `seed:id` and assign each row a stable
    * global position `pos` in [0, N) plus a contiguous shard id
    * `pos * nShards div N` (exactly min(nShards, N) shards, sizes within
    * one of each other) — the layout a sharded training-data writer
    * consumes directly.
    *
    * Scale shape (the two-phase total-order idiom): range-partition by the
    * hash key and sort WITHIN partitions — both fully distributed — then
    * turn per-partition row counts (one long per partition reaches the
    * driver, bounded by `partitions`) into broadcast prefix offsets added
    * map-side. Shuffled bytes per row: the 8-byte id and the 32-char hash;
    * payload columns never move — callers join the (id, shard, pos) result
    * back or feed it to a partitioned writer. The sorted frame is an eager
    * `localCheckpoint` so the count pass and the index pass share one
    * materialization (and the RDD's partition order is frozen); blocks are
    * GC-freed with the returned frame's lineage.
    *
    * md5 ties are broken by id on BOTH the range partitioner and the
    * within-partition sort, so the order is total and engine-independent.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: String,
                    nShards: Int, partitions: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // ids ride the indexing pass as longs; fail fast on a string-keyed OR
    // fractional corpus instead of mis-casting (a double id would hash on
    // "5.3" but return the truncated 5 — hash the key into a long first)
    require({
        import org.apache.spark.sql.types._
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(idCol).dataType)
      },
      s"globalShuffle requires an integral id column; '$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString}")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))).as("hk"))
      .repartitionByRange(p, col("hk"), col("id"))
      .sortWithinPartitions("hk", "id")
      .localCheckpoint(true)
    // one long per partition — bounded by `partitions`, not by |df|
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    import spark.implicits._
    // shard = pos * nShards / N (exact proportional split): produces
    // EXACTLY min(nShards, N) contiguous shards with sizes differing by at
    // most one — the naive pos / ceil(N/nShards) can leave trailing shard
    // ids empty (N=100, 64 shards → only 50 dirs), which breaks loaders
    // configured for the requested shard count. Overflow-safe to
    // N·nShards < 2^63 (10^12 rows × 10^4 shards is 10^16).
    // Range partitions are emitted in key order, so partition i's rows own
    // global positions [offsets(i), offsets(i+1)).
    sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = bcOffsets.value(i)
      it.map { r =>
        val out = (r.getLong(0), (pos * nShards / math.max(1L, n)).toInt, pos)
        pos += 1
        out
      }
    }.toDF(idCol, "shard", "pos")
  }
}
