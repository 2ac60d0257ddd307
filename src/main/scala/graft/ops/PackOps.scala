package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: greedily pack documents (in
  * stable id order) into token-budget bins — the stage that turns a
  * filtered corpus into fixed-budget training sequences.
  *
  * Global greedy packing is inherently sequential, so the scale design
  * parallelizes by GROUP: docs are partitioned into deterministic
  * `groupSize`-id ranges (`grp = id div groupSize`), each group packs
  * independently in id order, and bin ids are per-group. The shuffle
  * carries (id, grp, n_tok) — ~20 bytes/row — and per-reducer state is
  * bounded by `groupSize` rows. Packing quality loss vs a global fold is
  * at most one under-filled bin per group; pick `groupSize` ≫
  * budget/avg_tokens so it is negligible. The fold itself (and the greedy
  * rule: a doc that would overflow the running bin starts a new bin; an
  * oversized single doc occupies its own bin) is integer-exact and
  * mirrored by a recursive-CTE oracle in SQL.
  */
object PackOps {
  final case class PackedDoc(doc_id: Long, grp: Long, bin: Int, cum_tok: Int)

  /** Pack each deterministic id-range group greedily in id order.
    * `tokCol` must be an integer token count column on `df`.
    */
  def packChunks(df: DataFrame, idCol: String, tokCol: String,
                 budget: Int, groupSize: Int = 1024): Dataset[PackedDoc] = {
    require(budget > 0 && groupSize > 0, "budget and groupSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(tokCol).cast("int").as("n_tok"))
      .withColumn("grp", expr(s"doc_id div $groupSize")) // ids assumed >= 0
      .select("doc_id", "grp", "n_tok")
      .as[(Long, Long, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (grp, rows) =>
        // bounded by groupSize rows per group (the documented contract)
        val sorted = rows.toArray.sortBy(_._1)
        var bin = 0
        var cum = 0
        sorted.iterator.zipWithIndex.map { case ((id, _, tok), i) =>
          if (i == 0) { cum = tok }
          else if (cum + tok > budget) { bin += 1; cum = tok }
          else cum += tok
          PackedDoc(id, grp, bin, cum)
        }
      }
  }
}
