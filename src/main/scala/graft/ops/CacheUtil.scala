package graft.ops

import org.apache.spark.sql.Dataset

/** Shared cache/lineage plumbing for iterative operators. */
private[graft] object CacheUtil {
  /** Release a localCheckpoint'd frame's executor blocks NOW: the blocks
    * live on the checkpointed internal RDD (Dataset.unpersist does not
    * touch them; without this they are only freed when the RDD is GC'd —
    * an iterative loop would retain every superseded round's full frame
    * in executor storage).
    */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
