package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * Spark has no native as-of join; the naive encoding (`l.ts >= r.ts` plus
  * a per-left-row max) plans as an inequality join — broadcast-nested-loop
  * or an exploding range join at corpus scale. The implementation here is
  * the scalable shape: tag both sides, union, and forward-fill the right
  * side's values over a per-key window — ONE shuffle on the key, O(1)
  * window state per row, no row multiplication at any skew.
  */
object JoinOps {

  /** For each left row, attach the most recent right row with the same
    * `key` and `right.tsCol <= left.tsCol` (inclusive). Right `valueCols`
    * are appended to the left schema (null when no right row precedes the
    * left row).
    *
    * Determinism: if several right rows share (key, ts), the one sorting
    * last by `valueCols` wins — dedupe the right side to unique (key, ts)
    * upstream when that matters (the DuckDB ASOF oracle requires it too).
    *
    * NULL semantics follow SQL ASOF: a right row with a NULL key or NULL
    * ts can never match (it is dropped here — `partitionBy` would
    * otherwise group NULL keys as a value and NULLS-FIRST ordering would
    * make a NULL-ts right row every partition's "earliest checkpoint");
    * left rows always pass through, with null values when nothing matches.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val rightTypes = valueCols.map(c => c -> right.schema(c).dataType).toMap

    // right rows sort BEFORE left rows at equal ts => inclusive as-of
    val taggedRight = right
      .filter(col(key).isNotNull && col(tsCol).isNotNull)
      .select(
        (col(key) +: col(tsCol) +: valueCols.map(c => col(c).as(s"__r_$c"))): _*)
      .withColumn("__side", lit(0))
    val nullLeftFill = valueCols.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c"))
    val taggedLeft = left.select(
      (left.columns.map(col).toSeq ++ nullLeftFill): _*)
      .withColumn("__side", lit(1))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("__side").asc,
        struct(valueCols.map(c => col(s"__r_$c")): _*).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // fill ONE struct of all right values so a whole right row wins or
    // loses together (per-column last(ignoreNulls) would mix columns from
    // different right rows when a value is null)
    val filled = unioned
      .withColumn("__r_row", when(col("__side") === 0,
        struct(valueCols.map(c => col(s"__r_$c").as(c)): _*)))
      .withColumn("__f_row", last(col("__r_row"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        valueCols.map(c => col(s"__f_row")(c).as(c)): _*)
  }
}
