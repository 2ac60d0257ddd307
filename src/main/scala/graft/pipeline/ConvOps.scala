package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation-level quality operators over transcript turn tables
  * (conv_id, turn_idx, role, text, tool): per-conversation stats, the
  * quality gate built on them, and the chat-template render that turns a
  * surviving conversation into one training document.
  *
  * Scale shape: every aggregate is a hash `groupBy(conv_id)` with map-side
  * partial combine (a hot conversation collapses before the exchange).
  * Role-alternation violations deliberately avoid the
  * `lag() OVER (PARTITION BY conv_id)` window — a 10⁹-turn conversation
  * would land on ONE reducer with no AQE skew split (windows are exempt).
  * Instead each turn equi-joins its successor on (conv_id, turn_idx+1):
  * the join key is near-unique, so the work is uniformly distributed no
  * matter how heavy one conversation is, and AQE can still split residual
  * skew because it IS a join.
  */
object ConvOps {

  /** Per-conversation quality statistics. Counts only (bit-exact across
    * engines): turns, per-role turns, tool calls, empty turns, total text
    * chars, and adjacent same-role violations.
    */
  def convStats(turns: DataFrame): DataFrame = {
    val base = turns.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
      sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
      sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool_role"),
      sum(when(col("tool") =!= "none" && col("tool") =!= "", 1L).otherwise(0L)).as("n_tool_calls"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(length(col("text")).cast("long")).as("total_chars"))
    base.join(violations(turns), Seq("conv_id"), "left")
      .na.fill(0L, Seq("n_violations"))
  }

  /** Adjacent same-role pairs per conversation via the successor
    * equi-join (see scaladoc above for why not a window).
    */
  private def violations(turns: DataFrame): DataFrame = {
    val k = turns.select(col("conv_id"), col("turn_idx"), col("role"))
    val succ = k.select(col("conv_id"), (col("turn_idx") - 1).as("turn_idx"),
      col("role").as("next_role"))
    k.join(succ, Seq("conv_id", "turn_idx"))
      .filter(col("role") === col("next_role"))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_violations"))
  }

  /** Conversation-level quality gate: enough turns, clean role
    * alternation (≤ `maxViolations`), and a bounded empty-turn share
    * (`n_empty * 100 ≤ maxEmptyPct * n_turns` — integer arithmetic, no
    * float thresholds). Returns surviving conversations with the deciding
    * stats attached.
    */
  def convFilter(turns: DataFrame, minTurns: Int = 3, maxViolations: Int = 0,
                 maxEmptyPct: Int = 25): DataFrame =
    convStats(turns).filter(
      col("n_turns") >= minTurns &&
        col("n_violations") <= maxViolations &&
        col("n_empty") * 100 <= col("n_turns") * maxEmptyPct)

  /** Render each conversation into one role-tagged training document:
    * turns in stable (conv_id, turn_idx) order, each prefixed
    * `<|role|>`, joined with newlines. Sorting happens inside the
    * collected array (never by partition luck); the one-row-per-conv
    * output bound is inherent to the contract, as with
    * [[ConvAssembly.assemble]] — use [[ConvAssembly.assembleSalted]]'s
    * two-phase shape when turn-count skew is heavy.
    */
  def renderChatTemplate(turns: DataFrame, textCol: String = "text"): DataFrame =
    turns.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("turn_idx"),
            // null text/role coalesce to "": a null would nullify the
            // concat and array_join would then silently DROP the turn,
            // desynchronizing the render from the turn count
            concat(lit("<|"), coalesce(col("role"), lit("")), lit("|>"),
              coalesce(col(textCol), lit(""))).as("t")))),
          s => s.getField("t")),
        "\n").as("training_text"))
}
