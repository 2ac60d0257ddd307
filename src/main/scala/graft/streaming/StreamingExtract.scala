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
