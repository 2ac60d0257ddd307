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

  /** Running per-conversation state: turn count, char count, last index —
    * custom state via `mapGroupsWithState`. (In production this would set
    * an idle timeout so dormant conversations age out of the state store;
    * the watermark in [[windowedConvStats]] shows the bounded-state
    * variant.)
    */
  final case class ConvState(turns: Long, chars: Long, lastIdx: Int)
  final case class ConvUpdate(conv_id: String, turns: Long, chars: Long, last_idx: Int)

  def conversationState(turns: Dataset[Turn]): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvUpdate](GroupStateTimeout.NoTimeout) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
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
          ConvUpdate(convId, next.turns, next.chars, next.lastIdx)
      }
  }
}
