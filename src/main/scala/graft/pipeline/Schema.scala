package graft.pipeline

import java.sql.Timestamp

/** One transcript turn — the input row shape (matches the target table:
  * conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Extraction output for one turn: extracted plain text, rendered HTML,
  * escape-offset spans for input→output position mapping, per-turn parse
  * stats, and an error channel.
  */
final case class TurnOut(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    plain_text: String,
    html: String,
    offsets: Array[Long],     // packed (position << 32 | amount) escape shifts
    n_tags: Int,
    n_chars: Int,
    parse_error: String
)

/** Main-content extraction output for one turn (`--mode main-content`):
  * the DOM-heuristic main text of the turn's HTML, boilerplate elided.
  */
final case class MainContentOut(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    main_text: String,
    n_chars: Int,
    parse_error: String
)

/** Per-input-partition lineage/metrics row emitted by the extract job. */
final case class PartitionStat(
    partition_id: Int,
    rows: Long,
    parse_errors: Long,
    nanos: Long
)
