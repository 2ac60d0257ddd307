package graft.pipeline

import graft.core._
import org.apache.spark.sql.Dataset

/** One extracted-text span: the half-open input span `[node_begin,
  * node_end)` of a text node and the half-open span `[out_begin, out_end)`
  * its (optionally transformed) body occupies in the extracted output.
  */
final case class SpanRow(
    conv_id: String,
    turn_idx: Int,
    node_begin: Int,
    node_end: Int,
    out_begin: Int,
    out_end: Int
)

/** Input-position → output-position lineage for the extraction pipeline,
  * built on the core's NodeConsumer visitor tap (reference:
  * service/Transformer.java:56-65, tapped by TextTransformer.java:55-57) —
  * the position-mapping capability the reference library exists for, emitted
  * as a table at corpus scale.
  *
  * Scale shape: strictly per-turn (`mapPartitions` flatMap, no shuffle);
  * span rows are 4 ints + the key — orders of magnitude smaller than the
  * text they index.
  */
object SpanLineage {

  /** Pure core: strip `text` and return (output, spans). Concatenating
    * `output[out_begin, out_end)` over the spans in order reconstructs the
    * output exactly; with no transform function each output slice equals its
    * input slice `text[node_begin, node_end)`.
    */
  def stripSpans(text: String,
                 cfg: Map[String, TagAttributes],
                 markup: ExtractJob.Markup = ExtractJob.BBCode,
                 fn: Transform.TransformFunction = null): (String, Vector[(Int, Int, Int, Int)]) = {
    val doc = markup match {
      case ExtractJob.BBCode => BBCodeParser.parse(text, cfg)
      case ExtractJob.Html   => HtmlParser.parse(text, cfg)
    }
    val spans = Vector.newBuilder[(Int, Int, Int, Int)]
    var cursor = 0
    val consumer: Transform.NodeConsumer = (node, result, _) => node match {
      case t: TextNode =>
        spans += ((t.begin, t.end, cursor, cursor + result.length))
        cursor += result.length
      case _ =>
    }
    val out = Transform.textTransform(doc, fn = fn, consumer = consumer)
    (out, spans.result())
  }

  /** The lineage table for a transcript Dataset: one row per text node per
    * turn. `cfg = null` resolves per markup dialect.
    */
  def spanTable(turns: Dataset[Turn],
                cfg: Map[String, TagAttributes] = null,
                markup: ExtractJob.Markup = ExtractJob.BBCode): Dataset[SpanRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val resolvedCfg = if (cfg != null) cfg else ExtractJob.defaultCfg(markup)
    turns.mapPartitions { iter =>
      iter.flatMap { t =>
        if (t.text == null) Iterator.empty
        else {
          val (_, spans) = stripSpans(t.text, resolvedCfg, markup)
          spans.iterator.map { case (nb, ne, ob, oe) =>
            SpanRow(t.conv_id, t.turn_idx, nb, ne, ob, oe)
          }
        }
      }
    }
  }
}
