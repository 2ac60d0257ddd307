package graft

import graft.pipeline.{ExtractJob, SpanLineage}
import graft.sources.TranscriptSource
import org.apache.spark.sql.SparkSession

/** Production launch entry for the extraction pipeline, run via
  * spark-submit on a real cluster:
  *
  * {{{
  * spark-submit --class graft.ExtractMain <jar> \
  *   --in <path-or-table> --out <dir> \
  *   [--mode extract|main-content] [--format parquet|iceberg] \
  *   [--markup bbcode|html] [--buckets N] \
  *   [--date-from YYYY-MM-DD] [--date-to YYYY-MM-DD] \
  *   [--lineage <dir>] [--spans <dir>]
  * }}}
  *
  * `--mode main-content` runs the DOM-heuristic boilerplate-removal stage
  * (ContentExtract) over HTML turns instead of strip+render, with the same
  * resumable bucket machinery.
  *
  * Behavior: resumable bucket-committed write (re-running after any
  * partial failure completes exactly the missing buckets), optional
  * per-partition lineage table and span-lineage table, and one final JSON
  * metrics line on stdout (rows, parse errors, wall seconds, turns/sec,
  * completed buckets). Master/executors come from spark-submit — the job
  * itself sets only job-shape configuration.
  */
object ExtractMain {
  private def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"arguments must be --flag value pairs, got: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k, v) => sys.error(s"expected a --flag, got '$k $v'")
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val in = a.getOrElse("in", sys.error("--in <path-or-table> is required"))
    val out = a.getOrElse("out", sys.error("--out <dir> is required"))
    val markup = a.getOrElse("markup", "bbcode").toLowerCase match {
      case "html"   => ExtractJob.Html
      case "bbcode" => ExtractJob.BBCode
      case other    => sys.error(s"--markup must be bbcode or html, got '$other'")
    }
    val buckets = a.getOrElse("buckets", "256").toInt

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val turns = TranscriptSource.read(spark, TranscriptSource.Config(
      format = a.getOrElse("format", "parquet"),
      location = in,
      dateFrom = a.get("date-from"),
      dateTo = a.get("date-to")))

    val metrics = ExtractJob.newMetrics(spark)
    val t0 = System.nanoTime()
    val done = a.getOrElse("mode", "extract").toLowerCase match {
      case "extract" =>
        ExtractJob.runResumable(spark, turns, out, buckets = buckets,
          cfg = ExtractJob.defaultCfg(markup), metrics = Some(metrics), markup = markup)
      case "main-content" =>
        // the lineage/span sinks describe the strip/render pipeline, not
        // the main-content output — silently writing them here would emit
        // plausible-looking but meaningless tables
        require(a.get("lineage").isEmpty && a.get("spans").isEmpty,
          "--lineage/--spans apply to --mode extract only")
        // main-content always runs the HTML ContentExtract config; a
        // --markup flag here would be silently ignored — reject it like
        // --lineage/--spans instead of letting the user believe it applied
        require(a.get("markup").isEmpty,
          "--markup applies to --mode extract only (main-content is HTML-only)")
        ExtractJob.runResumableMainContent(spark, turns, out, buckets = buckets,
          metrics = Some(metrics))
      case other => sys.error(s"--mode must be extract or main-content, got '$other'")
    }

    // extraction throughput is measured over the extract phase only — the
    // optional lineage/span sinks are separate full passes
    val sec = (System.nanoTime() - t0) / 1e9

    a.get("lineage").foreach { dir =>
      ExtractJob.lineage(turns, markup = markup).write.mode("overwrite").parquet(dir)
    }
    a.get("spans").foreach { dir =>
      SpanLineage.spanTable(turns, markup = markup)
        .write.mode("overwrite").parquet(dir)
    }
    val rows = metrics.rows.value
    def f(d: Double): String = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    // JSON-escape the user-supplied path (quotes/backslashes/control chars
    // would otherwise produce an unparseable metrics line)
    val outJson = out.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    println(s"""{"rows":$rows,"parse_errors":${metrics.errors.value},""" +
      s""""wall_sec":${f(sec)},"turns_per_sec":${f(if (sec > 0) rows / sec else 0)},""" +
      s""""completed_buckets":${done.size},"out":"$outJson"}""")
    spark.stop()
  }
}
