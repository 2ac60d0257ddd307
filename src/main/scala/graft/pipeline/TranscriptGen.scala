package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript-table generator (FIXTURES.md §B).
  *
  * Everything is a pure function of (seed, global turn id), generated
  * distributed via `spark.range(n)` — no files, no driver-side state — so
  * the same table scales from 10^3 rows (unit tests) to 10^9+ (bench)
  * and is identical at any parallelism.
  *
  * Skew is built in deliberately to exercise salting: conversations come in
  * blocks of 100 where conv 0 of each block has 100× the base turn count
  * (top 1% of conversations hold ~33% of turns).
  */
object TranscriptGen {
  /** Markup fragment corpus mirroring the reference test surface
    * (FIXTURES.md §B; also the corpus behind the BASELINE.md reference
    * throughput measurements).
    */
  val fragments: IndexedSeq[String] = Vector(
    "[b]hello world[/b] plain text tail ",
    "[quote=user[Q]]nested [i]quote[/i] body[/quote] ",
    "[code]if (x < y && z > 0) { run(\"q\"); }[/code] ",
    "[url=http://example.com?a=1&b=2]link[/url] ",
    "[list][*]alpha[*]beta[/list] ",
    "[font size=\"12\" face=verdana]styled[/font] ",
    "plain text with [ stray bracket and \\[b]escape\\[/b] ",
    "[img width=100 height=50]http://x/y.png[/img] ",
    "multi\nline\r\ntext with <html> & \"chars\" ",
    "[noparse][b]not parsed[/b][/noparse] "
  )

  /** Base turns per normal conversation. */
  final val BaseLen = 8
  /** Turns per 100-conversation block: 99 normal + 1 skewed (100×). */
  final val BlockTurns: Long = 99L * BaseLen + 100L * BaseLen

  private final val EpochBase = 1700000000000L // fixed base, no wall clock

  /** Pure row constructor: global turn id → Turn. */
  def turnAt(g: Long, seed: Long): Turn = {
    val block = g / BlockTurns
    val r = g % BlockTurns
    val skewLen = 100L * BaseLen
    val (convIdx, turnIdx) =
      if (r < skewLen) (block * 100, r)
      else (block * 100 + 1 + (r - skewLen) / BaseLen, (r - skewLen) % BaseLen)

    // splitmix64 stream keyed by (seed, g): deterministic, allocation-free
    // (java.util.Random costs an object + seed scramble per row)
    var rndState = seed * 1000003L + g
    def nextLong(): Long = {
      rndState += 0x9e3779b97f4a7c15L
      var z = rndState
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt

    val nFrag = 1 + nextInt(8)
    val sb = new java.lang.StringBuilder(nFrag * 48)
    var i = 0
    while (i < nFrag) { sb.append(fragments(nextInt(fragments.length))); i += 1 }

    val role = (turnIdx % 3) match {
      case 0 => "user"
      case 1 => "assistant"
      case _ => "tool"
    }
    // conv-scoped strings are identical for >= 8 consecutive rows (800 for
    // the skewed conv) — a per-thread memo removes the Long.toString +
    // concat per ROW that profiled at ~3% of the whole extraction bench
    val m = convMemo.get()
    if (m.idx != convIdx) {
      m.idx = convIdx
      m.id = "conv" + pad(convIdx, 8)
      m.tool = "tool" + pad(convIdx % 20, 2)
    }
    Turn(
      conv_id = m.id,
      turn_idx = turnIdx.toInt,
      role = role,
      text = sb.toString,
      tool = if (role == "tool") m.tool else "",
      ts = new Timestamp(EpochBase + convIdx * 3600000L + turnIdx * 1000L)
    )
  }

  private final class ConvMemo { var idx: Long = -1L; var id: String = _; var tool: String = _ }
  private val convMemo = new ThreadLocal[ConvMemo] {
    override def initialValue(): ConvMemo = new ConvMemo
  }

  /** Zero-padded decimal without java.util.Formatter (which re-parses its
    * format string with a regex on every call — hot-path poison).
    */
  private def pad(v: Long, width: Int): String = {
    val digits = java.lang.Long.toString(v)
    if (digits.length >= width) digits
    else {
      val out = new Array[Char](width)
      var i = 0
      while (i < width - digits.length) { out(i) = '0'; i += 1 }
      digits.getChars(0, digits.length, out, width - digits.length)
      new String(out)
    }
  }

  /** Distributed generation of `n` turns across `partitions` input splits. */
  def turns(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 64): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(g => turnAt(g, seed))
  }
}
