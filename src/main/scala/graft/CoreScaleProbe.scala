package graft

import java.util.concurrent.atomic.AtomicLong

import graft.core.TagAttributes
import graft.pipeline.{ExtractJob, TranscriptGen}

/** Spark-free scaling probe: run the per-turn core on N raw threads to
  * separate core-workload scaling from Spark-layer effects.
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(4, 16)
    val cfg = TagAttributes.bbcodeCanonical

    def run(threads: Int): Double = {
      val counter = new AtomicLong(0)
      val chunk = 10000L
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var done = false
          while (!done) {
            val start = counter.getAndAdd(chunk)
            if (start >= n) done = true
            else {
              var g = start
              val end = math.min(n, start + chunk)
              while (g < end) {
                val t = TranscriptGen.turnAt(g, 42)
                val r = ExtractJob.extractTurn(t, cfg)
                if (r.parse_error != null) sys.error("unexpected error")
                g += 1
              }
            }
          }
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(levels.head) // warmup
    for (threads <- levels) {
      val secs = (1 to 3).map(_ => run(threads))
      val best = secs.min
      println(f"[core-probe] threads=$threads%3d n=$n secs=${secs.map(s => f"$s%.2f").mkString("/")} best_tput=${n / best}%.0f per_thread=${n / best / threads}%.0f")
    }
  }
}
