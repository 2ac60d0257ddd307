package graft

import graft.pipeline.{ExtractJob, TranscriptGen}
import org.apache.spark.sql.SparkSession

/** Ad-hoc scaling probe: time the extraction job at several parallelism
  * levels to diagnose scaling bottlenecks (GC, scheduler, skew).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 16, 32)
    for (cores <- levels) {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      // warmup
      ExtractJob.extract(TranscriptGen.turns(s, n / 10, 42, 256))
        .write.format("noop").mode("overwrite").save()
      def gcStats(): (Long, Long) = {
        import scala.jdk.CollectionConverters._
        val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
      }
      def time(label: String, parts: Int)(body: Int => Unit): Unit = {
        val runs = (1 to 3).map { _ =>
          val (gc0, gt0) = gcStats()
          val t0 = System.nanoTime()
          body(parts)
          val sec = (System.nanoTime() - t0) / 1e9
          val (gc1, gt1) = gcStats()
          f"$sec%.2f(gc=${(gt1 - gt0) / 1000.0}%.1fs)"
        }
        println(s"[probe] cores=$cores n=$n parts=$parts $label runs=${runs.mkString(" | ")}")
      }
      time("gen-only", 256) { p =>
        TranscriptGen.turns(s, n, 42, p).write.format("noop").mode("overwrite").save()
      }
      time("gen+extract", 256) { p =>
        ExtractJob.extract(TranscriptGen.turns(s, n, 42, p))
          .write.format("noop").mode("overwrite").save()
      }
      time("gen+extract", cores * 3) { p =>
        ExtractJob.extract(TranscriptGen.turns(s, n, 42, p))
          .write.format("noop").mode("overwrite").save()
      }
      s.stop()
    }
  }
}
