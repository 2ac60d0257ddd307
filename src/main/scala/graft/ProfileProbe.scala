package graft

import graft.pipeline.{ExtractJob, TranscriptGen}
import org.apache.spark.sql.SparkSession

/** Dev utility: in-process sampling profiler for the extraction hot path
  * (jstack attach is unavailable in this sandbox). A daemon thread samples
  * every executor-task thread's stack while the extract job loops, then
  * prints the hottest frames, attributed to the deepest graft/spark frame.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cores = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, frames) =>
            if (t.getName.startsWith("Executor task launch") && frames.nonEmpty) {
              // attribute to the deepest frame plus its caller for context
              val top = frames.take(2).map(f =>
                s"${f.getClassName}.${f.getMethodName}").mkString(" <- ")
              counts.computeIfAbsent(top, _ => new java.util.concurrent.atomic.AtomicLong())
                .incrementAndGet()
            }
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // warmup
    ExtractJob.extract(TranscriptGen.turns(spark, n / 10, 42, 256))
      .write.format("noop").mode("overwrite").save()
    sampling = true
    val t0 = System.nanoTime()
    ExtractJob.extract(TranscriptGen.turns(spark, n, 42, 256))
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    sampling = false

    println(f"[profile] n=$n cores=$cores sec=$sec%.2f tput=${n / sec}%.0f turns/s")
    import scala.jdk.CollectionConverters._
    val total = counts.values.asScala.map(_.get).sum.toDouble
    counts.asScala.toSeq.sortBy(-_._2.get).take(30).foreach { case (frame, c) =>
      println(f"[profile] ${c.get / total * 100}%5.1f%% $frame")
    }
    spark.stop()
  }
}
