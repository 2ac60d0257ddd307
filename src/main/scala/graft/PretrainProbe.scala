package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (NOT part of the driver contract): stage-level timing of the
  * q_pretrain_e2e composition — quality filter / dedupCorpus /
  * contamination+anti-join — to localize its cost without a profiler.
  */
object PretrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pretrain-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for (run <- 1 to runs) {
      println(s"== run $run ==")
      // mirror SparkEntry.docs()'s scale-adaptive widening
      val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      val d = if (d0.rdd.getNumPartitions < 32) d0.repartition(32) else d0
      val kept = t("quality filter + ckpt") {
        val keepExpr = TextOps.bindOnce(TextOps.tokens(lower(col("text")))) { ltoks =>
          TextOps.bindOnce(TextOps.shinglesOf(ltoks, 2)) { sh2 =>
            val nTok = size(ltoks)
            val nBi = size(sh2)
            val nDbi = size(array_distinct(sh2))
            !(nTok < 24) && !(TextOps.stopwordCountOf(ltoks) * 20 < nTok) &&
              !(TextOps.punctCount(col("text")) * 5 > length(col("text"))) &&
              !((nBi - nDbi) * 4 > nBi)
          }
        }
        d.filter(keepExpr)
          .select("doc_id", "text")
          .localCheckpoint(true)
      }
      val survivors = t("dedupCorpus") {
        DedupOps.dedupCorpus(kept, "doc_id", "text",
          threshold = 0.5, numHashes = 512, bands = 64)
      }
      val survivorsCk = t("survivors ckpt") { survivors.localCheckpoint(true) }
      val train = survivorsCk.filter(col("doc_id") % 5 =!= 0)
      val contaminated = t("contamination") {
        DedupOps.contamination(
          train, d.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", k = 5, hashed = false)
          .select(col("id").as("doc_id"))
      }
      t("anti-join + noop") {
        train.join(contaminated, Seq("doc_id"), "left_anti")
          .select("doc_id")
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
