package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (NOT part of the driver contract): write
  * `.explain("formatted")` for the named SparkEntry queries to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence for
  * plans/r06/. Usage: runMain graft.PlanDumpR06 <outDir> <suffix> q1 q2 ...
  */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-plan-dump-r06")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
      try w.println(txt) finally w.close()
      println(s"dumped $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
