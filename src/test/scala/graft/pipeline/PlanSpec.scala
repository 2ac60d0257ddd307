package graft.pipeline

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the properties that matter at 100 TB must be
  * visible in the plan, not assumed: no shuffle in the extraction hot path,
  * broadcast joins for small dimensions, column pruning reaching the scan.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
      // AQE stage wrappers are leaves whose real subtree hangs off .plan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectPlan(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectPlan)
  }

  test("extraction pipeline plans with zero shuffles") {
    val plan = ExtractJob.extract(TranscriptGen.turns(spark, 1000, 42, 4))
      .queryExecution.executedPlan
    val shuffles = collectPlan(plan).collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"extraction must not shuffle:\n$plan")
  }

  test("pdf synthesize+extract plans with zero shuffles (pure mapPartitions)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = graft.ops.PdfOps.extractText(graft.ops.PdfOps.synthesize(docs))
      .queryExecution.executedPlan
    val shuffles = collectPlan(plan).collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"pdf extraction must not shuffle:\n$plan")
  }

  test("dimension join is broadcast, not shuffled") {
    val df = SparkEntry.queries("q_join_segment_sales")(spark, sfDir)
    df.collect() // let AQE finalize
    val s = df.queryExecution.executedPlan.toString() // includes query stages
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$s")
    assert(!s.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$s")
  }

  test("column pruning reaches the parquet scan") {
    val df = SparkEntry.queries("q_topk_docs")(spark, sfDir)
    val scans = df.queryExecution.executedPlan.toString()
    // only the two selected columns should be read
    assert(scans.contains("ReadSchema"), scans)
    val readSchema = scans.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("doc_id") && readSchema.contains("n_chars")
      && !readSchema.contains("text"), readSchema)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet").filter("vec_id < 25")
    val s = df.queryExecution.executedPlan.toString()
    assert(s.contains("PushedFilters") && s.contains("LessThan(vec_id,25)"), s)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions._
    val turns = TranscriptGen.turns(spark, 2000, 42, 4).toDF()
    val stats = turns.groupBy("conv_id").agg(count(lit(1)).as("n"))
    turns.write.mode("overwrite").bucketBy(8, "conv_id").sortBy("conv_id")
      .saveAsTable("turns_b")
    stats.write.mode("overwrite").bucketBy(8, "conv_id").saveAsTable("stats_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    try {
      val joined = spark.table("turns_b").join(spark.table("stats_b"), "conv_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760)
      spark.sql("DROP TABLE IF EXISTS turns_b")
      spark.sql("DROP TABLE IF EXISTS stats_b")
    }
  }

  test("IVF cell assignment is map-side: zero shuffles over the corpus") {
    import graft.ops.SimOps
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id as neighbor_id", "embedding as cv")
    val centroids = Array.fill(4)(Array.tabulate(64)(_.toDouble / 64))
    val assigned = SimOps.assignCells(corpus, centroids)
    val shuffles = collectPlan(assigned.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"IVF assignment must not shuffle:\n${assigned.queryExecution.executedPlan}")
  }

  test("ANN top-k plans contain no window (two-phase partial top-k instead)") {
    import graft.ops.SimOps
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (df <- Seq(
        SimOps.bruteForceTopK(e.filter(col("vec_id") < 5), e, k = 2),
        SimOps.lshTopK(e.filter(col("vec_id") < 5), e, k = 2, bits = 4),
        SimOps.ivfTopK(e.filter(col("vec_id") < 5), e, k = 2, nCells = 4, nprobe = 2))) {
      val s = df.queryExecution.executedPlan.toString()
      assert(!s.contains("Window"), s"global window in ANN plan:\n$s")
      assert(s.contains("partial_topk_by_score"),
        s"expected partial bounded-heap top-k aggregation stage:\n$s")
    }
  }

  test("near-dup rep derivation shuffles no text: every exchange is text-free") {
    import graft.ops.DedupOps
    import org.apache.spark.sql.types.StringType
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // The only string allowed across ANY exchange in the signature/collapse
    // stage is the 32-char fingerprint; the raw text column must stay
    // inside the scan stage (the round-2 design shuffled min(text) per fp).
    for (repAgg <- Seq(
        DedupOps.minhashRepAgg(docs, "doc_id", "text", k = 3, numHashes = 64, bands = 16),
        DedupOps.simhashRepAgg(docs, "doc_id", "text"))) {
      // inspect the initial physical plan (pre-AQE staging) so the
      // ShuffleExchangeExec nodes are still direct tree members
      val exchanges = collectPlan(repAgg.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(exchanges.nonEmpty, "expected the fp-collapse exchange")
      for (ex <- exchanges; attr <- ex.output) {
        assert(attr.name != "text" && attr.name != "t" && attr.name != "txt",
          s"text column crosses an exchange: ${ex.output.mkString(", ")}")
        if (attr.dataType == StringType)
          assert(attr.name.startsWith("fp"),
            s"unexpected string-typed column '${attr.name}' crosses an exchange " +
              s"(only the fingerprint may): ${ex.output.mkString(", ")}")
      }
    }
  }

  test("contamination plans a broadcast join: the corpus side never shuffles") {
    import graft.ops.DedupOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import org.apache.spark.sql.functions.col
    val df = DedupOps.contamination(
      docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", k = 5)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"contamination join degraded to a corpus shuffle:\n$plan")
  }

  test("AQE splits the skewed join partition on the generator's planted 100x conversation") {
    import org.apache.spark.sql.functions._
    // conv 0 carries ~half the rows of a 30k-turn block; join turns to
    // per-conversation stats with broadcast disabled so the shuffle join's
    // skewed partition is visible to AQE's skew-join rule
    // 16 shuffle partitions so the hot conversation's reducer stands alone
    // against the median (at 4, every partition carries a similar share of
    // the non-hot convs and the byte-level skew is only ~1.1x median)
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ONE generator block: its single hot conversation holds half the
      // rows, so its reducer partition is ~15x the median. The
      // incompressible per-row digest keeps shuffle BYTES proportional to
      // row counts (the repetitive markup otherwise compresses ~14x inside
      // the hot partition and flattens the byte-level skew AQE measures).
      val turns = TranscriptGen.turns(spark, TranscriptGen.BlockTurns, 42, 8).toDF()
        .withColumn("pad", sha2(concat_ws("|", col("conv_id"),
          col("turn_idx"), col("text")), 512))
      // stats pre-materialized to a local table: OptimizeSkewedJoin only
      // matches Sort(ShuffleStage) join children — an aggregate between
      // sort and stage (as in the lazy groupBy lineage) defeats the rule
      val statsRows = turns.groupBy("conv_id").agg(count(lit(1)).as("n_turns"))
      val stats = spark.createDataFrame(
        java.util.Arrays.asList(statsRows.collect(): _*), statsRows.schema)
      val joined = turns.join(stats, "conv_id")
      joined.collect() // finalize AQE on THIS QueryExecution
      val s = joined.queryExecution.executedPlan.toString()
      assert(s.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$s")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dedupCorpus survivor filter: loser side broadcast, ZERO corpus exchanges") {
    import graft.ops.DedupOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = DedupOps.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
    df.collect() // finalize AQE
    val nodes = collectPlan(df.queryExecution.executedPlan)
    // the loser set is counted and explicitly broadcast (guarded), so the
    // survivor anti-join is a broadcast join AND the corpus side streams
    // straight from the scan — no shuffle exchange anywhere in the plan.
    // (Relying on AQE's runtime SMJ->BHJ conversion would still write the
    // corpus-side shuffle files first — at 100 TB that IS the cost.)
    assert(nodes.exists {
      case b: BroadcastHashJoinExec => b.joinType.toString == "LeftAnti"
      case _ => false
    }, s"expected a broadcast left-anti survivor join:\n${df.queryExecution.executedPlan}")
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"survivor filtering must not shuffle the corpus:\n${df.queryExecution.executedPlan}")
  }

  test("composed pretrain e2e final plan: no text column crosses an exchange") {
    import org.apache.spark.sql.types.StringType
    // the three heaviest stages (dedup signatures, CC, contamination) run
    // eagerly while the query is BUILT; the returned frame is the
    // contamination broadcast + survivor anti-join + ordering — the
    // text-free-exchange property must hold there too (the upstream
    // stages have their own PlanSpec/OpsSpec pins)
    val df = SparkEntry.queries("q_pretrain_e2e")(spark, sfDir)
    val exchanges = collectPlan(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    for (ex <- exchanges; attr <- ex.output) {
      assert(attr.name != "text",
        s"text column crosses an exchange: ${ex.output.mkString(", ")}")
      if (attr.dataType == StringType)
        assert(attr.name != "stripped_text" && !attr.name.contains("text"),
          s"unexpected text-like string column '${attr.name}' crosses an exchange")
    }
  }

  test("skew-safe duplicateSpans plans no window over the shingle key") {
    import graft.ops.DedupOps
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def windowsOverW(skewSafe: Boolean): Seq[LWindow] =
      DedupOps.duplicateSpans(docs, "doc_id", "text", k = 5, skewSafe = skewSafe)
        .queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.exists(_.references.exists(_.name == "w")) => w
        }
    // the default single-pass plan DOES carry the hot-key window (so this
    // assertion is not vacuous) ...
    assert(windowsOverW(skewSafe = false).nonEmpty,
      "expected the default plan's count() OVER (PARTITION BY w)")
    // ... and the skew-safe plan must not: its per-window count is a
    // two-level hash aggregate (map-side combine collapses the hot key)
    // plus an AQE-splittable join-back — no reducer ever materializes a
    // window key's full occurrence list
    assert(windowsOverW(skewSafe = true).isEmpty,
      "skew-safe duplicateSpans must not plan a window over w")
    // the join-back + partial-agg shape is actually planned
    val s = DedupOps.duplicateSpans(docs, "doc_id", "text", k = 5, skewSafe = true)
      .queryExecution.executedPlan.toString()
    assert(s.contains("partial_count") || s.contains("HashAggregate"),
      s"expected a hash-aggregate count stage:\n$s")
  }

  test("whole-stage codegen covers the text-analysis operators") {
    val df = SparkEntry.queries("q_docs_quality")(spark, sfDir)
    df.collect() // finalize AQE so codegen stages appear
    // codegen'd operators carry a *(n) stage prefix in the plan string
    val s = df.queryExecution.executedPlan.toString()
    assert(s.contains("*("), s)
  }

  test("LM scoring: count tables broadcast, text never crosses an exchange") {
    import graft.ops.LmOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (bi, uni, v) = LmOps.bigramLm(docs, "text")
    val (ng, ctxT, v3) = LmOps.ngramLm(docs, "text", n = 3)
    // BOTH orders: the bigram public path and the order-n general path
    for (scored <- Seq(
        LmOps.perplexityBits(docs, "doc_id", "text", bi, uni, v),
        LmOps.perplexityBitsN(docs, "doc_id", "text", ng, ctxT, v3, n = 3))) {
      val planStr = scored.queryExecution.executedPlan.toString
      val plan = collectPlan(scored.queryExecution.executedPlan)
      // the two model joins must be broadcast (bounded clean-reference
      // contract) — a shuffle join here re-partitions the scored corpus
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.size >= 2,
        s"expected both count-table joins broadcast:\n$planStr")
      // the only exchange is the per-document aggregation, and it carries
      // (doc_id, count, decimal sum) — never the text column
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "expected the per-doc aggregation exchange")
      for (e <- exchanges; attr <- e.output)
        assert(attr.name != "text",
          s"text crosses an exchange: ${e.output.mkString(", ")}\n$planStr")
    }
  }
}
