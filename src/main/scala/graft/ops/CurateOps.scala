package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation for training-data assembly: pick WHICH documents train,
  * under global constraints — a token budget, per-source caps, and
  * temperature-weighted source mixing. All three avoid the global-window
  * trap (`sum(...) OVER (ORDER BY ...)` / `row_number() OVER (ORDER BY
  * ...)` plan as ONE partition in Spark): the budget selection reuses the
  * two-phase range-partition + broadcast-prefix-offset idiom
  * ([[ShuffleOps.globalShuffle]]), the caps use the bounded-heap
  * `topk_by_score` native aggregate (O(k) state map- AND reduce-side),
  * and the mixing decision is a map-side content-hash filter against
  * per-source rates derived from a tiny broadcast count table.
  */
object CurateOps {

  /** Select documents in priority order (highest `priority` first, ties by
    * ascending id) until the global token budget is exhausted: a document
    * is kept iff the cumulative token count INCLUDING it is ≤ `budget`
    * (no partial documents). Returns (id, n_tokens, cum_tokens) for the
    * kept rows.
    *
    * Scale shape: range-partition by (priority desc, id) and sort within
    * partitions — both fully distributed — then per-partition token sums
    * (one long per partition) become broadcast prefix offsets added
    * map-side. Partitions whose starting offset already exceeds the
    * budget emit nothing without touching their rows. Only (id, priority,
    * n_tokens) ever shuffles — payload text stays at the scan.
    */
  def budgetSelect(df: DataFrame, idCol: String, priority: Column,
                   tokenCount: Column, budget: Long,
                   partitions: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // null cost reads as 0 and null priority sorts last (desc NULLS LAST):
    // a null-text doc costs nothing and never displaces a real one —
    // without the coalesce the per-partition sum pass would NPE on the
    // primitive getLong
    val sorted = df
      .select(col(idCol).cast("long").as("id"), priority.cast("double").as("pri"),
        coalesce(tokenCount.cast("long"), lit(0L)).as("n_tokens"))
      .repartitionByRange(p, col("pri").desc, col("id"))
      .sortWithinPartitions(col("pri").desc, col("id"))
      .localCheckpoint(true)
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(2))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    import spark.implicits._
    sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bc.value(i)
      if (cum >= budget) Iterator.empty // whole partition past the cutoff
      else it.flatMap { r =>
        cum += r.getLong(2)
        if (cum <= budget) Some((r.getLong(0), r.getLong(2), cum)) else None
      }
    }.toDF(idCol, "n_tokens", "cum_tokens")
  }

  /** Keep at most `n` documents per group, best `score` first (ties by
    * ascending id — pass a tie-free composite score when exactness
    * matters). Returns (group, id, rank) with rank 1 = best.
    *
    * Scale shape: the bounded-heap `topk_by_score` aggregate — O(n) state
    * per group on both the partial (map) and final side, so a group with
    * 10⁹ members shuffles partitions×n pre-reduced pairs, never the
    * member stream; `row_number() OVER (PARTITION BY group)` would pull
    * every member of the hottest group onto one reducer (windows get no
    * AQE skew split).
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  score: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        score.cast("double").as("s"))
      .groupBy("grp")
      .agg(expr(s"topk_by_score(s, id, $n)").as("__top"))
      .select(col("grp").as(groupCol), posexplode(col("__top")))
      .select(col(groupCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Temperature-weighted source mixing: per-source keep rate
    * `floor(1000 · (n_min / n_src)^(1−α))` per-mille (α = `alpha`), so the
    * smallest source is kept whole and larger sources are down-sampled
    * toward a flatter source distribution as α → 0 (α = 1 keeps
    * everything — the raw distribution). The keep decision is the same
    * salted content-hash bucket as [[TextOps.sampleKeep]]: map-side,
    * reproducible across runs/layouts/engines, content-stable.
    *
    * For α = 0.5 the rate is `floor(1000·sqrt(n_min/n_src))`, and `sqrt`
    * is IEEE-correctly-rounded in both the JVM and DuckDB — the oracle is
    * bit-exact. (General `pow` is not guaranteed correctly rounded;
    * callers needing a cross-engine-exact rate should stick to α = 0.5.)
    *
    * Scale shape: the count table is one row per source (hash agg with
    * map-side combine); it joins back under an explicit `broadcast` —
    * the corpus never shuffles, and null-content docs drop (they are not
    * trainable and would otherwise share one hash bucket).
    */
  def mixByTemperature(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, alpha: Double = 0.5,
                       seed: String = "mix"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol).as("__mix_grp")).agg(count(lit(1)).as("n_src"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("n_src")).as("n_min"))))
    val rates = withMin.select(col("__mix_grp"),
      floor(lit(1000.0) * (
        if (alpha == 0.5) sqrt(col("n_min").cast("double") / col("n_src"))
        else pow(col("n_min").cast("double") / col("n_src"), 1.0 - alpha)
      )).cast("int").as("rate_mille"))
    df.join(broadcast(rates), col(groupCol) === col("__mix_grp"))
      .filter(col(textCol).isNotNull &&
        TextOps.hashBucket(concat_ws(":", lit(seed), col(textCol)), 1000)
          < col("rate_mille"))
      .select(col(idCol), col(groupCol), col("rate_mille"))
  }

  /** Per-source data card — the release-documentation table every corpus
    * ships with: for each `groupCol` value, document and token counts,
    * mean document length (tokens and chars, 4-decimal), the count of
    * token-free documents, the number of distinct languages, and the
    * dominant language (most documents; ties break on ascending language
    * code). Output: (source, n_docs, n_tokens, n_empty, n_langs,
    * top_lang, mean_tokens, mean_chars) — every number integer-derived so
    * the SQL oracle is exact.
    *
    * Scale shape: one corpus scan feeding two hash aggregates — per
    * (source, lang) then per source — both with map-side combine; no row
    * wider than a few counters ever shuffles. The dominant-language pick
    * is `min(struct(-cnt, lang))` over the per-source language rows — an
    * aggregate, not a window, so a 10^12-doc source with 200 languages
    * still reduces map-side (group cardinality = |sources| × |langs|,
    * tiny by nature).
    */
  def dataCard(df: DataFrame, groupCol: String, textCol: String,
               langCol: String): DataFrame = {
    // null text is in-domain (token-free, zero chars — same as ""), and
    // no lower(): token COUNT is case-invariant, so lowercasing the whole
    // corpus here would be pure wasted CPU
    val toks = TextOps.tokens(coalesce(col(textCol), lit("")))
    val perLang = df
      .select(col(groupCol).as("source"), col(langCol).as("__lang"),
        size(toks).cast("long").as("__nt"),
        length(coalesce(col(textCol), lit(""))).cast("long").as("__nc"))
      .groupBy("source", "__lang")
      .agg(count(lit(1)).as("__docs"), sum("__nt").as("__toks"),
        sum(when(col("__nt") === 0, 1L).otherwise(0L)).as("__empty"),
        sum("__nc").as("__chars"))
    perLang
      .groupBy("source")
      .agg(
        sum("__docs").as("n_docs"),
        sum("__toks").as("n_tokens"),
        sum("__empty").as("n_empty"),
        count(lit(1)).as("n_langs"),
        // NULL lang sorts LAST inside the argmax (ADVICE r5): Spark's
        // min(struct) orders null fields first, but the oracle's ORDER BY
        // lang is NULLS LAST — a null group tying for the max doc count
        // would diverge. The sentinel (max 3-byte UTF-8 char, above any
        // real language tag) makes null lose ties in both engines and is
        // mapped back to null when the null group wins outright.
        nullif(
          min(struct((-col("__docs")).as("negc"),
            coalesce(col("__lang"), lit("\uffff")).as("lang")))
            .getField("lang"),
          lit("\uffff")).as("top_lang"),
        round(sum("__toks").cast("double") / sum("__docs"), 4).as("mean_tokens"),
        round(sum("__chars").cast("double") / sum("__docs"), 4).as("mean_chars"))
  }
}
