package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-style corpus statistics over the token stream: TF-IDF term
  * ranking, posting-list (inverted index) construction, and the corpus-LM
  * "familiarity" quality signal. All-native column expressions; every
  * operator here has an exact DuckDB SQL mirror (integer counts and
  * small-integer divisions only — no transcendental math, so ranks and
  * hashes agree bit-for-bit across engines).
  */
object RetrievalOps {

  /** (doc_id, token, tf) and (token, df) from the lowercased whitespace
    * token stream — the two partial-aggregate passes every operator in
    * this file starts from. Map-side combine collapses per-partition
    * repeats before either exchange carries a row.
    */
  private def tfFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` TF-IDF terms per document. The rank key is the exact rational
    * tf/df (linear-idf TF-IDF: monotone in tf·idf for any fixed corpus
    * size), computed as an IEEE double — both engines divide the same
    * small integers, so the doubles and therefore the order are identical;
    * ties break on the token. Output: (doc_id, rank, token, tf, df).
    *
    * Scale shape: tf and df are two hash-aggregate passes (map-side
    * combine, no window over corpus-scale keys); the df join-back keys on
    * the token, and the per-doc ranking window partitions by doc_id —
    * bounded by a single document's vocabulary, never by corpus
    * frequency, so a hot TOKEN cannot serialize a reducer.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val tf = tfFrame(df, idCol, textCol)
    val dfc = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfc, "token")
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy((col("tf") * lit(1.0) / col("df")).desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"))
  }

  /** Inverted index: one row per token with its document frequency and the
    * first `maxPostings` doc ids (ascending, comma-joined) — the bounded
    * posting-list head a retrieval layer serves from.
    *
    * Scale shape: the per-(token, doc) distinct is a hash aggregate on the
    * composite key (a hot token's postings spread across reducers), and
    * the posting head uses the native bounded-heap `topk_by_score`
    * aggregate — O(maxPostings) state on BOTH the partial and final side,
    * so "the" with 10⁹ postings shuffles partitions×k pre-reduced pairs,
    * never the posting stream. `collect_list` + sort would hold every
    * posting of the hottest token on one reducer.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .distinct() // same hash-agg plan shape as a groupBy, no dead counter
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        expr(s"topk_by_score(-cast(doc_id as double), doc_id, $maxPostings)")
          .as("__top"))
      .select(col("token"), col("df"),
        array_join(transform(col("__top"), x => x.getField("id").cast("string")), ",")
          .as("postings"))
  }

  /** BM25 ranking: for each query, the `topK` highest-scoring documents
    * under Okapi BM25 with the Lucene idf form
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` (never negative) and the standard
    * saturation term `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`. Query
    * terms are DISTINCT (qtf = 1, the common serving simplification —
    * documented, and the oracle mirrors it). Output:
    * `(query_id, rank, doc_id, score)` with rank 1 = best; ties break on
    * ascending doc_id. Documents sharing no term with a query are absent,
    * as are queries with no tokens.
    *
    * Cross-engine determinism (the DuckDB-oracle discipline from
    * [[graft.ops.LmOps]]): the one transcendental — `ln` — is rounded to 6
    * decimals per term and the per-term product re-rounded into a
    * `decimal(18,6)`, so the per-query score is an EXACT decimal sum; the
    * ranking consumes that decimal (as a double — sums this size convert
    * exactly) with the same (score desc, doc_id asc) total order as the
    * SQL `row_number()`.
    *
    * Scale shape: the TOKEN pass scans the corpus once — tokenize once,
    * carry the doc length alongside the exploded stream, semi-join
    * against the broadcast query terms IN the scan stage so everything
    * past it (tf, df, the score join) is sized by |query terms|, not
    * |vocabulary|; the corpus never shuffles to meet the queries. The
    * corpus-stats branch (N, avgdl) is a second, cheaper scan — a
    * count+sum partial aggregate with no explode and no shuffle,
    * recomputed here so the operator is self-contained and
    * oracle-checkable (a real serving deployment precomputes it once per
    * corpus version). The per-query ranking is the bounded-heap
    * `topk_by_score` aggregate (O(topK) state on partial and final
    * sides), never a window over a query's full candidate list — a
    * stopword-ish query term matching 10⁹ documents pre-reduces to
    * partitions×topK pairs before the exchange.
    */
  def bm25TopDocs(corpus: DataFrame, idCol: String, textCol: String,
                  queries: DataFrame, qidCol: String, qtextCol: String,
                  topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(TextOps.tokens(lower(col(qtextCol))))).as("token"))
    // One corpus scan: tokenize once, carry the doc length alongside the
    // exploded stream (dl = len(tokens) == sum of tf — no corpus-wide
    // doc_id shuffle and no second scan to recover it), and semi-join the
    // stream down to query terms BEFORE the tf/df aggregates: the
    // aggregate state and exchange shrink from |vocabulary| (~10^8 keys at
    // pitched scale) to |query terms|, with identical tf/df values.
    val tfQ = corpus
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(lower(col(textCol))).as("__ts"))
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("token"))
      .join(broadcast(qterms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), min("dl").as("dl"))
    val dfc = tfQ.groupBy("token").agg(count(lit(1)).as("df"))
    // N and avgdl over ALL corpus docs (token-free docs count in N and
    // add 0 tokens) — one tiny two-long aggregate, computed in-plan so the
    // operator stays a single lazy frame (no driver action).
    val stats = corpus
      .select(size(TextOps.tokens(lower(col(textCol)))).cast("long").as("n_toks"))
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_total"))
      .select(col("n_docs"), (col("n_total").cast("double") / col("n_docs")).as("avgdl"))
    val perTerm = tfQ
      .join(broadcast(qterms), "token")
      .join(dfc, "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("term_score",
        round(col("idf") * (col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))), 6)
          .cast("decimal(18,6)"))
    perTerm
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score"))
      .groupBy("query_id")
      .agg(expr(s"topk_by_score(cast(score as double), doc_id, $topK)").as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), (col("__pos") + 1).as("rank"),
        col("__e.id").as("doc_id"),
        col("__e.score").cast("decimal(18,6)").as("score"))
  }

  /** Corpus-LM familiarity: for each document, the number of token bigrams
    * and the sum over its bigram OCCURRENCES of that bigram's corpus-wide
    * occurrence count — a high sum means the document is built from
    * word transitions the corpus has seen often (the integer-exact stand-in
    * for an n-gram LM likelihood; rare-transition gibberish scores low).
    * Output: (doc_id, n_bi, familiarity), docs with < 2 tokens score (0, 0).
    *
    * Scale shape: corpus bigram counts are one hash-aggregate pass
    * (map-side combine); the count join-back keys on the bigram string and
    * the per-doc sum is another hash aggregate — no window, no driver
    * state. The bigram stream shuffles once for the join-back; at 100 TB
    * swap the join key for xxhash64(bigram) to move 8-byte keys instead of
    * strings (collisions would merge two bigrams' counts, so the exact
    * string key stays the oracle-checked default).
    */
  def bigramFamiliarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = df.select(col(idCol).as("doc_id"),
      explode_outer(TextOps.bindOnce(TextOps.tokens(lower(col(textCol))))(ts =>
        TextOps.shinglesOf(ts, 2))).as("bigram"))
    val counts = bi.filter(col("bigram").isNotNull)
      .groupBy("bigram").agg(count(lit(1)).as("__cnt"))
    bi.join(counts, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(count(col("bigram")).cast("int").as("n_bi"),
        coalesce(sum(col("__cnt")), lit(0L)).as("familiarity"))
  }
}
