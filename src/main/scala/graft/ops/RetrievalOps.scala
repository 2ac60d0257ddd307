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
