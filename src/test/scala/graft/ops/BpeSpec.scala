package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE training against a hand-computed merge sequence (the Sennrich
  * corpus {low×5, lower×2, newest×6, widest×3}), with the distributed and
  * driver-local paths asserted identical.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bpe-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    spark.createDataFrame(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .toDF("id", "text")
  }

  // hand-computed: pair counts over the char-split dictionary, ties broken
  // (count desc, left asc, right asc), greedy leftmost rewrite:
  //   r1 es(9 tie st) r2 es+t(9) r3 l+o(7 tie ow) r4 lo+w(7) r5 e+w(6 tie
  //   n-e, w-est) r6 ew+est(6 tie n-ew)
  private val expected = Seq(
    (1, "e", "s"), (2, "es", "t"), (3, "l", "o"),
    (4, "lo", "w"), (5, "e", "w"), (6, "ew", "est"))

  test("driver-local path reproduces the hand-computed merge sequence") {
    val merges = BpeOps.bpeTrain(corpus, "text", numMerges = 6)
    assert(merges.map(m => (m.rank, m.left, m.right)) == expected)
  }

  test("distributed path produces the identical merge sequence") {
    val merges = BpeOps.bpeTrain(corpus, "text", numMerges = 6, collectThreshold = 0)
    assert(merges.map(m => (m.rank, m.left, m.right)) == expected)
  }

  test("early stop below minFreq; fewer merges than requested is fine") {
    // all pairs in this corpus have count 1 -> minFreq=2 trains nothing
    val tiny = spark.createDataFrame(Seq((1L, "ab cd"))).toDF("id", "text")
    assert(BpeOps.bpeTrain(tiny, "text", numMerges = 5, minFreq = 2).isEmpty)
    // minFreq=1 merges until symbols are exhausted, then stops early
    val all = BpeOps.bpeTrain(tiny, "text", numMerges = 50, minFreq = 1)
    assert(all.nonEmpty && all.size < 50)
  }

  test("bpeSegment applies merges in rank order") {
    val merges = BpeOps.bpeTrain(corpus, "text", numMerges = 6)
    assert(BpeOps.bpeSegment("lowest", merges) == Seq("low", "est"))
    assert(BpeOps.bpeSegment("newest", merges) == Seq("n", "ewest"))
    assert(BpeOps.bpeSegment("xyz", merges) == Seq("x", "y", "z"))
  }

  test("greedy leftmost rewrite: aaa under (a,a) -> [aa, a]") {
    assert(BpeOps.mergeWord(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeOps.mergeWord(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
  }
}
