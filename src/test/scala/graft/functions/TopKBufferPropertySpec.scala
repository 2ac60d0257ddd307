package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bounded-heap accumulator behind `topk_by_score`:
  * arbitrary inserts, splits/merges, and serialization round-trips must all
  * agree with the brute-force sorted truth (score desc, id asc, take k).
  */
class TopKBufferPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  private val pairGen: Gen[(Double, Long)] = for {
    score <- Gen.oneOf(Gen.choose(-10.0, 10.0), Gen.oneOf(0.0, -0.0, 1.5, -1.5))
    id <- Gen.choose(0L, 50L)
  } yield (score, id)

  private val listGen = Gen.listOf(pairGen)
  private val kGen = Gen.choose(1, 12)

  private def truth(pairs: Seq[(Double, Long)], k: Int): Seq[(Long, Double)] =
    pairs.map { case (s, i) => (i, if (s == 0.0) 0.0 else s) }
      .sortWith { case ((i1, s1), (i2, s2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }.take(k)

  test("inserts agree with brute-force sorted truth") {
    check(Prop.forAll(listGen, kGen) { (pairs, k) =>
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.add(s, i) }
      buf.sorted.toSeq == truth(pairs, k)
    })
  }

  test("arbitrary split + merge equals single-buffer result") {
    check(Prop.forAll(listGen, Gen.choose(1, 8), Gen.choose(0, 100)) { (pairs, k, cut) =>
      val (a, b) = pairs.splitAt(if (pairs.isEmpty) 0 else cut % (pairs.length + 1))
      val b1 = new TopKBuffer(k); a.foreach { case (s, i) => b1.add(s, i) }
      val b2 = new TopKBuffer(k); b.foreach { case (s, i) => b2.add(s, i) }
      b1.mergeFrom(b2)
      b1.sorted.toSeq == truth(pairs, k)
    })
  }

  test("serialize/deserialize round-trip preserves contents") {
    check(Prop.forAll(listGen, Gen.choose(1, 8)) { (pairs, k) =>
      val agg = TopKByScore(null, null, null)
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.add(s, i) }
      val back = agg.deserialize(agg.serialize(buf))
      back.sorted.toSeq == buf.sorted.toSeq
    })
  }
}
