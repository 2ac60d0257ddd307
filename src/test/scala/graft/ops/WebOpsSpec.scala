package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** URL/domain blocklist filtering: host extraction and suffix chains must
  * follow their documented normalization, both filter paths (broadcast-set
  * probe and explode+join fallback) must agree exactly, subdomains of a
  * blocked domain must be blocked while sibling domains survive, and the
  * broadcast path's hot stage must stay exchange-free.
  */
class WebOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-web-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def urls(): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "https://example.com/a"),
      (1L, "https://WWW.Bad.COM/x"),            // blocked: case + www
      (2L, "http://sub.bad.com:8080/y"),        // blocked: subdomain + port
      (3L, "https://notbad.com/z"),             // survives: sibling, not suffix
      (4L, "https://bad.com.evil.org/w"),       // survives: bad.com not a SUFFIX
      (5L, "ftp://deep.a.b.bad.com/q"),         // blocked: deep subdomain
      (6L, "relative/path/no/scheme"),          // null host -> passes through
      (7L, ""),                                 // null host -> passes through
      (8L, "https://localhost/l"),              // single label: no suffixes
      (9L, "https://tracker.net/p#frag"),       // blocked: second entry
      (10L, "https://anything@bad.com/e"),      // blocked: userinfo evasion
      (11L, "https://u:p@bad.com/e"),           // blocked: user:pass evasion
      (12L, "https://bad.com./e"),              // blocked: trailing-dot FQDN
      (13L, "http://x@sub.bad.com.:8080/e")     // blocked: all three combined
    ).toDF("doc_id", "url").repartition(3)
  }

  private def blocklist(): DataFrame = {
    val s = spark
    import s.implicits._
    // deliberately unnormalized entries: mixed case, www., whitespace
    Seq("  WWW.Bad.Com ", "tracker.NET", "").toDF("domain")
  }

  test("urlHost lowercases, strips www. and port; no scheme or empty -> null") {
    val got = urls().select(col("doc_id"), WebOps.urlHost(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(0L).contains("example.com"))
    assert(got(1L).contains("bad.com"))
    assert(got(2L).contains("sub.bad.com"))
    assert(got(5L).contains("deep.a.b.bad.com"))
    assert(got(6L).isEmpty && got(7L).isEmpty)
    assert(got(8L).contains("localhost"))
    // evasion vectors: userinfo (with and without password) and the
    // trailing FQDN dot must all resolve to the bare registered host
    assert(got(10L).contains("bad.com"))
    assert(got(11L).contains("bad.com"))
    assert(got(12L).contains("bad.com"))
    assert(got(13L).contains("sub.bad.com"))
  }

  test("hostSuffixes of a NULL host is NULL, not an empty array") {
    val s = spark
    import s.implicits._
    val got = Seq(Option.empty[String], Option("a.b"))
      .toDF("h").select(WebOps.hostSuffixes(col("h")).as("sufs"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty, "NULL host must yield NULL (scaladoc contract)")
    assert(got(1).nonEmpty)
  }

  test("hostSuffixes yields every >=2-label suffix; single label yields none") {
    val s = spark
    import s.implicits._
    val got = Seq("a.b.example.com", "example.com", "localhost")
      .toDF("h").select(col("h"), WebOps.hostSuffixes(col("h")).as("sufs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("a.b.example.com") ==
      Seq("a.b.example.com", "b.example.com", "example.com"))
    assert(got("example.com") == Seq("example.com"))
    assert(got("localhost") == Seq.empty)
  }

  test("blocked domains and their subdomains drop; siblings and null hosts pass") {
    val got = WebOps.filterBlockedDomains(urls(), "url", blocklist())
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 3L, 4L, 6L, 7L, 8L), got.toString)
  }

  test("a trailing-dot blocklist entry blocks the bare host too") {
    val s = spark
    import s.implicits._
    val bl = Seq("bad.com.").toDF("domain")
    val flat = Seq((0L, "https://bad.com/x"), (1L, "https://ok.com/y"))
      .toDF("doc_id", "url")
    for (cap <- Seq(Long.MaxValue, 0L)) {
      val got = WebOps.filterBlockedDomains(flat, "url", bl,
          maxBroadcastDomains = cap)
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L), s"cap=$cap got=$got")
    }
  }

  test("broadcast path equals the explode+join fallback exactly") {
    val a = WebOps.filterBlockedDomains(urls(), "url", blocklist())
      .collect().map(_.getLong(0)).toSet
    val b = WebOps.filterBlockedDomains(urls(), "url", blocklist(),
        maxBroadcastDomains = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, s"broadcast=$a fallback=$b")
  }

  test("plan: the broadcast path is exchange-free (text never shuffles)") {
    // un-repartitioned input: any Exchange in this plan would be the
    // operator's own doing
    val s = spark
    import s.implicits._
    val flat = Seq((0L, "https://example.com/a"), (1L, "https://bad.com/x"))
      .toDF("doc_id", "url")
    val plan = WebOps.filterBlockedDomains(flat, "url", blocklist())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected zero exchanges:\n$plan")
  }

  test("composes with canonicalizeUrl: canonical key of a survivor is stable") {
    val survivors = WebOps.filterBlockedDomains(urls(), "url", blocklist())
      .select(col("doc_id"), TextOps.canonicalizeUrl(col("url")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(survivors(0L) == "https://example.com/a")
  }
}
