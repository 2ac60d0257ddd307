package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl curation operators: the URL-level stages a pretraining
  * pipeline runs BEFORE content-level filtering — host extraction and
  * domain-blocklist filtering (the C4/RefinedWeb "bad domains" pass).
  * Composes with [[TextOps.canonicalizeUrl]]: canonicalize for dedup keys,
  * then drop documents whose host falls under a blocked domain.
  */
object WebOps {

  /** Lowercased host of a URL: the `://`-delimited authority with any
    * userinfo (`user:pass@` — an evasion vector: `https://x@bad.com/`
    * must still resolve to `bad.com`), the port, any leading `www.`, and
    * any trailing FQDN dot (`bad.com.` ≡ `bad.com` in DNS — the other
    * evasion vector) stripped. No-scheme or empty input → NULL (a
    * hostless record can't be domain-filtered; callers decide its fate).
    * Native regex end to end (Java-regex ∩ RE2 dialect, same discipline
    * as [[TextOps.canonicalizeUrl]]) so the operator oracles exactly.
    */
  def urlHost(c: Column): Column = {
    val h = lower(regexp_extract(c,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    val noWww = regexp_replace(regexp_replace(h, "\\.$", ""), "^www\\.", "")
    when(length(noWww) > 0, noWww)
  }

  /** All dot-suffixes of a host with ≥ 2 labels, most-specific first:
    * `a.b.example.com` → `[a.b.example.com, b.example.com, example.com]`.
    * A blocklist entry blocks a host iff the entry is IN this chain —
    * exact match or any-subdomain match in one equi-joinable form. The
    * bare TLD (`com`) is excluded: a blocklist that bans a whole TLD is a
    * config error, not a filter. NULL host → NULL.
    */
  def hostSuffixes(host: Column): Column =
    when(host.isNotNull,
      TextOps.bindOnce(split(host, "\\.")) { parts =>
        // the >= 2 guard matters: Spark's sequence(1, 0) DESCENDS ([1, 0])
        // rather than returning empty, and slice rejects a 0 start — a
        // single-label host (localhost) must yield [] explicitly
        when(size(parts) >= 2,
          transform(sequence(lit(1), size(parts) - 1),
            i => array_join(slice(parts, i, size(parts)), ".")))
          .otherwise(array().cast("array<string>"))
      })

  /** Drop every document whose URL's host equals a blocklisted domain or
    * sits under one as a subdomain; returns the surviving rows of `df`
    * unchanged. Domains in `blocklist(domainCol)` are normalized the same
    * way hosts are (lowercase, leading `www.` stripped); NULL-host rows
    * (no scheme, empty URL) pass through — URL filtering has no opinion
    * on records that never had a URL.
    *
    * Scale shape, in preference order:
    *  1. `maxBroadcastDomains` ≥ blocklist size (counted BEFORE any
    *     collect — the guarded-broadcast idiom of
    *     [[DedupOps.decontaminate]]): the domain set ships to executors as
    *     a broadcast hash set and the filter is one map-side membership
    *     probe over the suffix chain — ZERO exchanges, document text never
    *     leaves the scan, and the probe is O(labels) per row regardless of
    *     blocklist size. Real domain blocklists are 10^4–10^7 entries
    *     (~MBs); this is the 100 TB default.
    *  2. Oversized blocklist: explode the (id, suffix) chain — bounded
    *     ×labels on ~20-byte strings, never the text — left-semi join
    *     against the blocklist on the suffix (AQE picks broadcast or
    *     shuffle by actual size), and anti-join the blocked-id set back to
    *     the corpus. Completes at any blocklist size instead of OOMing the
    *     driver; costs two joins, so the broadcast path stays the default.
    * Both paths are equality-tested against each other.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocklist: DataFrame, domainCol: String = "domain",
                           maxBroadcastDomains: Long = 10000000L): DataFrame = {
    // same normalization as urlHost: trailing FQDN dot, then leading www.
    val normDomain = regexp_replace(
      regexp_replace(lower(trim(col(domainCol))), "\\.$", ""), "^www\\.", "")
    val domains = blocklist.select(normDomain.as("_graft_domain"))
      .where(length(col("_graft_domain")) > 0)
    val host = urlHost(col(urlCol))
    val nDomains = domains.count()
    if (nDomains <= maxBroadcastDomains) {
      val set = domains.distinct().collect().map(_.getString(0)).toSet
      val bc = df.sparkSession.sparkContext.broadcast(set)
      // a UDF, deliberately: the native form of "any suffix ∈ blocklist"
      // is a non-equi join (BroadcastNestedLoopJoin, O(rows × domains)) —
      // the broadcast-set probe is O(labels) per row and keeps the stage
      // exchange-free (plan-asserted in WebOpsSpec)
      val blocked = udf { h: String =>
        if (h == null) false
        else {
          val parts = h.split('.')
          var i = 0; var hit = false
          while (i < parts.length - 1 && !hit) {
            if (bc.value.contains(parts.drop(i).mkString("."))) hit = true
            i += 1
          }
          hit
        }
      }
      df.where(!blocked(host))
    } else {
      val sufs = df.select(col(urlCol), host.as("_graft_host"))
        .where(col("_graft_host").isNotNull)
        .select(col(urlCol), explode(hostSuffixes(col("_graft_host"))).as("_graft_suf"))
      val blockedUrls = sufs
        .join(domains, sufs("_graft_suf") === domains("_graft_domain"), "left_semi")
        .select(col(urlCol)).distinct()
      df.join(blockedUrls, df(urlCol) === blockedUrls(urlCol), "left_anti")
    }
  }
}
