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

  // ======== robots.txt (RFC 9309 subset) ========

  /** One parsed robots rule: `allow` + the path pattern (`*` wildcards,
    * optional `$` end anchor, otherwise prefix semantics).
    */
  final case class RobotsRule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body and return the rules governing `agent`
    * (RFC 9309 group semantics, the subset real crawl pipelines apply):
    * `#` comments stripped; keys case-insensitive; consecutive
    * `User-agent:` lines open ONE group; a `User-agent:` after rule lines
    * starts a new group; the governing token is the LONGEST group token
    * that prefixes the (lowercased) agent, falling back to `*`; rules
    * from EVERY group carrying the winning token merge (the RFC's
    * combine-same-token rule); empty-value rules (`Disallow:`) restrict
    * nothing and are dropped. Unknown keys (Crawl-delay, Sitemap) are
    * ignored. A null/empty body, or no matching group, yields no rules —
    * everything allowed.
    */
  def parseRobots(txt: String, agent: String): Array[RobotsRule] = {
    if (txt == null || txt.isEmpty) return Array.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (agent tokens, rules) per group
    val groups = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], scala.collection.mutable.ArrayBuffer[RobotsRule])]
    var inHeader = false
    txt.split("\n", -1).foreach { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val line = noComment.replace("\r", "").trim
      val colonAt = line.indexOf(':')
      if (colonAt > 0) {
        val key = line.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colonAt + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[RobotsRule]))
              inHeader = true
            }
            // a malformed empty value would prefix-match EVERY agent and
            // preempt the '*' group — drop it like empty rule values
            if (value.nonEmpty)
              groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inHeader = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += RobotsRule(key == "allow", value)
          case _ => inHeader = false // Crawl-delay, Sitemap, unknown keys
        }
      }
    }
    val tokens = groups.flatMap(_._1).distinct
    val winner = tokens
      .filter(t => t != "*" && agentLc.startsWith(t))
      .sortBy(-_.length)
      .headOption
      .orElse(if (tokens.contains("*")) Some("*") else None)
    winner match {
      case None => Array.empty
      case Some(t) => groups.filter(_._1.contains(t)).flatMap(_._2).toArray
    }
  }

  /** Does a robots `pattern` match `path`? Prefix semantics with `*`
    * wildcards and an optional trailing `$` end anchor (RFC 9309
    * matching). Iterative star-backtracking, no regex compilation in the
    * per-URL hot path.
    */
  private[ops] def robotsMatches(pattern: String, path: String): Boolean =
    robotsMatchesFrom(pattern, 0, path)

  /** [[robotsMatches]] over `pattern.substring(from)` without the
    * substring allocation — the per-(rule, URL) hot-path form used by the
    * encoded-rule decision below.
    */
  private[ops] def robotsMatchesFrom(pattern: String, from: Int, path: String): Boolean = {
    val anchored = pattern.length > from && pattern.charAt(pattern.length - 1) == '$'
    val pEnd = if (anchored) pattern.length - 1 else pattern.length
    var pi = from; var si = 0
    var starPi = -1; var starSi = -1
    while (true) {
      if (pi == pEnd) {
        if (!anchored || si == path.length) return true
        // anchored with path left over: only a '*' can absorb it
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        si = starSi; pi = starPi + 1
      } else if (pattern.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (si < path.length && pattern.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1
        if (starSi > path.length) return false
        si = starSi; pi = starPi + 1
      } else return false
    }
    false // unreachable
  }

  /** RFC 9309 decision: the matching rule with the LONGEST pattern wins;
    * an allow/disallow tie at the same length resolves to allow; no
    * matching rule → allowed.
    */
  private[ops] def robotsAllowed(rules: Array[RobotsRule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.pattern.length >= bestLen && robotsMatches(r.pattern, path)) {
        if (r.pattern.length > bestLen) { bestLen = r.pattern.length; bestAllow = r.allow }
        else if (r.allow) bestAllow = true // tie: allow wins
      }
      i += 1
    }
    bestAllow
  }

  /** [[robotsAllowed]] over COMPILE-TIME-SORTED encoded rules — each rule
    * is `('A'|'D') + pattern`, ordered by pattern length descending — the
    * per-URL serving form: the scan stops at the first length boundary
    * below a match (shorter rules can never override it), and within the
    * matched length allow wins. Decision-identical to [[robotsAllowed]]
    * for any rule set and path (spec-pinned against it on random rule
    * sets), without the per-row Row-to-RobotsRule re-boxing the previous
    * UDF paid over the whole URL corpus.
    */
  private[ops] def robotsAllowedEncoded(rules: Seq[String], path: String): Boolean = {
    var found = false
    var foundAllow = false
    var foundLen = -1
    val it = rules.iterator
    while (it.hasNext) {
      val e = it.next()
      val plen = e.length - 1
      if (found && plen < foundLen) return foundAllow
      // once allow is locked at this length, further same-length rules
      // cannot change the decision — skip their matcher runs
      if (!(found && foundAllow) && robotsMatchesFrom(e, 1, path)) {
        val allow = e.charAt(0) == 'A'
        if (!found) { found = true; foundLen = plen; foundAllow = allow }
        else if (allow) foundAllow = true
      }
    }
    if (found) foundAllow else true
  }

  /** Path (plus query, minus fragment) of a URL for robots matching; a
    * URL with no path component is `/`.
    */
  def urlPath(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    // capture from the first '/' OR '?' after the authority: a URL with a
    // query but no path ("https://a.com?sort=x") match-targets "/?sort=x"
    // per RFC 9309 (path with query appended), not a bare "/"
    val rest = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?][^#]*)", 1)
    when(length(rest) === 0, lit("/"))
      .when(rest.startsWith("?"), concat(lit("/"), rest))
      .otherwise(rest)
  }

  /** Apply per-host robots.txt to a URL corpus: adds an `allowed` boolean
    * to `df`. `robots(hostCol, txtCol)` carries one robots body per host
    * (the crawl-metadata table — per-HOST, orders of magnitude smaller
    * than the URL corpus by nature). Hosts with no robots row are
    * allowed, as are hostless rows (no scheme — robots has no opinion).
    *
    * Scale shape: robots bodies PARSE ONCE per host on the small side
    * (one map pass compiling each body to its rule array for `agent`);
    * the compiled side is counted and broadcast under `maxBroadcastHosts`
    * (the guarded idiom) so the URL corpus streams map-side through one
    * hash-join probe + an O(rules) matcher — zero corpus exchanges; above
    * the guard the join runs un-hinted on the host key and completes.
    * Raw robots text never joins the corpus — only (host, rules).
    */
  def applyRobots(df: DataFrame, urlCol: String, robots: DataFrame,
                  agent: String, hostCol: String = "host",
                  txtCol: String = "robots_txt",
                  maxBroadcastHosts: Long = 10000000L): DataFrame = {
    val ag = agent
    // encoded + sorted ONCE per host at compile time (see
    // robotsAllowedEncoded): length-descending order enables the serving
    // scan's early exit, and the single string array avoids per-URL
    // struct-Row decoding (stable sort keeps parse order within a length
    // — deterministic)
    val compileUdf = udf { (txt: String) =>
      parseRobots(txt, ag)
        .sortBy(-_.pattern.length)
        .map(r => (if (r.allow) "A" else "D") + r.pattern)
    }
    // host key normalized EXACTLY like urlHost normalizes the URL side
    // (lowercase, trailing FQDN dot, leading www.) — a robots row keyed by
    // the fetched "www.a.com" form must meet "https://www.a.com/..."
    val normHost = regexp_replace(
      regexp_replace(lower(trim(col(hostCol))), "\\.$", ""), "^www\\.", "")
    val compiled = robots
      .select(normHost.as("__rb_host"), col(txtCol).as("__rb_txt"))
      .where(length(col("__rb_host")) > 0)
      // one body per host, deterministically (re-crawled metadata can
      // carry duplicates; an un-deduped left join would multiply corpus
      // rows): the lexicographically-least body wins
      .groupBy("__rb_host").agg(min(col("__rb_txt")).as("__rb_txt"))
      .select(col("__rb_host"), compileUdf(col("__rb_txt")).as("__rb_rules"))
      // parse once: the guard count and the join read the same cached
      // blocks (ContextCleaner releases the cache when the frame is GC'd)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHosts = compiled.count()
    val side = if (nHosts <= maxBroadcastHosts) broadcast(compiled) else compiled
    val decideUdf = udf { (rules: Seq[String], path: String) =>
      if (rules == null) true
      else robotsAllowedEncoded(rules, path)
    }
    df.join(side, urlHost(col(urlCol)) === col("__rb_host"), "left")
      .withColumn("allowed", decideUdf(col("__rb_rules"), urlPath(col(urlCol))))
      .drop("__rb_host", "__rb_rules")
  }
}
