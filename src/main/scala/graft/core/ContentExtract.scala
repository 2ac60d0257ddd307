package graft.core

/** DOM-heuristic main-content extraction (readability-lite) over the parsed
  * offset-indexed document tree — the "HTML boilerplate strip / DOM
  * heuristics" capability of a main-content extraction pipeline, built on
  * the reference's Document model rather than regexes.
  *
  * Deterministic, integer-scored heuristic:
  *  1. Boilerplate subtrees (script/style/nav/header/footer/aside/form/
  *     noscript/iframe/svg + HTML comments) contribute no text.
  *  2. Every candidate container (div/article/main/section/body/td/html or
  *     the document root) is scored `2*contentChars - 3*linkChars`:
  *     link-dense blocks (menus, related-links boxes) lose to running text.
  *  3. The highest-scoring candidate wins (ties: the earliest, outermost
  *     one); its text is emitted with boilerplate subtrees elided.
  *
  * Pure core (no Spark imports) so the pipeline applies it per turn inside
  * `mapPartitions`, exactly like strip/render.
  */
object ContentExtract {
  private val boilerplate = Set(
    "script", "style", "nav", "header", "footer", "aside", "form",
    "noscript", "iframe", "svg")

  private val containers = Set(
    "html", "body", "main", "article", "section", "div", "td")

  private def isComment(t: TextNode): Boolean = {
    val d = t.doc
    t.length >= 7 && d.source(t.begin) == '<' && d.source(t.begin + 1) == '!' &&
      d.source(t.begin + 2) == '-' && d.source(t.begin + 3) == '-'
  }

  /** Append a subtree's non-boilerplate text to `build`. */
  private def emit(n: Node, build: java.lang.StringBuilder): Unit = n match {
    case t: TextNode => if (!isComment(t)) build.append(t.body)
    case t: TagNode =>
      val name = if (t.name == null) null else TagAttributes.lookupKey(t.name)
      if (name == null || !boilerplate.contains(name)) t.children.foreach(emit(_, build))
  }

  /** The main-content text of a parsed HTML document.
    *
    * Single post-order pass: each node returns its (contentChars,
    * linkChars) with boilerplate elided; candidate containers are scored on
    * the way up, ties broken toward the earliest pre-order candidate (the
    * outermost/leftmost, with the document root first of all) — so scoring
    * is O(nodes) regardless of container nesting depth.
    */
  def mainContent(doc: Doc): String = {
    var bestScore = Long.MinValue
    var bestIdx = Long.MaxValue // pre-order index of the best candidate
    var bestNode: Either[Doc, TagNode] = Left(doc)
    var preorder = 0L

    def consider(score: Long, idx: Long, tag: TagNode): Unit =
      if (score > bestScore || (score == bestScore && idx < bestIdx)) {
        bestScore = score; bestIdx = idx; bestNode = Right(tag)
      }

    // returns (contentChars, linkChars) of n's subtree
    def walk(n: Node, inLink: Boolean): (Long, Long) = n match {
      case t: TextNode =>
        if (isComment(t)) (0L, 0L)
        else { val len = t.length.toLong; (len, if (inLink) len else 0L) }
      case t: TagNode =>
        val idx = preorder
        preorder += 1
        val name = if (t.name == null) null else TagAttributes.lookupKey(t.name)
        if (name != null && boilerplate.contains(name)) (0L, 0L)
        else {
          val link = inLink || name == "a"
          var c = 0L; var l = 0L
          t.children.foreach { ch =>
            val (cc, ll) = walk(ch, link)
            c += cc; l += ll
          }
          // a candidate's own score treats it as a fresh root (no inherited
          // link context): all its text is content, link text only from
          // <a> descendants within it
          if (name != null && containers.contains(name)) {
            val ownL = if (inLink) c else l // under an <a>, everything is link text
            consider(2L * c - 3L * ownL, idx, t)
          }
          (c, l)
        }
      case _ => (0L, 0L)
    }

    var rootC = 0L; var rootL = 0L
    doc.children.foreach { ch =>
      val (c, l) = walk(ch, inLink = false)
      rootC += c; rootL += l
    }
    // the document root is the fallback candidate and wins all ties
    val rootScore = 2 * rootC - 3 * rootL
    if (rootScore >= bestScore) { bestScore = rootScore; bestNode = Left(doc) }

    val build = new java.lang.StringBuilder(64)
    bestNode match {
      case Left(d)    => d.children.foreach(emit(_, build))
      case Right(tag) => tag.children.foreach(emit(_, build))
    }
    build.toString
  }

  /** Parse + extract in one call (HTML dialect, built-in defaults). */
  def mainContent(html: String, cfg: Map[String, TagAttributes] = Map.empty): String =
    mainContent(HtmlParser.parse(html, cfg))
}
