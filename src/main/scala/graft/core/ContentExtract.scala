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

  /** (contentChars, linkChars) of a subtree, boilerplate elided. */
  private def measure(n: Node, inLink: Boolean): (Int, Int) = n match {
    case t: TextNode =>
      if (isComment(t)) (0, 0)
      else {
        val len = t.length
        (len, if (inLink) len else 0)
      }
    case t: TagNode =>
      val name = if (t.name == null) null else TagAttributes.lookupKey(t.name)
      if (name != null && boilerplate.contains(name)) (0, 0)
      else {
        val link = inLink || name == "a"
        var c = 0; var l = 0
        t.children.foreach { ch =>
          val (cc, ll) = measure(ch, link)
          c += cc; l += ll
        }
        (c, l)
      }
  }

  /** Append a subtree's non-boilerplate text to `build`. */
  private def emit(n: Node, build: java.lang.StringBuilder): Unit = n match {
    case t: TextNode => if (!isComment(t)) build.append(t.body)
    case t: TagNode =>
      val name = if (t.name == null) null else TagAttributes.lookupKey(t.name)
      if (name == null || !boilerplate.contains(name)) t.children.foreach(emit(_, build))
  }

  /** The main-content text of a parsed HTML document. */
  def mainContent(doc: Doc): String = {
    var bestScore = Long.MinValue
    var bestNode: Either[Doc, TagNode] = Left(doc)

    def consider(score: Long, tag: TagNode): Unit =
      if (score > bestScore) { bestScore = score; bestNode = Right(tag) }

    // document root is the fallback candidate
    var rootC = 0L; var rootL = 0L
    doc.children.foreach { ch =>
      val (c, l) = measure(ch, inLink = false)
      rootC += c; rootL += l
    }
    bestScore = 2 * rootC - 3 * rootL

    def walk(n: Node): Unit = n match {
      case t: TagNode =>
        val name = if (t.name == null) null else TagAttributes.lookupKey(t.name)
        if (name != null && boilerplate.contains(name)) () // prune
        else {
          if (name != null && containers.contains(name)) {
            val (c, l) = measure(t, inLink = false)
            consider(2L * c - 3L * l, t)
          }
          t.children.foreach(walk)
        }
      case _ =>
    }
    doc.children.foreach(walk)

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
