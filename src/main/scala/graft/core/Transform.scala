package graft.core

/** Thrown when a transformation fails: bad/missing renderer in strict mode
  * or an unknown node class (reference: service/TransformException.java).
  */
final class TransformException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

object Transform {
  /** Visitor tap invoked per transformed node: (node, result, newBody)
    * (reference: service/Transformer.java:56-65).
    */
  type NodeConsumer = (Node, String, String) => Unit

  /** Transforms a TextNode body during transformation
    * (reference: service/Transformer.java:72-81).
    */
  type TransformFunction = (TextNode, String) => String

  /** HTML escape + newline→`<br>` transform function with exact offset
    * bookkeeping (reference: Transformer.java:89-167):
    * `& → &amp; (+4)`, `< → &lt; (+3)`, `> → &gt; (+3)`, `" → &quot; (+5)`,
    * `\n`/`\r` → `<br>` (+3), an LF/CR or CR/LF pair consumed together (+2);
    * newline transform skipped when the parent tag's
    * `TagAttributes.transformNewLines` is false.
    */
  def htmlEscape(offsets: Offsets, attributes: Map[String, TagAttributes]): TransformFunction =
    (node: TextNode, original: String) => {
      val build = new java.lang.StringBuilder(original.length + 16)
      escapeAppend(build, node, original, offsets, attributes)
      build.toString
    }

  /** Escape `original` directly into `build` — the allocation-free form of
    * [[htmlEscape]] used by the hot pipeline path (identical output; no
    * intermediate char[]/String per text node).
    */
  def escapeAppend(build: java.lang.StringBuilder, node: TextNode, original: String,
                   offsets: Offsets, attributes: Map[String, TagAttributes]): Unit = {
    val len = original.length
    // Newline suppression depends only on the node's parent — resolve it
    // once per node, lazily on the first newline (0 = unknown, 1 = keep
    // newline, 2 = transform).
    var suppressState = 0
    def suppressNewlines: Boolean = {
      if (suppressState == 0) {
        val parentName =
          if (node.parent != null && node.parent.name != null)
            TagAttributes.lookupKey(node.parent.name)
          else null
        val s = parentName != null && attributes != null &&
          attributes.get(parentName).exists(!_.transformNewLines)
        suppressState = if (s) 1 else 2
      }
      suppressState == 1
    }
    var i = 0
    while (i < len) {
      // clean-run fast path: bulk-append the maximal escapable-free slice
      // (most text contains no escapables; per-char append dominated the
      // escape cost in pipeline profiles)
      var j = i
      var c0 = 0: Char
      while (j < len && {
        c0 = original.charAt(j)
        c0 != '&' && c0 != '<' && c0 != '>' && c0 != '"' && c0 != '\n' && c0 != '\r'
      }) j += 1
      if (j > i) {
        build.append(original, i, j)
        i = j
      }
      if (i >= len) return
      (original.charAt(i): @annotation.switch) match {
        case '&' =>
          build.append("&amp;")
          if (offsets != null) offsets.add(node.begin + i, 4)
        case '<' =>
          build.append("&lt;")
          if (offsets != null) offsets.add(node.begin + i, 3)
        case '>' =>
          build.append("&gt;")
          if (offsets != null) offsets.add(node.begin + i, 3)
        case '"' =>
          build.append("&quot;")
          if (offsets != null) offsets.add(node.begin + i, 5)
        case c @ ('\n' | '\r') =>
          if (suppressNewlines) {
            build.append(c)
          } else {
            if (i + 1 < len &&
                ((c == '\n' && original.charAt(i + 1) == '\r') ||
                 (c == '\r' && original.charAt(i + 1) == '\n'))) {
              if (offsets != null) offsets.add(node.begin + i, 2)
              i += 1
            } else if (offsets != null) {
              offsets.add(node.begin + i, 3)
            }
            build.append("<br>")
          }
        case c =>
          build.append(c)
      }
      i += 1
    }
  }

  /** Escape without offsets/attributes (plain variant). */
  val htmlEscapePlain: TransformFunction = htmlEscape(null, null)

  /** Tag strip / main-content extraction: DFS appending TextNode bodies
    * (optionally via the transform function); a TagNode failing the
    * predicate emits its raw source slice instead of recursing
    * (reference: service/TextTransformer.java:36-79).
    */
  def textTransform(doc: Doc,
                    predicate: TagNode => Boolean = _ => true,
                    fn: TransformFunction = null,
                    consumer: NodeConsumer = null): String = {
    val build = new java.lang.StringBuilder(doc.source.length)

    // index-based child loop: ArrayBuffer's inherited foreach goes through
    // the generic iterator path (profiled ~10% of the whole pipeline)
    def recurseAll(cs: scala.collection.mutable.ArrayBuffer[Node]): Unit = {
      var i = 0
      while (i < cs.length) { recurse(cs(i)); i += 1 }
    }
    def recurse(node: Node): Unit = node match {
      case textNode: TextNode =>
        var text = textNode.body
        if (fn != null) text = fn(textNode, text)
        if (consumer != null) consumer(textNode, text, text)
        build.append(text)
      case tagNode: TagNode =>
        if (predicate(tagNode)) recurseAll(tagNode.children)
        else build.append(tagNode.rawString)
    }

    recurseAll(doc.children)
    build.toString
  }
}
