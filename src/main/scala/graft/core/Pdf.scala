package graft.core

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/** From-scratch minimal PDF toolkit for the "PDF/layout parse" leg of the
  * main-content extraction pipeline (north rule): a deterministic writer
  * that renders text into real PDF files (page tree, Type1 font resource,
  * content streams, xref + trailer, optional FlateDecode compression), and
  * a lenient parser that recovers the text in reading order — including
  * two-column layouts emitted out of reading order in the content stream.
  *
  * Scope (documented, honest): PDF 1.4 object syntax with direct or
  * sequential-scan object resolution (no cross-reference streams / object
  * streams), `/FlateDecode` and unfiltered content streams, simple-font
  * text (one byte per glyph, Latin-1/WinAnsi approximation — no CID fonts
  * or `/ToUnicode` CMaps). This covers the synthesized corpus exactly and
  * the common simple-text-PDF case; payloads outside scope degrade to
  * best-effort extraction, never an exception.
  *
  * Everything here is JDK-only: `java.util.zip.{Deflater, Inflater}` for
  * the Flate filter. No external PDF library exists in this sandbox.
  */
object Pdf {

  // ======================= object model =======================

  sealed trait PVal
  final case class PNum(v: Double) extends PVal
  final case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  final case class PName(v: String) extends PVal
  final case class PStr(bytes: Array[Byte]) extends PVal
  final case class PArr(items: Vector[PVal]) extends PVal
  final case class PDict(m: Map[String, PVal]) extends PVal
  final case class PRef(num: Int, gen: Int) extends PVal
  /** An indirect object carrying a stream: its dict plus the RAW (still
    * filtered) stream bytes.
    */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  /** One positioned text run recovered from a content stream: the x/y are
    * the text-matrix translation at the start of the run (text-space
    * units; identity-scale assumption for layout purposes).
    */
  final case class TextRun(page: Int, x: Double, y: Double, text: String)

  // ======================= writer =======================

  /** Layout/encoding options for [[write]]. Variants exist so one corpus
    * can exercise every parser path:
    *  - `compress`     — content streams go through `/FlateDecode`;
    *  - `twoColumn`    — each page's lines split into a left and a right
    *    column, and the RIGHT column is emitted FIRST in the content
    *    stream (reading order must be recovered by layout analysis, not
    *    stream order);
    *  - `hexStrings`   — show-text strings written as hex `<...>`;
    *  - `kernedSpaces` — lines written as `TJ` arrays of word fragments
    *    with kerning adjustments instead of literal space characters
    *    (−280/1000 em between words = a space; −10 inside a word = none).
    */
  final case class Layout(
      charsPerLine: Int = 60,
      linesPerPage: Int = 36,
      compress: Boolean = false,
      twoColumn: Boolean = false,
      hexStrings: Boolean = false,
      kernedSpaces: Boolean = false
  )

  /** Greedy word wrap that is exactly invertible: breaks ONLY at single
    * space characters (each break consumes exactly the one space it
    * replaces), never inside a word — a word longer than `width` gets its
    * own overlong line. `lines.mkString(" ") == text` always holds, which
    * is what makes the end-to-end DuckDB oracle exact.
    */
  def wrap(text: String, width: Int): Vector[String] = {
    val words = text.split(" ", -1)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var first = true
    for (w <- words) {
      if (first) { cur.append(w); first = false }
      else if (cur.length + 1 + w.length <= width) { cur.append(' ').append(w) }
      else { lines += cur.toString; cur.clear(); cur.append(w) }
    }
    lines += cur.toString
    lines.result()
  }

  private def escapeLiteral(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => b.append("\\\\")
        case '('  => b.append("\\(")
        case ')'  => b.append("\\)")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case _    => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  private def hexString(s: String): String =
    s.getBytes(StandardCharsets.ISO_8859_1).map(b => f"${b & 0xff}%02X").mkString("<", "", ">")

  private def showString(s: String, l: Layout): String =
    if (l.hexStrings) hexString(s) else "(" + escapeLiteral(s) + ")"

  /** One line's show-text operation. Kerned variant: words become TJ
    * fragments joined by a −280 adjustment (≥ the parser's 150 threshold
    * → space) and each word ≥ 4 chars is split once with a −10 adjustment
    * (below threshold → no space), so both sides of the kerning contract
    * are exercised on every line.
    */
  private def showLineOps(line: String, l: Layout): String =
    if (!l.kernedSpaces) showString(line, l) + " Tj"
    else {
      val frags = ArrayBuffer.empty[String]
      val words = line.split(" ", -1)
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        if (w.length >= 4) {
          val cut = w.length / 2
          frags += showString(w.substring(0, cut), l)
          frags += "-10"
          frags += showString(w.substring(cut), l)
        } else frags += showString(w, l)
        if (wi < words.length - 1) frags += "-280"
        wi += 1
      }
      frags.mkString("[", " ", "]") + " TJ"
    }

  private val Leading = 14
  private val TopY    = 720
  private val LeftX   = 60
  private val RightX  = 330

  /** Content-stream body for one page of lines. Single-column pages use
    * relative positioning (`Td` + `T*` / `'`); two-column pages position
    * every line with an absolute `Tm` and emit the right column first so
    * stream order differs from reading order.
    */
  private def pageContent(lines: Vector[String], l: Layout): String = {
    val sb = new StringBuilder
    sb.append("BT /F1 11 Tf ").append(Leading).append(" TL\n")
    if (!l.twoColumn) {
      sb.append(LeftX).append(' ').append(TopY).append(" Td\n")
      var i = 0
      while (i < lines.length) {
        // alternate Tj/T* with the ' (next-line-show) operator for coverage
        if (i == 0) sb.append(showLineOps(lines(i), l)).append('\n')
        else if (i % 2 == 1 && !l.kernedSpaces)
          sb.append(showString(lines(i), l)).append(" '\n")
        else sb.append("T* ").append(showLineOps(lines(i), l)).append('\n')
        i += 1
      }
    } else {
      val nLeft = (lines.length + 1) / 2
      val (left, right) = lines.splitAt(nLeft)
      def emit(col: Vector[String], x: Int): Unit = {
        var i = 0
        while (i < col.length) {
          val y = TopY - i * Leading
          sb.append("1 0 0 1 ").append(x).append(' ').append(y).append(" Tm ")
            .append(showLineOps(col(i), l)).append('\n')
          i += 1
        }
      }
      emit(right, RightX) // deliberately out of reading order
      emit(left, LeftX)
    }
    sb.append("ET\n")
    sb.toString
  }

  def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Render `text` to a complete PDF file: header, catalog, page tree,
    * font, per-page content streams, xref table, trailer.
    */
  def write(text: String, l: Layout = Layout()): Array[Byte] = {
    val lines = wrap(text, l.charsPerLine)
    val pages = lines.grouped(l.linesPerPage).toVector match {
      case Vector() => Vector(Vector(""))
      case ps       => ps
    }
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    val pageObjNums    = (0 until nPages).map(i => 4 + 2 * i)
    val contentObjNums = (0 until nPages).map(i => 5 + 2 * i)

    val out     = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n$body\nendobj\n"))
    }
    def streamObj(num: Int, extra: String, raw: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n<< /Length ${raw.length}$extra >>\nstream\n"))
      out.write(raw)
      out.write(bytes("\nendstream\nendobj\n"))
    }

    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>")
    obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    var i = 0
    while (i < nPages) {
      obj(pageObjNums(i),
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contentObjNums(i)} 0 R >>")
      val raw = bytes(pageContent(pages(i), l))
      if (l.compress) streamObj(contentObjNums(i), " /Filter /FlateDecode", deflate(raw))
      else streamObj(contentObjNums(i), "", raw)
      i += 1
    }

    val nObjs    = 3 + 2 * nPages
    val xrefPos  = out.size()
    val sb       = new StringBuilder
    sb.append("xref\n0 ").append(nObjs + 1).append('\n')
    sb.append("0000000000 65535 f \n")
    var k = 1
    while (k <= nObjs) { sb.append(f"${offsets(k)}%010d 00000 n \n"); k += 1 }
    sb.append("trailer\n<< /Size ").append(nObjs + 1).append(" /Root 1 0 R >>\n")
    sb.append("startxref\n").append(xrefPos).append("\n%%EOF\n")
    out.write(bytes(sb.toString))
    out.toByteArray
  }

  // ======================= parser: object layer =======================

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
  private def isDelim(b: Int): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Shared lexer over a byte slice for both the object layer and content
    * streams (same token grammar).
    */
  private final class Lexer(val data: Array[Byte], var pos: Int, val end: Int) {
    def this(data: Array[Byte]) = this(data, 0, data.length)

    def atEnd: Boolean = pos >= end
    def peek: Int = if (pos < end) data(pos) & 0xff else -1

    def skipWs(): Unit = {
      var go = true
      while (go && pos < end) {
        val b = data(pos) & 0xff
        if (isWs(b)) pos += 1
        else if (b == '%') { // comment to EOL
          while (pos < end && data(pos) != '\n' && data(pos) != '\r') pos += 1
        } else go = false
      }
    }

    /** Next bare token (operator / keyword / number text); empty at end. */
    def bareToken(): String = {
      skipWs()
      val start = pos
      while (pos < end && !isWs(data(pos) & 0xff) && !isDelim(data(pos) & 0xff)) pos += 1
      new String(data, start, pos - start, StandardCharsets.ISO_8859_1)
    }

    def name(): String = { // pos at '/'
      pos += 1
      val start = pos
      while (pos < end && !isWs(data(pos) & 0xff) && !isDelim(data(pos) & 0xff)) pos += 1
      val raw = new String(data, start, pos - start, StandardCharsets.ISO_8859_1)
      // #xx hex escapes in names
      if (!raw.contains('#')) raw
      else {
        val b = new StringBuilder
        var i = 0
        while (i < raw.length) {
          if (raw.charAt(i) == '#' && i + 2 < raw.length) {
            try { b.append(Integer.parseInt(raw.substring(i + 1, i + 3), 16).toChar); i += 3 }
            catch { case _: NumberFormatException => b.append('#'); i += 1 }
          } else { b.append(raw.charAt(i)); i += 1 }
        }
        b.toString
      }
    }

    /** Literal string at '(' — nested unescaped parens are legal and must
      * balance; octal and character escapes per the spec; backslash-EOL is
      * a line continuation; a lone backslash before any other char is
      * dropped (keeps the char).
      */
    def literalString(): Array[Byte] = {
      pos += 1 // '('
      val out = new ByteArrayOutputStream(32)
      var depth = 1
      while (pos < end && depth > 0) {
        val b = data(pos) & 0xff
        if (b == '\\') {
          pos += 1
          if (pos < end) {
            val e = data(pos) & 0xff
            e match {
              case 'n' => out.write('\n'); pos += 1
              case 'r' => out.write('\r'); pos += 1
              case 't' => out.write('\t'); pos += 1
              case 'b' => out.write('\b'); pos += 1
              case 'f' => out.write('\f'); pos += 1
              case '(' => out.write('('); pos += 1
              case ')' => out.write(')'); pos += 1
              case '\\' => out.write('\\'); pos += 1
              case '\r' => pos += 1; if (pos < end && data(pos) == '\n') pos += 1 // continuation
              case '\n' => pos += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0
                while (n < 3 && pos < end && data(pos) >= '0' && data(pos) <= '7') {
                  v = v * 8 + (data(pos) - '0'); pos += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other); pos += 1
            }
          }
        } else if (b == '(') { depth += 1; out.write('('); pos += 1 }
        else if (b == ')') { depth -= 1; if (depth > 0) out.write(')'); pos += 1 }
        else if (b == '\r') {
          // unescaped EOL in a literal string reads as 0x0A (CRLF = one)
          out.write('\n'); pos += 1
          if (pos < end && data(pos) == '\n') pos += 1
        } else { out.write(b); pos += 1 }
      }
      out.toByteArray
    }

    /** Hex string at '<' (caller has ruled out '<<'); whitespace ignored,
      * odd final digit padded with 0.
      */
    def hexStringBytes(): Array[Byte] = {
      pos += 1 // '<'
      val out = new ByteArrayOutputStream(32)
      var hi = -1
      var done = false
      while (pos < end && !done) {
        val b = data(pos) & 0xff
        if (b == '>') { done = true; pos += 1 }
        else {
          val d = Character.digit(b, 16)
          if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
          pos += 1
        }
      }
      if (hi >= 0) out.write(hi * 16)
      out.toByteArray
    }

    /** One object-grammar value. Returns None at end / unparseable. */
    def value(): Option[PVal] = {
      skipWs()
      if (atEnd) return None
      val b = peek
      if (b == '/') Some(PName(name()))
      else if (b == '(') Some(PStr(literalString()))
      else if (b == '[') {
        pos += 1
        val items = Vector.newBuilder[PVal]
        skipWs()
        while (!atEnd && peek != ']') { value().foreach(items += _); skipWs() }
        if (!atEnd) pos += 1
        Some(PArr(items.result()))
      } else if (b == '<') {
        if (pos + 1 < end && data(pos + 1) == '<') {
          pos += 2
          val m = Map.newBuilder[String, PVal]
          skipWs()
          var closed = false
          while (!atEnd && !closed) {
            if (peek == '>' && pos + 1 < end && data(pos + 1) == '>') { pos += 2; closed = true }
            else if (peek == '/') {
              val k = name()
              value().foreach(v => m += k -> v)
            } else pos += 1 // lenient: skip junk
            skipWs()
          }
          Some(PDict(m.result()))
        } else Some(PStr(hexStringBytes()))
      } else if (b == ']' || b == '>' || b == ')' || b == '}' || b == '{') { pos += 1; None }
      else {
        val save = pos
        val tok = bareToken()
        if (tok.isEmpty) { pos = math.max(pos, save + 1); None }
        else if (tok == "true") Some(PBool(true))
        else if (tok == "false") Some(PBool(false))
        else if (tok == "null") Some(PNull)
        else {
          // number — or an "N G R" indirect reference
          toNum(tok) match {
            case Some(n) if n == math.floor(n) && n >= 0 =>
              val save2 = pos
              skipWs()
              val t2 = bareToken()
              toNum(t2) match {
                case Some(g) if g == math.floor(g) && g >= 0 =>
                  skipWs()
                  val t3 = bareToken()
                  if (t3 == "R") Some(PRef(n.toInt, g.toInt))
                  else { pos = save2; Some(PNum(n)) }
                case _ =>
                  pos = save2 // not a ref; rewind to just after the number
                  Some(PNum(n))
              }
            case Some(n) => Some(PNum(n))
            case None    => None // operator keyword — object layer ignores
          }
        }
      }
    }
  }

  private def toNum(s: String): Option[Double] =
    if (s.isEmpty) None
    else try Some(java.lang.Double.parseDouble(s)) catch { case _: NumberFormatException => None }

  /** Sequentially scan the whole file for `N G obj ... endobj` objects
    * (lenient recovery — no dependence on the xref table, which is how
    * most tolerant extractors work). Streams capture their raw bytes using
    * a direct `/Length` when present and an `endstream` search otherwise.
    */
  def scanObjects(pdf: Array[Byte]): Map[Int, PVal] = {
    val out = scala.collection.mutable.Map.empty[Int, PVal]
    val lx  = new Lexer(pdf)
    while (!lx.atEnd) {
      lx.skipWs()
      val save = lx.pos
      val t1   = lx.bareToken()
      if (t1.isEmpty) lx.pos = math.max(lx.pos, save + 1)
      else toNum(t1) match {
        case Some(n) if n == math.floor(n) && n >= 0 =>
          val save2 = lx.pos
          val t2    = lx.bareToken()
          val t3    = if (toNum(t2).isDefined) lx.bareToken() else ""
          if (t3 == "obj") {
            val v = lx.value().getOrElse(PNull)
            lx.skipWs()
            val kwSave = lx.pos
            val kw     = lx.bareToken()
            if (kw == "stream") {
              // EOL after 'stream': CRLF or LF
              if (lx.peek == '\r') lx.pos += 1
              if (lx.peek == '\n') lx.pos += 1
              val dict = v match { case d: PDict => d; case _ => PDict(Map.empty) }
              val len = dict.m.get("Length") match {
                case Some(PNum(x)) => x.toInt
                case _             => -1
              }
              val start = lx.pos
              // with a direct /Length the extent is exact — the data may
              // legitimately END in 0x0A/0x0D bytes (Flate output often
              // does); only the endstream-search fallback trims the EOL
              // the writer placed before the keyword
              val exact = len >= 0 && start + len <= pdf.length
              val stop =
                if (exact) start + len
                else {
                  val found = indexOf(pdf, "endstream", start)
                  val s = if (found < 0) pdf.length else found
                  trimEol(pdf, start, s)
                }
              val realStop = stop
              val raw = java.util.Arrays.copyOfRange(pdf, start, realStop)
              out(n.toInt) = PStream(dict, raw)
              lx.pos = math.max(realStop, start)
            } else {
              out(n.toInt) = v
              lx.pos = kwSave // endobj (or junk) — resynchronize on it
            }
          } else lx.pos = save2
        case _ => () // skip token
      }
    }
    out.toMap
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i  = math.max(from, 0)
    val last = hay.length - nb.length
    while (i <= last) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  /** Drop one trailing EOL before `endstream` when the /Length was found
    * by search (the writer emits `raw \n endstream`).
    */
  private def trimEol(d: Array[Byte], start: Int, stop: Int): Int = {
    var s = stop
    if (s > start && d(s - 1) == '\n') s -= 1
    if (s > start && d(s - 1) == '\r') s -= 1
    s
  }

  private def resolve(v: PVal, objs: Map[Int, PVal], depth: Int = 0): PVal = v match {
    case PRef(n, _) if depth < 32 => objs.get(n).map(resolve(_, objs, depth + 1)).getOrElse(PNull)
    case other                    => other
  }

  /** Decode a stream's raw bytes per its /Filter: none, /FlateDecode, or
    * a single-element filter array. Unknown filters → empty (skipped).
    */
  def decodeStream(s: PStream, objs: Map[Int, PVal]): Array[Byte] = {
    val filt = resolve(s.dict.m.getOrElse("Filter", PNull), objs) match {
      case PName(f)                 => Some(f)
      case PArr(Vector(PName(f)))   => Some(f)
      case PArr(Vector())           => None
      case PNull                    => None
      case _                        => Some("?unknown")
    }
    filt match {
      case None                => s.raw
      case Some("FlateDecode") => inflate(s.raw)
      case Some(_)             => Array.emptyByteArray
    }
  }

  def inflate(data: Array[Byte]): Array[Byte] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 3 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // corrupt: best effort
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  /** Page content streams in page-tree order (catalog → /Pages → /Kids,
    * cycles guarded); falls back to object-number order over /Type /Page
    * objects when the tree is broken.
    */
  def pageContents(objs: Map[Int, PVal]): Vector[Array[Byte]] = {
    def dictOf(v: PVal): Option[PDict] = resolve(v, objs) match {
      case d: PDict      => Some(d)
      case PStream(d, _) => Some(d)
      case _             => None
    }
    val catalog = objs.values.collectFirst {
      case d: PDict if d.m.get("Type").contains(PName("Catalog")) => d
    }
    val seen  = scala.collection.mutable.Set.empty[Int]
    val pages = Vector.newBuilder[PDict]
    def walk(v: PVal): Unit = v match {
      case PRef(n, _) if !seen.add(n) => () // cycle
      case _ =>
        dictOf(v).foreach { d =>
          d.m.get("Type") match {
            case Some(PName("Pages")) =>
              resolve(d.m.getOrElse("Kids", PNull), objs) match {
                case PArr(kids) => kids.foreach(walk)
                case _          => ()
              }
            case Some(PName("Page")) => pages += d
            case _                   => ()
          }
        }
    }
    catalog.foreach(c => walk(c.m.getOrElse("Pages", PNull)))
    var found = pages.result()
    if (found.isEmpty)
      found = objs.toVector.sortBy(_._1).collect {
        case (_, d: PDict) if d.m.get("Type").contains(PName("Page")) => d
      }
    found.map { p =>
      resolve(p.m.getOrElse("Contents", PNull), objs) match {
        case s: PStream => decodeStream(s, objs)
        case PArr(parts) =>
          val bs = parts.map(resolve(_, objs)).collect { case s: PStream => decodeStream(s, objs) }
          // parts of a /Contents array form ONE logical stream. Spec-legal
          // splits occur only between lexical tokens (where whitespace
          // already exists), so raw concatenation is correct for legal
          // input AND tolerantly recovers illegal mid-token splits.
          if (bs.isEmpty) Array.emptyByteArray else bs.reduce(_ ++ _)
        case _ => Array.emptyByteArray
      }
    }
  }

  // ======================= parser: content streams =======================

  /** Kerning threshold: a TJ adjustment of magnitude ≥ this (thousandths
    * of an em, text space) reads as a word gap.
    */
  val SpaceKernThreshold = 150.0

  /** Interpret one page's content stream, emitting positioned text runs.
    * Tracks the translation components of the text matrix through
    * `Td`/`TD`/`Tm`/`T*`/`TL` and the show operators `Tj`, `'`, `"`, `TJ`.
    * Glyph bytes map through Latin-1 (WinAnsi approximation for the
    * simple-font case — documented limitation).
    */
  def runsOf(content: Array[Byte], page: Int): Vector[TextRun] = {
    val out = Vector.newBuilder[TextRun]
    val lx  = new Lexer(content)
    // operand stack of this content stream
    val stack = ArrayBuffer.empty[PVal]
    var lineX = 0.0; var lineY = 0.0 // text LINE matrix translation
    var tl    = 0.0
    var inText = false

    def str(v: PVal): String = v match {
      case PStr(b) => new String(b, StandardCharsets.ISO_8859_1)
      case _       => ""
    }
    def num(v: PVal): Double = v match { case PNum(n) => n; case _ => 0.0 }
    def popN(n: Int): Vector[PVal] = {
      val take = math.min(n, stack.length)
      val vs   = stack.takeRight(take).toVector
      stack.remove(stack.length - take, take)
      Vector.fill(n - take)(PNull) ++ vs
    }
    // empty show strings are KEPT: an empty line is still a line, and
    // dropping it would desynchronize reading order from the source text
    def emit(s: String, x: Double, y: Double): Unit =
      out += TextRun(page, x, y, s)

    while (!lx.atEnd) {
      lx.skipWs()
      if (!lx.atEnd) {
        val b = lx.peek
        if (b == '/' || b == '(' || b == '[' || b == '<') lx.value().foreach(stack += _)
        else {
          val save = lx.pos
          val tok  = lx.bareToken()
          if (tok.isEmpty) lx.pos = math.max(lx.pos, save + 1)
          else toNum(tok) match {
            case Some(n) => stack += PNum(n)
            case None =>
              tok match {
                case "BT" => inText = true; lineX = 0; lineY = 0; stack.clear()
                case "ET" => inText = false; stack.clear()
                case "TL" => val Vector(a) = popN(1): @unchecked; tl = num(a)
                case "Td" =>
                  val Vector(tx, ty) = popN(2): @unchecked
                  lineX += num(tx); lineY += num(ty)
                case "TD" =>
                  val Vector(tx, ty) = popN(2): @unchecked
                  tl = -num(ty); lineX += num(tx); lineY += num(ty)
                case "Tm" =>
                  val Vector(_, _, _, _, e, f) = popN(6): @unchecked
                  lineX = num(e); lineY = num(f)
                case "T*" => lineY -= tl
                case "Tj" =>
                  val Vector(s) = popN(1): @unchecked
                  if (inText) emit(str(s), lineX, lineY)
                case "'" =>
                  val Vector(s) = popN(1): @unchecked
                  lineY -= tl
                  if (inText) emit(str(s), lineX, lineY)
                case "\"" =>
                  val Vector(_, _, s) = popN(3): @unchecked
                  lineY -= tl
                  if (inText) emit(str(s), lineX, lineY)
                case "TJ" =>
                  val Vector(arr) = popN(1): @unchecked
                  arr match {
                    case PArr(items) if inText =>
                      val sb = new StringBuilder
                      items.foreach {
                        case PStr(bs) => sb.append(new String(bs, StandardCharsets.ISO_8859_1))
                        case PNum(adj) =>
                          if (math.abs(adj) >= SpaceKernThreshold) sb.append(' ')
                        case _ => ()
                      }
                      emit(sb.toString, lineX, lineY)
                    case _ => ()
                  }
                case _ => stack.clear() // any other operator: consume operands
              }
          }
        }
      }
    }
    out.result()
  }

  // ======================= layout analysis =======================

  /** Half the writer's leading; also a sane default for ~11 pt text. */
  private val YLineTolerance = 6.0

  /** Minimum x gap that separates two columns (text-space units). */
  private val ColumnGapThreshold = 100.0

  /** Reassemble reading order from positioned runs: cluster run x-origins
    * into columns (1-D gap clustering), order columns left→right, within a
    * column order lines top→bottom (descending y — PDF y grows upward),
    * and merge runs that share a line (|Δy| ≤ tolerance) left→right.
    * This is what recovers a two-column page whose content stream emitted
    * the right column first.
    */
  def readingOrder(runs: Vector[TextRun]): Vector[String] = {
    if (runs.isEmpty) return Vector.empty
    val xs = runs.map(_.x).distinct.sorted
    // gap-cluster the x origins into column bands
    val bands = ArrayBuffer.empty[(Double, Double)] // (start, end)
    var bandStart = xs.head
    var prev      = xs.head
    for (x <- xs.tail) {
      if (x - prev > ColumnGapThreshold) { bands += ((bandStart, prev)); bandStart = x }
      prev = x
    }
    bands += ((bandStart, prev))
    def bandOf(x: Double): Int = {
      var i = 0
      while (i < bands.length && x > bands(i)._2 + ColumnGapThreshold) i += 1
      math.min(i, bands.length - 1)
    }
    val lines = Vector.newBuilder[String]
    runs.groupBy(r => bandOf(r.x)).toVector.sortBy(_._1).foreach { case (_, colRuns) =>
      // cluster by y within the column
      val byY = colRuns.sortBy(r => (-r.y, r.x))
      var cur = ArrayBuffer.empty[TextRun]
      def flush(): Unit = if (cur.nonEmpty) {
        lines += cur.sortBy(_.x).map(_.text).mkString
        cur = ArrayBuffer.empty[TextRun]
      }
      var lastY = Double.NaN
      for (r <- byY) {
        if (!lastY.isNaN && math.abs(r.y - lastY) > YLineTolerance) flush()
        cur += r
        lastY = r.y
      }
      flush()
    }
    lines.result()
  }

  /** Full extraction: scan objects → page streams in tree order → text
    * runs → layout reading order. Lines joined with `\n`, pages
    * concatenated in order. Never throws: malformed input degrades to
    * whatever text was recoverable (possibly empty).
    */
  def extractText(pdf: Array[Byte]): String =
    try {
      if (pdf == null || pdf.isEmpty) return ""
      val objs  = scanObjects(pdf)
      val pages = pageContents(objs)
      val lines = pages.zipWithIndex.flatMap { case (c, i) => readingOrder(runsOf(c, i)) }
      lines.mkString("\n")
    } catch { case scala.util.control.NonFatal(_) => "" }
}
