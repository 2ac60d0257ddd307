import org.primeframework.transformer.domain.*;
import org.primeframework.transformer.service.*;

import java.lang.reflect.Field;
import java.util.*;

/** Golden-fixture generator: runs adversarial inputs through the reference
  * implementation compiled as-is and emits JSONL rows in the repo's
  * oracle_fixtures.jsonl schema (doc tree + offsets + attributeOffsets +
  * strip + escape + escapeOffsets + escapeTotal).
  */
public class FixtureGen {

  static String esc(String s) {
    StringBuilder b = new StringBuilder(s.length() + 8);
    for (int i = 0; i < s.length(); i++) {
      char c = s.charAt(i);
      if (c == '"') b.append("\\\"");
      else if (c == '\\') b.append("\\\\");
      else if (c == '\n') b.append("\\n");
      else if (c == '\r') b.append("\\r");
      else if (c == '\t') b.append("\\t");
      else if (c < ' ') b.append(String.format("\\u%04x", (int) c));
      else b.append(c);
    }
    return b.toString();
  }

  static String q(String s) { return s == null ? "null" : "\"" + esc(s) + "\""; }

  static String nodeJson(Node n) {
    if (n instanceof TextNode) {
      TextNode t = (TextNode) n;
      return "{\"t\":\"text\",\"begin\":" + t.begin + ",\"end\":" + t.end +
        ",\"body\":" + q(t.getBody()) + "}";
    }
    TagNode t = (TagNode) n;
    StringBuilder attrs = new StringBuilder("[");
    boolean first = true;
    for (Map.Entry<String, String> e : t.attributes.entrySet()) {
      if (!first) attrs.append(",");
      first = false;
      attrs.append("[").append(q(e.getKey())).append(",").append(q(e.getValue())).append("]");
    }
    attrs.append("]");
    StringBuilder kids = new StringBuilder("[");
    first = true;
    for (Node k : t.children) {
      if (!first) kids.append(",");
      first = false;
      kids.append(nodeJson(k));
    }
    kids.append("]");
    return "{\"t\":\"tag\",\"begin\":" + t.begin + ",\"end\":" + t.end +
      ",\"nameEnd\":" + t.nameEnd + ",\"bodyBegin\":" + t.bodyBegin +
      ",\"bodyEnd\":" + t.bodyEnd + ",\"name\":" + q(t.getName()) +
      ",\"attribute\":" + q(t.attribute) + ",\"attributes\":" + attrs +
      ",\"children\":" + kids + "}";
  }

  static String pairSet(Collection<Pair<Integer, Integer>> set) {
    StringBuilder b = new StringBuilder("[");
    boolean first = true;
    for (Pair<Integer, Integer> p : set) {
      if (!first) b.append(",");
      first = false;
      b.append("[").append(p.first).append(",").append(p.second).append("]");
    }
    return b.append("]").toString();
  }

  @SuppressWarnings("unchecked")
  static Collection<Pair<Integer, Integer>> offsetPairs(Offsets o) throws Exception {
    Field f = Offsets.class.getDeclaredField("offsets");
    f.setAccessible(true);
    return (Collection<Pair<Integer, Integer>>) f.get(o);
  }

  static Map<String, TagAttributes> canonical() {
    Map<String, TagAttributes> m = new HashMap<>();
    m.put("*", new TagAttributes(true, false, false, true));
    m.put("code", new TagAttributes(false, true, false, true));
    m.put("noparse", new TagAttributes(false, true, false, true));
    m.put("emoji", new TagAttributes(false, false, true, true));
    return m;
  }

  static Map<String, TagAttributes> nobr() {
    Map<String, TagAttributes> m = canonical();
    m.put("code", new TagAttributes(false, true, false, false));
    m.put("noparse", new TagAttributes(false, true, false, false));
    return m;
  }

  static int id = 401000;

  static void emit(String parser, String config, String input,
                   Map<String, TagAttributes> attrs) {
    try {
      Document doc = parser.equals("html")
        ? new HTMLParser().buildDocument(input, attrs)
        : new BBCodeParser().buildDocument(input, attrs);
      String strip = new TextTransformer().transform(doc, t -> true, null, null);
      Document doc2 = parser.equals("html")
        ? new HTMLParser().buildDocument(input, attrs)
        : new BBCodeParser().buildDocument(input, attrs);
      Offsets off = new Offsets();
      String escaped = new TextTransformer().transform(doc2, t -> true,
        new Transformer.TransformFunction.HTMLTransformFunction(off, attrs), null);
      System.out.println("{\"id\":" + (id++) + ",\"parser\":\"" + parser +
        "\",\"config\":\"" + config + "\",\"input\":" + q(input) +
        ",\"doc\":{\"children\":" + childrenJson(doc) +
        ",\"offsets\":" + pairSet(doc.offsets) +
        ",\"attributeOffsets\":" + pairSet(doc.attributeOffsets) + "}" +
        ",\"strip\":" + q(strip) + ",\"escape\":" + q(escaped) +
        ",\"escapeOffsets\":" + pairSet(offsetPairs(off)) +
        ",\"escapeTotal\":" + off.total() + "}");
    } catch (Throwable e) {
      System.out.println("{\"id\":" + (id++) + ",\"error\":" +
        q(e.getClass().getSimpleName() + ": " + String.valueOf(e.getMessage())) +
        ",\"parser\":\"" + parser + "\",\"config\":\"" + config +
        "\",\"input\":" + q(input) + "}");
    }
  }

  static String childrenJson(Document d) {
    StringBuilder b = new StringBuilder("[");
    boolean first = true;
    for (Node k : d.children) {
      if (!first) b.append(",");
      first = false;
      b.append(nodeJson(k));
    }
    return b.append("]").toString();
  }

  public static void main(String[] args) {
    // batch selection: no args = batch1 only (historical reproduction);
    // "batch2" emits only the round-5 second wave (ids 501000+) so the
    // corpus file can be APPENDED without duplicating earlier rows.
    List<String> sel = Arrays.asList(args);
    if (sel.isEmpty() || sel.contains("batch1")) batch1();
    if (sel.contains("batch2")) { id = 501000; batch2(); }
    if (sel.contains("batch3")) { id = 601000; batch3(); }
    if (sel.contains("batch4")) { id = 701000; batch4(); }
  }

  static void batch4() {
    List<String> inputs = new ArrayList<>();

    // 1. locale-sensitive tag-name case: uppercase names whose lowercase
    // differs by locale (Turkish dotted I, sharp s, accented) — the
    // engines must agree byte-for-byte on whatever the reference does
    String[] caseNames = {"I", "\u0130", "\u00C9", "\u00DF", "SIZE", "SiZe", "\u0130MG"};
    for (String n : caseNames) {
      inputs.add("[" + n + "]x[/" + n.toLowerCase(Locale.ROOT) + "]");
      inputs.add("[" + n.toLowerCase(Locale.ROOT) + "]x[/" + n + "]");
      inputs.add("[" + n + " a=1]x[/" + n + "]");
    }

    // 2. quote-dialect mixing inside attributes
    inputs.add("[t a='single \"double\" inside']x[/t]");
    inputs.add("[t a=\"unterminated]x[/t]");
    inputs.add("[t a='unterminated]x[/t]");
    inputs.add("[t a=']']x[/t]");
    inputs.add("[t a='[']x[/t]");
    inputs.add("[t 'q'=v]x[/t]");
    inputs.add("[t a=\"\"]x[/t]");
    inputs.add("[t a='']x[/t]");
    inputs.add("[t a=\"x\" b='y' c=z]w[/t]");

    // 3. long-range offset arithmetic: escapes clustered at the END of an
    // 8k document; alternating escape/tag every few chars
    StringBuilder longTail = new StringBuilder();
    for (int i = 0; i < 800; i++) longTail.append("plainwordِ ");
    for (int i = 0; i < 50; i++) longTail.append("&<>\"[b]x[/b]");
    inputs.add(longTail.toString());
    StringBuilder alternating = new StringBuilder();
    for (int i = 0; i < 200; i++) alternating.append("&[b]&[/b]");
    inputs.add(alternating.toString());

    // 4. escaped brackets against closers
    inputs.add("[b]x\\[/b]");
    inputs.add("[b]x[/b\\]");
    inputs.add("[b]\\[/b]x[/b]");
    inputs.add("\\[b]x[/b]");
    inputs.add("[b\\]x[/b]");

    // 5. self-closing-style BBCode and text between list items
    inputs.add("[br/]x");
    inputs.add("[img/]");
    inputs.add("[list]text[*]item[/list]");
    inputs.add("[list] [*]a [*]b [/list]");
    inputs.add("[list]\r\n[*]a\r\n[/list]");

    // 6. one unclosed tag over a long span (demotion across 10k chars)
    StringBuilder unclosedLong = new StringBuilder("[b]");
    for (int i = 0; i < 1000; i++) unclosedLong.append("ten chars.");
    inputs.add(unclosedLong.toString());

    // 7. HTML attribute entities and numeric refs
    inputs.add("<a href=\"a&amp;b\">x</a>");
    inputs.add("<a href=a&amp;b>x</a>");
    inputs.add("<p title=\"&#65;&#x42;\">x</p>");
    inputs.add("<a href=\"?q=1&p=2\">x</a>");
    inputs.add("<b>&amp;&lt;&gt;&quot;&#39;</b>");

    // 8. nobr-config newline torture inside preformatted regions
    inputs.add("[code]a\rb\nc\r\nd[/code]");
    inputs.add("[noparse]\r\r\n\n[/noparse]");
    inputs.add("[code]x[/code]\r[code]y[/code]");

    // 9. deep attributed-quote stacks with a missing closer at each depth
    for (int missing = 1; missing <= 6; missing++) {
      StringBuilder q = new StringBuilder();
      for (int d = 0; d < 6; d++) q.append("[quote=u").append(d).append("]t").append(d);
      for (int d = 0; d < 6 - missing; d++) q.append("[/quote]");
      inputs.add(q.toString());
    }

    // 10. new-seed soup, longer documents (80-200 tokens)
    Random rnd = new Random(424242424242L);
    String[] toks = {"[b]", "[/b]", "[i]", "[/i]", "[quote=a]", "[/quote]",
      "[t a=\"v\"]", "[/t]", "\\", "\"", "'", "=", "]", "[", "&", "<", ">",
      " ", "x", "\r\n", "[code]", "[/code]", "[*]", "[list]", "[/list]"};
    for (int s = 0; s < 30; s++) {
      int len = 80 + rnd.nextInt(120);
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < len; i++) sb.append(toks[rnd.nextInt(toks.length)]);
      inputs.add(sb.toString());
    }

    emitMatrix(inputs);
  }

  static void batch3() {
    List<String> inputs = new ArrayList<>();

    // 1. CR/LF and tabs INSIDE attribute machinery: the newline handling
    // so far tortured bodies; attribute values and inter-attribute gaps
    // have their own state transitions
    inputs.add("[t a=\"x\ny\"]b[/t]");
    inputs.add("[t a=\"x\r\ny\"]b[/t]");
    inputs.add("[t\ta=1]x[/t]");
    inputs.add("[t a=1\tb=2]x[/t]");
    inputs.add("[t\na=1]x[/t]");
    inputs.add("[quote=\"a\nb\"]x[/quote]");
    inputs.add("[size=\n9]x[/size]");

    // 2. control characters in body / attribute / tag name
    inputs.add("a\u0001b[b]c\u0007d[/b]");
    inputs.add("[t a=\"\u0001\"]x[/t]");
    inputs.add("[\u0001]x[/\u0001]");
    inputs.add("\u0000[b]x[/b]");

    // 3. length extremes: 300-char tag name, 300-char attribute name,
    // 800-char quoted value holding every special
    StringBuilder longName = new StringBuilder();
    for (int i = 0; i < 300; i++) longName.append('n');
    inputs.add("[" + longName + "]x[/" + longName + "]");
    inputs.add("[t " + longName + "=v]x[/t]");
    StringBuilder longVal = new StringBuilder();
    for (int i = 0; i < 100; i++) longVal.append("&<>\"' []\\");
    inputs.add("[t a=\"" + longVal + "\"]x[/t]");

    // 4. backslash-in-attribute torture (escape state machine inside
    // simple and complex attributes, quoted and bare)
    inputs.add("[t a=\\\"]x[/t]");
    inputs.add("[t a=\"b\\\"c\"]x[/t]");
    inputs.add("[t a=b\\]x[/t]");
    inputs.add("[url=http://e.com/a\\b]x[/url]");
    inputs.add("[t a=\"\\\\\"]x[/t]");
    inputs.add("[quote=\\]x[/quote]");

    // 5. [*] interactions beyond plain lists
    inputs.add("[*]");
    inputs.add("[list][*][/list]");
    inputs.add("[list][*]a[*][/list]");
    inputs.add("[list][*]a[list][*]b[/list][/list]");
    inputs.add("[list][*]a");
    inputs.add("[*]a[/list]");
    inputs.add("[list][*][*][*][/list]");
    inputs.add("[ol][*]x[/ol]");

    // 6. cross-language embedding: each parser's markup inert inside the
    // other's raw regions
    inputs.add("[code]<script>alert(1)</script>[/code]");
    inputs.add("[noparse]<b>x</b>[/noparse]");
    inputs.add("<script>[b]x[/b]</script>");
    inputs.add("<pre>[list][*]a[/list]</pre>");
    inputs.add("[code]<!-- c -->[/code]");

    // 7. sliding single-char truncation over a complex attributed base
    // (every prefix must parse without throwing and with sound spans)
    String base = "[quote=\"a\\\"b\" x=1]hi [b]z&[/b][/quote]";
    for (int i = 1; i <= base.length(); i++) inputs.add(base.substring(0, i));

    // 8. repetition bombs
    StringBuilder opens = new StringBuilder();
    for (int i = 0; i < 500; i++) opens.append('[');
    inputs.add(opens.toString());
    StringBuilder closes = new StringBuilder();
    for (int i = 0; i < 500; i++) closes.append(']');
    inputs.add(closes.toString());
    StringBuilder slashes = new StringBuilder();
    for (int i = 0; i < 300; i++) slashes.append('\\');
    inputs.add(slashes.toString());
    StringBuilder bombs = new StringBuilder();
    for (int i = 0; i < 200; i++) bombs.append("[b]");
    inputs.add(bombs.toString());
    StringBuilder unopened = new StringBuilder();
    for (int i = 0; i < 200; i++) unopened.append("[/b]");
    inputs.add(unopened.toString());

    // 9. HTML third wave: PI/doctype/backtick/unquoted-special attrs,
    // case and whitespace soups, EOF inside raw text
    inputs.add("<?php echo 1; ?>x");
    inputs.add("<!DOCTYPEhtml><p>x</p>");
    inputs.add("<a href=a&b>x</a>");
    inputs.add("<a title=b>c>d</a>");
    inputs.add("<a title=`b`>x</a>");
    inputs.add("<A HREF=\"X\">x</A>");
    inputs.add("<input value = \"a\" >");
    inputs.add("<b\n class=c>x</b>");
    inputs.add("<script>x</scr");
    inputs.add("<!-->x");
    inputs.add("<!--->x");
    inputs.add("<!---->x");
    inputs.add("</>x");
    inputs.add("< >x");
    inputs.add("<b <i>>x");
    inputs.add("<p>&amp;&notanentity;&</p>");

    // 10. whitespace-only and near-empty documents
    inputs.add(" ");
    inputs.add("\r\n\r\n");
    inputs.add("\t\t");
    inputs.add(" \r\n\t ");

    // 11. new-seed soup with an attribute-heavy alphabet
    Random rnd = new Random(20260818L * 31 + 7);
    String[] toks = {"[t ", "a=", "\"", "b\"", "=c", "]", "[/t]", "\\",
      " ", "x", "[b]", "[/b]", "[url=", "http://e", "[quote=", "'",
      "\r\n", "&", "<", "[*]", "[list]", "[/list]", "\t"};
    for (int s = 0; s < 40; s++) {
      int len = 8 + rnd.nextInt(40);
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < len; i++) sb.append(toks[rnd.nextInt(toks.length)]);
      inputs.add(sb.toString());
    }

    emitMatrix(inputs);
  }

  static void batch2() {
    List<String> inputs = new ArrayList<>();

    // 1. multibyte/astral torture: the offset arithmetic must count Java
    // chars (surrogate pairs are 2), and escape offsets must survive
    // multibyte prefixes
    String smile = "😀"; // 😀 (astral, 2 chars)
    String cjk = "日本語";
    String combining = "é́"; // e + two combining acutes
    inputs.add("[b]" + smile + "[/b]");
    inputs.add(smile + "[size=9]x[/size]");
    inputs.add("[t a=\"" + cjk + "\"]x[/t]");
    inputs.add("[" + cjk + "]x[/" + cjk + "]");
    inputs.add(smile + "\r\n&" + smile + "<");
    inputs.add("[b]" + combining + "&[/b]");
    inputs.add("[quote=" + smile + "]x[/quote]");
    inputs.add(smile + smile + smile + "[emoji]" + smile);
    inputs.add("[code]" + smile + "&<[/code]");

    // 2. nested/attributed quote stacks
    inputs.add("[quote=alice][quote=bob]x[/quote][/quote]");
    inputs.add("[quote=\"a b\"][quote]y[/quote][/quote]");
    inputs.add("[quote=a][b]z[/quote][/b]");

    // 3. preformatted bodies holding tag-like fragments
    inputs.add("[noparse][b][/noparse]");
    inputs.add("[noparse][/code][/noparse]");
    inputs.add("[code][code][/code]");
    inputs.add("[code]x[/code ]");
    inputs.add("[code][/c[/code]");
    inputs.add("[noparse][noparse][/noparse][/noparse]");
    inputs.add("[code]a[/code][code]b[/code]");

    // 4. simple-attribute edge shapes
    inputs.add("[t=v a=b]x[/t]");
    inputs.add("[url=http://e.com?a=1&b=2]x[/url]");
    inputs.add("[t==]x[/t]");
    inputs.add("[t=]x[/t]");
    inputs.add("[t='a=b']x[/t]");
    inputs.add("[size=9][size=10]x[/size][/size]");

    // 5. bracket fragments at boundaries
    inputs.add("[");
    inputs.add("]");
    inputs.add("[/");
    inputs.add("[//]");
    inputs.add("[b/]");
    inputs.add("x[");
    inputs.add("[b]x[");
    inputs.add("[b]x[/");
    inputs.add("[[b]]x[[/b]]");

    // 6. HTML second wave: raw-text/void/malformed-nesting families
    inputs.add("<style>a{b:c}</style>x");
    inputs.add("<title><b></title>");
    inputs.add("<b><i></b></i>");
    inputs.add("<table><tr><td>x");
    inputs.add("<p/ >x");
    inputs.add("<a href onclick>x</a>");
    inputs.add("<img src=x alt>");
    inputs.add("&#60;b&#62;x");
    inputs.add("<div>" + smile + "</div>");
    inputs.add("<p title=\"" + cjk + "\">x</p>");
    StringBuilder deep = new StringBuilder();
    for (int i = 0; i < 30; i++) deep.append("<div>");
    deep.append("x");
    for (int i = 0; i < 30; i++) deep.append("</div>");
    inputs.add(deep.toString());

    // 7. long mixed documents (escape+tag machinery over 10k chars)
    StringBuilder longDoc = new StringBuilder();
    for (int i = 0; i < 400; i++)
      longDoc.append("para ").append(i).append(" &<> [b]x[/b]\r\n");
    inputs.add(longDoc.toString());

    // 8. seeded random soup, new seed, multibyte tokens in the alphabet
    Random rnd = new Random(20260818L);
    String[] toks = {"[b]", "[/b]", "[*]", "[list]", "[/list]", "[code]",
      "[/code]", "[quote=a]", "[/quote]", "\"", "=", "]", "[", "\r\n",
      smile, cjk, "&", "<", ">", "'", " ", "x", "[noparse]", "[/noparse]"};
    for (int s = 0; s < 40; s++) {
      int len = 8 + rnd.nextInt(40);
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < len; i++) sb.append(toks[rnd.nextInt(toks.length)]);
      inputs.add(sb.toString());
    }

    emitMatrix(inputs);
  }

  static void emitMatrix(List<String> inputs) {
    LinkedHashSet<String> uniq = new LinkedHashSet<>(inputs);
    Map<String, TagAttributes> canon = canonical();
    Map<String, TagAttributes> none = new HashMap<>();
    Map<String, TagAttributes> nb = nobr();
    for (String in : uniq) {
      emit("bbcode", "canonical", in, canon);
      emit("bbcode", "empty", in, none);
      if (in.contains("\n") || in.contains("\r")) emit("bbcode", "nobr", in, nb);
      if (in.contains("<")) {
        emit("html", "empty", in, none);
        emit("html", "canonical", in, canon);
      }
    }
  }

  static void batch1() {
    List<String> inputs = new ArrayList<>();

    // 1. tag-name torture: short/symbolic/mixed-case names and closers
    String[] names = {"1", "-", "_", ".", "a1", "1a", "-x", "ab1", "_a_", "A", "bB"};
    for (String n : names) {
      inputs.add("[" + n + "]x[/" + n + "]");
      inputs.add("[" + n + "]x");
    }
    inputs.add("[B]x[/b]"); inputs.add("[b]x[/B]"); inputs.add("[]x[/]");
    inputs.add("[ ]x[/ ]"); inputs.add("[\tb]x");

    // 2. quote/attribute torture beyond the earlier families
    inputs.add("[img src='a\"b']x[/img]");
    inputs.add("[t a='']x[/t]");
    inputs.add("[t a=\" lead\"]x[/t]");
    inputs.add("[t a=\"tr \"]x[/t]");
    inputs.add("[t a=']']x[/t]");
    inputs.add("[t a='['];x[/t]");
    inputs.add("[t a=b c='d' e=\"f\"]x[/t]");
    inputs.add("[t a='1' a='2']x[/t]");
    inputs.add("[size='12']x[/size]");
    inputs.add("[size= 12]x[/size]");
    inputs.add("[size =12]x[/size]");
    inputs.add("[size = 12]x[/size]");

    // 3. same-tag stacks and wrong-order closers
    for (int d : new int[]{3, 7, 20}) {
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < d; i++) sb.append("[b]");
      sb.append("x");
      for (int i = 0; i < d - 1; i++) sb.append("[/b]");
      inputs.add(sb.toString());
    }
    inputs.add("[b][i]x[/b][/i]");
    inputs.add("[b][i][u]x[/b][/i][/u]");
    StringBuilder alt = new StringBuilder();
    for (int i = 0; i < 10; i++) alt.append(i % 2 == 0 ? "[b]" : "[i]");
    alt.append("y");
    for (int i = 0; i < 10; i++) alt.append(i % 2 == 0 ? "[/b]" : "[/i]");
    inputs.add(alt.toString());

    // 4. standalone (emoji) interactions
    inputs.add("[emoji]"); inputs.add("a[emoji]b"); inputs.add("[emoji][/emoji]");
    inputs.add("[emoji=5]"); inputs.add("[emoji a=\"1\"]");
    inputs.add("[list][*][emoji][/list]");
    inputs.add("[code][emoji][/code]");
    inputs.add("[emoji][emoji][emoji]");
    inputs.add("[b][emoji][/b]");

    // 5. escape-dense inputs (CRLF/LFCR boundary machinery)
    String[] escCore = {"&", "<", ">", "\"", "&<>\"", "\r\n", "\n\r", "\r", "\n",
      "\r\r\n\n", "&\r\n<\n\r>\"", "x\r", "\r\nx", "&&&&&&&", "<<<<",
      "\"\r\n\"", "a&b<c>d\"e\r\nf\n\rg\rh\ni"};
    for (String e : escCore) {
      inputs.add(e);
      inputs.add("[b]" + e + "[/b]");
      inputs.add("[code]" + e + "[/code]");
    }
    StringBuilder dense = new StringBuilder();
    for (int i = 0; i < 32; i++) dense.append("&<>\"\r\n");
    inputs.add(dense.toString());

    // 6. [*] boundary torture
    inputs.add("[*]"); inputs.add("x[*]y"); inputs.add("[list][*]");
    inputs.add("[*][*][*]");
    inputs.add("[list][*][list][*][/list][/list]");
    inputs.add("[list][*]a[*]b[/list][*]");
    inputs.add("[list][*][/list]");
    inputs.add("[list][*]a[/list][list][*]b[/list]");

    // 7. control characters adjacent to tag machinery
    inputs.add("a b");
    inputs.add("[b][/b]");
    inputs.add("[b]x[/b]");
    inputs.add("[b ]x");
    inputs.add("abc");

    // 8. long-attribute offset arithmetic
    StringBuilder lv = new StringBuilder();
    for (int i = 0; i < 160; i++) lv.append("v[]= ");
    inputs.add("[t a=\"" + lv + "\"]x[/t]");
    StringBuilder wv = new StringBuilder();
    for (int i = 0; i < 800; i++) wv.append("w");
    inputs.add("[t a=" + wv + "]x[/t]");
    StringBuilder pre = new StringBuilder();
    for (int i = 0; i < 500; i++) pre.append("padding. ");
    inputs.add(pre + "[size=9]tail[/size]");

    // 9. HTML-specific new families
    inputs.add("<input disabled checked readonly>");
    inputs.add("<a href=foo\"bar>x</a>");
    inputs.add("<!-- x");
    inputs.add("<!-- -- > y");
    inputs.add("<script>a</scr</script>b");
    inputs.add("<![CDATA[x]]>");
    inputs.add("<!DOCTYPE html><p>x</p>");
    inputs.add("<textarea><b>x</b></textarea>");
    inputs.add("<div class=\"a\" class=\"b\">x</div>");
    inputs.add("<br/><br />");
    inputs.add("<p style=\"a:b;c:d\">x</p>");
    inputs.add("<a ><b>x</b></a >");
    inputs.add("<a");
    inputs.add("<<a>>x<</a>>");
    inputs.add("<a\nhref='u'>x</a>");

    // 10. seeded random soup over a fresh token alphabet
    Random rnd = new Random(20260817L);
    String[] toks = {"[b]", "[/b]", "[*]", "[list]", "[/list]", "[code]",
      "[/code]", "\\", "\"", "=", "]", "[", "\n", "\r\n", "[emoji]", "x",
      " ", "[i]", "[/i]", "&", "<", ">", "[noparse]", "[/noparse]", "'"};
    for (int s = 0; s < 40; s++) {
      int len = 5 + rnd.nextInt(36);
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < len; i++) sb.append(toks[rnd.nextInt(toks.length)]);
      inputs.add(sb.toString());
    }

    emitMatrix(inputs);
  }
}
