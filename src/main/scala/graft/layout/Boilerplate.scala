package graft.layout

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** HTML boilerplate strip + DOM-heuristic main-content extraction.
  *
  * The north rule names the tier's capability set as "HTML boilerplate
  * strip, PDF/layout parse, DOM heuristics". The reference corpus is
  * PDF-only, so there is no reference implementation to match here; the
  * semantics implemented are the published jusText/Boilerpipe family of
  * heuristics (Pomikálek 2011; Kohlschütter et al., WSDM 2010):
  * block-level segmentation, link density, stopword density, and a
  * context pass that rescues headings and short blocks sandwiched
  * between good content.
  *
  * Everything is pure Scala over the raw HTML string — no external parser
  * (zero-egress sandbox; also keeps the hot path allocation-light and
  * usable from `Dataset.map`). The output is the engine's own interleaved
  * span model (kind/text/media_ref/offset — BASELINE.json input_hint), so
  * an HTML corpus becomes a second SOURCE for the same extraction
  * pipeline: strip → spans → (tables, months, dedup, …).
  *
  * Scale shape: strictly map-side (one doc in, blocks out), linear in the
  * HTML length, no shuffle. Per-task state is bounded by [[MaxBlocks]]
  * the same way Extract.SpanBudget bounds span parsing (the O3 analog):
  * a pathological page stops accumulating blocks instead of wedging the
  * task.
  */
object Boilerplate {

  /** Hard cap on blocks retained per document (O3-style per-task bound). */
  val MaxBlocks = 50000

  /** Block-level elements: opening or closing one of these flushes the
    * current text run into a block (Boilerpipe's segmentation rule). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tr", "td", "th", "blockquote", "pre",
    "article", "section", "nav", "header", "footer", "aside", "main",
    "figure", "figcaption", "form", "fieldset", "dl", "dt", "dd", "hr",
    "address", "center", "body", "html", "title", "head")

  /** Ancestor elements whose entire subtree is structural boilerplate. */
  private val BoilerplateAncestors: Set[String] =
    Set("nav", "header", "footer", "aside")

  /** Subtrees that never contribute text. */
  private val DropTags: Set[String] =
    Set("script", "style", "noscript", "template", "svg", "head", "title")

  /** class/id fragments that mark generated chrome (the readability.js
    * "unlikely candidates" heuristic). Matched as substrings of the
    * lowercased attribute value. */
  private val BadAttrFragments: Vector[String] = Vector(
    "nav", "menu", "footer", "sidebar", "side-bar", "advert", "banner",
    "promo", "breadcrumb", "related", "widget", "cookie", "subscribe",
    "share", "social", "comment", "popup", "masthead")

  /** Small English stopword list (same spirit as ops.TextAnalysis — the
    * jusText criterion needs a density, not linguistic coverage). */
  private val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "for",
    "with", "at", "by", "from", "is", "are", "was", "were", "be", "been",
    "it", "its", "this", "that", "these", "those", "as", "not", "no",
    "he", "she", "they", "we", "you", "i", "his", "her", "their", "our")

  private val HeadingTags: Set[String] = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** One segmented block with its classification features.
    *
    * @param idx          0-based position in document order
    * @param tag          innermost block element containing the text
    * @param tagPath      ">"-joined open block-element stack at flush time
    * @param text         whitespace-normalized text
    * @param nWords       whitespace token count
    * @param nChars       character count of `text`
    * @param linkChars    characters that were inside an <a> subtree
    * @param nStopwords   lowercased tokens found in [[Stopwords]]
    * @param heading      innermost tag is h1..h6
    * @param badAncestor  under nav/header/footer/aside
    * @param badAttr      an ancestor's class/id matched [[BadAttrFragments]]
    * @param media        (src, alt) of <img> tags inside this block, in order
    * @param label        "good" | "bad" — final, after the context pass
    */
  final case class HtmlBlock(
      idx: Int,
      tag: String,
      tagPath: String,
      text: String,
      nWords: Int,
      nChars: Int,
      linkChars: Int,
      nStopwords: Int,
      heading: Boolean,
      badAncestor: Boolean,
      badAttr: Boolean,
      media: Vector[(String, String)],
      label: String) {
    def linkDensity: Double = if (nChars == 0) 0.0 else linkChars.toDouble / nChars
    def stopwordDensity: Double = if (nWords == 0) 0.0 else nStopwords.toDouble / nWords
  }

  /** An HTML source document (doc_id + raw markup). */
  final case class HtmlDoc(doc_id: String, html: String)

  // =====================================================================
  // tokenizer
  // =====================================================================

  private def decodeEntities(s: String): String =
    s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
      .replace("&amp;", "&")

  private def normalizeWs(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  private sealed trait Tok
  private final case class Text(s: String) extends Tok
  private final case class Open(name: String, attrs: Map[String, String],
      selfClosing: Boolean) extends Tok
  private final case class Close(name: String) extends Tok

  /** Single-pass tolerant tokenizer. Raw-text elements (script/style) are
    * consumed up to their literal closing tag, per the HTML5 parsing rule
    * — their content is never treated as markup. */
  private def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit =
      if (until > textStart) out += Text(html.substring(textStart, until))
    while (i < n) {
      if (html.charAt(i) == '<' && i + 1 < n) {
        val c = html.charAt(i + 1)
        if (c == '!' || c == '?') { // comment / doctype / PI
          flushText(i)
          val end =
            if (html.startsWith("<!--", i)) {
              val e = html.indexOf("-->", i + 4)
              if (e < 0) n else e + 3
            } else {
              val e = html.indexOf('>', i)
              if (e < 0) n else e + 1
            }
          i = end; textStart = i
        } else if (c == '/' || c.isLetter) {
          val gt = html.indexOf('>', i)
          if (gt < 0) { i = n } // unterminated tag: trailing text
          else {
            flushText(i)
            val inner = html.substring(i + 1, gt)
            if (c == '/') {
              out += Close(inner.substring(1).trim.toLowerCase)
            } else {
              val selfClosing = inner.endsWith("/")
              val body = if (selfClosing) inner.dropRight(1) else inner
              val nameEnd = body.indexWhere(ch => ch.isWhitespace)
              val name =
                (if (nameEnd < 0) body else body.substring(0, nameEnd)).trim.toLowerCase
              val attrs = parseAttrs(if (nameEnd < 0) "" else body.substring(nameEnd))
              out += Open(name, attrs, selfClosing)
              if (DropTags.contains(name) && !selfClosing &&
                  name != "head" && name != "title") {
                // raw-text element: skip to its literal close tag
                val closeAt = html.toLowerCase.indexOf(s"</$name", gt + 1)
                if (closeAt < 0) { i = n; textStart = n }
                else {
                  val closeGt = html.indexOf('>', closeAt)
                  out += Close(name)
                  i = if (closeGt < 0) n else closeGt + 1
                  textStart = i
                }
              } else {
                i = gt + 1; textStart = i
              }
              if (i <= gt) { i = gt + 1; textStart = i }
            }
            if (c == '/') { i = gt + 1; textStart = i }
          }
        } else { i += 1 } // stray '<'
      } else { i += 1 }
    }
    flushText(n)
    out.result()
  }

  private def parseAttrs(s: String): Map[String, String] = {
    // only class/id/src/alt/href are consumed downstream; a simple
    // key="value" / key='value' / key=value scanner covers them
    val m = Map.newBuilder[String, String]
    val re = """([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""".r
    re.findAllMatchIn(s).foreach { mm =>
      val v = Option(mm.group(3)).orElse(Option(mm.group(4))).orElse(Option(mm.group(5))).getOrElse("")
      m += (mm.group(1).toLowerCase -> v)
    }
    m.result()
  }

  // =====================================================================
  // block builder + classifier
  // =====================================================================

  private final case class Frame(name: String, badAttr: Boolean)

  private def hasBadAttr(attrs: Map[String, String]): Boolean = {
    val v = (attrs.getOrElse("class", "") + " " + attrs.getOrElse("id", "")).toLowerCase
    v.nonEmpty && BadAttrFragments.exists(v.contains)
  }

  /** Segment + classify. Deterministic; linear in the input. */
  def blocks(html: String): Vector[HtmlBlock] = {
    val toks = tokenize(html)
    val raw = Vector.newBuilder[HtmlBlock]
    var stack = List.empty[Frame]
    var dropDepth = 0 // inside script/style/head/...
    var linkDepth = 0 // inside <a>
    val sb = new StringBuilder
    val linkSb = new StringBuilder
    val media = Vector.newBuilder[(String, String)]
    var blockCount = 0

    def blockStack: List[String] =
      stack.collect { case f if BlockTags.contains(f.name) => f.name }

    def flush(): Unit = {
      val text = normalizeWs(decodeEntities(sb.toString))
      val med = media.result()
      if ((text.nonEmpty || med.nonEmpty) && blockCount < MaxBlocks) {
        val words = if (text.isEmpty) Array.empty[String] else text.split(' ')
        val stops = words.count(w => Stopwords.contains(w.toLowerCase.filter(_.isLetter)))
        val linkChars = normalizeWs(decodeEntities(linkSb.toString)).length
        val bs = blockStack
        val innermost = bs.headOption.getOrElse("")
        raw += HtmlBlock(
          idx = blockCount,
          tag = innermost,
          tagPath = bs.reverse.mkString(">"),
          text = text,
          nWords = words.length,
          nChars = text.length,
          linkChars = math.min(linkChars, text.length),
          nStopwords = stops,
          heading = HeadingTags.contains(innermost),
          badAncestor = bs.exists(BoilerplateAncestors.contains),
          badAttr = stack.exists(_.badAttr),
          media = med,
          label = "") // assigned below
        blockCount += 1
      }
      sb.clear(); linkSb.clear(); media.clear()
    }

    toks.foreach {
      case Open(name, attrs, selfClosing) =>
        if (name == "img") {
          if (dropDepth == 0)
            media += ((attrs.getOrElse("src", ""), attrs.getOrElse("alt", "")))
        } else if (name == "br") {
          sb.append(' ')
        } else if (DropTags.contains(name)) {
          if (!selfClosing) dropDepth += 1
        } else if (!selfClosing) {
          if (BlockTags.contains(name)) flush()
          if (name == "a") linkDepth += 1
          stack = Frame(name, hasBadAttr(attrs)) :: stack
        }
      case Close(name) =>
        if (DropTags.contains(name)) {
          if (dropDepth > 0) dropDepth -= 1
        } else {
          if (BlockTags.contains(name)) flush()
          if (name == "a" && linkDepth > 0) linkDepth -= 1
          val at = stack.indexWhere(_.name == name)
          if (at >= 0) stack = stack.drop(at + 1) // tolerant: pop through
        }
      case Text(s) =>
        if (dropDepth == 0) {
          sb.append(s)
          if (linkDepth > 0) linkSb.append(s)
        }
    }
    flush()
    classify(raw.result())
  }

  /** Two-pass jusText-style labeling.
    *
    * Pass 1 (context-free):
    *   bad   — structural (nav/header/footer/aside ancestor), attribute
    *           signal, link density > 1/3, or a tiny linkful block
    *   good  — ≥20 words with stopword density ≥ 0.25, or ≥40 words,
    *           link density < 1/3 in both cases
    *   short — everything else (incl. headings): decided by context
    *
    * Pass 2 (context): a short block becomes good iff its nearest non-short
    * neighbor below is good AND (it is a heading OR its nearest non-short
    * neighbor above is good). Headings are rescued by following content
    * alone — a headline belongs to the article under it (jusText's
    * NEARGOOD/HEADLINE rule); plain short blocks need good on both sides.
    */
  private def classify(bs: Vector[HtmlBlock]): Vector[HtmlBlock] = {
    val base: Vector[String] = bs.map { b =>
      if (b.badAncestor || b.badAttr) "bad"
      else if (b.nChars > 0 && b.linkDensity > 1.0 / 3.0) "bad"
      else if (b.nWords < 5 && b.linkChars > 0) "bad"
      else if (b.nWords >= 40) "good"
      else if (b.nWords >= 20 && b.stopwordDensity >= 0.25) "good"
      else "short"
    }
    val n = bs.length
    // nearest non-short label above / below each index
    val above = new Array[String](n)
    var last = ""
    var i = 0
    while (i < n) { above(i) = last; if (base(i) != "short") last = base(i); i += 1 }
    val below = new Array[String](n)
    last = ""
    i = n - 1
    while (i >= 0) { below(i) = last; if (base(i) != "short") last = base(i); i -= 1 }
    bs.zipWithIndex.map { case (b, j) =>
      val lbl = base(j) match {
        case "short" =>
          if (below(j) == "good" && (b.heading || above(j) == "good")) "good" else "bad"
        case other => other
      }
      b.copy(label = lbl)
    }
  }

  /** Main-content span sequence: good blocks become text spans; their
    * images become media spans at their in-block position (alt text in
    * `text`, src in `media_ref`). Offsets are the dense emission order —
    * the engine's span-model contract (Model.scala). */
  def mainSpans(html: String): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    var ord = 0
    blocks(html).foreach { b =>
      if (b.label == "good") {
        if (b.text.nonEmpty) { out += Span("text", b.text, null, ord); ord += 1 }
        b.media.foreach { case (src, alt) =>
          if (src.nonEmpty) { out += Span("media", alt, src, ord); ord += 1 }
        }
      }
    }
    out.result()
  }

  /** HTML corpus → interleaved-span docs table (the driver-mandated input
    * shape): strictly map-side, one task per input split, no shuffle. */
  def extractMain(docs: Dataset[HtmlDoc]): Dataset[DocRow] = {
    import docs.sparkSession.implicits._
    docs.map(d => DocRow(d.doc_id, mainSpans(d.html)))
  }

  // =====================================================================
  // codegen path: crude tag strip as catalyst expressions
  // =====================================================================

  /** Tag-strip as a pure expression chain (whole-stage-codegen'd; no UDF,
    * no typed-map boundary): drop script/style subtrees and comments,
    * strip remaining tags, decode the common entities, collapse
    * whitespace. This is the cheap "flatten to text" path — it keeps
    * boilerplate text (use [[extractMain]] to drop it) but runs entirely
    * inside Tungsten and is exactly replicable in DuckDB's RE2 dialect
    * (no backreferences used), which gives the driver a genuinely
    * independent oracle. */
  def stripTagsColumn(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** The same chain in DuckDB SQL (RE2; 'g' = global, 's' = dotall,
    * 'i' = case-insensitive). Kept textually adjacent to
    * [[stripTagsColumn]] so the two stay in lockstep. */
  def stripTagsSql(htmlExpr: String): String = {
    val noScript = s"regexp_replace($htmlExpr, '<script[^>]*>.*?</script>', ' ', 'gis')"
    val noStyle = s"regexp_replace($noScript, '<style[^>]*>.*?</style>', ' ', 'gis')"
    val noComment = s"regexp_replace($noStyle, '<!--.*?-->', ' ', 'gs')"
    val noTags = s"regexp_replace($noComment, '<[^>]*>', ' ', 'gs')"
    val ent = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        s"replace($c, '$from', '$to')"
      }
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }
}
