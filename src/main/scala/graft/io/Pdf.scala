package graft.io

import graft.layout.{DocRow, Span, SpanDoc}
import java.io.ByteArrayOutputStream

/** Minimal-but-real PDF 1.4 source: byte-level writer + parser for the
  * engine's interleaved span documents — the north star's "per-document PDF
  * byte-stream tokenization (object/xref parse, content-stream lexing)"
  * implemented from the published PDF 1.4 specification (ISO 32000
  * lineage). The reference repo ships no PDFs (its corpus path points at
  * the author's machine, reference src/config.py:5), so documents are
  * SYNTHESIZED deterministically: [[write]] renders a span document into a
  * genuine PDF byte stream, and [[parse]] recovers the span sequence by
  * actually parsing the bytes — startxref → xref table → object offsets →
  * page tree → content streams — never by remembering the input.
  *
  * Rendering contract (what makes the round trip exact):
  *  - one text span per line: `BT /F1 12 Tf 72 y Td (text) Tj ET`,
  *    y = 720 - 12*line — the parser inverts line = (720 - y) / 12;
  *  - rule spans become PATH objects, not text: a thin filled rect per
  *    horizontal rule (height 1 for '-' fills, 2 for '=') plus a 1x4 tick
  *    rect at every '+' column (x = 72 + 6*col) — the parser rebuilds the
  *    ASCII rule line from the GEOMETRY, the "ruled-line evidence from
  *    drawing spans" path;
  *  - media spans are image XObjects (`q 48 0 0 48 x y cm /ImK Do Q`) with
  *    a deterministic grayscale payload; the provenance keys /GraftRef and
  *    /GraftAlt on the XObject dict carry media_ref/alt text (private dict
  *    keys are legal PDF; real alt text would use tagged content);
  *  - page objects carry /GraftPageNo so non-sequential page markers
  *    round-trip; the parser emits the grammar's kind="page" markers.
  *
  * Content streams are Flate-compressed by default (`/Filter /FlateDecode`,
  * like real-world producers; `write(doc, compress = false)` emits plain
  * bytes) and the parser inflates them — both through java.util.zip, no
  * external codec.
  *
  * Honest limitations (all irrelevant to the synthesized corpus, all
  * documented rather than half-working): Flate or plain streams only,
  * direct /Length integers only, flat /Kids, no encryption, no incremental
  * updates, Tj only (no TJ kerning arrays).
  */
object Pdf {

  private final val X0 = 72.0
  private final val Y0 = 720.0
  private final val ColW = 6.0
  private final val LineH = 12.0

  // ===================================================================
  // writer
  // ===================================================================

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\${c.toInt}%03o")
      case c => b.append(c)
    }
    b.toString
  }

  private def x(col: Int): Long = (X0 + ColW * col).toLong
  private def y(line: Int): Long = (Y0 - LineH * line).toLong

  /** Deterministic tiny grayscale payload for a media ref. */
  private[io] def mediaPayload(ref: String): Array[Byte] =
    Array.tabulate(16)(i => (graft.ops.Dedup.stringHash64(ref) >>> (i % 8 * 8)).toByte)

  private[io] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private[io] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("truncated Flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Render one span document as a complete PDF file. */
  def write(doc: DocRow, compress: Boolean = true): Array[Byte] = {
    val pages = SpanDoc.pages(doc.spans)
    require(pages.nonEmpty, s"${doc.doc_id}: empty document")

    // per page: content-stream text + collected media spans
    final case class Img(name: String, ref: String, alt: String)
    val pageContents = pages.map { p =>
      val ops = new StringBuilder
      val imgs = Vector.newBuilder[Img]
      var imgIdx = 0
      p.spans.zipWithIndex.foreach { case (s, line) =>
        s.kind match {
          case "text" =>
            ops.append(s"BT /F1 12 Tf ${x(0)} ${y(line)} Td (${esc(s.text)}) Tj ET\n")
          case "rule" =>
            val t = s.text
            val ticks = t.indices.filter(t.charAt(_) == '+')
            val fill = t.find(c => c == '-' || c == '=').getOrElse('-')
            val h = if (fill == '=') 2 else 1
            if (ticks.nonEmpty) {
              val (c0, c1) = (ticks.head, ticks.last)
              ops.append(s"${x(c0)} ${y(line)} ${(ColW * (c1 - c0)).toLong} $h re f\n")
              ticks.foreach(c => ops.append(s"${x(c)} ${y(line)} 1 4 re f\n"))
            }
          case "media" =>
            val name = s"Im$imgIdx"; imgIdx += 1
            imgs += Img(name, s.media_ref, if (s.text == null) "" else s.text)
            ops.append(s"q 48 0 0 48 ${x(0)} ${y(line)} cm /$name Do Q\n")
          case other => sys.error(s"${doc.doc_id}: unexpected span kind '$other'")
        }
      }
      (p.number, ops.toString, imgs.result())
    }

    // object numbering: 1=catalog, 2=pages, then per page [page, content,
    // image...], finally the font
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.LinkedHashMap[Int, Long]()
    def emit(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size().toLong
      emit(s"$num 0 obj\n"); body; emit("endobj\n")
    }

    var next = 3
    val pageObjs = pageContents.map { case (no, content, imgs) =>
      val pageNum = next; next += 1
      val contentNum = next; next += 1
      val imgNums = imgs.map { im => val n = next; next += 1; (n, im) }
      (pageNum, contentNum, imgNums, no, content)
    }
    val fontNum = next

    emit("%PDF-1.4\n")
    obj(1) { emit("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) {
      emit(s"<< /Type /Pages /Kids [${pageObjs.map(p => s"${p._1} 0 R").mkString(" ")}]" +
        s" /Count ${pageObjs.length} >>\n")
    }
    pageObjs.foreach { case (pageNum, contentNum, imgNums, no, content) =>
      obj(pageNum) {
        val xo =
          if (imgNums.isEmpty) ""
          else s" /XObject << ${imgNums.map { case (n, im) => s"/${im.name} $n 0 R" }.mkString(" ")} >>"
        emit(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /GraftPageNo $no /Contents $contentNum 0 R" +
          s" /Resources << /Font << /F1 $fontNum 0 R >>$xo >> >>\n")
      }
      obj(contentNum) {
        val plain = content.getBytes("ISO-8859-1")
        val bytes = if (compress) deflate(plain) else plain
        val filter = if (compress) " /Filter /FlateDecode" else ""
        emit(s"<< /Length ${bytes.length}$filter >>\nstream\n")
        out.write(bytes)
        emit("\nendstream\n")
      }
      imgNums.foreach { case (n, im) =>
        obj(n) {
          val payload = mediaPayload(im.ref)
          emit(s"<< /Type /XObject /Subtype /Image /Width 4 /Height 4" +
            s" /ColorSpace /DeviceGray /BitsPerComponent 8" +
            s" /GraftRef (${esc(im.ref)}) /GraftAlt (${esc(im.alt)})" +
            s" /Length ${payload.length} >>\nstream\n")
          out.write(payload)
          emit("\nendstream\n")
        }
      }
    }
    obj(fontNum) {
      emit("<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n")
    }

    val xrefPos = out.size()
    val maxObj = fontNum
    emit(s"xref\n0 ${maxObj + 1}\n")
    emit("0000000000 65535 f \n")
    (1 to maxObj).foreach { n =>
      emit(f"${offsets(n)}%010d 00000 n \n")
    }
    emit(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n")
    emit("%%EOF\n")
    out.toByteArray
  }

  // ===================================================================
  // parser
  // ===================================================================

  sealed trait PVal
  private final case class PNum(v: Double) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PStr(v: String) extends PVal
  private final case class PArr(v: Vector[PVal]) extends PVal
  private final case class PDict(v: Map[String, PVal]) extends PVal
  private final case class PRef(num: Int) extends PVal
  private final case class POp(v: String) extends PVal // keyword/operator
  private final case class PStream(dict: Map[String, PVal], data: Array[Byte]) extends PVal

  private final class Lex(val bytes: Array[Byte], var pos: Int) {
    private def b(i: Int): Int = bytes(i) & 0xff
    private def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12
    private def isDelim(c: Int) =
      isWs(c) || c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    def ws(): Unit = {
      while (pos < bytes.length && (isWs(b(pos)) || b(pos) == '%')) {
        if (b(pos) == '%') while (pos < bytes.length && b(pos) != '\n') pos += 1
        else pos += 1
      }
    }
    /** next raw token (number, name, string, bracket, keyword) as PVal */
    def next(): PVal = {
      ws()
      b(pos) match {
        case '/' =>
          pos += 1; val s = pos
          while (pos < bytes.length && !isDelim(b(pos))) pos += 1
          PName(new String(bytes, s, pos - s, "ISO-8859-1"))
        case '(' =>
          pos += 1
          val sb = new StringBuilder
          var depth = 1
          while (depth > 0) {
            val c = b(pos); pos += 1
            c match {
              case '\\' =>
                val e = b(pos); pos += 1
                e match {
                  case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
                  case 't' => sb.append('\t'); case 'b' => sb.append('\b')
                  case 'f' => sb.append('\f')
                  case d if d >= '0' && d <= '7' =>
                    var oct = d - '0'
                    var k = 0
                    while (k < 2 && b(pos) >= '0' && b(pos) <= '7') {
                      oct = oct * 8 + (b(pos) - '0'); pos += 1; k += 1
                    }
                    sb.append(oct.toChar)
                  case other => sb.append(other.toChar)
                }
              case '(' => depth += 1; sb.append('(')
              case ')' => depth -= 1; if (depth > 0) sb.append(')')
              case c2 => sb.append(c2.toChar)
            }
          }
          PStr(sb.toString)
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PVal]
          ws()
          while (b(pos) != ']') { items += next(); ws() }
          pos += 1
          PArr(resolveRefs(items.result()))
        case '<' if b(pos + 1) != '<' =>
          // hex string <48656C6C6F>
          pos += 1
          val sb = new StringBuilder
          while (b(pos) != '>') {
            if (!isWs(b(pos))) sb.append(b(pos).toChar)
            pos += 1
          }
          pos += 1
          val hex = if (sb.length % 2 == 1) sb.append('0').toString else sb.toString
          PStr(hex.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString)
        case '<' =>
          pos += 2
          val items = Vector.newBuilder[PVal]
          ws()
          while (!(b(pos) == '>' && b(pos + 1) == '>')) { items += next(); ws() }
          pos += 2
          val flat = resolveRefs(items.result())
          PDict(flat.grouped(2).collect {
            case Vector(PName(k), v) => k -> v
          }.toMap)
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val s = pos
          pos += 1
          while (pos < bytes.length && !isDelim(b(pos))) pos += 1
          PNum(new String(bytes, s, pos - s, "ISO-8859-1").toDouble)
        case _ =>
          val s = pos
          while (pos < bytes.length && !isDelim(b(pos))) pos += 1
          POp(new String(bytes, s, pos - s, "ISO-8859-1"))
      }
    }
    /** collapse `N G R` triples into PRef (postfix, so scan the seq) */
    private def resolveRefs(items: Vector[PVal]): Vector[PVal] = {
      val out = Vector.newBuilder[PVal]
      var i = 0
      while (i < items.length) {
        (items.lift(i), items.lift(i + 1), items.lift(i + 2)) match {
          case (Some(PNum(n)), Some(PNum(_)), Some(POp("R"))) =>
            out += PRef(n.toInt); i += 3
          case _ =>
            out += items(i); i += 1
        }
      }
      out.result()
    }
  }

  private final class Parsed(bytes: Array[Byte]) {
    // --- xref: locate via startxref (the spec's entry point — objects are
    // found by OFFSET, never by scanning)
    private val tail = new String(bytes, math.max(0, bytes.length - 64),
      math.min(64, bytes.length), "ISO-8859-1")
    private val xrefPos = {
      val i = tail.lastIndexOf("startxref")
      require(i >= 0, "no startxref")
      tail.substring(i + 9).trim.takeWhile(_.isDigit).toInt
    }
    val (offsets: Map[Int, Long], trailer: Map[String, PVal]) = {
      val lx = new Lex(bytes, xrefPos)
      require(lx.next() == POp("xref"), "xref table expected")
      val offs = scala.collection.mutable.HashMap[Int, Long]()
      var t: Map[String, PVal] = null
      var done = false
      while (!done) {
        lx.next() match {
          case POp("trailer") =>
            t = lx.next().asInstanceOf[PDict].v; done = true
          case PNum(start) =>
            val PNum(count) = lx.next(): @unchecked
            (0 until count.toInt).foreach { k =>
              val PNum(off) = lx.next(): @unchecked
              lx.next() // generation
              val POp(flag) = lx.next(): @unchecked
              if (flag == "n") offs(start.toInt + k) = off.toLong
            }
          case other => sys.error(s"unexpected in xref: $other")
        }
      }
      (offs.toMap, t)
    }

    private val cache = scala.collection.mutable.HashMap[Int, PVal]()
    def deref(v: PVal): PVal = v match {
      case PRef(n) => obj(n)
      case other => other
    }
    def obj(num: Int): PVal = cache.getOrElseUpdate(num, {
      val lx = new Lex(bytes, offsets(num).toInt)
      val PNum(n) = lx.next(): @unchecked
      require(n.toInt == num, s"xref offset points at object ${n.toInt}, wanted $num")
      lx.next() // generation
      require(lx.next() == POp("obj"), "obj keyword expected")
      val v = lx.next()
      lx.ws()
      v match {
        case PDict(d) if peekIs(lx, "stream") =>
          lx.next() // 'stream'
          // spec: stream keyword followed by CRLF or LF
          if ((bytes(lx.pos) & 0xff) == '\r') lx.pos += 1
          if ((bytes(lx.pos) & 0xff) == '\n') lx.pos += 1
          val PNum(len) = deref(d("Length")): @unchecked
          val data = java.util.Arrays.copyOfRange(bytes, lx.pos, lx.pos + len.toInt)
          PStream(d, data)
        case other => other
      }
    })
    private def peekIs(lx: Lex, kw: String): Boolean = {
      val save = lx.pos
      val is = lx.next() == POp(kw)
      lx.pos = save // pure peek — obj() consumes the keyword itself
      is
    }
  }

  /** Parse a PDF byte stream back into the span document it renders. */
  def parse(docId: String, bytes: Array[Byte]): DocRow = {
    val pdf = new Parsed(bytes)
    val root = pdf.deref(pdf.trailer("Root")).asInstanceOf[PDict].v
    val pages = pdf.deref(root("Pages")).asInstanceOf[PDict].v
    val kids = pages("Kids").asInstanceOf[PArr].v

    val spans = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, ref: String = null): Unit = {
      spans += Span(kind, text, ref, off); off += 1
    }

    kids.zipWithIndex.foreach { case (kidRef, idx) =>
      val page = pdf.deref(kidRef).asInstanceOf[PDict].v
      val pageNo = page.get("GraftPageNo") match {
        case Some(PNum(n)) => n.toInt
        case _ => idx + 1
      }
      add("page", pageNo.toString)

      val xobjects: Map[String, Map[String, PVal]] =
        pdf.deref(page.getOrElse("Resources", PDict(Map.empty))) match {
          case PDict(res) => pdf.deref(res.getOrElse("XObject", PDict(Map.empty))) match {
            case PDict(xo) => xo.map { case (k, v) =>
              k -> (pdf.deref(v) match {
                case PStream(d, _) => d
                case PDict(d) => d
                case other => sys.error(s"bad XObject: $other")
              })
            }
            case _ => Map.empty
          }
          case _ => Map.empty
        }

      val PStream(cdict, raw) = pdf.deref(page("Contents")): @unchecked
      val content = cdict.get("Filter") match {
        case Some(PName("FlateDecode")) => inflate(raw)
        case None => raw
        case other => sys.error(s"unsupported stream filter: $other")
      }

      // --- content-stream interpretation
      sealed trait Item
      final case class TextItem(s: String) extends Item
      final case class MediaItem(ref: String, alt: String) extends Item
      final case class RectItem(x: Double, w: Double, h: Double) extends Item
      val items = scala.collection.mutable.ArrayBuffer[(Double, Item)]() // (y, item)

      val lx = new Lex(content, 0)
      val stack = scala.collection.mutable.ArrayBuffer[PVal]()
      var cmY = 0.0
      val cmStack = scala.collection.mutable.ArrayBuffer[Double]()
      // text-space y: BT resets the line matrix; Td/TD TRANSLATE it
      // (accumulating, per spec — our writer's single absolute Td after BT
      // is the degenerate case); Tm REPLACES it (y = operand f); T* moves
      // down by the TL leading
      var tdY = 0.0
      var leading = 0.0
      val pendingRects = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double)]()
      def num(v: PVal): Double = v.asInstanceOf[PNum].v
      while ({ lx.ws(); lx.pos < content.length }) {
        lx.next() match {
          case POp("Td") =>
            tdY += num(stack.last); stack.clear()
          case POp("TD") =>
            leading = -num(stack.last); tdY += num(stack.last); stack.clear()
          case POp("Tm") =>
            tdY = num(stack.last); stack.clear() // f, the ty of the matrix
          case POp("T*") =>
            tdY -= leading; stack.clear()
          case POp("TL") =>
            leading = num(stack.last); stack.clear()
          case POp("Tj") =>
            items += ((tdY, TextItem(stack.last.asInstanceOf[PStr].v))); stack.clear()
          case POp("TJ") =>
            val PArr(parts) = stack.last: @unchecked
            val text = parts.collect { case PStr(s) => s }.mkString
            items += ((tdY, TextItem(text))); stack.clear()
          case POp("re") =>
            val n = stack.takeRight(4).map(_.asInstanceOf[PNum].v)
            pendingRects += ((n(0), n(1), n(2), n(3))); stack.clear()
          case POp("f") =>
            pendingRects.foreach { case (rx, ry, rw, rh) =>
              items += ((ry, RectItem(rx, rw, rh)))
            }
            pendingRects.clear(); stack.clear()
          case POp("cm") =>
            cmY = stack.last.asInstanceOf[PNum].v; stack.clear()
          case POp("q") => cmStack += cmY; stack.clear()
          case POp("Q") =>
            cmY = if (cmStack.nonEmpty) cmStack.remove(cmStack.length - 1) else 0.0
            stack.clear()
          case POp("Do") =>
            val PName(name) = stack.last: @unchecked
            val xd = xobjects(name)
            def str(k: String): String = xd.get(k) match {
              case Some(PStr(s)) => s
              case _ => ""
            }
            items += ((cmY, MediaItem(str("GraftRef"), str("GraftAlt"))))
            stack.clear()
          case POp("BT") => tdY = 0.0; leading = 0.0; stack.clear()
          case POp("ET") | POp("Tf") => stack.clear()
          case POp(_) => stack.clear() // unknown operator: drop operands
          case v => stack += v
        }
      }

      // --- y -> line, rebuild spans in line order
      def lineOf(yv: Double): Int = math.round((Y0 - yv) / LineH).toInt
      items.groupBy { case (yv, _) => lineOf(yv) }.toSeq.sortBy(_._1).foreach {
        case (_, lineItems) =>
          val texts = lineItems.collect { case (_, t: TextItem) => t }
          val medias = lineItems.collect { case (_, m: MediaItem) => m }
          val rects = lineItems.collect { case (_, r: RectItem) => r }
          if (texts.nonEmpty) texts.foreach(t => add("text", t.s))
          else if (medias.nonEmpty)
            medias.foreach(m => add("media", m.alt, m.ref))
          else if (rects.nonEmpty) {
            val ticks = rects.filter(r => r.h >= 3).map(r => math.round((r.x - X0) / ColW).toInt)
            val horiz = rects.find(_.h <= 2)
            val fill = if (horiz.exists(_.h == 2)) '=' else '-'
            if (ticks.nonEmpty) {
              val cols = ticks.sorted
              val sb = new StringBuilder
              (0 to cols.last).foreach { c =>
                sb.append(
                  if (cols.contains(c)) '+'
                  else if (c > cols.head) fill
                  else ' ')
              }
              add("rule", sb.toString)
            }
          }
      }
    }
    DocRow(docId, spans.result())
  }
}
