package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.layout.{FixtureCorpus, SpanDoc}
import graft.pipeline.{ExtractionPipeline, TestSpark}

class PdfSpec extends AnyFunSuite {

  test("byte round trip: parse(write(doc)) == doc for the whole fixture corpus") {
    FixtureCorpus.fixtureDocs.foreach { doc =>
      val bytes = Pdf.write(doc)
      assert(new String(bytes.take(8), "ISO-8859-1").startsWith("%PDF-1.4"))
      val back = Pdf.parse(doc.doc_id, bytes)
      assert(back.spans == doc.spans,
        s"${doc.doc_id}:\n got ${back.spans.take(8)}\nwant ${doc.spans.take(8)}")
    }
  }

  test("the parser locates objects via the xref table, not by scanning") {
    val doc = FixtureCorpus.fixtureDocs.head
    val bytes = Pdf.write(doc)
    // corrupt one xref entry: parsing must FAIL (offset points at the wrong
    // object) — proof the offsets are load-bearing
    val s = new String(bytes, "ISO-8859-1")
    val xrefAt = s.lastIndexOf("\nxref\n") + 1 // NOT the one inside "startxref"
    val entriesAt = s.indexOf("\n", s.indexOf("\n", xrefAt) + 1) + 1
    val firstEntryEnd = entriesAt + 20 * 2 // skip the object-0 free entry; hit object 1
    val corrupted = s.substring(0, firstEntryEnd) + "0000000009 00000 n \n" +
      s.substring(firstEntryEnd + 20)
    val err = intercept[Exception] {
      Pdf.parse(doc.doc_id, corrupted.getBytes("ISO-8859-1"))
    }
    assert(err.getMessage != null)
  }

  test("strings with parens, backslashes and nested parens survive") {
    val doc = FixtureCorpus.doc("42.esc.pdf") { b =>
      b.page(1).text("""a (nested (deep)) \ backslash""", "plain", "")
    }
    val back = Pdf.parse(doc.doc_id, Pdf.write(doc))
    assert(back.spans == doc.spans)
  }

  test("parsed PDFs flow through the extraction pipeline like native span docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = FixtureCorpus.fixtureDocs
    val viaPdf = docs.map(d => Pdf.parse(d.doc_id, Pdf.write(d)))
    val a = ExtractionPipeline.run(spark, spark.createDataset(viaPdf),
      persistIntermediate = false)
    val b = ExtractionPipeline.run(spark, spark.createDataset(docs),
      persistIntermediate = false)
    val gotStats = a.stats.collect().sortBy(_.doc_id)
    val wantStats = b.stats.collect().sortBy(_.doc_id)
    assert(gotStats.sameElements(wantStats))
    val gotSpans = a.outSpans.collect().sortBy(s => (s.doc_id, s.ord))
    val wantSpans = b.outSpans.collect().sortBy(s => (s.doc_id, s.ord))
    assert(gotSpans.sameElements(wantSpans))
  }

  test("Flate-compressed (default) and plain content streams both round-trip") {
    val doc = FixtureCorpus.fixtureDocs(1) // cross-page doc, multiple streams
    val flate = Pdf.write(doc)
    val plain = Pdf.write(doc, compress = false)
    assert(new String(flate, "ISO-8859-1").contains("/Filter /FlateDecode"))
    assert(!new String(plain, "ISO-8859-1").contains("FlateDecode"))
    assert(flate.length < plain.length) // it actually compressed
    assert(Pdf.parse(doc.doc_id, flate).spans == doc.spans)
    assert(Pdf.parse(doc.doc_id, plain).spans == doc.spans)
  }

  test("foreign producer style: Tm matrices, TJ kern arrays, hex strings, accumulating Td") {
    // hand-assembled PDF with op styles our own writer never emits —
    // proves the content lexer is a parser, not an inverse of the writer
    val content =
      "BT /F1 9 Tf 1 0 0 1 72 720 Tm [(Hel) -20 (lo) 5 ( world)] TJ ET\n" +
        "BT 14 TL 72 708 Td (line two) Tj 0 -12 Td <6C696E65207468726565> Tj ET\n"
    def assemble(streamBody: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val offs = scala.collection.mutable.LinkedHashMap[Int, Long]()
      def emit(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      def obj(n: Int)(body: => Unit): Unit = { offs(n) = out.size().toLong; emit(s"$n 0 obj\n"); body; emit("endobj\n") }
      emit("%PDF-1.4\n")
      obj(1) { emit("<< /Type /Catalog /Pages 2 0 R >>\n") }
      obj(2) { emit("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n") }
      obj(3) { emit("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R" +
        " /Resources << /Font << /F1 5 0 R >> >> >>\n") }
      obj(4) { emit(s"<< /Length ${streamBody.length} >>\nstream\n"); emit(streamBody); emit("endstream\n") }
      obj(5) { emit("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
      val xref = out.size()
      emit("xref\n0 6\n0000000000 65535 f \n")
      (1 to 5).foreach(n => emit(f"${offs(n)}%010d 00000 n \n"))
      emit(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n")
      emit("%%EOF\n")
      out.toByteArray
    }
    val spans = Pdf.parse("foreign.pdf", assemble(content)).spans
    assert(spans.map(s => (s.kind, s.text)) == Seq(
      ("page", "1"), // no /GraftPageNo -> positional numbering
      ("text", "Hello world"), // TJ concat, kern numbers dropped, Tm y=720
      ("text", "line two"), // absolute first Td
      ("text", "line three"))) // accumulated relative Td + hex string
  }

  test("media payload bytes are deterministic and ref-dependent") {
    assert(Pdf.mediaPayload("m1").sameElements(Pdf.mediaPayload("m1")))
    assert(!Pdf.mediaPayload("m1").sameElements(Pdf.mediaPayload("m2")))
  }
}
