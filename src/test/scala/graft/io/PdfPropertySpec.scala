package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.core.Checks.forAllSeeded
import graft.layout.{DocRow, FixtureCorpus}

/** Property-based round trip: RANDOM span documents through the PDF bytes.
  * The generators cover the grammar's full legal surface — printable-ASCII
  * text lines including every escape-relevant character, empty lines,
  * renderGrid-produced rule lines of random cell matrices, media spans
  * with arbitrary refs/alt text, multi-page layouts — so the writer/parser
  * pair is pinned far beyond the 16 hand-authored fixtures. (The span
  * model is ASCII by contract; see Pdf scaladoc.) */
class PdfPropertySpec extends AnyFunSuite {

  private val textChar: Gen[Char] = Gen.choose(32, 126).map(_.toChar)
  private val textLine: Gen[String] = for {
    n <- Gen.choose(0, 60)
    s <- Gen.stringOfN(n, textChar)
  } yield s
  private val nastyLine: Gen[String] = Gen.oneOf(
    "", "()", "(((", ")))", "\\", "\\\\(", "a (b) \\ c)", "  leading and trailing  ",
    "+-not-a-rule", "stream endstream obj")
  private val line: Gen[String] = Gen.frequency(4 -> textLine, 1 -> nastyLine)

  private val cells: Gen[Seq[Seq[String]]] = for {
    cols <- Gen.choose(1, 4)
    rows <- Gen.choose(1, 4)
    m <- Gen.listOfN(rows, Gen.listOfN(cols,
      Gen.stringOfN(3, Gen.alphaNumChar)))
  } yield m.map(_.toSeq)

  private val mediaRef: Gen[(String, String)] = for {
    ref <- Gen.stringOfN(6, Gen.alphaNumChar)
    alt <- Gen.frequency(3 -> textLine, 1 -> Gen.const(""))
  } yield (s"media/$ref", alt)

  private sealed trait Part
  private case class Lines(ls: List[String]) extends Part
  private case class Grid(c: Seq[Seq[String]]) extends Part
  private case class Media(ref: String, alt: String) extends Part

  private val part: Gen[Part] = Gen.frequency(
    4 -> Gen.listOfN(3, line).map(Lines),
    2 -> cells.map(Grid),
    1 -> mediaRef.map { case (r, a) => Media(r, a) })

  private val docGen: Gen[DocRow] = for {
    nPages <- Gen.choose(1, 3)
    pages <- Gen.listOfN(nPages, Gen.listOfN(3, part))
  } yield {
    val b = new FixtureCorpus.DocBuilder("99.prop.pdf")
    pages.zipWithIndex.foreach { case (parts, i) =>
      b.page(i + 1)
      parts.foreach {
        case Lines(ls) => b.text(ls: _*)
        case Grid(c) => b.grid(c)
        case Media(r, a) => b.media(r, a)
      }
    }
    b.build
  }

  test("parse(write(doc)) == doc for random grammar-legal documents") {
    forAllSeeded(docGen, n = 120) { doc =>
      val back = Pdf.parse(doc.doc_id, Pdf.write(doc))
      assert(back.spans == doc.spans)
    }
  }

  test("plain (uncompressed) mode round-trips random docs too") {
    forAllSeeded(docGen, n = 40) { doc =>
      val back = Pdf.parse(doc.doc_id, Pdf.write(doc, compress = false))
      assert(back.spans == doc.spans)
    }
  }
}
