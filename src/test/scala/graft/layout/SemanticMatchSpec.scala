package graft.layout

import org.scalatest.funsuite.AnyFunSuite

/** The composed v1 TableFinder flow (find_tables_with_context,
  * table_finder.py:23-90): bbox continuation + merge + lookahead + context. */
class TableFinderSpec extends AnyFunSuite {

  test("f02: similar-width fragments merge across pages; dissimilar ones do not") {
    val tables = TableFinder.findTablesWithContext(SpanDoc.pages(FixtureCorpus.f02.spans))
    assert(tables.length == 2)
    // page 4's fragment is wider than page 5's by > 20 -> NOT continued
    assert((tables(0).startPage, tables(0).endPage) == (4, 4))
    // pages 5..7 are within the +/-20 width band -> one merged table
    assert((tables(1).startPage, tables(1).endPage) == (5, 7))
    // merged bbox: min x0, ORIGINAL y0, max x1, new y1 (table_finder.py:152-158)
    assert(tables(1).bbox._1 == 0.0 && tables(1).bbox._3 == 89.0)
    // caption found for the table that follows its "Table N:" line
    assert(tables(0).precedingText.startsWith("Table 5:"))
    assert(tables(1).precedingText == "")
  }

  test("lookahead closes an open table when the next page has none (M7)") {
    val tables = TableFinder.findTablesWithContext(SpanDoc.pages(FixtureCorpus.f01.spans))
    assert(tables.length == 1)
    assert((tables.head.startPage, tables.head.endPage) == (3, 3))
    assert(tables.head.headers.exists(_.contains("Criterion")))
  }
}

import org.scalatest.funsuite.AnyFunSuite

class SemanticMatchSpec extends AnyFunSuite {
  test("token-set cosine: identity 1, disjoint 0, symmetric") {
    assert(SemanticMatch.tokenSetCosine("summary of ratings", "summary of ratings") == 1.0)
    assert(SemanticMatch.tokenSetCosine("alpha beta", "gamma delta") == 0.0)
    val a = SemanticMatch.tokenSetCosine("summary of findings", "project findings")
    val b = SemanticMatch.tokenSetCosine("project findings", "summary of findings")
    assert(math.abs(a - b) < 1e-12 && a > 0)
  }

  test("findSummaryText picks the caption block over prose (P10/P11)") {
    val pages = SpanDoc.pages(FixtureCorpus.f01.spans)
    val m = SemanticMatch.findSummaryText(pages)
    assert(m.isDefined)
    assert(m.get.text == "Table 9: Summary of project findings and ratings")
    assert(m.get.page == 3)
    assert(m.get.confidence >= 0.5)
  }

  test("threshold gate rejects weak matches") {
    val pages = SpanDoc.pages(FixtureCorpus.f15.spans) // workplan doc
    val m = SemanticMatch.findSummaryText(pages, threshold = 0.9)
    assert(m.isEmpty)
  }

  test("findNextTable returns the first table by min page (parse_table.py:289-290)") {
    val pages = SpanDoc.pages(FixtureCorpus.f06.spans)
    val t = SemanticMatch.findNextTable(pages)
    assert(t.isDefined)
    assert(t.get.pageNumbers.min == 3) // the early definition table
    val later = SemanticMatch.findNextTable(pages, startPage = 10)
    assert(later.isDefined)
    assert(later.get.pageNumbers.min == 40)
  }
}

class VisualizeSpec extends AnyFunSuite {
  test("f01 page 3: green table rect at the detected bbox, header names in caption") {
    val page = SpanDoc.pages(FixtureCorpus.f01.spans).find(_.number == 3).get
    val svg = Visualize.pageSvg(page)
    val t = TableDetector.findTables(page).head
    val (x0, y0, x1, y1) = t.bbox
    assert(svg.contains(
      s"""<rect x="${x0.toLong}" y="${y0.toLong}" width="${(x1 - x0).toLong}""""))
    assert(svg.contains("stroke=\"green\""))
    assert(svg.contains("stroke=\"red\""))
    assert(svg.contains(t.names.head))
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>\n"))
  }

  test("rendering is deterministic and page-complete for a whole doc") {
    val a = Visualize.docSvgs(FixtureCorpus.f02)
    val b = Visualize.docSvgs(FixtureCorpus.f02)
    assert(a == b)
    assert(a.map(_._1) == SpanDoc.pages(FixtureCorpus.f02.spans).map(_.number).toVector)
    // XML-escape safety: no raw ampersands/angle brackets leak from text
    assert(a.forall { case (_, s) => !s.replaceAll("&(amp|lt|gt|quot);", "").contains("&") })
  }
}

class HeaderRegionSpec extends AnyFunSuite {
  test("header region: split on double space, drop 'Table' lines, keep-order dedupe (P8)") {
    val d = FixtureCorpus.doc("99.t.pdf") { b =>
      b.page(1)
        .text("Table 9: Summary of project findings and ratings")
        .text("") // blank separates the caption from the aligned block
        .aligned(Vector(
          Vector("Criterion", "Summary Assessment", "Rating"),
          Vector("Strategic Relevance", "Overall rating", "HS"),
          Vector("Efficiency", "Cost-effective", "MS"),
          Vector("Efficiency", "Cost-effective", "MS"))) // dupe row for dedupe
    }
    val page = SpanDoc.pages(d.spans).head
    val t = TableDetector.findTables(page).head
    val headers = ContextExtractor.headerRegion(page, t)
    // the caption line (contains "Table") is dropped; first table lines split
    // on double-space; duplicates removed keeping first occurrence
    assert(headers.take(3) == Vector("Criterion", "Summary Assessment", "Rating"))
    assert(headers.distinct == headers)
    assert(!headers.exists(_.contains("Table")))
  }

  test("embedding seam: an injected vector table changes best-match selection") {
    val spark = graft.pipeline.TestSpark.spark
    import spark.implicits._
    val doc = FixtureCorpus.f01
    // token-set default on f01 picks the summary-caption block
    val tokenBest = SemanticMatch.findSummaryText(SpanDoc.pages(doc.spans)).get
    // every text block of the doc, embedded ADVERSARIALLY: the block the
    // token scorer picked gets a vector orthogonal to the target, some
    // OTHER block gets the target vector itself — if the flow really
    // routes through the injected vectors, the selection must flip
    val blocks = SpanDoc.pages(doc.spans)
      .flatMap(p => p.spans.filter(s => s.kind == "text" && s.text.trim.nonEmpty)
        .map(_.text.trim)).distinct
    val other = blocks.find(_ != tokenBest.text).get
    val target = Seq(1.0, 0.0, 0.0)
    val emb = blocks.map { t =>
      if (t == other) (t, Seq(1.0, 0.0, 0.0))        // cosine 1 with target
      else (t, Seq(0.0, 1.0, 0.0))                    // cosine 0
    }.toDF("text", "vector")
    val docs = spark.createDataset(Seq(doc))
    val got = SemanticMatch.findSummaryTextEmbedded(docs, emb, target, 0.5)
      .as[(String, Int, Long, String)].collect()
    assert(got.length == 1)
    assert(got.head._4 == other && got.head._4 != tokenBest.text)
    assert(got.head._3 == 10000L) // cosine 1.0 in basis points
    // and with vectors that MIRROR the token scorer, the default selection
    // is reproduced through the embedded path
    val agree = blocks.map(t =>
      (t, if (t == tokenBest.text) Seq(1.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0)))
      .toDF("text", "vector")
    val got2 = SemanticMatch.findSummaryTextEmbedded(docs, agree, target, 0.5)
      .as[(String, Int, Long, String)].collect()
    assert(got2.length == 1 && got2.head._4 == tokenBest.text)
  }
}
