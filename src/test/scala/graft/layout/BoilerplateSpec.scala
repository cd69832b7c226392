package graft.layout

import org.scalatest.funsuite.AnyFunSuite
import Boilerplate._

/** Pins the boilerplate-strip semantics (jusText/Boilerpipe-family
  * heuristics, see Boilerplate.scala scaladoc) on the frozen HTML fixture
  * corpus. x17/x18 golden VALUES pin the same facts driver-side. */
class BoilerplateSpec extends AnyFunSuite {

  private def doc(id: String): String =
    HtmlFixtures.docs.find(_.doc_id == id).get.html

  private def goodTexts(id: String): Vector[String] =
    blocks(doc(id)).filter(_.label == "good").map(_.text)

  test("h01: nav and footer dropped, headline rescued, body kept") {
    val good = goodTexts("h01_article.html")
    assert(good.head == "Terminal Evaluation Findings")
    assert(good.size == 3)
    assert(!good.exists(_.contains("Home")))
    assert(!good.exists(_.contains("Copyright")))
    val bad = blocks(doc("h01_article.html")).filter(_.label == "bad")
    assert(bad.exists(b => b.badAncestor && b.text.contains("Home")))
  }

  test("h01: style body never leaks into any block") {
    assert(!blocks(doc("h01_article.html")).exists(_.text.contains("color:red")))
  }

  test("h02: link farm dropped by link density, prose kept") {
    val bs = blocks(doc("h02_linkfarm.html"))
    val farm = bs.find(_.text.contains("Read more")).get
    assert(farm.linkDensity > 1.0 / 3.0 && farm.label == "bad")
    assert(goodTexts("h02_linkfarm.html").size == 2)
  }

  test("h03: class/id fragments mark chrome subtrees bad") {
    val bs = blocks(doc("h03_attrs.html"))
    assert(bs.find(_.text.contains("Top stories")).get.label == "bad")
    assert(bs.find(_.text.contains("Great article")).get.label == "bad")
    assert(bs.find(_.text.contains("Tweet")).get.label == "bad")
    assert(goodTexts("h03_attrs.html").size == 1)
  }

  test("h04: figure image inside good content kept, ad image dropped") {
    val spans = mainSpans(doc("h04_media.html"))
    val media = spans.filter(_.kind == "media")
    assert(media.map(_.media_ref) == Vector("figures/chart1.png"))
    assert(media.head.text == "Ratings by criterion")
    // ordering: image sits between the two good paragraphs
    val kinds = spans.map(_.kind)
    assert(kinds == Vector("text", "media", "text", "text"))
    assert(spans.map(_.offset) == spans.indices.map(identity).toVector)
  }

  test("h05: heading before good text rescued; trailing orphan dropped") {
    val bs = blocks(doc("h05_headings.html"))
    assert(bs.find(_.text == "Effectiveness").get.label == "good")
    assert(bs.find(_.text.contains("Orphan")).get.label == "bad")
  }

  test("h06: short between goods kept; leading short dropped") {
    val bs = blocks(doc("h06_sandwich.html"))
    assert(bs.find(_.text.contains("Posted on")).get.label == "bad")
    assert(bs.find(_.text.contains("Rated Highly")).get.label == "good")
  }

  test("h07: script/noscript bodies excluded; entities decoded") {
    val good = goodTexts("h07_script.html")
    assert(good.size == 1)
    assert(good.head.startsWith("Monitoring & Reporting was rated \"satisfactory\" 'overall' <with caveats>"))
    assert(!blocks(doc("h07_script.html")).exists(_.text.contains("not content")))
    assert(!blocks(doc("h07_script.html")).exists(_.text.contains("Enable javascript")))
  }

  test("h08: table-held prose kept, chrome row dropped") {
    val good = goodTexts("h08_table.html")
    assert(good.size == 2)
    assert(!good.exists(_.contains("Section A")))
  }

  test("h09: header/aside structural ancestors dropped even with long prose") {
    val good = goodTexts("h09_structural.html")
    assert(good.size == 1)
    assert(good.head.startsWith("Financial management"))
  }

  test("h10: plain text with no markup passes through as one good block") {
    val bs = blocks(doc("h10_plaintext.html"))
    assert(bs.size == 1 && bs.head.label == "good")
  }

  test("offsets are dense and strictly increasing in every fixture") {
    HtmlFixtures.docs.foreach { d =>
      val spans = mainSpans(d.html)
      assert(spans.map(_.offset) == spans.indices.toVector, d.doc_id)
    }
  }

  test("classification is deterministic (same input, same output)") {
    HtmlFixtures.docs.foreach { d =>
      assert(blocks(d.html) == blocks(d.html), d.doc_id)
    }
  }

  test("MaxBlocks bounds per-task state on a pathological page (O3 analog)") {
    val bomb = "<body>" + (1 to (MaxBlocks + 100)).map(i => s"<p>x$i</p>").mkString + "</body>"
    assert(blocks(bomb).size == MaxBlocks)
  }

  test("HTML is a second source: extractMain output feeds the pipeline") {
    val spark = graft.pipeline.TestSpark.spark
    import spark.implicits._
    // an HTML doc whose main content carries a publish month, alongside
    // the fixture corpus; the stripped span docs run through the SAME
    // extraction pipeline as span-grammar documents
    val dated = HtmlDoc("11_dated.html",
      "<body><p>This terminal evaluation report was finalized and published " +
        "in Geneva during April 2022 after the review by the evaluation " +
        "office had been completed and the management response had been " +
        "received from all of the implementing partners involved.</p></body>")
    val docs = Boilerplate.extractMain(
      spark.createDataset(HtmlFixtures.docs :+ dated))
    val r = graft.pipeline.ExtractionPipeline.run(spark, docs,
      persistIntermediate = false)
    val stats = r.stats.collect()
    assert(stats.length == HtmlFixtures.docs.length + 1)
    // prose-only docs: pipeline degrades cleanly (no tables found)
    assert(stats.forall(_.criterion_tables_count == 0))
    val byId = stats.map(s => s.doc_id -> s).toMap
    assert(byId("11_dated.html").publish_month.contains("April 2022"))
    assert(byId("h01_article.html").publish_month.isEmpty)
    assert(stats.forall(_.status == "not_found"))
    // output-span contract: docs with no criterion tables emit no spans
    assert(r.outSpans.count() == 0)
  }
}
