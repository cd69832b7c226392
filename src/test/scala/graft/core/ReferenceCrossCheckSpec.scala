package graft.core

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Differential checks against the reference's OWN Python, executed offline
  * (pandas + stdlib difflib) by `src/test/resources/gen_reference_cases.py`
  * — the case files are COMMITTED, so these run on every `sbt test`:
  *
  *   - preproc_cases.json : 300 random tables through preprocess_array
  *     (src/utils/preprocess_table.py — the M3 aux-column cleanup)
  *   - purefn_cases.json  : normalize_column_name (step_4), clean_criterion
  *     (step_5), find_month (step_6) on adversarial strings
  *   - step4_cases.json   : 40 random multi-table corpora through the FULL
  *     step_4 dump (normalize -> project -> FileName -> duplicate-column
  *     dedupe -> alphabetically-sorted outer concat), so the corpus-sheet
  *     stage (C1+C2+C3) is pinned independently of the fixture goldens
  *
  * (The fuzzywuzzy path is pinned by ReferencePivotDifferentialSpec against
  * the reference's published 304-row xlsx pivot.)
  */
class ReferenceCrossCheckSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def resource(name: String): JsonNode = {
    val in = getClass.getResourceAsStream("/" + name)
    require(in != null, s"$name missing from test resources")
    try mapper.readTree(in) finally in.close()
  }

  private def toTable(n: JsonNode): Vector[Vector[String]] =
    n.elements().asScala.map(row =>
      row.elements().asScala.map(cell =>
        if (cell.isNull) null else cell.asText()).toVector).toVector

  test("TablePreprocessor matches the reference implementation on 300 random tables") {
    val root = resource("preproc_cases.json")
    var checked = 0
    var skippedErrors = 0
    root.elements().asScala.foreach { c =>
      val expectedNode = c.get("expected")
      if (expectedNode.size() > 0 && expectedNode.get(0).isTextual &&
          expectedNode.get(0).asText() == "ERROR") {
        skippedErrors += 1 // reference crashed on this pathological input
      } else {
        val input = toTable(c.get("input"))
        val expected = toTable(expectedNode)
        val got = TablePreprocessor.preprocessArray(input)
        assert(got == expected, s"\ninput=$input\nexpected=$expected\ngot=$got")
        checked += 1
      }
    }
    info(s"checked $checked cases against the reference; $skippedErrors reference errors skipped")
    assert(checked > 200)
  }

  test("ColumnNormalizer/CriterionTaxonomy/MonthFinder match reference-executed cases") {
    val root = resource("purefn_cases.json")
    root.get("norm").elements().asScala.foreach { c =>
      val in = c.get("in").asText()
      assert(ColumnNormalizer.normalize(in) == c.get("out").asText(), s"norm($in)")
    }
    root.get("crit").elements().asScala.foreach { c =>
      val in = c.get("in").asText()
      assert(CriterionTaxonomy.cleanCriterion(in) == c.get("out").asText(), s"clean($in)")
    }
    root.get("month").elements().asScala.foreach { c =>
      val in = c.get("in").asText()
      val expected = if (c.get("out").isNull) null else c.get("out").asText()
      assert(MonthFinder.findMonth(in) == expected, s"month($in)")
    }
  }
}

/** step_4 end-to-end: sheetRows + corpusFrame vs the reference loop. Spark
  * suite (separate class so the pure-function checks stay JVM-only). */
class Step4DifferentialSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark

  test("corpus sheet (C1+C2+C3) matches the reference step_4 on 40 random corpora") {
    val mapper = new ObjectMapper()
    val in = getClass.getResourceAsStream("/step4_cases.json")
    require(in != null, "step4_cases.json missing")
    val root = try mapper.readTree(in) finally in.close()
    import spark.implicits._
    var rowsChecked = 0
    root.elements().asScala.zipWithIndex.foreach { case (c, caseIdx) =>
      val tables = c.get("tables").elements().asScala.map(t =>
        t.elements().asScala.map(row =>
          row.elements().asScala.map(x =>
            if (x.isNull) null else x.asText()).toArray).toArray).toVector
      val names = c.get("names").elements().asScala.map(_.asText()).toVector
      val merged = tables.zip(names).map { case (data, name) =>
        graft.pipeline.MergedDoc(name, graft.layout.SpanDoc.docOrd(name), data,
          1, data.length, 1, 1)
      }
      val sheetRows = spark.createDataset(
        merged.flatMap(graft.pipeline.CorpusSheet.sheetRows))
      val corpus = graft.pipeline.ExtractionPipeline.corpusFrame(spark, sheetRows)
      val gotCols = corpus.columns.drop(2).toVector // after doc_ord, row_idx
      val expCols = c.get("expected").get("columns").elements().asScala
        .map(_.asText()).toVector
      assert(gotCols == expCols, s"case $caseIdx columns")
      val got = corpus.orderBy("doc_ord", "row_idx").collect()
        .map(r => gotCols.indices.map(i => r.get(i + 2)).toVector).toVector
      val expected = c.get("expected").get("rows").elements().asScala.map(row =>
        row.elements().asScala.map(x =>
          if (x.isNull) null else x.asText()).toVector).toVector
      assert(got == expected, s"case $caseIdx rows\ngot=$got\nexpected=$expected")
      rowsChecked += expected.length
    }
    info(s"$rowsChecked corpus rows matched the reference step_4 output")
    assert(rowsChecked > 200)
  }
}
