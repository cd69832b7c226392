package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Differential check of [[TablePreprocessor]] against the reference's own
  * `preprocess_array` executed offline (pandas). The case file is produced
  * out-of-tree by running the reference function on 300 random tables; when
  * it is absent (normal CI) the suite is canceled, not failed. Each case is
  * (input table, expected output) where Python None is JSON null and the
  * expected output already reflects pandas astype(str) ("nan" cells).
  */
class ReferenceCrossCheckSpec extends AnyFunSuite {
  private val caseFile = Paths.get("/tmp/preproc_cases.json")

  test("TablePreprocessor matches the reference implementation on 300 random tables") {
    assume(Files.exists(caseFile), "oracle case file not present; skipping")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(caseFile))
    var checked = 0
    var skippedErrors = 0
    root.elements().asScala.foreach { c =>
      val inputNode = c.get("input")
      val expectedNode = c.get("expected")
      def toTable(n: com.fasterxml.jackson.databind.JsonNode): Vector[Vector[String]] =
        n.elements().asScala.map(row =>
          row.elements().asScala.map(cell =>
            if (cell.isNull) null else cell.asText()).toVector).toVector
      if (expectedNode.size() > 0 && expectedNode.get(0).isTextual &&
          expectedNode.get(0).asText() == "ERROR") {
        skippedErrors += 1 // reference crashed on this pathological input
      } else {
        val input = toTable(inputNode)
        val expected = toTable(expectedNode)
        val got = TablePreprocessor.preprocessArray(input)
        assert(got == expected, s"\ninput=$input\nexpected=$expected\ngot=$got")
        checked += 1
      }
    }
    info(s"checked $checked cases against the reference; $skippedErrors reference errors skipped")
    assert(checked > 200)
  }

  private val pureFnFile = Paths.get("/tmp/purefn_cases.json")

  test("ColumnNormalizer/CriterionTaxonomy/MonthFinder match reference-executed cases") {
    assume(Files.exists(pureFnFile), "oracle case file not present; skipping")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(pureFnFile))
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
