package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import Checks.forAllSeeded

class LongestRunSpec extends AnyFunSuite {
  // the reference's own inline asserts (find_longest_subsequence.py:45-48)
  test("reference golden cases") {
    assert(LongestRun.findLongestSubsequence(Seq(2, 3, 5, 6, 7, 9)) == List(2, 3, 4))
    assert(LongestRun.findLongestSubsequence(Seq()) == Nil)
    assert(LongestRun.findLongestSubsequence(Seq(89)) == List(0))
    assert(LongestRun.findLongestSubsequence(Seq(89, 91)) == List(1))
  }
  test("ties keep the FIRST longest run") {
    assert(LongestRun.findLongestSubsequence(Seq(10, 11, 20, 30, 31, 40)) == List(0, 1))
  }
  test("properties: indices are consecutive and in range") {
    val gen = Gen.listOf(Gen.choose(1, 50)).map(_.sorted.distinct)
    forAllSeeded(gen) { seq: List[Int] =>
      val idx = LongestRun.findLongestSubsequence(seq)
      assert(idx.forall(i => i >= 0 && i < seq.length))
      if (idx.length > 1) {
        assert(idx.zip(idx.tail).forall { case (a, b) => b == a + 1 })
        assert(idx.zip(idx.tail).forall { case (a, b) => seq(b) == seq(a) + 1 })
      }
    }
  }
}

class TextSimilaritySpec extends AnyFunSuite {
  private def d(a: String, b: String) = TextSimilarity.difflibRatio(a, b)

  test("difflib ratio matches CPython difflib on reference-shaped inputs") {
    // expected values generated with CPython 3 difflib.SequenceMatcher
    assert(math.abs(d("criterion", "criterion") - 1.0) < 1e-9)
    assert(math.abs(d("s ummary assessment", "summaryassessment") - 0.9444444444) < 1e-9)
    assert(math.abs(d("summary assessment/comments", "summaryassessment") - 0.7727272727) < 1e-9)
    assert(math.abs(d("rating (achievement)", "summaryassessment") - 0.3783783784) < 1e-9)
    assert(math.abs(d("criteria", "criterion") - 0.8235294118) < 1e-9)
    assert(math.abs(d("crtierion", "criterion") - 0.8888888889) < 1e-9)
    assert(math.abs(d("summary assessment", "summaryassessment") - 0.9714285714) < 1e-9)
    assert(math.abs(d("alignment to unep mts, pow and strategic priorities",
      "strategic relevance") - 0.3428571429) < 1e-9)
    assert(math.abs(d("monitoring & reporting", "monitoring and reporting") - 0.9130434783) < 1e-9)
    assert(d("", "criterion") == 0.0)
    assert(d("abc", "") == 0.0)
    assert(d("", "") == 1.0)
  }

  test("fuzz ratio: indel ratio, rounded half-to-even") {
    // LCS("criteria","criterion")=7 -> 2*7/17=0.8235.. -> 82
    assert(TextSimilarity.fuzzRatio("criteria", "criterion") == 82)
    assert(TextSimilarity.fuzzRatio("effectiveness", "effectiveness") == 100)
    assert(TextSimilarity.fuzzRatio("abc", "xyz") == 0)
    // LCS("ab","abcd")=2 -> 4/6=0.6667 -> 67
    assert(TextSimilarity.fuzzRatio("ab", "abcd") == 67)
  }

  test("fuzz partial ratio: substring alignment") {
    assert(TextSimilarity.fuzzPartialRatio("sustainability",
      "sustainability and replication") == 100)
    assert(TextSimilarity.fuzzPartialRatio("efficiency", "overall efficiency rating") == 100)
    // shorter not contained: best window
    assert(TextSimilarity.fuzzPartialRatio("abcd", "xxabcyy") >= 75)
  }

  test("fuzz partial ratio: published fuzzywuzzy outputs (README/docstring)") {
    assert(TextSimilarity.fuzzPartialRatio("this is a test", "this is a test!") == 100)
    assert(TextSimilarity.fuzzPartialRatio("YANKEES", "NEW YORK YANKEES") == 100)
    // the classic partial < full example — 69 only falls out if the
    // block-anchored candidate windows are the real fuzzywuzzy set
    assert(TextSimilarity.fuzzPartialRatio("NEW YORK METS", "NEW YORK YANKEES") == 69)
  }

  test("lev matching blocks: editops-derived, difflib-style terminator") {
    // "abcd" vs "xabcy": one insert (x), block abc, then d->y replace
    assert(TextSimilarity.levMatchingBlocks("abcd", "xabcy") ==
      Vector((0, 1, 3), (4, 5, 0)))
    // identical strings: one full block
    assert(TextSimilarity.levMatchingBlocks("abc", "abc") ==
      Vector((0, 0, 3), (3, 3, 0)))
    // disjoint alphabets: replacements only, just the terminator
    assert(TextSimilarity.levMatchingBlocks("abc", "xyz") == Vector((3, 3, 0)))
    // empty shorter: terminator anchors the tail window (-> ratio 1.0 -> 100)
    assert(TextSimilarity.levMatchingBlocks("", "abc") == Vector((0, 3, 0)))
    assert(TextSimilarity.fuzzPartialRatio("", "abc") == 100)
  }

  test("properties: symmetry and bounds") {
    val gen = Gen.zip(Gen.alphaNumStr.map(_.take(30)), Gen.alphaNumStr.map(_.take(30)))
    forAllSeeded(gen) { case (a: String, b: String) =>
      val r = TextSimilarity.indelRatio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs(r - TextSimilarity.indelRatio(b, a)) < 1e-12)
      val dr = TextSimilarity.difflibRatio(a, b)
      assert(dr >= 0.0 && dr <= 1.0)
      // difflib's greedy matching never exceeds the optimal LCS total
      assert(dr <= r + 1e-12)
      if (a.nonEmpty || b.nonEmpty) {
        val exact = TextSimilarity.fuzzPartialRatio(a, b)
        // the block-anchored candidate windows are a subset of all windows
        assert(exact <= TextSimilarity.fuzzPartialRatioAllWindows(a, b))
        assert(exact >= 0 && exact <= 100)
      }
    }
  }
}

class TablePreprocessorSpec extends AnyFunSuite {
  private val N: String = null

  test("docstring worked example (preprocess_table.py:32-58)") {
    // Col0 holds the Criterion values; Col2/Col4/Col6 are empty aux columns.
    val input = Vector(
      Vector("Col0", "Criterion", "Col2", "Summary assessment", "Col4", "Rating", "Col6"),
      Vector("Strategic Relevance", N, N,
        "Overall rating for Strategic Relevance: Highly Satisfactory", N, "HS", N),
      Vector("1. Alignment to UNEP MTS, POW and Strategic Priorities", N, N,
        "Closely aligned with UNEP MTS and POW at the time it was designed.", N, "HS", N),
      Vector("2. Alignment to UNEP Donor/GEF/Partner strategic priorities", N, N,
        "The project was aligned with GEF's strategic priorities.", N, "HS", N))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.head == Vector("Criterion", "Summary assessment", "Rating"))
    assert(out(1) == Vector("Strategic Relevance",
      "Overall rating for Strategic Relevance: Highly Satisfactory", "HS"))
    assert(out(2)(0).startsWith("1. Alignment"))
    assert(out.length == 4)
  }

  test("all-empty aux columns are dropped (preprocess_table.py:119-124)") {
    val input = Vector(
      Vector("criterion", "Col1", "rating"),
      Vector("Effectiveness", N, "S"),
      Vector("Efficiency", "", "MS"))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.head == Vector("criterion", "rating"))
    assert(out == Vector(
      Vector("criterion", "rating"),
      Vector("Effectiveness", "S"),
      Vector("Efficiency", "MS")))
  }

  test("FIRST aux column with content combine_firsts into the first named column") {
    // reference preprocess_table.py:96-109: the first aux column, when it has
    // any content, merges into the FIRST non-aux named column regardless of
    // adjacency — source non-NaN values win, even over non-blank targets.
    val input = Vector(
      Vector("criterion", "Col1", "rating"),
      Vector("Effectiveness", "S", N),
      Vector("Efficiency", "ignored", "MS"))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.head == Vector("criterion", "rating"))
    assert(out(1) == Vector("S", "None"))
    assert(out(2) == Vector("ignored", "MS"))
  }

  test("non-first aux column with content fills RIGHT non-aux neighbor's blanks") {
    val input = Vector(
      Vector("criterion", "Col1", "Col2", "rating"),
      Vector("Effectiveness", N, "S", N),
      Vector("Efficiency", N, "ignored", "MS"))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.head == Vector("criterion", "rating"))
    assert(out(1) == Vector("Effectiveness", "S")) // blank target filled
    assert(out(2) == Vector("Efficiency", "MS")) // non-blank target never overwritten
  }

  test("empty-string headers are treated as aux and restored if kept") {
    val input = Vector(
      Vector("criterion", "", "rating"),
      Vector("Effectiveness", N, "S"))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.head == Vector("criterion", "rating"))
  }

  test("missing cells stringify to 'None' (astype(str) parity)") {
    val input = Vector(
      Vector("criterion", "rating"),
      Vector("Effectiveness", N))
    val out = TablePreprocessor.preprocessArray(input)
    assert(out(1) == Vector("Effectiveness", "None"))
  }

  test("all-blank rows are dropped; rows with a missing cell survive") {
    val input = Vector(
      Vector("criterion", "rating"),
      Vector(N, N), // all-missing -> dropped
      Vector(" ", ""), // all-whitespace strings -> dropped
      Vector("Effectiveness", N)) // kept
    val out = TablePreprocessor.preprocessArray(input)
    assert(out.length == 2)
  }

  test("property: no Col\\d+ headers in output; non-blank cells never overwritten") {
    val cell = Gen.oneOf(Gen.const(N), Gen.const(""), Gen.alphaStr.map(_.take(6)))
    val gen = for {
      nCols <- Gen.choose(2, 6)
      nRows <- Gen.choose(1, 6)
      headers <- Gen.sequence[Vector[String], String](Vector.tabulate(nCols)(i =>
        Gen.oneOf(Gen.const(s"Col$i"), Gen.const("name" + i), Gen.const(""))))
      rows <- Gen.listOfN(nRows, Gen.sequence[Vector[String], String](
        Vector.fill(nCols)(cell)))
    } yield headers +: rows.toVector
    forAllSeeded(gen, n = 100) { table: Vector[Vector[String]] =>
      val out = TablePreprocessor.preprocessArray(table)
      // aux headers are fully eliminated whenever a real named column exists
      // to absorb them; an all-aux table may keep its final un-mergeable
      // column (reference falls through without a drop in that case)
      if (table.head.exists(h => h != null && h.trim.nonEmpty && !h.matches("^Col\\d+.*")))
        assert(out.head.forall(h => h == null || !h.matches("^Col\\d+.*")))
      // every surviving named column's non-blank input cells survive unchanged —
      // EXCEPT the combine_first target of the first-aux-column pass, which
      // the reference lets the source column overwrite (preprocess_table.py:106)
      def isAux(h: String) = h == null || h.isEmpty || h.matches("^Col\\d+.*")
      val combineTarget: Option[String] = {
        val aux = table.head.filter(h => isAux(h) || h.trim.isEmpty)
        aux.headOption.flatMap { first =>
          val fi = table.head.indexWhere(h => (h == null && first == null) || h == first)
          val hasContent = table.tail.exists(r => r(fi) != null && r(fi).trim.nonEmpty)
          if (hasContent) table.head.find(h => !isAux(h) && h.trim.nonEmpty) else None
        }
      }
      val namedIdx = table.head.zipWithIndex.filter { case (h, _) =>
        h != null && h.nonEmpty && !h.matches("^Col\\d+.*") && !combineTarget.contains(h)
      }
      namedIdx.foreach { case (h, i) =>
        val outIdx = out.head.indexOf(h)
        if (outIdx >= 0) {
          val inCells = table.tail.map(r => r(i)).filter(c => c != null && c.trim.nonEmpty)
          val outCells = out.tail.map(r => r(outIdx)).toSet
          inCells.foreach(c => assert(outCells.contains(c)))
        }
      }
    }
  }
}

class TaxonomySpec extends AnyFunSuite {
  test("cleanCriterion strips numbering (step_5_pivot_table.py:12-24)") {
    assert(CriterionTaxonomy.cleanCriterion("1. Strategic Relevance") == "Strategic Relevance")
    assert(CriterionTaxonomy.cleanCriterion("2.1 Effectiveness") == "Effectiveness")
    assert(CriterionTaxonomy.cleanCriterion("3.2. Efficiency") == "Efficiency")
    assert(CriterionTaxonomy.cleanCriterion("  spaced   out  ") == "spaced out")
    assert(CriterionTaxonomy.cleanCriterion(null) == "")
  }
  test("matchL1 classifies exact and fuzzy criteria") {
    assert(CriterionTaxonomy.matchL1("Strategic Relevance") == "Strategic Relevance")
    assert(CriterionTaxonomy.matchL1("1. Strategic Relevance") == "Strategic Relevance")
    assert(CriterionTaxonomy.matchL1("Effectivness") == "Effectiveness") // typo
    assert(CriterionTaxonomy.matchL1("Sustainability and replication") == "Sustainability")
    assert(CriterionTaxonomy.matchL1("Monitoring and Reporting") == "Monitoring and Reporting")
    assert(CriterionTaxonomy.matchL1(null) == null)
    assert(CriterionTaxonomy.matchL1("") == null)
    assert(CriterionTaxonomy.matchL1("Zebra quantum flux") == null)
  }
}

class MonthFinderSpec extends AnyFunSuite {
  test("full month forms (step_6_update_publish_month.py:25-35)") {
    assert(MonthFinder.findMonth("Published in December 2024 by UNEP") == "December 2024")
    assert(MonthFinder.findMonth("March, 2021") == "March, 2021")
    assert(MonthFinder.findMonth("no month here 1234") == null)
  }
  test("month-list order beats text position") {
    // February appears FIRST in the text but January wins (loop order)
    assert(MonthFinder.findMonth("February 2019 then January 2020") == "January 2020")
  }
  test("abbreviations expand but keep punctuation (step_6:47 replace quirk)") {
    assert(MonthFinder.findMonth("Dec. 2024") == "December. 2024")
    assert(MonthFinder.findMonth("Oct, 2018") == "October, 2018")
    assert(MonthFinder.findMonth("Sept. 2024") == null) // 't' breaks the abbr pattern
  }
}

class ColumnNormalizerSpec extends AnyFunSuite {
  test("normalize (step_4_dump_tables.py:19-31)") {
    assert(ColumnNormalizer.normalize("Rating (achievement)") == "Rating")
    assert(ColumnNormalizer.normalize("rating") == "Rating")
    assert(ColumnNormalizer.normalize("Summary  Assessment") == "SummaryAssessment")
    assert(ColumnNormalizer.normalize("s ummary\nassessment") == "SummaryAssessment")
    assert(ColumnNormalizer.normalize("Criterion") == "Criterion")
    assert(ColumnNormalizer.normalize("criterion") == "Criterion")
    assert(ColumnNormalizer.normalize("Something Else") == "Something Else")
    // similarity 0.7727 < 0.8 -> NOT normalized (reference behavior)
    assert(ColumnNormalizer.normalize("summary assessment/comments")
      == "summary assessment/comments")
  }
}

class MergerSpec extends AnyFunSuite {
  test("merge picks the longest page run and concatenates in order") {
    def t(page: Int, rows: String*) : (Int, Vector[Vector[String]]) =
      (page, Vector(Vector("criterion", "rating")) ++ rows.map(r => Vector(r, "S")))
    // pages 3, 10, 11, 12, 20 -> run [10,11,12]
    val merged = TableMerger.merge(Seq(
      t(3, "early"), t(10, "a"), t(11, "b"), t(12, "c"), t(20, "late")))
    assert(merged.startPage == 10 && merged.endPage == 12)
    assert(merged.mergedTablesCount == 3)
    assert(merged.data.head == Vector("criterion", "rating"))
    assert(merged.data.tail.map(_.head) == Vector("a", "b", "c"))
    assert(merged.mergedRowsCount == 4) // includes the header row
  }
  test("no consecutive run -> last table only (find_longest_subsequence semantics)") {
    def t(page: Int, v: String) = (page, Vector(Vector("criterion"), Vector(v)))
    val merged = TableMerger.merge(Seq(t(5, "x"), t(9, "y")))
    assert(merged.startPage == 9 && merged.endPage == 9)
    assert(merged.data.tail == Vector(Vector("y")))
  }
  test("fragments with differing columns union by name, missing -> null (pandas NaN)") {
    val a = (4, Vector(Vector("criterion", "rating"), Vector("x", "S")))
    val b = (5, Vector(Vector("criterion", "summary assessment"), Vector("y", "text")))
    val merged = TableMerger.merge(Seq(a, b))
    assert(merged.data.head == Vector("criterion", "rating", "summary assessment"))
    assert(merged.data(1) == Vector("x", "S", null))
    assert(merged.data(2) == Vector("y", null, "text"))
  }
}

class BoldDetectorSpec extends AnyFunSuite {
  test("font attribute predicate (parse_table.py:146-165)") {
    assert(BoldDetector.isBoldFont("Arial-Bold", 0, 0))
    assert(BoldDetector.isBoldFont("HelveticaBd", 0, 0))
    assert(BoldDetector.isBoldFont("Arial", 16, 0))
    assert(BoldDetector.isBoldFont("Arial", 0, 700))
    assert(!BoldDetector.isBoldFont("Arial", 0, 400))
  }
  test("span-grammar inline emphasis") {
    assert(BoldDetector.isBoldMarked("**Strategic Relevance**"))
    assert(BoldDetector.stripBold("**x**") == "x")
    assert(BoldDetector.stripBold("plain") == "plain")
    assert(!BoldDetector.isBoldMarked("**"))
  }
}
