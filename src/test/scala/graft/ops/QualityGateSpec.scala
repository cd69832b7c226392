package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

/** Expectations (q89), bloomDedupGate (q90), FileLayout (q91). */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val clean = docsDF(
    (0L, "alpha beta", "en", "src1", 10L),
    (1L, "gamma delta epsilon", "de", "src2", 19L),
    (2L, "zeta eta", "fr", "src3", 8L))

  // ------------------------------------------------------------ q89

  test("expectations: clean table passes every check except volume floor") {
    val got = Expectations.documentsSuite(clean)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("complete_text") == (0L, true))
    assert(got("unique_doc_id") == (0L, true))
    assert(got("consistent_n_chars") == (0L, true))
    assert(got("lang_in_set") == (0L, true))
    assert(got("source_format") == (0L, true))
    assert(got("chars_in_bounds") == (0L, true))
    assert(got("min_volume") == (3L, false)) // < 100 docs
    assert(got("mean_chars_bounds") == ((10L + 19L + 8L) / 3L, false))
  }

  test("expectations: each violation dimension is counted by its own check") {
    val dirty = docsDF(
      (0L, "alpha", "en", "src1", 5L),
      (0L, "   ", "xx", "SRC!", 99L), // dup id, empty text, bad lang/source,
      //                                 n_chars != length
      (2L, "beta", "en", "src2", 4L))
    val got = Expectations.documentsSuite(dirty)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("complete_text") == (1L, false))
    assert(got("unique_doc_id") == (1L, false)) // 3 rows, 2 distinct ids
    assert(got("consistent_n_chars") == (1L, false)) // 99 != 3
    assert(got("lang_in_set") == (1L, false))
    assert(got("source_format") == (1L, false))
    assert(got("chars_in_bounds") == (0L, true))
  }

  test("expectations: the whole suite is ONE scan (single leaf in the plan)") {
    val df = Expectations.documentsSuite(clean)
    val plan = df.queryExecution.executedPlan.toString()
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n$plan")
    assert(!plan.contains("Join"), "suite must not join")
  }

  test("expectations: exact uniqueness costs a key exchange, approx does not") {
    val exact = Expectations.run(clean,
      Seq(Expectations.uniqueness("u", col("doc_id")),
        Expectations.expectNone("e", col("text").isNull)))
    val approx = Expectations.run(clean,
      Seq(Expectations.approxUniqueness("u", col("doc_id")),
        Expectations.expectNone("e", col("text").isNull)))
    // Spark 4 plans a single distinct agg as two-phase hash aggregation
    // keyed on the column: one hashpartitioning exchange beyond the scalar
    // gather. The sketch variant keeps the gather-only shape.
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString()).length
    assert(exchanges(exact) == 2,
      exact.queryExecution.executedPlan.toString())
    assert(exchanges(approx) == 1,
      approx.queryExecution.executedPlan.toString())
    val a = approx.collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(a("u") && a("e"))
  }

  test("expectations: duplicate check names and empty suites are rejected") {
    val c = Expectations.expectNone("x", col("doc_id").isNull)
    intercept[IllegalArgumentException] {
      Expectations.run(clean, Seq(c, c))
    }
    intercept[IllegalArgumentException] {
      Expectations.run(clean, Seq.empty)
    }
  }

  // ------------------------------------------------------------ q90

  private lazy val corpus = docsDF(
    (0L, "shared text one", "en", "s", 15L),
    (1L, "corpus only text", "en", "s", 16L),
    (2L, "Shared Text Two  ", "en", "s", 17L)) // normalization target

  test("bloomDedupGate equals the plain semi-join verdict") {
    val delta = docsDF(
      (10L, "shared text one", "en", "s", 15L), // exact dup
      (11L, "  sHARED tEXT tWO", "en", "s", 17L), // dup after lower+trim
      (12L, "novel text", "en", "s", 10L),
      (13L, "another novel", "en", "s", 13L))
    val got = Dedup.bloomDedupGate(corpus, delta, expectedItems = 64L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(got == Seq((10L, true), (11L, true), (12L, false), (13L, false)))
  }

  test("bloomDedupGate: no-dup delta gets all-false verdicts (empty candidates)") {
    val delta = docsDF((20L, "nothing like corpus", "en", "s", 19L))
    val got = Dedup.bloomDedupGate(corpus, delta, expectedItems = 64L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(got == Seq((20L, false)))
  }

  test("bloomDedupGate plan: map-side might_contain prefilter + broadcast semi verify") {
    // parquet-backed inputs: over a LocalRelation, ConvertToLocalRelation
    // folds the bloom probe at optimize time and nothing reaches the
    // physical plan — real sources are what the plan pin is about
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomplan")
      .toString
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    docsDF((10L, "shared text one", "en", "s", 15L),
        (12L, "novel text", "en", "s", 10L))
      .write.mode("overwrite").parquet(s"$dir/delta")
    val df = Dedup.bloomDedupGate(
      spark.read.parquet(s"$dir/corpus"),
      spark.read.parquet(s"$dir/delta"), expectedItems = 64L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"verify must be a broadcast left-semi join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "nothing corpus-sized may shuffle for the verify")
  }

  test("contentBloom validates sizing") {
    intercept[IllegalArgumentException] {
      Dedup.contentBloom(corpus, expectedItems = 0L)
    }
  }

  // ------------------------------------------------------------ q91

  test("planFiles: whole-doc assignment by start offset, contiguous ranges") {
    val docs = Seq(
      (1L, 3000L), (2L, 3000L), // file 0: offsets 0, 3000
      (3L, 2000L),              // file 1: offset 6000
      (4L, 10000L),             // file 1 too: offset 8000 (starts in file 1)
      (5L, 100L))               // offset 18000 -> file 4 (ids may skip)
      .toDF("doc_id", "bytes")
    val got = FileLayout.planFiles(docs, "doc_id", "bytes", targetBytes = 4096L)
      .orderBy("file_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 2L, 6000L, 1L, 2L),
      (1L, 2L, 12000L, 3L, 4L),
      (4L, 1L, 100L, 5L, 5L)))
    // conservation + contiguity
    assert(got.map(_._3).sum == 18100L)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 < b._4)
      case _ => ()
    }
  }

  test("planFiles is append-stable: growing the corpus never reassigns") {
    val all = (1L to 50L).map(i => (i, 500L + i)).toDF("doc_id", "bytes")
    val prefix = (1L to 30L).map(i => (i, 500L + i)).toDF("doc_id", "bytes")
    def assign(df: org.apache.spark.sql.DataFrame) =
      FileLayout.assignFiles(df, "doc_id", "bytes", targetBytes = 2000L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a = assign(all)
    assign(prefix).foreach { case (id, f) => assert(a(id) == f) }
  }

  test("planFiles rejects a non-positive target") {
    intercept[IllegalArgumentException] {
      FileLayout.planFiles(clean, "doc_id", "n_chars", targetBytes = 0L)
    }
  }
}
