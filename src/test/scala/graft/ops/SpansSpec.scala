package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark

class SpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scrubTextSpans rewrites only text spans; structure is invariant") {
    val spans = Seq(
      ("d0", 0, "page", "1", null),
      ("d0", 1, "text", "mail user1@example.com at 10.0.0.1", null),
      // a media span whose text LOOKS like PII must pass through untouched
      ("d0", 2, "media", "alt: admin@example.com", "m1"),
      ("d0", 3, "rule", "+---+", null),
      ("d0", 4, "text", "no pii here", null)
    ).toDF("doc_id", "ord", "kind", "text", "media_ref")
    val got = Spans.scrubTextSpans(spans)
      .as[(String, Int, String, String, String, Long)]
      .collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("d0", 0, "page", "1", null, 0L),
      ("d0", 1, "text", "mail <EMAIL> at <IP>", null, 2L),
      ("d0", 2, "media", "alt: admin@example.com", "m1", 0L),
      ("d0", 3, "rule", "+---+", null, 0L),
      ("d0", 4, "text", "no pii here", null, 0L)))
  }

  test("captionAlignment: same-page preceding text within maxGap only") {
    val spans = Seq(
      ("d0", 0, "page", "1", null),
      ("d0", 1, "text", "Figure one shows results", null),
      ("d0", 2, "media", "", "m1"),          // captioned by ord 1
      ("d0", 3, "rule", "+--+", null),
      ("d0", 4, "text", "   ", null),        // blank text: not a caption
      ("d0", 5, "media", "", "m2"),          // gap to ord 1 is 4 > 3: none
      ("d0", 6, "page", "2", null),
      ("d0", 7, "media", "", "m3")           // nearest text is page 1: none
    ).toDF("doc_id", "ord", "kind", "text", "media_ref")
    val got = Spans.captionAlignment(spans, maxGap = 3)
      .select("ord", "media_ref", "page", "caption_ord", "caption_tokens",
        "has_caption")
      .as[(Int, String, Long, Option[Int], Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (2, "m1", 1L, Some(1), Some(4L), true),
      (5, "m2", 1L, None, None, false),
      (7, "m3", 2L, None, None, false)))
  }

  test("captionAlignment: media before any text has no caption") {
    val spans = Seq(
      ("d0", 0, "media", "", "m0"),
      ("d0", 1, "text", "after", null)
    ).toDF("doc_id", "ord", "kind", "text", "media_ref")
    val got = Spans.captionAlignment(spans)
      .select("ord", "has_caption").as[(Int, Boolean)].collect().toSeq
    assert(got == Seq((0, false)))
  }

  test("captionAlignment rejects maxGap < 1") {
    val spans = Seq(("d0", 0, "media", "", "m0"))
      .toDF("doc_id", "ord", "kind", "text", "media_ref")
    intercept[IllegalArgumentException] {
      Spans.captionAlignment(spans, maxGap = 0)
    }
  }

  // ---- spanDiff ------------------------------------------------------

  private def spansDf(rows: Seq[(String, Int, String, String, String)]) =
    rows.toDF("doc_id", "ord", "kind", "text", "media_ref")

  test("spanDiff: identical sequences are equal; every divergence class " +
      "reports the right first ord and field") {
    val base = spansDf(Seq(
      ("same", 0, "text", "a", null), ("same", 1, "media", "", "m1"),
      ("txt", 0, "text", "a", null), ("txt", 1, "text", "b", null),
      ("drop", 0, "text", "a", null), ("drop", 1, "text", "b", null),
      ("add", 0, "text", "a", null),
      ("kind", 0, "text", "a", null),
      ("ref", 0, "media", "", "m1"),
      ("gone", 0, "text", "a", null)))
    val cand = spansDf(Seq(
      ("same", 0, "text", "a", null), ("same", 1, "media", "", "m1"),
      ("txt", 0, "text", "a", null), ("txt", 1, "text", "CHANGED", null),
      ("drop", 0, "text", "a", null),
      ("add", 0, "text", "a", null), ("add", 1, "text", "new", null),
      ("kind", 0, "media", "a", null),
      ("ref", 0, "media", "", "m2"),
      ("born", 0, "text", "a", null)))
    val got = Spans.spanDiff(base, cand).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.getString(3)).orNull, r.getLong(4), r.getLong(5)))).toMap
    assert(got("same") == ((true, None, null, 2L, 2L)))
    assert(got("txt") == ((false, Some(1), "text", 2L, 2L)))
    assert(got("drop") == ((false, Some(1), "missing", 2L, 1L)))
    assert(got("add") == ((false, Some(1), "extra", 1L, 2L)))
    assert(got("kind") == ((false, Some(0), "kind", 1L, 1L)))
    assert(got("ref") == ((false, Some(0), "media_ref", 1L, 1L)))
    // whole-doc presence degenerates through the same machinery
    assert(got("gone") == ((false, Some(0), "missing", 1L, 0L)))
    assert(got("born") == ((false, Some(0), "extra", 0L, 1L)))
  }

  test("spanDiff: kind outranks media_ref outranks text at the same ord; " +
      "null text and empty text are DISTINCT") {
    val base = spansDf(Seq(
      ("p", 0, "text", "a", "m1"),
      ("n", 0, "media", null, "m1")))
    val cand = spansDf(Seq(
      ("p", 0, "media", "b", "m2"), // kind+ref+text all differ -> 'kind'
      ("n", 0, "media", "", "m1"))) // null -> "" must be a text diff
    val got = Spans.spanDiff(base, cand).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got("p") == "kind")
    assert(got("n") == "text")
  }

  test("spanDiff plan: span text never enters an exchange — both sides " +
      "project md5 before the full-outer join") {
    val base = spansDf(Seq(("d", 0, "text", "some long text", null)))
    val df = Spans.spanDiff(base, base)
    df.collect()
    // walk through AQE wrappers (query stages hide the exchanges)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match { case _: ShuffleExchangeLike => Seq(p); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      self ++ kids.flatMap(walk)
    }
    val outs = walk(df.queryExecution.executedPlan)
      .flatMap(_.output.map(a => (a.name, a.dataType)))
    assert(outs.nonEmpty) // the co-partitioned join does shuffle...
    assert(!outs.exists(o => o._1.toLowerCase == "text" ||
      o._2.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
      s"spanDiff shuffles text/arrays: $outs") // ...but only md5s + scalars
  }

  test("spanDiff: the first divergent ord wins even when later spans " +
      "also differ; equal under any partitioning") {
    val base = spansDf(Seq.tabulate(6)(i => ("d", i, "text", s"s$i", null)))
    val cand = spansDf(Seq.tabulate(6)(i =>
      ("d", i, "text", if (i >= 3) "X" else s"s$i", null)))
    val one = Spans.spanDiff(base, cand).collect().head
    assert(one.getInt(2) == 3 && one.getString(3) == "text")
    val eq = Spans.spanDiff(base.repartition(7), base.repartition(3))
      .collect().head
    assert(eq.getBoolean(1))
  }

  test("coalesceTextRuns: runs merge in order, boundaries stay " +
      "singletons, dense re-numbering, null text joins as empty") {
    val spans = spansDf(Seq(
      ("d", 0, "text", "a", null), ("d", 1, "text", "b", null),
      ("d", 2, "media", "alt", "m1"), ("d", 3, "media", "alt2", "m2"),
      ("d", 4, "text", "c", null), ("d", 5, "text", null, null),
      ("d", 6, "text", "d", null), ("d", 7, "page", "2", null),
      ("solo", 0, "media", "x", "m9")))
    val got = Spans.coalesceTextRuns(spans)
      .as[(String, Int, String, String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("d", 0, "text", "a b", null, 2L),
      ("d", 1, "media", "alt", "m1", 1L),
      ("d", 2, "media", "alt2", "m2", 1L),
      ("d", 3, "text", "c  d", null, 3L), // null text -> empty, still counted
      ("d", 4, "page", "2", null, 1L),
      ("solo", 0, "media", "x", "m9", 1L)))
  }

  test("coalesceTextRuns: partitioning-invariant and idempotent on an " +
      "already-coalesced sequence") {
    val spans = spansDf(Seq(
      ("d", 0, "text", "a", null), ("d", 1, "text", "b", null),
      ("d", 2, "media", "m", "m1"), ("d", 3, "text", "c", null)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Spans.coalesceTextRuns(df)
        .as[(String, Int, String, String, String, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(spans) == run(spans.repartition(7)))
    val once = run(spans)
    val again = run(once.map(r => (r._1, r._2, r._3, r._4, r._5))
      .toDF("doc_id", "ord", "kind", "text", "media_ref"))
    assert(again.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      once.map(r => (r._1, r._2, r._3, r._4, r._5)))
  }
}
