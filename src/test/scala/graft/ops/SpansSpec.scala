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
}
