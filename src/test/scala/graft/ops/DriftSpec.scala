package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("novelty: a token is novel only in its min batch") {
    // batches (doc_id % 2): b0 = {0, 2}, b1 = {1}
    val docs = Seq(
      (0L, "alpha beta"),       // b0: alpha beta novel
      (2L, "alpha gamma"),      // b0: gamma novel (alpha repeat, same batch)
      (1L, "beta delta")        // b1: delta novel, beta seen in b0
    ).toDF("doc_id", "text")
    val got = Drift.vocabDrift(docs, nBatches = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // b0: 2 docs, 4 tokens, vocab {alpha,beta,gamma}, all 3 novel
      (0L, 2L, 4L, 2000000L, 3L, 3L, 1000000L),
      // b1: 1 doc, 2 tokens, vocab {beta,delta}, only delta novel
      (1L, 1L, 2L, 2000000L, 2L, 1L, 500000L)))
  }

  test("case folding and whitespace runs match the tokenizer contract") {
    val docs = Seq((0L, "  Foo  foo "), (1L, "FOO bar")).toDF("doc_id", "text")
    val got = Drift.vocabDrift(docs, nBatches = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // foo counted once per batch; b1's foo is NOT novel
    assert(got == Seq(
      (0L, 1L, 2L, 2000000L, 1L, 1L, 1000000L),
      (1L, 1L, 2L, 2000000L, 2L, 1L, 500000L)))
  }

  test("single batch: everything is novel, rate is exactly 1.0") {
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val got = Drift.vocabDrift(docs, nBatches = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((0L, 2L, 4L, 2000000L, 3L, 3L, 1000000L)))
  }

  test("nBatches must be positive") {
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Drift.vocabDrift(docs, nBatches = 0)
    }
  }
}
