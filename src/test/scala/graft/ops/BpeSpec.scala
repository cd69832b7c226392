package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BPE learns merges in frequency order with deterministic ties") {
    // words: "abab" x3, "ab" x2, "cd" x1  (as docs)
    // pair counts r1: (a,b)=8 [2 per abab x3 + 1 per ab x2], (b,a)=3, (c,d)=1
    // merge 1: a+b -> ab. r2 pairs: (ab,ab)=3, (c,d)=1 -> merge 2: abab
    // r3: only (c,d)=1 -> merge 3: cd
    val docs = Seq((1L, "abab abab abab ab ab cd")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, nMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "c", "d", "cd", 1L)))
  }

  test("greedy left-to-right application: overlapping pair merges correctly") {
    // "aaa" x2: pairs (a,a)=4 -> merge a+a. Greedy on "aaa" leaves [aa, a],
    // so round 2 sees (aa,a)=2 — NOT (a,aa)
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, nMerges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "aa", "a", "aaa", 2L)))
  }

  test("corpus exhaustion fails loudly instead of emitting short results") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(docs, nMerges = 5).collect()
    }
  }
}
