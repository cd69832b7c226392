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

  test("bpeTokenProfile: symbol counts reflect the learned merges") {
    // merges (from the first spec's corpus): ab, abab, cd
    // "abab" -> 1 symbol, "ab" -> 1, "cd" -> 1 after 3 merges
    val docs = Seq(
      (1L, "abab abab abab ab ab cd"),
      (2L, "abab xy")).toDF("doc_id", "text")
    val got = Bpe.bpeTokenProfile(docs, nMerges = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // doc 1: 6 tokens, 18 chars; abab x3 -> 1 sym each? merges learned on
    // THIS corpus: (a,b) cnt 10, then (ab,ab) cnt 4, then (c,d) 1 — so
    // abab=1 sym, ab=1, cd=1 -> 6 bpe tokens, 18 chars -> 3.0 chars/tok
    assert(got(0) == ((1L, 6L, 18L, 6L, 3000000L)))
    // doc 2: abab -> 1 sym; xy stays 2 chars -> x,y unmerged = 2 syms
    assert(got(1) == ((2L, 2L, 6L, 3L, 2000000L)))
  }

  test("marker-bearing tokens are excluded from learning and counting") {
    val docs = Seq((1L, "ab ab junk cd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "b", "ab", 2L))) // junk never counted
    val prof = Bpe.bpeTokenProfile(docs, nMerges = 1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 3 clean tokens (ab, ab, cd), 6 chars, bpe syms 1+1+2 = 4
    assert(prof == ((1L, 3L, 6L, 4L, 1500000L)))
  }

  test("corpus exhaustion fails loudly instead of emitting short results") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(docs, nMerges = 5).collect()
    }
  }
}
