package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, TextAnalysis}
import graft.pipeline.TestSpark

class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // quality's length term needs ~70+ tokens to clear 6000 bp, so gate
  // survivors are built programmatically: distinct filler + en markers.
  // Docs 1 and 2 are a dup pair; 3 fails repetition; 4 fails lang-id.
  private def longEn(salt: Int): String =
    ((1 to 60).map(i => s"w$salt$i") ++
      Seq("the", "a", "of", "and", "to", "in", "is", "table", "fast"))
      .mkString(" ")
  private def corpus = Seq(
    (1L, longEn(1)),
    (2L, longEn(1)),
    (3L, Seq.fill(80)("spam").mkString(" ")),
    (4L, Seq.fill(16)("el la de que los").mkString(" ")),
    (5L, longEn(5)))
    .toDF("doc_id", "text")

  test("gateKeep equals the composed batch gate predicates") {
    val viaGate = Curation.gateKeep(corpus)
      .filter(col("curation_keep")).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val prof = TextAnalysis.profile(corpus)
      .filter(col("lang_pred") === "en" && col("quality_bp") >= 6000)
      .select("doc_id")
    val rep = Curation.repetitionProfile(corpus)
      .filter(col("keep")).select("doc_id")
    val viaBatch = prof.join(rep, "doc_id").as[Long].collect().sorted.toSeq
    assert(viaGate == viaBatch && viaGate.nonEmpty)
  }

  test("streaming curated dedup equals the batch formulation across batches") {
    val got = StreamCuration.replayCuratedDupGroups(spark,
        corpus.as[DocDedup.Doc])
      .as[(String, Long, Long)].collect().sorted.toSeq
    val want = Dedup.exactGroups(
        Curation.gateKeep(corpus).filter(col("curation_keep")))
      .select("fp", "n_docs", "keeper_doc_id")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
    // the dup pair must have merged across the batch split
    assert(want.exists(_._2 == 2L))
  }

  test("streaming token-budget mix: state carries the running total " +
      "across the batch split; equals batch exactly") {
    import graft.streaming.StreamCuration.MixDoc
    // stratum a: budget crossed only by a doc in BATCH 2 (ids 1..4 split
    // 2/2) — the keep decision for id 3 depends on batch-1 state
    val docs = Seq(MixDoc(1L, "a", 30L), MixDoc(2L, "a", 30L),
      MixDoc(3L, "a", 50L), MixDoc(4L, "a", 1L),
      MixDoc(5L, "b", 999L))
    val got = StreamCuration.replayTokenBudgetMix(spark, docs,
        budgets = Map("a" -> 100L), defaultBudget = 10L)
      .as[(Long, String, Long, Long)].collect().toSet
    // a: cum_before 0,30,60,110 -> ids 1-3 kept (3 crosses the floor), 4 out
    // b: first doc crosses alone -> kept
    assert(got == Set((1L, "a", 30L, 0L), (2L, "a", 30L, 30L),
      (3L, "a", 50L, 60L), (5L, "b", 999L, 0L)))
    val want = graft.ops.Curation.tokenBudgetMix(
        docs.toDF(), "source", "doc_id", "n_tokens",
        budgets = Map("a" -> 100L), defaultBudget = 10L)
      .select("doc_id", "source", "n_tokens", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == want)
  }
}
