package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two populations the seed rule separates hard: long low-punct prose
  // (quality_bp >= 7000) vs short punct-dense fragments. Each carries a
  // class-exclusive marker token so the model's direction is checkable.
  private lazy val docs = {
    // 100+ tokens, no stopwords, no punctuation: lenTerm ~2525 + stopTerm
    // 3000 + punctTerm 2000 > 7000 — firmly in the hi class
    val hi = (0L until 8L).map(i =>
      (i, ("signal " * 100) + s"quality prose without noise $i", "en", "srcA",
        0L))
    val lo = (8L until 16L).map(i =>
      (i, s"junk!! spam;; $i ??", "en", "srcB", 0L))
    (hi ++ lo).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("seed label matches the rule-based quality threshold exactly") {
    val seeded = Classifier.seedLabeled(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("hi")).toMap
    val rule = TextAnalysis.profile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("quality_bp") >= Classifier.DefaultSeedThreshBp)).toMap
    assert(seeded == rule)
    assert(seeded.values.count(identity) == 8)
  }

  test("model direction: class-exclusive tokens get ratios on opposite sides of 1.0") {
    val model = Classifier.trainTokenLr(Classifier.seedLabeled(docs))
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("lr_micro")).toMap
    assert(model("signal") > 1000000L, s"hi-only token: ${model("signal")}")
    assert(model("junk!!") < 1000000L, s"lo-only token: ${model("junk!!")}")
  }

  test("scoring recovers the seed classes; empty doc survives with zero tokens") {
    val withEmpty = docs.union(Seq((99L, "", "en", "srcC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Classifier.nbQuality(withEmpty).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 17)
    (0L until 8L).foreach(i => assert(out(i).getAs[Int]("pred_hi") == 1, s"doc $i"))
    (8L until 16L).foreach(i => assert(out(i).getAs[Int]("pred_hi") == 0, s"doc $i"))
    assert(out(99L).getAs[Long]("n_scored_tokens") == 0L)
    assert(out(99L).getAs[Int]("pred_hi") == 0)
    assert(out(99L).getAs[Long]("avg_lr_micro") == 0L)
  }

  test("classifier output is partitioning-invariant") {
    val a = Classifier.nbQuality(docs).collect()
      .map(_.toSeq).toSet
    val b = Classifier.nbQuality(docs.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }

  // DSIR: target docs are built on bigram "alpha beta"; raw doc 100
  // mimics the target distribution, raw doc 101 does not.
  private lazy val dsirDocs = {
    val target = (0L until 6L).map(i =>
      (i, "alpha beta alpha beta alpha beta", "en", "tgt", 0L))
    val likeTarget = Seq(
      (100L, "alpha beta alpha beta gamma", "en", "raw", 0L))
    val unlikeTarget = Seq(
      (101L, "delta epsilon zeta eta theta", "en", "raw", 0L),
      (102L, "x", "en", "raw", 0L)) // <2 tokens: no features, never selected
    (target ++ likeTarget ++ unlikeTarget)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("dsirSelect ranks target-like raw docs first and excludes target + featureless docs") {
    val got = Classifier.dsirSelect(dsirDocs, isTarget = col("source") === "tgt",
      topN = 10).collect()
    val ids = got.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == Seq(100L, 101L), s"selection order: $ids")
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_w_micro")).toMap
    assert(byId(100L) > byId(101L),
      s"target-like doc must outweigh unlike doc: $byId")
  }

  test("dsirSelect weight is partitioning-invariant (hash buckets, no rand)") {
    val t = col("source") === "tgt"
    val a = Classifier.dsirSelect(dsirDocs, t, topN = 10).collect().map(_.toSeq).toSeq
    val b = Classifier.dsirSelect(dsirDocs.repartition(5), t, topN = 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("dsirSelect rejects a non-power-of-two bucket count (oracle mod-2^64 contract)") {
    val e = intercept[IllegalArgumentException] {
      Classifier.dsirSelect(dsirDocs, col("source") === "tgt", nBuckets = 100)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
