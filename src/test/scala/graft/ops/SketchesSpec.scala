package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a b c"), (2L, "a b d"), (3L, "c c c e"), (4L, "a e f b"))
    .toDF("doc_id", "text")

  private def exact = docs
    .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    .groupBy("token").agg(count(lit(1)).as("exact"))
    .as[(String, Long)].collect().toMap

  test("cms one-sided error: est >= exact for every token, at a width " +
      "wide enough AND at width=2 where collisions are certain") {
    for (width <- Seq(1024, 2)) {
      val sk = Sketches.cmsBuild(docs, depth = 4, width = width)
      val probes = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .distinct()
      val est = Sketches.cmsEstimate(sk, probes, 4, width, ":cms")
        .as[(String, Long)].collect().toMap
      val ex = exact
      ex.foreach { case (t, c) =>
        assert(est(t) >= c, s"width=$width token=$t est=${est(t)} exact=$c")
      }
      // min-over-rows can never exceed the whole stream's weight
      val total = ex.values.sum
      est.values.foreach(e => assert(e <= total))
    }
  }

  test("cms merge is EXACT: per-shard sketches summed == single-pass " +
      "sketch, cell for cell") {
    val halves = Seq(0, 1).map(h =>
      Sketches.cmsBuild(docs.filter(col("doc_id") % 2 === h), 4, 64))
    val merged = Sketches.cmsMerge(halves)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val single = Sketches.cmsBuild(docs, 4, 64)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(merged == single)
  }

  test("cms is deterministic across partitionings and rejects a " +
      "non-power-of-two width") {
    def run(p: Int) = Sketches.cmsBuild(docs.repartition(p), 4, 128)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(run(1) == run(7))
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(docs, 4, 100)
    }
  }

  test("cms estimate reads absent cells as zero (a token the corpus " +
      "never saw estimates 0 when its cells are empty)") {
    // one-token corpus: only 4 occupied cells; a probe token whose cells
    // all miss must coalesce to 0, not drop out of the output
    val one = Seq((1L, "onlytoken")).toDF("doc_id", "text")
    val sk = Sketches.cmsBuild(one, 4, 1024)
    val est = Sketches.cmsEstimate(sk,
      Seq("neverseen").toDF("token"), 4, 1024, ":cms")
      .as[(String, Long)].collect().toMap
    // deterministic hashes: "neverseen" and "onlytoken" share no cell at
    // width 1024, so the left-join min must coalesce through 0
    assert(est == Map("neverseen" -> 0L))
  }

  test("log histogram: exact integer bit-length buckets, merge == full, " +
      "non-positive values excluded") {
    val vals = Seq((1L, "g", 1L), (2L, "g", 2L), (3L, "g", 3L),
      (4L, "g", 4L), (5L, "g", 1023L), (6L, "g", 1024L), (7L, "g", 0L),
      (8L, "g", -5L)).toDF("doc_id", "g", "v")
    val h = Sketches.logHistogram(vals, "g", "v")
      .as[(String, Int, Long)].collect().map(r => r._2 -> r._3).toMap
    // 1 -> b0; 2,3 -> b1; 4 -> b2; 1023 -> b9; 1024 -> b10; 0/-5 dropped
    assert(h == Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 9 -> 1L, 10 -> 1L))
    val halves = Seq(0, 1).map(k =>
      Sketches.logHistogram(vals.filter(col("doc_id") % 2 === k), "g", "v"))
    val merged = Sketches.histMerge(halves)
      .as[(String, Int, Long)].collect().sorted.toSeq
    val full = Sketches.logHistogram(vals, "g", "v")
      .as[(String, Int, Long)].collect().sorted.toSeq
    assert(merged == full)
  }

  test("hist quantiles: the true p-th value lies in the reported " +
      "[lo, hi) range; boundary percentiles hit the right buckets") {
    // 10 values: 1..8 in low buckets, two big ones at 1000
    val raw = (Seq.tabulate(8)(i => i + 1L) ++ Seq(1000L, 1000L))
    val df = raw.zipWithIndex
      .map { case (v, i) => (i.toLong, "s", v) }.toDF("doc_id", "g", "v")
    val q = Sketches.histQuantiles(
      Sketches.logHistogram(df, "g", "v"), "g", Seq(25, 50, 80, 90, 100))
      .as[(String, Int, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    def trueP(p: Int): Long = { // smallest v with rank*100 >= p*n
      val sorted = raw.sorted; sorted(((p * raw.size + 99) / 100) - 1)
    }
    for (p <- Seq(25, 50, 80, 90, 100)) {
      val (lo, hi, n) = q(p)
      assert(n == 10L)
      val tv = trueP(p)
      assert(tv >= lo && tv < hi, s"p=$p true=$tv not in [$lo,$hi)")
    }
    // p=90 crosses into the 1000-bucket (8 of 10 values <= 8): b9 [512,1024)
    assert(q(90) == ((512L, 1024L, 10L)) && q(100) == ((512L, 1024L, 10L)))
  }
}
