package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark

/** The spark-submit entrypoint end to end: fresh run commits everything,
  * re-run is a no-op, a GROWN input table is consumed incrementally, and
  * the committed output carries the snapshot log. */
class ExtractMainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fresh run -> full commit; re-run -> no-op; grown input -> delta only") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-emain").toString
    val input = s"$base/in"
    val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs.take(10)).write.parquet(input)

    val (c1, t1) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(c1 == 10 && t1 == 10)
    // idempotent: nothing pending on re-launch
    val (c2, t2) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(c2 == 0 && t2 == 10)

    // the input table GROWS (a new crawl lands 6 more docs): only the
    // delta is processed, and it arrives as its own snapshot
    spark.createDataset(docs.drop(10)).write.mode("append").parquet(input)
    val (c3, t3) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(c3 == 6 && t3 == 16)
    val snaps = graft.pipeline.Checkpointing.snapshots(s"$out/stats")
    assert(snaps.map(_.rows) == Seq(10, 6))
    val delta = graft.pipeline.Checkpointing
      .changesBetween(spark, s"$out/stats", 1, 2)
      .select("doc_id").as[String].collect().toSet
    assert(delta == docs.drop(10).map(_.doc_id).toSet)

    // output spans match the straight-through batch pipeline (salted ==
    // unsalted, committed across two runs == one run)
    val got = spark.read.parquet(s"$out/spans")
      .as[(String, Int, String, String, String)].collect().sorted.toSeq
    val want = graft.pipeline.ExtractionPipeline
      .run(spark, spark.createDataset(docs), persistIntermediate = false)
      .outSpans.map(o => (o.doc_id, o.ord, o.kind, o.text, o.media_ref))
      .collect().sorted.toSeq
    assert(got == want && want.nonEmpty)

    // maintenance cycle on the same committed table: takedown -> the doc
    // is gone at scan time; compact -> tombstone materialized, files
    // bounded; a re-launch after the takedown re-extracts the doc (it is
    // back in the committed set afterwards — documented resumeFilter
    // semantics; for a permanent takedown remove it from the input too)
    ExtractMain.maintain(spark, out, Array("delete", docs.head.doc_id))
    val statsDir = s"$out/stats"
    def latest() = {
      val s = graft.pipeline.Checkpointing.snapshots(statsDir)
      graft.pipeline.Checkpointing.readAt(spark, statsDir, s.last.seq)
    }
    assert(latest().count() == 15)
    ExtractMain.maintain(spark, out, Array("compact", "1"))
    assert(latest().count() == 15)
    assert(!new java.io.File(s"${statsDir}_deletes").exists())
    val (c4, t4) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(c4 == 1 && t4 == 16)
    assert(ExtractMain.maintain(spark, out, Array("vacuum")) == ())
    intercept[IllegalArgumentException](
      ExtractMain.maintain(spark, out, Array("defrag")))
  }
}
