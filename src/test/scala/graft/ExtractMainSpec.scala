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

    // maintenance cycle on BOTH committed tables: takedown -> the doc's
    // stats AND extracted text are gone at scan time; compact ->
    // tombstones materialized, files bounded; a re-launch after the
    // takedown re-extracts the doc exactly once (documented resumeFilter
    // semantics; for a permanent takedown remove it from the input too)
    import org.apache.spark.sql.functions.col
    val victim = docs.head.doc_id
    def latestOf(t: String) = {
      val d = s"$out/$t"
      val s = graft.pipeline.Checkpointing.snapshots(d)
      graft.pipeline.Checkpointing.readAt(spark, d, s.last.seq)
    }
    ExtractMain.maintain(spark, out, Array("delete", victim))
    assert(latestOf("stats").count() == 15)
    assert(latestOf("spans").filter(col("doc_id") === victim).count() == 0)
    ExtractMain.maintain(spark, out, Array("compact", "1"))
    assert(latestOf("stats").count() == 15)
    assert(!new java.io.File(s"$out/stats_deletes").exists())
    assert(!new java.io.File(s"$out/spans_deletes").exists())
    // re-extraction: the doc's spans come back, exactly once
    val (c4, t4) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(c4 == 1 && t4 == 16)
    val wantVictim = want.count(_._1 == victim)
    assert(wantVictim > 0)
    assert(latestOf("spans").filter(col("doc_id") === victim).count()
      == wantVictim)
    // vacuum is observable: a clean table loses nothing
    val liveStats = latestOf("stats").count()
    val liveSpans = latestOf("spans").count()
    ExtractMain.maintain(spark, out, Array("vacuum"))
    assert(latestOf("stats").count() == liveStats)
    assert(latestOf("spans").count() == liveSpans)
    intercept[IllegalArgumentException](
      ExtractMain.maintain(spark, out, Array("defrag")))
  }
}

/** The audited (write-audit-publish) launch mode. */
class ExtractMainAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("maintain expire: metadata retention reachable from the ops surface") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-emexp").toString
    val input = s"$base/in"
    val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs.take(8)).write.parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16)
    spark.createDataset(docs.slice(8, 12)).write.mode("append").parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16)
    // compact = the full rebase that makes the two deltas expirable
    ExtractMain.maintain(spark, out, Array("compact", "2"))
    ExtractMain.maintain(spark, out, Array("expire", "1"))
    val snaps = graft.pipeline.Checkpointing.snapshots(s"$out/stats")
    assert(snaps.size == 1 && snaps.head.full, snaps.toString)
    // current state intact; expired version refuses at the metadata level
    assert(graft.pipeline.Checkpointing
      .readAt(spark, s"$out/stats", snaps.head.seq).count() == 12)
    val e = intercept[IllegalArgumentException](
      graft.pipeline.Checkpointing.readAt(spark, s"$out/stats", 1))
    assert(e.getMessage.contains("expired"))
  }

  test("maintain rollback: the bad-deploy undo reachable from the ops surface") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-emrb").toString
    val input = s"$base/in"
    val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs.take(8)).write.parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16)
    spark.createDataset(docs.slice(8, 12)).write.mode("append").parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16) // v2: 12 docs
    ExtractMain.maintain(spark, out, Array("rollback", "1"))
    val stats = s"$out/stats"
    val cur = graft.pipeline.Checkpointing.snapshots(stats).last.seq
    assert(graft.pipeline.Checkpointing.readAt(spark, stats, cur).count() == 8)
    // resume semantics after the rollback: the 4 rolled-away docs are
    // uncommitted again and the next run re-lands exactly them
    val (n, total) = ExtractMain.run(spark, input, out, saltPages = 16)
    assert(n == 4 && total == 12, s"($n, $total)")
  }

  test("maintain branch ops: create, list, fast-forward from the ops surface") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-embr").toString
    val input = s"$base/in"
    val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs.take(8)).write.parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16)
    val stats = s"$out/stats"
    val v = graft.pipeline.Checkpointing.snapshots(stats).last.seq
    ExtractMain.maintain(spark, out, Array("branch", "audit", v.toString))
    assert(graft.pipeline.Checkpointing.branches(stats).contains("audit"))
    ExtractMain.maintain(spark, out, Array("branches"))
    // one audit commit per table, then the fast-forward lands both
    val frame = spark.range(1).select(
      org.apache.spark.sql.functions.lit(99990L).as("doc_ord"),
      org.apache.spark.sql.functions.lit("x99990").as("doc_id"))
    Seq(stats, s"$out/spans").foreach { dir =>
      graft.pipeline.Checkpointing.commitToBranch(frame, dir, "audit", "b1")
    }
    ExtractMain.maintain(spark, out, Array("fast-forward", "audit"))
    assert(graft.pipeline.Checkpointing.branches(stats).isEmpty)
    assert(graft.pipeline.Checkpointing.snapshots(stats).last.seq == v + 1)
    // drop-branch on a missing branch fails loudly
    intercept[IllegalArgumentException](
      ExtractMain.maintain(spark, out, Array("drop-branch", "audit")))
  }

  test("audited run: staged, audited, published — same result as plain; " +
      "re-run no-op") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-eaudit").toString
    val input = s"$base/in"; val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs).write.parquet(input)

    val (c1, t1) = ExtractMain.run(spark, input, out, saltPages = 16,
      audit = true)
    assert(c1 == docs.size && t1 == docs.size)
    // both tables published under the same runId, nothing left staged
    for (t <- Seq("stats", "spans")) {
      assert(graft.pipeline.Checkpointing.staged(s"$out/$t").isEmpty)
      assert(graft.pipeline.Checkpointing.snapshots(s"$out/$t").size == 1)
    }
    // published spans equal the plain pipeline's
    val got = spark.read.parquet(s"$out/spans")
      .as[(String, Int, String, String, String)].collect().sorted.toSeq
    val want = graft.pipeline.ExtractionPipeline
      .run(spark, spark.createDataset(docs), persistIntermediate = false)
      .outSpans.map(o => (o.doc_id, o.ord, o.kind, o.text, o.media_ref))
      .collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
    // audited re-run: nothing pending, no new snapshots
    val (c2, t2) = ExtractMain.run(spark, input, out, saltPages = 16,
      audit = true)
    assert(c2 == 0 && t2 == docs.size)
    assert(graft.pipeline.Checkpointing.snapshots(s"$out/stats").size == 1)
  }

  test("failed audit abandons both tables: nothing committed, no debris") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-eaudit2").toString
    val input = s"$base/in"; val out = s"$base/out"
    val docs = graft.layout.FixtureCorpus.fixtureDocs
    spark.createDataset(docs.take(4)).write.parquet(input)
    ExtractMain.run(spark, input, out, saltPages = 16, audit = true)
    // poison the committed set so the next batch COLLIDES: delete the
    // snapshot-truth of doc 1 via a raw re-stage of already-committed docs
    // (simulates a resume filter bypassed by an operator error)
    val statsDir = s"$out/stats"
    val redo = graft.pipeline.Checkpointing.readAt(spark, statsDir, 1)
    graft.pipeline.Checkpointing.stage(redo, statsDir, "collide")
    val audited = graft.pipeline.Checkpointing
      .readStaged(spark, statsDir, "collide")
    assert(audited.groupBy("doc_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 4)
    graft.pipeline.Checkpointing.abandon(statsDir, "collide")
    assert(graft.pipeline.Checkpointing.vacuum(statsDir).isEmpty)
    assert(graft.pipeline.Checkpointing.readAt(spark, statsDir, 1).count() == 4)
  }

  test("bench probe: count mode commits nothing, sink mode one table per rep") {
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-ebench").toString
    val input = s"$base/in"
    spark.createDataset(graft.layout.FixtureCorpus.fixtureDocs.take(6))
      .write.parquet(input)
    ExtractMain.bench(spark, input, saltPages = 16, reps = 2)
    assert(!new java.io.File(s"$base/out").exists())
    ExtractMain.bench(spark, input, saltPages = 16, reps = 2,
      sinkDir = Some(s"$base/out"))
    (1 to 2).foreach { rep =>
      assert(graft.pipeline.Checkpointing
        .snapshots(s"$base/out/rep$rep/spans").size == 1)
      assert(spark.read.parquet(s"$base/out/rep$rep/stats").count() == 6)
    }
  }
}
