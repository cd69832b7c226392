package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized exercise of the snapshot machinery: a seeded
  * sequence of commit / compact / vacuum / orphan-plant operations runs
  * against both the real Checkpointing table and a trivial in-memory
  * model (a list of committed batches). After every step the real table
  * must agree with the model on: latest content, every live version's
  * content, incremental deltas, and expiry/refusal behavior. This is the
  * adversarial companion to ResumeSpec's scripted scenarios.
  */
class SnapshotModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def commitBatch(dir: String, ids: Seq[Long], run: String): Unit = {
    val df = ids.toDF("doc_ord")
      .selectExpr("CAST(doc_ord AS STRING) AS doc_id", "doc_ord")
      .coalesce(1)
    Checkpointing.commit(df, dir, run)
    ()
  }

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_ord").as[Long].collect().toSet

  test("random commit/compact/vacuum sequences agree with the in-memory model") {
    spark.sparkContext.setLogLevel("WARN")
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-snapmodel$seed").toString + "/t"
      // model: batches(i) = ids committed by snapshot seq i+1;
      // rebaseAt = seq of the latest full snapshot (0 = none)
      var batches = Vector.empty[Set[Long]]
      var rebaseAt = 0
      // compact deletes pre-rebase files immediately; upsert leaves them
      // until a vacuum — so "is rebaseAt-1 expired?" depends on which
      var rebaseKind = ""
      var vacuumedSinceRebase = false
      var nextId = 0L

      commitBatch(dir, 0L to 2L, "seed") // non-empty start
      batches :+= (0L to 2L).toSet
      nextId = 3

      for (step <- 1 to 7) {
        rnd.nextInt(5) match {
          case 0 | 1 => // commit a fresh batch
            val n = 1 + rnd.nextInt(4)
            val ids = (nextId until nextId + n)
            nextId += n
            commitBatch(dir, ids, s"s$seed-r$step")
            batches :+= ids.toSet
          case 2 => // compact: content unchanged, history rebased
            Checkpointing.compact(spark, dir, partitions = 1, s"s$seed-c$step")
            batches :+= Set.empty // the rebase snapshot adds no NEW ids
            rebaseAt = batches.length
            rebaseKind = "compact"
            vacuumedSinceRebase = false
          case 3 => // upsert: replace a committed id + add a fresh one
            val existing = batches.flatten.toSet.min
            val fresh = nextId
            nextId += 1
            val df = Seq(existing, fresh).toDF("doc_ord")
              .selectExpr("CAST(doc_ord AS STRING) AS doc_id", "doc_ord")
              .coalesce(1)
            Checkpointing.upsert(df, dir, s"s$seed-u$step")
            // id-set model: a full rebase whose only NEW ids are the fresh
            // ones (replaced ids were already in the union)
            batches :+= Set(fresh)
            rebaseAt = batches.length
            rebaseKind = "upsert"
            vacuumedSinceRebase = false
          case 4 => // crash debris, then vacuum it away
            val orphan = new java.io.File(dir, s"part-orphan-$step.snappy.parquet")
            java.nio.file.Files.write(orphan.toPath, Array[Byte](9, 9))
            val removed = Checkpointing.vacuum(dir)
            assert(removed.contains(orphan.getName) && !orphan.exists())
            vacuumedSinceRebase = true
        }

        // invariant 1: latest version = union of every committed batch
        val snaps = Checkpointing.snapshots(dir)
        assert(snaps.length == batches.length, s"seed=$seed step=$step")
        val all = batches.flatten.toSet
        assert(idsOf(Checkpointing.readAt(spark, dir, snaps.last.seq)) == all)

        // invariant 2: every LIVE version v = union of batches 1..v
        val firstLive = math.max(rebaseAt, 1)
        for (v <- firstLive to batches.length) {
          val want = batches.take(v).flatten.toSet
          assert(idsOf(Checkpointing.readAt(spark, dir, v)) == want,
            s"seed=$seed step=$step version=$v")
        }
        // history below the rebase: compact (or a vacuum after an upsert)
        // expires it — readAt refuses; an un-vacuumed upsert preserves it
        if (rebaseAt > 1) {
          if (rebaseKind == "compact" || vacuumedSinceRebase)
            intercept[IllegalArgumentException](
              Checkpointing.readAt(spark, dir, rebaseAt - 1))
          else
            assert(idsOf(Checkpointing.readAt(spark, dir, rebaseAt - 1))
              == batches.take(rebaseAt - 1).flatten.toSet,
              s"seed=$seed step=$step pre-upsert history")
        }

        // invariant 3: deltas reproduce the batches when not crossing
        // the rebase
        for (v <- firstLive until batches.length) {
          val want = batches(v) // batch committed as seq v+1
          assert(idsOf(Checkpointing.changesBetween(spark, dir, v, v + 1))
            == want, s"seed=$seed step=$step delta=($v,${v + 1}]")
        }
        if (rebaseAt > 1)
          intercept[IllegalArgumentException](
            Checkpointing.changesBetween(spark, dir, rebaseAt - 2, rebaseAt))
      }
    }
  }
}
