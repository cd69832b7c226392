package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.pipeline.{Checkpointing, TestSpark}

/** StreamMergeApply edges the x80 driver query can't stage: the crash-debris
  * self-heal window, empty-batch skip, and replay-idempotence under a batch
  * whose snapshot already landed. */
class StreamMergeApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def rows(ords: Seq[Int], op: String, tag: String = "v1") =
    spark.createDataset(ords.map(o => (op, s"doc-$o", o.toLong, s"$tag-$o")))
      .toDF("op", "doc_id", "doc_ord", "payload")

  private def base(dir: String): Unit = {
    Checkpointing.commit(
      rows(0 until 4, op = "ignored").drop("op"), dir, "base")
    ()
  }

  test("crash debris self-heal: an unreferenced delete set for this batch id " +
      "is removed and the retry lands") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = freshDir("smerge-heal")
    base(dir)
    // simulate an attempt that died between writing its delete set and
    // logging its snapshot: the delete set exists, no snapshot references it
    val delDir = new java.io.File(s"${dir}_deletes/apply-000")
    assert(delDir.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(delDir, "junk.parquet").toPath, Array[Byte](1))
    // the retry must self-heal and land the batch (a bare merge would
    // refuse on the existing delete-set dir)
    StreamMergeApply.applyBatch(dir)(
      rows(Seq(1), op = "upsert", tag = "fixed")
        .unionByName(rows(Seq(2), op = "delete")), 0L)
    val snaps = Checkpointing.snapshots(dir)
    assert(snaps.map(_.runId) == Seq("base", "apply-000"))
    val got = Checkpointing.readAt(spark, dir, 2)
    assert(got.count() == 3)
    assert(got.filter(col("doc_ord") === 1L)
      .select("payload").as[String].head() == "fixed-1")
    assert(got.filter(col("doc_ord") === 2L).count() == 0)
  }

  test("a delete set REFERENCED by a landed snapshot is never touched: " +
      "the replayed batch is skipped outright") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = freshDir("smerge-skip")
    base(dir)
    StreamMergeApply.applyBatch(dir)(rows(Seq(1), op = "delete"), 0L)
    val delFiles = Option(new java.io.File(s"${dir}_deletes/apply-000")
      .listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(delFiles.nonEmpty)
    // replay of the SAME batch id: no new snapshot, delete set untouched
    StreamMergeApply.applyBatch(dir)(rows(Seq(3), op = "delete"), 0L)
    assert(Checkpointing.snapshots(dir).map(_.runId) == Seq("base", "apply-000"))
    val after = Option(new java.io.File(s"${dir}_deletes/apply-000")
      .listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(after == delFiles)
    assert(Checkpointing.readAt(spark, dir, 2).count() == 3) // doc 3 intact
  }

  test("empty micro-batch lands no snapshot") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = freshDir("smerge-empty")
    base(dir)
    StreamMergeApply.applyBatch(dir)(
      rows(Seq.empty[Int], op = "upsert"), 0L)
    assert(Checkpointing.snapshots(dir).map(_.runId) == Seq("base"))
  }
}
