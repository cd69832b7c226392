package graft

import org.apache.spark.sql.SparkSession

/** The production entrypoint — the class the north rule's spark-submit
  * invocation launches (scripts/spark-submit-example.sh):
  *
  *   spark-submit --class graft.ExtractMain ... <inputDir> <outputDir> [saltPages]
  *
  * Reads an interleaved-document table (parquet in the input_hint shape:
  * doc_id + spans array<struct<kind,text,media_ref,offset>>), extracts with
  * oversized-document salting, and lands results in a COMMITTED output:
  *
  *   <out>/stats          one row per document (lineage manifests + snapshot
  *                        log beside it — resume, time travel, incremental
  *                        reads all work against this table)
  *   <out>/spans          the output span sequences (plain parquet append)
  *
  * RESUMABLE BY CONSTRUCTION: every launch anti-joins the input against the
  * committed doc_ids and processes only the remainder, so re-running after
  * a crash (or with a grown input table) does incremental work and a
  * completed run is a cheap no-op. Emits one JSON metrics line on stdout
  * (docs committed this run, total committed, snapshot count).
  */
object ExtractMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExtractMain <inputDir> <outputDir> [saltPages]\n" +
      "       ExtractMain maintain <outputDir> compact [partitions]\n" +
      "       ExtractMain maintain <outputDir> vacuum\n" +
      "       ExtractMain maintain <outputDir> delete <doc_id>[,<doc_id>...]\n" +
      "       ExtractMain maintain <outputDir> snapshots")
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      if (args(0) == "maintain") maintain(spark, args(1), args.drop(2))
      else run(spark, args(0), args(1),
        if (args.length > 2) args(2).toInt else 64)
    } finally spark.stop()
  }

  /** Table maintenance on the committed stats table — the ops half of the
    * production story (compaction cadence bounds file counts AND the
    * merge-on-read union depth; vacuum reclaims expired files; delete is
    * the takedown path). Prints one JSON line, mirroring run(). */
  def maintain(spark: SparkSession, out: String, cmd: Array[String]): Unit = {
    import graft.pipeline.Checkpointing
    val dir = s"$out/stats"
    cmd.toList match {
      case "compact" :: rest =>
        val parts = rest.headOption.map(_.toInt).getOrElse(
          spark.sparkContext.defaultParallelism)
        val (before, after, rows) = Checkpointing.compact(spark, dir, parts,
          java.util.UUID.randomUUID().toString.take(8))
        println(s"""{"op":"compact","files_before":$before,""" +
          s""""files_after":$after,"rows":$rows}""")
      case "vacuum" :: Nil =>
        val removed = Checkpointing.vacuum(dir)
        println(s"""{"op":"vacuum","removed":${removed.size}}""")
      case "delete" :: ids :: Nil =>
        import spark.implicits._
        val n = Checkpointing.deleteWhere(
          ids.split(",").toSeq.toDF("doc_id"), dir,
          "takedown-" + java.util.UUID.randomUUID().toString.take(8))
        println(s"""{"op":"delete","tombstones":$n}""")
      case "snapshots" :: Nil =>
        Checkpointing.snapshots(dir).foreach { s =>
          println(s"""{"seq":${s.seq},"run":"${s.runId}","rows":${s.rows},""" +
            s""""full":${s.full},"files":${s.files.size},""" +
            s""""delete_sets":${s.deletes.size}}""")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown maintenance op: $other")
    }
  }

  /** The testable body: returns (docs committed this run, total committed). */
  def run(spark: SparkSession, input: String, out: String,
      saltPages: Int = 64): (Long, Long) = {
    import spark.implicits._
    val statsDir = s"$out/stats"
    val docs = spark.read.parquet(input).as[graft.layout.DocRow]
    val pending = graft.pipeline.Checkpointing.resumeFilter(spark, docs, statsDir)
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val committed =
      if (pending.isEmpty) 0L
      else {
        val r = graft.pipeline.ExtractionPipeline.run(spark, pending,
          saltPages = Some(saltPages), persistIntermediate = false)
        r.outSpans.toDF().write.mode("append").parquet(s"$out/spans")
        graft.pipeline.Checkpointing.commit(r.stats.toDF(), statsDir, runId)
      }
    // committed truth, not the raw dir: after an upsert/delete the raw
    // directory still holds pre-rebase files / un-applied tombstones
    val snaps = graft.pipeline.Checkpointing.snapshots(statsDir)
    val total = if (snaps.isEmpty) 0L else graft.pipeline.Checkpointing
      .readAt(spark, statsDir, snaps.last.seq).count()
    val nSnaps = snaps.size
    println(s"""{"run":"$runId","docs_committed":$committed,""" +
      s""""total_committed":$total,"snapshots":$nSnaps}""")
    (committed, total)
  }
}
