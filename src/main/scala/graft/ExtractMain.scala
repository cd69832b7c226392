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
    require(args.length >= 2, "usage: ExtractMain <inputDir> <outputDir> [saltPages]")
    val (input, out) = (args(0), args(1))
    val saltPages = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, input, out, saltPages)
    finally spark.stop()
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
    val total = spark.read.parquet(statsDir).count()
    val nSnaps = graft.pipeline.Checkpointing.snapshots(statsDir).size
    println(s"""{"run":"$runId","docs_committed":$committed,""" +
      s""""total_committed":$total,"snapshots":$nSnaps}""")
    (committed, total)
  }
}
