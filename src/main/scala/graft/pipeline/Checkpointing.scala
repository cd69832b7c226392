package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.layout.DocRow
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Checkpoint/resume semantics — the Spark analog of the reference's
  * per-paper incremental commits and status-column scans
  * (step_1_pages_local2db.py:15-26 resume probe; the `WHERE x IS NULL`
  * incremental filters in step_2:53, step_3:36-38, step_6:54).
  *
  * Write side: append the batch to a committed parquet directory and record
  * a lineage manifest (one JSON line per written partition with row counts
  * and min/max doc ords — the "per-partition lineage + metrics" of the
  * north rule; Iceberg-shaped, parquet-backed since this sandbox ships no
  * Iceberg runtime).
  *
  * Read side: resume = left-anti join of the input docs against the
  * committed doc_ids, so a re-run after a kill reprocesses only uncommitted
  * documents (S3/S4 semantics). The anti-join build side is just doc_ids —
  * broadcastable at any realistic committed-batch size.
  */
object Checkpointing {

  /** Docs not yet present in the committed output. */
  def resumeFilter(spark: SparkSession, docs: Dataset[DocRow],
      committedDir: String): Dataset[DocRow] = {
    import spark.implicits._
    if (!Files.exists(Paths.get(committedDir))) docs
    else {
      val done = spark.read.parquet(committedDir).select("doc_id").distinct()
      docs.join(broadcast(done), Seq("doc_id"), "left_anti").as[DocRow]
    }
  }

  /** Append a batch and write its lineage manifest. Returns rows written. */
  def commit(df: DataFrame, dir: String, runId: String): Long = {
    val withPart = df.withColumn("_part", spark_partition_id())
    val metrics = withPart.groupBy("_part").agg(
      count(lit(1)).as("rows"),
      min("doc_ord").as("min_doc_ord"),
      max("doc_ord").as("max_doc_ord")).collect()
    df.write.mode(SaveMode.Append).parquet(dir)
    val manifestDir = Paths.get(dir + "_manifest")
    Files.createDirectories(manifestDir)
    val lines = metrics.map { r =>
      s"""{"run":"$runId","partition":${r.get(0)},"rows":${r.get(1)},""" +
        s""""min_doc_ord":${r.get(2)},"max_doc_ord":${r.get(3)}}"""
    }
    Files.write(manifestDir.resolve(s"manifest-$runId.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    metrics.map(_.getLong(1)).sum
  }
}
