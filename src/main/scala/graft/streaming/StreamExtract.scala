package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.layout.{CandidateTable, DocRow}
import graft.pipeline.Extract

/** The flagship extraction as a Structured Streaming job — the shape the
  * reference's DB-state-driven incremental loop (step_2's per-paper
  * commits, src/v3_stable/step_2_add_candidate_tables.py:51-60) takes when
  * documents ARRIVE instead of sitting in a settled corpus: readStream the
  * interleaved-doc table, extract per micro-batch, append candidates to
  * the sink. Extraction is stateless per document, so the streaming query
  * needs no watermark and no state store — each doc is parsed exactly once
  * in whatever batch delivers it, and the appended union across batches
  * must equal the batch pipeline's output row-for-row. That equality is
  * the driver check: x28 shares x06's golden VALUES oracle.
  *
  * At scale this is the checkpointed ingest topology: source offsets +
  * the append sink give exactly-once candidates without the anti-join
  * resume pass the batch pipeline uses (Checkpointing.resumeFilter) —
  * the streaming engine's offset log IS the resume state.
  */
object StreamExtract {

  /** The flat driver-visible projection of a candidate row (P4 body, P5
    * bbox, P6 bold) — one definition shared by the batch x06 query and the
    * streaming x28 replay so the two can never drift apart. */
  def candidateRow(c: CandidateTable): (String, Int, Int, String, Long, Long, Long, Long, String) =
    (c.doc_id, c.page, c.raw_data.length, c.headers.mkString("|"),
      c.bbox(0).toLong, c.bbox(1).toLong, c.bbox(2).toLong, c.bbox(3).toLong,
      c.bold.mkString(","))

  private val CandidateCols = Seq("doc_id", "page", "n_rows", "headers",
    "x0", "y0", "x1", "y1", "bold_cells")

  /** Drive per-doc extraction as a streaming flatMap over a finite
    * two-batch replay and return every appended candidate row. Append
    * mode: no state, no watermark — the batch split exercises that rows
    * from different micro-batches land in one consistent sink. */
  def replayCandidates(spark: SparkSession, docs: Seq[DocRow]): DataFrame = {
    import spark.implicits._
    Events.replayTwoBatches(spark, docs, "graft_x28_", "append")(in =>
      in.flatMap(d => Extract.extractDoc(d).candidates.map(candidateRow))
        .toDF(CandidateCols: _*))
  }

  /** Bounded backfill: a FILE-SOURCE streaming read over an already-landed
    * corpus directory, rate-limited by `maxFilesPerTrigger` and driven by
    * `Trigger.AvailableNow` — process everything that exists, in bounded
    * micro-batches, then STOP. This is how a year of landed files catches
    * up without one unbounded batch (bounded task memory, bounded sink
    * commits, a resumable offset log at every step — kill it mid-backfill
    * and it continues from the last batch). Each micro-batch runs the
    * batch pipeline and commits through Checkpointing, so the backfill
    * leaves the same snapshot log a live stream (x41) or batch run (x11)
    * would. Returns the number of committed micro-batches.
    *
    * AvailableNow (vs the legacy Trigger.Once) is the piece that makes
    * rate limits effective: Once ignores them and crams the backlog into
    * a single batch — exactly the unbounded bite this path exists to
    * avoid. */
  def backfillCommittedStats(spark: SparkSession, landing: String,
      checkpoint: String, dir: String, maxFilesPerTrigger: Int): Int = {
    import spark.implicits._
    Events.withReplayPartitions(spark) {
      val q = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(landing)
        .as[DocRow]
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[DocRow], id: Long) =>
          // foreachBatch is at-least-once: a crash between our commit()
          // and the engine's own commit log replays this id on restart —
          // the snapshot log (keyed by batch id) makes the replay a no-op
          // instead of a duplicated micro-batch
          val runId = f"backfill-$id%03d"
          if (!graft.pipeline.Checkpointing.snapshots(dir)
              .exists(_.runId == runId)) {
            val r = graft.pipeline.ExtractionPipeline
              .run(spark, batch, persistIntermediate = false)
            graft.pipeline.Checkpointing.commit(r.stats.toDF(), dir, runId)
          }
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    graft.pipeline.Checkpointing.snapshots(dir).size
  }

  /** The streaming ingest wired to the RESUMABLE COMMITTED sink: each
    * micro-batch runs the full batch pipeline via foreachBatch and lands
    * through `Checkpointing.commit`, so the streaming path produces the
    * SAME per-partition lineage manifests and snapshot log as a batch run
    * — one snapshot per micro-batch, `readAt(v)` time travel included.
    * This is the production bridge from a continuous source to an
    * Iceberg-shaped table (the engine-side analog of a streaming Iceberg
    * sink's per-epoch commits). Two-batch finite replay; returns the
    * committed stats directory. */
  def replayCommittedStats(spark: SparkSession, docs: Seq[DocRow],
      dir: String): Unit = {
    import spark.implicits._
    Events.withReplayPartitions(spark) {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocRow](spark)
      val q = input.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[DocRow], id: Long) =>
          // idempotent per batch id (foreachBatch is at-least-once)
          if (!graft.pipeline.Checkpointing.snapshots(dir)
              .exists(_.runId == s"batch-$id")) {
            val r = graft.pipeline.ExtractionPipeline
              .run(spark, batch, persistIntermediate = false)
            graft.pipeline.Checkpointing.commit(r.stats.toDF(), dir, s"batch-$id")
          }
          ()
        }
        .start()
      try {
        val (first, second) = docs.splitAt(docs.length / 2)
        input.addData(first)
        q.processAllAvailable()
        input.addData(second)
        q.processAllAvailable()
      } finally q.stop()
    }
  }
}
