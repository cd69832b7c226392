package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Dedup

/** STREAMING sentence-level exact dedup — the continuous form of the
  * q64 → q71 pair: documents arrive in micro-batches; each batch cleans
  * against the STANDING unit-hash index (within-batch election + index
  * probe, [[Dedup.incrementalSentenceDedupIndexed]]) and then appends its
  * own unit hashes to the index. The index is the only cross-batch state
  * and it lives as a versioned parquet table, not in the state store —
  * 8 bytes per distinct unit, append-only, exactly what a production
  * ingest persists (the q55/x55 manifest shape applied to exact units).
  *
  * Crash safety: both writes inside foreachBatch are keyed by batch id
  * (out/v<id>, index/v<id>) and fully overwrite their version dir, so
  * re-processing a batch after a restart is idempotent — at-least-once
  * foreachBatch composes to exactly-once table state.
  *
  * Replay contract: batches are fed in doc_id order, so keep-first
  * across batches equals the global keep-first — the replayed union of
  * per-batch outputs must equal batch [[Dedup.sentenceDedup]] over the
  * whole corpus, and driver query x62 shares q64's oracle.
  */
object StreamSentenceDedup {

  final case class Doc(doc_id: Long, text: String)

  def replaySentenceDedup(spark: SparkSession, docs: Seq[Doc],
      workDir: String, unitTokens: Int = 12, nBatches: Int = 3): DataFrame = {
    require(nBatches >= 1, s"need at least one batch, got $nBatches")
    require(docs.nonEmpty, "empty replay corpus — nothing to stream")
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$workDir/index"))
    def indexVersions: Seq[Long] = {
      val d = new java.io.File(s"$workDir/index")
      Option(d.list()).toSeq.flatten.collect {
        case n if n.startsWith("v") => n.drop(1).toLong
      }.sorted
    }
    def currentIndex: DataFrame = {
      val vs = indexVersions
      if (vs.isEmpty) spark.emptyDataset[Long].toDF("h")
      else spark.read.parquet(vs.map(v => s"$workDir/index/v$v"): _*)
        .distinct()
    }
    Events.withReplayPartitions(spark) {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc](spark)
      val q = input.toDS().toDF()
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val b = batch.persist()
          Dedup.incrementalSentenceDedupIndexed(currentIndex, b, unitTokens)
            .write.mode("overwrite").parquet(s"$workDir/out/v$batchId")
          Dedup.sentenceUnitIndex(b, unitTokens)
            .write.mode("overwrite").parquet(s"$workDir/index/v$batchId")
          b.unpersist()
          ()
        }
        .start()
      try {
        val sorted = docs.sortBy(_.doc_id)
        val per = math.max(1, (sorted.length + nBatches - 1) / nBatches)
        sorted.grouped(per).foreach { batch =>
          input.addData(batch)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    val outDirs = Option(new java.io.File(s"$workDir/out").list()).toSeq.flatten
      .collect { case n if n.startsWith("v") => s"$workDir/out/$n" }
    spark.read.parquet(outDirs: _*)
  }
}
