package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming near-duplicate detection: the MinHash-LSH index of
  * [[graft.ops.Dedup.incrementalMinhashPairs]] maintained as STREAMING
  * STATE, so a continuously-ingesting corpus is deduped as it arrives
  * instead of by periodic full-corpus re-pairs.
  *
  * Topology: per-doc banded bucket ids (the same
  * [[graft.ops.Dedup.minhashBuckets]] pass — stateless, narrow) ->
  * groupByKey on (band, bucket) -> flatMapGroupsWithState holding the
  * doc_ids previously seen in that bucket. A new arrival emits candidate
  * pairs against its bucket-mates (earlier arrivals + same-batch ones) and
  * joins the state. Every pair therefore surfaces exactly once, in the
  * micro-batch where its LATER document arrives — the incremental
  * property — and the state store holds one row per OCCUPIED bucket with a
  * doc_id list bounded by bucket occupancy (LSH keeps buckets small by
  * construction; the raw text and signatures never enter the store).
  *
  * Candidates then verify with exact Jaccard against the landed corpus
  * ([[graft.ops.Dedup.verifyPairs]]) — in production a foreachBatch join
  * against the committed document table; in the replay harness, the finite
  * input. On a finite replay the verified union across batches must equal
  * the batch operator exactly, which gives the streaming variant q15's
  * DuckDB oracle (driver query x51).
  */
object StreamNearDup {

  final case class Doc(doc_id: Long, text: String)
  final case class BucketRow(band: Int, bucket: Long, doc_id: Long)
  final case class Cand(doc_a: Long, doc_b: Long)

  /** The stateful pair-emitting core, shared by the replay harness and any
    * real readStream topology. */
  private[streaming] def emitPairs(key: (Int, Long), rows: Iterator[BucketRow],
      state: GroupState[Seq[Long]]): Iterator[Cand] = {
    val seen = state.getOption.getOrElse(Seq.empty)
    val seenSet = seen.toSet
    val arrived = rows.map(_.doc_id).toSeq.distinct
      .filterNot(seenSet).sorted
    val amongNew = for {
      i <- arrived.indices.iterator
      j <- (i + 1 until arrived.length).iterator
    } yield Cand(arrived(i), arrived(j))
    val vsSeen = for {
      n <- arrived.iterator
      s <- seen.iterator
    } yield Cand(math.min(n, s), math.max(n, s))
    if (arrived.nonEmpty) state.update(seen ++ arrived)
    amongNew ++ vsSeen
  }

  /** Drive the stateful near-dup over a FINITE corpus replayed in two
    * micro-batches and return the verified pairs. The collect is inherent
    * to the replay harness — production would readStream from the ingest
    * source and verify inside foreachBatch against the committed table. */
  def replayNearDupPairs(spark: SparkSession, docs: Seq[Doc],
      nHashes: Int = 32, bands: Int = 8, minJaccardBp: Long = 7000L,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val params = Dedup.hashParams(nHashes, seed)
    val rowsPerBand = nHashes / bands
    val cands = Events.replayTwoBatches(spark, docs, "graft_x51_", "append") {
      in =>
        in.flatMap { d =>
          Dedup.minhashBuckets(d.text, 3, params, bands, rowsPerBand)
            .iterator.zipWithIndex
            .map { case (b, band) => BucketRow(band, b, d.doc_id) }
        }
        .groupByKey(r => (r.band, r.bucket))
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(emitPairs)
        .toDF()
    }
    Dedup.verifyPairs(cands.distinct(), spark.createDataset(docs).toDF(),
      minJaccardBp)
  }
}
