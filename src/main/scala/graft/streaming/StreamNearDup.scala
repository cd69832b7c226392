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
  *
  * STATE BOUND: an infinite stream with one viral duplicate would
  * otherwise grow a single bucket's doc list — and its per-arrival pair
  * fan-out — without limit. Each bucket therefore caps its member list at
  * `maxBucketDocs`; once full, a new arrival emits ONE candidate edge
  * against the bucket's first-seen representative instead of one per
  * member, and does NOT join the state. A full bucket is by definition an
  * already-detected dup cluster, and the representative edge keeps every
  * overflow doc connected to that cluster (the downstream connected-
  * components pass yields the same components), so what the cap suppresses
  * is only redundant intra-cluster edges — pair count per arrival drops
  * from O(bucket) to 1, state per bucket stays <= maxBucketDocs longs.
  */
object StreamNearDup {

  final case class Doc(doc_id: Long, text: String)
  final case class BucketRow(band: Int, bucket: Long, doc_id: Long)
  final case class Cand(doc_a: Long, doc_b: Long)

  /** Default per-bucket member cap (256 longs = 2 KB of state per occupied
    * bucket, worst case). */
  val DefaultMaxBucketDocs = 256

  /** The stateful pair-emitting core, shared by the replay harness and any
    * real readStream topology. */
  private[streaming] def emitPairs(maxBucketDocs: Int)(key: (Int, Long),
      rows: Iterator[BucketRow],
      state: GroupState[Seq[Long]]): Iterator[Cand] = {
    val seen = state.getOption.getOrElse(Seq.empty)
    val seenSet = seen.toSet
    val arrived = rows.map(_.doc_id).toSeq.distinct
      .filterNot(seenSet).sorted
    // room left under the cap joins the bucket; the rest are overflow
    val (joining, overflow) = arrived.splitAt(
      math.max(maxBucketDocs - seen.size, 0))
    val amongNew = for {
      i <- joining.indices.iterator
      j <- (i + 1 until joining.length).iterator
    } yield Cand(joining(i), joining(j))
    val vsSeen = for {
      n <- joining.iterator
      s <- seen.iterator
    } yield Cand(math.min(n, s), math.max(n, s))
    // saturated bucket: one representative edge per overflow arrival —
    // connectivity without the O(bucket) fan-out or state growth
    val rep = seen.headOption.orElse(joining.headOption)
    val overflowEdges = rep.iterator.flatMap(r =>
      overflow.iterator.filter(_ != r)
        .map(o => Cand(math.min(o, r), math.max(o, r))))
    if (joining.nonEmpty) state.update(seen ++ joining)
    amongNew ++ vsSeen ++ overflowEdges
  }

  /** Drive the stateful near-dup over a FINITE corpus replayed in two
    * micro-batches and return the verified pairs. The collect is inherent
    * to the replay harness — production would readStream from the ingest
    * source and verify inside foreachBatch against the committed table. */
  def replayNearDupPairs(spark: SparkSession, docs: Seq[Doc],
      nHashes: Int = 32, bands: Int = 8, minJaccardBp: Long = 7000L,
      seed: Long = 42L,
      maxBucketDocs: Int = DefaultMaxBucketDocs): DataFrame = {
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
          GroupStateTimeout.NoTimeout)(emitPairs(maxBucketDocs))
        .toDF()
    }
    Dedup.verifyPairsPrefiltered(cands.distinct(),
      spark.createDataset(docs).toDF(), minJaccardBp)
  }

  /** Live dedup-cluster manifest: the pair stream above folded into a
    * STANDING component labeling per micro-batch — the streaming capstone
    * of the incremental-ingest story (q55 finds a delta's pairs without
    * re-pairing the corpus; q58 folds them in without re-clustering it;
    * this runs that fold continuously). Inside `foreachBatch` each batch's
    * candidates verify with exact Jaccard and merge into the manifest via
    * [[graft.ops.Components.incrementalComponents]] — the manifest (the
    * only corpus-scale frame) is touched by two broadcast joins and never
    * shuffles, so each micro-batch costs O(batch), never O(corpus).
    *
    * The manifest is a VERSIONED table (one parquet dir per batch id,
    * latest wins — the snapshot-log shape in miniature): the new version
    * is fully written before it becomes current, so a batch that dies
    * mid-write leaves the previous version intact, and re-processing the
    * batch after restart is idempotent (same fold, same output).
    *
    * On a finite two-batch replay every pair surfaces exactly once (in
    * its later doc's batch), so the final manifest must equal the
    * from-scratch min-label closure over the FULL batch pair graph —
    * q15's graph — which is driver query x55's DuckDB oracle. */
  def replayLiveClusters(spark: SparkSession, docs: Seq[Doc],
      manifestDir: String,
      nHashes: Int = 32, bands: Int = 8, minJaccardBp: Long = 7000L,
      seed: Long = 42L,
      maxBucketDocs: Int = DefaultMaxBucketDocs,
      nBatches: Int = 2): DataFrame = {
    require(nBatches >= 1, s"need at least one batch, got $nBatches")
    import spark.implicits._
    val params = Dedup.hashParams(nHashes, seed)
    val rowsPerBand = nHashes / bands
    val corpus = spark.createDataset(docs).toDF()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(manifestDir))
    def versions: Seq[Long] = {
      val d = new java.io.File(manifestDir)
      Option(d.list()).toSeq.flatten.collect {
        case n if n.startsWith("v") => n.drop(1).toLong
      }.sorted
    }
    def current: DataFrame = versions.lastOption match {
      case Some(v) => spark.read.parquet(s"$manifestDir/v$v")
      case None => spark.emptyDataset[(Long, Long)].toDF("id", "component")
    }
    Events.withReplayPartitions(spark) {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc](spark)
      val q = input.toDS()
        .flatMap { d =>
          Dedup.minhashBuckets(d.text, 3, params, bands, rowsPerBand)
            .iterator.zipWithIndex
            .map { case (b, band) => BucketRow(band, b, d.doc_id) }
        }
        .groupByKey(r => (r.band, r.bucket))
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(emitPairs(maxBucketDocs))
        .toDF()
        .writeStream
        .foreachBatch { (cands: DataFrame, batchId: Long) =>
          val pairs = Dedup.verifyPairsPrefiltered(cands.distinct(), corpus, minJaccardBp)
          graft.ops.Components
            .incrementalComponents(current, pairs, "doc_a", "doc_b")
            .write.mode("overwrite").parquet(s"$manifestDir/v$batchId")
        }
        .start()
      try {
        // nBatches even slices, each its own micro-batch -> its own fold
        // and manifest version (every pair still surfaces exactly once,
        // in its later doc's batch)
        val per = math.max(1, (docs.length + nBatches - 1) / nBatches)
        docs.grouped(per).foreach { batch =>
          input.addData(batch)
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    current
  }
}
