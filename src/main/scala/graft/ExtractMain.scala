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
  *   <out>/spans          the output span sequences (committed the same
  *                        way — takedown/compact/vacuum/time travel apply
  *                        to the extracted text, not just the stats)
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
      "usage: ExtractMain <inputDir> <outputDir> [saltPages] [audit]\n" +
      "       ExtractMain maintain <outputDir> compact [partitions]\n" +
      "       ExtractMain maintain <outputDir> vacuum\n" +
      "       ExtractMain maintain <outputDir> delete <doc_id>[,<doc_id>...]\n" +
      "       ExtractMain maintain <outputDir> snapshots\n" +
      "       ExtractMain maintain <outputDir> expire [keepLast]\n" +
      "       ExtractMain maintain <outputDir> rollback <version>\n" +
      "       ExtractMain maintain <outputDir> branch <name> <version>\n" +
      "       ExtractMain maintain <outputDir> branches\n" +
      "       ExtractMain maintain <outputDir> fast-forward <name>\n" +
      "       ExtractMain maintain <outputDir> drop-branch <name>\n" +
      "       ExtractMain bench <inputDir> [saltPages]")
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      if (args(0) == "maintain") maintain(spark, args(1), args.drop(2))
      else if (args(0) == "bench") bench(spark, args(1),
        if (args.length > 2) args(2).toInt else 64,
        reps = if (args.length > 3) args(3).toInt else 3,
        sinkDir = if (args.length > 4) Some(args(4)) else None)
      else run(spark, args(0), args(1),
        if (args.length > 2) args(2).toInt else 64,
        audit = args.length > 3 && args(3) == "audit")
    } finally spark.stop()
  }

  /** Launcher-path scaling probe: the extract -> merge -> count job —
    * exactly the shape graft.Bench's in-process scaling protocol times —
    * run through THIS entrypoint so the spark-submit N vs 4N comparison
    * measures the same work (scripts/spark_submit_scaling.sh). With a
    * sinkDir, each rep instead runs the FULL committed-sink pipeline into
    * its own scratch table. The job runs `reps` times in the one JVM and
    * "seconds" is the min AFTER the first rep: a fresh JVM spends ~10 s
    * in JIT/codegen/footer warm-up, a CONSTANT that a multi-hour 100 TB
    * run amortizes to nothing but that at probe scale would otherwise
    * swamp the ratio (measured: it alone drags 0.88 to 0.47). */
  def bench(spark: SparkSession, input: String, saltPages: Int,
      reps: Int = 3, sinkDir: Option[String] = None): Unit = {
    import spark.implicits._
    val times = (1 to reps).map { rep =>
      val t0 = System.nanoTime()
      val r = graft.pipeline.ExtractionPipeline.run(spark,
        spark.read.parquet(input).as[graft.layout.DocRow],
        saltPages = Some(saltPages), persistIntermediate = false)
      sinkDir match {
        case Some(base) =>
          val runId = f"bench$rep%02d"
          graft.pipeline.Checkpointing.commit(
            r.outSpans.toDF(), s"$base/rep$rep/spans", runId)
          graft.pipeline.Checkpointing.commit(
            r.stats.toDF(), s"$base/rep$rep/stats", runId)
        case None => r.outSpans.count()
      }
      (System.nanoTime() - t0) / 1e9
    }
    val warm = if (times.length > 1) times.drop(1).min else times.head
    println(s"""{"mode":"bench","sink":${sinkDir.nonEmpty},""" +
      times.map(t => f"$t%.3f").mkString(""""rounds":[""", ",", "],") +
      f""""seconds":$warm%.3f}""")
  }

  /** Table maintenance on BOTH committed tables (stats + spans) — the ops
    * half of the production story (compaction cadence bounds file counts
    * AND the merge-on-read union depth; vacuum reclaims expired files;
    * delete is the takedown path, and a takedown that left the extracted
    * TEXT in the spans table would not be a takedown at all). Prints one
    * JSON line per table, mirroring run(). */
  def maintain(spark: SparkSession, out: String, cmd: Array[String]): Unit = {
    import graft.pipeline.Checkpointing
    // spans may not exist (a run that committed no docs yet)
    val tables = Seq(s"$out/stats", s"$out/spans")
      .filter(d => Checkpointing.snapshots(d).nonEmpty)
    require(tables.nonEmpty, s"no committed tables under $out")
    def name(dir: String) = dir.split('/').last
    cmd.toList match {
      case "compact" :: rest =>
        val parts = rest.headOption.map(_.toInt).getOrElse(
          spark.sparkContext.defaultParallelism)
        tables.foreach { dir =>
          val (before, after, rows) = Checkpointing.compact(spark, dir, parts,
            java.util.UUID.randomUUID().toString.take(8))
          println(s"""{"op":"compact","table":"${name(dir)}",""" +
            s""""files_before":$before,"files_after":$after,"rows":$rows}""")
        }
      case "vacuum" :: Nil =>
        tables.foreach { dir =>
          val removed = Checkpointing.vacuum(dir)
          println(s"""{"op":"vacuum","table":"${name(dir)}",""" +
            s""""removed":${removed.size}}""")
        }
      case "delete" :: ids :: Nil =>
        import spark.implicits._
        val keys = ids.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        require(keys.nonEmpty, "delete needs a non-empty doc_id list")
        val run = java.util.UUID.randomUUID().toString.take(8)
        tables.foreach { dir =>
          val n = Checkpointing.deleteWhere(keys.toDF("doc_id"), dir,
            s"takedown-$run")
          println(s"""{"op":"delete","table":"${name(dir)}","tombstones":$n}""")
        }
      case "snapshots" :: Nil =>
        tables.foreach { dir =>
          Checkpointing.snapshots(dir).foreach { s =>
            println(s"""{"table":"${name(dir)}","seq":${s.seq},""" +
              s""""run":"${s.runId}","rows":${s.rows},"full":${s.full},""" +
              s""""files":${s.files.size},"delete_sets":${s.deletes.size}}""")
          }
        }
      case "expire" :: rest =>
        val keepLast = rest.headOption.map(_.toInt).getOrElse(1)
        tables.foreach { dir =>
          val expired = Checkpointing.expireSnapshots(dir, keepLast)
          println(s"""{"op":"expire","table":"${name(dir)}",""" +
            s""""keep_last":$keepLast,"expired":${expired.size}}""")
        }
      case "rollback" :: version :: Nil =>
        val v = version.toInt
        val run = java.util.UUID.randomUUID().toString.take(8)
        tables.foreach { dir =>
          val seq = Checkpointing.rollback(dir, v, s"rollback-$run")
          println(s"""{"op":"rollback","table":"${name(dir)}",""" +
            s""""to_version":$v,"new_seq":$seq}""")
        }
      case "branch" :: bname :: version :: Nil =>
        val v = version.toInt
        tables.foreach { dir =>
          Checkpointing.createBranch(dir, bname, v)
          println(s"""{"op":"branch","table":"${name(dir)}",""" +
            s""""name":"$bname","base":$v}""")
        }
      case "branches" :: Nil =>
        tables.foreach { dir =>
          Checkpointing.branches(dir).toSeq.sortBy(_._1).foreach {
            case (n, (base, commits)) =>
              println(s"""{"table":"${name(dir)}","branch":"$n",""" +
                s""""base":$base,"commits":$commits}""")
          }
        }
      case "fast-forward" :: bname :: Nil =>
        tables.foreach { dir =>
          val head = Checkpointing.fastForward(dir, bname)
          println(s"""{"op":"fast-forward","table":"${name(dir)}",""" +
            s""""branch":"$bname","new_head":$head}""")
        }
      case "drop-branch" :: bname :: Nil =>
        tables.foreach { dir =>
          Checkpointing.dropBranch(dir, bname)
          println(s"""{"op":"drop-branch","table":"${name(dir)}",""" +
            s""""branch":"$bname"}""")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown maintenance op: $other")
    }
  }

  /** The testable body: returns (docs committed this run, total committed).
    *
    * `audit = true` switches the landing to write-audit-publish: both
    * tables STAGE (invisible to readers), the would-be state is audited —
    * one stats row per doc, every span row backed by a stats row, no
    * doc_id collision with the committed table — and only then published
    * (metadata-only). A failed audit abandons both batches and throws:
    * the table never saw a row. This is how a risky parser change or
    * backfill runs in production without exposing wrong data. */
  def run(spark: SparkSession, input: String, out: String,
      saltPages: Int = 64, audit: Boolean = false): (Long, Long) = {
    import spark.implicits._
    import graft.pipeline.Checkpointing
    // job wall clock from first plan to committed truth, excluding JVM +
    // SparkSession startup — the time a cluster bills to the JOB, and the
    // number the two-cluster-size scaling comparison divides (a fixed
    // ~10 s of driver spin-up added to both sides would understate the
    // ratio at small t and has nothing to do with the pipeline)
    val t0 = System.nanoTime()
    val statsDir = s"$out/stats"
    val docs = spark.read.parquet(input).as[graft.layout.DocRow]
    val pending = Checkpointing.resumeFilter(spark, docs, statsDir)
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val committed =
      if (pending.isEmpty) 0L
      else {
        val r = graft.pipeline.ExtractionPipeline.run(spark, pending,
          saltPages = Some(saltPages), persistIntermediate = false)
        // spans are a COMMITTED table too (snapshot log + manifests), so
        // takedown/compact/vacuum cover the extracted text, not just the
        // per-doc stats — and time travel works on the content itself
        if (!audit) {
          Checkpointing.commit(r.outSpans.toDF(), s"$out/spans", runId)
          Checkpointing.commit(r.stats.toDF(), statsDir, runId)
        } else {
          val nStats = Checkpointing.stage(r.stats.toDF(), statsDir, runId)
          Checkpointing.stage(r.outSpans.toDF(), s"$out/spans", runId)
          val audited = Checkpointing.readStaged(spark, statsDir, runId)
          val dupIds = audited.groupBy("doc_id")
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
            .filter(org.apache.spark.sql.functions.col("n") > 1).count()
          val spanIds = Checkpointing
            .readStaged(spark, s"$out/spans", runId)
            .select("doc_id").distinct()
          val orphanSpans = spanIds.join(audited.select("doc_id"),
            Seq("doc_id"), "left_anti").count()
          if (dupIds > 0 || orphanSpans > 0) {
            Checkpointing.abandon(statsDir, runId)
            Checkpointing.abandon(s"$out/spans", runId)
            throw new IllegalStateException(s"audit failed for run $runId: " +
              s"$dupIds duplicated doc_ids, $orphanSpans span docs without " +
              "a stats row — batch abandoned, table unchanged")
          }
          Checkpointing.publish(s"$out/spans", runId)
          Checkpointing.publish(statsDir, runId)
          nStats
        }
      }
    // committed truth, not the raw dir: after an upsert/delete the raw
    // directory still holds pre-rebase files / un-applied tombstones
    val snaps = graft.pipeline.Checkpointing.snapshots(statsDir)
    val total = if (snaps.isEmpty) 0L else graft.pipeline.Checkpointing
      .readAt(spark, statsDir, snaps.last.seq).count()
    val nSnaps = snaps.size
    val secs = (System.nanoTime() - t0) / 1e9
    println(s"""{"run":"$runId","docs_committed":$committed,""" +
      s""""total_committed":$total,"snapshots":$nSnaps,""" +
      f""""seconds":$secs%.3f}""")
    (committed, total)
  }
}
