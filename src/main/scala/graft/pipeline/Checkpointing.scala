package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession, SaveMode}
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

  // ------------------------------------------------------------ snapshots
  /** Iceberg-shaped snapshot log: every commit() also writes
    * `snapshot-<seq>-<runId>.json` into the manifest dir listing exactly
    * the data files that commit ADDED. A table version is then the union
    * of files across snapshots 1..v — [[readAt]] reconstructs any
    * historical version without touching files written later (time
    * travel). Compaction rewrites the data files and logs a fresh
    * snapshot of the compacted state; older versions become EXPIRED (their
    * files are gone) and readAt fails loudly for them, which is Iceberg's
    * expire-snapshots contract. */
  /** `full` = the file list is the COMPLETE table state (a compaction
    * rebase), not a delta on top of earlier snapshots. `deletes` = names
    * of equality-delete sets (under `<dir>_deletes/<name>`) this snapshot
    * ADDED — merge-on-read row-level deletes, applied at scan time to rows
    * committed by EARLIER snapshots only (Iceberg's sequence-number rule),
    * so a doc re-extracted after its takedown is visible again. */
  /** `stats` = per-FILE (min, max) ranges on this snapshot's `spec`
    * column for the files it added, when known — the Iceberg manifest
    * column-stats analog that [[readRange]] prunes with. Files without an
    * entry (no spec column, legacy adoption) are conservatively never
    * pruned.
    *
    * `spec` = WHICH column the ranges describe (default doc_ord —
    * snapshots written before spec evolution carry no key and parse as
    * doc_ord). Different snapshots of one table may use different spec
    * columns — Iceberg's partition-spec evolution: each file prunes under
    * the spec it was WRITTEN with, and a predicate on a column some
    * snapshot never tracked keeps that snapshot's files conservatively
    * ([[pruneInfoBy]]). Old data is never rewritten when the spec
    * changes. */
  /** `rollbackOf` = Some(v) marks a ROLLBACK snapshot (Iceberg's
    * rollback_to_snapshot): a metadata-only commit whose table state IS
    * version v's — readAt resolves it by substituting v's effective stack,
    * so no data file is copied or rewritten. It is `full` (it rebases the
    * stack: nothing between v and it contributes), and later deltas stack
    * on top of the restored state. */
  final case class Snapshot(seq: Int, runId: String, files: Seq[String],
      rows: Long, full: Boolean, deletes: Seq[String] = Nil,
      stats: Map[String, (Long, Long)] = Map.empty,
      spec: String = "doc_ord", rollbackOf: Option[Int] = None)

  private def parquetNames(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles())
      .map(_.collect { case f if f.getName.endsWith(".parquet") => f.getName }.toSet)
      .getOrElse(Set.empty)

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  private def writeSnapshot(dir: String, runId: String, added: Seq[String],
      rows: Long, full: Boolean = false, deletes: Seq[String] = Nil,
      stats: Map[String, (Long, Long)] = Map.empty,
      spec: String = "doc_ord", rollbackOf: Option[Int] = None): Snapshot =
    writeSnapshotAt(Paths.get(dir + "_manifest"),
      snapshots(dir).lastOption.map(_.seq).getOrElse(0) + 1,
      runId, added, rows, full, deletes, stats, spec, rollbackOf)

  /** [[writeSnapshot]] with the log location and seq made explicit — the
    * shared writer for the main log and branch logs (a branch log lives
    * under the main manifest dir and numbers its snapshots CONTINUING from
    * the branch base, so merge-on-read seq ordering stays global). */
  private def writeSnapshotAt(manifestDir: java.nio.file.Path, seq: Int,
      runId: String, added: Seq[String],
      rows: Long, full: Boolean = false, deletes: Seq[String] = Nil,
      stats: Map[String, (Long, Long)] = Map.empty,
      spec: String = "doc_ord", rollbackOf: Option[Int] = None): Snapshot = {
    Files.createDirectories(manifestDir)
    val statsJson = stats.toSeq.sortBy(_._1)
      .map { case (f, (mn, mx)) => s""""$f":[$mn,$mx]""" }.mkString(",")
    val rbJson = rollbackOf.map(v => s""""rollback_of":$v,""").getOrElse("")
    val json = s"""{"seq":$seq,"run":"$runId","rows":$rows,"full":$full,""" +
      rbJson +
      s""""spec":"$spec",""" +
      s""""deletes":[${deletes.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""files":[${added.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""stats":{$statsJson}}"""
    Files.writeString(manifestDir.resolve(f"snapshot-$seq%05d-$runId.json"), json)
    Snapshot(seq, runId, added.sorted, rows, full, deletes.sorted, stats,
      spec, rollbackOf)
  }

  /** The snapshot log, oldest first (empty when the dir has no commits). */
  def snapshots(dir: String): Seq[Snapshot] =
    snapshotsAt(new java.io.File(dir + "_manifest"))

  private def snapshotsAt(manifestDir: java.io.File): Seq[Snapshot] = {
    Option(manifestDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("snapshot-") && f.getName.endsWith(".json"))
      .sortBy(_.getName)
      .map { f =>
        val s = Files.readString(f.toPath)
        val seq = """"seq":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
        val run = """"run":"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
        val rows = """"rows":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
        val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s).get.group(1)
        val full = """"full":(true|false)""".r.findFirstMatchIn(s)
          .exists(_.group(1) == "true")
        def list(raw: String): Seq[String] = raw.split(",").toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
        // pre-delete snapshots have no "deletes" key — parse as empty
        val dels = """"deletes":\[([^\]]*)\]""".r.findFirstMatchIn(s)
          .map(m => list(m.group(1))).getOrElse(Nil)
        // pre-stats snapshots have no "stats" key — parse as empty (the
        // entries are arrays, never objects, so [^}]* is safe)
        val stats = """"stats":\{([^}]*)\}""".r.findFirstMatchIn(s)
          .map(m => """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r.findAllMatchIn(m.group(1))
            .map(e => e.group(1) -> (e.group(2).toLong, e.group(3).toLong))
            .toMap)
          .getOrElse(Map.empty[String, (Long, Long)])
        // pre-spec-evolution snapshots have no "spec" key — they tracked
        // doc_ord by construction
        val spec = """"spec":"([^"]*)"""".r.findFirstMatchIn(s)
          .map(_.group(1)).getOrElse("doc_ord")
        val rb = """"rollback_of":(\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt)
        Snapshot(seq, run, list(files), rows, full, dels, stats, spec, rb)
      }.toSeq
  }

  /** Read the table as of snapshot `version` (1-based commit sequence).
    * Fails loudly when the version never existed or its files were
    * rewritten away by a later compaction (expired), never returning a
    * silently-partial frame.
    *
    * Merge-on-read: when the effective snapshot range carries equality
    * delete sets, each commit's files are tagged with their commit seq and
    * anti-joined against the (broadcast) delete keys with `del_seq >
    * commit_seq` — a delete removes only rows committed BEFORE it, so a
    * doc re-committed after its takedown is visible again (Iceberg's
    * sequence-number rule). Delete sets are doc_id lists, tiny next to the
    * data, so the apply is a broadcast hash anti-join: the 100 TB of data
    * files are never rewritten or shuffled. With no live deletes the plan
    * collapses to the plain multi-file parquet scan. */
  def readAt(spark: SparkSession, dir: String, version: Int): DataFrame =
    assemble(spark, dir, version, effectiveSnaps(dir, version))

  /** The snapshot stack that defines table state at `version`: everything
    * from the most recent full (compaction/upsert) rebase at or before it,
    * plus the deltas on top. */
  private def effectiveSnaps(dir: String, version: Int): Seq[Snapshot] = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"no snapshots under ${dir}_manifest")
    require(version >= 1 && version <= snaps.last.seq,
      s"version $version out of range 1..${snaps.last.seq}")
    val upTo = snaps.filter(_.seq <= version)
    require(upTo.lastOption.exists(_.seq == version),
      s"snapshot $version is expired (metadata removed by expireSnapshots)")
    // a full (compaction) snapshot rebases the file list; deltas stack on
    // top of the most recent one
    val baseIdx = upTo.lastIndexWhere(_.full)
    val eff = if (baseIdx >= 0) upTo.drop(baseIdx) else upTo
    // the stack must be gapless: a missing mid-stack snapshot (expired out
    // of order, or hand-deleted metadata) would otherwise assemble a
    // silently-partial frame — the one thing readAt promises never to do
    require(eff.zip(eff.tail).forall { case (a, b) => b.seq == a.seq + 1 },
      s"snapshot stack for version $version has gaps: seqs ${eff.map(_.seq)}")
    // a ROLLBACK head delegates to its target's stack: the restored state
    // plus whatever deltas stacked on top after the rollback. Recursion
    // terminates because rollback() requires target < rollback seq. The
    // target stack keeps its ORIGINAL seqs, so merge-on-read delete
    // ordering (del_seq > commit_seq) stays exact across the restore —
    // a post-rollback delete still removes resurrected rows, and a delete
    // in the rolled-back-away range is correctly gone.
    eff.head.rollbackOf match {
      case Some(target) => effectiveSnaps(dir, target) ++ eff.tail
      case None => eff
    }
  }

  /** Build the DataFrame for an effective snapshot stack whose per-snapshot
    * file lists may have been pruned (merge-on-read deletes still applied;
    * pruning a data file only ever removes rows the caller's own residual
    * filter would drop, so the anti-join result for surviving rows is
    * unchanged). */
  private def assemble(spark: SparkSession, dir: String, version: Int,
      effective: Seq[Snapshot]): DataFrame = {
    val files = effective.flatMap(_.files).distinct.map(n => s"$dir/$n")
    val missing = files.filterNot(f => Files.exists(Paths.get(f)))
    require(missing.isEmpty,
      s"snapshot $version is expired (files rewritten by compaction): " +
        missing.take(3).mkString(", "))
    val delSets = effective.flatMap(s => s.deletes.map(d => (s.seq, d)))
    if (delSets.isEmpty) spark.read.parquet(files: _*)
    else {
      val missingDels = delSets.map(_._2)
        .filterNot(d => Files.exists(Paths.get(s"${dir}_deletes/$d")))
      require(missingDels.isEmpty, s"snapshot $version is expired (delete " +
        s"sets removed by vacuum/compaction): ${missingDels.mkString(", ")}")
      val dataLegs = effective.filter(_.files.nonEmpty)
        .map(s => spark.read.parquet(s.files.map(n => s"$dir/$n"): _*)
          .withColumn("_commit_seq", lit(s.seq)))
      require(dataLegs.nonEmpty, s"snapshot $version has delete sets but no " +
        "data files — nothing to apply them to (table schema unknown)")
      val data = dataLegs.reduce(_ unionByName _)
      val dels = delSets
        .map { case (seq, d) => spark.read.parquet(s"${dir}_deletes/$d")
          .select(col("doc_id").as("_del_id"), lit(seq).as("_del_seq")) }
        .reduce(_ unionByName _)
      data.join(broadcast(dels),
          data("doc_id") === dels("_del_id") &&
            dels("_del_seq") > data("_commit_seq"), "left_anti")
        .drop("_commit_seq")
    }
  }

  /** The manifest-stats file-skipping decision for a doc_ord range scan of
    * version `version`: (kept, skipped) file names. A file is skipped ONLY
    * when its snapshot recorded a doc_ord range for it and that range
    * cannot intersect [loOrd, hiOrd] — files without stats (no doc_ord
    * column, legacy adoption) are conservatively kept. Exposed separately
    * so specs and queries can pin that planning-time skipping actually
    * happened (the poison-file proof: a skipped file can be garbage on
    * disk and the range read must still succeed). */
  def pruneInfo(dir: String, version: Int, loOrd: Long, hiOrd: Long)
      : (Seq[String], Seq[String]) =
    pruneInfoBy(dir, version, "doc_ord", loOrd, hiOrd)

  /** [[pruneInfo]] under partition-spec evolution: each file prunes by
    * the stats of the SNAPSHOT THAT WROTE IT, and only when that
    * snapshot's spec column matches the predicate column — files written
    * under a different (older/newer) spec are kept conservatively, which
    * is exactly Iceberg's cross-spec scan behavior: evolving the spec
    * never rewrites old data, it changes how NEW files prune. */
  def pruneInfoBy(dir: String, version: Int, specCol: String,
      lo: Long, hi: Long): (Seq[String], Seq[String]) = {
    require(lo <= hi, s"empty $specCol range [$lo, $hi]")
    val effective = effectiveSnaps(dir, version)
    val kept = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set[String]()
    effective.foreach { s =>
      s.files.foreach { f =>
        if (seen.add(f)) {
          val keep =
            if (s.spec != specCol) true
            else s.stats.get(f) match {
              case Some((mn, mx)) => mx >= lo && mn <= hi
              case None => true
            }
          if (keep) kept += f else skipped += f
        }
      }
    }
    (kept.result(), skipped.result())
  }

  /** Range scan with Iceberg-style manifest pruning: read version `version`
    * restricted to `doc_ord BETWEEN loOrd AND hiOrd`, planning the scan
    * over ONLY the files whose recorded ord range intersects — at 100 TB
    * the driver skips whole files from the listing, so a narrow range
    * costs the matching files, not a table scan + filter. The residual
    * exact filter still applies (file ranges are coarse); merge-on-read
    * deletes still apply (see [[assemble]]). */
  def readRange(spark: SparkSession, dir: String, version: Int,
      loOrd: Long, hiOrd: Long): DataFrame =
    readRangeBy(spark, dir, version, "doc_ord", loOrd, hiOrd)

  /** [[readRange]] on an arbitrary spec column — the spec-evolution read
    * path: files prune under whatever spec they were written with
    * ([[pruneInfoBy]]); the residual exact filter still applies. */
  def readRangeBy(spark: SparkSession, dir: String, version: Int,
      specCol: String, lo: Long, hi: Long): DataFrame = {
    val (kept, _) = pruneInfoBy(dir, version, specCol, lo, hi)
    val keptSet = kept.toSet
    val pruned = effectiveSnaps(dir, version)
      .map(s => s.copy(files = s.files.filter(keptSet)))
    assemble(spark, dir, version, pruned)
      .filter(col(specCol).between(lo, hi))
  }

  /** Incremental read: the rows ADDED by snapshots `fromExclusive+1 ..
    * toInclusive` — Iceberg's incremental-scan contract for an append-only
    * table. A downstream consumer processes each commit's delta without
    * ever rescanning the table: the file set IS the change set, so the
    * scan reads exactly the new files and nothing else. Fails loudly if
    * the range crosses a compaction rebase (the per-commit file identity
    * is gone there — resume from the rebase instead). */
  def changesBetween(spark: SparkSession, dir: String,
      fromExclusive: Int, toInclusive: Int): DataFrame = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"no snapshots under ${dir}_manifest")
    require(fromExclusive >= 0 && toInclusive > fromExclusive &&
      toInclusive <= snaps.last.seq,
      s"bad range ($fromExclusive, $toInclusive] over 1..${snaps.last.seq}")
    val range = snaps.filter(s => s.seq > fromExclusive && s.seq <= toInclusive)
    // every seq in the range must still have metadata — an expired
    // snapshot inside the range would silently drop its delta
    require(range.size == toInclusive - fromExclusive,
      s"range ($fromExclusive, $toInclusive] has expired snapshots — " +
        s"present seqs: ${range.map(_.seq).mkString(",")}")
    require(!range.exists(_.full),
      s"range ($fromExclusive, $toInclusive] crosses a compaction rebase — " +
        "per-commit deltas are gone; resume from the rebase snapshot")
    // a delete snapshot is a retraction, not an append — an append-only
    // delta consumer would silently keep rows the table no longer has;
    // consume `<dir>_deletes/<runId>` explicitly instead
    require(!range.exists(_.deletes.nonEmpty),
      s"range ($fromExclusive, $toInclusive] contains row-level deletes " +
        s"(${range.filter(_.deletes.nonEmpty).map(_.runId).mkString(", ")}) " +
        "— incremental read is append-only; consume the delete sets explicitly")
    val files = range.flatMap(_.files).distinct.map(n => s"$dir/$n")
    val missing = files.filterNot(f => Files.exists(Paths.get(f)))
    require(missing.isEmpty, s"delta files rewritten by a later compaction: " +
      missing.take(3).mkString(", "))
    spark.read.parquet(files: _*)
  }

  /** Iceberg DESCRIBE HISTORY: the snapshot log as a DataFrame — the
    * audit surface an operator consults before time travel, rollback, or
    * incremental consumption (which version did the bad parser land? what
    * did the takedown remove?). Metadata-only: one manifest-dir listing,
    * no data file touched; [[expireSnapshots]] is what keeps this listing
    * bounded at one-commit-per-micro-batch cadence. `rows` carries each
    * snapshot's own semantics (commit/upsert = rows written, delete =
    * tombstone keys, rollback = 0 by design). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    snapshots(dir)
      .map(s => (s.seq, s.runId, s.rows, s.full, s.files.size,
        s.deletes.size, s.rollbackOf))
      .toDF("seq", "run_id", "rows", "is_full", "n_files",
        "n_delete_sets", "rollback_of")
  }

  /** CDC changelog read (Iceberg's create_changelog_view): the row-level
    * changes of snapshots `fromExclusive+1 .. toInclusive` as
    * (_change_type insert|delete, _commit_seq, row...). Where
    * [[changesBetween]] REFUSES a range containing row-level deletes
    * (its contract is append-only), cdcBetween makes them consumable: a
    * downstream mirror applies inserts and deletes in _commit_seq order
    * and lands exactly at the upstream state — the takedown propagation
    * path. Costs: an insert leg reads exactly the commit's files (O(delta),
    * the change set IS the file set); a delete leg materializes the
    * deleted rows' CONTENT by scanning the pre-state version filtered to
    * the (broadcast) delete keys — the honest price of row content; a
    * consumer that only needs KEYS should read `<dir>_deletes/<runId>`
    * directly and skip that scan. Still refuses crossing a FULL rebase
    * (compact/upsert/rollback): per-row change identity is not recorded
    * there — resume from the rebase. */
  def cdcBetween(spark: SparkSession, dir: String,
      fromExclusive: Int, toInclusive: Int): DataFrame = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"no snapshots under ${dir}_manifest")
    require(fromExclusive >= 0 && toInclusive > fromExclusive &&
      toInclusive <= snaps.last.seq,
      s"bad range ($fromExclusive, $toInclusive] over 1..${snaps.last.seq}")
    val range = snaps.filter(s => s.seq > fromExclusive && s.seq <= toInclusive)
    require(range.size == toInclusive - fromExclusive,
      s"range ($fromExclusive, $toInclusive] has expired snapshots — " +
        s"present seqs: ${range.map(_.seq).mkString(",")}")
    require(!range.exists(_.full),
      s"range ($fromExclusive, $toInclusive] crosses a full rebase " +
        "(compact/upsert/rollback) — per-row change identity is gone; " +
        "resume from the rebase snapshot")
    val legs = range.flatMap { s =>
      val ins =
        if (s.files.isEmpty) Nil
        else Seq(spark.read.parquet(s.files.map(n => s"$dir/$n"): _*)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_seq", lit(s.seq)))
      val del =
        if (s.deletes.isEmpty || s.seq <= 1) Nil
        else {
          // no distinct: each set is distinct on disk, and a semi-join is
          // insensitive to duplicate build-side keys — skipping it keeps
          // the whole leg exchange-free (plan-pinned)
          val keys = s.deletes
            .map(d => spark.read.parquet(s"${dir}_deletes/$d"))
            .reduce(_ unionByName _).select("doc_id")
          // pre-state rows are all committed before this snapshot, so the
          // sequence rule (delete only earlier commits) is the semi-join
          Seq(readAt(spark, dir, s.seq - 1)
            .join(broadcast(keys), Seq("doc_id"), "left_semi")
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_seq", lit(s.seq)))
        }
      ins ++ del
    }
    require(legs.nonEmpty,
      s"range ($fromExclusive, $toInclusive] contains no row changes")
    legs.reduce(_ unionByName _)
  }

  /** Copy-on-write upsert — the "re-extract after a parser fix" path:
    * incoming rows REPLACE committed rows with the same doc_id, all other
    * rows carry over, and the result is logged as a FULL (rebase)
    * snapshot listing only the rewritten files. Old data files are left
    * on disk so earlier versions stay time-travelable until a vacuum (or
    * the next compaction) expires them — whereas compact() deletes them
    * immediately; upsert is the gentler rebase. One shuffle-free plan:
    * current-state scan anti-joined against the (broadcast) incoming ids,
    * unioned with the incoming rows. Returns rows in the new state. */
  def upsert(df: DataFrame, dir: String, runId: String): Long = {
    val spark = df.sparkSession
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"upsert needs an existing committed table at $dir")
    // incoming must be one row per doc: only the anti-join side is
    // distinct'd, so a duplicated incoming id would otherwise land twice
    // in the rebase and silently break the one-row-per-doc invariant
    val nDups = df.groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    require(nDups == 0,
      s"upsert input has $nDups doc_ids with multiple rows — dedupe first")
    val cur = readAt(spark, dir, snaps.last.seq)
    val kept = cur.join(broadcast(df.select("doc_id").distinct()),
      Seq("doc_id"), "left_anti")
    // instrumented write: rows + per-file ord stats come from the write
    // job's own accumulator instead of a separate read-back scan of the
    // freshly-written files (one job + one shuffle fewer per upsert)
    val (rows, added, stats) = writeInstrumented(
      kept.unionByName(df.select(cur.columns.map(col): _*)), dir, runId)
    writeSnapshot(dir, runId, added, rows, full = true, stats = stats)
    rows
  }

  /** Merge-on-read equality delete — the takedown / right-to-be-forgotten
    * path. At 100 TB a handful of removals must not rewrite data files
    * (that is what upsert/compact cost); instead the distinct doc_ids land
    * as a tiny delete set under `<dir>_deletes/<runId>` and a DELTA
    * snapshot records it. Every subsequent [[readAt]] applies the set as a
    * broadcast anti-join against rows committed before it; [[compact]]
    * materializes the deletes into rewritten files and drops the sets;
    * [[vacuum]] removes sets no live snapshot references. A doc_id
    * re-committed AFTER the delete is visible again (sequence rule), which
    * is exactly the delete-then-re-extract flow. Snapshot.rows for a
    * delete snapshot = number of delete keys. Returns that count.
    *
    * Note [[resumeFilter]] reads the latest version, so a deleted doc
    * still present in the input is treated as uncommitted and will be
    * re-extracted by the next run — for a permanent takedown, remove the
    * doc from the input corpus too. */
  def deleteWhere(ids: DataFrame, dir: String, runId: String): Long = {
    val spark = ids.sparkSession
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"deleteWhere needs a committed table at $dir")
    val delDir = s"${dir}_deletes/$runId"
    require(!Files.exists(Paths.get(delDir)),
      s"delete set $runId already exists at $delDir")
    val keys = ids.select("doc_id").distinct()
    // ONE job: write the set, then read the key count from the written
    // file's parquet footer (metadata-only) — previously a separate
    // count() action ran the whole distinct first and the write ran it
    // again. The empty-tombstone refusal is enforced after the write by
    // removing the empty set — same contract (no empty delete snapshot is
    // ever logged).
    keys.coalesce(1).write.parquet(delDir)
    val n = parquetNames(delDir).toSeq
      .map(f => footerStats(s"$delDir/$f", "doc_id")._1).sum
    if (n == 0) {
      deleteRecursively(new java.io.File(delDir))
      require(n > 0, s"deleteWhere matched no doc_ids — refusing to log " +
        "an empty delete snapshot")
    }
    writeSnapshot(dir, runId, Nil, n, deletes = Seq(runId))
    n
  }

  /** MERGE — the Iceberg/Delta `MERGE INTO` analog, the three DML verbs as
    * ONE ATOMIC SNAPSHOT (a CDC consumer or an auditor never observes the
    * half-applied states a deleteWhere-then-commit sequence exposes):
    *
    *  - source rows whose doc_id is committed and match `deleteWhen`
    *    → DELETED (WHEN MATCHED AND cond THEN DELETE);
    *  - other matched source rows → UPDATED, i.e. replace the committed
    *    row (WHEN MATCHED THEN UPDATE SET *);
    *  - unmatched source rows (not delete-flagged) → INSERTED
    *    (WHEN NOT MATCHED THEN INSERT *); unmatched delete-flagged rows
    *    are ignored (nothing to delete).
    *
    * Merge-on-read mechanics: all matched doc_ids land as one tombstone
    * set (updates must mask their old rows too) and the updated + inserted
    * rows land as appended data files — BOTH recorded by a single delta
    * snapshot. Within that snapshot the strict `del_seq > commit_seq`
    * sequence rule means the tombstones hit only OLDER commits, so the
    * snapshot's own appends carry the new row versions. No committed data
    * file is rewritten at any table size; [[compact]] materializes the
    * merge later, [[cdcBetween]] reads it as delete(old) + insert(new) —
    * the standard changelog spelling of an update.
    *
    * Scale shape: matched ids are found by streaming the current state
    * once against the BROADCAST source ids (map-side semi join); every
    * other join broadcasts source-derived frames. Returns
    * (updated, deleted, inserted) counts; refuses an all-no-op merge. */
  def merge(source: DataFrame, dir: String, runId: String,
      deleteWhen: Column = lit(false)): (Long, Long, Long) = {
    val spark = source.sparkSession
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"merge needs an existing committed table at $dir")
    val nDups = source.groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    require(nDups == 0,
      s"merge source has $nDups doc_ids with multiple rows — dedupe first")
    val delDir = s"${dir}_deletes/$runId"
    require(!Files.exists(Paths.get(delDir)),
      s"delete set $runId already exists at $delDir")
    val cur = readAt(spark, dir, snaps.last.seq)
    // one pass over the current state, source ids broadcast; the result is
    // at most source-sized, persisted so the consumers below don't
    // re-scan the table per leg
    val matchedIds = cur.select("doc_id")
      .join(broadcast(source.select("doc_id")), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE aggregation job computes all three verb counts (previously
      // three separate count() actions over the same joined frame — two
      // redundant passes; guide §1.2: fewer passes first)
      val verbRow = source
        .join(broadcast(matchedIds.withColumn("__m", lit(true))),
          Seq("doc_id"), "left")
        .select(coalesce(col("__m"), lit(false)).as("__m"),
          deleteWhen.as("__del"))
        .agg(
          sum(when(col("__m") && !col("__del"), 1L).otherwise(0L)).as("u"),
          sum(when(col("__m") && col("__del"), 1L).otherwise(0L)).as("d"),
          sum(when(!col("__m") && !col("__del"), 1L).otherwise(0L)).as("i"))
        .head()
      def cnt(i: Int): Long =
        if (verbRow.isNullAt(i)) 0L else verbRow.getLong(i) // empty source
      val (nUpd, nDel, nIns) = (cnt(0), cnt(1), cnt(2))
      require(nUpd + nDel + nIns > 0,
        "merge matched nothing and inserts nothing — refusing an empty snapshot")
      val matched = source.join(broadcast(matchedIds), Seq("doc_id"), "left_semi")
      val updates = matched.filter(!deleteWhen)
      val inserts = source
        .join(broadcast(matchedIds), Seq("doc_id"), "left_anti")
        .filter(!deleteWhen)
      val outCols = cur.columns.map(col).toSeq
      val appends = updates.select(outCols: _*)
        .unionByName(inserts.select(outCols: _*))
      // instrumented append: rows + per-file ord stats gathered inside the
      // write job itself — the separate read-back stats scan (one extra
      // job + shuffle per merge) is gone
      val (nApp, added, stats) = writeInstrumented(appends, dir, runId)
      if (nUpd + nDel > 0) {
        matchedIds.coalesce(1).write.parquet(delDir)
        writeSnapshot(dir, runId, added, nApp, deletes = Seq(runId),
          stats = stats)
      } else writeSnapshot(dir, runId, added, nApp, stats = stats)
      (nUpd, nDel, nIns)
    } finally {
      matchedIds.unpersist(blocking = false)
      ()
    }
  }

  /** Orphan-file cleanup (Iceberg's remove_orphan_files): delete parquet
    * files in the data dir that NO live snapshot references — the debris
    * of a run that crashed after writing data files but before logging
    * its snapshot. Committed data is untouched (the live file set is the
    * union of every snapshot's files from the latest full rebase onward,
    * i.e. exactly what readAt(latest) would read). Returns the deleted
    * file names. Single-writer maintenance op, like compact(). */
  def vacuum(dir: String): Seq[String] = {
    val snaps = snapshots(dir)
    // a table with data but NO snapshot log is not ours to clean — without
    // the log every file would look orphaned and vacuum would empty it
    require(snaps.nonEmpty, s"vacuum needs a snapshot log under ${dir}_manifest")
    // the live stack resolves a rollback head to its target's stack — a
    // rollback snapshot itself lists no files, but the state it restores
    // is live and its files must not be vacuumed as orphans
    val liveSnaps = effectiveSnaps(dir, snaps.last.seq)
    // staged (write-audit-publish) batches are live-until-decided: their
    // files are referenced by staged markers, not snapshots — vacuum must
    // not destroy a batch an auditor is still looking at. (staged() also
    // self-heals here: a stale marker left by a crashed publish is dropped
    // from the listing, so ITS files are protected via the snapshot.)
    val stagedLive = staged(dir).flatMap(_.files).toSet
    // tagged versions stay readable until their tag is dropped: their
    // stacks' files (and delete sets, below) are live too
    val tagged = taggedStacks(dir, snaps)
    // live branches keep their own commits AND their base stacks readable
    val branched = branchStacks(dir, snaps)
    val live = (liveSnaps ++ tagged ++ branched).flatMap(_.files).toSet ++
      stagedLive
    val orphans = (parquetNames(dir) -- live).toSeq.sorted
    orphans.foreach(n => Files.deleteIfExists(Paths.get(s"$dir/$n")))
    // delete sets referenced by no live snapshot (expired by a rebase, or
    // debris of a crashed deleteWhere) go the same way
    val liveDels = (liveSnaps ++ tagged ++ branched).flatMap(_.deletes).toSet
    val delRoot = new java.io.File(s"${dir}_deletes")
    val delOrphans = Option(delRoot.listFiles()).getOrElse(Array.empty)
      .collect { case f if !liveDels.contains(f.getName) => f.getName }
      .toSeq.sorted
    delOrphans.foreach(n => deleteRecursively(new java.io.File(delRoot, n)))
    // stale staged markers (publish crashed after its snapshot write)
    // are metadata debris — the snapshot owns the files now
    val publishedRuns = snaps.map(_.runId).toSet
    val staleMarkers = Option(new java.io.File(dir + "_manifest").listFiles())
      .getOrElse(Array.empty)
      .collect { case f if f.getName.startsWith("staged-") &&
          f.getName.endsWith(".json") &&
          publishedRuns.contains(
            f.getName.stripPrefix("staged-").stripSuffix(".json")) =>
        f.getName
      }.toSeq.sorted
    staleMarkers.foreach(n =>
      Files.deleteIfExists(Paths.get(s"${dir}_manifest/$n")))
    orphans ++ delOrphans.map(n => s"_deletes/$n") ++
      staleMarkers.map(n => s"_manifest/$n")
  }

  // ------------------------------------------------------------ tags
  /** Iceberg-style named refs (tags): a durable anchor to a table version
    * — "the corpus exactly as trained on" for audit/reproduction. A tag is
    * one metadata file (`tag-<name>.json` beside the snapshots); it pins
    * nothing by copying — it PROTECTS: [[expireSnapshots]] never expires a
    * tagged version's effective stack, and [[vacuum]] keeps that stack's
    * data files and delete sets alive. [[compact]] — the eager space
    * reclaimer that deletes superseded files outright — refuses while any
    * tag exists (drop or re-point tags first; [[upsert]] is the
    * tag-friendly rebase, it leaves old files for vacuum to judge). */
  def tag(dir: String, name: String, version: Int): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad tag name: '$name'")
    val snaps = snapshots(dir)
    require(snaps.exists(_.seq == version),
      s"cannot tag version $version: unknown or expired " +
        s"(present: ${snaps.map(_.seq).mkString(",")})")
    val p = Paths.get(s"${dir}_manifest/tag-$name.json")
    require(!Files.exists(p), s"tag '$name' already exists — dropTag first")
    Files.writeString(p, s"""{"name":"$name","seq":$version}""")
    ()
  }

  /** All tags: name -> pinned version. */
  def tags(dir: String): Map[String, Int] = {
    val manifestDir = new java.io.File(dir + "_manifest")
    Option(manifestDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("tag-") && f.getName.endsWith(".json"))
      .map { f =>
        val s = Files.readString(f.toPath)
        val name = """"name":"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
        val seq = """"seq":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
        name -> seq
      }.toMap
  }

  def dropTag(dir: String, name: String): Unit = {
    val p = Paths.get(s"${dir}_manifest/tag-$name.json")
    require(Files.exists(p), s"no such tag: '$name'")
    Files.delete(p)
  }

  /** Read the table as of a tag — readAt with the name resolved. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame = {
    val t = tags(dir)
    require(t.contains(name), s"no such tag: '$name' (have: ${t.keys.mkString(",")})")
    readAt(spark, dir, t(name))
  }

  /** The effective stacks of every tagged version — the snapshots (and
    * through them, files + delete sets) that tags protect. */
  private def taggedStacks(dir: String, snaps: Seq[Snapshot]): Seq[Snapshot] =
    tags(dir).values.toSeq.distinct.flatMap { v =>
      // same resolution as the read path — a tag on (or above) a rollback
      // protects the delegated target stack too
      effectiveSnaps(dir, v)
    }

  // ------------------------------------------------------------ branches
  /** Iceberg-style BRANCHES: a writable named ref. Where a tag ([[tag]])
    * pins a version read-only, a branch accepts its own commits — staged
    * work (an audit corpus, a re-extraction experiment) accumulates on the
    * branch while `main` stays untouched, then lands atomically via
    * [[fastForward]] or is discarded via [[dropBranch]]. This generalizes
    * the single-batch write-audit-publish flow ([[stage]]/[[publish]]) to
    * MULTI-commit audits.
    *
    * Mechanics: a branch is a sub-log under the main manifest dir
    * (`<dir>_manifest/branch-<name>/`) holding a base pointer + its own
    * snapshot files; branch DATA files live in the table dir like any
    * other commit but are referenced only by the branch log, so main
    * readers never see them. Branch snapshots number CONTINUING from the
    * base seq, which keeps merge-on-read delete ordering global and makes
    * fast-forward a pure metadata copy. Branch commits are APPENDS
    * ([[commitToBranch]]); rebases (upsert/compact) stay main-only.
    * [[vacuum]] / [[expireSnapshots]] protect branch logs and their base
    * stacks; [[compact]] refuses while branches exist (same contract as
    * tags). */
  def createBranch(dir: String, name: String, version: Int): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad branch name: '$name'")
    val snaps = snapshots(dir)
    require(snaps.exists(_.seq == version),
      s"cannot branch at version $version: unknown or expired " +
        s"(present: ${snaps.map(_.seq).mkString(",")})")
    effectiveSnaps(dir, version) // base must be readable NOW — fail here
    val d = Paths.get(branchPath(dir, name))
    require(!Files.exists(d), s"branch '$name' already exists — dropBranch first")
    Files.createDirectories(d)
    Files.writeString(d.resolve("base.json"),
      s"""{"name":"$name","base_seq":$version}""")
    ()
  }

  private def branchPath(dir: String, name: String) =
    s"${dir}_manifest/branch-$name"

  /** Live branches: name → (base version, number of branch commits). */
  def branches(dir: String): Map[String, (Int, Int)] = {
    val manifestDir = new java.io.File(dir + "_manifest")
    Option(manifestDir.listFiles()).getOrElse(Array.empty)
      .collect { case f if f.isDirectory && f.getName.startsWith("branch-") &&
          Files.exists(f.toPath.resolve("base.json")) =>
        val name = f.getName.stripPrefix("branch-")
        name -> (branchBase(dir, name), snapshotsAt(f).size)
      }.toMap
  }

  private def branchBase(dir: String, name: String): Int = {
    val p = Paths.get(branchPath(dir, name), "base.json")
    require(Files.exists(p), s"no such branch: '$name'")
    """"base_seq":(\d+)""".r.findFirstMatchIn(Files.readString(p))
      .get.group(1).toInt
  }

  private def branchSnaps(dir: String, name: String): Seq[Snapshot] =
    snapshotsAt(new java.io.File(branchPath(dir, name)))

  /** Append a batch to the branch: data files land in the table dir, the
    * snapshot lands in the branch log only — invisible to main readers. */
  def commitToBranch(df: DataFrame, dir: String, name: String,
      runId: String): Long = {
    val base = branchBase(dir, name)
    val (rows, added, stats) = writeInstrumented(df, dir, runId)
    val seq = math.max(base, branchSnaps(dir, name).lastOption
      .map(_.seq).getOrElse(0)) + 1
    writeSnapshotAt(Paths.get(branchPath(dir, name)), seq, runId, added,
      rows, stats = stats)
    rows
  }

  /** Doc-keyed REBASE on the branch — the branch-side analog of [[upsert]],
    * expressed merge-on-read (no data rewrite): a branch delete snapshot
    * tombstones df's doc_ids, then the new rows append. Seq ordering makes
    * it exact: base rows (seq ≤ base) fall to the delete (seq base+k), the
    * re-added rows (seq base+k+1) ride above it — so a candidate parser
    * revision can REPLACE docs on the branch while main readers see
    * nothing. [[fastForward]] carries the delete snapshot over verbatim. */
  def upsertToBranch(df: DataFrame, dir: String, name: String,
      runId: String): Long = {
    val base = branchBase(dir, name)
    val keys = df.select("doc_id").distinct()
    val delDir = s"${dir}_deletes/$runId"
    require(!Files.exists(Paths.get(delDir)),
      s"delete set $runId already exists at $delDir")
    val n = keys.count()
    require(n > 0, "upsertToBranch with no rows — nothing to rebase")
    keys.coalesce(1).write.parquet(delDir)
    val seqDel = math.max(base, branchSnaps(dir, name).lastOption
      .map(_.seq).getOrElse(0)) + 1
    writeSnapshotAt(Paths.get(branchPath(dir, name)), seqDel, s"$runId-del",
      Nil, n, deletes = Seq(runId))
    commitToBranch(df, dir, name, runId)
  }

  /** Read the branch head: the base version's effective stack plus every
    * branch commit on top. */
  def readBranch(spark: SparkSession, dir: String, name: String): DataFrame = {
    val base = branchBase(dir, name)
    val stack = effectiveSnaps(dir, base) ++ branchSnaps(dir, name)
    assemble(spark, dir, base, stack)
  }

  /** Land the branch on main — Iceberg's `fast_forward`: legal only while
    * main's head still IS the branch base (a diverged main means the
    * audit's premise is stale — re-branch and re-validate instead of
    * silently merging). Pure metadata: each branch snapshot is re-logged
    * onto main with the SAME seq it already carried (head == base makes
    * main's next seq the branch's first), then the branch is dropped.
    * Returns main's new head version. */
  def fastForward(dir: String, name: String): Int = {
    val base = branchBase(dir, name)
    val head = snapshots(dir).last.seq
    require(head == base,
      s"cannot fast-forward '$name': main advanced to $head past the " +
        s"branch base $base — drop the branch and re-stage the audit")
    val bs = branchSnaps(dir, name)
    require(bs.nonEmpty, s"branch '$name' has no commits to land")
    bs.foreach { s =>
      writeSnapshot(dir, s.runId, s.files, s.rows, s.full, s.deletes,
        s.stats, s.spec, s.rollbackOf)
    }
    dropBranch(dir, name)
    snapshots(dir).last.seq
  }

  /** Discard the branch: its log disappears; its data files become
    * orphans for the next [[vacuum]] to reclaim. */
  def dropBranch(dir: String, name: String): Unit = {
    val d = new java.io.File(branchPath(dir, name))
    require(d.isDirectory, s"no such branch: '$name'")
    deleteRecursively(d)
  }

  /** Every snapshot a live branch keeps alive: its own commits plus its
    * base version's effective stack. */
  private def branchStacks(dir: String, snaps: Seq[Snapshot]): Seq[Snapshot] =
    branches(dir).keys.toSeq.flatMap { n =>
      effectiveSnaps(dir, branchBase(dir, n)) ++ branchSnaps(dir, n)
    }

  /** Iceberg `rollback_to_snapshot` — restore the table to an earlier
    * version as a NEW commit, metadata-only. One snapshot file is written;
    * no data file is copied, rewritten, or even listed — at 100 TB the
    * "undo the bad parser deploy" path costs exactly one JSON write. The
    * rollback snapshot delegates to the target's effective stack at read
    * time (original seqs preserved, so merge-on-read delete ordering is
    * exact), history stays intact (the rolled-back-away versions remain
    * time-travelable until expiry), and later commits/upserts/deletes
    * stack on top of the restored state normally. `Snapshot.rows` is 0 for
    * a rollback: recording the restored row count would take a table scan,
    * defeating metadata-only. Returns the new snapshot's seq. */
  def rollback(dir: String, toVersion: Int, runId: String): Int = {
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"no snapshots under ${dir}_manifest")
    require(toVersion < snaps.last.seq,
      s"rollback target $toVersion is not an earlier version " +
        s"(current: ${snaps.last.seq})")
    // the target must be readable NOW — fail at rollback time with the
    // real reason (expired metadata, gapped stack), not at first read
    effectiveSnaps(dir, toVersion)
    writeSnapshot(dir, runId, Nil, rows = 0L, full = true,
      rollbackOf = Some(toVersion)).seq
  }

  /** Iceberg `expire_snapshots` — retention for the snapshot LOG itself.
    * [[vacuum]] reclaims DATA files the live stack no longer references;
    * what still grows without bound at one-snapshot-per-micro-batch
    * cadence is the METADATA: a 10^12-doc table commits millions of
    * snapshots and every snapshots() listing pays for all of them.
    * expireSnapshots deletes the metadata of snapshots that are
    * (a) STRICTLY BELOW the latest FULL rebase — the live read path never
    * consults them (effectiveSnaps stacks from that rebase up), and
    * (b) older than the `keepLast` most recent snapshots (the audit
    * retention window — Iceberg's retain_last).
    * Time travel to an expired version then fails loudly at the metadata
    * level; the CURRENT state is untouched by construction (nothing at or
    * above the rebase ever expires). Data files referenced only by
    * expired snapshots are already vacuum's business. Returns expired
    * runIds — empty when no full rebase exists yet: every delta is live
    * state and nothing may expire. */
  def expireSnapshots(dir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val snaps = snapshots(dir)
    require(snaps.nonEmpty, s"no snapshots under ${dir}_manifest")
    val baseIdx = snaps.lastIndexWhere(_.full)
    if (baseIdx < 0) return Nil
    val baseSeq = snaps(baseIdx).seq
    val keepFromSeq = snaps(math.max(0, snaps.size - keepLast)).seq
    // tags protect their whole effective stack (protecting the tagged seq
    // alone could leave it unreadable — its deltas-below would be gone);
    // branches protect their base stacks the same way
    val tagProtected = (taggedStacks(dir, snaps) ++ branchStacks(dir, snaps))
      .map(_.seq).toSet
    // the LIVE stack is protected too: when the latest rebase is a
    // rollback, the state it restores lives in snapshots BELOW baseSeq —
    // expiring them would break every future read of the current table
    val liveProtected = effectiveSnaps(dir, snaps.last.seq).map(_.seq).toSet
    val expired = snaps.filter(s => s.seq < baseSeq && s.seq < keepFromSeq &&
      !tagProtected(s.seq) && !liveProtected(s.seq))
    expired.foreach { s =>
      Files.deleteIfExists(Paths.get(
        f"${dir}_manifest/snapshot-${s.seq}%05d-${s.runId}.json"))
    }
    expired.map(_.runId)
  }

  /** Docs not yet present in the committed output. "Committed" is defined
    * by the SNAPSHOT LOG when one exists (readAt(latest)) — a run that
    * crashed after writing data files but before logging its snapshot did
    * NOT commit, and its docs must be reprocessed, not silently skipped
    * because debris parquet happens to contain their ids (vacuum() removes
    * that debris). Falls back to the raw directory for pre-snapshot dirs. */
  def resumeFilter(spark: SparkSession, docs: Dataset[DocRow],
      committedDir: String): Dataset[DocRow] = {
    import spark.implicits._
    val snaps = snapshots(committedDir)
    val committed =
      if (snaps.nonEmpty) Some(readAt(spark, committedDir, snaps.last.seq))
      // a dir whose ONLY content is staged (unpublished) batches has no
      // committed rows — the raw-dir legacy fallback must not count them
      else if (staged(committedDir).nonEmpty) None
      else if (Files.exists(Paths.get(committedDir)))
        Some(spark.read.parquet(committedDir))
      else None
    committed match {
      case None => docs
      case Some(df) =>
        val done = df.select("doc_id").distinct()
        docs.join(broadcast(done), Seq("doc_id"), "left_anti").as[DocRow]
    }
  }

  /** Rewrite a committed directory's many small files into `partitions`
    * large ones — the small-files compaction every incremental sink needs
    * (each resumed run appends its own files; a year of hourly commits is
    * thousands of parquet footers per scan task otherwise). The rewrite
    * goes to a fresh `<dir>_compact-<runId>` directory and is only then
    * atomically swapped in (rename), so a crash mid-compact leaves the
    * original intact; the lineage manifests are superseded by a single
    * compaction manifest recording the rewrite.
    *
    * Returns (filesBefore, filesAfter, rows). */
  def compact(spark: SparkSession, dir: String, partitions: Int,
      runId: String): (Int, Int, Long) = {
    require(partitions > 0)
    // the rewrite swaps the whole data dir — an undecided staged batch
    // (write-audit-publish) lives in that dir outside any snapshot and
    // would be silently destroyed; decide the audit first
    val pending = staged(dir)
    require(pending.isEmpty, "compact with undecided staged batches " +
      s"(${pending.map(_.runId).mkString(", ")}) — publish or abandon first")
    // compact deletes superseded files OUTRIGHT — it would destroy the
    // data a tag promises to keep readable; drop or re-point tags first
    // (upsert is the tag-friendly rebase: it leaves old files for vacuum,
    // and vacuum respects tags)
    val pinned = tags(dir)
    require(pinned.isEmpty, "compact would delete files tagged versions " +
      s"need (tags: ${pinned.keys.mkString(", ")}) — dropTag first")
    // a branch references both its own commits and its base stack —
    // the dir swap would destroy them; land or drop branches first
    val live = branches(dir)
    require(live.isEmpty, "compact would delete files live branches need " +
      s"(branches: ${live.keys.mkString(", ")}) — fastForward or dropBranch first")
    def parquetFiles(d: java.io.File): Int =
      Option(d.listFiles()).map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
    val before = parquetFiles(new java.io.File(dir))
    // compact the COMMITTED state, not the raw directory: after an
    // un-vacuumed upsert the dir still holds pre-rebase files (raw scan
    // would duplicate rows), and live delete sets must be materialized
    // into the rewrite — readAt(latest) is both, by definition
    val curSnaps = snapshots(dir)
    val df = if (curSnaps.nonEmpty) readAt(spark, dir, curSnaps.last.seq)
             else spark.read.parquet(dir)
    val tmp = s"${dir}_compact-$runId"
    // the rewrite CLUSTERS by doc_ord when the column exists (Iceberg's
    // rewrite_data_files with a sort order): range partitioning gives the
    // compacted files disjoint ord ranges, so readRange over a compacted
    // table prunes to exactly the overlapping files — without it a rewrite
    // would mix ords and degrade every stats range to the full span
    val clustered =
      if (df.columns.contains("doc_ord"))
        df.repartitionByRange(partitions, col("doc_ord"))
          .sortWithinPartitions("doc_ord")
      else df.coalesce(partitions)
    // instrumented rewrite: rows + per-file ord stats from the write job's
    // accumulator (mapPartitions preserves the sorted row order), instead
    // of a second full read of the freshly-compacted files
    deleteRecursively(new java.io.File(tmp)) // debris of a crashed attempt
    val (rows, _, tmpStats) = writeInstrumented(clustered, tmp, runId,
      writeManifest = false)
    // swap: old dir aside, compacted in, old removed
    val old = new java.io.File(dir)
    val aside = new java.io.File(s"${dir}_pre-$runId")
    require(old.renameTo(aside), s"rename $dir -> $aside failed")
    require(new java.io.File(tmp).renameTo(old), s"rename $tmp -> $dir failed")
    deleteRecursively(aside)
    val manifestDir = Paths.get(dir + "_manifest")
    Files.createDirectories(manifestDir)
    Files.writeString(manifestDir.resolve(s"compaction-$runId.json"),
      s"""{"run":"$runId","files_before":$before,"files_after":${parquetFiles(old)},"rows":$rows}""")
    // the compacted state is a NEW snapshot (full file listing); earlier
    // versions are now expired — readAt tells the caller so. File names
    // survive the directory rename, so the tmp-scan stats carry over.
    writeSnapshot(dir, s"compact-$runId", parquetNames(dir).toSeq, rows,
      full = true, stats = tmpStats)
    // the rewrite materialized every live delete; no snapshot references
    // the sets any more (compact expires aggressively, unlike upsert)
    deleteRecursively(new java.io.File(s"${dir}_deletes"))
    (before, parquetFiles(old), rows)
  }

  /** Append a batch and write its lineage manifest. Returns rows written.
    *
    * The per-file metrics (row counts, statsCol min/max) are read from the
    * freshly-written PARQUET FOOTERS — pure metadata, no second execution
    * of the plan and no extra Spark job (a read-back stats scan was one
    * extra job + shuffle per commit, and the earlier accumulator variant
    * forced the whole write through a row-encoder boundary that defeats
    * the columnar write path). The footers describe exactly the rows the
    * write committed, by construction.
    *
    * Frames without a `doc_ord` column (e.g. span tables keyed only by
    * doc_id) commit fine — their manifests carry null ord ranges.
    *
    * Legacy adoption: the FIRST commit into a directory that already holds
    * parquet files but no snapshot log (a pre-snapshot-era table, which
    * resumeFilter's raw-dir fallback treats as committed) adopts those
    * files as a baseline snapshot first — otherwise readAt(latest) would
    * under-report the table and vacuum would destroy the legacy files as
    * orphans. */
  def commit(df: DataFrame, dir: String, runId: String): Long = {
    val (rows, added, stats) = writeInstrumented(df, dir, runId)
    writeSnapshot(dir, runId, added, rows, stats = stats)
    rows
  }

  /** [[commit]] under an EVOLVED partition spec: per-file stats are
    * captured on `specCol` instead of doc_ord and the snapshot records
    * which spec its files prune under. Earlier commits keep their own
    * spec — nothing is rewritten; [[readRangeBy]] prunes each file under
    * the spec it was written with. */
  def commitWithSpec(df: DataFrame, dir: String, runId: String,
      specCol: String): Long = {
    require(df.schema.fieldNames.contains(specCol),
      s"spec column $specCol absent from commit schema " +
        df.schema.fieldNames.mkString("[", ",", "]"))
    require(df.schema(specCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"spec column $specCol must be BIGINT (stats are long ranges), got " +
        df.schema(specCol).dataType.simpleString)
    val (rows, added, stats) = writeInstrumented(df, dir, runId, specCol)
    writeSnapshot(dir, runId, added, rows, stats = stats, spec = specCol)
    rows
  }

  /** The shared write half of [[commit]] and [[stage]]: instrumented append
    * + lineage manifest + legacy adoption. Returns (rows, addedFiles,
    * perFileStats) for the caller to log as a snapshot or a staged batch. */
  private def writeInstrumented(df: DataFrame, dir: String, runId: String,
      statsCol: String = "doc_ord", writeManifest: Boolean = true)
      : (Long, Seq[String], Map[String, (Long, Long)]) = {
    val spark = df.sparkSession
    val filesBefore = parquetNames(dir)
    if (snapshots(dir).isEmpty && filesBefore.nonEmpty) {
      val legacyRows = spark.read
        .parquet(filesBefore.toSeq.map(n => s"$dir/$n"): _*).count()
      writeSnapshot(dir, "legacy-adopt", filesBefore.toSeq, legacyRows)
    }
    df.write.mode(SaveMode.Append).parquet(dir)
    val added = (parquetNames(dir) -- filesBefore).toSeq.sorted
    // per-file rows + statsCol ranges from the footers (metadata-only)
    val perFile = added.map(n => n -> footerStats(s"$dir/$n", statsCol))
    if (writeManifest) {
      val manifestDir = Paths.get(dir + "_manifest")
      Files.createDirectories(manifestDir)
      val lines = perFile.map { case (name, (rows, range)) =>
        val part = """part-(\d+)-""".r.findFirstMatchIn(name)
          .map(_.group(1).toInt).getOrElse(-1)
        val mnS = range.map(_._1.toString).getOrElse("null")
        val mxS = range.map(_._2.toString).getOrElse("null")
        s"""{"run":"$runId","partition":$part,"rows":$rows,""" +
          s""""min_doc_ord":$mnS,"max_doc_ord":$mxS}"""
      }
      Files.write(manifestDir.resolve(s"manifest-$runId.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    val rows = perFile.map(_._2._1).sum
    val stats = perFile.collect {
      case (n, (_, Some((mn, mx)))) => n -> (mn, mx)
    }.toMap
    (rows, added, stats)
  }

  /** Footer metadata of one freshly-written parquet file: (rowCount,
    * Option(min, max) of `statsCol` across its row groups). Metadata-only —
    * no Spark job, no data pages read. Stats are absent (conservative: the
    * file is never pruned) when the column is missing, non-long, or has no
    * non-null values. */
  private def footerStats(path: String, statsCol: String)
      : (Long, Option[(Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val ranges = blocks.flatMap { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == statsCol)
          .flatMap { c =>
            val s = c.getStatistics
            if (s == null || !s.hasNonNullValue) None
            else (s.genericGetMin, s.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some((mn.longValue, mx.longValue))
              case _ => None
            }
          }
      }
      val range =
        if (ranges.isEmpty) None
        else Some((ranges.map(_._1).min, ranges.map(_._2).max))
      (rows, range)
    } finally r.close()
  }

  // --------------------------------------------------- write-audit-publish
  /** A staged (unpublished) batch: data files on disk, no snapshot — the
    * Iceberg WAP pattern's audit branch. Invisible to every reader
    * ([[readAt]], [[resumeFilter]], [[snapshots]]) until [[publish]]. */
  final case class Staged(runId: String, files: Seq[String], rows: Long,
      stats: Map[String, (Long, Long)])

  private def stagedPath(dir: String, runId: String) =
    Paths.get(s"${dir}_manifest/staged-$runId.json")

  /** Write-audit-publish, step 1: land the batch's data files and a
    * `staged-<runId>.json` marker instead of a snapshot. The table's
    * readers cannot see the rows; [[readStaged]] gives the auditor the
    * would-be table; [[publish]] promotes, [[abandon]] discards. At 100 TB
    * this is how a risky backfill is validated without exposing partial or
    * wrong data to consumers — the data is written exactly once either
    * way. */
  def stage(df: DataFrame, dir: String, runId: String): Long = {
    require(!Files.exists(stagedPath(dir, runId)) &&
      !snapshots(dir).exists(_.runId == runId),
      s"run $runId already staged or published at $dir")
    val (rows, added, stats) = writeInstrumented(df, dir, runId)
    val statsJson = stats.toSeq.sortBy(_._1)
      .map { case (f, (mn, mx)) => s""""$f":[$mn,$mx]""" }.mkString(",")
    Files.writeString(stagedPath(dir, runId),
      s"""{"run":"$runId","rows":$rows,""" +
        s""""files":[${added.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""stats":{$statsJson}}""")
    rows
  }

  /** Staged batches awaiting audit. A staged marker whose runId already
    * has a snapshot is the debris of a publish that crashed between
    * snapshot write and marker cleanup — filtered out here (the publish
    * DID happen; the next publish/abandon call or vacuum clears it). */
  def staged(dir: String): Seq[Staged] = {
    val published = snapshots(dir).map(_.runId).toSet
    Option(new java.io.File(dir + "_manifest").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("staged-") && f.getName.endsWith(".json"))
      .sortBy(_.getName)
      .map { f =>
        val s = Files.readString(f.toPath)
        val run = """"run":"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
        val rows = """"rows":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
        val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s).get.group(1)
          .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty)
        val stats = """"stats":\{([^}]*)\}""".r.findFirstMatchIn(s)
          .map(m => """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r
            .findAllMatchIn(m.group(1))
            .map(e => e.group(1) -> (e.group(2).toLong, e.group(3).toLong))
            .toMap)
          .getOrElse(Map.empty[String, (Long, Long)])
        Staged(run, files.sorted, rows, stats)
      }.toSeq
      .filterNot(s => published.contains(s.runId))
  }

  /** The auditor's view: the current committed table PLUS the staged
    * batch — what the table WOULD be after publish. Audit invariants
    * (row counts, no duplicate doc_ids, quality gates) run here before
    * any reader can see the rows. */
  def readStaged(spark: SparkSession, dir: String, runId: String): DataFrame = {
    val st = staged(dir).find(_.runId == runId)
      .getOrElse(throw new IllegalArgumentException(
        s"no staged batch $runId at $dir"))
    val batch = spark.read.parquet(st.files.map(n => s"$dir/$n"): _*)
    val snaps = snapshots(dir)
    if (snaps.isEmpty) batch
    else readAt(spark, dir, snaps.last.seq).unionByName(batch)
  }

  /** Write-audit-publish, step 3a: promote the staged batch to a real
    * snapshot — one metadata write; the data files don't move. Idempotent
    * against the crash window: if the runId is already published, only the
    * stale marker is cleaned up. */
  def publish(dir: String, runId: String): Long = {
    val already = snapshots(dir).find(_.runId == runId)
    if (already.isDefined) {
      Files.deleteIfExists(stagedPath(dir, runId))
      return already.get.rows
    }
    val st = staged(dir).find(_.runId == runId)
      .getOrElse(throw new IllegalArgumentException(
        s"no staged batch $runId at $dir"))
    writeSnapshot(dir, runId, st.files, st.rows, stats = st.stats)
    Files.deleteIfExists(stagedPath(dir, runId))
    st.rows
  }

  /** Write-audit-publish, step 3b: the audit failed — drop the marker and
    * the batch's data files. The committed table never saw the rows.
    * Returns the removed file names. */
  def abandon(dir: String, runId: String): Seq[String] = {
    val st = staged(dir).find(_.runId == runId)
      .getOrElse(throw new IllegalArgumentException(
        s"no staged batch $runId at $dir"))
    Files.deleteIfExists(stagedPath(dir, runId))
    st.files.foreach(n => Files.deleteIfExists(Paths.get(s"$dir/$n")))
    st.files
  }
}
