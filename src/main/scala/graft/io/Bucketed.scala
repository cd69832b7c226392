package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table IO: the shuffle-free co-located join path.
  *
  * At 100 TB the dominant recurring cost of the per-doc merge and of any
  * doc-keyed enrichment join is the shuffle on `doc_id`. Writing both
  * sides bucketed by the join key (same bucket count) moves that shuffle
  * to WRITE TIME, once: every later sort-merge join between them needs no
  * exchange at all — Spark matches `HashPartitioning(doc_id, n)` output
  * partitioning from the bucket metadata. This is the "pre-partitioning /
  * bucketing for co-located joins" leg of the scale design (the others:
  * broadcast for small dims, salting for skew — SaltedExtract).
  *
  * Bucket metadata only exists through the catalog, so this writes
  * `saveAsTable` with an explicit path (external table; the parquet files
  * are plain parquet plus bucket spec in the catalog).
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int, keyCol: String): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Number of shuffle exchanges in the FINAL (post-AQE) physical plan of
    * an already-executed DataFrame — the observable fact the bucketed
    * layout is meant to change. Broadcast exchanges are not counted (they
    * move the small side, not the data). */
  def shuffleExchangeCount(df: DataFrame): Int = {
    // executedPlan after an action reflects AQE's final plan; stringly
    // counted to stay off private APIs. A FINALIZED adaptive plan prints
    // "== Final Plan ==" followed by "== Initial Plan ==" — count only the
    // final section or every exchange doubles.
    val plan = finalSection(df)
    "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
  }

  /** The executed plan string truncated to AQE's final plan (the whole
    * string when the plan never adapted or never executed). */
  def finalSection(df: DataFrame): String = {
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
  }
}
