package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec

/** Hive-style partitioned parquet tables: the IO-layer analog of a
  * predicate — a filter on a partition column never touches the skipped
  * partitions' files AT ALL (directory-level pruning), where a pushed data
  * filter still opens every file and skips row groups by statistics. At
  * 100 TB the difference is reading one partition vs listing-and-opening a
  * million files.
  *
  * The scan-audit helpers expose what actually reached the scan —
  * PartitionFilters (directory pruning), PushedFilters (row-group
  * statistics pruning), ReadSchema (column pruning) — so tests pin the
  * physical behavior rather than trusting the logical plan.
  */
object Partitioned {

  /** Write `df` as parquet partitioned by `cols` (hive-style key=value
    * directories). Partition columns move into the directory structure and
    * are restored on read. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scan metadata of the (first) parquet file scan in `df`'s physical
    * plan: the keys of interest are "PartitionFilters", "PushedFilters",
    * "ReadSchema", and "Location". Empty map if the plan has no file scan. */
  def scanMetadata(df: DataFrame): Map[String, String] =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f.metadata
    }.getOrElse(Map.empty)

  /** (selected, total) partition-directory counts of the first file scan —
    * the direct measure of directory-level pruning. */
  def partitionCounts(df: DataFrame): (Int, Int) =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec =>
        (f.selectedPartitions.partitionCount,
          f.relation.location.listFiles(Nil, Nil).length)
    }.getOrElse((0, 0))
}
