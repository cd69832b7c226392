package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics in one pass: per column row count,
  * null count, exact distinct count, min and max (stringified AFTER the
  * typed min/max, so numerics compare numerically). One aggregation job
  * for every column together — Spark plans the multiple DISTINCT
  * aggregates via a single Expand, so the table is still scanned once.
  * At 100 TB swap countDistinct for approx_count_distinct per column
  * (same shape, sketch state) — exact is kept here because the driver
  * oracle compares exactly. */
object Profiler {

  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    cols.map { c =>
      (c, n, n - row.getAs[Long](s"cnt_$c"), row.getAs[Long](s"nd_$c"),
        row.getAs[String](s"min_$c"), row.getAs[String](s"max_$c"))
    }.toDF("column_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")
  }

  /** The same statistics as one UNION ALL per column in DuckDB SQL. */
  def tableStatsSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"SELECT '$c' AS column_name, count(*) AS n_rows, " +
        s"count(*) - count($c) AS n_nulls, " +
        s"count(DISTINCT $c) AS n_distinct, " +
        s"CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v " +
        s"FROM $table"
    }.mkString("\nUNION ALL ")
}
