package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row of the same
  * key with right.ts <= left.ts (inclusive), or nulls when none exists —
  * the time-series enrichment join Spark has no built-in operator for.
  *
  * Implementation is the tagged-union + window-carry composition (the
  * builder-preferred "compose existing ops" path): both sides are unioned
  * with a side tag, one window per key ordered by (ts, side) carries the
  * latest right-side values forward with last(ignoreNulls), and left rows
  * are kept. Right rows sort BEFORE left rows at equal ts, which makes the
  * match inclusive.
  *
  * Scale shape: exactly ONE shuffle (the window's hash partition on the
  * key) and one within-partition sort — per-key work is linear. The
  * equality-free alternative (a range theta-join + max-per-left reduce)
  * explodes to |left| x |right| per key; this never materializes a pair.
  *
  * Requirement: the right side must be unique per (key, ts) — pre-aggregate
  * it otherwise — so "the" most recent row is well-defined (the same
  * requirement DuckDB's native ASOF JOIN has for a deterministic result,
  * which is exactly what the q24 oracle uses as the independent check).
  */
object AsOf {

  /** @param left      probe side; all its rows survive (left-join semantics)
    * @param right     reference side, unique per (key, ts); its `rightCols`
    *                  are carried onto each left row from the latest
    *                  right row with ts <= left ts
    * @param key       equality key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param leftCols  left payload columns to keep
    * @param rightCols right payload columns to carry (value columns only —
    *                  include a renamed copy of the right ts to surface the
    *                  matched row's time) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val lSchema = left.schema
    val rSchema = right.schema
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(rSchema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // each last() picks from the same latest right row: right rows carry
    // all rightCols non-null together (right is unique per (key, ts))
    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(c)): _*)
  }
}
