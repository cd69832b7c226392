package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each point row with every interval row whose
  * [lo, hi] contains it — the join family Spark's optimizer turns into a
  * BroadcastNestedLoopJoin (or a cartesian product) because the predicate
  * has no equality component.
  *
  * Scale shape: BIN BUCKETING manufactures the missing equi-key. Each point
  * maps to exactly one bin (floor(x / binWidth)); each interval explodes to
  * the bins it overlaps. The join is then a plain hash equi-join on the bin
  * id — shuffled (or broadcast, when one side is small — Catalyst decides
  * from stats as usual) — followed by the exact BETWEEN filter. Work is
  * O(points + intervals * span/binWidth + true_matches) instead of
  * O(points * intervals); no nested loop ever materializes.
  *
  * Tuning/skew: pick binWidth near the median interval length — each
  * interval then explodes to ~2 bins, and a pathological long interval
  * degrades linearly (span/binWidth bins), never quadratically. A hot bin
  * (many points AND many intervals in one stripe) is an ordinary skewed
  * equi-join key, which AQE's skew-join split handles — exactly why the
  * bin id is manufactured as a JOIN key rather than handled by a custom
  * partitioner.
  *
  * Correctness: a point joins each overlapping interval exactly once (the
  * point's single bin meets each interval's bin list at most once — bin
  * lists are distinct by construction), so no dedupe pass is needed.
  *
  * All bin arithmetic is exact integer floor-division (`div` minus a
  * negative-remainder correction) — no double rounding, so epoch-micros
  * magnitudes are safe where floor(x / w) in doubles would not be.
  */
object RangeJoin {

  /** Exact floor-division of BIGINT column `c` by positive literal `w`,
    * as a SQL fragment (`div` truncates toward zero; correct by -1 when
    * the remainder is negative). */
  private def floorDivSql(c: String, w: Long): String =
    s"(($c div $w) - (CASE WHEN $c % $w < 0 THEN 1 ELSE 0 END))"

  /** Join points to the intervals containing them (inclusive on both ends).
    *
    * @param points    side with the point column; all its columns survive
    * @param intervals side with [lo, hi]; all its columns survive
    * @param x         BIGINT point column name on `points`
    * @param lo        BIGINT interval start column name on `intervals`
    * @param hi        BIGINT interval end column name (inclusive)
    * @param binWidth  bucket width in the same units as x/lo/hi (> 0);
    *                  choose ~ the median interval length
    * @return one row per (point, containing interval), carrying both sides'
    *         columns (names must not collide apart from the join internals)
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      x: String, lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", expr(floorDivSql(x, binWidth)))
    // hi < lo can contain nothing, and Spark's sequence() would generate a
    // DESCENDING bin list for it — drop such rows before exploding
    val iv = intervals.where(col(hi) >= col(lo))
      .withColumn("__bin",
        explode(sequence(expr(floorDivSql(lo, binWidth)),
          expr(floorDivSql(hi, binWidth)))))
    p.join(iv, Seq("__bin"))
      .where(col(x) >= col(lo) && col(x) <= col(hi))
      .drop("__bin")
  }
}
