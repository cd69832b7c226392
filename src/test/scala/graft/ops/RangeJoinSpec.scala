package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bin-bucketed range join == brute-force cross-join filter (random, incl. negatives)") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(400)(i => (i.toLong, rnd.nextLong() % 1000L))
      .toDF("point_id", "x")
    val intervals = Seq.tabulate(120) { i =>
      val lo = rnd.nextLong() % 1000L
      (i.toLong, lo, lo + rnd.nextInt(300) - 20L) // some empty (hi < lo)
    }.toDF("iv_id", "lo", "hi")

    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.pointsInIntervals(points, intervals, "x", "lo", "hi", w)
        .select("point_id", "iv_id").as[(Long, Long)].collect().sorted
      val want = points.crossJoin(intervals)
        .where(col("x") >= col("lo") && col("x") <= col("hi"))
        .select("point_id", "iv_id").as[(Long, Long)].collect().sorted
      assert(got.length == want.length && got.sameElements(want), s"binWidth=$w")
      // exactly-once: no dedupe pass exists, so pairs must already be unique
      assert(got.distinct.length == got.length, s"binWidth=$w produced dup pairs")
    }
  }

  test("plan: hash equi-join on the bin key, no nested loop / cartesian") {
    val points = Seq.tabulate(2000)(i => (i.toLong, i.toLong * 3)).toDF("point_id", "x")
    val intervals = Seq.tabulate(500)(i => (i.toLong, i * 10L, i * 10L + 9L))
      .toDF("iv_id", "lo", "hi")
    val out = RangeJoin.pointsInIntervals(points, intervals, "x", "lo", "hi", 10L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
