package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2020-01-01 10:00:00"), 100L), // after r@09:00 -> 5
      (1L, ts("2020-01-01 12:00:00"), 101L), // after r@11:00 -> 7 (latest wins)
      (1L, ts("2020-01-01 08:00:00"), 102L), // before any right -> null
      (2L, ts("2020-01-01 10:00:00"), 103L), // key 2 has no right rows -> null
      (3L, ts("2020-01-01 09:30:00"), 104L)  // equal ts -> inclusive match 9
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts("2020-01-01 09:00:00"), 5L),
      (1L, ts("2020-01-01 11:00:00"), 7L),
      (3L, ts("2020-01-01 09:30:00"), 9L)
    ).toDF("user_id", "ts", "click_cents")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_cents"))

    val out = AsOf.asofJoin(left, right, key = "user_id", ts = "ts",
      leftCols = Seq("purchase_id"), rightCols = Seq("click_ts", "click_cents"))
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[Timestamp]("click_ts")), Option(r.getAs[Any]("click_cents"))))
      .toMap

    assert(out.size == 5) // every left row survives (left-join semantics)
    assert(out(100L) == (Some(ts("2020-01-01 09:00:00")), Some(5L)))
    assert(out(101L) == (Some(ts("2020-01-01 11:00:00")), Some(7L)))
    assert(out(102L) == (None, None))
    assert(out(103L) == (None, None))
    assert(out(104L) == (Some(ts("2020-01-01 09:30:00")), Some(9L))) // inclusive
  }

  test("random differential: window-carry result == brute-force latest-at-or-before") {
    val rnd = new scala.util.Random(17)
    def randTs() = ts(f"2020-01-${1 + rnd.nextInt(5)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
    val left = Seq.tabulate(600)(i => (rnd.nextInt(12).toLong, randTs(), i.toLong))
      .toDF("user_id", "ts", "purchase_id")
    // right unique per (key, ts) — the operator's documented requirement
    val right = Seq.tabulate(300)(i => (rnd.nextInt(12).toLong, randTs(), i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts", "click_cents")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_cents"))

    val got = AsOf.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_id"), Seq("click_ts", "click_cents"))
      .select("purchase_id", "click_ts", "click_cents")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2))))
      .sortBy(_._1)

    // brute force: per left row, scan all right rows of the key
    val rights = right.select("user_id", "ts", "click_cents")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val want = left.collect().map { l =>
      val (u, t, pid) = (l.getLong(0), l.getTimestamp(1), l.getLong(2))
      val best = rights.filter(r => r._1 == u && !r._2.after(t))
        .sortBy(_._2.getTime).lastOption
      (pid, best.map(_._2), best.map(_._3))
    }.sortBy(_._1)

    assert(got.length == want.length)
    got.zip(want).foreach { case ((gp, gt, gc), (wp, wt, wc)) =>
      assert(gp == wp && gt == wt && gc.map(_.asInstanceOf[Long]) == wc, s"purchase $gp")
    }
  }

  test("as-of join plan: one shuffle (the key window), no pair join") {
    val left = (0L until 200L).map(i => (i % 10, ts(f"2020-01-01 ${10 + (i % 12)}%02d:00:00"), i))
      .toDF("user_id", "ts", "purchase_id")
    val right = (0L until 50L).map(i => (i % 10, ts(f"2020-01-01 ${i % 10}%02d:30:00"), i))
      .toDF("user_id", "ts", "click_cents")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_cents"))
    val out = AsOf.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_id"), Seq("click_ts", "click_cents"))
    assert(out.count() == 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    assert(graft.io.Bucketed.shuffleExchangeCount(out) == 1, plan)
  }
}
