package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf
import graft.pipeline.TestSpark
import java.sql.Timestamp

class AsOfJoinExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("physical as-of join: the hand cases, incl. inclusive match and no-match nulls") {
    val left = Seq(
      (1L, ts("2020-01-01 10:00:00"), 100L),
      (1L, ts("2020-01-01 12:00:00"), 101L),
      (1L, ts("2020-01-01 08:00:00"), 102L),
      (2L, ts("2020-01-01 10:00:00"), 103L),
      (3L, ts("2020-01-01 09:30:00"), 104L)
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts("2020-01-01 09:00:00"), 5L),
      (1L, ts("2020-01-01 11:00:00"), 7L),
      (3L, ts("2020-01-01 09:30:00"), 9L)
    ).toDF("user_id", "ts", "click_cents")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_cents"))

    val out = PhysicalAsOf.asofJoin(left, right, "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[Timestamp]("click_ts")), Option(r.getAs[Any]("click_cents"))))
      .toMap
    assert(out.size == 5)
    assert(out(100L) == (Some(ts("2020-01-01 09:00:00")), Some(5L)))
    assert(out(101L) == (Some(ts("2020-01-01 11:00:00")), Some(7L)))
    assert(out(102L) == (None, None))
    assert(out(103L) == (None, None))
    assert(out(104L) == (Some(ts("2020-01-01 09:30:00")), Some(9L)))
  }

  test("random differential: physical exec == window-carry composition") {
    val rnd = new scala.util.Random(29)
    def randTs() = ts(f"2020-01-${1 + rnd.nextInt(5)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
    for (trial <- 1 to 3) {
      val left = Seq.tabulate(400)(i => (rnd.nextInt(10).toLong, randTs(), i.toLong))
        .toDF("user_id", "ts", "purchase_id")
      val right = Seq.tabulate(250)(i => (rnd.nextInt(10).toLong, randTs(), i.toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("user_id", "ts", "click_cents")
        .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_cents"))
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("purchase_id", "click_ts", "click_cents").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2))))
        .sortBy(_._1).toSeq
      val got = norm(PhysicalAsOf.asofJoin(left, right, "user_id", "ts"))
      val want = norm(AsOf.asofJoin(left, right, "user_id", "ts",
        Seq("purchase_id"), Seq("click_ts", "click_cents")))
      assert(got == want, s"trial $trial")
    }
  }

  test("plan: AsOfJoinExec is planned with clustered exchanges, no pair join") {
    val left = Seq.tabulate(100)(i => (i % 5L, i.toLong, i.toLong))
      .toDF("user_id", "ts", "purchase_id")
    val right = Seq.tabulate(50)(i => (i % 5L, i * 2L, i.toLong))
      .toDF("user_id", "ts", "click_cents")
    val df = PhysicalAsOf.asofJoin(left, right, "user_id", "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }

  test("missing join column errors with the available columns listed") {
    val l = Seq((1L, 2L)).toDF("user_id", "ts")
    val r = Seq((1L, 2L)).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException](
      PhysicalAsOf.asofJoin(l, r, "no_such_key", "ts"))
    assert(e.getMessage.contains("no_such_key") && e.getMessage.contains("user_id"))
  }

  test("empty right side: every left row survives with null payload") {
    val l = Seq((1L, 10L, 100L), (2L, 20L, 101L)).toDF("user_id", "ts", "pid")
    val r = Seq.empty[(Long, Long, Long)].toDF("user_id", "ts", "cents")
    val got = PhysicalAsOf.asofJoin(l, r, "user_id", "ts")
      .select("pid", "cents").collect()
      .map(row => (row.getLong(0), Option(row.get(1)))).toMap
    assert(got == Map(100L -> None, 101L -> None))
  }

  test("self-source branches: conflicting attribute ids are deduplicated") {
    // both sides derive from ONE frame, so child outputs share expr ids —
    // the analyzer's DeduplicateRelations must rewrite our node's key/time
    val ev = Seq.tabulate(60)(i => (i % 4L, i.toLong, i.toLong, i % 2 == 0))
      .toDF("user_id", "ts", "v", "is_click")
    val l = ev.filter(!col("is_click")).select(col("user_id"), col("ts"), col("v").as("pid"))
    val r = ev.filter(col("is_click"))
      .select(col("user_id"), col("ts"), col("v").as("cents"))
    val got = PhysicalAsOf.asofJoin(l, r, "user_id", "ts").collect()
    assert(got.length == l.count())
  }
}
