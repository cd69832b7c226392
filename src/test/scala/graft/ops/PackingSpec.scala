package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-pass packing == single-partition window prefix sum") {
    val rnd = new scala.util.Random(5)
    val docs = Seq.tabulate(5000)(i => (i.toLong * 7 % 100000, 1L + rnd.nextInt(900)))
      .toDF("doc_id", "n_tokens")

    val got = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 4096)
      .select("doc_id", "n_tokens", "stream_offset", "seq_id", "offset_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().sorted

    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("stream_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("stream_offset"),
        expr("stream_offset div 4096").as("seq_id"),
        expr("stream_offset % 4096").as("offset_in_seq"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted

    assert(got.length == want.length && got.sameElements(want))
  }

  test("plan has no SinglePartition exchange (the window version does)") {
    val docs = Seq.tabulate(500)(i => (i.toLong, 10L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 64)
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)

    val w = Window.orderBy("doc_id")
    val windowPlan = docs.withColumn("o", sum("n_tokens").over(w))
      .queryExecution.executedPlan.toString
    assert(windowPlan.contains("SinglePartition"), windowPlan) // the cliff being avoided
  }

  test("stream is contiguous: offsets tile the total token count") {
    val docs = Seq.tabulate(300)(i => (i.toLong, (i % 17) + 1L)).toDF("doc_id", "n_tokens")
    val rows = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 100)
      .select("doc_id", "n_tokens", "stream_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var expect = 0L
    rows.foreach { case (_, n, off) =>
      assert(off == expect)
      expect += n
    }
  }
}
