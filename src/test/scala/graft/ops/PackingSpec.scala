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

  test("packSegments: straddling docs split exactly; docs and sequences tile") {
    import spark.implicits._
    // weights 5,3,10 at budget 4: offsets 0,5,8; doc 3 spans seqs 2..4
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 10L), (4L, 0L))
      .toDF("doc_id", "n_tokens")
    val segs = graft.ops.Packing
      .packSegments(docs, "doc_id", "n_tokens", budget = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 0L, 0L, 0L, 4L), (1L, 1L, 4L, 0L, 1L),
      (2L, 1L, 0L, 1L, 3L),
      (3L, 2L, 0L, 0L, 4L), (3L, 3L, 4L, 0L, 4L), (3L, 4L, 8L, 0L, 2L))
    assert(segs == want) // zero-weight doc 4 emits nothing
    // invariants on a bigger deterministic corpus: per doc, segments tile
    // the doc; per sequence, segments tile [0, budget) with no overlap
    val big = (0L until 200L).map(i => (i, (i * 7 % 23) + 1)).toDF("doc_id", "n_tokens")
    val rows = graft.ops.Packing
      .packSegments(big, "doc_id", "n_tokens", budget = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3); case _ => ()
      }
      assert(sorted.map(_._5).sum == (id * 7 % 23) + 1)
    }
    val total = (0L until 200L).map(i => (i * 7 % 23) + 1).sum
    rows.groupBy(_._2).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4); case _ => ()
      }
      val filled = sorted.map(_._5).sum
      // every sequence is full except the stream's last
      assert(filled == 16L || seq == (total - 1) / 16)
    }
  }
}
