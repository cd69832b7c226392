package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregator top-k == window row_number top-k, ties included") {
    val rnd = new scala.util.Random(3)
    // deliberate value ties inside groups exercise the id tiebreak
    val rows = Seq.tabulate(3000)(i =>
      (i % 40L, (rnd.nextInt(20) * 1.5), i.toLong)).toDF("g", "v", "id")

    val got = TopK.topKByValue(rows, "g", "v", "id", k = 3)
      .as[(Long, Long, Int)].collect().sorted
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val want = rows.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).select(col("g"), col("id"), col("rn"))
      .as[(Long, Long, Int)].collect().sorted
    assert(got.length == want.length && got.sameElements(want))
  }

  test("plan: two-phase object hash aggregate, shuffle carries <= k per group per task") {
    val rows = Seq.tabulate(2000)(i => (i % 5L, i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = TopK.topKByValue(rows, "g", "v", "id", k = 3)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate = map-side combine is on; the
    // full-sort formulation would show Window + a global per-group Sort
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("groups smaller than k emit all their rows, ranked") {
    val rows = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (2L, 1.0, 20L)).toDF("g", "v", "id")
    val got = TopK.topKByValue(rows, "g", "v", "id", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }
}
