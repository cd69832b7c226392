package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("misra-gries superset guarantee: count > n/(k+1) always survives") {
    val k = 10
    val mg = new HeavyHitters.MisraGries(k)
    val rnd = new scala.util.Random(5)
    // 900 noise tokens over a 300-word vocab + 120 copies of the hitter:
    // 120 > 1020/11 = 92.7, so "hot" must survive any stream order
    val stream = rnd.shuffle(
      Seq.fill(900)(s"w${rnd.nextInt(300)}") ++ Seq.fill(120)("hot"))
    val buf = stream.foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(buf).contains("hot"))
  }

  test("misra-gries merge keeps the guarantee across split streams") {
    val k = 10
    val mg = new HeavyHitters.MisraGries(k)
    val rnd = new scala.util.Random(9)
    val stream = rnd.shuffle(
      Seq.fill(900)(s"w${rnd.nextInt(300)}") ++ Seq.fill(120)("hot"))
    val parts = stream.grouped(137).toSeq
      .map(_.foldLeft(mg.zero)(mg.reduce))
    val merged = parts.reduce(mg.merge)
    assert(mg.finish(merged).contains("hot"))
    assert(merged.size <= k)
  }

  test("frequentTokens equals the brute-force groupBy, any partitioning") {
    val rnd = new scala.util.Random(7)
    // skewed corpus: 3 hot words + a 500-word noise tail
    val docs = Seq.tabulate(100) { i =>
      val words = Seq.fill(30)(rnd.nextInt(10) match {
        case 0 | 1 | 2 => "alpha"
        case 3 | 4     => "beta"
        case 5         => "gamma"
        case _         => s"n${rnd.nextInt(500)}"
      })
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

    def brute(df: org.apache.spark.sql.DataFrame) = {
      val toks = df.select(TextAnalysis.tokens(col("text")).as("toks"))
      val total = toks.agg(sum(size(col("toks"))).cast("long")).as[Long].head()
      toks.select(explode(col("toks")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 400 > lit(total))
    }
    val want = brute(docs).as[(String, Long)].collect().sorted.toSeq
    val got1 = HeavyHitters.frequentTokens(docs.repartition(1), "text")
      .as[(String, Long)].collect().sorted.toSeq
    val got7 = HeavyHitters.frequentTokens(docs.repartition(7), "text")
      .as[(String, Long)].collect().sorted.toSeq
    assert(want.nonEmpty && got1 == want && got7 == want)
  }
}
