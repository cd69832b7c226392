package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark
import graft.ops.Classifier

class StreamClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    val hi = (0L until 6L).map(i =>
      (i, ("signal " * 100) + s"prose $i", "en", "s", 0L))
    val lo = (6L until 12L).map(i =>
      (i, s"junk!! spam;; $i ??", "en", "s", 0L))
    (hi ++ lo).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def docsSeq = corpus.select("doc_id", "text")
    .as[StreamClassifier.Doc].collect().toSeq

  test("replayed per-batch scoring union equals batch nbQuality exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sc1").toString
    val streamed = StreamClassifier.replayScore(spark, corpus, docsSeq, dir,
      nBatches = 3).collect().map(_.toSeq).toSet
    val batch = Classifier.nbQuality(corpus).collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("batch boundaries are irrelevant: 1-batch and 4-batch replays agree") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-sc2").toString
    val d4 = java.nio.file.Files.createTempDirectory("graft-sc3").toString
    val a = StreamClassifier.replayScore(spark, corpus, docsSeq, d1, nBatches = 1)
      .collect().map(_.toSeq).toSet
    val b = StreamClassifier.replayScore(spark, corpus, docsSeq, d4, nBatches = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("the model lands as a persisted vocab-sized table before any batch runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sc4").toString
    StreamClassifier.replayScore(spark, corpus, docsSeq, dir, nBatches = 2)
    val model = spark.read.parquet(s"$dir/model")
    assert(model.columns.toSet == Set("w", "c1", "c0", "lr_micro"))
    val vocab = corpus.select(org.apache.spark.sql.functions.explode(
      graft.ops.Dedup.tokens(org.apache.spark.sql.functions.col("text"))))
      .filter(org.apache.spark.sql.functions.col("col") =!= "")
      .distinct().count()
    assert(model.count() == vocab)
  }
}
