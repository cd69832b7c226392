package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.layout.FixtureCorpus
import graft.pipeline.{Extract, TestSpark}

class StreamExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming extraction appends exactly the batch candidate rows") {
    val got = StreamExtract.replayCandidates(spark, FixtureCorpus.fixtureDocs)
      .collect()
      .map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted
    val want = FixtureCorpus.fixtureDocs
      .flatMap(d => Extract.extractDoc(d).candidates)
      .map(StreamExtract.candidateRow)
      .map(_.productIterator.map(String.valueOf).mkString("|")).sorted
    assert(want.nonEmpty)
    assert(got.toSeq == want)
  }

  test("batch boundaries do not change the result (1-batch vs 2-batch split)") {
    // replayCandidates always splits in two; a single-doc corpus makes the
    // first batch empty — the degenerate boundary must still work
    val one = FixtureCorpus.fixtureDocs.take(1)
    val got = StreamExtract.replayCandidates(spark, one).collect()
    val want = one.flatMap(d => Extract.extractDoc(d).candidates)
    assert(got.length == want.length)
  }
}
