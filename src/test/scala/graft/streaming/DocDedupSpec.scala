package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark
import graft.ops.Dedup

class DocDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming dup-groups == batch exactGroups, dups spanning the batch split") {
    // duplicate pairs placed so the replay's mid-corpus split separates
    // them: (0, 90), (1, 91), ... — state must merge across batches
    val docs = (0L until 100L).map { i =>
      val text = if (i >= 90) s"  Shared Text ${i - 90} " else s"unique text $i"
      DocDedup.Doc(i, if (i < 10) s"shared text ${i}  " else text)
    }
    val ds = spark.createDataset(docs)

    val got = DocDedup.replayDupGroups(spark, ds)
      .as[(String, Long, Long)].collect().sorted
    val want = Dedup.exactGroups(ds.toDF())
      .as[(String, Long, Long)].collect().sorted

    assert(got.length == want.length && got.sameElements(want))
    // and the dups really did merge: 10 groups of 2, keeper is the min id
    val dups = got.filter(_._2 == 2L)
    assert(dups.length == 10)
    assert(dups.forall(_._3 < 10L))
  }
}
