package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TestSpark

/** Driver-contract consistency guards. The driver's compare sorts columns
  * by name before hashing values, so duplicate (case-insensitive) or empty
  * column names would corrupt the comparison silently; and a query without
  * an oracle degrades to a rows-only check. Both are contract bugs this
  * spec turns into test failures. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracles cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"only-query=${(q -- o).toSeq.sorted} only-oracle=${(o -- q).toSeq.sorted}")
  }

  test("every query's schema has unique, non-empty, case-distinct column names") {
    val sf = TestSpark.sfDir
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(TestSpark.spark, sf).schema.fieldNames.toSeq
      assert(cols.nonEmpty, name)
      assert(cols.forall(_.trim.nonEmpty), s"$name: $cols")
      assert(cols.map(_.toLowerCase).distinct.size == cols.size,
        s"$name has case-colliding columns: $cols")
    }
  }
}
