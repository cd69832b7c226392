package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class PartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partition-column filter prunes directories; rows round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val rows = Seq.tabulate(1000)(i =>
      (i.toLong, Seq("a", "b", "c", "d")(i % 4), i * 2L)).toDF("id", "cat", "v")
    Partitioned.writePartitioned(rows, dir, "cat")

    val scan = Partitioned.readPartitioned(spark, dir).filter(col("cat") === "b")
    val (selected, total) = Partitioned.partitionCounts(scan)
    assert(total == 4 && selected == 1, s"selected=$selected total=$total")
    assert(Partitioned.scanMetadata(scan)("PartitionFilters").contains("cat"))
    // values and the restored partition column both survive the round trip
    val got = scan.select("id", "cat", "v").as[(Long, String, Long)].collect().sorted
    val want = rows.filter(col("cat") === "b")
      .as[(Long, String, Long)].collect().sorted
    assert(got.sameElements(want))
  }

  test("data filters reach the parquet scan pushed; projection prunes columns") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select("l_returnflag", "l_quantity")
    val md = Partitioned.scanMetadata(li)
    assert(md("PushedFilters").contains("l_shipdate"), md("PushedFilters"))
    val read = md("ReadSchema")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    // column pruning: untouched wide columns must not be read
    assert(!read.contains("l_comment") && !read.contains("l_extendedprice"), read)
  }
}
