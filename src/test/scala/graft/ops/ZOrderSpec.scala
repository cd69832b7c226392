package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark
import graft.functions.InterleaveBits16

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("morton kernel: magic-mask spreading equals the per-bit loop") {
    def slow(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (0x1234L, 0xABCDL), (21845L, 43690L))
    cases.foreach { case (a, b) =>
      assert(InterleaveBits16.morton(a, b) == slow(a, b), s"($a, $b)")
    }
    // z-locality sanity: adjacent cells differ in few low bits
    assert(InterleaveBits16.morton(0L, 0L) == 0L)
    assert(InterleaveBits16.morton(1L, 1L) == 3L)
  }

  test("graft_zvalue expression codegens and matches the kernel") {
    val df = spark.range(100).select(
      (col("id") % 16).as("a"), (col("id") * 7 % 16).as("b"))
    val got = df.select(col("a"), col("b"),
        InterleaveBits16.zvalue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == InterleaveBits16.morton(a, b))
    }
    val plan = df.select(InterleaveBits16.zvalue(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_zvalue"))
    assert(plan.contains("*(1) Project"))
  }

  test("quantize16 is exact long arithmetic over the closed range") {
    val df = Seq(0L, 1L, 500L, 999L, 1000L).toDF("v")
    val got = df.select(ZOrder.quantize16(col("v"), 0L, 1000L).as("q"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 65L, 32767L, 65469L, 65535L)) // v*65535 div 1000
    // degenerate range maps everything to 0
    val one = Seq(7L).toDF("v")
      .select(ZOrder.quantize16(col("v"), 7L, 7L)).as[Long].collect()
    assert(one.head == 0L)
  }

  test("zbucketed: deterministic, partitioning-invariant, dims co-local") {
    val df = (0L until 512L)
      .map(i => (i, i % 64, (i * 31) % 64)).toDF("id", "a", "b")
    val zb = ZOrder.zbucketed(df, "a", "b", "id", nBuckets = 8)
      .select("id", "zbucket").as[(Long, Long)].collect().toMap
    val again = ZOrder.zbucketed(df.repartition(7), "a", "b", "id", nBuckets = 8)
      .select("id", "zbucket").as[(Long, Long)].collect().toMap
    assert(zb == again)
    assert(zb.values.toSet == (0L until 8L).toSet)
    // balanced by construction: rank-buckets differ by at most 1 in size
    val sizes = zb.values.groupBy(identity).map(_._2.size)
    assert(sizes.max - sizes.min <= 1)
  }

  test("z-order layout prunes REAL files on the second dimension " +
      "(poisoned-file proof); the linear layout cannot") {
    val df = (0L until 1024L)
      .map(i => (i, i % 256, (i * 97) % 256)).toDF("id", "a", "b")
    val zb = ZOrder.zbucketed(df, "a", "b", "id", nBuckets = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    zb.write.partitionBy("zbucket").parquet(s"$dir/z")
    // probe: qb in the middle quarter; compute hit buckets from stats
    val (bl, bh) = (16384L, 24575L)
    val stats = ZOrder.bucketStats(zb, "zbucket")
      .select("bucket", "qb_min", "qb_max").as[(Long, Long, Long)].collect()
    val hit = stats.filter(s => s._3 >= bl && s._2 <= bh).map(_._1).toSet
    assert(hit.size < 16 && hit.nonEmpty, s"no pruning: $hit")
    // poison every pruned bucket's directory: a reader that opens one dies
    stats.map(_._1).filterNot(hit).foreach { bkt =>
      val d = new java.io.File(s"$dir/z/zbucket=$bkt")
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, "poison".getBytes("UTF-8"))
      }
    }
    // manifest-style planning: hand the reader ONLY the surviving bucket
    // directories (a root-dir read would touch poisoned footers during
    // schema inference — exactly the table scan pruning avoids)
    val rows = spark.read
      .option("basePath", s"$dir/z")
      .parquet(hit.toSeq.map(b => s"$dir/z/zbucket=$b"): _*)
      .filter(col("qb").between(bl, bh))
    val expected = zb.filter(col("qb").between(bl, bh)).count()
    assert(rows.count() == expected)
    // the linear layout's control stat: every bucket intersects the qb range
    val lin = ZOrder.linearBucketed(zb, "qa", "id", nBuckets = 16)
    val linHit = ZOrder.bucketStats(lin, "linbucket")
      .select("bucket", "qb_min", "qb_max").as[(Long, Long, Long)].collect()
      .count(s => s._3 >= bl && s._2 <= bh)
    assert(linHit == 16, s"linear layout unexpectedly pruned: $linHit")
  }
}
