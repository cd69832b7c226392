package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.layout.FixtureCorpus
import graft.pipeline.TestSpark

class PdfSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-pdfsrc").toFile
    Seq(FixtureCorpus.f01, FixtureCorpus.f02, FixtureCorpus.f11).foreach { doc =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d.getAbsolutePath, doc.doc_id),
        graft.io.Pdf.write(doc))
    }
    d.getAbsolutePath
  }

  test("format(graft-pdf) round-trips the authored corpus byte-for-byte") {
    val got = spark.read.format("graft-pdf").load(dir)
      .as[(String, Int, String, String, String)].collect().sorted.toSeq
    val want = Seq(FixtureCorpus.f01, FixtureCorpus.f02, FixtureCorpus.f11)
      .flatMap(d => d.spans.map(sp =>
        (d.doc_id, sp.offset, sp.kind, sp.text, sp.media_ref)))
      .sorted
    assert(got == want && want.nonEmpty)
  }

  test("column pruning reaches the reader: 2-column select scans 2 fields") {
    val df = spark.read.format("graft-pdf").load(dir).select("doc_id", "kind")
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.nonEmpty)
    assert(scans.forall(_.output.size == 2),
      scans.map(_.output.map(_.name)).mkString("; "))
  }

  test("one input partition per file") {
    val df = spark.read.format("graft-pdf").load(dir)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("a missing/typo'd path FAILS instead of acting as an empty corpus") {
    val bad = "/no/such/graft-pdf-dir"
    val e = intercept[Throwable] {
      spark.read.format("graft-pdf").load(bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not a readable directory")),
      messages(e).mkString(" | "))
  }

  test("doc_id filter pushdown skips whole files at planning time") {
    // a poison file that CANNOT parse: if the filtered scan still opened
    // it, the query would throw — passing proves file-level skip, not
    // post-scan filtering
    val d = java.nio.file.Files.createTempDirectory("graft-pdfpush").toFile
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.getAbsolutePath, FixtureCorpus.f01.doc_id),
      graft.io.Pdf.write(FixtureCorpus.f01))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.getAbsolutePath, "zz.poison.pdf"),
      Array[Byte](1, 2, 3, 4))
    val df = spark.read.format("graft-pdf").load(d.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("doc_id") === FixtureCorpus.f01.doc_id)
    val rows = df.collect()
    assert(rows.length == FixtureCorpus.f01.spans.length)
    assert(df.rdd.getNumPartitions == 1) // one file planned, not two
    // the pushed filter is plan-auditable via the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo"),
      plan.take(2000))
    // unfiltered, the poison file is read and must fail the scan
    intercept[Throwable] {
      spark.read.format("graft-pdf").load(d.getAbsolutePath).collect()
    }
  }

  test("runtime filtering prunes pdf FILES under a dim-filtered join") {
    import org.apache.spark.sql.functions.col
    // poison file: unparseable bytes. The join's dim side selects only
    // f01, so IF Spark plants the runtime doc_id filter and the scan
    // prunes on it, the poison file is never opened; any fallback to
    // open-then-filter throws. Files-opened count is thereby pinned at 1.
    val d = java.nio.file.Files.createTempDirectory("graft-pdfruntime").toFile
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.getAbsolutePath, FixtureCorpus.f01.doc_id),
      graft.io.Pdf.write(FixtureCorpus.f01))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.getAbsolutePath, "zz.poison.pdf"),
      Array[Byte](1, 2, 3, 4))
    val dimDir = java.nio.file.Files.createTempDirectory("graft-pdfdim").toString
    Seq((FixtureCorpus.f01.doc_id, 1), ("zz.poison.pdf", 0))
      .toDF("doc_id", "w").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("w") > 0).select("doc_id")
    val facts = spark.read.format("graft-pdf").load(d.getAbsolutePath)
    val joined = facts.join(dim, "doc_id")
    val rows = joined.collect()
    assert(rows.length == FixtureCorpus.f01.spans.length)
    // the planted filter is plan-auditable (dynamicpruning on the v2 scan)
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("scan statistics report the (filtered) byte size of the file listing") {
    val all = new PdfScan(dir, graft.sources.PdfDataSource.Schema, Array.empty)
      .estimateStatistics()
    val want = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".pdf"))
      .map(_.length()).sum
    assert(all.sizeInBytes().getAsLong == want && want > 0)
    // a pushed doc_id filter shrinks the estimate to the surviving file
    import org.apache.spark.sql.sources.EqualTo
    val one = new PdfScan(dir, graft.sources.PdfDataSource.Schema,
      Array(EqualTo("doc_id", FixtureCorpus.f01.doc_id)))
    val f01Size = new java.io.File(dir, FixtureCorpus.f01.doc_id).length()
    assert(one.estimateStatistics().sizeInBytes().getAsLong == f01Size)
  }

  test("limit pushdown caps each reader; Spark's own Limit stays correct") {
    val df = spark.read.format("graft-pdf").load(dir).limit(2)
    assert(df.count() == 2)
    assert(df.queryExecution.executedPlan.toString.contains("PushedLimit: 2"))
    // no limit -> no PushedLimit marker
    val plain = spark.read.format("graft-pdf").load(dir)
    plain.collect()
    assert(!plain.queryExecution.executedPlan.toString.contains("PushedLimit"))
  }

  test("V2 write path: span rows -> one pdf per doc -> read back identical") {
    val out = java.nio.file.Files.createTempDirectory("graft-pdfsink").toString
    val spans = spark.read.format("graft-pdf").load(dir)
    // scramble the row order: the Write's declared distribution+ordering
    // must be what reassembles each doc contiguously, not input luck
    spans.orderBy(org.apache.spark.sql.functions.col("text"))
      .repartition(5)
      .write.format("graft-pdf").mode("append").save(out)
    val files = new java.io.File(out).listFiles.map(_.getName).sorted
    assert(files.length == 3 && files.forall(_.endsWith(".pdf")), files.mkString(","))
    val back = spark.read.format("graft-pdf").load(out)
      .as[(String, Int, String, String, String)].collect().sorted.toSeq
    val orig = spans.as[(String, Int, String, String, String)]
      .collect().sorted.toSeq
    assert(back == orig)
  }
}
