package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a directory of the engine's PDF 1.4 byte
  * streams: `spark.read.format("graft-pdf").load(dir)` yields the parsed
  * span rows (doc_id, ord, kind, text, media_ref) — the io.Pdf
  * byte-parser exposed as a genuine Spark source instead of a
  * mapPartitions helper.
  *
  * Scale shape: one InputPartition per file (Spark schedules them across
  * executors; a 10^12-doc corpus just means more partitions), parsing
  * happens entirely inside each PartitionReader, and column pruning is
  * honored (SupportsPushDownRequiredColumns): a `select(doc_id, kind)`
  * materializes 2-field rows out of the reader, not 5-field ones —
  * PdfSourceSpec pins that. Registered via DataSourceRegister
  * (META-INF/services) so the short name "graft-pdf" resolves.
  */
class PdfDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-pdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PdfDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PdfTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object PdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("ord", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("media_ref", StringType, nullable = true)))
}

final class PdfTable(path: String) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-pdf needs a path: spark.read.format(\"graft-pdf\").load(dir)")
  override def name(): String = s"graft-pdf:$path"
  override def schema(): StructType = PdfDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PdfScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PdfWriteBuilder(path, info.schema())
}

final class PdfScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
  private var required: StructType = PdfDataSource.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Int = Int.MaxValue
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** PARTIAL limit pushdown (return false → Spark keeps its own Limit):
    * each reader stops parsing after `limit` spans, so `df.limit(k)` over
    * a huge corpus reads at most k spans per file instead of every span
    * of every file. */
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  /** doc_id predicates are evaluated against the FILE NAME at planning
    * time (doc_id == file name by construction), so a filtered scan skips
    * whole files without opening them — the 100× story for a selective
    * read over a byte corpus. The skip is exact, so accepted filters are
    * fully handled (not re-evaluated post-scan). */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (ok, residual) = filters.partition(PdfScan.supportsFilter)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new PdfScan(path, required, pushed, limit)
}

object PdfScan {
  import org.apache.spark.sql.sources._
  /** A filter is pushable iff it can be decided from doc_id alone. */
  def supportsFilter(f: Filter): Boolean = f match {
    case EqualTo("doc_id", _: String) => true
    case EqualNullSafe("doc_id", _: String) => true
    case In("doc_id", vs) => vs.forall(_.isInstanceOf[String])
    case IsNotNull("doc_id") => true
    case IsNull("doc_id") => true
    case StringStartsWith("doc_id", _) => true
    case StringEndsWith("doc_id", _) => true
    case StringContains("doc_id", _) => true
    case GreaterThan("doc_id", _: String) => true
    case GreaterThanOrEqual("doc_id", _: String) => true
    case LessThan("doc_id", _: String) => true
    case LessThanOrEqual("doc_id", _: String) => true
    case And(l, r) => supportsFilter(l) && supportsFilter(r)
    case Or(l, r) => supportsFilter(l) && supportsFilter(r)
    case Not(c) => supportsFilter(c)
    case _ => false
  }
  def evalFilter(f: Filter, docId: String): Boolean = f match {
    case EqualTo(_, v) => docId == v
    case EqualNullSafe(_, v) => docId == v
    case In(_, vs) => vs.contains(docId)
    case IsNotNull(_) => true
    case IsNull(_) => false
    case StringStartsWith(_, p) => docId.startsWith(p)
    case StringEndsWith(_, s) => docId.endsWith(s)
    case StringContains(_, s) => docId.contains(s)
    case GreaterThan(_, v: String) => docId > v
    case GreaterThanOrEqual(_, v: String) => docId >= v
    case LessThan(_, v: String) => docId < v
    case LessThanOrEqual(_, v: String) => docId <= v
    case And(l, r) => evalFilter(l, docId) && evalFilter(r, docId)
    case Or(l, r) => evalFilter(l, docId) || evalFilter(r, docId)
    case Not(c) => !evalFilter(c, docId)
    case other => throw new IllegalStateException(s"unpushable filter $other")
  }
}

final class PdfScan(path: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    limit: Int = Int.MaxValue) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  /** Runtime (DPP-style) filters Spark plants at execution time from the
    * other side of a join — e.g. `In(doc_id, <broadcast dim keys>)`. They
    * prune whole FILES before any reader opens them, the same way x30/x47
    * prune parquet partitions: a dim-filtered join against a 10^12-doc
    * byte corpus reads only the matching documents' files. Dropping an
    * untranslatable runtime filter is always safe — the join itself
    * still applies the predicate. */
  private var runtime: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtime = filters.filter(PdfScan.supportsFilter)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in explain() so pushed filters are plan-auditable
  override def description(): String =
    s"graft-pdf $path, PushedFilters: [${pushed.mkString(", ")}], " +
      (if (limit != Int.MaxValue) s"PushedLimit: $limit, " else "") +
      s"ReadSchema: ${required.simpleString}"
  /** Byte-size statistics from the (pushdown-filtered) file listing, so
    * Catalyst can judge broadcastability of a pdf-corpus scan the same
    * way it does a parquet one. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val sizes = planInputPartitions().map(p =>
        new java.io.File(p.asInstanceOf[PdfInputPartition].file).length())
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(sizes.sum)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  override def planInputPartitions(): Array[InputPartition] = {
    // local-filesystem connector (driver lists, every executor reads the
    // same paths — a shared mount on a real cluster). A missing path must
    // FAIL, not act as an empty corpus: the common typo/misconfiguration
    // would otherwise silently yield 0 rows.
    val dir = new java.io.File(path)
    require(dir.isDirectory,
      s"graft-pdf path is not a readable directory: $path")
    val files = Option(dir.listFiles())
      .getOrElse(throw new java.io.IOException(s"cannot list graft-pdf dir: $path"))
      .filter(f => f.isFile && f.getName.endsWith(".pdf"))
      .filter(f => (pushed ++ runtime).forall(PdfScan.evalFilter(_, f.getName)))
      .sortBy(_.getName)
    files.map(f => PdfInputPartition(f.getAbsolutePath, f.getName): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PdfReaderFactory(required.fieldNames, limit)
}

final case class PdfInputPartition(file: String, docId: String) extends InputPartition

// ---------------------------------------------------------------- write

/** Write side: input rows are the SAME flat span rows the read side
  * produces (doc_id, ord, kind, text, media_ref) — a symmetric round
  * trip — and each document becomes ONE .pdf file. The Write declares
  * RequiresDistributionAndOrdering (cluster by doc_id, order by
  * (doc_id, ord)), so Spark itself shuffles/sorts every document's spans
  * contiguously into one task; the writer then just watches the doc_id
  * change. Tasks write task-unique `.tmp-` names; the driver's commit
  * renames them into place and abort deletes them (the standard V2
  * two-phase protocol; rename-as-commit on a shared filesystem). */
final class PdfWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder {
  override def build(): org.apache.spark.sql.connector.write.Write =
    new PdfWrite(path, schema)
}

final case class PdfCommitMessage(tmpFiles: Seq[String])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class PdfWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
  require(PdfDataSource.Schema.fieldNames.forall(schema.fieldNames.contains),
    s"graft-pdf write needs ${PdfDataSource.Schema.fieldNames.mkString(",")}, " +
      s"got ${schema.fieldNames.mkString(",")}")

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.identity("doc_id")))
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(Expressions.column("doc_id"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.column("ord"), SortDirection.ASCENDING))

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = this

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    def i(n: String) = schema.fieldIndex(n)
    new PdfWriterFactory(path, i("doc_id"), i("ord"), i("kind"), i("text"),
      i("media_ref"))
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val committed = messages.flatMap {
      case PdfCommitMessage(tmps) => tmps
      case _ => Nil
    }.toSet
    // garbage-collect .tmp- leftovers of CRASHED earlier runs (tasks whose
    // JVM died before abort() could clean up) so they never accumulate;
    // only files outside this job's own commit set are stale
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.contains(".tmp-") && !committed(f.getAbsolutePath))
      .foreach(f => f.delete())
    committed.toSeq.sorted.foreach { t =>
      val target = new java.io.File(t.replaceFirst("\\.tmp-[^/]*$", ""))
      // Files.move gives deterministic overwrite semantics across platforms
      // (renameTo returns false on an existing target on some)
      java.nio.file.Files.move(new java.io.File(t).toPath, target.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach {
      case PdfCommitMessage(tmps) => tmps.foreach(t => new java.io.File(t).delete())
      case _ =>
    }
}

final class PdfWriterFactory(path: String, di: Int, oi: Int, ki: Int,
    ti: Int, mi: Int)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val written = scala.collection.mutable.ArrayBuffer.empty[String]
      private var curDoc: String = null
      private val buf = scala.collection.mutable.ArrayBuffer.empty[graft.layout.Span]
      private def flush(): Unit = if (curDoc != null) {
        val bytes = graft.io.Pdf.write(graft.layout.DocRow(curDoc, buf.toSeq))
        val tmp = new java.io.File(path, s"$curDoc.tmp-$partitionId-$taskId")
        java.nio.file.Files.createDirectories(tmp.getParentFile.toPath)
        java.nio.file.Files.write(tmp.toPath, bytes)
        written += tmp.getAbsolutePath
        buf.clear()
      }
      override def write(row: InternalRow): Unit = {
        val docId = row.getUTF8String(di).toString
        if (docId != curDoc) { flush(); curDoc = docId }
        buf += graft.layout.Span(
          row.getUTF8String(ki).toString,
          if (row.isNullAt(ti)) null else row.getUTF8String(ti).toString,
          if (row.isNullAt(mi)) null else row.getUTF8String(mi).toString,
          row.getInt(oi))
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        flush()
        PdfCommitMessage(written.toSeq)
      }
      override def abort(): Unit = written.foreach(t => new java.io.File(t).delete())
      override def close(): Unit = ()
    }
}

final class PdfReaderFactory(fields: Array[String], limit: Int = Int.MaxValue)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PdfInputPartition]
    new PartitionReader[InternalRow] {
      private val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file))
      private val spans = graft.io.Pdf.parse(p.docId, bytes).spans.iterator.take(limit)
      private val docIdU = UTF8String.fromString(p.docId)
      // extractors resolved ONCE per reader — the per-row path is an
      // array walk, not a string match per field
      private val extract: Array[graft.layout.Span => Any] = fields.map {
        case "doc_id" => (_: graft.layout.Span) => docIdU
        case "ord" => (sp: graft.layout.Span) => sp.offset
        case "kind" => (sp: graft.layout.Span) => UTF8String.fromString(sp.kind)
        case "text" => (sp: graft.layout.Span) =>
          if (sp.text == null) null else UTF8String.fromString(sp.text)
        case "media_ref" => (sp: graft.layout.Span) =>
          if (sp.media_ref == null) null else UTF8String.fromString(sp.media_ref)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields.length)
      override def next(): Boolean =
        if (!spans.hasNext) false
        else {
          val sp = spans.next()
          var i = 0
          while (i < extract.length) { row.update(i, extract(i)(sp)); i += 1 }
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
