package graft.sources

import java.util
import scala.jdk.CollectionConverters._

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

final class PdfTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-pdf needs a path: spark.read.format(\"graft-pdf\").load(dir)")
  override def name(): String = s"graft-pdf:$path"
  override def schema(): StructType = PdfDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PdfScanBuilder(path)
}

final class PdfScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PdfDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PdfScan(path, required)
}

final class PdfScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".pdf"))
      .sortBy(_.getName)
    files.map(f => PdfInputPartition(f.getAbsolutePath, f.getName): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PdfReaderFactory(required.fieldNames)
}

final case class PdfInputPartition(file: String, docId: String) extends InputPartition

final class PdfReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PdfInputPartition]
    new PartitionReader[InternalRow] {
      private val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file))
      private val spans = graft.io.Pdf.parse(p.docId, bytes).spans.iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!spans.hasNext) false
        else {
          val sp = spans.next()
          val values: Array[Any] = fields.map {
            case "doc_id" => UTF8String.fromString(p.docId)
            case "ord" => sp.offset
            case "kind" => UTF8String.fromString(sp.kind)
            case "text" => if (sp.text == null) null else UTF8String.fromString(sp.text)
            case "media_ref" =>
              if (sp.media_ref == null) null else UTF8String.fromString(sp.media_ref)
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
          current = InternalRow.fromSeq(values.toSeq)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
