package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Size-targeted output-file planning — the write-side answer to the small-
  * files problem (Iceberg `write.target-file-size-bytes`, Delta OPTIMIZE
  * bin-packing): documents in a stable total order are assigned WHOLE
  * (never split — unlike token packing, a storage file must not cut a row)
  * to consecutive output files so each file lands near `targetBytes`.
  *
  * The assignment is pure prefix-sum arithmetic: a document goes to
  * `file_id = exclusiveByteOffset div targetBytes` — the file its first
  * byte falls in. File sizes then straggle around the target by at most
  * one document (a doc straddling the boundary stays in the file it
  * started in), files cover CONTIGUOUS order-key ranges (what makes the
  * layout range-prunable, the x49 manifest-skipping contract), and the
  * assignment is append-stable: growing the corpus never reassigns an
  * existing document, because earlier offsets don't move.
  *
  * Scale: the offset is [[Packing]]'s two-pass distributed prefix sum (a
  * naive `sum() OVER (ORDER BY ...)` is a SinglePartition window — the
  * global-sort cliff); the per-file manifest aggregation shuffles one
  * scalar row per document on an 8-byte key. At 100 TB / 512 MB targets
  * that is ~200k manifest rows out of the final aggregation.
  */
object FileLayout {

  /** Plan the file manifest: one row per planned output file with its doc
    * count, total bytes, and covered [first, last] order-key range.
    *
    * @param docs      one row per document
    * @param orderCol  stable total-order column (unique)
    * @param bytesCol  per-document serialized size (integral, >= 0)
    * @param targetBytes target file size (> 0) */
  def planFiles(docs: DataFrame, orderCol: String, bytesCol: String,
      targetBytes: Long, partitions: Int = 0): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    assignFiles(docs, orderCol, bytesCol, targetBytes, partitions)
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_bytes")).as("file_bytes"),
        min(col(orderCol)).as("first_key"),
        max(col(orderCol)).as("last_key"))
  }

  /** Per-document assignment: orderCol, doc_bytes, file_id. */
  def assignFiles(docs: DataFrame, orderCol: String, bytesCol: String,
      targetBytes: Long, partitions: Int = 0): DataFrame =
    Packing.packSequencesBy(docs.select(col(orderCol), col(bytesCol)),
        orderCol, bytesCol, targetBytes, partitions)
      .select(col(orderCol), col("n_tokens").as("doc_bytes"),
        col("seq_id").as("file_id"))
}
