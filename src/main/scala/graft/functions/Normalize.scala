package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression with
  * whole-stage codegen — the canonical-composition step every web-crawl
  * cleaning pass runs first (UAX #15): combining sequences compose
  * ("e" + U+0301 -> "é"), singleton canonical equivalents collapse, so
  * byte-level hashing/dedup downstream sees one representation per
  * canonically-equal text. Spark has no built-in normalizer; a Scala UDF
  * would break codegen — this stays inside the generated projection.
  *
  * NFC (not NFKC) on purpose: canonical equivalence only. Compatibility
  * folds (ligatures, width, super/subscripts) change text content and are
  * a curation POLICY, not a normalization invariant.
  *
  * Fast path: java.text.Normalizer.isNormalized short-circuits the
  * (overwhelmingly common at web scale) already-NFC case without
  * allocating — ASCII-only strings never pay for composition.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** SQL registration: SELECT graft_nfc(text) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
}
