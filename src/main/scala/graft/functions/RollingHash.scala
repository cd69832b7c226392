package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling-hash document fingerprint as a native Catalyst
  * expression with whole-stage codegen (the document-fingerprinting analog
  * of the reference's content-hash cache key, src/v2_llm/run_claude.py:29-34,
  * which used SHA-256 of the file bytes; a rolling hash is cheaper and
  * composes with shingling).
  *
  * hash = fold(h = h * 1000003 + byte) over UTF-8 bytes, seeded 0xcbf29ce4.
  * Stays inside WholeStageCodegen — no UDF serialization boundary.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val Seed = 0xcbf29ce4L
  final val Mult = 1000003L

  def hash(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * Mult + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Column builder (Spark 4: Column <-> Expression via the bridge shim). */
  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RollingHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** SQL registration: SELECT graft_fingerprint64(text) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint64", exprs => RollingHash64(exprs.head), "built-in")
}
