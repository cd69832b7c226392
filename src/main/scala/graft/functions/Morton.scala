package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Morton (z-order) interleave of two 16-bit dimensions as a native
  * Catalyst expression — the clustering key behind multi-dimensional data
  * skipping (Iceberg/Delta `ZORDER BY`): sorting by the interleaved value
  * gives every run of rows locality in BOTH dimensions at once, so
  * per-file min/max stats stay tight on both and a predicate on EITHER
  * dimension prunes files. A linear sort gives that to its leading
  * dimension only.
  *
  * Inputs are the already-quantized dimension values (0..65535; the
  * caller scales raw values — see [[graft.ops.ZOrder.quantize16]]);
  * output is the 32-bit z-value as a long. Bit spreading uses the
  * constant-time magic-mask sequence, identical in eval and codegen.
  */
case class InterleaveBits16(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_zvalue needs (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits16.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.InterleaveBits16.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits16 =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits16 {
  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * value (0babcd -> 0b0a0b0c0d), by successive halving with masks. */
  def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** 32-bit Morton code: a's bits at even positions, b's at odd. */
  def morton(a: Long, b: Long): Long = spread16(a) | (spread16(b) << 1)

  def zvalue(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      InterleaveBits16(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** SQL registration: SELECT graft_zvalue(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue", exprs => InterleaveBits16(exprs(0), exprs(1)), "built-in")
}
