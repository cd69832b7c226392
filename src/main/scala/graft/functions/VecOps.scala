package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector kernels for array<double> columns.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are evaluated
  * INTERPRETED — a per-element lambda dispatch inside an otherwise
  * codegen'd stage. For the similarity operators that is the hot loop:
  * every candidate pair pays 3 folds x dim lambda calls (measured: q57 at
  * 20k vectors spent ~9 minutes in fold interpretation). These expressions
  * generate the same left-fold as a tight Java loop.
  *
  * BIT-EXACTNESS CONTRACT: each kernel performs the IDENTICAL IEEE-754
  * operation sequence as the HOF expression it replaces —
  *   dot:  acc = acc + a(i)*b(i)         == aggregate(zip_with(a,b,_*_), 0.0, _+_)
  *   l2sq: acc = acc + (a(i)-b(i))^2     == aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, _+_)
  * ascending index order, double precision throughout — so swapping them
  * into an operator changes NO query result (the DuckDB oracles replay the
  * same ordered folds and stay hash-identical; pinned in OpsSpec).
  *
  * Both sides must be non-null equal-length arrays with non-null elements
  * (embedding columns are by construction). These are ALSO registered as
  * public SQL functions (graft_vec_dot / graft_vec_l2sq), so arbitrary user
  * SQL reaches them: unequal-length inputs return NULL (checked before the
  * loop — an unchecked a.getDouble(i) past b's end reads raw UnsafeArrayData
  * bytes and returns silent garbage), matching the null the replaced
  * aggregate/zip_with fold produced on length mismatch.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL on length mismatch even when both children are non-nullable.
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Java source for one loop-body accumulation step. */
  protected def stepJava(acc: String, a: String, b: String, i: String): String
  /** One interpreted accumulation step. */
  protected def stepEval(acc: Double, x: Double, y: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc = stepEval(acc, a.getDouble(i), b.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${stepJava(acc, a, b, i)}
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Ordered-fold dot product: sum_i a(i)*b(i). */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dot"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"$acc = $acc + $a.getDouble($i) * $b.getDouble($i);"
  override protected def stepEval(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Ordered-fold squared L2 distance: sum_i (a(i)-b(i))^2. */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_l2sq"
  override protected def stepJava(acc: String, a: String, b: String, i: String) =
    s"$acc = $acc + ($a.getDouble($i) - $b.getDouble($i)) * " +
      s"($a.getDouble($i) - $b.getDouble($i));"
  override protected def stepEval(acc: Double, x: Double, y: Double): Double = {
    val d = x - y
    acc + d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Nearest-centroid argmin by squared L2, ties to the lowest index — the
  * k-means assignment step as ONE native expression.
  *
  * The expression-forest spelling (array_min over k struct(d, j) columns,
  * each wrapping a distance kernel) COMPILES at any k but the generated
  * method grows with k; past ~64 centroids it exceeds HotSpot's JIT
  * method-size budget and executes as interpreted bytecode — measured 10x
  * on 160 cells. Here the centroid matrix rides along as ONE reference
  * object and the whole argmin is a k x dim loop in a method small enough
  * to JIT at any k.
  *
  * Semantics are IDENTICAL to array_min(array(struct(l2sq(v, c_j), j))):
  * the same ascending-index fold per distance (bit-equal doubles), strict
  * `<` keeps the first minimum (= lowest j on ties), and an all-NaN row
  * returns 0 exactly as NaN-last struct ordering does.
  *
  * The matrix parameter is an IndexedSeq (structural equality), not an
  * Array (reference equality): case-class equals over an Array field made
  * two semantically identical expressions never compare equal, silently
  * defeating common-subexpression elimination and exchange reuse. The
  * eval/codegen path converts once to double[][].
  */
case class VecArgMinL2(child: Expression, centroidRows: IndexedSeq[IndexedSeq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val centroids: Array[Array[Double]] =
    centroidRows.map(_.toArray).toArray
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_vec_argmin_l2"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bj = 0
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var d = 0.0d
      var i = 0
      while (i < c.length) {
        val t = a.getDouble(i) - c(i)
        d += t * t
        i += 1
      }
      if (d < best) { best = d; bj = j }
      j += 1
    }
    bj
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bj = 0;
         |for (int $j = 0; $j < $cents.length; $j++) {
         |  double[] $c = $cents[$j];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    double $t = $a.getDouble($i) - $c[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $best) { $best = $d; $bj = $j; }
         |}
         |${ev.value} = $bj;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecArgMinL2 =
    copy(child = newChild)
}

/** Hyperplane sign-bit signature: bit j of the result is set iff
  * dot(vec, planes(j)) > 0 — the whole nBits-plane signature as ONE
  * reference-object loop, for the same JIT-size reason as [[VecArgMinL2]]
  * (the per-plane spelling inlines nBits dot kernels into one generated
  * method; at adaptiveBits' 24-bit ceiling x 4 tables that is 96 kernels).
  * Identical semantics to sum_j(if dot_j > 0 then 1L << j else 0): same
  * ascending-index dot folds, strict > (a NaN dot sets no bit).
  *
  * At most 64 planes fit one long signature: for j >= 64, `1L << j` wraps
  * mod 64 and silently corrupts bit j-64 — guarded at construction.
  * IndexedSeq parameter for structural equality (see [[VecArgMinL2]]).
  */
case class VecSignBits(child: Expression, planeRows: IndexedSeq[IndexedSeq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planeRows.length <= 64,
    s"VecSignBits packs sign bits into one long; got ${planeRows.length} planes (max 64)")
  @transient private lazy val planes: Array[Array[Double]] =
    planeRows.map(_.toArray).toArray
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_vec_signbits"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var bits = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var d = 0.0d
      var i = 0
      while (i < p.length) {
        d += a.getDouble(i) * p(i)
        i += 1
      }
      if (d > 0) bits |= 1L << j
      j += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = 0L;
         |for (int $j = 0; $j < $ps.length; $j++) {
         |  double[] $p = $ps[$j];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $p.length; $i++) {
         |    $d += $a.getDouble($i) * $p[$i];
         |  }
         |  if ($d > 0) $bits |= 1L << $j;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSignBits =
    copy(child = newChild)
}

object VecOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def l2sq(a: Column, b: Column): Column = column(VecL2Sq(expression(a), expression(b)))
  /** sum_i a(i)^2 — the dot of a column with itself. */
  def selfDot(a: Column): Column = dot(a, a)
  /** Index of the nearest centroid by squared L2, ties to the lowest index. */
  def argMinL2(vec: Column, centroids: Array[Array[Double]]): Column =
    column(VecArgMinL2(expression(vec), centroids.map(_.toIndexedSeq).toIndexedSeq))
  /** nBits-plane sign-bit signature as one long (<= 64 planes). */
  def signBits(vec: Column, planes: Array[Array[Double]]): Column =
    column(VecSignBits(expression(vec), planes.map(_.toIndexedSeq).toIndexedSeq))

  /** SQL registration: graft_vec_dot(a, b), graft_vec_l2sq(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", es => VecDot(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_l2sq", es => VecL2Sq(es.head, es(1)), "built-in")
  }
}
