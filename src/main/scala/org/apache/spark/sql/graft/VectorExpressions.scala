package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    GraftExtensions.allFunctions.foreach(ext.injectFunction)
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

  /** The native kernel plus the whole scalar surface from
    * [[graft.functions.SqlFunctions]] (tokenize, q-grams, shingles,
    * hashes, language-ID, quality, fingerprint, hamming) — one
    * `spark.sql.extensions=…GraftExtensions` makes the library fully
    * SQL-usable. */
  private[graft] val allFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    dotProductFunction +: graft.functions.SqlFunctions.all.map {
      case (name, builder) =>
        (FunctionIdentifier(name),
          new ExpressionInfo(GraftExtensions.getClass.getName, name), builder)
    }

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    allFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** PQ kernels. The naive formulations repeat the DotProduct failure
  * mode at larger scale: encode as an expression tree is subspaces ×
  * codebookSize × width (≈1024) multiply-adds of straight-line code —
  * over the JIT budget, runs interpreted; and an ADC via an (s, c)
  * explode + equi-join shuffles |Q|·|C|·subspaces rows for what is 8
  * array lookups per pair. Each kernel is a compact counted loop over a
  * codebook shipped once per task as a reference object.
  *
  * Distances round to 6 decimals via floor(d·1e6 + 0.5) (Math.round —
  * identical to the oracle SQL's explicit floor form and to DuckDB's
  * std::round for the non-negative distances here) before the argmin and ties
  * break on the lower code id — the same contract as the SQL oracle
  * (round(x, 6)), so cross-engine ulp noise cannot flip an argmin. */
object PqKernels {
  /** codebook(sub)(code)(dim) from the deterministic md5 family. */
  def codebook(subspaces: Int, codebookSize: Int, width: Int,
               component: (Int, Int, Int) => Double): Array[Array[Array[Double]]] =
    Array.tabulate(subspaces, codebookSize, width)(component)
}

/** vec: array<float|double> → codes: array<int> (one per subspace). */
case class PqEncodeExpr(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val subspaces = codebook.length
  private val codebookSize = codebook(0).length
  private val width = codebook(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs a float/double array, got $other")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](subspaces)
    var sp = 0
    while (sp < subspaces) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < codebookSize) {
        var d = 0; var acc = 0.0
        while (d < width) {
          val x = (if (isFloat) v.getFloat(sp * width + d).toDouble
                   else v.getDouble(sp * width + d)) - codebook(sp)(c)(d)
          acc += x * x
          d += 1
        }
        val rounded = Math.round(acc * 1e6) / 1e6.toDouble
        if (rounded < bestD) { bestD = rounded; best = c }
        c += 1
      }
      out(sp) = best
      sp += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val book = ctx.addReferenceObj("pqBook", codebook, "double[][][]")
      val out = ctx.freshName("out")
      val sp = ctx.freshName("sp"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val rounded = ctx.freshName("rounded")
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      s"""
         |int[] $out = new int[$subspaces];
         |for (int $sp = 0; $sp < $subspaces; $sp++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $codebookSize; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $width; $d++) {
         |      double $x = $get($sp * $width + $d) - $book[$sp][$c][$d];
         |      $acc += $x * $x;
         |    }
         |    double $rounded = java.lang.Math.round($acc * 1e6) / 1e6;
         |    if ($rounded < $bestD) { $bestD = $rounded; $best = $c; }
         |  }
         |  $out[$sp] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** vec: array<float|double> → ADC lookup table: array<double> of
  * subspaces·codebookSize entries, entry (s·K + c) = ⟨vec_s, book(s,c)⟩. */
case class PqLutExpr(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val subspaces = codebook.length
  private val codebookSize = codebook(0).length
  private val width = codebook(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs a float/double array, got $other")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](subspaces * codebookSize)
    var sp = 0
    while (sp < subspaces) {
      var c = 0
      while (c < codebookSize) {
        var d = 0; var acc = 0.0
        while (d < width) {
          acc += (if (isFloat) v.getFloat(sp * width + d).toDouble
                  else v.getDouble(sp * width + d)) * codebook(sp)(c)(d)
          d += 1
        }
        out(sp * codebookSize + c) = acc
        c += 1
      }
      sp += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val book = ctx.addReferenceObj("pqBook", codebook, "double[][][]")
      val out = ctx.freshName("out")
      val sp = ctx.freshName("sp"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      s"""
         |double[] $out = new double[${subspaces * codebookSize}];
         |for (int $sp = 0; $sp < $subspaces; $sp++) {
         |  for (int $c = 0; $c < $codebookSize; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $width; $d++) {
         |      $acc += $get($sp * $width + $d) * $book[$sp][$c][$d];
         |    }
         |    $out[$sp * $codebookSize + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** (lut: array<double>, codes: array<int>) → Σ_s lut[s·K + codes[s]] —
  * the 8-lookup ADC score; `codebookSize` is K. */
case class PqAdcExpr(left: Expression, right: Expression, codebookSize: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<double>, array<int>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    var s = 0; var acc = 0.0
    val n = codes.numElements()
    while (s < n) {
      acc += lut.getDouble(s * codebookSize + codes.getInt(s))
      s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      s"""
         |int $n = $codes.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  $acc += $lut.getDouble($s * $codebookSize + $codes.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Column entry points for the PQ kernel family. */
object PqOps {
  def pqEncode(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqEncodeExpr(ExpressionUtils.expression(vec), codebook))
  def pqLut(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqLutExpr(ExpressionUtils.expression(vec), codebook))
  def pqAdc(lut: Column, codes: Column, codebookSize: Int): Column =
    ExpressionUtils.column(PqAdcExpr(
      ExpressionUtils.expression(lut), ExpressionUtils.expression(codes), codebookSize))
}
