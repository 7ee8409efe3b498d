package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over plain `array<float>`/`array<double>` columns via
  * built-in higher-order functions — codegen'd, no UDFs, no MLlib Vector
  * boxing on the hot path. Accumulation is in double regardless of the
  * element type so Spark and the DuckDB oracle agree.
  */
object Vectors {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ aᵢ·bᵢ with a statically-known dimension: unrolled into a flat
    * multiply-add chain of getItem expressions. Whole-stage codegen turns
    * this into straight-line code with ZERO per-row array allocations —
    * the zip_with/aggregate form allocates an intermediate array per
    * pair, which dominates cost on O(n²) similarity joins. Same left-to-
    * right summation order as [[dot]] (oracle-identical results). */
  def dotStatic(a: Column, b: Column, dims: Int): Column =
    (0 until dims)
      .map(i => a.getItem(i).cast("double") * b.getItem(i).cast("double"))
      .reduce(_ + _)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** a / ‖a‖₂ as array<double> (zero vectors pass through unchanged). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }
}
