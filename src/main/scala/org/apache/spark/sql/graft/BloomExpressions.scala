package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloomBytes, value)` — membership probe of a
  * string column against a serialized
  * `org.apache.spark.util.sketch.BloomFilter`.
  *
  * Why a custom Catalyst Expression (the brief's preference tier (b)):
  * Spark builds exactly this probe for its own runtime row-level
  * filtering, but keeps both halves internal — `df.stat.bloomFilter`
  * returns the filter only driver-side, and the `might_contain`
  * expression is not registered for users. A Scala UDF would close over
  * the filter and serialize the whole ~MB sketch into every task
  * closure AND fall out of whole-stage codegen. Here the serialized
  * filter is a foldable BinaryType literal in the plan (evaluated once;
  * deserialized lazily per JVM) and codegen references the deserialized
  * object via `addReferenceObj`, so the probe is a branch-free virtual
  * call inside the generated loop — the same mechanics Spark's injected
  * runtime bloom probes use.
  *
  * The probe hashes the value's UTF-8 bytes (`mightContainBinary`),
  * matching what `DataFrameStatFunctions.bloomFilter` inserts for a
  * string column — no false NEGATIVES, by the filter's contract.
  */
case class BloomMightContain(bloomBytes: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomBytes
  override def right: Expression = value
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (bloomBytes.dataType, value.dataType) match {
      case (BinaryType, _: StringType) if bloomBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain needs (foldable binary bloom, string value), got " +
          s"(${bloomBytes.dataType}, ${value.dataType})")
    }

  /** Deserialized once per JVM per plan (the literal bytes never change
    * after analysis); tasks share it through the codegen reference. */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      bloomBytes.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val f = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $f.mightContainBinary($v.getBytes());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloomBytes = newLeft, value = newRight)
}

object BloomOps {

  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal.create(bloomBytes, BinaryType),
      ExpressionUtils.expression(value)))
}
