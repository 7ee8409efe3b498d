package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd expression (java.text.Normalizer
  * is JDK-built-in, so no UDF and no external dependency): canonical
  * composition NFC for cross-system text identity (the corpus-prep
  * default — DuckDB's `nfc_normalize` reproduces it, making the operator
  * oracle-checkable), compatibility forms NFKC/NFKD for
  * fold-width/ligature token normalization before hashing.
  *
  * Row-local and streaming-safe; the JDK normalizer short-circuits on
  * already-normalized (e.g. pure-ASCII) strings, so the common case is
  * a scan, not a rewrite. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, normForm))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.${normForm.name()}));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Column-level entry point. */
object TextOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def normalize(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))
}
