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

/** N-Triples string-escape decoding (RDF 1.1 N-Triples §2.4 ECHAR +
  * UCHAR: \t \b \n \r \f \" \' \\ and \uXXXX / \UXXXXXXXX) as a
  * codegen'd expression, so a distributed N-Triples scan stays inside
  * whole-stage codegen with zero UDFs. The common case — no backslash
  * in the lexical form — is a single indexOf and returns the input
  * buffer untouched. Malformed escapes pass through verbatim rather
  * than failing the whole partition (dump files at 100 TB always carry
  * a few bad rows; filter them with a validity predicate, don't crash
  * the scan). */
case class RdfUnescape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rdf_unescape needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RdfUnescape.decode(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  org.apache.spark.sql.graft.RdfUnescape.decode($s.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RdfUnescape =
    copy(child = newChild)
}

object RdfUnescape {
  /** JVM-static so generated code and interpreted eval share one body. */
  def decode(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\' || i + 1 >= s.length) { sb.append(c); i += 1 }
      else {
        s.charAt(i + 1) match {
          case 't'  => sb.append('\t'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case '"'  => sb.append('"');  i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          // catch IllegalArgumentException, not just its NumberFormat
          // subclass: parseInt accepts a sign ("\u-0ab" → -171) and
          // appendCodePoint throws IAE on negative / > 0x10FFFF values
          // ("\U00110000") — either would otherwise kill the scan in
          // non-strict mode, the exact case pass-through must survive.
          case 'u' if i + 6 <= s.length =>
            try { sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 6), 16)); i += 6 }
            catch { case _: IllegalArgumentException => sb.append(c); i += 1 }
          case 'U' if i + 10 <= s.length =>
            try { sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16)); i += 10 }
            catch { case _: IllegalArgumentException => sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      }
    }
    sb.toString
  }
}

/** Column-level entry point. */
object TextOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def normalize(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))

  def rdfUnescape(c: Column): Column =
    ExpressionUtils.column(RdfUnescape(ExpressionUtils.expression(c)))
}
