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
  private def allHex(s: String, from: Int, until: Int): Boolean = {
    var j = from
    while (j < until) {
      val h = s.charAt(j)
      if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
            (h >= 'A' && h <= 'F'))) return false
      j += 1
    }
    true
  }

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
          // Validate the whole window is hex digits BEFORE parseInt:
          // parseInt accepts a sign, so "\u-0ab" parses to -171 (then
          // appendCodePoint throws IAE — caught) but "\u+0ab" parses to
          // +171 and SILENTLY decodes to U+00AB instead of passing
          // through verbatim. The IAE catch still guards the one case
          // hex-validation can't: "\U00110000" is all hex digits yet
          // above 0x10FFFF — appendCodePoint rejects it, and the exact
          // pass-through must survive in non-strict mode.
          case 'u' if i + 6 <= s.length && allHex(s, i + 2, i + 6) =>
            try { sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 6), 16)); i += 6 }
            catch { case _: IllegalArgumentException => sb.append(c); i += 1 }
          case 'U' if i + 10 <= s.length && allHex(s, i + 2, i + 10) =>
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
