package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.types.IntegerType
import graft.text.TextAnalysis

/** SQL builders for the library's scalar-function surface, so a
  * SQL-only user gets the same primitives as the Column API:
  * `SELECT graft_tokenize(text) …` after registering
  * [[org.apache.spark.sql.graft.GraftExtensions]] (or passing it via
  * `spark.sql.extensions`). Each builder re-expresses the corresponding
  * Column chain over the call's child expressions — the resulting plan
  * is IDENTICAL to the Column API's (same codegen'd built-ins, no UDF
  * wrapper), so SQL use keeps whole-stage codegen.
  *
  * Optional numeric parameters (tokenizer min length, q-gram width,
  * shingle size) must be foldable int expressions — they parameterize
  * the generated expression tree, they are not runtime values. Foldable
  * covers both bare literals and constant arithmetic (`2 + 1`): builders
  * run BEFORE the optimizer's constant folding, so [[intLit]] evaluates
  * the foldable tree itself.
  */
object SqlFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval() match {
        case v: Int => v
        case _ => throw new IllegalArgumentException(
          s"$fn expects a non-null foldable int parameter, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn expects a foldable int parameter, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], allowed: Range): Unit =
    require(allowed.contains(args.length),
      s"$fn takes ${allowed.start}${if (allowed.size > 1) s"-${allowed.last}" else ""} arguments, got ${args.length}")

  /** name → builder for every SQL-registered scalar function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokenize" -> { args =>
      arity("graft_tokenize", args, 1 to 2)
      val minLen = args.drop(1).headOption.map(intLit(_, "graft_tokenize")).getOrElse(3)
      toExpr(Text.tokenize(toCol(args.head), minLen))
    },
    "graft_qgrams" -> { args =>
      arity("graft_qgrams", args, 1 to 2)
      val q = args.drop(1).headOption.map(intLit(_, "graft_qgrams")).getOrElse(3)
      toExpr(Text.qgrams(toCol(args.head), q))
    },
    "graft_word_shingles" -> { args =>
      arity("graft_word_shingles", args, 1 to 2)
      val n = args.drop(1).headOption.map(intLit(_, "graft_word_shingles")).getOrElse(3)
      toExpr(Text.wordShingles(toCol(args.head), n))
    },
    "graft_strip_datatype" -> { args =>
      arity("graft_strip_datatype", args, 1 to 1)
      toExpr(Text.stripDatatype(toCol(args.head)))
    },
    "graft_md5_long" -> { args =>
      arity("graft_md5_long", args, 1 to 1)
      toExpr(Text.md5Long(toCol(args.head)))
    },
    "graft_lang_id" -> { args =>
      arity("graft_lang_id", args, 1 to 1)
      toExpr(TextAnalysis.langId(toCol(args.head)))
    },
    "graft_quality_e6" -> { args =>
      arity("graft_quality_e6", args, 1 to 1)
      toExpr(TextAnalysis.qualityScore(toCol(args.head)))
    },
    "graft_ws_tokens" -> { args =>
      arity("graft_ws_tokens", args, 1 to 1)
      toExpr(TextAnalysis.wsTokenCount(toCol(args.head)))
    },
    "graft_bpe_tokens" -> { args =>
      arity("graft_bpe_tokens", args, 1 to 1)
      toExpr(TextAnalysis.bpeIshTokenCount(toCol(args.head)))
    },
    "graft_fingerprint" -> { args =>
      arity("graft_fingerprint", args, 1 to 1)
      toExpr(TextAnalysis.fingerprint(toCol(args.head)))
    },
    "graft_hamming" -> { args =>
      arity("graft_hamming", args, 2 to 2)
      toExpr(SimHash.hamming(toCol(args.head), toCol(args(1))))
    },
    "graft_bloom_might_contain" -> { args =>
      // (foldable binary bloom — e.g. an X'…' hex literal of a
      // serialized util.sketch.BloomFilter — , string value); the
      // expression's own type check enforces foldability
      arity("graft_bloom_might_contain", args, 2 to 2)
      org.apache.spark.sql.graft.BloomMightContain(args.head, args(1))
    },
    "graft_normalize" -> { args =>
      // (string [, form literal 'NFC'|'NFD'|'NFKC'|'NFKD']) — Unicode
      // normalization via the codegen'd JDK-Normalizer expression
      arity("graft_normalize", args, 1 to 2)
      val form = args.drop(1).headOption.map {
        case Literal(v, t) if t.typeName == "string" && v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"graft_normalize form must be a string literal, got $other")
      }.getOrElse("NFC")
      org.apache.spark.sql.graft.UnicodeNormalize(args.head, form)
    })

  /** Convenience mirrors of the Column API for SQL-built columns. */
  def apply(name: String, cols: Column*): Column =
    toCol(all.toMap.apply(name)(cols.map(toExpr)))
}
