package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a whitespace-tokenized text, as ONE
  * monolithic expression.
  *
  * Why not compose `transform`/`slice`/`array_join`/`filter`: those
  * higher-order functions are interpreted (no doGenCode), and their
  * shared `eval` dispatch sites go megamorphic once OTHER big plans
  * run in the same JVM — measured 12× slowdown of the composed
  * shingle pipeline right after the 128-expression minhash signature
  * job. A single expression whose eval does plain Java loops is one
  * virtual call per row regardless of JIT profile state, and ~10×
  * less allocation (no per-lambda frames, no intermediate arrays).
  *
  * Semantics (must mirror the DuckDB oracle in ExtQueries):
  * split on single spaces, drop empty tokens, emit every
  * k-consecutive-token join with ' ', distinct, first-occurrence
  * order. Docs with fewer than k tokens yield an empty array.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    // count non-empties without allocating a filtered copy
    var nTok = 0
    var i = 0
    while (i < toks.length) { if (!toks(i).isEmpty) nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) { words(j) = toks(i); j += 1 }
      i += 1
    }
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= nTok - k) {
      sb.setLength(0)
      var d = 0
      while (d < k) {
        if (d > 0) sb.append(' ')
        sb.append(words(i + d))
        d += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s =>
      UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def column(text: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), k))
}
