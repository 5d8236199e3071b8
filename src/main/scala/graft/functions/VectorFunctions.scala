package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float/double>` embedding columns. The dot
  * product — the hot path inside join conditions and reranks — is a
  * native codegen'd Catalyst expression ([[DotProduct]]); Spark's
  * higher-order functions (`zip_with`+`aggregate`) compute the same
  * value but evaluate interpreted (no doGenCode), which was measured
  * ~100× slower inside a BroadcastNestedLoopJoin condition.
  *
  * Determinism contract: all accumulation is sequential left-to-right
  * in double, which matches DuckDB's list_* evaluation — the oracle
  * sees bit-identical results.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> once, up front, so every later
    * product/sum runs in double (float accumulation drifts). A plain
    * Cast, NOT `transform(_.cast)`: Cast over arrays is codegen'd,
    * the higher-order transform is interpreted per element.
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = DotProduct.column(a, b)

  def normSq(a: Column): Column = dot(a, a)

  /** Unit-length copy (codegen'd [[L2Normalize]]): one norm pass +
    * one scale pass per row. The naive
    * `transform(v, x / sqrt(normSq(v)))` re-evaluates the interpreted
    * norm for EVERY element — O(d²) interpreted work per row.
    */
  def l2Normalize(v: Column): Column = L2Normalize.column(v)

  /** cos(a,b) = dot / sqrt(|a|²·|b|²) — single-sqrt form; the oracle
    * SQL uses the identical formula so both engines compute the same
    * double.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** [[cosine]] with the norms precomputed PER ROW: inside an
    * all-pairs or cross join, `cosine(a, b)` re-walks both vectors
    * three times per PAIR (dot + both norms); carrying |a|² and |b|²
    * as row columns cuts that to one dot per pair — a 3× cut on the
    * quadratic paths' inner loop. Identical arithmetic (the norm
    * doubles are the same values, multiplied and rooted in the same
    * order), so results are bit-identical to [[cosine]] and to the
    * oracle.
    */
  def cosinePre(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dot(a, b) / sqrt(normSqA * normSqB)
}
