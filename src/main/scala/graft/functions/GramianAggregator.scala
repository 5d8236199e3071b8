package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass second-moment (Gramian) summary of a vector column:
  * (n, Σx, upper-triangle of ΣxxᵀT) — the sufficient statistics for a
  * covariance matrix, and therefore for PCA.
  *
  * Scale rationale (SURVEY §7.4): covariance at 100 TB must NOT be
  * "center then multiply" (two passes, one of them shuffling n×d
  * rows) nor a d²-column explode. As a typed aggregation the partial
  * state is one fixed-size buffer of d(d+1)/2 + d + 1 doubles per
  * partition (d=64 → ~17 KB), combined map-side; the exchange ships
  * one buffer per partition and the merged result is the same
  * buffer. One narrow pass, one model-sized reduction — the exact
  * shape `RowMatrix.computeGramianMatrix` uses, expressed as a
  * DataFrame aggregation so it composes with filters/projections
  * that Catalyst pushes into the scan.
  *
  * The buffer is mutated in place (Aggregator contract allows it);
  * `zero`'s empty arrays are lazily sized on first reduce so the
  * aggregator needs no a-priori dimension.
  */
object GramianAggregator {

  /** n rows, per-coordinate sums, row-major upper triangle of the
    * raw second-moment matrix (g(idx(i,j)) = Σ x_i·x_j, i ≤ j).
    */
  final case class Gram(var n: Long, var s: Array[Double], var g: Array[Double])

  /** Index of (i, j), i ≤ j, in the packed upper triangle of a d×d
    * symmetric matrix.
    */
  def triIndex(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  def gramian: Aggregator[Seq[Double], Gram, Gram] =
    new Aggregator[Seq[Double], Gram, Gram] {
      override def zero: Gram = Gram(0L, Array.empty, Array.empty)

      override def reduce(b: Gram, row: Seq[Double]): Gram = {
        val x = row.toArray
        val d = x.length
        if (b.n == 0L && b.s.isEmpty) {
          b.s = new Array[Double](d)
          b.g = new Array[Double](d * (d + 1) / 2)
        }
        require(b.s.length == d,
          s"gramian: inconsistent vector dims ${b.s.length} vs $d")
        var i = 0
        var t = 0
        while (i < d) {
          b.s(i) += x(i)
          var j = i
          while (j < d) { b.g(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
        b.n += 1
        b
      }

      override def merge(a: Gram, b: Gram): Gram = {
        if (a.n == 0L) return b
        if (b.n == 0L) return a
        require(a.s.length == b.s.length,
          s"gramian: inconsistent vector dims ${a.s.length} vs ${b.s.length}")
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        i = 0
        while (i < a.g.length) { a.g(i) += b.g(i); i += 1 }
        a.n += b.n
        a
      }

      override def finish(r: Gram): Gram = r
      override def bufferEncoder: Encoder[Gram] = Encoders.product[Gram]
      override def outputEncoder: Encoder[Gram] = Encoders.product[Gram]
    }
}
