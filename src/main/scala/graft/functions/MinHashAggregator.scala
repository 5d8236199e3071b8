package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as ONE typed aggregation: buffer = long[numPerm]
  * of per-permutation minima, update = one tight primitive loop.
  *
  * Why not 128 separate `min(pmod(h*a+b, p))` agg columns (the
  * composed-expression formulation): the values are identical, but a
  * 128-column HashAggregate generates enormous codegen (method-split
  * update functions, 128-slot unsafe buffers) whose janino+C2 compile
  * time dominated the whole query at bench scale and bloated the
  * code cache for every later plan. The typed buffer is opaque to
  * codegen — one ObjectHashAggregate with an O(numPerm) JVM loop per
  * row, partial-aggregating map-side exactly like the column form.
  *
  * Determinism contract: permutation i is min((h·a_i + b_i) mod p)
  * with the same (a_i, b_i, p) the column form used — all inputs are
  * in [0, p) with p = 2³¹−1, so products stay under 2⁶² (no overflow)
  * and plain `%` equals pmod. Band keys built from this signature are
  * bit-identical to the old plan's.
  */
object MinHashAggregator {

  final case class Sig(mins: Array[Long])

  def minhash(as: Array[Long], bs: Array[Long], prime: Long): Aggregator[Long, Sig, Array[Long]] =
    new Aggregator[Long, Sig, Array[Long]] {
      private val n = as.length

      override def zero: Sig = Sig(Array.fill(n)(Long.MaxValue))

      override def reduce(s: Sig, h: Long): Sig = {
        val m = s.mins
        var i = 0
        while (i < n) {
          val v = (h * as(i) + bs(i)) % prime
          if (v < m(i)) m(i) = v
          i += 1
        }
        s
      }

      override def merge(a: Sig, b: Sig): Sig = {
        val ma = a.mins
        val mb = b.mins
        var i = 0
        while (i < n) {
          if (mb(i) < ma(i)) ma(i) = mb(i)
          i += 1
        }
        a
      }

      override def finish(s: Sig): Array[Long] = s.mins

      override def bufferEncoder: Encoder[Sig] = Encoders.product[Sig]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
}
