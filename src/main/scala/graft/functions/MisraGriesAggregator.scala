package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed aggregator: a
  * single-pass, mergeable, O(k)-state summary whose survivors are a
  * guaranteed SUPERSET of every item with true frequency > N/(k+1).
  *
  * Scale rationale (SURVEY §7.4): "what are the frequent tokens /
  * n-grams" at 100 TB cannot start with `groupBy(token)` — the
  * exchange carries one row per (partition, distinct token), and
  * n-gram cardinality grows with the corpus. As an aggregation the
  * sketch combines map-side: each partition ships AT MOST k counters
  * (k is 100s), the merged sketch is again ≤ k counters, and the
  * whole corpus pays one narrow pass + a k-row exchange. The sketch
  * alone under-counts (by ≤ N/(k+1)) and its exact contents depend
  * on merge order, so [[graft.operators.TextAnalysis.heavyHitters]]
  * reranks the candidates with an exact count — the FINAL answer is
  * exact and deterministic; only the (superset) candidate route
  * through the data is approximate.
  *
  * Merge rule (Agarwal et al., "Mergeable summaries", PODS'12): sum
  * counts by key; if more than k survive, subtract the (k+1)-th
  * largest count from all and drop the non-positive. This preserves
  * the error bound under arbitrary merge trees — exactly Spark's
  * partial-aggregate shape.
  */
object MisraGriesAggregator {

  /** ≤ k (item, lower-bound count) counters. An immutable Map buffer:
    * per-row updates are O(1) `updated` calls; the O(k) decrement-all
    * only fires when a full sketch meets an untracked item, and each
    * decrement cancels a prior increment, so the amortized per-row
    * cost stays O(1).
    */
  final case class Sketch(counts: Map[String, Long])

  final case class Counted(item: String, est: Long)

  def misraGries(k: Int): Aggregator[String, Sketch, Array[Counted]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[String, Sketch, Array[Counted]] {
      override def zero: Sketch = Sketch(Map.empty)

      override def reduce(b: Sketch, item: String): Sketch = {
        val m = b.counts
        m.get(item) match {
          case Some(c) => Sketch(m.updated(item, c + 1))
          case None if m.size < k => Sketch(m.updated(item, 1L))
          case None => Sketch(m.collect {
            case (t, c) if c > 1 => t -> (c - 1)
          })
        }
      }

      override def merge(a: Sketch, b: Sketch): Sketch = {
        if (a.counts.isEmpty) return b
        if (b.counts.isEmpty) return a
        val comb = b.counts.foldLeft(a.counts) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        if (comb.size <= k) Sketch(comb)
        else {
          // (k+1)-th largest count, subtracted from everyone: ≤ k
          // strictly-positive survivors remain
          val vals = comb.valuesIterator.toArray
          java.util.Arrays.sort(vals)
          val cut = vals(comb.size - k - 1)
          Sketch(comb.collect { case (t, c) if c > cut => t -> (c - cut) })
        }
      }

      override def finish(s: Sketch): Array[Counted] =
        s.counts.toArray.sortBy { case (t, c) => (-c, t) }
          .map { case (t, c) => Counted(t, c) }

      override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
      override def outputEncoder: Encoder[Array[Counted]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Counted]]()
    }
  }
}
