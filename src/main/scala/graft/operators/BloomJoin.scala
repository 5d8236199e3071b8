package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType}

/** Bloom-filter join pruning: filter the big (fact) side of an
  * equi-join with a compact membership sketch of the small side's
  * keys BEFORE any exchange, so rows that cannot match never enter
  * the shuffle.
  *
  * Where this sits in the join toolbox (SURVEY §2.3): broadcast-hash
  * is best when the dim FITS in executor memory; this is the next
  * rung — the dim's key set is too big to broadcast as a hash
  * relation, but a bloom filter of it is a few MB at any realistic
  * cardinality (1.2 GB of keys ≈ 10 MB of bloom at 1% fpp). Exactly
  * the shape Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
  * shuffle joins; this operator makes the pattern explicit,
  * deterministic, and available to implementer pipelines at any
  * join, with the result still EXACT — bloom false positives are
  * eliminated by the real join that follows.
  *
  * The membership probe is the [[graft.functions.BloomProbe]] native
  * expression (Spark's own BloomFilterMightContain is private to its
  * runtime-filter rule): it generates a direct `mightContainLong` /
  * `mightContainBinary` call inside whole-stage codegen, so the
  * pruning filter fuses with the fact scan instead of forcing a
  * row-format boundary the way the previous UDF probe did. The sketch
  * itself is built distributed (one aggregation over the dim) and
  * only the filter bytes come to the driver — collecting the model,
  * not the data.
  */
object BloomJoin {

  /** Inner equi-join `fact ⋈ dim ON factKey = dimKey` with the fact
    * side bloom-pruned first. Result is exactly the plain join's.
    *
    * @param expectedItems sizing for the sketch (dim key cardinality)
    * @param fpp           false-positive rate: tune the
    *                      pruning-precision vs sketch-size trade
    */
  def prunedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val pruned = prunedFact(fact, dim, factKey, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Just the pruning step: fact rows whose key the sketch admits
    * (all true matches + ~fpp false positives). Exposed separately so
    * pipelines can prune once and reuse across several joins.
    */
  def prunedFact(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    fact.schema(factKey).dataType match {
      case LongType | IntegerType | StringType => ()
      case t => throw new IllegalArgumentException(
        s"bloom pruning supports long/int/string keys, got ${t.catalogString}")
    }
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(graft.functions.BloomProbe.column(col(factKey), bf))
  }
}
