package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed join keys (SURVEY §4, "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join handles moderate skew by splitting oversized
  * partitions, but it only helps sort-merge joins and can't split a
  * single hot KEY's hash bucket across reducers when the build side
  * must also move. Salting solves the single-hot-key case directly:
  * the large side scatters each key across `factor` sub-keys, the
  * small side is replicated `factor` times, and the join runs on
  * (keys :+ salt) — every reducer gets ≤ 1/factor of the hottest key.
  * Cost: small side shuffles factor× its size; use only when a
  * broadcast join is impossible (small side too big) AND a key is hot
  * enough to stall a reducer.
  *
  * The salt is `pmod(xxhash64(whole large row), factor)` — spreading
  * is content-based and even; the join RESULT is identical to the
  * unsalted join for inner/left semantics regardless of salt values
  * (each large row still meets every matching small row exactly once).
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins, not $joinType")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(factor)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLarge
      .join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
