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

  /** Heavy join keys of `large`, detected in ONE pass through a
    * Misra–Gries sketch (PODS'82 guarantee: every key with true
    * frequency > N/k SURVIVES the sketch — the returned set is a
    * SUPERSET of the keys hot enough to stall a reducer, which is
    * exactly the safe direction for salting: a cold key salted by
    * mistake costs factor−1 extra small-side rows, a hot key missed
    * costs a stalled stage). State is k counters per partition,
    * merged associatively; the result is k-bounded by construction.
    * Keys are compared as their `\\u0001`-joined string form — the
    * same canonicalization [[adaptiveSaltedJoin]] salts on.
    */
  def hotKeys(large: DataFrame, keys: Seq[String], k: Int = 64)
      : Seq[String] = {
    val keyStr = concat_ws("\u0001",
      keys.map(c => col(c).cast("string")): _*)
    val mg = udaf(graft.functions.MisraGriesAggregator.misraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    ModelCollect.bounded(
      large.select(keyStr.as("__k"))
        .agg(mg(col("__k")).as("s"))
        .select(explode(col("s")).as("c"))
        .select(col("c.item")),
      k, "adaptive-salt hot keys (k-bounded by the MG sketch)")
      .map(_.getString(0))
  }

  /** [[saltedJoin]] that salts ONLY the hot keys — the differentiated
    * form every production skew fix converges on: blanket salting
    * replicates the ENTIRE small side `factor`× (the dominant cost at
    * scale: a 100 GB dim becomes `factor` × 100 GB of shuffle),
    * while the hot set is almost always a handful of keys. Here the
    * large side salts a row only when its key is in [[hotKeys]]'
    * superset (cold rows keep salt 0), and the small side replicates
    * ONLY its hot rows — replication cost |small| + |hot ∩ small| ×
    * (factor − 1), independent of |small|'s cold mass. Result is
    * row-identical to the plain join for inner/left semantics (each
    * large row still meets every matching small row exactly once, at
    * exactly one salt).
    */
  def adaptiveSaltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, k: Int = 64,
      joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins, not $joinType")
    val hot = hotKeys(large, keys, k)
    if (hot.isEmpty || factor == 1)
      return large.join(small, keys, joinType)
    def keyStr(df: DataFrame) = concat_ws("\u0001",
      keys.map(c => df(c).cast("string")): _*)
    val saltedLarge = large.withColumn("__salt",
      when(keyStr(large).isin(hot: _*),
        pmod(xxhash64(large.columns.map(col): _*), lit(factor)))
        .otherwise(lit(0)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(when(keyStr(small).isin(hot: _*),
        sequence(lit(0), lit(factor - 1)))
        .otherwise(array(lit(0)))))
    saltedLarge
      .join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

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
