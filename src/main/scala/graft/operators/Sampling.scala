package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (ext tier).
  *
  * Hash-based, not `rand()`-based: the sampling decision for a row is
  * a pure function of its id, so (a) reruns reproduce the exact same
  * sample (resumable pipelines, debuggable evals), (b) the sample is
  * STABLE under corpus growth — new rows don't reshuffle old
  * decisions the way seeded-rand-per-partition does when partitioning
  * changes, and (c) the same id draws the same verdict in every
  * table, so sampled fact tables stay joinable. The hash is md5 (not
  * xxhash64) so the decision is reproducible by any engine — the
  * DuckDB oracle replicates it bit-for-bit.
  *
  * Plan shape: a narrow codegen'd filter — no shuffle, pushes nothing
  * but reads nothing it doesn't need; linear scale-out.
  */
object Sampling {

  /** Basis for fraction resolution: fractions quantize to 1/10000. */
  private val Basis = 10000L

  /** Per-row hash bucket in [0, Basis): first 8 md5 hex chars of the
    * stringified id. 32 bits of hash → bucket skew ≤ 2⁻³² per id.
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(Basis))

  /** Uniform deterministic sample: keep ~`fraction` of rows. */
  def deterministic(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hashBucket(col(idCol)) < lit((fraction * Basis).round))
  }

  /** Weighted (importance) deterministic sample: each row's keep
    * probability comes from its own weight column in [0,1] — e.g. a
    * quality score, so high-quality documents survive preferentially
    * while the decision stays a pure function of the id (reproducible,
    * growth-stable). Weights outside [0,1] are clamped.
    */
  def weighted(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    // round like the static-fraction APIs do — a cast would TRUNCATE
    // (0.29 * 10000 = 2899.99… → 2899) and flip one bucket's verdict
    // relative to deterministic(0.29)
    df.filter(hashBucket(col(idCol)) < round(w * Basis).cast("long"))
  }

  /** Seeded per-row shuffle key: md5 of "seed:id". Changing the seed
    * is a fresh epoch-level reshuffle; the same seed reproduces the
    * exact order on any engine (md5, not xxhash64, for that reason).
    */
  def shuffleKey(id: Column, seed: String): Column =
    md5(concat(lit(seed + ":"), id.cast("string")))

  /** Shard in [0, numShards) from the first 32 bits of the shuffle
    * key — uniform (md5), deterministic, engine-reproducible.
    */
  def shardOf(id: Column, seed: String, numShards: Int): Column =
    pmod(conv(substring(shuffleKey(id, seed), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))

  /** Deterministic global shuffle — the canonical LAST step of a
    * training-data pipeline: break corpus locality (source/time runs)
    * so sequential readers see an unbiased stream, split into
    * `numShards` reproducible shards for parallel loaders.
    *
    * Rows gain `shard` and `shuffle_key`; reading a shard in
    * shuffle_key order IS the shuffled stream. Narrow op — callers
    * that only need assignment pay no exchange at all.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shard", shardOf(col(idCol), seed, numShards))
      .withColumn("shuffle_key", shuffleKey(col(idCol), seed))
  }

  /** Export the shuffled corpus: ONE uniform hash exchange on the
    * shard id, in-task sort by (shard, shuffle_key) — that prefix
    * ordering satisfies the partitioned writer's requirement, so no
    * second sort is injected — then exactly one key-ordered parquet
    * file per `shard=` directory. At 100 TB: the exchange carries each
    * row once with 32-bit-uniform keys (no skew possible), and loaders
    * stream shards independently.
    */
  def writeShuffledShards(df: DataFrame, path: String, idCol: String,
      seed: String, numShards: Int): Unit =
    shuffleShards(df, idCol, seed, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "shuffle_key")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Stratified deterministic sample: per-stratum keep fractions with
    * a default for unlisted strata — the corpus-balancing op (e.g.
    * downsample dominant languages, keep all of a rare one).
    */
  def stratified(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val threshold = fractions.foldLeft(lit((defaultFraction * Basis).round)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit((f * Basis).round)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
