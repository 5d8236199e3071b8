package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution (ext tier): find records that
  * refer to the same real-world entity despite name variations —
  * the classic data-cleaning step before joining third-party data
  * into a warehouse, and (for training corpora) the metadata-level
  * twin of near-dup text detection.
  *
  * Scale design (100 TB): never pair raw records. Records first
  * collapse to their DISTINCT name dictionary with support counts
  * (one uniform exact-groupBy shuffle — the same shape as
  * [[Dedup.exact]]), and the quadratic fuzzy step runs over the
  * dictionary only, inside blocking-key groups. Dictionary size is
  * O(distinct names) ≪ O(records) and usually broadcastable; the
  * per-block pair space is the only superlinear term, bounded by
  * `maxBlockSize` (drop-and-log, the stop-shingle analogue) with AQE
  * skew-join splitting moderate block skew.
  */
object Linkage {

  /** Default blocking key: the name's first whitespace token. Real
    * deployments swap in soundex/prefix/sorted-neighborhood keys via
    * the `blockKey` parameter — the plan shape is identical.
    */
  def firstTokenBlock(name: Column): Column = split(name, " ").getItem(0)

  /** Distinct-name dictionary with record support counts: (name,
    * n_records). The exact-match collapse that makes the fuzzy step's
    * cost independent of record count.
    */
  def nameDictionary(df: DataFrame, nameCol: String): DataFrame =
    df.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_records"))

  /** Fuzzy candidate pairs over the name dictionary: within each
    * blocking-key group, all name pairs (name_a < name_b) with
    * Levenshtein distance ≤ `maxDist`. A length-difference prefilter
    * (|len a − len b| ≤ maxDist, a lower bound on edit distance) runs
    * inside the join condition before the O(len²) Levenshtein does.
    *
    * Blocks larger than `maxBlockSize` are dropped entirely (emitted
    * by [[oversizedBlocks]] for audit): an unbounded hot block — think
    * "" or "inc" — is the one way this plan goes quadratic at scale.
    */
  def fuzzyNamePairs(
      dict: DataFrame, maxDist: Int,
      blockKey: Column => Column = firstTokenBlock,
      maxBlockSize: Option[Long] = None): DataFrame = {
    val keyed = dict.withColumn("block", blockKey(col("name")))
    val capped = maxBlockSize match {
      case None => keyed
      case Some(cap) =>
        val hot = keyed.groupBy("block").count().filter(col("count") > cap)
          .select("block")
        keyed.join(broadcast(hot), Seq("block"), "left_anti")
    }
    val a = capped.select(col("block").as("block_a"), col("name").as("name_a"),
      col("n_records").as("n_a"))
    val b = capped.select(col("block").as("block_b"), col("name").as("name_b"),
      col("n_records").as("n_b"))
    a.join(b,
        col("block_a") === col("block_b") && col("name_a") < col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }

  /** Blocks whose dictionary population exceeds `cap` — the audit
    * output for [[fuzzyNamePairs]]' drop-and-log posture.
    */
  def oversizedBlocks(dict: DataFrame, cap: Long,
      blockKey: Column => Column = firstTokenBlock): DataFrame =
    dict.withColumn("block", blockKey(col("name")))
      .groupBy("block").agg(count(lit(1)).as("n_names"))
      .filter(col("n_names") > cap)

  /** End-to-end: records → dictionary → blocked fuzzy pairs. */
  def linkRecords(df: DataFrame, nameCol: String, maxDist: Int,
      blockKey: Column => Column = firstTokenBlock,
      maxBlockSize: Option[Long] = None): DataFrame =
    fuzzyNamePairs(nameDictionary(df, nameCol), maxDist, blockKey, maxBlockSize)

  /** Entity resolution end-to-end: dictionary → fuzzy pairs →
    * connected components → canonical entity per fuzzy cluster.
    * Transitivity is deliberate ("widgat"~"widget"~"widgee" is one
    * entity even when the endpoints exceed maxDist) — the same
    * min-label CC engine as near-dup doc clustering
    * ([[DedupCluster.connectedComponents]] is key-type-agnostic, so
    * string names propagate lexicographic minima directly; the
    * entity id IS the cluster's first name in sort order). Returns
    * (name, entity, is_canonical, n_records).
    */
  def resolveEntities(df: DataFrame, nameCol: String, maxDist: Int,
      blockKey: Column => Column = firstTokenBlock,
      maxBlockSize: Option[Long] = None): DataFrame = {
    val dict = nameDictionary(df, nameCol)
    val pairs = fuzzyNamePairs(dict, maxDist, blockKey, maxBlockSize)
    DedupCluster.connectedComponents(dict, pairs,
        idCol = "name", aCol = "name_a", bCol = "name_b")
      .join(dict, Seq("name"))
      .select(col("name"), col("cluster_id").as("entity"),
        col("is_canonical"), col("n_records"))
  }
}
