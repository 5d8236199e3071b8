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

  /** First blocking key: the name's first whitespace token. */
  def firstTokenBlock(name: Column): Column = split(name, " ").getItem(0)

  /** Second blocking key: the first token MINUS its first character —
    * the standard skip-char key that recovers pairs a typo in char 1
    * hides from [[firstTokenBlock]] ("Widget Corp" / "Qidget Corp"
    * share "idget"). Chosen over soundex because it is exactly
    * replayable in ANSI SQL (the driver oracle's contract) with the
    * same recall mechanism: a char-1 SUBSTITUTION lands both names in
    * one block. Char-1 insertions/deletions are NOT recovered —
    * "Widget"→"idget" puts the original's skip key and the typo's
    * first-token key at the same VALUE but under different key-index
    * namespaces ("1:idget" vs "0:idget"), and the namespacing is
    * deliberate (distinct keys must never merge blocks by colliding
    * values); recovering indels needs a dedicated deletion-
    * neighborhood key, not a namespace drop.
    */
  def skipFirstCharBlock(name: Column): Column =
    substring(split(name, " ").getItem(0), 2, Int.MaxValue)

  /** Default blocking: both keys unioned (each name is exploded into
    * one candidate block per key; pairs found under several keys
    * dedupe). Real deployments swap in soundex/prefix/sorted-
    * neighborhood keys via the `blockKeys` parameter — the plan shape
    * is identical for any key count.
    */
  val defaultBlocking: Seq[Column => Column] =
    Seq(firstTokenBlock, skipFirstCharBlock)

  /** One row per (name, blocking key): block values are namespaced by
    * key index ("0:red", "1:ed") so distinct keys can never merge
    * blocks by colliding values; a null key value (empty name)
    * becomes the key's empty block rather than a dropped row.
    */
  private def explodeBlocks(
      dict: DataFrame, blockKeys: Seq[Column => Column]): DataFrame =
    dict.withColumn("block", explode(array(
      blockKeys.zipWithIndex.map { case (k, i) =>
        concat(lit(s"$i:"), coalesce(k(col("name")), lit("")))
      }: _*)))

  /** Distinct-name dictionary with record support counts: (name,
    * n_records). The exact-match collapse that makes the fuzzy step's
    * cost independent of record count.
    */
  def nameDictionary(df: DataFrame, nameCol: String): DataFrame =
    df.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_records"))

  /** Fuzzy candidate pairs over the name dictionary: within each
    * blocking-key group (every key in `blockKeys`, unioned), all name
    * pairs (name_a < name_b) with Levenshtein distance ≤ `maxDist`;
    * a pair surfacing under several keys appears once. A length-
    * difference prefilter (|len a − len b| ≤ maxDist, a lower bound
    * on edit distance) runs inside the join condition before the
    * O(len²) Levenshtein does.
    *
    * Blocks larger than `maxBlockSize` are dropped entirely (emitted
    * by [[oversizedBlocks]] for audit), per key independently: an
    * unbounded hot block — think "" or "inc" — is the one way this
    * plan goes quadratic at scale, and one key's hot block must not
    * sink the other key's coverage.
    */
  def fuzzyNamePairs(
      dict: DataFrame, maxDist: Int,
      blockKeys: Seq[Column => Column] = defaultBlocking,
      maxBlockSize: Option[Long] = None): DataFrame = {
    val keyed = explodeBlocks(dict, blockKeys)
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
      .distinct() // dist/n_a/n_b are pair-determined → exact dedup
  }

  /** Blocks whose dictionary population exceeds `cap` — the audit
    * output for [[fuzzyNamePairs]]' drop-and-log posture. Block
    * values are key-index-namespaced ("0:inc", "1:nc") so the audit
    * names which key went hot.
    */
  def oversizedBlocks(dict: DataFrame, cap: Long,
      blockKeys: Seq[Column => Column] = defaultBlocking): DataFrame =
    explodeBlocks(dict, blockKeys)
      .groupBy("block").agg(count(lit(1)).as("n_names"))
      .filter(col("n_names") > cap)

  /** End-to-end: records → dictionary → blocked fuzzy pairs. */
  def linkRecords(df: DataFrame, nameCol: String, maxDist: Int,
      blockKeys: Seq[Column => Column] = defaultBlocking,
      maxBlockSize: Option[Long] = None): DataFrame =
    fuzzyNamePairs(nameDictionary(df, nameCol), maxDist, blockKeys, maxBlockSize)

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
      blockKeys: Seq[Column => Column] = defaultBlocking,
      maxBlockSize: Option[Long] = None): DataFrame = {
    val dict = nameDictionary(df, nameCol)
    val pairs = fuzzyNamePairs(dict, maxDist, blockKeys, maxBlockSize)
    DedupCluster.connectedComponents(dict, pairs,
        idCol = "name", aCol = "name_a", bCol = "name_b")
      .join(dict, Seq("name"))
      .select(col("name"), col("cluster_id").as("entity"),
        col("is_canonical"), col("n_records"))
  }

  /** Fold a delta's records into a persisted name dictionary —
    * support counts add exactly, so merge ≡ rebuild (spec-pinned).
    * One delta-sized shuffle into the dictionary layout.
    */
  def mergeDictionary(
      priorDict: DataFrame, delta: DataFrame, nameCol: String): DataFrame =
    priorDict.unionByName(nameDictionary(delta, nameCol))
      .groupBy("name").agg(sum(col("n_records")).as("n_records"))

  /** Incremental entity resolution — the delta twin of
    * [[resolveEntities]], the same shapes the near-dup loop already
    * runs at 100 TB: dictionary delta → block-local pairs against the
    * persisted dictionary → [[DedupCluster.mergeDelta]].
    *
    * Only genuinely NEW names can create new pairs (pairs depend on
    * names, not support counts — a delta record re-shipping a known
    * name only bumps `n_records`), so the fuzzy step runs with the
    * delta's new names on one side and the merged dictionary on the
    * other: cost tracks |delta names| × block hit rate, never
    * |dictionary|². Prior cluster assignments fold in as edges
    * (member → its entity), so a new name bridging two old entities
    * correctly merges them without any old×old pair recomputation.
    *
    * Returns the [[resolveEntities]] schema over the UNION corpus;
    * result ≡ a full rerun (spec-pinned) whenever `maxBlockSize` does
    * not newly trip — a block pushed over the cap by delta names
    * drops its pairs in a full rerun but keeps the prior closure
    * here (the same frozen-history posture as [[Dedup
    * .spanDedupDelta]]; a periodic full rebuild reconciles).
    *
    * @param priorDict   (name, n_records) — persisted dictionary
    * @param priorLabels (name, entity) from an earlier resolution
    * @param delta       new records
    */
  def linkDelta(
      priorDict: DataFrame, priorLabels: DataFrame,
      delta: DataFrame, nameCol: String, maxDist: Int,
      blockKeys: Seq[Column => Column] = defaultBlocking,
      maxBlockSize: Option[Long] = None): DataFrame = {
    val merged = mergeDictionary(priorDict, delta, nameCol)
      .localCheckpoint(true) // feeds cap + both join sides + output
    val newNames = merged.join(priorDict.select("name"), Seq("name"),
      "left_anti").select("name")
    val keyed = explodeBlocks(merged, blockKeys)
    val capped = maxBlockSize match {
      case None => keyed
      case Some(cap) =>
        // cap measured on the MERGED dictionary — the full-rerun rule
        val hot = keyed.groupBy("block").count().filter(col("count") > cap)
          .select("block")
        keyed.join(broadcast(hot), Seq("block"), "left_anti")
    }
    val l = capped.join(broadcast(newNames), Seq("name"), "left_semi")
      .select(col("block").as("block_a"), col("name").as("name_a"))
    val r = capped.select(col("block").as("block_b"), col("name").as("name_b"))
    val deltaPairs = l.join(r,
        col("block_a") === col("block_b") &&
          col("name_a") =!= col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      // new×old pairs surface once, new×new twice — normalize + dedup
      .select(least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"))
      .distinct()
    DedupCluster.mergeDelta(
        priorLabels.select(col("name"), col("entity").as("cluster_id")),
        deltaPairs, merged.select("name"),
        idCol = "name", aCol = "name_a", bCol = "name_b")
      .join(merged, Seq("name"))
      .select(col("name"), col("cluster_id").as("entity"),
        col("is_canonical"), col("n_records"))
  }
}
