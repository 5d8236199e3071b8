package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings"; the
  * CCMatrix/LASER recipe): align two corpora X and Y of embeddings by
  * scoring candidate pairs with a RATIO margin —
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x → Y) + avgNN_k(y → X)) / 2)
  *
  * — the cosine normalized by how similar each side is to its
  * neighborhood in the OTHER corpus. Raw cosine thresholds fail
  * because some embeddings sit in dense regions (high cosine with
  * everything — the hubness problem); the margin cancels that, which
  * is why it is the standard mining score for translation-pair
  * extraction at web scale.
  *
  * Mining strategy is INTERSECTION (the paper's most precise): keep
  * (x, y) only when y is x's best forward candidate by margin AND x is
  * y's best backward candidate — mutual-best pairs above `minMargin`.
  *
  * Determinism / oracle discipline: cosines enter at 4dp (the house
  * top-k contract), neighborhood averages re-round to 4dp, and the
  * final margin rounds to 4dp — every arithmetic step is an identical
  * IEEE expression shape in Spark and the SQL oracle, so the mined
  * pairs hash-match cross-engine (bitext_margin). The denominator is
  * clamped at 1e-6 (replayed in the oracle): top-k averages can
  * approach 0 on near-isotropic data, and a sign flip there would turn
  * the margin into nonsense rather than an error.
  *
  * Scale shape: the miner is kNN-frame-agnostic — [[minePairs]] takes
  * the two (qid, nid, cos) frames however they were produced.
  * [[mineBrute]] (X×Y cross join both ways) is the EXACT
  * oracle-replayable baseline, weak-by-design like every brute
  * variant; [[mineIvf]] is the 100 TB path: two
  * [[Similarity.ivfCrossTopK]] bipartite probes (cell-co-partitioned
  * shuffle-hash joins, no broadcast of either corpus, cells scaled
  * with the indexed side), then the same margin algebra — per-id
  * aggregates and id-keyed joins only, nothing quadratic. Recall vs
  * brute is gated in bitext_margin_gate.
  */
object Bitext {

  /** Margin-score and mutual-best-filter two kNN frames. `fwd` is
    * X→Y (qid ∈ X, nid ∈ Y), `bwd` is Y→X; both carry (qid, nid,
    * cos) with cos at 4dp. Output: (src_id, tgt_id, cos, margin),
    * mutual-best pairs with margin ≥ `minMargin`.
    *
    * Every aggregate here is per-id (one row per X or Y member) and
    * every join is id-keyed — the frames are |X|×k / |Y|×k, so the
    * whole scoring pass is linear in the corpora.
    */
  def minePairs(fwd: DataFrame, bwd: DataFrame,
      minMargin: Double): DataFrame = {
    // avg top-k cosine per id, computed as the EXACT rational: 4dp
    // cosines are integers × 1e-4, so the long sum is
    // order-independent, and the single division lands on the same
    // double in every engine. Deliberately NOT re-rounded — an
    // integer sum over k=4 values sits on a decimal x.xxxx5 boundary
    // every 4th time, exactly where Spark's decimal HALF_UP and a
    // binary-scaling round() disagree (observed as 1e-4 margin
    // drift); the unrounded double has no such boundary
    def nnAvg(knn: DataFrame, out: String): DataFrame =
      knn.groupBy(col("qid")).agg(
        (sum(round(col("cos") * 10000).cast("long")).cast("double") /
          (count(lit(1)).cast("double") * 10000.0)).as(out))
    val ax = nnAvg(fwd, "ax").withColumnRenamed("qid", "xid")
    val ay = nnAvg(bwd, "ay").withColumnRenamed("qid", "yid")

    def scored(knn: DataFrame, qIsX: Boolean): DataFrame = {
      val (xc, yc) = if (qIsX) (col("qid"), col("nid"))
        else (col("nid"), col("qid"))
      knn.select(xc.as("xid"), yc.as("yid"), col("cos"))
        .join(ax, "xid").join(ay, "yid")
        .withColumn("margin", round(col("cos") /
          greatest((col("ax") + col("ay")) / 2, lit(1e-6)), 4))
    }
    def best(df: DataFrame, part: String, other: String): DataFrame =
      df.withColumn("__rk", row_number().over(Window
          .partitionBy(col(part))
          .orderBy(col("margin").desc, col(other).asc)))
        .filter(col("__rk") === 1).drop("__rk")

    val bestF = best(scored(fwd, qIsX = true), "xid", "yid")
      .select(col("xid"), col("yid"), col("cos"), col("margin"))
    val bestB = best(scored(bwd, qIsX = false), "yid", "xid")
      .select(col("xid"), col("yid"))
    bestF.join(bestB, Seq("xid", "yid"))
      .filter(col("margin") >= minMargin)
      .select(col("xid").as("src_id"), col("yid").as("tgt_id"),
        col("cos"), col("margin"))
  }

  /** Exact miner: brute bipartite kNN both directions (each side
    * broadcast as the query batch of the other — the all-pairs
    * baseline the oracle replays; weak-by-design at scale, see
    * [[mineIvf]]).
    */
  def mineBrute(x: DataFrame, y: DataFrame, idCol: String,
      vecCol: String, k: Int, minMargin: Double): DataFrame =
    minePairs(
      Similarity.bruteForceTopK(y, x, idCol, vecCol, k),
      Similarity.bruteForceTopK(x, y, idCol, vecCol, k),
      minMargin)

  /** Scale miner: IVF bipartite kNN both directions
    * ([[Similarity.ivfCrossTopK]] — cell-co-partitioned, neither
    * corpus broadcasts, cells scale with the indexed side), same
    * margin algebra. Approximate neighborhoods shift both the
    * candidates and the normalizers, so mined-pair agreement vs
    * [[mineBrute]] is the gated contract, not equality.
    */
  def mineIvf(x: DataFrame, y: DataFrame, idCol: String,
      vecCol: String, k: Int, minMargin: Double,
      nProbe: Int = 8): DataFrame =
    minePairs(
      Similarity.ivfCrossTopK(y, x, idCol, vecCol, k, nProbe = nProbe),
      Similarity.ivfCrossTopK(x, y, idCol, vecCol, k, nProbe = nProbe),
      minMargin)

  /** Serving-path miner over two PERSISTED IVF indexes (one per
    * corpus, each with its centroids) — re-mine after either corpus
    * ticks without re-training or re-assigning anything: the weekly
    * bitext refresh reads two stored (nid, cv, cid) tables and pays
    * only the probe joins + margin algebra. Given the same centroids
    * this is IDENTICAL to [[mineIvf]] (deterministic plan, no RNG) —
    * the equality is bitext_index_gate's contract.
    */
  def mineFromIndexes(
      xIndex: DataFrame, xCentroids: Array[Array[Double]],
      yIndex: DataFrame, yCentroids: Array[Array[Double]],
      x: DataFrame, y: DataFrame, idCol: String, vecCol: String,
      k: Int, minMargin: Double, nProbe: Int = 8): DataFrame =
    minePairs(
      Similarity.ivfCrossTopKFromIndex(yIndex, yCentroids, x,
        idCol, vecCol, k, nProbe),
      Similarity.ivfCrossTopKFromIndex(xIndex, xCentroids, y,
        idCol, vecCol, k, nProbe),
      minMargin)
}
