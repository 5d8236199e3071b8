package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation (ext tier): MRR / recall@k / nDCG@k
  * over a ranked result set vs a relevance-judgment set — the metrics
  * loop that closes the ANN/BM25/hybrid serving path ("is the index
  * still good?" as a number, not a feeling). The ANN recall gates
  * check approximate-vs-exact agreement; this measures the *exact*
  * ranking against external ground truth.
  *
  * Scale design: everything is keyed by query id. `results` is
  * O(k · queries) by construction; the only superlinear risk is a
  * query with a huge judged-relevant set, and that only inflates one
  * count. Two qid-keyed shuffles total, both over small inputs — the
  * corpus itself never enters this operator.
  */
object Eval {

  /** Per-query rank metrics from binary relevance judgments.
    *
    * @param results ranked system output: (qid, nid, rank), rank
    *                1-based; rows with rank > k are ignored
    * @param qrels   relevance judgments: (qid, nid) pairs judged
    *                relevant (binary gain)
    * @return one row per judged qid: reciprocal rank `rr` (0 when no
    *         relevant doc in the top k), `recall_at_k` (hits / judged
    *         relevant), `ndcg_at_k` (binary-gain DCG over the ideal
    *         DCG of min(n_rel, k) relevant docs at ranks 1..)
    *
    * All doubles round to 4dp: each per-query sum has ≤ k terms, so
    * summation-order ulp drift sits far below the rounding quantum
    * and the DuckDB oracle hash-matches exactly.
    *
    * Both inputs are dedup'd defensively: duplicate (qid, nid) rows in
    * `results` keep their best (minimum) rank, so repeated result rows
    * cannot inflate n_hits/DCG past the documented [0,1] metric range.
    */
  def rankMetrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val topk = results.filter(col("rank") <= k)
      .groupBy(col("qid"), col("nid")).agg(min(col("rank")).as("rank"))
    val rel = qrels.select(col("qid"), col("nid")).distinct()
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = topk.join(rel, Seq("qid", "nid"))
      .groupBy("qid").agg(
        min(col("rank")).as("first_hit"),
        count(lit(1)).as("n_hits"),
        sum(lit(1.0) / log2(col("rank") + 1)).as("dcg"))
    // ideal DCG: the best achievable with min(n_rel, k) relevant docs
    // packed at ranks 1..; sequence+aggregate keeps the summation
    // order fixed so both engines add the same terms in the same order
    val idcg = aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k)).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
    nRel.join(hits, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 4).as("rr"),
        round(coalesce(col("n_hits").cast("double") / col("n_rel"), lit(0.0)), 4)
          .as("recall_at_k"),
        round(coalesce(col("dcg"), lit(0.0)) / idcg, 4).as("ndcg_at_k"))
  }

  /** Macro-averaged summary of [[rankMetrics]]: one row — mean RR
    * (= MRR), mean recall@k, mean nDCG@k, query count.
    */
  def rankSummary(results: DataFrame, qrels: DataFrame, k: Int): DataFrame =
    rankMetrics(results, qrels, k).agg(
      round(avg(col("rr")), 4).as("mrr"),
      round(avg(col("recall_at_k")), 4).as("mean_recall"),
      round(avg(col("ndcg_at_k")), 4).as("mean_ndcg"),
      count(lit(1)).as("n_queries"))

  /** Graded-relevance rank metrics — the TREC-style extension of
    * [[rankMetrics]]: judgments carry an integer gain (2 = highly
    * relevant, 1 = partially, unjudged = 0) instead of a binary
    * flag, and nDCG weights each hit by its gain. Per judged qid:
    * `dcg_at_k` = Σ gain/log2(rank+1) over the top-k hits,
    * `ndcg_at_k` against the ideal ordering (all judged docs sorted
    * by gain descending, packed at ranks 1..k), `n_rel` = judged
    * docs. Same qid-keyed scale shape and 4dp-rounding discipline as
    * the binary metrics (≤ k terms per sum keeps cross-engine ulp
    * drift below the quantum); duplicate inputs dedup defensively —
    * results to best rank, judgments to max gain.
    */
  def rankMetricsGraded(
      results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    def log2(c: org.apache.spark.sql.Column) =
      log(c) / log(lit(2.0))
    val topk = results.filter(col("rank") <= k)
      .groupBy(col("qid"), col("nid")).agg(min(col("rank")).as("rank"))
    val rel = qrels.groupBy(col("qid"), col("nid"))
      .agg(max(col("gain")).as("gain"))
      .localCheckpoint(true) // feeds the ideal AND the hit join
    val ideal = rel.groupBy("qid")
      .agg(count(lit(1)).as("n_rel"),
        // fixed summation order: sort gains desc, walk the first k
        aggregate(
          slice(reverse(array_sort(collect_list(
            col("gain").cast("double")))), 1, k),
          struct(lit(0.0).as("s"), lit(1).as("i")),
          (acc, g) => struct(
            (acc.getField("s") + g /
              log2(acc.getField("i").cast("double") + 1)).as("s"),
            (acc.getField("i") + 1).as("i")),
          acc => acc.getField("s")).as("idcg"))
    val hits = topk.join(rel, Seq("qid", "nid"))
      .groupBy("qid")
      .agg(sum(col("gain").cast("double") /
        log2(col("rank").cast("double") + 1)).as("dcg"))
    ideal.join(hits, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(col("dcg"), lit(0.0)), 4).as("dcg_at_k"),
        // idcg=0 is legal input (TREC qrels routinely carry queries
        // whose judged rows are all gain 0): ndcg is 0, not null
        round(when(col("idcg") === 0, lit(0.0))
          .otherwise(coalesce(col("dcg"), lit(0.0)) / col("idcg")), 4)
          .as("ndcg_at_k"),
        col("n_rel"))
  }

  /** Per-class classification metrics from (true, pred) pairs — the
    * evaluation companion to the label predictors ([[Similarity
    * .knnPredict]], [[Similarity.labelPropagation]], the quality
    * classifier): one row per class appearing on EITHER side with
    * support, predicted count, true positives, precision, recall and
    * F1. Integer-ratio formulations throughout (F1 = 2·tp /
    * (n_pred + n_true) — algebraically 2PR/(P+R) without the
    * intermediate divisions), so a SQL oracle hash-matches exactly;
    * zero-denominator conventions: a class never predicted has
    * precision 0, never true has recall 0.
    *
    * Scale shape: three class-grain aggregations over the prediction
    * rows (partial counts map-side — the exchanges carry one row per
    * class per task) joined on the model-sized class key. Micro
    * accuracy is `sum(tp) / sum(n_true)` over this output; macro-F1
    * is `avg(f1)`.
    */
  def classificationMetrics(
      preds: DataFrame, trueCol: String, predCol: String): DataFrame = {
    // three aggregation branches consume the predictions; without
    // truncation each re-executes the upstream predictor (for kNN
    // that is 3× the brute scoring pass) — the checkpoint holds
    // prediction-count rows, tiny at any scale
    val pr = preds.select(col(trueCol), col(predCol)).localCheckpoint(true)
    val t = pr.groupBy(col(trueCol).as("class"))
      .agg(count(lit(1)).as("n_true"))
    val p = pr.groupBy(col(predCol).as("class"))
      .agg(count(lit(1)).as("n_pred"))
    val tp = pr.filter(col(trueCol) === col(predCol))
      .groupBy(col(trueCol).as("class")).agg(count(lit(1)).as("tp"))
    t.join(p, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") === 0, 0.0)
        .otherwise(round(col("tp").cast("double") / col("n_pred"), 4)))
      .withColumn("recall", when(col("n_true") === 0, 0.0)
        .otherwise(round(col("tp").cast("double") / col("n_true"), 4)))
      .withColumn("f1", when(col("n_pred") + col("n_true") === 0, 0.0)
        .otherwise(round(lit(2.0) * col("tp") /
          (col("n_pred") + col("n_true")), 4)))
  }
}
