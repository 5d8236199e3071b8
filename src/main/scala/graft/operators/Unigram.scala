package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ViterbiPieces

/** Unigram-LM subword tokenization (the SentencePiece algorithm,
  * Kudo 2018) — the second tokenizer family next to [[Bpe]]: instead
  * of learning merge rules bottom-up, it fits a unigram distribution
  * over a LARGE seed piece inventory by EM and prunes to the target
  * vocabulary; decode is max-likelihood Viterbi segmentation
  * ([[graft.functions.ViterbiPieces]]) rather than greedy
  * longest-match.
  *
  * Same distribution-of-labor as [[Bpe.train]] (the shape every
  * reference unigram trainer uses): the corpus pays exactly ONE
  * word-histogram aggregation — a single uniform shuffle with
  * map-side combine — and the EM loop runs on the driver over the
  * model-sized histogram (capped to the `maxWords` head,
  * deterministic tie-break). EM never needs row data: expected piece
  * counts are forward-backward sums over each DISTINCT word's
  * segmentation lattice, weighted by word frequency. The alternative
  * (per-iteration cluster passes) would be emIters corpus scans.
  *
  * Honest divergence from the paper: pruning drops the lowest-
  * probability pieces by rank (prob desc, token asc — deterministic)
  * rather than by per-piece likelihood-loss, and there is no final
  * n-best/sampling decode. Single-character pieces are never pruned,
  * so every word the histogram saw segments without unknowns and the
  * round-trip property is unconditional.
  *
  * Everything is deterministic — fixed iteration order over sorted
  * words, fixed-order log-sum-exp reductions, rank-based pruning —
  * so train-twice equality and the driver's hash gates hold.
  */
object Unigram {

  /** A trained unigram tokenizer: (piece, logProb) sorted by
    * (logProb desc, piece) — that order is the id assignment
    * (1-based), mirroring [[Bpe.BpeModel]].
    */
  final case class UnigramModel(pieces: Seq[(String, Double)]) {
    require(pieces.nonEmpty, "empty unigram model")
    def maxPieceLen: Int = pieces.iterator.map(_._1.length).max

    /** Strictly below every real piece: an unseen character can never
      * outscore a modeled segmentation.
      */
    def unkLogProb: Double = pieces.iterator.map(_._2).min - 10.0

    /** (token, log_prob, id) — persist/serve shape. */
    def piecesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      pieces.zipWithIndex.map { case ((t, p), i) => (t, p, i + 1) }
        .toDF("token", "log_prob", "id")
    }
  }

  /** Max-likelihood pieces of `text` under a model — narrow, zero
    * exchanges (the model rides into the expression as a literal).
    */
  def pieces(text: Column, model: UnigramModel): Column =
    ViterbiPieces.column(text, model.pieces, model.maxPieceLen,
      model.unkLogProb)

  /** Piece count under a model — the drop-in `tokenCount` for
    * [[Packing.packSequences]] / [[TextAnalysis.chunk]].
    */
  def pieceCount(text: Column, model: UnigramModel): Column =
    size(pieces(text, model))

  /** Encode a corpus to long-format (doc_id, pos, piece, token_id)
    * rows under a model; pieces outside the vocab (unseen characters)
    * get `unkId`. Mirrors [[Bpe.encodePieces]].
    */
  def encode(df: DataFrame, model: UnigramModel, idCol: String,
      textCol: String, unkId: Int = -1): DataFrame = {
    val idMap = map(model.pieces.zipWithIndex.flatMap { case ((t, _), i) =>
      Seq(lit(t), lit(i + 1)) }.toIndexedSeq: _*)
    df.select(col(idCol).as("doc_id"),
        posexplode(pieces(col(textCol), model)).as(Seq("__p", "piece")))
      .select(col("doc_id"), (col("__p") + 1).cast("int").as("pos"),
        col("piece"),
        coalesce(element_at(idMap, col("piece")), lit(unkId))
          .cast("int").as("token_id"))
  }

  /** Train a unigram model; see the object doc for the distributed /
    * driver split and the divergences from the paper.
    *
    * @param vocabSize   target piece count (floor — all single chars
    *                    are always kept even if that exceeds it)
    * @param seedSize    initial inventory: top substrings of the word
    *                    histogram by occurrence (plus all chars)
    * @param emIters     total EM rounds; pruning runs after each
    *                    round while the inventory is above vocabSize,
    *                    so the LAST rounds are pure (monotone) EM on
    *                    the final vocabulary
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 120,
      seedSize: Int = 400, maxPieceLen: Int = 6, emIters: Int = 6,
      maxWords: Int = 65536): UnigramModel =
    trainWithLikelihoods(df, textCol, vocabSize, seedSize, maxPieceLen,
      emIters, maxWords)._1

  /** [[train]] plus the corpus log-likelihood measured at the START
    * of each EM round (UnigramSpec asserts the rounds on the final
    * fixed vocabulary are monotone non-decreasing — the EM guarantee;
    * rounds that end in a prune may drop) plus the trainer's OWN
    * top seed piece by (occurrence desc, token) — the gate query
    * compares it against the SQL substring-count argmax so a
    * regression in the seed enumeration itself is caught, not just
    * properties the decode tolerates.
    */
  private[graft] def trainWithLikelihoods(df: DataFrame, textCol: String,
      vocabSize: Int, seedSize: Int, maxPieceLen: Int, emIters: Int,
      maxWords: Int): (UnigramModel, Seq[Double], String) = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      "need seedSize >= vocabSize >= 1")
    require(maxPieceLen >= 1 && emIters >= 1 && maxWords >= 1,
      "maxPieceLen/emIters/maxWords must be >= 1")
    val hist = df
      .select(explode(Bpe.preTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(maxWords)
      // collect-bound: limit(maxWords) — truncation is the training
      // contract
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // fixed EM iteration order
    require(hist.nonEmpty, "cannot train a unigram model on an empty corpus")
    val words: Array[Array[Int]] = hist.map(_._1.codePoints().toArray)
    val wcount: Array[Long] = hist.map(_._2)

    // seed inventory: substring occurrence counts over the histogram
    // (model-sized enumeration — the corpus never re-scans), top
    // seedSize by (count desc, token), plus every single character
    val subCounts = mutable.HashMap.empty[String, Long]
    for (wi <- words.indices) {
      val cps = words(wi)
      val c = wcount(wi)
      var s = 0
      while (s < cps.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, cps.length - s)) {
          val t = new String(cps, s, l)
          subCounts.update(t, subCounts.getOrElse(t, 0L) + c)
          l += 1
        }
        s += 1
      }
    }
    val seedTop = subCounts.minBy { case (t, c) => (-c, t) }._1
    val chars: Set[String] =
      subCounts.keysIterator.filter(t => t.codePointCount(0, t.length) == 1).toSet
    def charOf(t: String): Boolean = chars.contains(t)
    val seed = subCounts.toArray.sortBy { case (t, c) => (-c, t) }
      .iterator.map(_._1).take(math.max(seedSize, chars.size)).toSet ++ chars
    // initial probs ∝ occurrence count over the seed
    var logp: Map[String, Double] = {
      val tot = seed.iterator.map(subCounts(_)).sum.toDouble
      seed.iterator.map(t => t -> math.log(subCounts(t) / tot)).toMap
    }

    def logsumexp(xs: Array[Double], n: Int): Double = {
      var mx = Double.NegativeInfinity
      var i = 0
      while (i < n) { if (xs(i) > mx) mx = xs(i); i += 1 }
      if (mx == Double.NegativeInfinity) return mx
      var s = 0.0
      i = 0
      while (i < n) { s += math.exp(xs(i) - mx); i += 1 }
      mx + math.log(s)
    }

    val likelihoods = mutable.ArrayBuffer.empty[Double]
    var iter = 0
    while (iter < emIters) {
      // E-step: expected piece counts by forward-backward over each
      // word's segmentation lattice (single chars are always present,
      // so every prefix/suffix is reachable — no unk path needed)
      val expected = mutable.HashMap.empty[String, Double]
      var ll = 0.0
      val buf = new Array[Double](maxPieceLen)
      for (wi <- words.indices) {
        val cps = words(wi)
        val n = cps.length
        val alpha = new Array[Double](n + 1)
        val beta = new Array[Double](n + 1)
        var i = 1
        while (i <= n) {
          var k = 0
          var l = 1
          while (l <= math.min(maxPieceLen, i)) {
            val t = new String(cps, i - l, l)
            logp.get(t).foreach { lp => buf(k) = alpha(i - l) + lp; k += 1 }
            l += 1
          }
          alpha(i) = logsumexp(buf, k)
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var k = 0
          var l = 1
          while (l <= math.min(maxPieceLen, n - i)) {
            val t = new String(cps, i, l)
            logp.get(t).foreach { lp => buf(k) = lp + beta(i + l); k += 1 }
            l += 1
          }
          beta(i) = logsumexp(buf, k)
          i -= 1
        }
        val z = alpha(n)
        ll += wcount(wi) * z
        var s = 0
        while (s < n) {
          var l = 1
          while (l <= math.min(maxPieceLen, n - s)) {
            val t = new String(cps, s, l)
            logp.get(t).foreach { lp =>
              val post = math.exp(alpha(s) + lp + beta(s + l) - z)
              if (post > 0.0)
                expected.update(t, expected.getOrElse(t, 0.0) +
                  post * wcount(wi))
            }
            l += 1
          }
          s += 1
        }
      }
      likelihoods += ll
      // M-step: renormalize over expected counts (chars floored so
      // coverage never dies even when a char only ever appears inside
      // larger pieces)
      val floored = logp.keysIterator.map { t =>
        val e = expected.getOrElse(t, 0.0)
        t -> (if (charOf(t)) math.max(e, 1e-9) else e)
      }.filter(_._2 > 0.0).toArray
      val tot = floored.sortBy(_._1).map(_._2).sum // fixed-order sum
      logp = floored.iterator.map { case (t, e) =>
        t -> (math.log(e) - math.log(tot)) }.toMap
      // prune by rank toward the target; chars are exempt
      val nonChar = logp.size - chars.size
      val targetNonChar = math.max(vocabSize - chars.size, 0)
      if (nonChar > targetNonChar) {
        val keepN = math.max(targetNonChar, (nonChar * 3) / 4)
        val kept = logp.iterator.filterNot(kv => charOf(kv._1)).toArray
          .sortBy { case (t, p) => (-p, t) }.take(keepN).map(_._1).toSet
        logp = logp.filter { case (t, _) => charOf(t) || kept.contains(t) }
      }
      iter += 1
    }
    val ordered = logp.toArray.sortBy { case (t, p) => (-p, t) }
    (UnigramModel(ordered.toSeq), likelihoods.toSeq, seedTop)
  }

  /** Persist the model table under `root`; [[loadModel]] reads it
    * back. Model-sized write.
    */
  def saveModel(spark: SparkSession, model: UnigramModel, root: String): Unit =
    graft.sources.AnalysisStore.writeFull(
      model.piecesDf(spark), s"$root/pieces")

  def loadModel(spark: SparkSession, root: String): UnigramModel =
    UnigramModel(graft.operators.ModelCollect.bounded(
        spark.read.parquet(s"$root/pieces").orderBy("id"),
        graft.operators.ModelCollect.MaxModelRows, "unigram model load")
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq)
}
