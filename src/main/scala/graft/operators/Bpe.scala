package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GreedyPieces

/** Subword tokenization for the training-data tier: every
  * token-denominated operator (sequence packing budgets, chunk
  * windows, encode-to-ids, token accounting) can now count SUBWORD
  * pieces instead of whitespace words — word counts misestimate
  * context-window budgets by 20-40% on real text, which is exactly
  * the error a pre-training packing pipeline cannot absorb.
  *
  * Two vocabulary constructions share one greedy longest-match
  * encoder ([[graft.functions.GreedyPieces]]):
  *
  *  - [[subwordVocab]]: frequency-selected pieces (top-K substrings
  *    of pre-tokenized words by corpus occurrence). Fully
  *    SQL-expressible, so the encode/pack queries built on it are
  *    hash-verified end-to-end against the DuckDB oracle.
  *  - [[train]]: classic BPE merge learning. The corpus-scale part is
  *    ONE word-count aggregation (a single uniform shuffle with
  *    map-side combine — the same shape as `TextAnalysis
  *    .trainBigramModel`); the merge loop then runs over the
  *    model-sized distinct-word frequency table on the driver,
  *    exactly how reference BPE trainers operate (the pair-count ×
  *    merge iteration never needs row data, only the word histogram).
  *    At 100 TB the histogram is capped to the `maxWords` most
  *    frequent words (deterministic tie-break) — natural-language
  *    mass concentrates in the head, and rare tail words are exactly
  *    the ones subword pieces exist to cover. The alternative —
  *    re-counting pairs on the cluster per merge — is numMerges full
  *    corpus passes, catastrophically worse than one.
  *
  * Encode semantics for BOTH vocabularies are greedy longest-match
  * (WordPiece-style) rather than merge-order replay: deterministic,
  * single-pass, oracle-replicable, and identical on any corpus whose
  * characters the vocabulary saw (BpeSpec pins the round-trip). The
  * merges table is still persisted — it IS the model artifact a
  * serving layer ships.
  */
object Bpe {

  val PreTokenRe: String = GreedyPieces.PreTokenRe

  /** Pre-tokenized words of a text (letter runs / digit runs / single
    * other chars) — narrow, codegen'd.
    */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenRe), lit(0))

  /** (word, c) corpus word histogram — the single corpus-scale pass
    * both vocabulary constructions start from.
    */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(preTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Frequency-selected subword vocabulary: the `topK` substrings
    * (length 1..`maxPieceLen`) of pre-tokenized words by summed
    * corpus occurrence, ties by token text; `id` = dense rank. The
    * substring enumeration runs over the DISTINCT-WORD histogram
    * (model-sized), never the corpus — the corpus pays only the word
    * count's one shuffle.
    *
    * Output: (token, n_occ, id) — mirrored token-for-token by the
    * DuckDB oracle, which makes every downstream query on this vocab
    * hash-verifiable.
    */
  def subwordVocab(df: DataFrame, textCol: String,
      topK: Int = 200, maxPieceLen: Int = 6): DataFrame = {
    require(topK > 0 && maxPieceLen >= 1, "topK and maxPieceLen must be >= 1")
    val wc = wordCounts(df, textCol)
    val subs = wc
      .select(col("c"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), s =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
            l => col("word").substr(s, l))))).as("token"))
      .groupBy("token").agg(sum(col("c")).as("n_occ"))
    // the top slice is MODEL-sized (topK rows): rank on the collected
    // rows (the model-collect discipline, same as TextAnalysis.vocab)
    // instead of a global row_number window — which would emit
    // WindowExec's single-partition warning, indistinguishable in logs
    // from a genuine corpus-sized sort
    val spark = df.sparkSession
    import spark.implicits._
    // collect-bound: limit(topK) — structurally ≤ topK rows
    subs.orderBy(col("n_occ").desc, col("token")).limit(topK)
      .collect()
      .zipWithIndex.map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }
      .toSeq.toDF("token", "n_occ", "id")
  }

  /** Greedy longest-match pieces of `text` against a literal
    * vocabulary — the narrow encode column (zero exchanges; the vocab
    * rides into the expression as a model-sized literal set, same
    * bounded-artifact rule as `TextAnalysis.encode`'s map).
    */
  def pieces(text: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    GreedyPieces.column(text, vocab, maxPieceLen)

  /** Subword piece count of `text` — the drop-in `tokenCount` for
    * [[Packing.packSequences]] / [[TextAnalysis.chunk]].
    */
  def pieceCount(text: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    size(pieces(text, vocab, maxPieceLen))

  /** Encode a corpus to long-format (doc_id, pos, piece, token_id)
    * rows against a vocab frame (token, id) — [[subwordVocab]]'s
    * output or a persisted model table. Pieces outside the vocab
    * (unseen characters) get `unkId`. The vocab collects to a literal
    * map ONLY because a vocabulary is model-sized by definition; the
    * encode itself is a narrow codegen'd pass.
    */
  def encodePieces(df: DataFrame, vocabDf: DataFrame, idCol: String,
      textCol: String, unkId: Int = -1): DataFrame = {
    val entries = ModelCollect.bounded(
        vocabDf.select(col("token"), col("id").cast("int")),
        ModelCollect.MaxModelRows, "encodePieces vocabulary")
      .map(r => r.getString(0) -> r.getInt(1))
    require(entries.nonEmpty, "encodePieces needs a non-empty vocabulary")
    val maxLen = entries.map(_._1.length).max
    val idMap = map(entries.flatMap { case (t, i) =>
      Seq(lit(t), lit(i)) }.toIndexedSeq: _*)
    df.select(col(idCol).as("doc_id"),
        posexplode(pieces(col(textCol), entries.map(_._1).toSeq, maxLen))
          .as(Seq("__p", "piece")))
      .select(col("doc_id"), (col("__p") + 1).cast("int").as("pos"),
        col("piece"),
        coalesce(element_at(idMap, col("piece")), lit(unkId))
          .cast("int").as("token_id"))
  }

  /** Tokenizer fitness over a corpus: fertility (pieces per word) and
    * the share of words encoded as a single piece — the serving-side
    * staleness signal for a FROZEN vocabulary (the subword analogue
    * of the ANN index drift gate): as the corpus drifts away from the
    * training distribution, fertility rises and single-piece coverage
    * falls, telling the pipeline it is time to retrain between
    * epochs. One narrow pass + a scalar aggregate; fully
    * deterministic (integer totals, 4dp ratios) so the driver
    * hash-verifies it.
    */
  def fertility(df: DataFrame, textCol: String,
      vocab: Seq[String], maxPieceLen: Int): DataFrame =
    df.select(explode(preTokens(col(textCol))).as("word"))
      .select(size(pieces(col("word"), vocab, maxPieceLen)).as("__np"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("__np").cast("long")).as("n_pieces"),
        round(sum(col("__np").cast("long")).cast("double") / count(lit(1)), 4)
          .as("fertility"),
        round(sum(when(col("__np") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("single_piece_ratio"))

  /** One learned merge: at `rank`, adjacent symbol pair (left, right)
    * fused into `token` (= left + right).
    */
  final case class Merge(rank: Int, left: String, right: String) {
    def token: String = left + right
  }

  /** A trained BPE tokenizer: merges in learned order plus the final
    * piece vocabulary (initial characters first, sorted, then merge
    * products in rank order, first occurrence kept). `vocab`'s order
    * is the id assignment (1-based).
    */
  final case class BpeModel(merges: Seq[Merge], vocab: Seq[String]) {
    def maxPieceLen: Int = vocab.iterator.map(_.length).max

    /** (token, id) — persist/serve shape, feeds [[encodePieces]]. */
    def vocabDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      vocab.zipWithIndex.map { case (t, i) => (t, i + 1) }.toDF("token", "id")
    }

    /** (rank, left, right, token) — the model artifact proper. */
    def mergesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.map(m => (m.rank, m.left, m.right, m.token))
        .toDF("rank", "left", "right", "token")
    }
  }

  /** Train BPE merge rules. Distributed part: the word histogram (one
    * shuffle, capped to the `maxWords` head by (count desc, word) —
    * deterministic). Driver part: the classic merge loop over the
    * histogram — each round counts adjacent symbol pairs weighted by
    * word frequency, fuses the most frequent pair (ties: count desc,
    * then (left, right) lexicographic — mirrored by the gate query's
    * SQL argmax), and rewrites the histogram's symbol sequences
    * left-to-right non-overlapping. Stops early when no pair repeats.
    */
  def train(df: DataFrame, textCol: String,
      numMerges: Int = 200, maxWords: Int = 65536): BpeModel = {
    require(numMerges >= 1 && maxWords >= 1, "numMerges/maxWords must be >= 1")
    // collect-bound: limit(maxWords) — truncation is the training
    // contract (fit on the maxWords most frequent words)
    val hist = wordCounts(df, textCol)
      .orderBy(col("c").desc, col("word")).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // symbol sequences start as unicode code points
    val words: Array[Array[String]] = hist.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val counts: Array[Long] = hist.map(_._2)

    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var j = 0
        while (j < w.length - 1) {
          val k = (w(j), w(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + counts(i))
          j += 1
        }
        i += 1
      }
      // a pair seen once compresses nothing and would only pad the vocab
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val ((l, r), _) = candidates.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(rank, l, r)
        i = 0
        while (i < words.length) {
          words(i) = applyMerge(words(i), l, r)
          i += 1
        }
        rank += 1
      }
    }
    val chars = hist.iterator.map(_._1).flatMap(w =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
      .toSeq.distinct.sorted
    val seen = mutable.LinkedHashSet.empty[String]
    chars.foreach(seen.add)
    merges.foreach(m => seen.add(m.token))
    BpeModel(merges.toSeq, seen.toSeq)
  }

  /** Left-to-right non-overlapping fuse of (l, r) in a symbol array. */
  private def applyMerge(w: Array[String], l: String, r: String): Array[String] = {
    if (w.length < 2) return w
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < w.length) {
      if (j < w.length - 1 && w(j) == l && w(j + 1) == r) {
        out += l + r
        j += 2
      } else {
        out += w(j)
        j += 1
      }
    }
    out.toArray
  }

  /** Encode against a trained model (greedy longest-match over the
    * model's vocab — see the object doc for why not merge replay).
    */
  def encodeWithModel(model: BpeModel, df: DataFrame, idCol: String,
      textCol: String, unkId: Int = -1): DataFrame =
    encodePieces(df, model.vocabDf(df.sparkSession), idCol, textCol, unkId)

  /** Persist a model's two tables under `root`; [[loadModel]] reads
    * them back. Model-sized writes (vocab + merges).
    */
  def saveModel(spark: SparkSession, model: BpeModel, root: String): Unit = {
    graft.sources.AnalysisStore.writeFull(model.vocabDf(spark), s"$root/vocab")
    graft.sources.AnalysisStore.writeFull(model.mergesDf(spark), s"$root/merges")
  }

  def loadModel(spark: SparkSession, root: String): BpeModel = {
    val merges = ModelCollect.bounded(
        spark.read.parquet(s"$root/merges").orderBy("rank"),
        ModelCollect.MaxModelRows, "loadModel merges")
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
    val vocab = ModelCollect.bounded(
        spark.read.parquet(s"$root/vocab").orderBy("id"),
        ModelCollect.MaxModelRows, "loadModel vocab")
      .map(_.getString(0))
    BpeModel(merges.toSeq, vocab.toSeq)
  }
}
