package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation of a text against a
  * fixed piece vocabulary — the encode half of the engine's subword
  * tokenizer ([[graft.operators.Bpe]]). Pre-tokenizes into words
  * (letter runs / digit runs / single other chars, the pre-tokenizer
  * shape BPE vocabularies assume, same pattern as
  * `TextAnalysis.regexTokenCount`), then segments each word by
  * repeatedly taking the LONGEST vocabulary piece that prefixes the
  * remaining suffix; a position no piece matches emits its single
  * character (an unknown — only possible for characters the
  * vocabulary never saw). Pieces never span word boundaries, and each
  * word's pieces concatenate back to the word exactly — the
  * round-trip property BpeSpec pins.
  *
  * One monolithic expression rather than a transform/aggregate
  * composition for the same reason as [[WordShingles]]: higher-order
  * functions are interpreted and their dispatch goes megamorphic
  * under JIT pressure; this is one virtual call per row with a
  * hash-set probe per candidate length (O(len × maxPieceLen) probes
  * per word). Semantics mirror the DuckDB oracle's recursive-CTE walk
  * in ExtQueries exactly (longest-first coalesce over piece lengths).
  */
case class GreedyPieces(child: Expression, vocab: Seq[String], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_subword_pieces"

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(GreedyPieces.PreTokenRe)
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[Any]()
    val m = pattern.matcher(text)
    while (m.find()) {
      // walk CODE POINTS, not UTF-16 units: candidate lengths must
      // mean characters (matching the trainer's symbols and DuckDB's
      // substr) and the unseen-char fallback must never split a
      // surrogate pair into two invalid lone-surrogate pieces
      val cps = m.group().codePoints().toArray
      var p = 0
      while (p < cps.length) {
        var piece: String = null
        var l = math.min(maxPieceLen, cps.length - p)
        while (piece == null && l >= 1) {
          val cand = new String(cps, p, l)
          if (set.contains(cand)) piece = cand
          l -= 1
        }
        var advance = 1
        if (piece == null) piece = new String(cps, p, 1) // unseen char
        else advance = piece.codePointCount(0, piece.length)
        out.add(UTF8String.fromString(piece))
        p += advance
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyPieces =
    copy(child = newChild)
}

object GreedyPieces {
  /** Pre-tokenizer: letter runs, digit runs, single other non-space
    * chars. Kept to the POSIX-safe subset Java regex and RE2 (DuckDB)
    * treat identically; shared by the trainer, the matcher, and every
    * oracle.
    */
  val PreTokenRe: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def column(text: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    GraftSqlBridge.column(
      GreedyPieces(GraftSqlBridge.expression(text), vocab, maxPieceLen))
}

/** Viterbi (max-likelihood) subword segmentation against a unigram
  * piece model ([[graft.operators.Unigram]]) — the SentencePiece-style
  * decode: per pre-token word, dynamic programming over all
  * segmentations picks the one maximizing the summed piece
  * log-probabilities. Greedy longest-match ([[GreedyPieces]]) can be
  * forced into low-probability pieces by a long dictionary entry; the
  * DP never is.
  *
  * Determinism: candidate lengths iterate longest-first with a strict
  * improvement test, so score ties break to the longer piece at each
  * boundary, and double arithmetic runs in one fixed order per word.
  * A character the model never saw scores `unkLogProb` (strictly below
  * every real piece), so every word still segments — the round-trip
  * property holds on any input.
  *
  * Same monolithic-expression rationale as [[GreedyPieces]]: one
  * virtual call per row, O(len × maxPieceLen) map probes per word,
  * no interpreted higher-order dispatch in the hot path.
  */
case class ViterbiPieces(child: Expression, pieces: Seq[(String, Double)],
    maxPieceLen: Int, unkLogProb: Double)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  require(pieces.nonEmpty, "ViterbiPieces needs a non-empty model")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi_pieces"

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(GreedyPieces.PreTokenRe)
  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (t, p) => m.put(t, p) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[Any]()
    val m = pattern.matcher(text)
    while (m.find()) {
      // code points, not UTF-16 units (same contract as GreedyPieces)
      val cps = m.group().codePoints().toArray
      val n = cps.length
      val dp = new Array[Double](n + 1)
      val bk = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var best = Double.NegativeInfinity
        var bestL = 1
        var l = math.min(maxPieceLen, i)
        while (l >= 1) {
          val cand = new String(cps, i - l, l)
          val lp = logp.get(cand)
          val score =
            if (lp != null) dp(i - l) + lp.doubleValue()
            else if (l == 1) dp(i - 1) + unkLogProb
            else Double.NegativeInfinity
          if (score > best) { best = score; bestL = l }
          l -= 1
        }
        dp(i) = best
        bk(i) = bestL
        i += 1
      }
      // backtrack, then emit in order
      val lens = new java.util.ArrayList[Integer]()
      var p = n
      while (p > 0) { lens.add(bk(p)); p -= bk(p) }
      var start = 0
      var j = lens.size() - 1
      while (j >= 0) {
        val l = lens.get(j)
        out.add(UTF8String.fromString(new String(cps, start, l)))
        start += l
        j -= 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiPieces =
    copy(child = newChild)
}

object ViterbiPieces {
  def column(text: Column, pieces: Seq[(String, Double)], maxPieceLen: Int,
      unkLogProb: Double): Column =
    GraftSqlBridge.column(ViterbiPieces(
      GraftSqlBridge.expression(text), pieces, maxPieceLen, unkLogProb))
}
