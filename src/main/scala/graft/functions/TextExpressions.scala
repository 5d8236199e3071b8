package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a whitespace-tokenized text, as ONE
  * monolithic expression.
  *
  * Why not compose `transform`/`slice`/`array_join`/`filter`: those
  * higher-order functions are interpreted (no doGenCode), and their
  * shared `eval` dispatch sites go megamorphic once OTHER big plans
  * run in the same JVM — measured 12× slowdown of the composed
  * shingle pipeline right after the 128-expression minhash signature
  * job. A single expression whose eval does plain Java loops is one
  * virtual call per row regardless of JIT profile state, and ~10×
  * less allocation (no per-lambda frames, no intermediate arrays).
  *
  * Semantics (must mirror the DuckDB oracle in ExtQueries):
  * split on single spaces, drop empty tokens, emit every
  * k-consecutive-token join with ' ', distinct, first-occurrence
  * order. Docs with fewer than k tokens yield an empty array.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    // count non-empties without allocating a filtered copy
    var nTok = 0
    var i = 0
    while (i < toks.length) { if (!toks(i).isEmpty) nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) { words(j) = toks(i); j += 1 }
      i += 1
    }
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= nTok - k) {
      sb.setLength(0)
      var d = 0
      while (d < k) {
        if (d > 0) sb.append(' ')
        sb.append(words(i + d))
        d += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s =>
      UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def column(text: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), k))
}

/** Whitespace-token statistics in ONE pass: token count, summed token
  * length, and an occurrence score per supplied lexicon — the numbers
  * [[graft.operators.TextAnalysis]]'s quality gate and language ID
  * both need. The composed form (`size(filter(split(...)))` once per
  * statistic, `filter(toks, array_contains(lex, t))` once per
  * language) re-tokenizes per statistic through interpreted
  * higher-order functions; this walks the text's tokens once with
  * hash-set lexicon probes — same JIT-robustness rationale as
  * [[WordShingles]].
  *
  * Output struct: (n_words int, sum_word_len int, scores array<int>)
  * with scores(i) = occurrences (duplicates counted) of lexicons(i)
  * words — mirroring `size(filter(toks, array_contains(...)))`.
  */
case class TokenStats(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_len", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("scores", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_token_stats"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lexicons.map { lex =>
      val s = new java.util.HashSet[String]()
      lex.foreach(s.add)
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    var nWords = 0
    var sumLen = 0
    var nPunct = 0
    val scores = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        nWords += 1
        val cp = t.codePointCount(0, t.length) // = Spark length() semantics
        sumLen += cp
        // code points outside [a-z0-9] — spaces are split away, so
        // summing per token equals the whole-string count; [a-z0-9]
        // are single code units, so cp − keep counts a multi-unit
        // code point once (regexp semantics, per code point)
        var keep = 0
        var c = 0
        while (c < t.length) {
          val ch = t.charAt(c)
          if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) keep += 1
          c += 1
        }
        nPunct += cp - keep
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(t)) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    InternalRow(nWords, sumLen, nPunct,
      new GenericArrayData(scores.map(x => x: Any)))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  def column(text: Column, lexicons: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(TokenStats(GraftSqlBridge.expression(text), lexicons))
}

/** Winnowing document fingerprints (rolling-hash family, per the
  * MOSS scheme: Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every
  * character k-gram, slide a window of w hashes, keep each window's
  * minimum — guaranteeing any shared substring of length ≥ k+w-1
  * yields a shared fingerprint, while storing ~2/(w+1) of the hashes.
  *
  * The k-gram hash is the top-60-bit prefix of md5 (not a true
  * Rabin-Karp rolling product) so the DuckDB oracle reproduces it
  * exactly; the selection structure (slide + window-min + distinct)
  * is the winnowing algorithm proper. One monolithic eval per doc —
  * same JIT-robustness rationale as [[WordShingles]].
  *
  * Returns the distinct fingerprints sorted ascending
  * (array<bigint>); docs shorter than k+w-1 chars yield an empty
  * array.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "k-gram size and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val nGrams = text.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nGrams)
    val out16 = new Array[Byte](16)
    // per-gram digests run over ONE shared UTF-8 buffer with a
    // char→byte offset index (md.update(buf, off, len) + a reused
    // output buffer) — the substring(i,i+k).getBytes form allocated a
    // String + two byte[] PER CHARACTER of every document, and was
    // this pass's dominant cost at sf1. Falls back to per-gram
    // substrings for text with surrogate pairs, where a char-indexed
    // byte window can't reproduce String.substring's lone-surrogate
    // replacement byte-for-byte.
    val bytes = text.getBytes("UTF-8")
    val ascii7 = bytes.length == text.length
    val offs: Array[Int] =
      if (ascii7) null
      else if (!hasSurrogates(text)) {
        val o = new Array[Int](text.length + 1)
        var bi = 0
        var ci = 0
        while (ci < text.length) {
          o(ci) = bi
          val c = text.charAt(ci)
          bi += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
          ci += 1
        }
        o(text.length) = bi
        o
      } else null
    var i = 0
    while (i < nGrams) {
      if (ascii7) md.update(bytes, i, k)
      else if (offs != null) md.update(bytes, offs(i), offs(i + k) - offs(i))
      else md.update(text.substring(i, i + k).getBytes("UTF-8"))
      md.digest(out16, 0, 16)
      // top 15 hex chars = 60 bits, matching TextAnalysis.tokenHash60
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (out16(b) & 0xffL); b += 1 }
      hashes(i) = h >>> 4 // 64 - 60
      i += 1
    }
    // window minima → sort + unique on primitives (the TreeSet form
    // boxed every fingerprint); output stays ascending-distinct
    val minima = new Array[Long](nWins)
    i = 0
    while (i < nWins) {
      var m = hashes(i)
      var j = i + 1
      while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
      minima(i) = m
      i += 1
    }
    java.util.Arrays.sort(minima)
    var n = 0
    i = 0
    while (i < nWins) {
      if (i == 0 || minima(i) != minima(i - 1)) { minima(n) = minima(i); n += 1 }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = minima(i); i += 1 }
    new GenericArrayData(out)
  }

  private def hasSurrogates(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def column(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprint(GraftSqlBridge.expression(text), k, w))
}

/** Monolithic DSIR log-weight fold: per document, Σ over grams
  * (unigrams in order, then adjacent bigrams in order — the
  * `concat(toks, bigrams)` walk) of logRatio[bucket(gram)], where
  * bucket = first 32 md5 bits mod `buckets` (the
  * [[graft.operators.Dsir.bucketOf]] construction, byte-for-byte).
  *
  * Exists because the Column formulation
  * (`aggregate(transform(grams, …md5 expr tree…))`) is a higher-order
  * function — interpreted, one lambda frame + expression-tree walk
  * per gram — which made the "zero-exchange" scoring pass the hot
  * part of dsir_scores/dsir_select. Same accumulation order and the
  * same md5→bucket arithmetic, so scores are bit-identical and the
  * SQL oracle still matches. CodegenFallback like the other
  * monolithic text expressions (one virtual call per ROW, not per
  * gram).
  */
case class DsirScore(child: Expression, logRatio: Array[Double], buckets: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsir_score"

  override protected def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def slot(gram: String): Int = {
      val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 255L) << 24) | ((d(1) & 255L) << 16) |
        ((d(2) & 255L) << 8) | (d(3) & 255L)
      (v % buckets).toInt
    }
    val raw = input.asInstanceOf[UTF8String].toString.split(' ')
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) toks.add(raw(i)); i += 1
    }
    var acc = 0.0
    i = 0
    while (i < toks.size) { acc += logRatio(slot(toks.get(i))); i += 1 }
    i = 0
    while (i < toks.size - 1) {
      acc += logRatio(slot(toks.get(i) + " " + toks.get(i + 1))); i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  def column(text: Column, logRatio: Array[Double], buckets: Int): Column =
    GraftSqlBridge.column(DsirScore(GraftSqlBridge.expression(text),
      logRatio, buckets))
}

/** Monolithic k-token slide-window hasher for substring dedup: per
  * document, one struct (pos, hv, hv2) per window of k consecutive
  * whitespace tokens (stride 1), where hv/hv2 are the two md5-half
  * 60-bit longs of the window text —
  * `conv(substring(md5(w), 1, 15), 16, 10)` and hex chars 17–31,
  * exactly [[graft.operators.TextAnalysis.tokenHash60]]/[[…60b]].
  *
  * Replaces the chunk(stride=1) formulation, whose window strings
  * were built by an INTERPRETED transform() lambda (slice +
  * array_join per position — one lambda frame per token of the
  * corpus) before two Column-level md5 walks re-read each string.
  * Here the token array is walked once and each window's bytes are
  * hashed once; emitted values are bit-identical, so the
  * dedup_substring oracle and the persisted window index are
  * unchanged. CodegenFallback like the other monolithic text
  * expressions.
  */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hv", LongType, nullable = false),
    StructField("hv2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString.split(' ')
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) toks.add(raw(i)); i += 1 }
    val n = toks.size
    val nw = math.max(0, n - k + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex60(d: Array[Byte], fromNibble: Int): Long = {
      var acc = 0L
      var j = fromNibble
      while (j < fromNibble + 15) {
        val b = d(j >> 1)
        val nib = if ((j & 1) == 0) (b >> 4) & 0xF else b & 0xF
        acc = (acc << 4) | nib
        j += 1
      }
      acc
    }
    val out = new Array[Any](nw)
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p < nw) {
      sb.setLength(0)
      var j = p
      while (j < p + k) {
        if (j > p) sb.append(' ')
        sb.append(toks.get(j))
        j += 1
      }
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(p) = InternalRow(p, hex60(d, 0), hex60(d, 16))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  def column(text: Column, k: Int): Column =
    GraftSqlBridge.column(WindowHashes(GraftSqlBridge.expression(text), k))
}
