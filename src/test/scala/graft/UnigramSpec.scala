package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Unigram}
import graft.sources.Tables

/** Unigram-LM tokenizer: EM monotonicity on the final vocabulary,
  * Viterbi optimality vs greedy, round-trip, determinism, and model
  * persistence.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("train is deterministic and rounds on the final vocab are monotone EM") {
    val (m1, ll1, seedTop) = Unigram.trainWithLikelihoods(docs, "text",
      vocabSize = 80, seedSize = 120, maxPieceLen = 6, emIters = 8,
      maxWords = 65536)
    val (m2, _, _) = Unigram.trainWithLikelihoods(docs, "text",
      vocabSize = 80, seedSize = 120, maxPieceLen = 6, emIters = 8,
      maxWords = 65536)
    // the trainer's seed argmax must agree with the independently
    // SQL-gated substring-frequency vocabulary's head
    assert(seedTop == graft.operators.Bpe
      .subwordVocab(docs, "text", topK = 1, maxPieceLen = 6)
      .head().getString(0))
    assert(m1.pieces == m2.pieces, "train twice must be identical")
    // seed 120 shrinks 3/4 per round to the 80-cap in a couple of
    // rounds; the remaining rounds are pure EM on a fixed vocabulary
    // and each must not decrease the corpus likelihood
    val tail = ll1.takeRight(3)
    tail.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"EM round decreased likelihood: $ll1")
    }
    // probs normalize: sum of exp(logp) ≈ 1
    val mass = m1.pieces.iterator.map { case (_, p) => math.exp(p) }.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"piece mass $mass")
  }

  test("every doc round-trips through Viterbi with no unknowns") {
    val model = Unigram.train(docs, "text", vocabSize = 80, seedSize = 160)
    val vocabArr = array(model.pieces.map(p => lit(p._1)): _*)
    val p = Unigram.pieces(col("text"), model)
    val w = Bpe.preTokens(col("text"))
    val row = docs.select(
        (array_join(p, "") === array_join(w, "")).as("rt"),
        (size(filter(p, x => not(array_contains(vocabArr, x)))) === 0).as("kn"))
      .agg(expr("bool_and(rt)").as("rt"), expr("bool_and(kn)").as("kn")).head()
    assert(row.getBoolean(0), "round-trip failed")
    assert(row.getBoolean(1), "training corpus hit unk")
  }

  test("Viterbi beats greedy: a long low-probability piece is skipped") {
    // model: 'ab' exists but p(ab)=0.05 < p(a)·p(b)=0.2025
    val model = Unigram.UnigramModel(Seq(
      "a" -> math.log(0.45), "b" -> math.log(0.45), "ab" -> math.log(0.05)))
    val vit = Seq("ab").toDF("text")
      .select(Unigram.pieces(col("text"), model)).as[Seq[String]].head()
    assert(vit == Seq("a", "b"), s"viterbi picked $vit")
    // greedy longest-match on the same vocab takes the long piece
    val greedy = Seq("ab").toDF("text")
      .select(Bpe.pieces(col("text"), model.pieces.map(_._1), 2))
      .as[Seq[String]].head()
    assert(greedy == Seq("ab"))
    // and when the long piece IS likelier, Viterbi takes it
    val model2 = Unigram.UnigramModel(Seq(
      "ab" -> math.log(0.8), "a" -> math.log(0.1), "b" -> math.log(0.1)))
    val vit2 = Seq("ab").toDF("text")
      .select(Unigram.pieces(col("text"), model2)).as[Seq[String]].head()
    assert(vit2 == Seq("ab"))
  }

  test("unseen characters fall back to single-char unk pieces") {
    val model = Unigram.UnigramModel(Seq("a" -> math.log(0.9)))
    val out = Seq("aXa").toDF("text")
      .select(Unigram.pieces(col("text"), model)).as[Seq[String]].head()
    assert(out == Seq("a", "X", "a"))
  }

  test("ties at equal score break to the longer piece") {
    // p(ab) == p(a)*p(b): exp arithmetic is exact for these powers of 2
    val model = Unigram.UnigramModel(Seq(
      "ab" -> math.log(0.25), "a" -> math.log(0.5), "b" -> math.log(0.5)))
    val out = Seq("ab").toDF("text")
      .select(Unigram.pieces(col("text"), model)).as[Seq[String]].head()
    assert(out == Seq("ab"), s"tie must break long, got $out")
  }

  test("save/load round-trips the model and the encode") {
    val model = Unigram.train(docs.limit(50), "text", vocabSize = 60,
      seedSize = 90)
    val root = Files.createTempDirectory("unigram").toString
    Unigram.saveModel(spark, model, root)
    val back = Unigram.loadModel(spark, root)
    assert(back.pieces == model.pieces)
    val a = Unigram.encode(docs.limit(20), model, "doc_id", "text")
      .collect().toSet
    val b = Unigram.encode(docs.limit(20), back, "doc_id", "text")
      .collect().toSet
    assert(a == b)
  }

  test("pieceCount plugs into the packing budget") {
    val model = Unigram.train(docs.limit(50), "text", vocabSize = 60,
      seedSize = 90)
    val n = docs.limit(20)
      .select(Unigram.pieceCount(col("text"), model).as("n"),
        size(Unigram.pieces(col("text"), model)).as("m"))
    assert(n.filter(col("n") =!= col("m")).count() == 0)
    assert(n.agg(min("n")).head().getInt(0) > 0)
  }
}
