package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bitext, Similarity}

class BitextSpec extends SparkSpec {

  import spark.implicits._

  // planted bilingual geometry: (0,1) and (2,3) are translation
  // pairs (near-identical directions); 4 and 5 are noise vectors
  // orthogonal to everything (and to each other), so their cosines
  // against every cross-corpus candidate are 0
  private lazy val x = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (4L, Array(0f, 0f, 0.6f, 0.8f))).toDF("vec_id", "embedding")
  private lazy val y = Seq(
    (1L, Array(0.99f, 0.14f, 0f, 0f)),
    (3L, Array(0.1f, 0.99f, 0f, 0f)),
    (5L, Array(0f, 0f, 0.8f, -0.6f))).toDF("vec_id", "embedding")

  test("mineBrute finds exactly the planted mutual pairs, margins in the expected band") {
    val mined = Bitext.mineBrute(x, y, "vec_id", "embedding",
        k = 2, minMargin = 1.0)
      .select("src_id", "tgt_id", "margin")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(mined.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (2L, 3L)))
    // hand-computed: cos ≈ 0.99, neighborhood avgs ≈ 0.55 both sides
    // → margin ≈ 1.78
    mined.foreach(p => assert(p._3 > 1.7 && p._3 < 1.9,
      s"margin ${p._3} outside the planted band"))
  }

  test("mutual-best intersection excludes one-sided candidates even at threshold 0") {
    // 4 and 5 both HAVE best candidates (ties at cos 0), but no
    // mutual pair: 4's best is 1 (whose best is 0), 5's best is 0
    // (whose best is 1) — the intersection strategy must drop both
    val mined = Bitext.mineBrute(x, y, "vec_id", "embedding",
        k = 2, minMargin = 0.0)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(mined == Set((0L, 1L), (2L, 3L)))
  }

  test("threshold filters low-margin pairs") {
    val mined = Bitext.mineBrute(x, y, "vec_id", "embedding",
        k = 2, minMargin = 5.0)
    assert(mined.count() == 0)
  }

  test("ivfCrossTopK with a single cell equals bruteForceTopK") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val (qs, corpus) = (e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1))
    val brute = Similarity.bruteForceTopK(corpus, qs,
      "vec_id", "embedding", k = 3)
    val ivf = Similarity.ivfCrossTopK(corpus, qs,
      "vec_id", "embedding", k = 3, nCentroids = 1, nProbe = 1)
    assert(ivf.exceptAll(brute).count() == 0 &&
      brute.exceptAll(ivf).count() == 0)
  }

  test("mineIvf agrees with mineBrute on the full-probe configuration") {
    // nCentroids forced to 1 via tiny corpora: autoCells(3) = 1 cell
    // → full probe → identical kNN frames → identical mined pairs
    val bi = Bitext.mineIvf(x, y, "vec_id", "embedding",
        k = 2, minMargin = 1.0)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(bi == Set((0L, 1L), (2L, 3L)))
  }
  test("mineFromIndexes over persisted indexes equals mineIvf") {
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val (x, y) = (e.filter(col("vec_id") % 2 === 0).limit(120),
      e.filter(col("vec_id") % 2 === 1).limit(120))
    val cx = Similarity.trainCentroids(x, "vec_id", "embedding", 2, 3)
    val cy = Similarity.trainCentroids(y, "vec_id", "embedding", 2, 3)
    val served = Bitext.mineFromIndexes(
      Similarity.ivfAssign(x, "vec_id", "embedding", cx), cx,
      Similarity.ivfAssign(y, "vec_id", "embedding", cy), cy,
      x, y, "vec_id", "embedding", k = 3, minMargin = 0.0)
    // mineIvf with matching geometry (nProbe covers both cells)
    val fwd = Similarity.ivfCrossTopKFromIndex(
      Similarity.ivfAssign(y, "vec_id", "embedding", cy), cy,
      x, "vec_id", "embedding", 3)
    val bwd = Similarity.ivfCrossTopKFromIndex(
      Similarity.ivfAssign(x, "vec_id", "embedding", cx), cx,
      y, "vec_id", "embedding", 3)
    val direct = Bitext.minePairs(fwd, bwd, 0.0)
    assert(served.exceptAll(direct).count() == 0 &&
      direct.exceptAll(served).count() == 0)
    assert(served.count() > 0)
  }

}
