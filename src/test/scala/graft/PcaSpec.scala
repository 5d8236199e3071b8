package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Pca, Similarity}
import graft.sources.Tables

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = Tables.load(spark, sfDir, "embeddings")

  test("jacobiEigen: recovers a known diagonal-in-disguise spectrum") {
    // A = R·diag(9,4,1)·Rᵀ for a hand-built rotation R (Givens 30° in
    // the xy-plane): eigenvalues must come back {9,4,1} and the
    // eigenvectors must diagonalize A.
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val diag = Array(9.0, 4.0, 1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(t => r(i)(t) * diag(t) * r(j)(t)).sum
    }
    val (vals, vecs) = Pca.jacobiEigen(a)
    assert(vals.sorted.reverse.zip(Seq(9.0, 4.0, 1.0)).forall {
      case (got, want) => math.abs(got - want) < 1e-10
    })
    // VᵀAV diagonal == eigenvalues
    for (cix <- 0 until 3) {
      val v = Array.tabulate(3)(rix => vecs(rix)(cix))
      val av = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * v(j)).sum)
      val lambda = (0 until 3).map(i => v(i) * av(i)).sum
      av.zip(v).foreach { case (x, y) =>
        assert(math.abs(x - lambda * y) < 1e-9, "A·v != λ·v")
      }
    }
  }

  test("fit on axis-aligned data finds the high-variance axis first") {
    // x-coordinate spread ±10, y ±1, z 0 — axes must come out
    // x-first, y-second, and (sign convention) pointing positive.
    val rows = Seq(
      Seq(10.0, 1.0, 0.0), Seq(-10.0, -1.0, 0.0),
      Seq(8.0, -1.0, 0.0), Seq(-8.0, 1.0, 0.0),
      Seq(6.0, 1.0, 0.0), Seq(-6.0, -1.0, 0.0))
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", k = 2)
    assert(math.abs(m.axes(0)(0)) > 0.999 && m.axes(0)(0) > 0,
      s"first axis should be +x, got ${m.axes(0).toSeq}")
    assert(math.abs(m.axes(1)(1)) > 0.999 && m.axes(1)(1) > 0,
      s"second axis should be +y, got ${m.axes(1).toSeq}")
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // explained: z carries zero variance, so 2 of 3 axes capture all
    assert(m.explainedRatio > 1 - 1e-9)
  }

  test("projection matches the driver-side arithmetic row by row") {
    val m = Pca.fit(embeddings, "embedding", k = 4)
    val got = Pca.project(embeddings, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = embeddings.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    raw.foreach { case (id, x) =>
      val want = m.axes.map { ax =>
        var s = 0.0
        var i = 0
        while (i < ax.length) { s += ax(i) * (x(i) - m.mean(i)); i += 1 }
        math.rint(s * 1e4) / 1e4
      }
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 1e-4 + 1e-9, s"vec $id: $g vs $w")
      }
    }
  }

  test("consistencyGate passes on the embeddings fixture at k=16 and k=full") {
    for (k <- Seq(16, 64)) {
      val m = Pca.fit(embeddings, "embedding", k = k)
      val r = Pca.consistencyGate(embeddings, "embedding", m).head()
      assert(r.toSeq == Seq(1, 1, 1, 1, 1), s"gate at k=$k: $r")
      if (k == 64) assert(m.explainedRatio > 1 - 1e-9,
        "full-rank PCA must explain all variance")
    }
  }

  test("uncentered fit preserves dots in the kept span (full rank)") {
    val m = Pca.fit(embeddings.limit(50), "embedding", k = 64, center = false)
    assert(m.mean.isEmpty)
    // full-rank orthogonal rotation: reduced dot == original dot
    val d = embeddings.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val proj = d.select(col("vec_id"), Pca.projectColumn(col("v"), m).as("p"))
    val both = d.join(proj, "vec_id").collect()
    both.foreach { r =>
      val v = r.getSeq[Double](1); val p = r.getSeq[Double](2)
      val dv = v.map(x => x * x).sum
      val dp = p.map(x => x * x).sum
      assert(math.abs(dv - dp) < 1e-8 * math.max(1.0, dv),
        s"norm not preserved for ${r.getLong(0)}")
    }
  }

  test("pcaTopK: full-components run reproduces brute force; 16-dim recall") {
    val corpus = embeddings.filter(col("vec_id") >= 10)
    val queries = embeddings.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", 5)
    // nComponents = d: rotation is lossless, oversampled shortlist +
    // exact rerank must equal brute force exactly
    val full = Similarity.pcaTopK(corpus, queries,
      "vec_id", "embedding", 5, nComponents = 64, oversample = 5)
    assertSameRows(full, brute)

    // the isotropic fixture is PCA's worst case (no low-rank
    // structure to keep: 32 of 64 axes hold half the variance) —
    // recall measured 0.44/0.82/0.96 at 16/32/48 components; the
    // shipped default is the 32-dim halving
    val b = brute.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reduced = Similarity.pcaTopK(corpus, queries,
      "vec_id", "embedding", 5, nComponents = 32, oversample = 5)
    val g = reduced.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = b.intersect(g).size.toDouble / b.size
    assert(recall >= 0.6, s"pca recall@5 = $recall")
    // guaranteed k per query
    val counts = reduced.groupBy("qid").count().collect()
    assert(counts.forall(_.getLong(1) == 5))
  }

  test("incremental fit: merged old+delta moment stats reproduce the full-corpus model") {
    val old = embeddings.filter(col("vec_id") < 300)
    val delta = embeddings.filter(col("vec_id") >= 300)
    val merged = Pca.fitFromStats(
      Pca.momentStats(old, "embedding")
        .unionByName(Pca.momentStats(delta, "embedding")), k = 16)
    val full = Pca.fit(embeddings, "embedding", k = 16)
    merged.eigenvalues.zip(full.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)))
    }
    merged.axes.zip(full.axes).foreach { case (ma, fa) =>
      val dot = ma.zip(fa).map { case (x, y) => x * y }.sum
      assert(dot > 1 - 1e-9, s"axes diverged: dot=$dot")
    }
    assert(math.abs(merged.totalVariance - full.totalVariance) < 1e-9)

    // retraction: base(all) − stats(delta) ≡ fit(old) up to the fp
    // residue of cancelled sums (~1e-12 rel, the repartition envelope)
    val retracted = Pca.fitFromStats(
      Pca.momentStats(embeddings, "embedding").unionByName(
        Pca.negateStats(Pca.momentStats(delta, "embedding"))), k = 16)
    val oldOnly = Pca.fit(old, "embedding", k = 16)
    retracted.eigenvalues.zip(oldOnly.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-7 * math.max(1.0, math.abs(b)))
    }
    retracted.axes.zip(oldOnly.axes).foreach { case (ma, fa) =>
      assert(ma.zip(fa).map { case (x, y) => x * y }.sum > 1 - 1e-7)
    }
  }

  test("knnCentrality: matches a driver-side replay on a hand-built graph; mass conserved on the fixture") {
    // A→{B,C}, B→A, C→A: A aggregates two full ranks, B/C split A's
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("qid", "nid")
    val got = Similarity.knnCentrality(edges, iters = 10, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var (a, b, c) = (1.0, 1.0, 1.0)
    for (_ <- 1 to 10) {
      val (na, nb, nc) = (0.15 + 0.85 * (b + c), 0.15 + 0.85 * (a / 2),
        0.15 + 0.85 * (a / 2))
      a = na; b = nb; c = nc
    }
    assert(math.abs(got(1L) - math.rint(a * 1e4) / 1e4) <= 1e-4)
    assert(math.abs(got(2L) - math.rint(b * 1e4) / 1e4) <= 1e-4)
    assert(math.abs(got(3L) - math.rint(c * 1e4) / 1e4) <= 1e-4)
    assert(got(1L) > got(2L), "the doubly-pointed-at node ranks higher")

    // fixture graph: every node has out-degree k, so total rank mass
    // is conserved at n (within 4dp rounding × n)
    val g = Similarity.knnGraphBrute(embeddings, "vec_id", "embedding", 5)
    val ranks = Similarity.knnCentrality(g).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = embeddings.count()
    assert(ranks.size == n, "one rank per vector")
    assert(ranks.values.forall(_ > 0), "ranks strictly positive")
    assert(math.abs(ranks.values.sum - n) < n * 1e-3,
      s"mass ${ranks.values.sum} should stay ~$n")

    // distributed fallback (threshold 0) agrees with the local path
    // at the 4dp rounding quantum
    val dist = Similarity.knnCentrality(g, localIterThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.foreach { case (id, v) =>
      assert(math.abs(dist(id) - v) <= 1e-4 + 1e-9,
        s"paths diverge at $id: $v vs ${dist(id)}")
    }
  }

  test("opqEigenAllocation balances the spectrum; opqTopK keeps exact cosines and recall") {
    // synthetic descending spectrum: the greedy allocation must give
    // each subspace exactly sub slots and spread the big eigenvalues
    val base = Pca.fit(embeddings, "embedding", k = -1, center = false)
    assert(base.k == 64, "full-rank fit via k = -1")
    val rot = Pca.opqEigenAllocation(base, m = 16)
    assert(rot.k == 64)
    // same axes, permuted
    assert(rot.axes.map(_.toSeq).toSet == base.axes.map(_.toSeq).toSet)
    // the 16 largest eigenvalues land in 16 DISTINCT subspaces
    val subOf = rot.eigenvalues.zipWithIndex.map { case (ev, i) => (ev, i / 4) }
    val top16 = base.eigenvalues.take(16).toSet
    val topSubs = subOf.filter(p => top16.contains(p._1)).map(_._2)
    assert(topSubs.distinct.length == 16,
      s"top eigenvalues must spread across subspaces, got $topSubs")

    val corpus = embeddings.filter(col("vec_id") >= 10)
    val queries = embeddings.filter(col("vec_id") < 10)
    val got = Similarity.opqTopK(corpus, queries,
      "vec_id", "embedding", 5, m = 16, ksub = 16)
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", 5)
    val b = brute.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = got.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = b.intersect(g).size.toDouble / b.size
    assert(recall >= 0.6, s"opq recall@5 = $recall")
    // rotated-space cosines are the original cosines (orthogonal map)
    val bm = brute.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bm.get(key).foreach(c =>
        assert(math.abs(r.getDouble(3) - c) <= 1e-4 + 1e-9,
          s"cos drifted for $key"))
    }
  }

  test("labelPropagation: seeds immutable, hops reach beyond direct neighbors, local ≡ distributed") {
    // chain 1→2→3→4 (each points at the next and previous): seed only
    // node 1 with label 7 — after 3 rounds it must reach node 4,
    // which has NO labeled direct neighbor at round 1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("qid", "nid")
    val seeds = Seq((1L, 7)).toDF("vec_id", "label")
    val got = Similarity.labelPropagation(edges, seeds, "vec_id", "label",
      iters = 3).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getBoolean(2))).toMap
    assert(got(1L) == (Some(7), true))
    assert(got(2L) == (Some(7), false))
    assert(got(3L) == (Some(7), false))
    assert(got(4L) == (Some(7), false), "label must hop the chain")

    // tie rule: node 10 sees labels {1, 2} one vote each → smallest
    val e2 = Seq((10L, 11L), (10L, 12L), (11L, 10L), (12L, 10L)).toDF("qid", "nid")
    val s2 = Seq((11L, 2), (12L, 1)).toDF("vec_id", "label")
    val t = Similarity.labelPropagation(e2, s2, "vec_id", "label", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(t(10L) == 1, s"tie must break to the smallest label: $t")

    // fixture: local ≡ distributed, seeds immutable, coverage grows
    val g = Similarity.knnGraphBrute(embeddings, "vec_id", "embedding", 5)
      .localCheckpoint(true)
    val seedsF = embeddings.filter(col("vec_id") < 100)
    val local = Similarity.labelPropagation(g, seedsF, "vec_id", "label",
      iters = 5).collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val dist = Similarity.labelPropagation(g, seedsF, "vec_id", "label",
      iters = 5, localIterThreshold = 0L).collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(local == dist, "execution paths must agree exactly")
    val seedLabels = seedsF.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    seedLabels.foreach { case (id, l) =>
      assert(local(id) == l, s"seed $id moved")
    }
    val labeled = local.count(_._2 >= 0)
    assert(labeled > seedLabels.size, "propagation must label non-seeds")
  }

  test("gramian aggregator is partitioning-invariant (up to fp rounding)") {
    val one = Pca.fit(embeddings.coalesce(1), "embedding", k = 8)
    val many = Pca.fit(embeddings.repartition(7), "embedding", k = 8)
    one.eigenvalues.zip(many.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(a)))
    }
    one.mean.zip(many.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }
}
