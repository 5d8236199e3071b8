package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Flatten, Melt}

/** ScalaCheck properties (SURVEY §5b): pivot/melt round-trip on
  * generated tables, WordShingles vs a reference implementation.
  * Each property runs a bounded number of Spark jobs — keep the data
  * per case small.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: melt → pivotLatest round-trips any wide table") {
    val genRow = for {
      a <- Gen.chooseNum(-1e6, 1e6)
      b <- Gen.chooseNum(-1e6, 1e6)
      c <- Gen.chooseNum(-1e6, 1e6)
    } yield (a, b, c)
    val genTable = Gen.nonEmptyListOf(genRow).map(_.take(30))
    check(Prop.forAll(genTable) { rows =>
      val wide = rows.zipWithIndex
        .map { case ((a, b, c), i) => (i.toLong, a, b, c) }
        .toDF("id", "va", "vb", "vc")
      val melted = Melt.melt(wide, Seq("id"), Seq("va", "vb", "vc"))
      val back = Flatten.pivotLatest(melted, "id", "attr",
        labels = Seq("va", "vb", "vc").map(c => (c, c: Any, col("val"))),
        tieBreak = Nil)
      val orig = wide.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
      val rt = back.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
      rt == orig
    })
  }

  test("property: WordShingles equals the obvious reference implementation") {
    val token = Gen.oneOf("a", "bb", "ccc", "dd", "e", "xyz")
    val genDoc = Gen.listOf(token).map(_.take(25))
    val genK = Gen.chooseNum(1, 4)
    check(Prop.forAll(genDoc, genK) { (toks, k) =>
      val text = toks.mkString(" ")
      val expected = toks.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toSeq.distinct
      val got = Seq(text).toDF("text")
        .select(graft.functions.WordShingles.column(col("text"), k))
        .as[Seq[String]].head()
      got == expected
    })
  }

  test("property: MinHashAggregator equals the per-permutation min formula") {
    val prime = 2147483647L
    val genHashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, prime - 1)).map(_.take(50))
    val genCoeffs = Gen.listOfN(8, for {
      a <- Gen.chooseNum(1L, prime - 1)
      b <- Gen.chooseNum(0L, prime - 1)
    } yield (a, b))
    check(Prop.forAll(genHashes, genCoeffs) { (hs, coeffs) =>
      val as = coeffs.map(_._1).toArray
      val bs = coeffs.map(_._2).toArray
      val agg = graft.functions.MinHashAggregator.minhash(as, bs, prime)
      // fold through reduce (as the partial agg would), then merge
      // two halves (as the exchange would) — both orders must agree
      val whole = hs.foldLeft(agg.zero)((s, h) => agg.reduce(s, h))
      val (h1, h2) = hs.splitAt(hs.length / 2)
      val merged = agg.merge(
        h1.foldLeft(agg.zero)((s, h) => agg.reduce(s, h)),
        h2.foldLeft(agg.zero)((s, h) => agg.reduce(s, h)))
      val expected = as.indices.map(i =>
        hs.map(h => (h * as(i) + bs(i)) % prime).min)
      agg.finish(whole).toSeq == expected &&
        agg.finish(merged).toSeq == expected
    })
  }

  test("property: Int8Quantize codes bounded and direction-preserving") {
    val genVec = Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0)).map(_.take(16))
    check(Prop.forAll(genVec) { xs =>
      val codes = Seq(xs.toArray).toDF("v")
        .select(graft.functions.Int8Quantize.column(col("v")))
        .as[Seq[Byte]].head()
      val norm = math.sqrt(xs.map(x => x * x).sum)
      codes.length == xs.length &&
        codes.forall(b => b >= -127 && b <= 127) &&
        // each code is the rounded scaled coordinate (exact contract)
        (norm == 0.0 || codes.zip(xs).forall { case (c, x) =>
          c == math.round(x * 127.0 / norm).toByte
        })
    })
  }

  test("property: asOf equals the naive latest-at-or-before lookup") {
    val genLeft = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 40L)
    } yield (k, t)).map(_.take(15))
    val genRight = Gen.listOf(for {
      k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 40L)
      v <- Gen.option(Gen.chooseNum(0.0, 9.0))
    } yield (k, t, v)).map(_.take(15))
    check(Prop.forAll(genLeft, genRight) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000))
      }.toDF("id", "k", "lts")
      // right side deduped per (k, ts): the operator carries the whole
      // latest ROW; at equal ts the winner among duplicates is
      // plan-order-dependent, so the property pins unique (k, ts)
      val rRows = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out =
        if (rRows.isEmpty) Map.empty[Long, Option[Double]]
        else {
          val right = rRows.map { case (k, t, v) =>
            (k, new java.sql.Timestamp(t * 1000), v)
          }.toDF("k", "rts", "price")
          graft.operators.AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
            .select("id", "price").as[(Long, Option[Double])]
            .collect().toMap
        }
      if (rRows.isEmpty) true
      else ls.zipWithIndex.forall { case ((k, t), i) =>
        val expected = rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.flatMap(_._3)
        out(i.toLong) == expected
      }
    })
  }

  test("property: bucketized range join equals the naive theta join") {
    val genPoints = Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L)).map(_.take(20))
    val genIvals = Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0L, 500L); len <- Gen.chooseNum(0L, 120L)
    } yield (s, s + len)).map(_.take(10))
    val genW = Gen.oneOf(7L, 30L, 60L, 200L)
    check(Prop.forAll(genPoints, genIvals, genW) { (ps, ivs, w) =>
      val points = ps.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000))
      }.toDF("pid", "ts")
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000), new java.sql.Timestamp(e * 1000))
      }.toDF("iid", "ws", "we")
      val got = graft.operators.RangeJoin
        .pointInInterval(points, intervals, "ts", "ws", "we", bucketSeconds = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val expected = (for {
        (t, pi) <- ps.zipWithIndex
        ((s, e), ii) <- ivs.zipWithIndex
        if t >= s && t <= e
      } yield (pi.toLong, ii.toLong)).toSet
      got == expected
    })
  }

  test("property: salted join equals the plain join") {
    val genLarge = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1L, 4L); v <- Gen.chooseNum(0, 99)
    } yield (k, v)).map(_.take(30))
    val genSmall = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1L, 6L); w <- Gen.alphaStr.map(_.take(3))
    } yield (k, w)).map(_.take(8).distinct)
    check(Prop.forAll(genLarge, genSmall) { (ls, ss) =>
      val large = ls.toDF("k", "v")
      val small = ss.toDF("k", "w")
      val plain = large.join(small, Seq("k")).select("k", "v", "w")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      val salted = graft.operators.SkewJoin
        .saltedJoin(large, small, Seq("k"), factor = 4)
        .select("k", "v", "w")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      salted == plain // multiset equality — duplicates preserved exactly
    })
  }

  test("property: flatten collision rule always keeps latest obs_datetime") {
    val genObs = Gen.nonEmptyListOf(for {
      enc <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(1L, 50L)
      v <- Gen.chooseNum(0.0, 100.0)
    } yield (enc, t, v)).map(_.take(40))
    check(Prop.forAll(genObs) { obsRows =>
      val distinctRows = obsRows.zipWithIndex.map { case ((e, t, v), i) =>
        (i.toLong, e, 100L, Some(v), None: Option[String],
          None: Option[java.sql.Timestamp], None: Option[String],
          new java.sql.Timestamp(t * 1000), 0)
      }
      val obs = distinctRows.toDF("obs_id", "encounter_id", "concept_id",
        "value_numeric", "value_text", "value_datetime", "value_coded",
        "obs_datetime", "voided")
      val cfg = graft.model.FlatTableConfig("t", 1,
        Seq(graft.model.FlatColumn("w", 100L, "Numeric")))
      val flat = Flatten.flattenObs(obs, cfg).collect()
        .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("w"))).toMap
      // expected winner per encounter: max (ts, obs_id)
      val expected = distinctRows.groupBy(_._2).map { case (enc, rows) =>
        enc -> rows.maxBy(r => (r._8.getTime, r._1))._4.get
      }
      flat == expected
    })
  }

  test("property: repetitionSignals equals the reference counting implementation") {
    val token = Gen.oneOf("a", "bb", "ccc", "dd", "e", "xyz")
    val genDoc = Gen.listOf(token).map(_.take(30))
    check(Prop.forAll(Gen.nonEmptyListOf(genDoc).map(_.take(8))) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis
        .repetitionSignals(df, "doc_id", "text").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      def stats(grams: Seq[String]): (Long, Long, Long, Long) = {
        val counts = grams.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        if (counts.isEmpty) (0L, 0L, 0L, 0L)
        else (counts.values.max,
          counts.map { case (g, c) => c * g.length }.max,
          counts.valuesIterator.filter(_ > 1).sum,
          counts.collect { case (g, c) if c > 1 => c * g.length }.sum)
      }
      docs.zipWithIndex.forall { case (toks, i) =>
        val grams2 = toks.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSeq
        val (topW, _, dupW, _) = stats(toks)
        val (t2n, t2m, d2n, d2m) = stats(grams2)
        val r = out(i.toLong)
        r.getAs[Long]("word_count") == toks.size &&
          r.getAs[Long]("top_word_n") == topW &&
          r.getAs[Long]("dup_word_n") == dupW &&
          r.getAs[Long]("top2_n") == t2n &&
          r.getAs[Long]("top2_mass") == t2m &&
          r.getAs[Long]("dup2_n") == d2n &&
          r.getAs[Long]("dup2_mass") == d2m
      }
    })
  }

  test("property: spanDedup equals the obvious sequential-scan reference") {
    val token = Gen.oneOf("a", "b", "c")
    val genDoc = Gen.nonEmptyListOf(token).map(_.take(12))
    val genCorpus = Gen.nonEmptyListOf(genDoc).map(_.take(8))
    val genSpan = Gen.chooseNum(1, 4)
    check(Prop.forAll(genCorpus, genSpan) { (docs, span) =>
      // reference: walk docs in id order, cut into span-word pieces,
      // keep a piece iff its text was never seen before
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.zipWithIndex.map { case (toks, i) =>
        val pieces = toks.grouped(span).map(_.mkString(" ")).toSeq
        val kept = pieces.filter { p =>
          val fresh = !seen(p); seen += p; fresh
        }
        (i.toLong, pieces.size.toLong, kept.size.toLong, kept.mkString(" "))
      }
      val got = graft.operators.Dedup.spanDedup(
          docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
            .toDF("doc_id", "text"),
          "doc_id", "text", span)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      got == expected
    }, minTests = 8)
  }

  test("property: chunk with stride == chunkSize partitions the doc exactly") {
    val token = Gen.oneOf("a", "bb", "ccc")
    val genDoc = Gen.nonEmptyListOf(token).map(_.take(20))
    val genSize = Gen.chooseNum(1, 6)
    check(Prop.forAll(genDoc, genSize) { (toks, cs) =>
      val out = graft.operators.TextAnalysis.chunk(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", chunkSize = cs, stride = cs)
        .orderBy("chunk_id")
        .as[(Long, Int, String, Int)].collect().toSeq
      // non-overlapping chunks reassemble to the original token stream
      // and chunk ids are dense from 0
      out.map(_._3).mkString(" ") == toks.mkString(" ") &&
        out.map(_._2) == out.indices.map(identity) &&
        out.map(_._4).sum == toks.size
    }, minTests = 8)
  }

  test("property: lmScore equals the naive smoothed-bigram reference") {
    val token = Gen.oneOf("a", "b", "c", "d")
    val genDoc = Gen.listOf(token).map(_.take(10))
    val genCorpus = Gen.nonEmptyListOf(genDoc).map(_.take(6))
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    check(Prop.forAll(genCorpus) { docs =>
      val bigrams = docs.flatMap(d => d.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      if (bigrams.isEmpty) true
      else {
        val cb = bigrams.groupBy(identity).view.mapValues(_.size).toMap
        val cg = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
        val v = docs.flatten.distinct.size
        val expected = docs.zipWithIndex.flatMap { case (d, i) =>
          val bs = d.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
          if (bs.isEmpty) None
          else {
            val lls = bs.map(b => math.log((cb(b) + 0.5) / (cg(b._1) + 0.5 * v)))
            val avg = lls.sum / lls.size
            Some(i.toLong -> ((bs.size.toLong, r4(avg), r4(math.exp(-avg)))))
          }
        }.toMap
        val got = graft.operators.TextAnalysis.lmScore(
            docs.zipWithIndex.map { case (d, i) => (i.toLong, d.mkString(" ")) }
              .toDF("doc_id", "text"), "doc_id", "text", addK = 0.5)
          .as[(Long, Long, Double, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        got == expected
      }
    }, minTests = 8)
  }

  test("property: encode equals a plain map lookup with unk fallback") {
    val token = Gen.oneOf("a", "b", "c", "zz", "qq")
    val genDoc = Gen.listOf(token).map(_.take(12))
    val genCorpus = Gen.nonEmptyListOf(genDoc).map(_.take(5))
    val vocab = Seq(("a", 1), ("b", 2), ("c", 3))
    check(Prop.forAll(genCorpus) { docs =>
      val vmap = vocab.toMap
      val expected = docs.zipWithIndex.map { case (d, i) =>
        (i.toLong, d.map(t => vmap.getOrElse(t, -1)), d.size)
      }
      val got = graft.operators.TextAnalysis.encode(
          docs.zipWithIndex.map { case (d, i) => (i.toLong, d.mkString(" ")) }
            .toDF("doc_id", "text"),
          vocab.toDF("token", "rank"), "doc_id", "text")
        .as[(Long, Seq[Int], Int)].collect().sortBy(_._1).toSeq
      got == expected
    }, minTests = 8)
  }

  test("property: split honors cumulative hash thresholds exactly") {
    val genIds = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L)).map(_.distinct.take(40))
    val genCut = Gen.chooseNum(0.1, 0.9)
    check(Prop.forAll(genIds, genCut) { (ids, f) =>
      val out = graft.operators.Sampling.split(
          ids.toDF("id"), "id", Seq("x" -> f, "y" -> (1.0 - f)))
        .as[(Long, String)].collect().toMap
      ids.forall { id =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val bucket = java.lang.Long.parseLong(hex, 16) % 10000
        out(id) == (if (bucket < (f * 10000).round) "x" else "y")
      }
    }, minTests = 8)
  }

  test("property: containment bounds — c in (0,1], c_ab ≥ jaccard of the pair") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val genDoc = Gen.listOfN(8, word).map(_.mkString(" "))
    check(Prop.forAll(genDoc, genDoc) { (ta, tb) =>
      val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val cont = graft.operators.Dedup
        .shingleContainment(docs, "doc_id", "text", k = 3, threshold = 0.0)
        .as[(Long, Long, Double, Double)].collect()
      val jac = graft.operators.Dedup
        .ngramJaccard(docs, "doc_id", "text", k = 3, threshold = 0.0)
        .select("jaccard").as[Double].collect()
      cont.forall { case (_, _, cab, cba) =>
        cab > 0 && cab <= 1.0 && cba > 0 && cba <= 1.0 &&
          jac.forall(j => cab >= j && cba >= j)
      }
    }, minTests = 8)
  }

  test("property: rank metrics land in [0,1] and recall grows with k") {
    val genRel = Gen.someOf(10L to 20L).map(_.toSet)
    check(Prop.forAll(genRel) { rel =>
      val results = (1 to 8).map(r => (1L, 9L + r, r)).toDF("qid", "nid", "rank")
      val qrels = (if (rel.isEmpty) Set(99L) else rel)
        .map(n => (1L, n)).toSeq.toDF("qid", "nid")
      val Seq(m3, m8) = Seq(3, 8).map(k =>
        graft.operators.Eval.rankMetrics(results, qrels, k)
          .as[(Long, Double, Double, Double)].head())
      Seq(m3, m8).forall { m =>
        m._2 >= 0 && m._2 <= 1 && m._3 >= 0 && m._3 <= 1 &&
          m._4 >= 0 && m._4 <= 1
      } && m8._3 >= m3._3 // recall@8 ≥ recall@3 on the same run
    }, minTests = 8)
  }

  test("property: equi-depth bins always partition n rows into ≤k bins of balanced size") {
    val genScores = Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0)).map(_.take(40))
    val genK = Gen.chooseNum(1, 6)
    check(Prop.forAll(genScores, genK) { (ss, k) =>
      val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val bins = graft.operators.Calibrate.equiDepthBins(df, "id", "s", k)
        .as[(Int, Long, Double, Double)].collect()
      val n = ss.size
      bins.map(_._2).sum == n &&
        bins.forall(b => b._1 >= 1 && b._1 <= k) &&
        // balanced: sizes differ by at most 1 among NON-EMPTY bins
        (bins.map(_._2).max - bins.map(_._2).min) <= 1
    }, minTests = 8)
  }

  test("property: containmentLsh ⊆ exact containment with identical scores") {
    // the subset relation holds on ANY corpus regardless of banding
    // luck: candidates can only MISS pairs, and survivors are
    // exact-verified — the approximation never invents or mis-scores
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val genDoc = Gen.listOfN(10, word).map(_.mkString(" "))
    val genDocs = Gen.listOfN(4, genDoc)
    check(Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exact = graft.operators.Dedup
        .shingleContainment(docs, "doc_id", "text", k = 3, threshold = 0.3)
        .as[(Long, Long, Double, Double)].collect().toSet
      val lsh = graft.operators.Dedup
        .containmentLsh(docs, "doc_id", "text", k = 3, threshold = 0.3)
        .as[(Long, Long, Double, Double)].collect().toSet
      lsh.subsetOf(exact)
    }, minTests = 8)
  }

  test("property: filtered IVF always returns min(k, |filtered|) predicate-true rows per query") {
    val genLabels = Gen.listOfN(24, Gen.chooseNum(0, 2))
    val genSeed = Gen.chooseNum(1, 1000)
    check(Prop.forAll(genLabels, genSeed) { (labels, seed) =>
      // deterministic pseudo-random unit-ish vectors from the seed
      val rows = labels.zipWithIndex.map { case (lab, i) =>
        val v = Array.tabulate(8)(d =>
          math.sin(seed * 31 + i * 7 + d * 13).toFloat)
        (i.toLong, lab, v)
      }
      val df = rows.toDF("vec_id", "label", "embedding")
      val corpus = df.filter(col("vec_id") >= 4)
      val queries = df.filter(col("vec_id") < 4)
      val k = 3
      val nFiltered = corpus.filter(col("label") === 1).count()
      val cents = graft.operators.Similarity.trainCentroids(
        corpus, "vec_id", "embedding", nCentroids = 4, iters = 2)
      val idx = graft.operators.Similarity.ivfAssign(
        corpus, "vec_id", "embedding", cents, keepCols = Seq("label"))
      val out = graft.operators.Similarity.ivfTopKFilteredFromIndex(
          idx, cents, queries, "vec_id", "embedding", k,
          predicate = col("label") === 1, nProbe = 1)
        .join(corpus.select(col("vec_id").as("nid"), col("label")), Seq("nid"))
        .select(col("qid"), col("label")).as[(Long, Int)].collect()
      val perQ = out.groupBy(_._1).view.mapValues(_.length).toMap
      out.forall(_._2 == 1) &&
        (0L until 4L).forall(q =>
          perQ.getOrElse(q, 0) == math.min(k.toLong, nFiltered).toInt)
    }, minTests = 6)
  }

  test("property: linkDelta ≡ full resolveEntities on the union for random splits") {
    val name = for {
      block <- Gen.oneOf("aa", "bb")
      body <- Gen.listOfN(4, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
    } yield s"$block $body"
    val genOld = Gen.nonEmptyListOf(name).map(_.take(8))
    val genDelta = Gen.nonEmptyListOf(name).map(_.take(5))
    check(Prop.forAll(genOld, genDelta) { (oldNames, deltaNames) =>
      val old = oldNames.toDF("nm")
      val delta = deltaNames.toDF("nm")
      val priorDict = graft.operators.Linkage.nameDictionary(old, "nm")
      val priorLabels = graft.operators.Linkage
        .resolveEntities(old, "nm", maxDist = 2)
        .select("name", "entity")
      val out = graft.operators.Linkage
        .linkDelta(priorDict, priorLabels, delta, "nm", maxDist = 2)
        .as[(String, String, Boolean, Long)].collect().toSet
      val full = graft.operators.Linkage
        .resolveEntities(old.unionByName(delta), "nm", maxDist = 2)
        .as[(String, String, Boolean, Long)].collect().toSet
      out == full
    }, minTests = 6)
  }

  test("property: knnGraph probing every cell ≡ brute-force graph on random corpora") {
    // with nProbe = nCentroids the candidate set is the whole corpus,
    // so the cell-local plan must reproduce the exact graph on ANY
    // input — banding/centroid luck cannot enter
    val genSeed = Gen.chooseNum(1, 1000)
    val genN = Gen.chooseNum(6, 20)
    check(Prop.forAll(genSeed, genN) { (seed, n) =>
      val rows = (0 until n).map { i =>
        (i.toLong, Array.tabulate(6)(d =>
          math.sin(seed * 17 + i * 5 + d * 11).toFloat))
      }
      val df = rows.toDF("vec_id", "embedding")
      val brute = graft.operators.Similarity
        .knnGraphBrute(df, "vec_id", "embedding", k = 3)
        .as[(Long, Long, Int, Double)].collect().toSet
      val full = graft.operators.Similarity
        .knnGraph(df, "vec_id", "embedding", k = 3,
          nCentroids = 4, nProbe = 4, iters = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
      full == brute
    }, minTests = 6)
  }

  test("property: semDeDup partitions any corpus and survivors are never in-cluster dups") {
    val genSeed = Gen.chooseNum(1, 1000)
    val genN = Gen.chooseNum(5, 16)
    check(Prop.forAll(genSeed, genN) { (seed, n) =>
      val rows = (0 until n).map { i =>
        (i.toLong, Array.tabulate(4)(d =>
          math.sin(seed * 13 + i * 3 + d * 7).toFloat))
      }
      val df = rows.toDF("vec_id", "embedding")
      val out = graft.operators.Dedup.semDeDup(
        df, "vec_id", "embedding", threshold = 0.8, nClusters = 3, iters = 2)
      val collected = out
        .as[(Long, Int, Double, Boolean)].collect()
      // exact partition of the corpus
      val partitionOk = collected.length == n &&
        collected.map(_._1).distinct.length == n
      // no two SURVIVING members of one cluster are above threshold
      val byCluster = collected.filter(!_._4).groupBy(_._2)
      val exact = graft.operators.Dedup
        .embeddingCosinePairs(df, "vec_id", "embedding", threshold = 0.8)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2)).toSet
      val noKeptDup = byCluster.values.forall { members =>
        val ids = members.map(_._1).sorted
        ids.combinations(2).forall(p => !exact.contains((p(0), p(1))))
      }
      partitionOk && noKeptDup
    }, minTests = 6)
  }

  test("property: unimax allocation — caps, budget bound, uniform unbound shares") {
    val genDomains = Gen.nonEmptyListOf(Gen.chooseNum(1L, 10000L)).map(_.take(12))
    val genBudget = Gen.chooseNum(0.0, 50000.0)
    val genEpochs = Gen.oneOf(0.25, 0.5, 1.0, 2.0)
    check(Prop.forAll(genDomains, genBudget, genEpochs) { (toks, budget, epochs) =>
      val df = toks.zipWithIndex.map { case (t, i) => (s"d$i", t) }
        .toDF("source", "toks")
      val rows = graft.operators.Sampling.unimaxAllocation(
          df, "source", col("toks"), budget, epochs)
        .as[(String, Long, Double, Double, Double)].collect()
      val capsOk = rows.forall(r => r._4 <= r._3 + 1e-6)
      val spent = rows.map(_._4).sum
      val totalCap = rows.map(_._3).sum
      // the walk spends exactly min(budget, total capacity) — the
      // only slack is the 4dp output rounding, half an ulp per row
      val budgetOk =
        math.abs(spent - math.min(budget, totalCap)) <=
          rows.length * 1e-4 + 1e-6
      // all domains below capacity got the same share (the waterfill
      // uniformity invariant), within the 4dp output rounding
      val unbound = rows.filter(r => r._4 < r._3 - 1e-6).map(_._4)
      val uniformOk = unbound.isEmpty ||
        (unbound.max - unbound.min) < 2e-4
      capsOk && budgetOk && uniformOk
    }, minTests = 30)
  }

  test("property: crossJaccardPairs ≡ cross-side restriction of within-corpus LSH pairs") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val genDoc = Gen.listOfN(12, word).map(_.mkString(" "))
    val genDocs = Gen.listOfN(14, genDoc)
    check(Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val left = docs.filter(col("doc_id") % 2 === 0)
      val right = docs.filter(col("doc_id") % 2 =!= 0)
      val cross = graft.operators.Dedup.crossJaccardPairs(
          left, right, "doc_id", "text", k = 2, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      val whole = graft.operators.Dedup.minHashLsh(
          docs, "doc_id", "text", k = 2, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
        .flatMap { case (a, b, j) =>
          // reorient to (even, odd); drop within-side pairs
          if (a % 2 == 0 && b % 2 != 0) Some((a, b) -> j)
          else if (b % 2 == 0 && a % 2 != 0) Some((b, a) -> j)
          else None
        }.toMap
      cross == whole
    }, minTests = 8)
  }

  test("property: PCA projection variance ≡ eigenvalues; energy conserved at full rank") {
    val genRow = Gen.listOfN(6, Gen.chooseNum(-10.0, 10.0))
    val genData = Gen.listOfN(25, genRow)
    check(Prop.forAll(genData) { rows =>
      val df = rows.map(r => Tuple1(r)).toDF("v")
      val m = graft.operators.Pca.fit(df, "v", k = 6)
      val gate = graft.operators.Pca.consistencyGate(df, "v", m).head()
      gate.toSeq == Seq(1, 1, 1, 1, 1) &&
        math.abs(m.eigenvalues.sum - m.totalVariance) <
          1e-9 * math.max(1.0, m.totalVariance)
    }, minTests = 10)
  }

  test("property: knnCentrality local ≡ distributed at the rounding quantum; mass conserved") {
    val genEdges = for {
      n <- Gen.chooseNum(3, 8)
      // every node gets one or two out-edges to OTHER nodes
      es <- Gen.sequence[List[List[(Int, Int)]], List[(Int, Int)]](
        (0 until n).toList.map { u =>
          Gen.listOfN(2, Gen.chooseNum(0, n - 2)).map(_.distinct.map { x =>
            (u, if (x >= u) x + 1 else x)
          })
        })
    } yield es.flatten.distinct
    check(Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val df = edges.map { case (u, v) => (u.toLong, v.toLong) }
          .toDF("qid", "nid")
        val local = graft.operators.Similarity.knnCentrality(df)
          .as[(Long, Double)].collect().toMap
        val dist = graft.operators.Similarity.knnCentrality(
            df, localIterThreshold = 0L)
          .as[(Long, Double)].collect().toMap
        val agree = local.keySet == dist.keySet &&
          local.forall { case (k, v) => math.abs(dist(k) - v) <= 1e-4 + 1e-9 }
        // out-degree > 0 for every ranked node ⇒ rank mass stays ~n
        val n = local.size
        agree && math.abs(local.values.sum - n) < n * 1e-3
      }
    }, minTests = 10)
  }

  test("property: scd2 invariants + merge ≡ rebuild at any split point") {
    val genEvents = for {
      n <- Gen.chooseNum(2, 20)
      rows <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(1, 3)
        attr <- Gen.oneOf("A", "B", "C")
      } yield (key.toLong, attr))
    } yield rows
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    check(Prop.forAll(genEvents, Gen.chooseNum(0.0, 1.0)) { (rows, frac) =>
      // ts monotone in the event id, so ANY id split satisfies the
      // delta-later-than-history contract
      val ev = rows.zipWithIndex.map { case ((k, a), i) =>
        (k, new java.sql.Timestamp(base + i * 1000L), i.toLong, a)
      }.toDF("user_id", "ts", "event_id", "event_type")
      val hist = graft.operators.Incremental.scd2History(
        ev, "user_id", "ts", "event_id", "event_type")
      val got = hist.as[(Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean, Long)].collect()
      val conserved = got.map(_._6).sum == rows.size
      val oneCurrent = got.groupBy(_._1)
        .forall { case (_, vs) => vs.count(_._5) == 1 }
      val chained = got.groupBy(_._1).forall { case (_, vs) =>
        val sorted = vs.sortBy(v => (v._3.getTime, v._4.map(_.getTime)
          .getOrElse(Long.MaxValue)))
        sorted.init.zip(sorted.tail).forall { case (a, b) =>
          a._4.contains(b._3) } && sorted.last._4.isEmpty
      }
      val noStutter = got.groupBy(_._1).forall { case (_, vs) =>
        val sorted = vs.sortBy(_._3.getTime)
        sorted.init.zip(sorted.tail).forall { case (a, b) => a._2 != b._2 }
      }
      val cut = (rows.size * frac).toInt
      val merged = graft.operators.Incremental.scd2Merge(
        graft.operators.Incremental.scd2History(
          ev.filter(col("event_id") < cut),
          "user_id", "ts", "event_id", "event_type"),
        ev.filter(col("event_id") >= cut),
        "user_id", "ts", "event_id", "event_type")
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean, Long)].collect()
      conserved && oneCurrent && chained && noStutter &&
        merged.toSet == got.toSet
    }, minTests = 10)
  }

  test("property: HLL sketch state merge ≡ rebuild on any split") {
    val genRows = Gen.listOf(for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.chooseNum(0L, 50L)
    } yield (g, v)).map(_.take(40))
    check(Prop.forAll(genRows, Gen.chooseNum(1L, 7L)) { (rows, mod) =>
      rows.isEmpty || {
        val df = rows.zipWithIndex.map { case ((g, v), i) =>
          (g, v, i.toLong) }.toDF("g", "v", "i")
        val grain = Seq("g")
        val rebuilt = graft.operators.SketchState.estimateRollup(
          graft.operators.SketchState.distinctSketches(df, grain, "v"),
          grain).as[(String, Double, Long)].collect().toSet
        val merged = graft.operators.SketchState.estimateRollup(
          graft.operators.SketchState.mergeSketches(
            graft.operators.SketchState.distinctSketches(
              df.filter(col("i") % mod === 0), grain, "v"),
            graft.operators.SketchState.distinctSketches(
              df.filter(col("i") % mod =!= 0), grain, "v"),
            grain), grain).as[(String, Double, Long)].collect().toSet
        // sparse-mode HLL is exact at this cardinality, so the
        // estimate must equal the true distinct count too
        val truth = rows.groupBy(_._1).map { case (g, vs) =>
          (g, vs.map(_._2).distinct.size.toDouble, vs.size.toLong) }.toSet
        merged == rebuilt && rebuilt == truth
      }
    }, minTests = 10)
  }

  test("property: quality reports merge exactly; rates bounded") {
    val genRows = Gen.nonEmptyListOf(for {
      v <- Gen.option(Gen.chooseNum(-2.0, 2.0))
      t <- Gen.oneOf("a", "b", "zz")
    } yield (v, t)).map(_.take(30))
    val rules = Seq(
      graft.operators.DataQuality.notNull("score"),
      graft.operators.DataQuality.inRange("score", 0.0, 1.0),
      graft.operators.DataQuality.inSet("tag", Seq("a", "b")))
    check(Prop.forAll(genRows, Gen.chooseNum(1L, 5L)) { (rows, mod) =>
      val df = rows.zipWithIndex.map { case ((v, t), i) =>
        (v, t, i.toLong) }.toDF("score", "tag", "i")
      val full = graft.operators.DataQuality.check(df, rules, 0.8)
        .as[(String, Long, Long, Double, Boolean)].collect().toSet
      val merged = graft.operators.DataQuality.mergeReports(
        graft.operators.DataQuality.check(
          df.filter(col("i") % mod === 0), rules, 0.8),
        graft.operators.DataQuality.check(
          df.filter(col("i") % mod =!= 0), rules, 0.8), 0.8)
        .as[(String, Long, Long, Double, Boolean)].collect().toSet
      merged == full && full.forall { case (_, n, v, r, _) =>
        v <= n && r >= 0.0 && r <= 1.0 }
    }, minTests = 10)
  }

  test("property: clustering coefficient bounded; direction-blind") {
    // distinct endpoints generated filter-free (b = a + step mod 6) —
    // an `if a != b` guard here compounds discards inside
    // nonEmptyListOf until ScalaCheck reports Exhausted on unlucky
    // seeds (the r11 one-in-a-full-run flake)
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0, 5)
      step <- Gen.chooseNum(1, 5)
    } yield (a.toLong, ((a + step) % 6).toLong)).map(_.take(15))
    check(Prop.forAll(genEdges) { edges =>
      val df = edges.toDF("qid", "nid")
      val fwd = graft.operators.Similarity.knnClusteringCoeff(df)
        .as[(Long, Long, Long, Double)].collect().toSet
      val rev = graft.operators.Similarity.knnClusteringCoeff(
          df.select(col("nid").as("qid"), col("qid").as("nid")))
        .as[(Long, Long, Long, Double)].collect().toSet
      fwd == rev && fwd.forall { case (_, deg, tri, c) =>
        c >= 0.0 && c <= 1.0 && 2 * tri <= deg * (deg - 1).max(0) }
    }, minTests = 10)
  }
}
