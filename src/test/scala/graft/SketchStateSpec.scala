package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchState

/** Persisted mergeable HLL distinct-count state: the contract is
  * merge ≡ rebuild EXACTLY (register-max associativity — not just
  * within-error), sparse-mode exactness at low cardinality, bounded
  * relative error in dense mode, and exact n_rows bookkeeping.
  */
class SketchStateSpec extends SparkSpec {
  import spark.implicits._

  private val grain = Seq("g", "part")

  /** (g, part, v): two groups × two sub-parts, known distinct counts. */
  private def planted = Seq(
    ("a", 1, 10L), ("a", 1, 11L), ("a", 1, 10L),
    ("a", 2, 11L), ("a", 2, 12L),
    ("b", 1, 20L), ("b", 2, 20L), ("b", 2, 21L)
  ).toDF("g", "part", "v")

  test("sparse-mode estimates are exact at tiny cardinality") {
    val est = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, grain, "v"), Seq("g"))
      .select(col("g"), col("approx_distinct").cast("long"), col("n_rows"))
    // distinct over a: {10,11,12}=3 of 5 rows; b: {20,21}=2 of 3 rows
    assertSameRows(est, Seq(("a", 3L, 5L), ("b", 2L, 3L)).toDF())
  }

  test("merge equals rebuild exactly, sparse and dense") {
    // 30k distinct values in one group, 100 in the other: the first
    // leaves sparse mode at lgK=12, the second stays in it — both
    // must merge to the rebuilt rollup EXACTLY, not within-error
    val big = spark.range(0, 60000).select(
      when(col("id") % 2 === 0, "dense").otherwise("sparse").as("g"),
      (col("id") % 3).cast("int").as("part"),
      when(col("id") % 2 === 0, col("id"))
        .otherwise(col("id") % 100).as("v"),
      col("id"))
    val rebuilt = SketchState.estimateRollup(
      SketchState.distinctSketches(big, grain, "v"), Seq("g"))
    val merged = SketchState.estimateRollup(
      SketchState.mergeSketches(
        SketchState.distinctSketches(big.filter(col("id") % 5 < 2), grain, "v"),
        SketchState.distinctSketches(big.filter(col("id") % 5 >= 2), grain, "v"),
        grain),
      Seq("g"))
    assertSameRows(merged, rebuilt)
  }

  test("dense-mode estimate within the lgK=12 error envelope") {
    val n = 30000L
    val df = spark.range(0, n).select(lit("g").as("g"), lit(1).as("part"),
      col("id").as("v"))
    val est = SketchState.estimateRollup(
      SketchState.distinctSketches(df, grain, "v"), Seq("g"))
      .select("approx_distinct").as[Double].head()
    val relErr = math.abs(est - n) / n
    // rsd at lgK=12 is ~1.6%; 5% is > 3 sigma
    assert(relErr <= 0.05, s"rel err $relErr > 5% (est=$est exact=$n)")
  }

  test("n_rows bookkeeping is exact through merges") {
    val merged = SketchState.mergeSketches(
      SketchState.distinctSketches(planted.filter(col("v") % 2 === 0), grain, "v"),
      SketchState.distinctSketches(planted.filter(col("v") % 2 =!= 0), grain, "v"),
      grain)
    assert(merged.agg(sum(col("n_rows"))).as[Long].head() == planted.count())
  }

  test("fine-grain state rolls up identically to coarse-grain state") {
    // build at (g, part), roll to (g)  ==  build at (g), roll to (g):
    // both pass through hll_union_agg, and union of the part-partials
    // has the same registers as the direct group sketch
    val fine = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, grain, "v"), Seq("g"))
    val coarse = SketchState.estimateRollup(
      SketchState.distinctSketches(planted, Seq("g"), "v"), Seq("g"))
    assertSameRows(fine, coarse)
  }

  // ---------------- Count-Min frequency-sketch state ----------------

  /** (g, item) with known multiplicities: x appears 5× in g1, y 3×,
    * z 1×; g2 carries x 2×.
    */
  private def items = Seq.fill(5)(("g1", "x")) ++ Seq.fill(3)(("g1", "y")) ++
    Seq(("g1", "z")) ++ Seq.fill(2)(("g2", "x"))

  private def itemsDf = items.toDF("g", "item")

  test("CMS point estimates never underestimate and are exact when sparse") {
    val state = SketchState.freqSketches(itemsDf, Seq("g"), "item")
    val probes = Seq("x", "y", "z", "never-seen").toDF("item")
    val est = SketchState.estimateFreq(state, probes, "item")
    // width=512, 4 distinct keys: collisions impossible to matter at
    // depth 4 — estimates are exact, absent key reads 0
    assertSameRows(est,
      Seq(("x", 7L), ("y", 3L), ("z", 1L), ("never-seen", 0L)).toDF())
  }

  test("CMS merge ≡ rebuild exactly (additive cells)") {
    val (a, b) = items.splitAt(4)
    val merged = SketchState.mergeFreqSketches(
      SketchState.freqSketches(a.toDF("g", "item"), Seq("g"), "item"),
      SketchState.freqSketches(b.toDF("g", "item"), Seq("g"), "item"),
      Seq("g"))
    assertSameRows(merged, SketchState.freqSketches(itemsDf, Seq("g"), "item"))
  }

  test("CMS estimate upper bound holds under forced collisions") {
    // width=2 forces heavy collisions: estimate must still be ≥ true
    // and ≤ true + N (the trivial bound at width 2 is loose; the
    // invariant under test is one-sided error)
    val state = SketchState.freqSketches(itemsDf.filter(col("g") === "g1"),
      Seq("g"), "item", depth = 4, width = 2)
    val est = SketchState.estimateFreq(state,
      Seq("x", "y", "z").toDF("item"), "item", depth = 4, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("x" -> 5L, "y" -> 3L, "z" -> 1L)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k underestimated: ${est(k)} < $t")
      assert(est(k) <= t + 9L, s"$k above trivial bound: ${est(k)}")
    }
  }

  // ---------------- Misra–Gries heavy-hitter state ----------------

  /** (g, item-ish value): group "x" has a planted skew — item 1 × 10,
    * item 2 × 6, items 3..12 × 1 each (n = 26).
    */
  private def mgPlanted = {
    val rows = Seq.fill(10)(("x", 1L)) ++ Seq.fill(6)(("x", 2L)) ++
      (3L to 12L).map(("x", _)) ++ Seq.fill(4)(("y", 7L))
    rows.toDF("g", "v")
  }

  test("MG summary: order-independent construction, est/bound per item") {
    val k = 2
    val st = SketchState.heavyHitterSketches(mgPlanted, Seq("g"), "v", k)
      .as[(String, String, Long, Long)].collect().toSet
    // group x: counts 10, 6, 1×10 → 3rd largest t = 1; keep (1, 10-1),
    // (2, 6-1); n = 26. group y: single item, t = 0, est exact.
    assert(st == Set(("x", "1", 9L, 26L), ("x", "2", 5L, 26L),
      ("y", "7", 4L, 4L)), s"state: $st")
    // validity: est ≤ true ≤ est + n/(k+1) for EVERY item (dropped → 0)
    val n = 26L
    val bound = n / (k + 1)
    val ests = st.filter(_._1 == "x").map(r => r._2 -> r._3).toMap
    val truth = Map("1" -> 10L, "2" -> 6L) ++
      (3L to 12L).map(i => i.toString -> 1L)
    truth.foreach { case (item, t) =>
      val e = ests.getOrElse(item, 0L)
      assert(e <= t && t <= e + bound, s"item $item: est=$e true=$t")
    }
  }

  test("MG merge: telescoped bound holds; totals combine per group, not per item") {
    val k = 2
    val h1 = mgPlanted.filter(col("v") <= 2 || col("v") % 2 === 1)
    val h2 = mgPlanted.exceptAll(h1)
    val merged = SketchState.mergeHeavyHitters(
      SketchState.heavyHitterSketches(h1, Seq("g"), "v", k),
      SketchState.heavyHitterSketches(h2, Seq("g"), "v", k),
      Seq("g"), k)
    // the merged n_rows must equal the FULL group's total — a per-item
    // total sum would understate it whenever an item misses one side
    val nX = merged.filter(col("g") === "x").select("n_rows")
      .distinct().as[Long].collect().toSeq
    assert(nX == Seq(26L), s"merged totals: $nX")
    // telescoped validity vs exact counts of the union
    val ests = merged.filter(col("g") === "x")
      .select("item", "est").as[(String, Long)].collect().toMap
    val truth = Map("1" -> 10L, "2" -> 6L) ++
      (3L to 12L).map(i => i.toString -> 1L)
    val bound = 26L / (k + 1)
    truth.foreach { case (item, t) =>
      val e = ests.getOrElse(item, 0L)
      assert(e <= t && t <= e + bound, s"item $item: est=$e true=$t")
    }
  }

  test("MG rollup from windowed state ≡ within-bound of the direct summary") {
    val k = 8
    val ev = spark.range(0, 3000).select(
      (col("id") % 5).cast("int").as("w"),
      // zipf-ish: value j with frequency ∝ 3000/(j+1)
      (col("id") % 20 * col("id") % 17 % 15).as("v"))
      .localCheckpoint(true)
    val rolled = SketchState.heavyHittersRollup(
      SketchState.heavyHitterSketches(ev, Seq("w"), "v", k), Seq(), k)
    val truth = ev.groupBy(col("v").cast("string").as("item"))
      .agg(count(lit(1)).as("t"))
      .as[(String, Long)].collect().toMap
    val n = 3000L
    val bound = n / (k + 1)
    val ests = rolled.select("item", "est").as[(String, Long)].collect().toMap
    assert(ests.nonEmpty)
    truth.foreach { case (item, t) =>
      val e = ests.getOrElse(item, 0L)
      assert(e <= t && t <= e + bound, s"item $item: est=$e true=$t")
    }
    // n_rows: each window's total counted once
    val nr = rolled.select("n_rows").distinct().as[Long].collect().toSeq
    assert(nr == Seq(3000L), s"rollup totals: $nr")
  }

  // ---------------- quantile-sketch state ----------------

  test("quantile buckets: exact below 10, two significant digits above") {
    val df = Seq(("g", 0L), ("g", 9L), ("g", 10L), ("g", 19L), ("g", 20L),
      ("g", 123L), ("g", 129L), ("g", 4567L)).toDF("g", "v")
    val state = SketchState.quantileSketches(df, Seq("g"), "v")
    // ≤ 2-digit values are singleton buckets (two significant digits
    // IS the value); 3+ digits zero the tail: 123,129 → 120
    assertSameRows(state.select("q_lb", "cnt"),
      Seq((0L, 1L), (9L, 1L), (10L, 1L), (19L, 1L), (20L, 1L), (120L, 2L),
        (4500L, 1L)).toDF())
  }

  test("quantile estimates: exact on singleton buckets, ≤10% rel above") {
    val vals = (1L to 200L) // p50=100, p90=180, p99=198
    val state = SketchState.quantileSketches(
      vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v")
    val r = SketchState.quantileRollup(state, Seq("g")).head()
    assert(r.getAs[Long]("n") == 200L)
    val (p50, p90, p99) = (r.getAs[Long]("p50"), r.getAs[Long]("p90"),
      r.getAs[Long]("p99"))
    Seq((p50, 100L), (p90, 180L), (p99, 198L)).foreach { case (est, t) =>
      assert(est <= t && t < est * 1.1 + 10,
        s"estimate $est out of bucket envelope for true $t")
    }
  }

  test("quantile merge ≡ rebuild; rollup from finer grain matches direct") {
    val df = (1L to 50L).map(v => ("g", (v % 3).toInt, v)).toDF("g", "part", "v")
    val merged = SketchState.mergeQuantileSketches(
      SketchState.quantileSketches(df.filter(col("v") <= 25), Seq("g"), "v"),
      SketchState.quantileSketches(df.filter(col("v") > 25), Seq("g"), "v"),
      Seq("g"))
    assertSameRows(merged, SketchState.quantileSketches(df, Seq("g"), "v"))
    // state built at (g, part), quantiles rolled to (g) ≡ built at (g)
    val fine = SketchState.quantileRollup(
      SketchState.quantileSketches(df, Seq("g", "part"), "v"), Seq("g"))
    val direct = SketchState.quantileRollup(
      SketchState.quantileSketches(df, Seq("g"), "v"), Seq("g"))
    assertSameRows(fine, direct)
  }

  test("quantile sketch rejects negative values loudly") {
    val e = intercept[Exception] {
      SketchState.quantileSketches(
        Seq(("g", -1L)).toDF("g", "v"), Seq("g"), "v").collect()
    }
    assert(e.getMessage != null)
  }

  // ---------------- bottom-k (KMV/AKMV) sample state ----------------

  /** 400 occurrences of 100 distinct items in group "x" (item i
    * appears i%7+1 times), plus a 3-distinct-item group "y".
    */
  private def kmvPlanted = {
    val x = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(("x", s"it$i")))
    val y = Seq(("y", "a"), ("y", "b"), ("y", "b"), ("y", "c"))
    (x ++ y).toDF("g", "v")
  }

  test("KMV state: k hash-smallest distinct items, exact counts, exact-mode below k") {
    val k = 16
    val st = SketchState.sampleSketches(kmvPlanted, Seq("g"), "v", k)
      .as[(String, String, Long, Long, Long)].collect()
    val x = st.filter(_._1 == "x")
    assert(x.length == k)
    // the kept set IS the k smallest hashes over the true distinct set
    val allKeys = SketchState.sampleSketches(
        kmvPlanted.filter(col("g") === "x"), Seq("g"), "v", 1000)
      .as[(String, String, Long, Long, Long)].collect()
    assert(allKeys.length == 100)
    val expect = allKeys.sortBy(r => (r._3, r._2)).take(k).map(_._2).toSet
    assert(x.map(_._2).toSet == expect)
    // counts exact: it_i appears i%7+1 times
    x.foreach { case (_, item, _, cnt, n) =>
      assert(cnt == item.drop(2).toInt % 7 + 1, s"$item count $cnt")
      assert(n == (1 to 100).map(_ % 7 + 1).sum, s"n_rows $n")
    }
    // group y has 3 < k distinct items: sample IS the distinct set
    val y = st.filter(_._1 == "y").sortBy(_._2)
    assert(y.map(r => (r._2, r._4)).toSeq == Seq(("a", 1L), ("b", 2L), ("c", 1L)))
  }

  test("KMV merge ≡ rebuild BIT-EXACTLY; occurrence-level split keeps counts exact") {
    val k = 16
    val withId = kmvPlanted.withColumn("i",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("g"), col("v"))))
    val direct = SketchState.sampleSketches(kmvPlanted, Seq("g"), "v", k)
    val merged = SketchState.mergeSampleSketches(
      SketchState.sampleSketches(withId.filter(col("i") % 2 === 0), Seq("g"), "v", k),
      SketchState.sampleSketches(withId.filter(col("i") % 2 === 1), Seq("g"), "v", k),
      Seq("g"), k)
    assertSameRows(merged, direct)
  }

  test("KMV rollup from windowed state ≡ direct build; estimator within 4·RSE") {
    val k = 64
    val ev = spark.range(0, 5000).select(
      (col("id") % 5).cast("int").as("w"),
      concat(lit("u"), (col("id") % 1997).cast("string")).as("v"))
      .localCheckpoint(true)
    val state = SketchState.sampleSketches(ev, Seq("w"), "v", k)
    val rolled = SketchState.sampleRollup(state, Seq(), k)
    val direct = SketchState.sampleSketches(ev.select("v"), Seq(), "v", k)
    assertSameRows(rolled, direct)
    // 1997 distinct values ≫ k: estimator mode, RSE ≈ 1/√(k−2)
    val est = SketchState.estimateDistinctKmv(state, Seq(), k)
      .select("est_distinct", "n_sample", "n_rows")
      .as[(Double, Long, Long)].head()
    assert(est._2 == k && est._3 == 5000L)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est._1 / 1997.0 - 1) <= 4 * rse,
      s"estimate ${est._1} vs true 1997 outside 4·RSE")
  }

  test("theta state: exactly the under-threshold slice of the distinct set, exact counts") {
    val theta = 0.5
    val st = SketchState.thetaSketches(kmvPlanted, Seq("g"), "v", theta)
      .select("g", "item", "hkey", "cnt")
    // ground truth: the FULL keyed distinct set (bottom-∞), filtered
    val full = SketchState.sampleSketches(kmvPlanted, Seq("g"), "v", 1000)
      .filter(col("hkey") < (theta * 1.152921504606846976e18).toLong)
      .select("g", "item", "hkey", "cnt")
    assertSameRows(st, full)
    assert(st.count() > 0)
  }

  test("sampleFromTheta: true bottom-k when enough rows, flagged incomplete otherwise") {
    val k = 8
    val state = SketchState.thetaSketches(kmvPlanted, Seq("g"), "v", 0.5)
      .withColumn("ws", lit(0)) // pretend windowed state
    val got = SketchState.sampleFromTheta(
      state.select("ws", "g", "item", "hkey", "cnt"), Seq("g"), k)
    // group x: 100 distinct, ~50 under θ=0.5 ≫ k → complete, and the
    // result is EXACTLY the unrestricted bottom-k
    val direct = SketchState.sampleSketches(
      kmvPlanted.filter(col("g") === "x"), Seq("g"), "v", k)
      .select("g", "item", "hkey", "cnt")
    assertSameRows(
      got.filter(col("g") === "x" && col("complete"))
        .select("g", "item", "hkey", "cnt"),
      direct)
    // group y: 3 distinct — fewer than k available → incomplete flag
    val y = got.filter(col("g") === "y").select("complete")
      .distinct().as[Boolean].collect().toSeq
    assert(y.forall(_ == false), s"y completeness: $y")
  }

  test("estimateDistinctTheta: |kept|/theta lands near the true distinct count") {
    val theta = 0.25
    val df = spark.range(0, 1997)
      .select(concat(lit("u"), col("id")).as("v"), lit("g").as("g"))
    val est = SketchState.estimateDistinctTheta(
      SketchState.thetaSketches(df, Seq("g"), "v", theta), Seq("g"), theta)
      .select("est_distinct", "n_kept").as[(Double, Long)].head()
    // RSE = sqrt((1-θ)/(θ·D)) ≈ 3.9% at θ=0.25, D=1997; allow 4·RSE
    val rse = math.sqrt((1 - theta) / (theta * 1997))
    assert(math.abs(est._1 / 1997.0 - 1) <= 4 * rse,
      s"estimate ${est._1} vs 1997 outside 4·RSE (kept ${est._2})")
  }

  test("jaccardFromSamples: exact below k, estimator near truth above, flags exact") {
    // three sets with known overlaps; k=1000 > all sizes ⇒ the combined
    // bottom-k IS the union and every estimate is EXACT
    val sets = (1 to 60).map(i => ("A", s"s$i")) ++
      (31 to 90).map(i => ("B", s"s$i")) ++
      (200 to 209).map(i => ("C", s"s$i"))
    val st = SketchState.sampleSketches(sets.toDF("g", "v"), Seq("g"), "v", 1000)
    val j = SketchState.jaccardFromSamples(st, "g", 1000)
      .select("ga", "gb", "jaccard_est", "union_est", "inter_est")
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // A∩B = {31..60} = 30, union 90 → J = 1/3
    assert(math.abs(j(("A", "B"))._1 - 30.0 / 90) < 1e-4)
    assert(j(("A", "B"))._2 == 90.0 && math.abs(j(("A", "B"))._3 - 30.0) < 0.01)
    // C is disjoint from both
    assert(j(("A", "C"))._1 == 0.0 && j(("B", "C"))._1 == 0.0)
    // estimator mode: two 2000-element sets sharing 1000 (J = 1/3) at k=256
    val big = (1 to 2000).map(i => ("X", s"e$i")) ++
      (1001 to 3000).map(i => ("Y", s"e$i"))
    val je = SketchState.jaccardFromSamples(
      SketchState.sampleSketches(big.toDF("g", "v"), Seq("g"), "v", 256),
      "g", 256)
      .select("jaccard_est", "union_est").as[(Double, Double)].head()
    assert(math.abs(je._1 - 1.0 / 3) <= 0.125, s"J est ${je._1}")
    assert(math.abs(je._2 / 3000 - 1) <= 0.25, s"union est ${je._2}")
  }

  test("KMV estimator exact fall-through below k sample rows") {
    val est = SketchState.estimateDistinctKmv(
      SketchState.sampleSketches(kmvPlanted, Seq("g"), "v", 256),
      Seq("g"), 256)
      .select("g", "est_distinct", "n_sample")
      .as[(String, Double, Long)].collect().sortBy(_._1)
    assert(est.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("x", 100.0, 100L), ("y", 3.0, 3L)))
  }
  test("estimateJoinSize: exact below k, unbiased-estimator mode near truth above") {
    // exact mode: tiny key spaces are complete samples
    val a = (1 to 10).flatMap(i => Seq.fill(i)(("k" + i)))
      .toDF("v") // key i has multiplicity i
    val b = (5 to 15).flatMap(i => Seq.fill(2)(("k" + i))).toDF("v")
    val sa = SketchState.sampleSketches(a, Seq(), "v", 64)
    val sb = SketchState.sampleSketches(b, Seq(), "v", 64)
    val exact = SketchState.estimateJoinSize(sa, sb, 64)
      .as[(Double, Long)].head()
    // truth: keys 5..10 match, sum i*2 = 2*(5+..+10) = 90
    assert(exact == ((90.0, 15L)))
    // estimator mode: 2000 shared keys, multiplicities 1 and 3,
    // sampled at k = 256 -> truth 6000, estimate within ~4 RSE
    val bigA = (1 to 2000).map(i => s"e$i").toDF("v")
    val bigB = (1 to 2000).flatMap(i => Seq.fill(3)(s"e$i")).toDF("v")
    val est = SketchState.estimateJoinSize(
      SketchState.sampleSketches(bigA, Seq(), "v", 256),
      SketchState.sampleSketches(bigB, Seq(), "v", 256), 256)
      .as[(Double, Long)].head()
    assert(est._2 == 256L)
    assert(math.abs(est._1 / 6000.0 - 1) <= 0.25, s"join est ${est._1}")
  }

  test("pairwise estimators refuse k above the declared build k") {
    val st = SketchState.sampleSketches(
      (1 to 50).map(i => ("g" + i % 2, "v" + i)).toDF("g", "v"),
      Seq("g"), "v", k = 16)
    val e1 = intercept[IllegalArgumentException] {
      SketchState.jaccardFromSamples(st, "g", k = 64, buildK = 16)
    }
    assert(e1.getMessage.contains("build k"))
    val e2 = intercept[IllegalArgumentException] {
      SketchState.estimateJoinSize(st, st, k = 64, buildK = 16)
    }
    assert(e2.getMessage.contains("build k"))
    // k <= build k passes
    SketchState.jaccardFromSamples(st, "g", k = 16, buildK = 16).collect()
  }

  /** groupBy — like the Window.partitionBy shapes the agg+join-back
    * rewrites replaced — treats a NULL group key as a real group; a
    * null-unsafe join-back would silently DROP that group's state.
    * These pin the null-safe (`<=>`) join contract across the tier.
    */
  private def nullGrouped: org.apache.spark.sql.DataFrame =
    (Seq.fill(5)((Option.empty[String], 1)) ++
      Seq.fill(3)((Option.empty[String], 2)) ++
      Seq.fill(2)((Option.empty[String], 3)) ++
      Seq((Option.empty[String], 4), (Some("a"), 9)))
      .toDF("g", "v")

  test("NULL group key is a real heavy-hitter group, not a dropped one") {
    // null group: 1×5, 2×3, 3×2, 4×1 (n=11); k=2 ⇒ t = 3rd-largest = 2
    val st = SketchState.heavyHitterSketches(nullGrouped, Seq("g"), "v", 2)
    assertSameRows(
      st.filter(col("g").isNull).select("item", "est", "n_rows"),
      Seq(("1", 3L, 11L), ("2", 1L, 11L)).toDF())
    // merge with a delta that has NO null group (the full_outer leg):
    // the null group's state and total must ride through unchanged
    val delta = SketchState.heavyHitterSketches(
      Seq((Some("a"), 9), (Some("a"), 8)).toDF("g", "v"), Seq("g"), "v", 2)
    val merged = SketchState.mergeHeavyHitters(st, delta, Seq("g"), 2)
    assertSameRows(
      merged.filter(col("g").isNull).select("item", "est", "n_rows"),
      Seq(("1", 3L, 11L), ("2", 1L, 11L)).toDF())
    // and the rollup join-back keeps it too
    val roll = SketchState.heavyHittersRollup(st, Seq("g"), 2)
    assert(roll.filter(col("g").isNull).count() == 2)
  }

  test("NULL group key survives the sample-state tier end to end") {
    val ss = SketchState.sampleSketches(nullGrouped, Seq("g"), "v", 64)
    assert(ss.filter(col("g").isNull).count() == 4) // all 4 items kept
    assert(ss.filter(col("g").isNull).select("n_rows")
      .distinct().as[Long].head() == 11L)
    val sr = SketchState.sampleRollup(ss, Seq("g"), 64)
    assert(sr.filter(col("g").isNull).count() == 4)
    val mg = SketchState.mergeSampleSketches(ss,
      SketchState.sampleSketches(
        Seq((Some("a"), 8)).toDF("g", "v"), Seq("g"), "v", 64),
      Seq("g"), 64)
    assert(mg.filter(col("g").isNull).count() == 4)
    // theta read path: the grain-sized avail join-back is null-safe too
    val theta = ss.select("g", "item", "hkey", "cnt")
    val got = SketchState.sampleFromTheta(theta, Seq("g"), 2)
    assert(got.filter(col("g").isNull).count() == 2)
    assert(got.filter(col("g").isNull).select("complete")
      .distinct().as[Boolean].head())
  }

  test("estimateJoinSize matches a NULL item across states instead of " +
      "double-counting it") {
    val aSt = Seq((Option("x"), Option(10L), 2L),
      (Option.empty[String], Option.empty[Long], 3L))
      .toDF("item", "hkey", "cnt")
    val bSt = Seq((Option("x"), Option(10L), 4L),
      (Option.empty[String], Option.empty[Long], 5L))
      .toDF("item", "hkey", "cnt")
    val est = SketchState.estimateJoinSize(aSt, bSt, k = 8)
    // 2 combined keys < k ⇒ the EXACT fall-through: Σ cA·cB = 2·4 + 3·5.
    // A null-unsafe union would see FOUR keys (null twice) and lose
    // the null key's 15 from the intersection product.
    assertSameRows(est, Seq((23.0, 2L)).toDF("join_size_est", "n_sample"))
  }

}
