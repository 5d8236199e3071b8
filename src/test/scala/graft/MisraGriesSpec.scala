package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.operators.TextAnalysis

/** Misra–Gries heavy hitters: the sketch's superset/undercount
  * guarantees under adversarial merge trees, and the exact-rerank
  * operator's equality with brute force.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def bruteHeavy(items: Seq[String], bp: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 10000L > bp.toLong * n }.toMap
  }

  test("sketch guarantees hold under adversarial merge trees") {
    // Zipf-ish stream: item i appears ~1000/i times, plus 2000 singletons
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"h$i")) ++
        (1 to 2000).map(i => s"noise$i"))
    val n = stream.size.toLong
    val k = 50
    val agg = MisraGriesAggregator.misraGries(k)

    // three merge shapes: single fold, balanced binary tree over 16
    // chunks, and a skewed left fold of uneven chunks
    val single = stream.foldLeft(agg.zero)(agg.reduce)
    def sketchOf(chunk: Seq[String]) = chunk.foldLeft(agg.zero)(agg.reduce)
    val chunks16 = stream.grouped((stream.size + 15) / 16).map(sketchOf).toSeq
    val tree = chunks16.reduce(agg.merge)
    val uneven = Seq(stream.take(7), stream.slice(7, 500),
      stream.slice(500, 501), stream.drop(501)).map(sketchOf)
      .foldLeft(agg.zero)(agg.merge)

    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((name, sk) <- Seq("single" -> single, "tree" -> tree,
        "uneven" -> uneven)) {
      val ests = sk.counts
      assert(ests.size <= k, s"$name: more than k counters")
      ests.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t, s"$name: $item overestimated ($est > $t)")
        assert(t - est <= n / (k + 1),
          s"$name: $item undercount ${t - est} > N/(k+1)=${n / (k + 1)}")
      }
      // superset: every item with true count > N/(k+1) survives
      exact.filter(_._2 > n / (k + 1)).keys.foreach { item =>
        assert(ests.contains(item), s"$name: heavy item $item evicted")
      }
    }
  }

  test("heavyItems equals brute force with k far below the cardinality") {
    val rnd = new scala.util.Random(3)
    // 500 distinct items, heavy head: item i drawn with weight 1/i
    val items = (1 to 20000).map { _ =>
      val i = math.min(500, (1.0 / (rnd.nextDouble() + 1e-9)).toInt + 1)
      s"item$i"
    }
    for (bp <- Seq(100, 250)) {
      val k = (10000 / bp) * 2 // comfortably above the minimum
      val got = TextAnalysis.heavyItems(items.toDF("it"), "it", k, bp)
        .select("it", "n_occ").as[(String, Long)].collect().toMap
      assert(got == bruteHeavy(items, bp), s"bp=$bp mismatch")
    }
  }

  test("heavyNgrams: crafted corpus, exact set and counts") {
    // "a b" appears 5 times (50% of 10 bigrams) — the only heavy one
    // at 30%; short docs are dropped before gram extraction
    val docs = Seq(
      "a b c a b", // bigrams: a-b, b-c, c-a, a-b
      "a b x a b", // a-b, b-x, x-a, a-b
      "a b",       // a-b
      "z",         // too short: no bigrams
      "q r"        // q-r
    ).toDF("text")
    val got = TextAnalysis.heavyNgrams(docs, "text", n = 2, k = 40,
        minFreqBp = 3000)
      .select("gram", "n_occ", "n_total").as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("a b", 5L, 10L)))
  }

  test("guard rails: threshold below the sketch guarantee is rejected") {
    val df = Seq("x").toDF("it")
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyItems(df, "it", k = 10, minFreqBp = 100)
    }
    // empty input: empty result, schema intact
    val out = TextAnalysis.heavyItems(df.limit(0), "it", 99, 100)
    assert(out.columns.toSeq == Seq("it", "n_occ", "n_total"))
    assert(out.count() == 0)
  }
}
