package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.examples.TrainingDataJob
import graft.sources.Tables
import graft.streaming.TrainingStreaming

/** Streaming corpus curation: document drops drive incremental ticks;
  * the curated view (additions − retractions) must converge to the
  * batch pipeline's answer, and the state must survive a restart.
  */
class TrainingStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("redelivered batch converges: running the same tick twice changes nothing") {
    val docs = Tables.load(spark, sfDir, "documents")
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)
    val root = Files.createTempDirectory("retry").resolve("store").toString

    TrainingStreaming.tickBatch(spark, drop1, root, cfg)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    def snapshot() = TrainingStreaming.readCurated(spark, root)
      .select("doc_id", "pack_id", "pack_offset", "shard")
      .as[(Long, Long, Long, Long)].collect().toSet
    val once = snapshot()
    def lexical() = TrainingStreaming.readLexical(spark, root)
      .as[(Long, String, Long, Int)].collect().toSet
    val lexOnce = lexical()
    // at-least-once delivery: the same batch arrives again (crash
    // after state writes, before the checkpoint commit)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    assert(snapshot() == once,
      "a redelivered batch must not shift packs or duplicate rows")
    assert(lexical() == lexOnce,
      "a redelivered batch must not change the lexical postings")
    // the curated view equals the batch pipeline over everything
    val fullIds = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(snapshot().map(_._1) == fullIds)
    // the maintained postings equal a rebuild over the curated view
    assert(lexical() == graft.operators.TextAnalysis.lexicalIndex(
        TrainingStreaming.readCurated(spark, root), "doc_id", "text")
      .as[(Long, String, Long, Int)].collect().toSet)
  }

  test("mid-swap crash on docs/additions state is recovered at the next tick") {
    val docs = Tables.load(spark, sfDir, "documents")
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)
    val root = Files.createTempDirectory("midswap").resolve("store").toString
    TrainingStreaming.tickBatch(spark, drop1, root, cfg)
    // simulate a crash inside stageAndSwap's non-atomic window on the
    // two stores whose loss silently resets the pipeline: target
    // renamed to __old, staging never renamed in
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(s"$root/docs", s"$root/additions"))
      assert(fs.rename(new org.apache.hadoop.fs.Path(p),
        new org.apache.hadoop.fs.Path(p + "__old")))
    // next tick must recover the backups BEFORE reading state — else
    // it would see an empty store, writeFull the delta, and reset the
    // token bookmark (breaking shipped pack assignments)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    val streamIds = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    val fullIds = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(streamIds == fullIds,
      "state from before the crash must survive into the next tick")
  }

  test("readCurated during a swap window serves the backup WITHOUT mutating state") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0)
    val root = Files.createTempDirectory("midread").resolve("store").toString
    TrainingStreaming.tickBatch(spark, docs, root, cfg)
    val before = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    // a writer is inside its swap window on additions: target renamed
    // away, staging not yet in. A reader must see the full pre-swap
    // state AND must not rename anything back — restoring under a
    // live writer would orphan the writer's staging rename
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val adds = new org.apache.hadoop.fs.Path(s"$root/additions")
    val bak = new org.apache.hadoop.fs.Path(s"$root/additions__old")
    assert(fs.rename(adds, bak))
    val during = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(during == before, "reader must serve the pre-swap table")
    assert(fs.exists(bak) && !fs.exists(adds),
      "reader must NOT move state out from under a live writer")
    assert(fs.rename(bak, adds)) // writer completes; state intact
    assert(TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet == before)
  }

  test("readCurated on an untouched store is an empty frame, not an error") {
    val root = Files.createTempDirectory("fresh").resolve("store").toString
    val out = TrainingStreaming.readCurated(spark, root)
    assert(out.isEmpty && out.columns.toSeq == Seq("doc_id"))
  }

  test("raw PII never reaches the durable docs state") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
      .withColumn("text", concat(col("text"), lit(" ping spy@leak.io")))
    val root = Files.createTempDirectory("piistate").resolve("store").toString
    TrainingStreaming.tickBatch(spark, docs, root,
      TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
        defaultFraction = 1.0))
    val stored = spark.read.parquet(s"$root/docs")
      .select("text").as[String].collect()
    assert(stored.nonEmpty)
    assert(stored.forall(t => !t.contains("spy@leak.io") && t.contains("<EMAIL>")))
  }

  test("a delta doc bridging two shipped clusters retracts the demoted canonical") {
    // words w1..w30 with stopwords planted so the quality gate passes;
    // A=w1..20 and B=w11..30 share too few 3-gram shingles to be dups
    // of each other (J≈0.29), but C=w6..25 overlaps each at J≈0.57 —
    // at threshold 0.5, C bridges {A} and {B} into one cluster
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    val old = Seq((1L, txt(1, 20), "en"), (2L, txt(11, 30), "en"))
      .toDF("doc_id", "text", "lang")
    val delta = Seq((3L, txt(6, 25), "en")).toDF("doc_id", "text", "lang")
    val cfg = TrainingDataJob.Config(jaccardThreshold = 0.5,
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0)
    val root = Files.createTempDirectory("retract").resolve("store").toString

    TrainingStreaming.tickBatch(spark, old, root, cfg)
    val shipped1 = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(shipped1 == Set(1L, 2L), "both old docs are canonical at first")

    TrainingStreaming.tickBatch(spark, delta, root, cfg)
    val shipped2 = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    // merged cluster {1,2,3}: 1 stays canonical, 2 is RETRACTED, 3 is
    // a non-canonical addition that never ships
    assert(shipped2 == Set(1L), s"got $shipped2")
    assert(spark.read.parquet(s"$root/retractions")
      .as[Long].collect().toSet == Set(2L))
    // and that matches the batch pipeline over everything
    val fullIds = TrainingDataJob.run(old.unionByName(delta), cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(shipped2 == fullIds)
    // the retracted canonical's postings dropped out of the lexical
    // store with it — retrieval serves only what ships
    val lexDocs = TrainingStreaming.readLexical(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(lexDocs == Set(1L), s"lexical store tracks shipped docs, got $lexDocs")
  }

  test("lexical retraction survives a crash at either side of the lexical write") {
    // same bridge fixture as above. The clusters swap is the tick's
    // COMMIT POINT (last write), so the reachable crash windows leave
    // the clusters store at its pre-tick content while earlier writes
    // may or may not have landed. Redelivery then recomputes the same
    // non-empty retraction set from the un-swapped clusters and must
    // converge the lexical store — in both windows:
    //   (a) crash BEFORE the lexical write (lexical stale);
    //   (b) crash AFTER it (lexical already new — idempotent re-run).
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    val old = Seq((1L, txt(1, 20), "en"), (2L, txt(11, 30), "en"))
      .toDF("doc_id", "text", "lang")
    val delta = Seq((3L, txt(6, 25), "en")).toDF("doc_id", "text", "lang")
    val cfg = TrainingDataJob.Config(jaccardThreshold = 0.5,
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0)
    val conf = spark.sparkContext.hadoopConfiguration

    for (lexicalLanded <- Seq(false, true)) {
      val root = Files.createTempDirectory("lexcrash").resolve("store").toString
      TrainingStreaming.tickBatch(spark, old, root, cfg)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      val cluP = new org.apache.hadoop.fs.Path(s"$root/clusters")
      val lexP = new org.apache.hadoop.fs.Path(s"$root/lexical")
      val savedClu = new org.apache.hadoop.fs.Path(s"$root/clusters_pretick")
      val savedLex = new org.apache.hadoop.fs.Path(s"$root/lexical_pretick")
      assert(org.apache.hadoop.fs.FileUtil.copy(fs, cluP, fs, savedClu, false, conf))
      assert(org.apache.hadoop.fs.FileUtil.copy(fs, lexP, fs, savedLex, false, conf))

      TrainingStreaming.tickBatch(spark, delta, root, cfg)
      // simulate the crash: the clusters swap (the commit point) never
      // happened; the lexical write did or didn't, per window
      assert(fs.delete(cluP, true))
      assert(fs.rename(savedClu, cluP))
      if (!lexicalLanded) {
        assert(fs.delete(lexP, true))
        assert(fs.rename(savedLex, lexP))
      } else assert(fs.delete(savedLex, true))
      // at-least-once: the same batch arrives again
      TrainingStreaming.tickBatch(spark, delta, root, cfg)
      val lexDocs = TrainingStreaming.readLexical(spark, root)
        .select("doc_id").as[Long].collect().toSet
      assert(lexDocs == Set(1L),
        s"window lexicalLanded=$lexicalLanded must converge, got $lexDocs")
      val curated = TrainingStreaming.readCurated(spark, root)
        .select("doc_id").as[Long].collect().toSet
      assert(curated == Set(1L))
    }
  }

  test("a store root that predates the lexical dir backfills the full shipped history") {
    val docs = Tables.load(spark, sfDir, "documents")
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)
    val root = Files.createTempDirectory("lexbackfill").resolve("store").toString
    TrainingStreaming.tickBatch(spark, docs.filter(col("doc_id") < 200), root, cfg)
    // a deployment from before the lexical state dir existed
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/lexical"), true))
    TrainingStreaming.tickBatch(spark, docs.filter(col("doc_id") >= 200), root, cfg)
    // the next tick indexes the WHOLE shipped set, not just its batch
    val lex = TrainingStreaming.readLexical(spark, root)
      .as[(Long, String, Long, Int)].collect().toSet
    val rebuilt = graft.operators.TextAnalysis.lexicalIndex(
        TrainingStreaming.readCurated(spark, root), "doc_id", "text")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(lex == rebuilt, "backfill must cover every pre-upgrade doc")
  }

  test("vector index tracks the curated set; redelivery converges; rebuild parity") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("embedding", array((0 until 8).map(i =>
        sin(col("doc_id") * lit(0.37 * (i + 1)) + lit(i.toDouble))): _*))
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    // gate off (vectorMinRecall = 0): this test pins the pure
    // assignment path — the maintained index must equal a rebuild
    // under the SAME served model
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5, vectorCol = Some("embedding"),
      vectorCentroids = 8, vectorMinRecall = 0.0)
    val root = Files.createTempDirectory("vecstate").resolve("store").toString

    TrainingStreaming.tickBatch(spark, drop1, root, cfg)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    val (idx, cents) = TrainingStreaming.readVectors(spark, root).get
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Seq[Double], Int)].collect().toSet
    val once = rows(idx.select("nid", "cv", "cid"))
    // the index covers exactly the curated set
    val curatedIds = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(once.map(_._1) == curatedIds)
    // merge ≡ rebuild: assigning the curated vectors under the served
    // model reproduces the maintained rows bit-for-bit
    val curatedVecs = docs
      .join(TrainingStreaming.readCurated(spark, root).select("doc_id"),
        Seq("doc_id"))
      .select("doc_id", "embedding")
    val rebuilt = graft.operators.Similarity.ivfAssign(
      curatedVecs, "doc_id", "embedding", cents)
    assert(rows(rebuilt.select("nid", "cv", "cid")) == once)
    // at-least-once delivery: the same batch lands again
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    val (idx2, cents2) = TrainingStreaming.readVectors(spark, root).get
    assert(rows(idx2.select("nid", "cv", "cid")) == once,
      "a redelivered batch must not change the vector index")
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
  }

  test("streaming PCA rotation tracks the curated set; redelivery converges; serving parity") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("embedding", array((0 until 8).map(i =>
        sin(col("doc_id") * lit(0.41 * (i + 1)) + lit(i.toDouble))): _*))
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5, vectorCol = Some("embedding"),
      vectorCentroids = 8, vectorMinRecall = 0.0,
      vectorPcaComponents = 4)
    val root = Files.createTempDirectory("pcastate").resolve("store").toString

    TrainingStreaming.tickBatch(spark, drop1, root, cfg)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    val m = TrainingStreaming.readPcaModel(spark, root).get
    assert(m.k == 4 && m.mean.isEmpty, "uncentered 4-component rotation")

    // the maintained model is exactly a fit over the curated unit
    // vectors (pure function of curated state)
    val curatedVecs = docs
      .join(TrainingStreaming.readCurated(spark, root).select("doc_id"),
        Seq("doc_id"))
      .select(graft.functions.VectorFunctions.l2Normalize(col("embedding"))
        .as("uv"))
    val direct = graft.operators.Pca.fit(curatedVecs, "uv", k = 4,
      center = false)
    m.eigenvalues.zip(direct.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)))
    }
    m.axes.zip(direct.axes).foreach { case (ma, fa) =>
      assert(ma.zip(fa).map { case (x, y) => x * y }.sum > 1 - 1e-9)
    }

    // redelivery: same batch again → model unchanged (state reads
    // exclude the batch's own keys, so the refit sees the same set)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    val m2 = TrainingStreaming.readPcaModel(spark, root).get
    // the no-op is at STATE level (the refit sees the same curated
    // set); the refit's own aggregation combine order varies run to
    // run, so the rotation matches to ulp-scale tolerance, not ==
    m2.eigenvalues.zip(m.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)),
        "a redelivered batch must not move the eigenvalues")
    }
    m2.axes.zip(m.axes).foreach { case (a2, a1) =>
      assert(a2.zip(a1).map { case (x, y) => x * y }.sum > 1 - 1e-9,
        "a redelivered batch must not move the rotation")
    }

    // serving parity: reduced ANN from streaming state ≡ the same
    // composition over the curated set directly
    val (idx, _) = TrainingStreaming.readVectors(spark, root).get
    val queries = docs.limit(5).select(col("doc_id"), col("embedding"))
    val fromState = graft.operators.Similarity.pcaTopKFromIndex(
      graft.operators.Similarity.pcaIndex(
        idx.withColumnRenamed("nid", "doc_id"), "doc_id", "cv", m),
      m, queries, "doc_id", "embedding", k = 3, oversample = 1)
    val curated = docs.join(
        TrainingStreaming.readCurated(spark, root).select("doc_id"),
        Seq("doc_id"))
    val direct2 = graft.operators.Similarity.pcaTopKFromIndex(
      graft.operators.Similarity.pcaIndex(curated, "doc_id", "embedding", m),
      m, queries, "doc_id", "embedding", k = 3, oversample = 1)
    assertSameRows(fromState, direct2)
  }

  test("topic map tracks the curated set; redelivery converges; rebuild parity") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sfDir, "documents")
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5, topicCount = 4, topicBuckets = 64)
    val root = Files.createTempDirectory("topics").resolve("store").toString
    TrainingStreaming.tickBatch(spark, drop1, root, cfg)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    def served() = TrainingStreaming.readTopics(spark, root).get
      .as[(Int, Long, String, Int, Double)].collect().toSet
    val once = served()
    assert(once.nonEmpty)
    // maintained ≡ a direct corpusTopics rebuild over the curated set
    // (the delta-merged vectors are bit-identical to a fresh embed,
    // so the refit cannot drift)
    val direct = TextAnalysis.corpusTopics(
        TrainingStreaming.readCurated(spark, root), "doc_id", "text",
        nTopics = 4, topTerms = 5, buckets = 64)
      .as[(Int, Long, String, Int, Double)].collect().toSet
    assert(once == direct,
      s"maintained map drifted from rebuild: +${(once -- direct).take(3)} -${(direct -- once).take(3)}")
    // at-least-once: the same batch again must not change the map
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    assert(served() == once, "redelivery must be a no-op")
  }

  test("topic map backfills pre-existing curated docs when topicCount is enabled late") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sfDir, "documents")
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    val off = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)
    val on = off.copy(topicCount = 4, topicBuckets = 64)
    val root = Files.createTempDirectory("topicslate").resolve("store")
      .toString
    // tick 1 runs WITHOUT topics; tick 2 enables them on the existing
    // store root — the first topic tick must embed the full shipped
    // history, not just its own delta, or drop1's docs vanish from
    // the map (regression: delta-only first write)
    TrainingStreaming.tickBatch(spark, drop1, root, off)
    TrainingStreaming.tickBatch(spark, drop2, root, on)
    val served = TrainingStreaming.readTopics(spark, root).get
      .as[(Int, Long, String, Int, Double)].collect().toSet
    val direct = TextAnalysis.corpusTopics(
        TrainingStreaming.readCurated(spark, root), "doc_id", "text",
        nTopics = 4, topTerms = 5, buckets = 64)
      .as[(Int, Long, String, Int, Double)].collect().toSet
    assert(served == direct,
      s"late-enabled map must equal full rebuild: +${(served -- direct).take(3)} -${(direct -- served).take(3)}")
    // independent of rebuild parity: the map's doc mass must exceed
    // tick 2's own contribution — proof the history was embedded
    val topicMass = served.groupBy(_._1).map(_._2.head._2).sum
    assert(topicMass > drop2.count(),
      s"topic mass $topicMass covers only the delta — history not backfilled")
  }

  test("topic map drops a retracted doc's terms (bridge retraction fixture)") {
    import graft.operators.TextAnalysis
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    val old = Seq((1L, txt(1, 20), "en"), (2L, txt(11, 30), "en"))
      .toDF("doc_id", "text", "lang")
    val delta = Seq((3L, txt(6, 25), "en")).toDF("doc_id", "text", "lang")
    val cfg = TrainingDataJob.Config(jaccardThreshold = 0.5,
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0,
      topicCount = 2, topicBuckets = 64)
    val root = Files.createTempDirectory("topicsret").resolve("store").toString
    TrainingStreaming.tickBatch(spark, old, root, cfg)
    TrainingStreaming.tickBatch(spark, delta, root, cfg)
    // doc 2 was retracted (demoted canonical): the refit map must
    // equal a rebuild over exactly the curated survivors
    val served = TrainingStreaming.readTopics(spark, root).get
      .as[(Int, Long, String, Int, Double)].collect().toSet
    val direct = TextAnalysis.corpusTopics(
        TrainingStreaming.readCurated(spark, root), "doc_id", "text",
        nTopics = 2, topTerms = 5, buckets = 64)
      .as[(Int, Long, String, Int, Double)].collect().toSet
    assert(served == direct)
    assert(served.map(_._2).sum < 3 * 5,
      "retracted doc must not count toward topic sizes")
  }

  test("dsir counts track the curated set through retraction; redelivery is a no-op") {
    import graft.operators.Dsir
    // the bridge fixture: tick 2 retracts doc 2 (demoted canonical)
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    val old = Seq((1L, txt(1, 20), "en"), (2L, txt(11, 30), "en"))
      .toDF("doc_id", "text", "lang")
    val delta = Seq((3L, txt(6, 25), "en")).toDF("doc_id", "text", "lang")
    val cfg = TrainingDataJob.Config(jaccardThreshold = 0.5,
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0,
      dsirBuckets = 256)
    val root = Files.createTempDirectory("dsirstate").resolve("store").toString
    TrainingStreaming.tickBatch(spark, old, root, cfg)
    TrainingStreaming.tickBatch(spark, delta, root, cfg)
    def servedTotals() = TrainingStreaming.readDsirCounts(spark, root)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .as[(Long, Long)].collect().toMap
    // parity: the maintained counts ≡ a rebuild over exactly the
    // curated text (doc 2's grams must be gone with its retraction)
    val curated = TrainingStreaming.readCurated(spark, root)
      .select("doc_id", "text")
    assert(TrainingStreaming.readDsirCounts(spark, root)
      .select("doc_id").distinct().as[Long].collect().toSet == Set(1L))
    val rebuilt = Dsir.bucketCounts(curated, "text", 256)
      .as[(Long, Long)].collect().toMap
    assert(servedTotals() == rebuilt,
      "maintained counts must equal a rebuild over the curated set")
    // redelivery: the same delta again must not change the store
    TrainingStreaming.tickBatch(spark, delta, root, cfg)
    assert(servedTotals() == rebuilt, "redelivery must be a no-op")
    // and the servable model is exactly the from-scratch fit (fresh
    // frame: the tick above swapped the additions files out from
    // under the pre-tick plan)
    val curatedNow = TrainingStreaming.readCurated(spark, root)
      .select("doc_id", "text")
    // the bucket count comes from the store's own meta, not the caller
    assert(TrainingStreaming.readDsirBuckets(spark, root).contains(256))
    val target = Dsir.bucketCounts(curatedNow, "text", 256)
    val got = TrainingStreaming.readDsirModel(spark, root, target)
    val direct = Dsir.modelFromCounts(target, Dsir.bucketCounts(
      curatedNow, "text", 256), 256)
    assert(got.logRatio.toSeq == direct.logRatio.toSeq)
  }

  test("enabling dsirBuckets on a pre-dsir store backfills from the shipped history") {
    import graft.operators.Dsir
    def goodText(id: Long) =
      ((1 to 18).map(j => s"w${id}x$j") ++ Seq("the", "and")).mkString(" ")
    val plain = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0)
    val root = Files.createTempDirectory("dsirupg").resolve("store").toString
    TrainingStreaming.tickBatch(spark,
      (100L to 105L).map(id => (id, goodText(id), "en"))
        .toDF("doc_id", "text", "lang"), root, plain)
    // feature turned on later: the first dsir tick must cover every
    // previously shipped doc, not just its own batch
    TrainingStreaming.tickBatch(spark,
      Seq((200L, goodText(200L), "en")).toDF("doc_id", "text", "lang"),
      root, plain.copy(dsirBuckets = 128))
    val curated = TrainingStreaming.readCurated(spark, root)
      .select("doc_id", "text")
    val served = TrainingStreaming.readDsirCounts(spark, root)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .as[(Long, Long)].collect().toMap
    val rebuilt = Dsir.bucketCounts(curated, "text", 128)
      .as[(Long, Long)].collect().toMap
    assert(served == rebuilt, "backfill must equal a full rebuild")
  }

  test("changing dsirBuckets rebuilds the counts store in the new hash space") {
    import graft.operators.Dsir
    def goodText(id: Long) =
      ((1 to 18).map(j => s"w${id}x$j") ++ Seq("the", "and")).mkString(" ")
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0, dsirBuckets = 256)
    val root = Files.createTempDirectory("dsirrehash").resolve("store").toString
    TrainingStreaming.tickBatch(spark,
      (100L to 105L).map(id => (id, goodText(id), "en"))
        .toDF("doc_id", "text", "lang"), root, cfg)
    // re-tick under a different bucket count: the store must be
    // rebuilt whole in the new space, never merged across hash spaces
    TrainingStreaming.tickBatch(spark,
      Seq((200L, goodText(200L), "en")).toDF("doc_id", "text", "lang"),
      root, cfg.copy(dsirBuckets = 64))
    val served = TrainingStreaming.readDsirCounts(spark, root)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .as[(Long, Long)].collect().toMap
    assert(served.keys.forall(_ < 64), "every bucket lives in the new space")
    val rebuilt = Dsir.bucketCounts(
      TrainingStreaming.readCurated(spark, root).select("doc_id", "text"),
      "text", 64).as[(Long, Long)].collect().toMap
    assert(served == rebuilt, "rehash must equal a full rebuild at the new B")
  }

  test("a redelivered doc that fails the gate stays curated and stays indexed") {
    // replace-by-doc must key on ADDITIONS, not the whole batch: doc
    // 105 ships in tick 1, then is redelivered with degraded text
    // that fails the quality gate — it is neither re-shipped nor
    // retracted, so it stays curated under its tick-1 row and must
    // stay in the vector index (the lexical twin's rule)
    def goodText(id: Long) =
      ((1 to 18).map(j => s"w${id}x$j") ++ Seq("the", "and")).mkString(" ")
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", array(
        sin(col("doc_id") * lit(0.7)), cos(col("doc_id") * lit(1.3)),
        lit(0.5)))
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0, vectorCol = Some("embedding"),
      vectorCentroids = 2, vectorMinRecall = 0.0)
    val root = Files.createTempDirectory("vecregate").resolve("store").toString
    val tick1 = embed((100L to 110L).map(id => (id, goodText(id), "en"))
      .toDF("doc_id", "text", "lang"))
    TrainingStreaming.tickBatch(spark, tick1, root, cfg)
    // redeliver 105 degraded (fails the gate) + a fresh good doc
    val tick2 = embed(Seq((105L, "zz", "en"), (200L, goodText(200L), "en"))
      .toDF("doc_id", "text", "lang"))
    TrainingStreaming.tickBatch(spark, tick2, root, cfg)
    val curated = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(curated.contains(105L), "fixture: 105 must stay curated")
    val (idx, _) = TrainingStreaming.readVectors(spark, root).get
    assert(idx.select("nid").as[Long].collect().toSet == curated,
      "the vector index must track the curated set exactly")
  }

  test("enabling vectorCol on a pre-vectors store backfills without NPE; null vectors skip") {
    def goodText(id: Long) =
      ((1 to 18).map(j => s"w${id}x$j") ++ Seq("the", "and")).mkString(" ")
    val plainCfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0)
    val root = Files.createTempDirectory("vecupg").resolve("store").toString
    // two pre-vector ticks: no embedding column anywhere
    TrainingStreaming.tickBatch(spark,
      (100L to 105L).map(id => (id, goodText(id), "en"))
        .toDF("doc_id", "text", "lang"), root, plainCfg)
    // vectors on: the batch carries embeddings, one of them null
    val vecCfg = plainCfg.copy(vectorCol = Some("embedding"),
      vectorCentroids = 2, vectorMinRecall = 0.0)
    val batch = (200L to 203L).map(id => (id, goodText(id), "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("embedding",
        when(col("doc_id") === 203L, lit(null))
          .otherwise(array(sin(col("doc_id")), cos(col("doc_id")), lit(0.5))))
    TrainingStreaming.tickBatch(spark, batch, root, vecCfg)
    val (idx, _) = TrainingStreaming.readVectors(spark, root).get
    // pre-vector docs have no shipped vector (not dense-indexed until
    // re-shipped); the null-embedding doc is skipped, not an NPE
    assert(idx.select("nid").as[Long].collect().toSet == Set(200L, 201L, 202L))
    val curated = TrainingStreaming.readCurated(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(curated.contains(203L), "null-vector docs still ship as text")
  }

  test("vector drift trips a retrain; a stationary delta keeps the model") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    // texts: per-doc disjoint word sets (no shared shingles → no
    // dedup interference) with stopwords planted for the quality gate
    def syntheticText(id: Long) =
      ((1 to 18).map(j => s"w${id}x$j") ++ Seq("the", "and")).mkString(" ")
    // geometry from SimilaritySpec's drift test: trained = 4 tight
    // axis clusters; drifted = a ring in the unseen e4/e5 subspace
    // with a small pinned component (similarity independent of what
    // drives assignment — ring neighbors always land in OTHER cells)
    def trainedVec(id: Long): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.05f)
      v((id % 4).toInt) = 1f
      v
    }
    def driftedVec(id: Long): Array[Float] = {
      val v = Array.fill(dim)(0f)
      v((id % 4).toInt) = 0.1f
      val th = 2 * math.Pi * (id % 100) / 100.0
      v(4) = math.cos(th).toFloat
      v(5) = math.sin(th).toFloat
      v
    }
    val base = (100L until 400L).map(id =>
      (id, syntheticText(id), "en", trainedVec(id)))
      .toDF("doc_id", "text", "lang", "embedding")
    val statDelta = (400L until 500L).map(id =>
      (id, syntheticText(id), "en", trainedVec(id)))
      .toDF("doc_id", "text", "lang", "embedding")
    val driftDelta = (400L until 500L).map(id =>
      (id, syntheticText(id), "en", driftedVec(id)))
      .toDF("doc_id", "text", "lang", "embedding")
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 1.0, vectorCol = Some("embedding"),
      vectorCentroids = 12, vectorIters = 10, vectorProbe = 3,
      vectorMinRecall = 0.6, vectorDriftSample = 24)

    // stationary root: the second tick assigns under the tick-1 model
    val rootA = Files.createTempDirectory("vecstat").resolve("store").toString
    TrainingStreaming.tickBatch(spark, base, rootA, cfg)
    val m1 = TrainingStreaming.readVectors(spark, rootA).get._2
    TrainingStreaming.tickBatch(spark, statDelta, rootA, cfg)
    val m2 = TrainingStreaming.readVectors(spark, rootA).get._2
    assert(m2.map(_.toSeq).toSeq == m1.map(_.toSeq).toSeq,
      "a stationary delta must not retrain the model")

    // drifted root: the gate trips and the tick retrains
    val rootB = Files.createTempDirectory("vecdrift").resolve("store").toString
    TrainingStreaming.tickBatch(spark, base, rootB, cfg)
    val m1b = TrainingStreaming.readVectors(spark, rootB).get._2
    assert(m1b.map(_.toSeq).toSeq == m1.map(_.toSeq).toSeq,
      "training is deterministic across roots")
    TrainingStreaming.tickBatch(spark, driftDelta, rootB, cfg)
    val (idx3, m3) = TrainingStreaming.readVectors(spark, rootB).get
    assert(m3.map(_.toSeq).toSeq != m1.map(_.toSeq).toSeq,
      "a drifted delta must retrain the model")
    // retrain parity: the retrained state must be bit-identical to a
    // from-scratch assignment of the RAW shipped vectors under the
    // new model (regression: recycling the prior index's normalized
    // rows into training would re-normalize and drift low-order bits)
    val rawAll = base.unionByName(driftDelta).select("doc_id", "embedding")
    val rebuiltRows = graft.operators.Similarity.ivfAssign(
        rawAll, "doc_id", "embedding", m3)
      .select("nid", "cv", "cid").as[(Long, Seq[Double], Int)].collect().toSet
    val gotRows = idx3.select("nid", "cv", "cid")
      .as[(Long, Seq[Double], Int)].collect().toSet
    assert(gotRows == rebuiltRows,
      "retrained index must equal the raw rebuild bit-for-bit")
    // the loop closes: the retrained serving state passes the same
    // gate on the same drifted probes
    val idx3c = idx3.localCheckpoint(true)
    val curatedVecs = idx3c.select(col("nid").as("doc_id"), col("cv"))
    val probes = curatedVecs.filter(col("doc_id") >= 400)
    val after = graft.operators.Similarity.indexDriftGate(
        curatedVecs, probes, "doc_id", "cv",
        k = 5, minRecall = 0.6, sampleN = 24) { q =>
      graft.operators.Similarity.ivfTopKFromIndex(idx3c, m3, q,
        "doc_id", "cv", k = 5, nProbe = 3)
    }.head()
    assert(!after.getAs[Boolean]("stale"),
      s"retrain must restore recall (got ${after.getAs[Double]("recall")})")
  }

  test("vector state converges across the reachable crash windows") {
    // bridge fixture (see the retraction test): tick 2 both ships a
    // doc and RETRACTS a demoted canonical. The clusters swap is the
    // commit point, so the reachable windows leave clusters pre-tick
    // while the vectors write did (true) or didn't (false) land —
    // redelivery must converge the vector store either way.
    val w = (1 to 30).map {
      case 11 => "the"
      case 15 => "and"
      case i => s"w$i"
    }
    def txt(lo: Int, hi: Int) = w.slice(lo - 1, hi).mkString(" ")
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding", array(
        sin(col("doc_id") * lit(0.7)), cos(col("doc_id") * lit(1.3)),
        lit(0.5)))
    val old = embed(Seq((1L, txt(1, 20), "en"), (2L, txt(11, 30), "en"))
      .toDF("doc_id", "text", "lang"))
    val delta = embed(Seq((3L, txt(6, 25), "en")).toDF("doc_id", "text", "lang"))
    val cfg = TrainingDataJob.Config(jaccardThreshold = 0.5,
      langFractions = Map("en" -> 1.0), defaultFraction = 1.0,
      vectorCol = Some("embedding"), vectorCentroids = 2,
      vectorMinRecall = 0.0)
    val conf = spark.sparkContext.hadoopConfiguration

    for (vectorsLanded <- Seq(false, true)) {
      val root = Files.createTempDirectory("veccrash").resolve("store").toString
      TrainingStreaming.tickBatch(spark, old, root, cfg)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      val cluP = new org.apache.hadoop.fs.Path(s"$root/clusters")
      val vecP = new org.apache.hadoop.fs.Path(s"$root/vectors")
      val savedClu = new org.apache.hadoop.fs.Path(s"$root/clusters_pretick")
      val savedVec = new org.apache.hadoop.fs.Path(s"$root/vectors_pretick")
      assert(org.apache.hadoop.fs.FileUtil.copy(fs, cluP, fs, savedClu, false, conf))
      assert(org.apache.hadoop.fs.FileUtil.copy(fs, vecP, fs, savedVec, false, conf))

      TrainingStreaming.tickBatch(spark, delta, root, cfg)
      // crash: the commit point (clusters swap) never happened
      assert(fs.delete(cluP, true))
      assert(fs.rename(savedClu, cluP))
      if (!vectorsLanded) {
        assert(fs.delete(vecP, true))
        assert(fs.rename(savedVec, vecP))
      } else assert(fs.delete(savedVec, true))

      // redelivery converges: canonical 1 stays, demoted 2 drops out,
      // non-canonical 3 never enters
      TrainingStreaming.tickBatch(spark, delta, root, cfg)
      val (idx, _) = TrainingStreaming.readVectors(spark, root).get
      assert(idx.select("nid").as[Long].collect().toSet == Set(1L),
        s"window vectorsLanded=$vectorsLanded must converge to the shipped set")
    }

    // and a mid-swap crash on the vectors dir itself: the backup is
    // served read-only, then the next tick's recovery restores it
    val root = Files.createTempDirectory("vecmidswap").resolve("store").toString
    TrainingStreaming.tickBatch(spark, old, root, cfg)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val vecP = new org.apache.hadoop.fs.Path(s"$root/vectors")
    val vecOld = new org.apache.hadoop.fs.Path(s"$root/vectors__old")
    assert(fs.rename(vecP, vecOld))
    val (served, _) = TrainingStreaming.readVectors(spark, root).get
    assert(served.select("nid").as[Long].collect().toSet == Set(1L, 2L),
      "the backup serves during the swap window")
    assert(!fs.exists(vecP), "a reader must not mutate the swap window")
    TrainingStreaming.tickBatch(spark, delta, root, cfg)
    val (recovered, _) = TrainingStreaming.readVectors(spark, root).get
    assert(recovered.select("nid").as[Long].collect().toSet == Set(1L))
  }

  test("two drops converge to the batch run; restart resumes from checkpoint") {
    val docs = Tables.load(spark, sfDir, "documents")
    val drop1 = docs.filter(col("doc_id") < 300)
    val drop2 = docs.filter(col("doc_id") >= 300)
    val cfg = TrainingDataJob.Config(langFractions = Map("en" -> 1.0),
      defaultFraction = 0.5)

    val root = Files.createTempDirectory("curation")
    val dropDir = root.resolve("drops").toString
    Files.createDirectories(root.resolve("drops"))
    val storeRoot = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    val schema = docs.schema

    def startQuery() =
      TrainingStreaming.curationTicks(
          spark.readStream.schema(schema).parquet(dropDir),
          storeRoot, cfg)
        .option("checkpointLocation", ckpt)
        .start()

    drop1.write.mode("append").parquet(dropDir)
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      // after drop 1 the curated view is exactly the batch run on it
      val batchIds = TrainingDataJob.run(drop1, cfg)
        .select("doc_id").as[Long].collect().toSet
      val streamIds = TrainingStreaming.readCurated(spark, storeRoot)
        .select("doc_id").as[Long].collect().toSet
      assert(streamIds == batchIds)
    } finally q1.stop() // simulated crash/redeploy boundary

    drop2.write.mode("append").parquet(dropDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val replayed = q2.recentProgress.map(_.numInputRows).sum
      assert(replayed == drop2.count(),
        s"restart must resume from the checkpoint: read $replayed rows")
      // curated view ≡ full batch pipeline over everything (the tick
      // equivalence, now carried through streaming state)
      val fullIds = TrainingDataJob.run(docs, cfg)
        .select("doc_id").as[Long].collect().toSet
      val streamIds = TrainingStreaming.readCurated(spark, storeRoot)
        .select("doc_id").as[Long].collect().toSet
      assert(streamIds == fullIds)
      // additions carry the full output schema (packs, shards, features)
      val cols = TrainingStreaming.readCurated(spark, storeRoot).columns.toSet
      assert(Set("pack_id", "pack_offset", "shard", "shuffle_key",
        "md5_exact", "n_tokens").subsetOf(cols), cols.toString)
    } finally q2.stop()
  }
}
