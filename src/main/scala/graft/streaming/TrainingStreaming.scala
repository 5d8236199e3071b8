package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import graft.examples.TrainingDataJob
import graft.sources.AnalysisStore

/** The training-data pipeline as a CONTINUOUS dataflow: document
  * drops (a crawl landing new files) drive [[TrainingDataJob.tick]]
  * per micro-batch, maintaining the curated corpus and the tick's
  * prior state (raw corpus, clustering, token bookmark) in the
  * analysis store across batches and restarts.
  *
  * Delivery contract: the engine's checkpoint gives at-least-once
  * batch delivery, and a re-delivered batch CONVERGES because every
  * state read excludes the batch's own keys before composing the
  * tick — the docs store and the bookmark are read "as of before this
  * batch" even when a crashed attempt already wrote part of it — and
  * every state write merges BY KEY ([[AnalysisStore
  * .writeIncremental]] on doc_id). The clustering swaps through
  * staging+backup with read-side recovery, so neither a half-written
  * new state nor a mid-swap crash can feed the retry a wrong prior.
  *
  * The token bookmark is re-derived from the additions table (one
  * columnar sum over a single long column) rather than kept as a
  * mutable scalar: a scalar file can go stale when a crashed batch
  * retries, the store cannot. A 100 TB deployment that finds the sum
  * too hot keeps (batchId → bookmark) in the store and reads the max
  * — same idempotence, O(ticks) rows.
  *
  * PII: the docs state persists the REDACTED text (redaction is
  * idempotent), so the run()-level promise — nothing downstream of
  * stage 0 ever sees a raw email/IP/phone — holds for durable
  * streaming state too.
  */
object TrainingStreaming {

  private def docsPath(root: String) = s"$root/docs"
  private def clustersPath(root: String) = s"$root/clusters"
  private def addsPath(root: String) = s"$root/additions"
  private def retractsPath(root: String) = s"$root/retractions"
  private def lexicalPath(root: String) = s"$root/lexical"
  private def vectorsPath(root: String) = s"$root/vectors"
  private def dsirPath(root: String) = s"$root/dsir"
  private def topicVecsPath(root: String) = s"$root/topicvecs"
  private def topicsPath(root: String) = s"$root/topics"

  /** The path's OWN filesystem — state roots need not live on the
    * cluster's fs.defaultFS.
    */
  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fsOf(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  private def emptyClusters(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("cluster_id", LongType))))

  /** Recover EVERY state dir if a previous attempt crashed mid-swap:
    * stageAndSwap's only non-atomic window leaves a target renamed
    * away to `__old` with the staging not yet renamed in. Without
    * restoring the backup before the exists() reads below, the retry
    * would treat that state as absent — for docs/additions that means
    * writeIncremental falls back to writeFull(delta), permanently
    * replacing all prior corpus state and resetting the token
    * bookmark. [[AnalysisStore.recover]] also runs inside every
    * incremental write, but the tick READS state before it writes, so
    * recovery must happen first.
    */
  private def recoverState(spark: SparkSession, root: String): Unit =
    Seq(docsPath(root), clustersPath(root), addsPath(root),
      retractsPath(root), lexicalPath(root), vectorsPath(root),
      dsirPath(root))
      .foreach(AnalysisStore.recover(spark, _))

  /** One curation tick over a batch of new docs, against (and
    * updating) the state rooted at `storeRoot`. Exposed for batch
    * callers and tests; [[curationTicks]] wires it to a stream.
    */
  def tickBatch(spark: SparkSession, rawBatch: DataFrame, storeRoot: String,
      config: TrainingDataJob.Config,
      evalSet: Option[DataFrame] = None): Unit = {
    // ONE source read: the tick references the batch from many plan
    // branches (gate, index union, joins, the docs-store merge), and
    // an un-materialized foreachBatch frame re-reads the stream
    // source per action — measured 13-14 re-reads per tick
    val batch = TrainingDataJob.redact(rawBatch, config).localCheckpoint(true)
    if (batch.isEmpty) return
    val batchIds = batch.select("doc_id")
    recoverState(spark, storeRoot)
    // state "as of before this batch": a crashed attempt may have
    // already merged this batch into docs/additions — excluding the
    // batch's own keys makes the retry read what the first attempt
    // read, so the tick (and the bookmark) recompute identically
    val old =
      if (exists(spark, docsPath(storeRoot)))
        spark.read.parquet(docsPath(storeRoot))
          .join(batchIds, Seq("doc_id"), "left_anti")
      else batch.limit(0)
    val priorClusters =
      if (exists(spark, clustersPath(storeRoot)))
        spark.read.parquet(clustersPath(storeRoot))
          .join(batchIds, Seq("doc_id"), "left_anti")
      else emptyClusters(spark)
    val bookmark =
      if (exists(spark, addsPath(storeRoot))) {
        val r = spark.read.parquet(addsPath(storeRoot))
          .join(batchIds, Seq("doc_id"), "left_anti")
          .agg(sum(col("n_tokens").cast("long"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } else 0L

    val r = TrainingDataJob.tick(old, priorClusters, bookmark, batch,
      config, evalSet)
    // materialize EVERY tick output before any state write: their
    // plans read the docs/clusters store files this method is about
    // to swap out from under them
    val additions = r.additions.localCheckpoint(true)
    val retracted = r.retractedIds.localCheckpoint(true)
    val clusters = r.clusters.localCheckpoint(true)
    // additions/retractions/docs merge BY KEY → batch retries converge
    AnalysisStore.writeIncremental(spark, additions,
      addsPath(storeRoot), keys = Seq("doc_id"))
    if (!retracted.isEmpty)
      AnalysisStore.writeIncremental(spark, retracted,
        retractsPath(storeRoot), keys = Seq("doc_id"))
    AnalysisStore.writeIncremental(spark, batch,
      docsPath(storeRoot), keys = Seq("doc_id"))
    // the serving-layer lexical (BM25) postings track the curated set
    // (additions minus retractions), maintained as ONE staged write:
    // fold the batch's shipped docs in replace-by-doc, then anti-join
    // the CUMULATIVE retractions store — never only this tick's
    // recomputed `retracted`, which a redelivered batch may recompute
    // differently once state has moved. One staged write also halves
    // the write amplification of the old merge-then-remove pair and
    // closes its serve-merged-but-not-yet-retracted interval. A store
    // root that predates the lexical dir backfills from the additions
    // store (the full shipped history, re-tokenized once), not just
    // this batch.
    //
    // ORDERING: this write must precede the clusters swap below. The
    // swap is the tick's commit point — every state read above
    // excludes the batch's keys, so a redelivery that crashed
    // ANYWHERE before the swap recomputes the identical (non-empty)
    // additions/retracted and re-runs this idempotent write; once the
    // swap has landed, the lexical store already has too. Were this
    // write to follow the swap, a crash between them would strand a
    // stale lexical store forever: the retry would recompute
    // additions = retracted = ∅ (priorClusters already reflects the
    // merge) and the guard below would skip the rewrite.
    val lexP = lexicalPath(storeRoot)
    if (!additions.isEmpty || !retracted.isEmpty || !exists(spark, lexP)) {
      val merged =
        if (exists(spark, lexP))
          graft.operators.TextAnalysis.mergeLexicalIndex(
            spark.read.parquet(lexP), additions, "doc_id", "text")
        else
          graft.operators.TextAnalysis.lexicalIndex(
            spark.read.parquet(addsPath(storeRoot)), "doc_id", "text")
      val lexTarget = readablePath(spark, retractsPath(storeRoot)) match {
        case Some(rp) => graft.operators.TextAnalysis.removeLexicalDocs(
          merged, spark.read.parquet(rp))
        case None => merged
      }
      val lexDir = new org.apache.hadoop.fs.Path(lexP)
      val lexFs = fsOf(spark, lexP)
      if (!lexFs.exists(lexDir)) lexFs.mkdirs(lexDir)
      AnalysisStore.stageAndSwap(spark, lexP) { staging =>
        lexTarget.write.parquet(staging)
      }
    }
    // the DSIR raw-side counts are the selection model's half of the
    // serving state: same curated-set contract and commit-point
    // ordering as the lexical postings, kept DOC-KEYED ((doc_id,
    // bucket, cnt)) on purpose — a redelivered batch REPLACES its
    // docs' rows instead of double-adding an aggregate delta, and a
    // retraction subtracts by key instead of trusting a recomputed
    // negative. Model-sized to serve: the fit groups to ≤ B rows.
    if (config.dsirBuckets > 0) {
      val dsirP = dsirPath(storeRoot)
      val b = config.dsirBuckets
      // the bucket count is part of the store's identity: counts
      // hashed mod B and mod B' share a 'bucket' column but not a
      // feature space, so a config change must REBUILD from the
      // shipped history (the pre-dsir backfill path — convergent),
      // never merge two hash spaces. Meta rides INSIDE the swapped
      // dir, so counts and their bucket count can't tear.
      // the meta-exists guard also covers a dir mkdirs'd by a crashed
      // first tick that never reached its swap (empty target dir)
      val compatible = exists(spark, s"$dsirP/meta") &&
        spark.read.parquet(s"$dsirP/meta").head().getInt(0) == b
      if (!additions.isEmpty || !retracted.isEmpty || !compatible) {
        val merged =
          if (compatible)
            spark.read.parquet(s"$dsirP/counts")
              .join(additions.select("doc_id"), Seq("doc_id"), "left_anti")
              .unionByName(graft.operators.Dsir.docBucketCounts(
                additions, "doc_id", "text", b))
          else graft.operators.Dsir.docBucketCounts(
            spark.read.parquet(addsPath(storeRoot)), "doc_id", "text", b)
        val dsirTarget = readablePath(spark, retractsPath(storeRoot)) match {
          case Some(rp) => merged.join(
            spark.read.parquet(rp).select("doc_id"),
            Seq("doc_id"), "left_anti")
          case None => merged
        }
        val dDir = new org.apache.hadoop.fs.Path(dsirP)
        val dFs = fsOf(spark, dsirP)
        if (!dFs.exists(dDir)) dFs.mkdirs(dDir)
        AnalysisStore.stageAndSwap(spark, dsirP) { staging =>
          dsirTarget.write.parquet(s"$staging/counts")
          import spark.implicits._
          Seq(b).toDF("buckets").write.parquet(s"$staging/meta")
        }
      }
    }
    // the topic map is the third serving-state sibling: per-doc
    // hashed vectors merge DELTA-ONLY (hashEmbed is doc-local — the
    // one expensive narrow pass never re-reads history), then the
    // (topic, n_docs, term, rank, score) table refits as a pure
    // function of the curated set — retry-convergent by construction
    // — under the same commit-point ordering as the lexical write
    if (config.topicCount > 0)
      maintainTopics(spark, storeRoot, additions, retracted, config)
    // the dense-vector (IVF) serving index is the lexical store's
    // twin: same curated-set contract (fold the shipped docs in,
    // anti-join the cumulative retractions store), same commit-point
    // ordering (written before the clusters swap, so every reachable
    // crash window replays the identical idempotent write), plus the
    // model lifecycle the lexical path doesn't need — cell centroids
    // are TRAINED state, so the tick gates the old model's recall on
    // the delta it just assigned and retrains when drift trips it.
    config.vectorCol.foreach { vc =>
      require(batch.columns.contains(vc),
        s"Config.vectorCol '$vc' is not a column of the incoming batch")
      maintainVectorIndex(spark, storeRoot, additions, retracted, vc, config)
    }
    // the clustering is replaced whole (two long columns over quality
    // docs) via stage-and-swap — an empty dir is pre-created on the
    // first tick so the swap (and its crash recovery above) covers
    // every tick the same way. LAST on purpose: see the ordering note
    // on the lexical write.
    val cp = new org.apache.hadoop.fs.Path(clustersPath(storeRoot))
    val fs = fsOf(spark, clustersPath(storeRoot))
    if (!fs.exists(cp)) fs.mkdirs(cp)
    AnalysisStore.stageAndSwap(spark, clustersPath(storeRoot)) { staging =>
      clusters.write.parquet(staging)
    }
  }

  /** Wire a documents stream (e.g. `readStream.schema(s).parquet(dir)`
    * over a drop directory) into continuously-maintained curation
    * state. Caller attaches trigger/checkpoint options and starts it.
    */
  def curationTicks(docsStream: DataFrame, storeRoot: String,
      config: TrainingDataJob.Config = TrainingDataJob.Config(),
      evalSet: Option[DataFrame] = None): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        tickBatch(batch.sparkSession, batch, storeRoot, config, evalSet)
    }

  /** The curated corpus as of now: additions minus retractions. An
    * untouched store (no non-empty batch yet) reads as an empty
    * doc_id frame rather than a PATH_NOT_FOUND error, so monitors can
    * poll from startup.
    */
  /** Where to read a state table RIGHT NOW: the target if present,
    * else its `__old` backup. A missing target with a live backup is
    * EITHER a mid-swap crash or a concurrent writer inside its swap
    * window — a reader cannot tell which, so it must NOT mutate
    * (renaming the backup back under a live writer would orphan the
    * writer's staging rename). Reading the backup is always safe:
    * it is the complete pre-swap table either way. Actual recovery
    * (the rename) stays with the WRITER path — the next tick.
    */
  private def readablePath(spark: SparkSession, p: String): Option[String] =
    if (exists(spark, p)) Some(p)
    else if (exists(spark, p + "__old")) Some(p + "__old")
    else None

  /** Maintain the curated set's IVF vector index under `storeRoot/
    * vectors` — index rows (doc_id, cv, cid) in `vectors/index` and
    * the centroid model in `vectors/model`, written in ONE staged
    * swap so a serving layer can never read an index against the
    * wrong model.
    *
    * Model lifecycle: the first vector-carrying tick trains the
    * cells; later ticks ASSIGN their shipped vectors under the
    * persisted model (a narrow delta-sized pass) and gate the result
    * with [[Similarity.indexDriftGate]] — sampled recall of the
    * post-assignment serving path vs brute force over the curated
    * vectors. A tripped gate retrains the cells and re-assigns
    * everything (the amortized cost a retrain decision pays; a 100 TB
    * deployment that finds the per-tick brute sample too hot runs the
    * gate every Nth tick — the write path is identical).
    *
    * Replace-by-doc is keyed on the tick's ADDITIONS, not the whole
    * batch (the lexical twin's rule): a redelivered doc that fails
    * this tick's gate without being retracted stays curated under its
    * originally shipped row, so it must stay indexed too. Every
    * retrain/gate-reference input is the RAW curated vector set read
    * from the additions store (the shipped snapshot — rows whose
    * shipped version carries no vector, including every pre-vectors
    * row, simply aren't dense-indexed until re-shipped); prior INDEX
    * rows are already normalized by `ivfAssign` and are reused only
    * on the assignment-only path, never re-fed to training — feeding
    * them back would re-normalize (bit drift) and break the
    * maintained-equals-rebuilt-from-raw parity the spec pins. A
    * pre-vectors store root backfills implicitly: its first
    * vector-carrying tick finds no index and trains on the full raw
    * curated set.
    *
    * Retry contract: all state reads exclude the tick's own addition
    * keys and the retraction filter uses the CUMULATIVE retractions
    * store, so a redelivered batch recomputes byte-identical state
    * (training is deterministic end-to-end).
    */
  /** Per-tick topic-map maintenance: the curated corpus's topic
    * cartography as durable state.
    *
    *  - `topicvecs`: per-doc hashed document vectors
    *    ([[graft.operators.TextAnalysis.hashEmbedDense]] layout),
    *    merged replace-by-doc with only THIS tick's additions
    *    embedded — the tokenize+hash pass is doc-local, so history
    *    never re-embeds. Exception: a store root that predates the
    *    topicvecs dir backfills by embedding the FULL additions
    *    store once (the lexical/dsir rule), so enabling topicCount
    *    on an existing corpus — or losing the vecs dir — cannot
    *    silently shrink the map to recent ticks. A re-shipped doc
    *    whose new text tokenizes
    *    to nothing correctly LOSES its row (the merge drops all
    *    addition keys first), matching what a from-scratch embed of
    *    the curated set would produce.
    *  - `topics`: the (topic, n_docs, term, rank, score) table,
    *    refit each tick from (stored vecs, curated docs) via
    *    [[graft.operators.TextAnalysis.corpusTopicsFromVecs]] — a
    *    pure function of the curated set (crash + redelivery
    *    recompute the identical table), swapped whole like the
    *    lexical store. The TF-IDF term pass is corpus-scale per tick
    *    by necessity (document frequencies are global); k-means
    *    training collects only its model-sized sample.
    *
    * Maintained ≡ direct [[graft.operators.TextAnalysis
    * .corpusTopics]] rebuild over [[readCurated]] (spec-pinned),
    * because the stored vectors are bit-identical to what the
    * rebuild would embed.
    */
  private def maintainTopics(
      spark: SparkSession, storeRoot: String,
      additions: DataFrame, retracted: DataFrame,
      config: TrainingDataJob.Config): Unit = {
    import graft.operators.TextAnalysis
    val tvP = topicVecsPath(storeRoot)
    val tmP = topicsPath(storeRoot)
    val have = exists(spark, tmP)
    if (additions.isEmpty && retracted.isEmpty && have) return
    val addIds = additions.select("doc_id").localCheckpoint(true)
    // 1. delta-only embedding, merged replace-by-doc (addition keys
    // dropped first so a doc re-shipped without tokens loses its row)
    val deltaVecs = TextAnalysis.hashEmbedDense(
      additions, "doc_id", "text", config.topicBuckets)
      .localCheckpoint(true)
    AnalysisStore.recover(spark, tvP)
    if (!exists(spark, tvP)) {
      // backfill, not delta: a store root that predates the topicvecs
      // dir (topicCount enabled later, or the dir lost) already holds
      // curated docs in the additions store — embed the FULL shipped
      // history (the lexical/dsir backfill rule), not just this
      // tick's additions, or the refit map would silently exclude
      // every pre-existing doc. The additions store has already
      // absorbed this tick's rows by this point, so one pass covers
      // both history and delta.
      val fullVecs = TextAnalysis.hashEmbedDense(
        spark.read.parquet(addsPath(storeRoot)),
        "doc_id", "text", config.topicBuckets)
      if (!fullVecs.isEmpty) AnalysisStore.writeFull(fullVecs, tvP)
    } else AnalysisStore.stageAndSwap(spark, tvP) { staging =>
      spark.read.parquet(tvP).join(addIds, Seq("doc_id"), "left_anti")
        .unionByName(deltaVecs)
        .write.mode(SaveMode.Overwrite).parquet(staging)
    }
    // 2. refit the map from the curated set (vecs minus retractions,
    // docs from the just-merged additions store minus retractions)
    val retractsAt = readablePath(spark, retractsPath(storeRoot))
    def minusRetracts(df: DataFrame): DataFrame = retractsAt match {
      case Some(rp) => df.join(
        spark.read.parquet(rp).select("doc_id"), Seq("doc_id"), "left_anti")
      case None => df
    }
    val curatedVecs =
      (if (exists(spark, tvP)) minusRetracts(spark.read.parquet(tvP))
       else deltaVecs.limit(0)).localCheckpoint(true)
    val dir = new org.apache.hadoop.fs.Path(tmP)
    val fs = fsOf(spark, tmP)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val map =
      if (curatedVecs.isEmpty)
        // everything retracted: serve an empty map with the schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("topic", IntegerType), StructField("n_docs", LongType),
            StructField("term", StringType), StructField("rank", IntegerType),
            StructField("score", DoubleType))))
      else TextAnalysis.corpusTopicsFromVecs(
        minusRetracts(spark.read.parquet(addsPath(storeRoot))),
        curatedVecs, "doc_id", "text",
        nTopics = config.topicCount, topTerms = config.topicTerms)
          .localCheckpoint(true)
    AnalysisStore.stageAndSwap(spark, tmP) { staging =>
      map.write.mode(SaveMode.Overwrite).parquet(staging)
    }
  }

  /** The curated corpus's topic map as of now — (topic, n_docs,
    * term, rank, score), equal to a direct [[graft.operators
    * .TextAnalysis.corpusTopics]] run over [[readCurated]]. None
    * until a topic-carrying tick has landed; mid-swap backups are
    * served like every other state read.
    */
  def readTopics(spark: SparkSession, storeRoot: String): Option[DataFrame] =
    readablePath(spark, topicsPath(storeRoot))
      .map(p => spark.read.parquet(p))

  private def maintainVectorIndex(
      spark: SparkSession, storeRoot: String,
      additions: DataFrame, retracted: DataFrame, vc: String,
      config: TrainingDataJob.Config): Unit = {
    import graft.functions.VectorFunctions
    import graft.operators.Similarity
    val vecP = vectorsPath(storeRoot)
    // probe the index subdir, not the bare dir: a crash between the
    // first tick's mkdirs and its swap leaves an empty target
    val have = exists(spark, s"$vecP/index")
    if (additions.isEmpty && retracted.isEmpty && have) return
    val addIds = additions.select("doc_id")
    val retractsAt = readablePath(spark, retractsPath(storeRoot))
    def minusRetracts(df: DataFrame): DataFrame = retractsAt match {
      case Some(rp) => df.join(
        spark.read.parquet(rp).select("doc_id"), Seq("doc_id"), "left_anti")
      case None => df
    }
    // cast only — NO normalization here (the Similarity entry points
    // normalize exactly once internally); docs whose shipped row has
    // no vector cannot be indexed and are filtered, not NPE'd
    def vecs(df: DataFrame): DataFrame = df.filter(col(vc).isNotNull)
      .select(col("doc_id"), VectorFunctions.toDouble(col(vc)).as("cv"))
    // this tick's shipped vectors (raw) — also the drift gate probes
    val shipped = minusRetracts(vecs(additions)).localCheckpoint(true)
    // prior index rows, replace-by-doc on the additions keys
    val kept = minusRetracts(
      if (have)
        spark.read.parquet(s"$vecP/index")
          .join(addIds, Seq("doc_id"), "left_anti")
      else shipped.limit(0).withColumn("cid", lit(-1)))
      .localCheckpoint(true)
    // the RAW curated vector set: prior shipped snapshot (additions
    // store minus this tick's own keys — the store already holds them
    // on a retry) + this tick's shipped, minus retractions. This is
    // what a from-scratch rebuild would read, so training from it
    // keeps maintained state bit-identical to that rebuild.
    val priorStore = spark.read.parquet(addsPath(storeRoot))
      .join(addIds, Seq("doc_id"), "left_anti")
    val curatedRaw = (
      if (priorStore.columns.contains(vc)) minusRetracts(vecs(priorStore))
      else shipped.limit(0))
      .unionByName(shipped).localCheckpoint(true)
    val oldCents: Array[Array[Double]] =
      if (have) Similarity.loadCentroids(spark, s"$vecP/model")
      else Array.empty
    if (curatedRaw.isEmpty) {
      // everything retracted: serve an empty index (under the old
      // model if one exists — the next shipped batch retrains anyway;
      // no PCA over an empty set)
      if (have) writeVectorState(spark, vecP, kept.limit(0), oldCents, None)
      return
    }
    // the PCA rotation is a pure function of the curated set (which
    // this method already materializes for the drift gate), so simply
    // refitting on every state write is retry-convergent by
    // construction — no incremental bookkeeping to tear. Uncentered
    // on unit vectors: the dot-preserving pre-transform reduced ANN
    // serving needs (centering would break cosine order).
    val pcaModel =
      if (config.vectorPcaComponents > 0 &&
          curatedRaw.count() > 1)
        Some(graft.operators.Pca.fit(
          curatedRaw.select(
            graft.functions.VectorFunctions.l2Normalize(col("cv")).as("uv")),
          "uv", k = config.vectorPcaComponents, center = false))
      else None
    // the assignment-only outcome: what serving would have after this
    // tick WITHOUT retraining (and the state the drift gate probes)
    val assigned =
      if (have && oldCents.nonEmpty)
        kept.unionByName(
          Similarity.ivfAssign(shipped, "doc_id", "cv", oldCents)
            .withColumnRenamed("nid", "doc_id"))
          .localCheckpoint(true)
      else kept.limit(0)
    // vectorMinRecall <= 0 turns the gate off (assignment only —
    // e.g. when a separate cadence owns retrain decisions)
    val stale = have && oldCents.nonEmpty && !shipped.isEmpty &&
      config.vectorMinRecall > 0 && {
      Similarity.indexDriftGate(curatedRaw, shipped, "doc_id", "cv",
          k = 5, minRecall = config.vectorMinRecall,
          sampleN = config.vectorDriftSample) { q =>
        Similarity.ivfTopKFromIndex(
          assigned.withColumnRenamed("doc_id", "nid"), oldCents,
          q, "doc_id", "cv", k = 5, nProbe = config.vectorProbe)
      }.head().getAs[Boolean]("stale")
    }
    val (cents, index) =
      if (!have || oldCents.isEmpty || stale) {
        val c = Similarity.trainCentroids(curatedRaw, "doc_id", "cv",
          config.vectorCentroids, iters = config.vectorIters)
        (c, Similarity.ivfAssign(curatedRaw, "doc_id", "cv", c)
          .withColumnRenamed("nid", "doc_id"))
      } else (oldCents, assigned)
    writeVectorState(spark, vecP, index, cents, pcaModel)
  }

  /** One staged swap of `vectors/index` + `vectors/model` together
    * (pre-creating the target on the first tick, so the swap and its
    * crash recovery cover every tick the same way — the clusters-dir
    * pattern).
    */
  private def writeVectorState(
      spark: SparkSession, vecP: String, index: DataFrame,
      cents: Array[Array[Double]],
      pca: Option[graft.operators.Pca.Model]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(vecP)
    val fs = fsOf(spark, vecP)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    AnalysisStore.stageAndSwap(spark, vecP) { staging =>
      index.write.parquet(s"$staging/index")
      graft.operators.Similarity.saveCentroids(spark, cents, s"$staging/model")
      // inside the same swap: index, centroids, and rotation can't tear
      pca.foreach(m =>
        graft.operators.Pca.saveModel(spark, m, s"$staging/pca"))
    }
  }

  /** The curated corpus's dense-vector index as of now: (index rows
    * in [[graft.operators.Similarity]]'s (nid, cv, cid) layout, the
    * centroid model) — compose `Similarity.ivfTopKFromIndex` over the
    * pair to serve dense (or, with [[readLexical]] + `Similarity
    * .rrfFuse`, hybrid) retrieval from exactly the curated set. None
    * until a vector-carrying tick has landed. Swap-window behavior
    * matches [[readCurated]]: a mid-swap backup is served without
    * mutating state, and index+model always come from the SAME
    * snapshot (they swap in one dir).
    */
  /** The curated corpus's PCA rotation as of now (uncentered, fitted
    * on the curated unit vectors at the last state write) — compose
    * with [[readVectors]]'s index + `Similarity.pcaIndex`/
    * `pcaTopKFromIndex` to serve reduced ANN from streaming state.
    * None until a vector tick with `vectorPcaComponents > 0` landed;
    * same swap-window guarantees as [[readVectors]] (the model swaps
    * in the SAME dir as index + centroids, so they can't tear).
    */
  def readPcaModel(spark: SparkSession,
      storeRoot: String): Option[graft.operators.Pca.Model] =
    readablePath(spark, vectorsPath(storeRoot)).flatMap { p =>
      if (exists(spark, s"$p/pca"))
        Some(graft.operators.Pca.loadModel(spark, s"$p/pca"))
      else None
    }

  def readVectors(spark: SparkSession, storeRoot: String)
      : Option[(DataFrame, Array[Array[Double]])] =
    readablePath(spark, vectorsPath(storeRoot)).map { p =>
      (spark.read.parquet(s"$p/index").withColumnRenamed("doc_id", "nid"),
        graft.operators.Similarity.loadCentroids(spark, s"$p/model"))
    }

  /** The curated corpus's lexical postings as of now
    * ([[graft.operators.TextAnalysis.lexicalIndex]] layout) — compose
    * `TextAnalysis.bm25FromIndex` + `TextAnalysis.searchWeights` over
    * this to serve BM25 / hybrid retrieval from exactly the document
    * set curation has shipped. Swap-window and untouched-store
    * behavior match [[readCurated]]: a mid-swap backup is served
    * without mutating state, and a store no tick has touched reads as
    * an empty postings frame.
    */
  def readLexical(spark: SparkSession, storeRoot: String): DataFrame =
    readablePath(spark, lexicalPath(storeRoot)) match {
      case Some(p) => spark.read.parquet(p)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("doc_id", LongType),
            StructField("token", org.apache.spark.sql.types.StringType),
            StructField("tf", LongType),
            StructField("dl", org.apache.spark.sql.types.IntegerType))))
    }

  /** The curated corpus's doc-keyed DSIR counts as of now
    * ([[graft.operators.Dsir.docBucketCounts]] layout). Swap-window
    * and untouched-store behavior match [[readCurated]].
    */
  def readDsirCounts(spark: SparkSession, storeRoot: String): DataFrame =
    readablePath(spark, dsirPath(storeRoot)) match {
      case Some(p) if exists(spark, s"$p/counts") =>
        spark.read.parquet(s"$p/counts")
      case _ =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("doc_id", LongType),
            StructField("bucket", LongType),
            StructField("cnt", LongType))))
    }

  /** The bucket count the dsir store was maintained under (from its
    * swapped-in meta), or None for a store no dsir tick has touched.
    * Hash the TARGET corpus's counts with exactly this B before
    * calling [[readDsirModel]].
    */
  def readDsirBuckets(spark: SparkSession, storeRoot: String): Option[Int] =
    readablePath(spark, dsirPath(storeRoot))
      .filter(p => exists(spark, s"$p/meta"))
      .map(p => spark.read.parquet(s"$p/meta").head().getInt(0))

  /** Fit a DSIR importance model of the CURATED set as the raw side
    * against `targetCounts` (a (bucket, cnt) table from
    * [[graft.operators.Dsir.bucketCounts]] over the target corpus,
    * hashed with [[readDsirBuckets]]'s B) — no corpus rescan: the
    * maintained store groups to ≤ B rows. The bucket count comes
    * from the store's own meta, never the caller: counts hashed
    * under different Bs share a column name but not a feature space.
    */
  def readDsirModel(spark: SparkSession, storeRoot: String,
      targetCounts: DataFrame): graft.operators.Dsir.DsirModel = {
    val b = readDsirBuckets(spark, storeRoot).getOrElse(throw
      new IllegalStateException(
        s"no dsir counts store under $storeRoot — run a tick with " +
          "Config.dsirBuckets > 0 first"))
    graft.operators.Dsir.modelFromCounts(targetCounts,
      readDsirCounts(spark, storeRoot)
        .groupBy("bucket").agg(sum(col("cnt")).as("cnt")),
      b)
  }

  def readCurated(spark: SparkSession, storeRoot: String): DataFrame = {
    val addsAt = readablePath(spark, addsPath(storeRoot))
    if (addsAt.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType))))
    val adds = spark.read.parquet(addsAt.get)
    readablePath(spark, retractsPath(storeRoot)) match {
      case Some(rp) =>
        adds.join(spark.read.parquet(rp), Seq("doc_id"), "left_anti")
      case None => adds
    }
  }
}
