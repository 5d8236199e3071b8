package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupCluster, Packing, QualityModel, Sampling, TextAnalysis}

/** The canonical pre-training corpus pipeline, composed from the
  * engine's ext-tier operators — the end-to-end shape a 100 TB
  * training-data run takes, with each stage's scale story already
  * proven at the operator level:
  *
  *  0. PII redaction — emails/IPs/phones become typed placeholders
  *     before any other stage reads the text ([[TextAnalysis
  *     .redactPii]]); narrow, fuses with the stage-1 scan
  *  1. quality + repetition gate — per-row codegen'd features,
  *     narrow, no shuffle ([[TextAnalysis.qualityFeatures]] +
  *     [[TextAnalysis.repetitionSignals]] — the Gopher-style
  *     boilerplate/loop filter length gates miss)
  *  2. near-dup pruning — MinHash+LSH pairs → connected components →
  *     keep each cluster's canonical doc ([[DedupCluster]]); the only
  *     super-linear stage, bounded by LSH candidate generation
  *  3. benchmark decontamination — drop docs leaking eval-set
  *     k-grams; the eval shingle set broadcasts ([[Dedup
  *     .contamination]])
  *  4. deterministic stratified sampling — md5-bucketed per-language
  *     fractions, reproducible and growth-stable ([[Sampling]])
  *  5. feature annotation — tokens, language, normalized form,
  *     fingerprints for downstream joins ([[TextAnalysis]])
  *  6. sequence packing — context-window assignment via distributed
  *     prefix sum ([[Packing.packSequences]])
  *  7. global shuffle + sharding — seeded, reproducible export order
  *     for parallel loaders ([[Sampling.shuffleShards]])
  *
  * Stage ORDER is the scale decision: the cheap narrow gate runs
  * before the quadratic-ish dedup so junk never reaches the pair
  * space, decontamination after dedup (fewer docs to probe),
  * sampling after both so duplicate clusters and contaminated docs
  * can't vote their way past the sample, packing after the final row
  * set is known — pack ids depend on exactly the rows that ship —
  * and the shuffle last of all, so shard files are the deliverable.
  */
object TrainingDataJob {

  final case class Config(
      jaccardThreshold: Double = 0.7,
      langFractions: Map[String, Double] = Map("en" -> 1.0),
      defaultFraction: Double = 0.5,
      contaminationThreshold: Double = 0.5,
      packBudget: Int = 2048,
      // drop docs whose duplicated-2-gram char mass exceeds this
      // fraction of total chars (integer-arithmetic compare, so the
      // gate is engine-exact like the rest of the pipeline)
      maxRepetitionRatio: Double = 0.5,
      redactPii: Boolean = true,
      // model-based gate: when set, stage 1 filters on the classifier's
      // calibrated probability instead of the raw rule gate (the rules
      // still run — they feed the model its features)
      qualityModel: Option[org.apache.spark.ml.classification.LogisticRegressionModel] = None,
      minQualityProb: Double = 0.5,
      // canonical election within a duplicate cluster: false = min id
      // (stable, cheapest); true = keep the BEST member by
      // [[TrainingDataJob.docScore]] (what real curation does — the
      // least-truncated copy survives, not the accidentally-first one)
      canonicalByQuality: Boolean = false,
      // token accounting for n_tokens and pack budgets: None =
      // whitespace words; Some(vocab) = greedy longest-match subword
      // pieces over a FROZEN piece vocabulary ([[graft.operators.Bpe
      // .train]]'s model.vocab or a loaded store table). Frozen on
      // purpose: the tick's append-only pack contract holds only if
      // every tick counts tokens identically — retrain the tokenizer
      // between EPOCHS (full re-runs), never between ticks.
      subwordVocab: Option[Seq[String]] = None,
      numShards: Int = 8,
      shuffleSeed: String = "epoch0",
      // dense-vector serving state (streaming tier): when set to the
      // batch's embedding column name, every [[graft.streaming
      // .TrainingStreaming.tickBatch]] maintains an IVF vector index
      // over the curated set as durable state — delta assignment
      // under the persisted centroid model, with a per-tick
      // [[graft.operators.Similarity.indexDriftGate]] that retrains
      // the cells when the old partitioning stops matching where new
      // vectors live. None = feature off (batches carry no vectors).
      vectorCol: Option[String] = None,
      vectorCentroids: Int = 8,
      vectorIters: Int = 5,
      vectorProbe: Int = 2,
      // <= 0 disables the drift gate (pure assignment — a deployment
      // where retrain decisions run on their own cadence)
      vectorMinRecall: Double = 0.6,
      vectorDriftSample: Int = 32,
      // > 0 also maintains an UNCENTERED PCA rotation (that many
      // components) of the curated unit vectors next to the IVF
      // state — the dot-preserving pre-transform
      // [[graft.operators.Similarity.pcaTopKFromIndex]] serves
      // reduced ANN from. Refit each state write from the same
      // curated set the drift gate already reads (pure function of
      // curated state ⇒ retry-convergent). 0 = feature off.
      vectorPcaComponents: Int = 0,
      // DSIR selection-model state (streaming tier): > 0 maintains a
      // doc-keyed hashed-gram counts store over the curated set
      // ([[graft.operators.Dsir.docBucketCounts]] layout) as durable
      // state, so the raw side of an importance model is always
      // servable without a corpus rescan — fit against any target
      // corpus's counts via [[graft.streaming.TrainingStreaming
      // .readDsirModel]]. 0 = feature off.
      dsirBuckets: Int = 0,
      // Topic-map state (streaming tier): > 0 maintains the corpus
      // topic cartography ([[graft.operators.TextAnalysis
      // .corpusTopics]]'s (topic, n_docs, term, rank, score) table)
      // over the curated set as durable state — per-doc hashed
      // vectors merge delta-only (the embedding is doc-local), and
      // the map refits each tick as a pure function of the curated
      // set under the same stage-and-swap commit point as the
      // lexical/vector stores. 0 = feature off.
      topicCount: Int = 0,
      topicTerms: Int = 5,
      topicBuckets: Int = 256,
      // Gopher rule battery (Rae et al. 2021 §A1.1) as an ADDITIONAL
      // stage-1 gate: word-count window, mean word length, symbol and
      // alpha ratios, ≥2 stopword hits ([[TextAnalysis.gopherRules]]).
      // Off by default — the published thresholds target web-scale
      // docs. Both [[run]] and the streaming [[tick]] gate through
      // the same code path, so enabling it can never diverge batch
      // from streaming.
      gopherGate: Boolean = false,
      gopherMinWords: Int = 50,
      gopherMaxWords: Int = 100000,
      // ≥ this many DISTINCT hits from the published 8-word stopword
      // list (2 = the published rule; FineWeb-style variants
      // re-threshold per corpus)
      gopherMinStopHits: Int = 2)

  /** The configured token counter — words or subword pieces — used
    * for BOTH the n_tokens feature and the pack budget, so the
    * bookmark (Σ n_tokens of shipped rows) always continues the
    * packing in the same units.
    */
  private def tokenCount(config: Config): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    config.subwordVocab match {
      case Some(v) =>
        // fail HERE with an actionable message — an empty vocab (e.g.
        // a truncated store table) would otherwise surface as a bare
        // empty.max deep inside plan construction
        require(v.nonEmpty, "Config.subwordVocab must be a non-empty vocabulary")
        val maxLen = v.iterator.map(_.length).max
        t => graft.operators.Bpe.pieceCount(t, v, maxLen)
      case None => Packing.wordCount
    }

  /** Quality score for canonical election: token count (among
    * near-identical duplicates the longest member is the
    * least-truncated copy), ties broken by id inside
    * [[DedupCluster.electCanonical]]. Swap in `lmScore`'s
    * avg_logprob or the classifier probability via electCanonical
    * directly for model-based election.
    */
  def docScore(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("double").as("score"))

  /** The canonical id set of a (doc_id, cluster_id) labeling — THE
    * single election code path, shared by [[run]] and every election
    * [[tick]] performs (new and prior state alike), so batch and
    * incremental can never diverge on who survives a cluster.
    * `scores = None` is min-id election (works on any labeling —
    * connectedComponents' is_canonical flag IS id == cluster_id);
    * `Some(scores)` elects the best-scoring member.
    */
  private def canonicalIds(
      labels: DataFrame, scores: Option[DataFrame]): DataFrame =
    scores match {
      case Some(s) =>
        DedupCluster.electCanonical(labels, s)
          .filter(col("is_canonical")).select("doc_id")
      case None =>
        labels.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    }

  /** Stage 0: PII redaction — BEFORE any stage reads the text, so
    * nothing downstream (fingerprints, shingles, features, shard
    * files) ever sees a raw email/IP/phone. Narrow regexp chain,
    * fuses with the stage-1 scan.
    */
  def redact(df: DataFrame, config: Config): DataFrame =
    if (config.redactPii)
      df.withColumn("text", TextAnalysis.redactPii(col("text")))
    else df

  /** Stage 1 (rule form): quality + repetition gate, both per-row and
    * narrow. Repetition rule: the fraction of 2-gram instances that
    * are duplicated must not exceed maxRepetitionRatio — integer
    * cross-multiplication (dup2_n·10⁶ ≤ ratio·10⁶·(2-gram count)),
    * engine-exact.
    */
  def ruleGate(df: DataFrame, config: Config): DataFrame = {
    val repThreshold = (config.maxRepetitionRatio * 1000000L).round
    TextAnalysis.withRepetitionSignals(
        TextAnalysis.qualityFeatures(df), "text")
      .filter(col("is_quality") &&
        col("dup2_n") * lit(1000000L) <=
          lit(repThreshold) * greatest(col("word_count") - 1L, lit(1L)))
      .select(df.columns.map(col): _*)
  }

  /** Stage 1, either form: the classifier gate when
    * `config.qualityModel` is set (calibrated probability over the
    * same feature blocks — a narrow broadcast-weights pass), the rule
    * gate otherwise. [[run]] and [[tick]] both gate through here so
    * the incremental tier can never silently diverge from the batch
    * pipeline's gate.
    */
  def gate(df: DataFrame, config: Config): DataFrame = {
    val base = config.qualityModel match {
      case Some(model) =>
        df.join(
          QualityModel.score(model,
              QualityModel.features(df, "doc_id", "text"))
            .filter(col("quality_prob") >= config.minQualityProb)
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
      case None => ruleGate(df, config)
    }
    // the Gopher battery stacks on EITHER gate form — another narrow
    // per-row pass that fuses with the same scan, zero shuffles
    if (!config.gopherGate) base
    else TextAnalysis.gopherRules(base, "text",
        config.gopherMinWords, config.gopherMaxWords,
        config.gopherMinStopHits)
      .filter(col("gopher_pass"))
      .select(base.columns.map(col): _*)
  }

  /** Stages 0+1 composed — the frame the dedup stages cluster over;
    * exposed so incremental callers can reconstruct prior-state
    * inputs ([[tick]]) identically to [[run]].
    */
  def curatedQuality(df: DataFrame, config: Config): DataFrame =
    gate(redact(df, config), config)

  /** documents(doc_id, text, lang, …) → curated corpus with features
    * and pack assignments. Deterministic end-to-end: same input ⇒
    * same output rows.
    *
    * @param evalSet held-out benchmark docs (doc_id, text) to
    *                decontaminate against; None skips the stage
    */
  /** Corpus-drop contract pre-flight — [[graft.operators
    * .DataQuality]] over what the curation pipeline silently leans
    * on: doc_id must be present and UNIQUE (every state dir in the
    * streaming tier is replace-by-doc — a duplicated id silently
    * overwrites a different document's state), text must be present
    * (a null text doc would ride through the gates as an empty doc
    * instead of failing loudly). Same uniform report schema as
    * [[MambaEtlJob.preflight]]; callers that accept the drop fold
    * the report into their persisted quality history.
    */
  def preflight(rawDocuments: DataFrame): DataFrame = {
    import graft.operators.DataQuality
    DataQuality.check(rawDocuments, Seq(
        DataQuality.notNull("doc_id"), DataQuality.notNull("text")))
      .unionByName(DataQuality.unique(rawDocuments, Seq("doc_id")))
  }

  /** [[run]] behind [[preflight]] — a drop violating the doc
    * contract stops loudly before any curation work runs.
    */
  def runChecked(rawDocuments: DataFrame, config: Config = Config(),
      evalSet: Option[DataFrame] = None): DataFrame = {
    val failed = preflight(rawDocuments).filter(!col("passed"))
      .select("rule", "n_violations")
      .collect() // collect-bound: one row per configured audit rule
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "corpus contract violated: " + failed.map(r =>
          s"${r.getString(0)} (${r.getLong(1)} violations)").mkString("; "))
    run(rawDocuments, config, evalSet)
  }

  def run(rawDocuments: DataFrame, config: Config = Config(),
      evalSet: Option[DataFrame] = None): DataFrame = {
    val documents = redact(rawDocuments, config)
    val quality = gate(documents, config)

    // 2. near-dup pruning: keep each cluster's canonical member
    val clustered = DedupCluster.minHashClusters(
      quality, "doc_id", "text", k = 3, threshold = config.jaccardThreshold)
    val kept = quality.join(
      canonicalIds(clustered,
        if (config.canonicalByQuality) Some(docScore(quality)) else None),
      Seq("doc_id"), "left_semi")

    // 3. benchmark decontamination (broadcast eval shingles)
    val clean = evalSet match {
      case None => kept
      case Some(eval) =>
        val leaked = Dedup.contamination(kept, eval, "doc_id", "text",
            k = 3, threshold = config.contaminationThreshold)
          .filter(col("is_contaminated")).select("doc_id")
        kept.join(broadcast(leaked), Seq("doc_id"), "left_anti")
    }

    // 4. deterministic stratified sample (per-language balance)
    val sampled = Sampling.stratified(clean, "doc_id", "lang",
      config.langFractions, config.defaultFraction)

    // 5. feature annotation for downstream consumers
    val features = TextAnalysis.fingerprints(sampled)
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .withColumn("n_tokens", tokenCount(config)(col("text")).cast("int"))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))

    // 6. context-window assignment over exactly the shipped rows
    val packed = features.join(
      Packing.packSequences(sampled, "doc_id", "text", config.packBudget,
          tokenCount = tokenCount(config))
        .select("doc_id", "pack_id", "pack_offset"),
      Seq("doc_id"))

    // 7. reproducible global shuffle: shard + order keys for loaders
    // (narrow — the exchange is paid only if/when shard files are
    // written via Sampling.writeShuffledShards)
    Sampling.shuffleShards(packed, "doc_id", config.shuffleSeed,
      config.numShards)
  }

  /** EPOCH assembly — the mixture and ordering decisions recomputed
    * per training epoch over a curated corpus ([[run]]/[[tick]]
    * output), deliberately NOT part of [[run]]: quotas and global
    * order are corpus-level functions that growth displaces, while
    * run/tick are append-only (the [[graft.operators.Sampling
    * .tokenBudgetMix]] epoch-boundary rule). Stages:
    *
    *  1. temperature mixture — `size^alpha` doc quotas per source
    *     ([[graft.operators.Sampling.temperatureMix]])
    *  2. oversampling — per-source multipliers repeat small
    *     high-quality sources as distinct copies (`epoch` = copy id)
    *  3. curriculum — each COPY gets a global training position:
    *     quality phases (token-count score against `thresholds`)
    *     first, seeded shuffle within phase; copies rank under a
    *     composite (doc, copy) key so their order is deterministic
    *
    * Deterministic for a given (corpus, epochSeed); a fresh seed is a
    * fresh epoch (new draw, new order, same distributions).
    */
  def assembleEpoch(curated: DataFrame, alpha: Double, docBudget: Long,
      multipliers: Map[String, Double], thresholds: Seq[Double],
      epochSeed: String): DataFrame = {
    // checkpoint the fan-out points: mixed feeds (scores, copies) and
    // copies feeds (curriculum input, final join) — without eager
    // materialization each branch re-runs the whole mix subtree
    // (plus curriculumOrder's own eager totals pass)
    val mixed = Sampling.temperatureMix(curated, "doc_id", "source",
      alpha, docBudget, epochSeed + ":mix").localCheckpoint(true)
    val scores = docScore(mixed)
    // the fractional-copy draw is epoch-seeded: the "new draw" half
    // of a ×1.5 source must rotate across epochs, not stay fixed
    val copies = Sampling.oversample(mixed, "doc_id", "source", multipliers,
        seed = epochSeed)
      .withColumn("__cid",
        concat_ws(":", col("doc_id").cast("string"),
          col("epoch").cast("string")))
      .localCheckpoint(true)
    val ordered = Packing.curriculumOrder(
      copies.join(scores, Seq("doc_id")), "__cid", "score",
      thresholds, epochSeed + ":cur")
    copies.join(ordered, Seq("__cid"))
      .select(curated.columns.map(col).toIndexedSeq ++
        Seq(col("epoch"), col("phase"), col("curriculum_pos")): _*)
  }

  /** [[tick]]'s outputs: what ships, what retracts, and the merged
    * clustering the NEXT tick needs as its prior state.
    */
  final case class TickResult(
      additions: DataFrame, retractedIds: DataFrame, clusters: DataFrame)

  /** One INCREMENTAL tick: curate only a delta of new docs (ids above
    * every prior doc — the bookmark contract) against the prior run's
    * state, composing the per-stage incremental twins the operators
    * already prove: [[Dedup.minHashLshDelta]] (index probe),
    * [[DedupCluster.mergeDelta]] (cluster merge),
    * [[Packing.packSequencesDelta]] (token-bookmark continuation);
    * redaction/gate/features are narrow, sampling is id-pure — both
    * trivially incremental.
    *
    * Returns (additions, retractedIds):
    *  - additions: the delta docs that ship, with the same columns
    *    [[run]] emits — pack slots CONTINUE from `tokenBookmark`, so
    *    previously shipped pack files stay valid (append-only).
    *  - retractedIds: previously-shipped OLD docs that lost canonical
    *    status because a delta doc bridged their cluster into one
    *    with a smaller id — mask these in the serving layer (the
    *    partitioned store's removeKeys path); the engine never
    *    rewrites shipped packs for them.
    *
    * The shipped ID SET after (prior − retractions + additions)
    * equals a full [[run]] over old+delta (spec-asserted); pack
    * assignments of old docs intentionally differ from a from-scratch
    * re-pack — that is the append-only contract.
    *
    * @param oldDocuments  prior raw corpus (for the dedup index; at
    *                      scale this is the persisted bucketed index,
    *                      not a recompute — DedupSpec proves that
    *                      layout)
    * @param priorClusters (doc_id, cluster_id) over the prior QUALITY
    *                      docs (the clustering [[run]] computed)
    * @param tokenBookmark Σ n_tokens of previously shipped rows
    *                      ([[Packing.tokenBookmark]])
    */
  def tick(
      oldDocuments: DataFrame,
      priorClusters: DataFrame,
      tokenBookmark: Long,
      rawDelta: DataFrame,
      config: Config = Config(),
      evalSet: Option[DataFrame] = None): TickResult = {
    val delta = redact(rawDelta, config)
    val qDelta = gate(delta, config)
    val oldQuality = curatedQuality(oldDocuments, config)

    // 2'. delta probes the (persisted, here recomputed) minhash index
    // (project to the two columns the index reads BEFORE the union:
    // a delta that carries columns the old store predates — e.g. an
    // embedding column enabled mid-stream — must still union)
    val (sh, bands) = Dedup.minHashIndex(
      oldQuality.select("doc_id", "text")
        .unionByName(qDelta.select("doc_id", "text")), "doc_id", "text", k = 3)
    val deltaPairs = Dedup.minHashLshDelta(sh, bands,
      qDelta.select("doc_id"), config.jaccardThreshold)
    val merged = DedupCluster.mergeDelta(priorClusters, deltaPairs,
      oldQuality.select("doc_id").unionByName(qDelta.select("doc_id")))
    sh.unpersist()
    // old canonicals that lost the election (a delta bridge merged
    // their cluster, or — under quality election — a better delta
    // copy arrived) → retract downstream. The prior canonical set is
    // re-derived under the SAME election mode, so batch and
    // incremental agree on who was shipped. The old corpus's scores
    // are computed ONCE (checkpointed — an (id, double) frame) and
    // feed both elections; two independent docScore pipelines would
    // tokenize the prior corpus twice per tick.
    val (canonical, priorCanonical) =
      if (config.canonicalByQuality) {
        val oldScores = docScore(oldQuality).localCheckpoint(true)
        (canonicalIds(merged, Some(oldScores.unionByName(docScore(qDelta)))),
         canonicalIds(priorClusters, Some(oldScores)))
      } else
        (canonicalIds(merged, None), canonicalIds(priorClusters, None))
    val keptDelta = qDelta.join(canonical, Seq("doc_id"), "left_semi")
    val retracted = priorCanonical.join(canonical, Seq("doc_id"), "left_anti")

    // 3'–5'. decontaminate + sample + annotate the delta only
    val clean = evalSet match {
      case None => keptDelta
      case Some(eval) =>
        val leaked = Dedup.contamination(keptDelta, eval, "doc_id", "text",
            k = 3, threshold = config.contaminationThreshold)
          .filter(col("is_contaminated")).select("doc_id")
        keptDelta.join(broadcast(leaked), Seq("doc_id"), "left_anti")
    }
    val sampled = Sampling.stratified(clean, "doc_id", "lang",
      config.langFractions, config.defaultFraction)
    val features = TextAnalysis.fingerprints(sampled)
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .withColumn("n_tokens", tokenCount(config)(col("text")).cast("int"))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))

    // 6'–7'. packs continue from the bookmark; shuffle keys are id-pure
    val packed = features.join(
      Packing.packSequencesDelta(sampled, "doc_id", "text",
          config.packBudget, tokenBookmark,
          tokenCount = tokenCount(config))
        .select("doc_id", "pack_id", "pack_offset"),
      Seq("doc_id"))
    TickResult(
      additions = Sampling.shuffleShards(packed, "doc_id",
        config.shuffleSeed, config.numShards),
      retractedIds = retracted,
      clusters = merged.select("doc_id", "cluster_id"))
  }
}
