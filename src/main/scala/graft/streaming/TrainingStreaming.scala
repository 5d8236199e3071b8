package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
      retractsPath(root), lexicalPath(root))
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
