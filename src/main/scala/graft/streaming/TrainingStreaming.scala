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
  * batch delivery; every state write here is idempotent BY KEY
  * ([[AnalysisStore.writeIncremental]] keyed on doc_id), so a batch
  * re-run after a crash converges to the same store instead of
  * duplicating rows — the same staging-swap hygiene the ETL tick
  * stream uses.
  *
  * The token bookmark is re-derived from the additions table (one
  * columnar sum over a single long column) rather than kept as a
  * mutable scalar: a scalar file can go stale when a crashed batch
  * retries, the store cannot. A 100 TB deployment that finds the sum
  * too hot keeps (batchId → bookmark) in the store and reads the max
  * — same idempotence, O(ticks) rows.
  */
object TrainingStreaming {

  private def docsPath(root: String) = s"$root/docs"
  private def clustersPath(root: String) = s"$root/clusters"
  private def addsPath(root: String) = s"$root/additions"
  private def retractsPath(root: String) = s"$root/retractions"

  private def exists(spark: SparkSession, p: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(p))

  private def emptyClusters(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("cluster_id", LongType))))

  /** One curation tick over a batch of new docs, against (and
    * updating) the state rooted at `storeRoot`. Exposed for batch
    * callers and tests; [[curationTicks]] wires it to a stream.
    */
  def tickBatch(spark: SparkSession, rawBatch: DataFrame, storeRoot: String,
      config: TrainingDataJob.Config): Unit = {
    // ONE source read: the tick references the batch from many plan
    // branches (gate, index union, joins, the docs-store merge), and
    // an un-materialized foreachBatch frame re-reads the stream
    // source per action — measured 13-14 re-reads per tick
    val batch = rawBatch.localCheckpoint(true)
    if (batch.isEmpty) return
    val old =
      if (exists(spark, docsPath(storeRoot)))
        spark.read.parquet(docsPath(storeRoot))
      else batch.limit(0)
    val priorClusters =
      if (exists(spark, clustersPath(storeRoot)))
        spark.read.parquet(clustersPath(storeRoot))
      else emptyClusters(spark)
    val bookmark =
      if (exists(spark, addsPath(storeRoot))) {
        val r = spark.read.parquet(addsPath(storeRoot))
          .agg(sum(col("n_tokens").cast("long"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } else 0L

    val r = TrainingDataJob.tick(old, priorClusters, bookmark, batch, config)
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
    // the clustering is replaced whole (two long columns over quality
    // docs); stage-and-swap so readers never see a half state — the
    // first tick writes directly (no prior state to protect)
    if (exists(spark, clustersPath(storeRoot)))
      AnalysisStore.stageAndSwap(spark, clustersPath(storeRoot)) { staging =>
        clusters.write.parquet(staging)
      }
    else clusters.write.parquet(clustersPath(storeRoot))
  }

  /** Wire a documents stream (e.g. `readStream.schema(s).parquet(dir)`
    * over a drop directory) into continuously-maintained curation
    * state. Caller attaches trigger/checkpoint options and starts it.
    */
  def curationTicks(docsStream: DataFrame, storeRoot: String,
      config: TrainingDataJob.Config = TrainingDataJob.Config()): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        tickBatch(batch.sparkSession, batch, storeRoot, config)
    }

  /** The curated corpus as of now: additions minus retractions. */
  def readCurated(spark: SparkSession, storeRoot: String): DataFrame = {
    val adds = spark.read.parquet(addsPath(storeRoot))
    if (exists(spark, retractsPath(storeRoot)))
      adds.join(spark.read.parquet(retractsPath(storeRoot)),
        Seq("doc_id"), "left_anti")
    else adds
  }
}
