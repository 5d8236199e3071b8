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
    // at-least-once delivery: the same batch arrives again (crash
    // after state writes, before the checkpoint commit)
    TrainingStreaming.tickBatch(spark, drop2, root, cfg)
    assert(snapshot() == once,
      "a redelivered batch must not shift packs or duplicate rows")
    // the curated view equals the batch pipeline over everything
    val fullIds = TrainingDataJob.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(snapshot().map(_._1) == fullIds)
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
