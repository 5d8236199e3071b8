package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (ext tier, SURVEY §7.1): image/audio/
  * video travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract runs partition-parallel over the
  * bytes.
  *
  * The decode step itself is STUBBED (this container has no image/
  * audio libs — builder-prompt contract): [[FakeDecoder]] is a
  * deterministic byte-level "decoder". Everything around it — the
  * schema, the repartition-for-balanced-decode, the mapPartitions
  * batch shape (one decoder instance per partition, streamed
  * iterator, no per-row setup) — is the real production plumbing a
  * JVM codec would drop into. The PySpark equivalent is a Pandas UDF
  * over mapInPandas; mapPartitions over a typed Dataset is the Scala
  * native of the same pattern.
  */
object Multimodal {

  /** A media row: id + raw bytes + tiny metadata struct. */
  final case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])

  /** Extracted features. All fields derivable by any engine from the
    * bytes, so the driver oracle can hash-check the full pipeline.
    */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, header_hex: String, content_md5: String)

  /** Wrap a text corpus as binary media records — the test stand-in
    * for `spark.read.format("binaryFile")` over an object store.
    */
  def asMedia(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), lit("txt").as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** The stubbed decoder. A real deployment swaps this object for a
    * JNI/JavaCV codec; the call shape (bytes in, features out, heavy
    * init amortized per partition via [[decodeFeatures]]) stays.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val digest = md.digest(r.payload).map("%02x".format(_)).mkString
      val header = r.payload.take(4).map("%02x".format(_)).mkString
      MediaFeatures(r.doc_id, r.payload.length, header, digest)
    }

    /** Frame-sampling stub: every `stride`-th byte window — stands in
      * for video frame extraction; deterministic.
      */
    def sampleFrames(payload: Array[Byte], stride: Int, frame: Int): Seq[Array[Byte]] =
      payload.grouped(stride).map(_.take(frame)).toSeq

    /** Resize stub: keep every `factor`-th byte — stands in for image
      * downscaling (a real codec decodes, scales, re-encodes; the
      * payload-in → smaller-payload-out call shape is what the
      * pipeline depends on). Deterministic.
      */
    def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, "resize factor must be ≥ 1")
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = payload(i * factor); i += 1 }
      out
    }
  }

  /** Partition-parallel resize pass: media in, media out with
    * downscaled payloads — composes ahead of [[decodeFeatures]] /
    * [[sampleFrameFeatures]] like any narrow stage.
    */
  def resizeMedia(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(payload = FakeDecoder.resize(r.payload, factor))))
  }

  /** Partition-parallel feature extraction. `repartition(parallelism)`
    * balances decode cost when upstream files are skewed (common for
    * media: one 4 GB video next to thousands of thumbnails); the
    * mapPartitions body allocates nothing per row beyond the feature
    * object.
    */
  def decodeFeatures(media: Dataset[MediaRecord], parallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (parallelism > 0) media.repartition(parallelism) else media
    balanced.mapPartitions(_.map(FakeDecoder.decode))
  }

  /** End-to-end: documents → binary records → decoded feature table. */
  def featureTable(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeFeatures(asMedia(documents)).toDF()

  /** One extracted "frame": position + content hash. */
  final case class MediaFrame(doc_id: Long, frame_no: Int, frame_md5: String)

  /** Frame sampling over binary payloads — the video-style op: every
    * `stride` bytes, take a `frameLen`-byte window and emit its
    * fingerprint. flatMap keeps it one narrow partition-parallel pass
    * (a 2-hour video explodes into frames WITHOUT materializing them
    * all in one row); a real codec replaces the byte-window stub with
    * keyframe extraction, the (stride, explode, per-frame feature)
    * plumbing is unchanged.
    */
  def sampleFrameFeatures(
      media: Dataset[MediaRecord],
      stride: Int = 64, frameLen: Int = 16): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val md = MessageDigest.getInstance("MD5")
      FakeDecoder.sampleFrames(r.payload, stride, frameLen).iterator.zipWithIndex
        .map { case (bytes, i) =>
          md.reset()
          MediaFrame(r.doc_id, i,
            md.digest(bytes).map("%02x".format(_)).mkString)
        }
    }
  }

  /** Cross-document shared frames — segment-level dedup for video/
    * audio corpora: fingerprints appearing in MORE THAN ONE document
    * (shared intros/outros/b-roll/watermark cards that should be
    * deduplicated or masked before training). Composes [[
    * sampleFrameFeatures]] with one fingerprint-keyed aggregation:
    * the exchange carries (frame_md5, partial counts), never frame
    * bytes — at 100 TB of video the shuffled volume is the fingerprint
    * space, and frames themselves stay in their scan partitions.
    */
  def sharedFrames(
      media: Dataset[MediaRecord],
      stride: Int = 64, frameLen: Int = 16): DataFrame =
    frameIndex(media, stride, frameLen).filter(col("n_docs") > 1)

  /** The full frame-fingerprint index (every fingerprint, shared or
    * not) — the PERSISTED state the incremental path maintains: write
    * it once ([[graft.sources.AnalysisStore]], ideally bucketed on
    * frame_md5), fold each delta in with [[mergeFrameIndex]], read
    * shared segments off it with a `n_docs > 1` filter.
    */
  def frameIndex(
      media: Dataset[MediaRecord],
      stride: Int = 64, frameLen: Int = 16): DataFrame =
    sampleFrameFeatures(media, stride, frameLen).toDF()
      .groupBy("frame_md5")
      .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_occ"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  /** Incremental twin: fold a DELTA of new documents into a prior
    * [[frameIndex]] without re-scanning old payloads. Distinct-doc
    * counts ADD exactly because delta doc ids are NEW (the same
    * monotonic-id bookmark contract the span-dedup and packing deltas
    * rely on) — an id present on both sides would double-count, so
    * re-deliveries must be deduplicated upstream (the curation tick's
    * by-key state merges already guarantee that). Shuffle volume is
    * O(delta frames) + the fingerprint-keyed join against the index.
    */
  def mergeFrameIndex(
      prior: DataFrame, delta: Dataset[MediaRecord],
      stride: Int = 64, frameLen: Int = 16): DataFrame = {
    val d = frameIndex(delta, stride, frameLen)
    prior.select(col("frame_md5"), col("n_docs").as("__an"),
        col("n_occ").as("__ao"), col("first_doc").as("__af"),
        col("last_doc").as("__al"))
      .join(d.select(col("frame_md5"), col("n_docs").as("__bn"),
        col("n_occ").as("__bo"), col("first_doc").as("__bf"),
        col("last_doc").as("__bl")), Seq("frame_md5"), "full_outer")
      .select(col("frame_md5"),
        (coalesce(col("__an"), lit(0L)) + coalesce(col("__bn"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("__ao"), lit(0L)) + coalesce(col("__bo"), lit(0L)))
          .as("n_occ"),
        least(col("__af"), col("__bf")).as("first_doc"),
        greatest(col("__al"), col("__bl")).as("last_doc"))
  }
}
