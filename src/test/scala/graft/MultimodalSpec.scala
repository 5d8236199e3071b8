package graft

import graft.operators.Multimodal

/** Multimodal plumbing (ext tier): binary schema, partition-parallel
  * decode shape, stub determinism.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia produces binary payloads with typed metadata") {
    val docs = Seq((1L, "héllo")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(docs).head()
    assert(m.format == "txt")
    assert(new String(m.payload, "UTF-8") == "héllo")
  }

  test("decodeFeatures extracts byte-level features, respects parallelism") {
    val docs = Seq((1L, "abcd"), (2L, "xy")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val feats = Multimodal.decodeFeatures(media, parallelism = 3)
    assert(feats.rdd.getNumPartitions == 3)
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    assert(byId(1L).n_bytes == 4)
    assert(byId(1L).header_hex == "61626364")
    assert(byId(2L).header_hex == "7879") // shorter than 4 bytes
    assert(byId(1L).content_md5 == "e2fc714c4727ee9395f324cd2e7f331f")
  }

  test("frame-sampling stub is deterministic and windowed") {
    val frames = Multimodal.FakeDecoder.sampleFrames(
      (0 until 10).map(_.toByte).toArray, stride = 4, frame = 2)
    assert(frames.map(_.toSeq) == Seq(Seq(0, 1), Seq(4, 5), Seq(8, 9)).map(_.map(_.toByte)))
  }
}
