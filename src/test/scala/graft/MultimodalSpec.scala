package graft

import org.apache.spark.sql.functions.col

import graft.operators.Multimodal
import graft.sources.Tables

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

  test("resizeMedia shrinks payloads deterministically, composes with decode") {
    val docs = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val resized = Multimodal.resizeMedia(Multimodal.asMedia(docs), factor = 2)
    val r = resized.head()
    assert(new String(r.payload, "UTF-8") == "aceg")
    // downstream feature extraction sees the resized bytes
    val feats = Multimodal.decodeFeatures(resized).head()
    assert(feats.n_bytes == 4 && feats.header_hex == "61636567")
  }

  test("sampleFrameFeatures explodes one fingerprint per frame window") {
    // 10 chars, stride 4 → frames at offsets 0/4/8 (last one short)
    val docs = Seq((7L, "abcdefghij")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrameFeatures(
      Multimodal.asMedia(docs), stride = 4, frameLen = 2).collect()
      .sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1, 2))
    // md5("ab"), md5("ef"), md5("ij") — per-window content hashes
    assert(frames(0).frame_md5 == "187ef4436122d1cc2f40dc2b92f0eba0")
    assert(frames.map(_.frame_md5).distinct.length == 3)
  }

  test("sharedFrames finds only fingerprints spanning documents") {
    import spark.implicits._
    // stride 4 / frame 2: windows are chars (0,1), (4,5), (8,9)…
    // docs 1 and 2 share the "ab" window; doc 2 repeats it internally
    // (repeats within ONE doc must not count as shared); doc 3 is
    // disjoint
    val docs = Seq(
      (1L, "abcdefgh"),        // frames: ab, ef
      (2L, "abcdabcd"),        // frames: ab, ab
      (3L, "zzzzyyyy")).toDF("doc_id", "text")
    val shared = Multimodal.sharedFrames(
      Multimodal.asMedia(docs), stride = 4, frameLen = 2).collect()
    assert(shared.length == 1)
    val r = shared.head
    assert(r.getAs[String]("frame_md5") == "187ef4436122d1cc2f40dc2b92f0eba0")
    assert(r.getAs[Long]("n_docs") == 2 && r.getAs[Long]("n_occ") == 3)
    assert(r.getAs[Long]("first_doc") == 1 && r.getAs[Long]("last_doc") == 2)
  }

  test("mergeFrameIndex: folding a delta equals rebuilding the index from scratch") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 300)
    val delta = docs.filter(col("doc_id") >= 300) // new ids only — the bookmark contract
    val merged = Multimodal.mergeFrameIndex(
      Multimodal.frameIndex(Multimodal.asMedia(old)),
      Multimodal.asMedia(delta))
    val full = Multimodal.frameIndex(Multimodal.asMedia(docs))
    assertSameRows(merged.orderBy("frame_md5"), full.orderBy("frame_md5"))
    // and the shared view off the merged index equals the batch op
    assertSameRows(
      merged.filter(col("n_docs") > 1).orderBy("frame_md5"),
      Multimodal.sharedFrames(Multimodal.asMedia(docs)).orderBy("frame_md5"))
  }
}
