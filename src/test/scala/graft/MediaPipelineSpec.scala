package graft


import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.{MediaFeatures, MediaRecord}

/** The multimodal plumbing around the decode stub: typed schema, batch
  * shape, and the feature contract the q36 oracle mirrors. */
class MediaPipelineSpec extends SparkTestBase {

  test("decodeStub: constant payload decodes to its byte value per quarter") {
    val f = MediaPipeline.decodeStub(Array.fill(16)('a'.toByte))
    assert(f.toSeq == Seq.fill(4)(97.0))
  }

  test("decodeStub: quarters are independent and unsigned") {
    // 8 bytes: two per quarter; 0xFF must read as 255, not -1.
    val payload = Array[Byte](0, 0, 100, 100, -1, -1, 10, 30)
    assert(MediaPipeline.decodeStub(payload).toSeq == Seq(0.0, 100.0, 255.0, 20.0))
  }

  test("decodeStub: payload shorter than 4 bytes yields empty-quarter zeros") {
    val f = MediaPipeline.decodeStub(Array[Byte](40, 80))
    // n=2: quarters [0,0),[0,1),[1,1),[1,2) -> 0.0, 40.0, 0.0, 80.0
    assert(f.toSeq == Seq(0.0, 40.0, 0.0, 80.0))
    assert(MediaPipeline.decodeStub(Array.emptyByteArray).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("extractFeatures preserves row count, ids, and fixed feature width") {
    import spark.implicits._
    val media = MediaPipeline.documentsAsMedia(spark, sf)
    val feats = MediaPipeline.extractFeatures(media).collect()
    val docs = media.collect()
    assert(feats.length == docs.length)
    assert(feats.map(_.doc_id).sorted.toSeq == docs.map(_.doc_id).sorted.toSeq)
    assert(feats.forall(_.features.length == 4))
    val byId = docs.map(r => r.doc_id -> r).toMap
    feats.foreach { f =>
      assert(f.n_bytes == byId(f.doc_id).media.length)
      assert(f.features.toSeq == MediaPipeline.decodeStub(byId(f.doc_id).media).toSeq)
    }
  }

  test("bucketSums generalizes quarterSums and stays exact") {
    val payload = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    assert(MediaPipeline.bucketSums(payload, 4).toSeq == Seq(3L, 7L, 11L, 15L))
    assert(MediaPipeline.bucketSums(payload, 8).toSeq == (1 to 8).map(_.toLong))
    assert(MediaPipeline.bucketSums(payload, 4).toSeq ==
      MediaPipeline.quarterSums(payload).toSeq)
    // Sums over spans always total the full byte sum, any bucket count.
    assert(MediaPipeline.bucketSums(payload, 3).sum == payload.map(_.toLong).sum)
  }

  test("resize stage: 8-span thumbnails for every record, exact sums") {
    val media = MediaPipeline.documentsAsMedia(spark, sf)
    val thumbs = MediaPipeline.resize(media, 8).collect()
    val byId = media.collect().map(r => r.doc_id -> r).toMap
    assert(thumbs.length == byId.size)
    thumbs.foreach { t =>
      assert(t.sums.length == 8)
      assert(t.sums.toSeq == MediaPipeline.bucketSums(byId(t.doc_id).media, 8).toSeq)
    }
  }

  test("sampleFrames: even stride, bounded frame size, empty-payload safe") {
    val payload = (0 until 100).map(_.toByte).toArray
    val frames = MediaPipeline.sampleFrames(payload, 4, 10)
    assert(frames.length == 4)
    // Strides land at 0, 25, 50, 75; each frame is 10 bytes.
    assert(frames.map(_.head.toInt).toSeq == Seq(0, 25, 50, 75))
    assert(frames.forall(_.length == 10))
    // Tail frame truncates at payload end rather than overrunning.
    val tail = MediaPipeline.sampleFrames(payload, 4, 40)
    assert(tail.last.length == 25)
    assert(MediaPipeline.sampleFrames(Array.emptyByteArray, 3, 8).forall(_.isEmpty))
  }

  test("batched iteration is lazy: one batch in flight, order preserved") {
    import spark.implicits._
    val n = MediaPipeline.decodeBatchSize * 2 + 7
    val recs = (0 until n).map(i => MediaRecord(i.toLong, "s", Array.fill(4)(i.toByte)))
    val out: Seq[MediaFeatures] =
      MediaPipeline.extractFeatures(spark.createDataset(recs).repartition(3)).collect().toSeq
    assert(out.map(_.doc_id).sorted == (0 until n).map(_.toLong))
  }
}
