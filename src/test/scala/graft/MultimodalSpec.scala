package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: schema shapes, per-partition decode determinism,
  * frame sampling that partitions the payload. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("manifest: binary payloads + typed metadata for every document") {
    val assets = Multimodal.manifest(spark, TestSpark.sf0001).cache()
    assert(assets.count() == 500)
    val kinds = assets.collect().map(_.meta.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(assets.collect().forall(a => a.payload.nonEmpty && a.meta.width >= 64))
  }

  test("decode is deterministic and feature width is fixed") {
    val assets = Multimodal.manifest(spark, TestSpark.sf0001)
    val codec = new StubCodec
    val d1 = Multimodal.decodeAll(assets, codec).collect().sortBy(_.asset_id)
    val d2 = Multimodal.decodeAll(assets, codec).collect().sortBy(_.asset_id)
    assert(d1.map(_.checksum).toSeq == d2.map(_.checksum).toSeq)
    assert(d1.forall(_.features.length == 64))
    assert(d1.map(x => x.features.toSeq).toSeq == d2.map(x => x.features.toSeq).toSeq)
  }

  test("frame sampling: ≤4 frames per video that reassemble the payload") {
    val assets = Multimodal.manifest(spark, TestSpark.sf0001)
    val frames = Multimodal.sampleFrames(assets, new StubCodec, framesPer = 4)
      .collect().groupBy(_.asset_id)
    val videos = assets.filter(_.meta.kind == "video").collect()
      .map(a => a.asset_id -> a.payload).toMap
    assert(frames.keySet == videos.keySet)
    frames.foreach { case (id, fs) =>
      assert(fs.length <= 4)
      val reassembled = fs.sortBy(_.frame_no).flatMap(_.frame_bytes)
      assert(reassembled.toSeq == videos(id).toSeq,
        s"frames of $id must partition the payload")
    }
  }

  test("resize: image assets downsample to w*h bytes, deterministic") {
    val assets = Multimodal.manifest(spark, TestSpark.sf0001)
    val codec = new StubCodec
    val r1 = Multimodal.resizeAll(assets, codec, w = 32, h = 32)
      .collect().sortBy(_.asset_id)
    val r2 = Multimodal.resizeAll(assets, codec, w = 32, h = 32)
      .collect().sortBy(_.asset_id)
    val images = assets.filter(_.meta.kind == "image").count()
    assert(r1.length == images && images > 0)
    assert(r1.forall(r => r.n_bytes == 32 * 32 && r.width == 32 && r.height == 32))
    assert(r1.map(_.checksum).toSeq == r2.map(_.checksum).toSeq)
    // a different target size produces different bytes
    val small = Multimodal.resizeAll(assets, codec, w = 8, h = 8)
      .collect().sortBy(_.asset_id)
    assert(small.forall(_.n_bytes == 64))
  }
}
