package graft.operators

import graft.SparkSpec

/** Plumbing tests for the multimodal column suite (E40): schema, typed
  * per-partition decode, and the stub transforms. The codecs are stubs
  * (no media libs in this container); the distributed shape is real. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.documentsAsMedia(spark, sf)

  test("decode produces typed metadata, deterministic across runs") {
    val a = Multimodal.decodeAll(media).collect()
      .map(d => d.media_id -> (d.n_bytes, d.width, d.feature.toSeq)).toMap
    val b = Multimodal.decodeAll(media).collect()
      .map(d => d.media_id -> (d.n_bytes, d.width, d.feature.toSeq)).toMap
    assert(a === b, "stub decode must be deterministic")
    a.values.foreach { case (n, w, feat) =>
      assert(w === n % 640)
      assert(feat.length === 8)
    }
  }

  test("resize stub scales payload size with target dims") {
    val out = Multimodal.resizeStub(media, 320, 240).collect()
    val orig = media.collect().map(m => m.media_id -> m.payload.length).toMap
    out.foreach { m =>
      val expect = math.max(1,
        (orig(m.media_id).toLong * 320 * 240 / (640 * 480)).toInt)
      assert(m.payload.length === expect)
    }
  }

  test("frame sampling keeps every k-th frame of video rows only") {
    val out = Multimodal.frameSampleStub(media, everyK = 2, frameBytes = 10)
      .collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    out.foreach { m =>
      val o = orig(m.media_id)
      if (o.modality != "video") {
        assert(java.util.Arrays.equals(m.payload, o.payload))
      } else {
        val frames = o.payload.grouped(10).toArray
        val expect = frames.zipWithIndex
          .collect { case (f, i) if i % 2 == 0 => f }.flatten
        assert(java.util.Arrays.equals(m.payload, expect.toArray))
      }
    }
  }
}
