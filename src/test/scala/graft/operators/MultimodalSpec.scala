package graft.operators

import graft.SparkSpec

/** Plumbing tests for the multimodal column suite (E40): schema, typed
  * per-partition decode, and the stub transforms. The codecs are stubs
  * (no media libs in this container); the distributed shape is real. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.documentsAsMedia(spark, sf)

  test("binaryFile ingestion: payload bytes, modality, and glob pruning") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("media-in")
    val png = Array[Byte](0x50, 0x4e, 0x47, 1, 2, 3)
    val wav = Array[Byte](0x52, 0x49, 0x46, 0x46, 9)
    Files.write(dir.resolve("a.png"), png)
    Files.write(dir.resolve("b.wav"), wav)
    Files.write(dir.resolve("notes.txt"), "skip me".getBytes("UTF-8"))
    val all = Multimodal.readBinaryDir(spark, dir.toString)
      .collect().map(m => Paths.get(m.source).getFileName.toString ->
        ((m.modality, m.payload.toSeq))).toMap
    assert(all("a.png") == (("image", png.toSeq)))
    assert(all("b.wav") == (("audio", wav.toSeq)))
    assert(all("notes.txt")._1 == "binary")
    // glob prunes at the listing — only matching files are read
    val onlyImages = Multimodal.readBinaryDir(spark, dir.toString, "*.png")
      .collect()
    assert(onlyImages.map(m =>
      Paths.get(m.source).getFileName.toString).toSeq == Seq("a.png"))
    // ingested rows flow straight into the decode pipeline
    val decoded = Multimodal.decodeAll(
      Multimodal.readBinaryDir(spark, dir.toString, "*.png"))
      .collect()
    assert(decoded.length == 1 && decoded.head.n_bytes == png.length)
  }

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
