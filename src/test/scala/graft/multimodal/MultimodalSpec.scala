package graft.multimodal


import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.multimodal.Multimodal._

object BatchSizeCollector {
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

class CountingDecoder extends Multimodal.MediaDecoder {
  private val stub = new Multimodal.StubDecoder()
  override def decodeBatch(batch: Seq[Multimodal.MediaRow]): Seq[Multimodal.MediaFeatures] = {
    BatchSizeCollector.sizes.add(batch.size)
    stub.decodeBatch(batch)
  }
}

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", "img-payload-one".getBytes("UTF-8")),
    MediaRow(2L, "audio", Array.fill[Byte](1000)(7)),
    MediaRow(3L, "video", Array.fill[Byte](6400)(3)),
    MediaRow(4L, "image", Array.emptyByteArray),
    MediaRow(5L, "image", "img-payload-one".getBytes("UTF-8"))
  ).toDS()

  test("decode emits one feature row per media row with kind-correct shape") {
    val out = Multimodal.decode(media, new StubDecoder()).collect().sortBy(_.doc_id)
    assert(out.length == 5)
    val img = out(0)
    assert(img.kind == "image" && img.width > 0 && img.height > 0 &&
      img.channels == 3 && img.sample_rate == -1 && img.embedding.size == 8)
    val aud = out(1)
    assert(aud.kind == "audio" && aud.sample_rate == 16000 &&
      aud.n_frames == 500 && aud.width == -1)
    val vid = out(2)
    assert(vid.kind == "video" && vid.n_frames == 100 &&
      vid.frame_offsets == Seq(0L, 25L, 50L, 75L))
  }

  test("decode is deterministic: identical payloads → identical features") {
    val out = Multimodal.decode(media, new StubDecoder()).collect()
    val a = out.find(_.doc_id == 1L).get
    val b = out.find(_.doc_id == 5L).get
    assert(a.embedding == b.embedding && a.width == b.width && a.height == b.height)
  }

  test("decode is partition-count independent and batch-size independent") {
    val one = Multimodal.decode(media.repartition(1), new StubDecoder(), batchSize = 2)
      .collect().sortBy(_.doc_id).toSeq
    val many = Multimodal.decode(media.repartition(7), new StubDecoder(), batchSize = 64)
      .collect().sortBy(_.doc_id).toSeq
    assert(one == many)
  }

  test("batching: decoder sees ≤ batchSize rows per call, all rows exactly once") {
    // Task closures are serialized even in local mode, so the collector
    // must be a static (per-JVM) object, not a captured instance field.
    BatchSizeCollector.sizes.clear()
    val out = Multimodal.decode(media.repartition(1),
      new CountingDecoder(), batchSize = 2).collect()
    assert(out.length == 5)
    import scala.jdk.CollectionConverters._
    val sizes = BatchSizeCollector.sizes.asScala.toSeq
    assert(sizes.forall(_ <= 2) && sizes.sum == 5)
  }

  test("BMP round-trip: encode → decode recovers geometry and exact pixels") {
    for ((w, h, seed) <- Seq((16, 8, 1L), (33, 17, 99L), (1, 1, 5L))) {
      val bytes = Codecs.makeBmp(w, h, seed)
      assert(bytes.length == Codecs.bmpSize(w, h))
      val img = Codecs.decodeBmp(bytes)
      assert(img.width == w && img.height == h && img.channels == 3)
      // band features are pure functions of the pixels — same seed, same
      // features; different seed differs
      val f1 = Codecs.bmpBandFeatures(img, 8).toSeq
      val f2 = Codecs.bmpBandFeatures(Codecs.decodeBmp(Codecs.makeBmp(w, h, seed)), 8).toSeq
      assert(f1 == f2 && f1.size == 8)
      assert(f1.forall(v => v >= -1f && v <= 1f))
      if (w * h > 4)
        assert(f1 != Codecs.bmpBandFeatures(Codecs.decodeBmp(Codecs.makeBmp(w, h, seed + 1)), 8).toSeq)
    }
  }

  test("WAV round-trip: RIFF chunk walk recovers rate/frames; 16-bit samples feed bands") {
    for ((rate, n, seed) <- Seq((8000, 256, 2L), (16000, 383, 7L))) {
      val bytes = Codecs.makeWav(rate, n, seed)
      assert(bytes.length == Codecs.wavSize(n))
      val a = Codecs.decodeWav(bytes)
      assert(a.sampleRate == rate && a.nFrames == n && a.channels == 1)
      val f = Codecs.wavBandFeatures(a, 8).toSeq
      assert(f.size == 8 && f.forall(v => v >= -1f && v <= 1f))
    }
  }

  test("PNG round-trip: ImageIO decode recovers geometry and EXACT pixels (lossless)") {
    for ((w, h, seed) <- Seq((16, 8, 1L), (33, 17, 99L), (1, 1, 5L))) {
      val bytes = Codecs.makePng(w, h, seed)
      assert(Codecs.isPng(bytes) && !Codecs.isJpeg(bytes))
      val img = Codecs.decodeImageIo(bytes)
      assert(img.getWidth == w && img.getHeight == h
        && img.getColorModel.getNumComponents == 3)
      // PNG is lossless: every decoded pixel equals the same (seed,x,y)
      // formula the BMP encoder writes. makeBmp keys the formula by STORED
      // row (the file is bottom-up, so stored row y is display row h-1-y);
      // makePng keys it by display row — the formula-y aligns directly.
      val bmp = Codecs.decodeBmp(Codecs.makeBmp(w, h, seed))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val base = bmp.dataOffset + y * bmp.rowSize + x * 3
        assert((rgb & 0xff) == (bmp.pixels(base) & 0xff) &&
          ((rgb >>> 8) & 0xff) == (bmp.pixels(base + 1) & 0xff) &&
          ((rgb >>> 16) & 0xff) == (bmp.pixels(base + 2) & 0xff),
          s"pixel ($x,$y) mismatch at seed $seed")
      }
      // ...and therefore identical band features through either path
      assert(Codecs.imageBandFeatures(img, 8).toSeq ==
        Codecs.bmpBandFeatures(bmp, 8).toSeq)
    }
  }

  test("JPEG decode: real DCT round-trip recovers geometry; pixels approximate") {
    val (w, h, seed) = (40, 24, 3L)
    val bytes = Codecs.makeJpeg(w, h, seed)
    assert(Codecs.isJpeg(bytes) && !Codecs.isPng(bytes))
    val img = Codecs.decodeImageIo(bytes)
    assert(img.getWidth == w && img.getHeight == h
      && img.getColorModel.getNumComponents == 3)
    // lossy, but the band means of a real decode stay near the source's
    val f = Codecs.imageBandFeatures(img, 8)
    val ref = Codecs.bmpBandFeatures(Codecs.decodeBmp(Codecs.makeBmp(w, h, seed)), 8)
    f.zip(ref).foreach { case (a, b) => assert(math.abs(a - b) < 0.2) }
  }

  test("PNG/JPEG rows dispatch through ImageIO; truncated PNG falls back per row") {
    val rows = Seq(
      MediaRow(1L, "image", Codecs.makePng(20, 10, 1L)),
      MediaRow(2L, "image", Codecs.makeJpeg(18, 9, 2L)),
      MediaRow(3L, "image", Codecs.makePng(20, 10, 1L).take(40)), // cut mid-IDAT
      MediaRow(4L, "image", Codecs.makeBmp(8, 4, 9L))) // BMP still pure-JVM path
    val out = new JvmCodecDecoder().decodeBatch(rows).sortBy(_.doc_id)
    assert(out.length == 4)
    assert(out(0).width == 20 && out(0).height == 10 && out(0).channels == 3)
    assert(out(1).width == 18 && out(1).height == 9)
    assert(out(2).width != 20 || out(2).height != 10, "truncated PNG must fall back")
    assert(out(3).width == 8 && out(3).height == 4)
  }

  test("JvmCodecDecoder dispatches on magic bytes; non-codec payloads hit the fallback") {
    val rows = Seq(
      MediaRow(1L, "image", Codecs.makeBmp(20, 10, 1L)),
      MediaRow(2L, "audio", Codecs.makeWav(12000, 300, 2L)),
      MediaRow(3L, "video", Array.fill[Byte](640)(3))) // no container → stub
    val out = new JvmCodecDecoder().decodeBatch(rows).sortBy(_.doc_id)
    assert(out(0).width == 20 && out(0).height == 10 && out(0).channels == 3
      && out(0).sample_rate == -1)
    assert(out(1).sample_rate == 12000 && out(1).n_frames == 300 && out(1).width == -1)
    assert(out(2).kind == "video" && out(2).n_frames == 10L) // stub semantics
  }

  test("malformed payloads with codec magic bytes fall back per row, never hang or fail the batch") {
    val evilWav = { // RIFF/WAVE whose first chunk declares length -8 (zero advance)
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(-8)
      bb.array()
    }
    val truncatedBmp = Codecs.makeBmp(20, 10, 1L).take(30) // header cut mid-way
    val lyingBmp = { // claims 1000x1000 but has no pixel data
      val b = Codecs.makeBmp(4, 2, 1L)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, 1000).putInt(22, 1000)
      b
    }
    val rows = Seq(
      MediaRow(1L, "audio", evilWav),
      MediaRow(2L, "image", truncatedBmp),
      MediaRow(3L, "image", lyingBmp),
      MediaRow(4L, "image", Codecs.makeBmp(8, 4, 9L))) // one good row
    val out = new JvmCodecDecoder().decodeBatch(rows).sortBy(_.doc_id)
    assert(out.length == 4, "every row must come back")
    // bad rows carry stub (fallback) features, the good row real ones
    assert(out(3).width == 8 && out(3).height == 4)
    assert(out(2).width != 1000, "lying header must not be trusted")
  }

  test("real-codec decode pipeline is partition-count independent") {
    val rows = (0L until 40L).map { id =>
      if (id % 2 == 0) MediaRow(id, "image", Codecs.makeBmp((16 + id % 32).toInt, (8 + id % 16).toInt, id))
      else MediaRow(id, "audio", Codecs.makeWav((8000 + (id % 3) * 4000).toInt, (256 + id % 128).toInt, id))
    }.toDS()
    val one = Multimodal.decode(rows.repartition(1), new JvmCodecDecoder())
      .collect().sortBy(_.doc_id).toSeq
    val many = Multimodal.decode(rows.repartition(7), new JvmCodecDecoder())
      .collect().sortBy(_.doc_id).toSeq
    assert(one == many)
    assert(one.count(_.width > 0) == 20 && one.count(_.sample_rate > 0) == 20)
  }

  test("GIF round-trip: multi-frame decode recovers geometry, EXACT frame count, structural offsets") {
    for ((w, h, n, seed) <- Seq((16, 8, 1, 1L), (33, 17, 4, 99L), (20, 10, 5, 7L))) {
      val bytes = Codecs.makeGif(w, h, n, seed)
      assert(Codecs.isGif(bytes) && !Codecs.isPng(bytes) && !Codecs.isJpeg(bytes))
      val g = Codecs.decodeGif(bytes)
      assert(g.width == w && g.height == h && g.nFrames == n)
      assert(g.frames.forall(f => f.getWidth == w && f.getHeight == h))
      // frame offsets come from the CONTAINER walk, independently of the
      // reader: count agrees (decodeGif cross-checks), offsets strictly
      // increase, and each points at a real image-descriptor byte (0x2C)
      assert(g.frameOffsets.length == n)
      assert(g.frameOffsets == g.frameOffsets.sorted.distinct)
      g.frameOffsets.foreach(o => assert((bytes(o.toInt) & 0xff) == 0x2c,
        s"offset $o does not point at an image descriptor"))
      // deterministic: the same args encode to the same bytes → same features
      assert(java.util.Arrays.equals(bytes, Codecs.makeGif(w, h, n, seed)))
      assert(Codecs.gifBandFeatures(g, 8).toSeq ==
        Codecs.gifBandFeatures(Codecs.decodeGif(bytes), 8).toSeq)
    }
  }

  test("GIF rows dispatch through the real decoder; truncated GIF falls back per row") {
    val good = Codecs.makeGif(24, 12, 3, 5L)
    val rows = Seq(
      MediaRow(1L, "video", good),
      MediaRow(2L, "video", good.take(30)), // cut inside the first frame
      MediaRow(3L, "image", Codecs.makePng(20, 10, 1L))) // sibling path unaffected
    val out = new JvmCodecDecoder().decodeBatch(rows).sortBy(_.doc_id)
    assert(out(0).width == 24 && out(0).height == 12 && out(0).n_frames == 3L)
    assert(out(0).frame_offsets.length == 3 && out(0).embedding.length == 8)
    assert(out(1).n_frames != 3L, "truncated GIF must fall back")
    assert(out(2).width == 20 && out(2).height == 10)
  }

  test("mediaFromDocuments maps the documents table into the media schema") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = mediaFromDocuments(docs)
    assert(m.columns.toSeq == Seq("doc_id", "kind", "payload"))
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(m.count() == docs.count())
  }
}
