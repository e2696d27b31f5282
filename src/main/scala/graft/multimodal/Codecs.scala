package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs (no external libraries): uncompressed 24-bit BMP
  * and 16-bit mono PCM WAV. Real header parsing and pixel/sample access —
  * this is what de-stubs the multimodal decode stage in a container with
  * no codec libraries. The formats are trivial but the pipeline shape
  * (magic-byte dispatch, batch decode, feature extraction over decoded
  * samples) is exactly what a libjpeg/ffmpeg-backed decoder plugs into. */
object Codecs {

  // ------------------------------------------------------------- BMP
  final val BMP_HEADER = 54 // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)

  def bmpRowSize(width: Int): Int = (width * 3 + 3) & ~3 // rows pad to 4B

  def bmpSize(width: Int, height: Int): Int = BMP_HEADER + bmpRowSize(width) * height

  /** Encode a deterministic 24bpp bottom-up BMP; pixel (x,y) channels are a
    * pure function of (seed, x, y). */
  def makeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val size = bmpSize(width, height)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(BMP_HEADER)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(size - BMP_HEADER).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    val row = new Array[Byte](bmpRowSize(width))
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = mix(seed ^ (x.toLong << 32) ^ y.toLong)
        row(x * 3) = (h & 0xff).toByte
        row(x * 3 + 1) = ((h >>> 8) & 0xff).toByte
        row(x * 3 + 2) = ((h >>> 16) & 0xff).toByte
        x += 1
      }
      bb.put(row)
      y += 1
    }
    bb.array()
  }

  case class BmpImage(width: Int, height: Int, channels: Int, pixels: Array[Byte],
                      rowSize: Int, dataOffset: Int)

  /** Parse an uncompressed 24bpp BMP. Throws on anything else — callers
    * dispatch on magic bytes first. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get(0) == 'B' && bb.get(1) == 'M', "not a BMP")
    val dataOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    require(bpp == 24 && bb.getInt(30) == 0, s"unsupported BMP variant (bpp=$bpp)")
    require(width > 0 && height > 0 && dataOffset >= BMP_HEADER &&
      dataOffset.toLong + bmpRowSize(width).toLong * height <= bytes.length,
      "truncated or inconsistent BMP")
    BmpImage(width, height, 3, bytes, bmpRowSize(width), dataOffset)
  }

  /** 8-band feature: mean intensity (r+g+b)/3 of each horizontal band,
    * normalized to [-1, 1]. A real embedding model slots in here; the
    * point is features computed from DECODED pixels, not payload hashes. */
  def bmpBandFeatures(img: BmpImage, bands: Int): Array[Float] = {
    val out = new Array[Float](bands)
    val counts = new Array[Long](bands)
    val sums = new Array[Long](bands)
    var y = 0
    while (y < img.height) {
      val band = if (img.height <= 1) 0 else y * bands / img.height
      val base = img.dataOffset + y * img.rowSize
      var x = 0
      while (x < img.width) {
        val i = base + x * 3
        sums(band) += (img.pixels(i) & 0xff) + (img.pixels(i + 1) & 0xff) +
          (img.pixels(i + 2) & 0xff)
        counts(band) += 3
        x += 1
      }
      y += 1
    }
    var b = 0
    while (b < bands) {
      out(b) = if (counts(b) == 0) 0f
      else (sums(b).toDouble / counts(b) / 127.5 - 1.0).toFloat
      b += 1
    }
    out
  }

  // ------------------------------------------------------------- WAV
  final val WAV_HEADER = 44 // RIFF + fmt(16) + data header

  def wavSize(nFrames: Int): Int = WAV_HEADER + nFrames * 2

  /** Encode deterministic 16-bit mono PCM; sample i is a pure function of
    * (seed, i). */
  def makeWav(sampleRate: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val dataLen = nFrames * 2
    val bb = ByteBuffer.allocate(WAV_HEADER + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      bb.putShort((mix(seed ^ i.toLong) & 0xffffL).toShort)
      i += 1
    }
    bb.array()
  }

  case class WavAudio(sampleRate: Int, channels: Int, nFrames: Long,
                      samples: Array[Byte], dataOffset: Int)

  /** Parse 16-bit PCM WAV (walks chunks to find fmt/data — real RIFF
    * traversal, not fixed offsets). */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && bb.getInt(0) == 0x46464952, "not RIFF") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not WAVE") // "WAVE"
    var pos = 12
    var sampleRate = -1; var channels = -1; var bps = -1
    var dataOffset = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOffset < 0)) {
      val id = bb.getInt(pos); val len = bb.getInt(pos + 4)
      // corrupt/malicious chunk lengths must fail, not spin: a negative
      // len can make the position advance by zero (len = -8) or cycle
      require(len >= 0, s"negative RIFF chunk length $len")
      if (id == 0x20746d66) { // "fmt "
        // the fmt fields read at pos+8..pos+23 must FIT the buffer — a
        // lying chunk length must fail here, not as an out-of-bounds read
        require(len >= 16 && pos + 24 <= bytes.length, s"truncated fmt chunk (len=$len)")
        require(bb.getShort(pos + 8) == 1, "not PCM")
        channels = bb.getShort(pos + 10).toInt
        sampleRate = bb.getInt(pos + 12)
        bps = bb.getShort(pos + 22).toInt
      } else if (id == 0x61746164) { // "data"
        dataOffset = pos + 8; dataLen = len
      }
      pos += 8 + len + (len & 1) // chunks pad to even; len ≥ 0 ⇒ advance ≥ 8
    }
    require(sampleRate > 0 && dataOffset > 0 && bps == 16, "missing fmt/data or not 16-bit")
    require(channels > 0, s"invalid channel count $channels")
    // a data chunk claiming more samples than the file holds must fail at
    // decode — otherwise the out-of-bounds read surfaces later, far from
    // the cause, in wavBandFeatures (mirrors the BMP truncation check)
    require(dataLen >= 0 && dataOffset.toLong + dataLen <= bytes.length,
      s"truncated or lying data chunk (dataLen=$dataLen, file=${bytes.length})")
    WavAudio(sampleRate, channels, dataLen.toLong / (2L * channels), bytes, dataOffset)
  }

  /** 8-band feature: mean |amplitude| per time band, normalized to [0, 1]
    * (shifted to [-1,1] for symmetry with the image feature). */
  def wavBandFeatures(a: WavAudio, bands: Int): Array[Float] = {
    val bb = ByteBuffer.wrap(a.samples).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bands)
    val counts = new Array[Long](bands)
    val sums = new Array[Long](bands)
    val n = a.nFrames * a.channels
    var i = 0L
    while (i < n) {
      val band = if (n <= 1) 0 else (i * bands / n).toInt
      sums(band) += math.abs(bb.getShort(a.dataOffset + (i * 2).toInt).toInt)
      counts(band) += 1
      i += 1
    }
    var b = 0
    while (b < bands) {
      out(b) = if (counts(b) == 0) 0f
      else (sums(b).toDouble / counts(b) / 16384.0 - 1.0).toFloat
      b += 1
    }
    out
  }

  // ------------------------------------------------- PNG / JPEG (ImageIO)
  // Compressed-image codecs via javax.imageio — pure JDK, works offline.
  // PNG is lossless: decoded pixels equal the generation formula exactly
  // (pinned in MultimodalSpec). JPEG is lossy: geometry and channel count
  // decode exactly, pixel values approximately.

  // keep ImageIO entirely in-memory: the default disk cache writes temp
  // files per decode — pure overhead for per-row byte-array payloads
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic RGB image; pixel (x,y) uses the SAME channel formula as
    * [[makeBmp]] (r,g,b = bytes 2,1,0 of mix(seed,x,y)). */
  private def renderImage(width: Int, height: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = mix(seed ^ (x.toLong << 32) ^ y.toLong)
        img.setRGB(x, y,
          (((h >>> 16) & 0xff) << 16 | ((h >>> 8) & 0xff) << 8 | (h & 0xff)).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeImage(width: Int, height: Int, seed: Long, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(renderImage(width, height, seed), fmt, out)
    require(ok, s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  def makePng(width: Int, height: Int, seed: Long): Array[Byte] =
    encodeImage(width, height, seed, "png")

  def makeJpeg(width: Int, height: Int, seed: Long): Array[Byte] =
    encodeImage(width, height, seed, "jpg")

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Decode a compressed image through ImageIO. Throws on undecodable
    * bytes (ImageIO.read returns null) — callers dispatch + fall back. */
  def decodeImageIo(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode payload")
    img
  }

  /** The BMP band feature computed over an ImageIO-decoded image: mean
    * (r+g+b)/3 per horizontal band, normalized to [-1, 1] — identical math
    * to [[bmpBandFeatures]], so the SAME scene encodes to the same feature
    * through BMP and PNG (lossless) paths. */
  def imageBandFeatures(img: java.awt.image.BufferedImage, bands: Int): Array[Float] = {
    val out = new Array[Float](bands)
    val counts = new Array[Long](bands)
    val sums = new Array[Long](bands)
    var y = 0
    while (y < img.getHeight) {
      val band = if (img.getHeight <= 1) 0 else y * bands / img.getHeight
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sums(band) += ((rgb >>> 16) & 0xff) + ((rgb >>> 8) & 0xff) + (rgb & 0xff)
        counts(band) += 3
        x += 1
      }
      y += 1
    }
    var b = 0
    while (b < bands) {
      out(b) = if (counts(b) == 0) 0f
      else (sums(b).toDouble / counts(b) / 127.5 - 1.0).toFloat
      b += 1
    }
    out
  }

  // ------------------------------------------------------------- GIF
  // Multi-frame (animated) GIF via the JDK's ImageIO GIF plugin — the one
  // pure-JDK MULTI-frame container, so it exercises the n_frames > 1 /
  // frame_offsets pipeline columns with real compressed bytes (LZW) where
  // PNG/JPEG are single-frame by construction. Frame offsets come from a
  // real GIF89a block walk (extensions, sub-block chains, color tables) —
  // not from the decoder — so container traversal and pixel decode
  // cross-check each other (pinned in MultimodalSpec).

  /** 6×6×6 web-safe palette — GIF is palette-indexed; rendering frames
    * ALREADY indexed lets the JDK GIF writer emit the palette verbatim.
    * (Feeding it RGB frames makes it median-cut quantize EVERY frame —
    * measured ~2 ms/row at bench scale, 6× the whole decode.) */
  private lazy val gifPalette: java.awt.image.IndexColorModel = {
    val n = 216
    val r = new Array[Byte](n); val g = new Array[Byte](n); val b = new Array[Byte](n)
    var i = 0
    while (i < n) {
      r(i) = ((i / 36) * 51).toByte; g(i) = ((i / 6 % 6) * 51).toByte
      b(i) = ((i % 6) * 51).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, n, r, g, b)
  }

  /** Encode a deterministic multi-frame GIF: frame f's pixel (x,y) is
    * palette index mix(seed + 1000003·f, x, y) mod 216 — every frame a
    * distinct deterministic scene, drawn straight into the indexed raster
    * (no quantization pass in the writer). */
  def makeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val out = new java.io.ByteArrayOutputStream()
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no ImageIO writer for gif")
    val w = writers.next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, gifPalette)
        val raster = img.getRaster
        val fs = seed + 1000003L * f
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              java.lang.Long.remainderUnsigned(mix(fs ^ (x.toLong << 32) ^ y.toLong), 216L).toInt)
            x += 1
          }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    out.toByteArray
  }

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Byte offsets of every image descriptor (0x2C block) in a GIF stream —
    * a real GIF89a container walk: logical screen descriptor, global/local
    * color tables, extension blocks, and length-prefixed sub-block chains
    * are all traversed structurally, no LZW decode needed. Throws on
    * truncated or malformed streams (callers dispatch + fall back). */
  def gifFrameOffsets(b: Array[Byte]): Seq[Long] = {
    require(isGif(b) && b.length >= 14, "not a GIF")
    def u8(i: Int): Int = { require(i < b.length, s"truncated GIF at $i"); b(i) & 0xff }
    val out = Seq.newBuilder[Long]
    var pos = 13
    if ((u8(10) & 0x80) != 0) pos += 3 * (1 << ((u8(10) & 7) + 1)) // global color table
    var done = false
    while (!done) {
      u8(pos) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos += 2
          while (u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2c => // image descriptor
          out += pos.toLong
          val packed = u8(pos + 9)
          pos += 10
          if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1)) // local table
          pos += 1 // LZW minimum code size
          while (u8(pos) != 0) pos += 1 + u8(pos) // image data sub-blocks
          pos += 1
        case x => throw new IllegalArgumentException(
          f"unknown GIF block 0x$x%02x at offset $pos")
      }
    }
    out.result()
  }

  case class GifImage(width: Int, height: Int, channels: Int,
                      nFrames: Int, frameOffsets: Seq[Long],
                      frames: IndexedSeq[java.awt.image.BufferedImage])

  /** Decode every frame of a GIF through ImageIO and walk the container
    * for frame offsets; the two MUST agree on the frame count (a reader
    * and a structural walk disagreeing means a malformed stream). */
  def decodeGif(bytes: Array[Byte]): GifImage = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no ImageIO reader for gif")
    val r = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      // seekForwardOnly must be FALSE: getNumImages(allowSearch = true)
      // needs to scan the whole stream, which a forward-only input forbids
      r.setInput(iis, false, false)
      val n = r.getNumImages(true)
      require(n >= 1, "GIF with no frames")
      val frames = (0 until n).map(r.read(_, null))
      val offsets = gifFrameOffsets(bytes)
      require(offsets.length == n,
        s"container walk found ${offsets.length} image descriptors, reader decoded $n")
      GifImage(frames.head.getWidth, frames.head.getHeight,
        frames.head.getColorModel.getNumComponents, n, offsets, frames)
    } finally { r.dispose(); iis.close() }
  }

  /** Frame-sampled feature: [[imageBandFeatures]] of each frame, averaged
    * over frames — the "sample frames, embed, pool" shape of a real video
    * featurizer, deterministic here. */
  def gifBandFeatures(g: GifImage, bands: Int): Array[Float] = {
    val acc = new Array[Double](bands)
    g.frames.foreach { f =>
      val v = imageBandFeatures(f, bands)
      var i = 0
      while (i < bands) { acc(i) += v(i); i += 1 }
    }
    acc.map(a => (a / g.nFrames).toFloat)
  }

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MediaDecoder backed by real codecs: dispatches on magic bytes
  * (BM → BMP via the pure-JVM parser, GIF8xa → multi-frame ImageIO decode
  * + container walk, ‰PNG / ÿØÿ JPEG → javax.imageio, RIFF → WAV audio);
  * anything else — e.g. video, which has no pure-JDK container decoder —
  * falls back to the supplied decoder (StubDecoder by default, still
  * clearly marked as fake).
  *
  * Robust per row: real-web payloads lie — a 'BM' prefix can front a
  * compressed/32bpp BMP or a truncated file, 'RIFF' can be an AVI, a PNG
  * can be truncated mid-IDAT. Any decode failure (require, buffer
  * underflow, ImageIO null/IIOException) falls back for THAT row instead
  * of failing the whole batch/stage. */
class JvmCodecDecoder(embeddingDim: Int = 8,
                      fallback: Multimodal.MediaDecoder = new Multimodal.StubDecoder())
    extends Multimodal.MediaDecoder {
  import Multimodal._
  import scala.util.control.NonFatal

  override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val b = r.payload
      try {
        if (b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = Codecs.decodeBmp(b)
          MediaFeatures(r.doc_id, r.kind, b.length,
            width = img.width, height = img.height, channels = img.channels,
            sample_rate = -1, n_frames = -1L, frame_offsets = Seq.empty,
            embedding = Codecs.bmpBandFeatures(img, embeddingDim).toSeq)
        } else if (Codecs.isGif(b)) {
          val g = Codecs.decodeGif(b)
          MediaFeatures(r.doc_id, r.kind, b.length,
            width = g.width, height = g.height, channels = g.channels,
            sample_rate = -1, n_frames = g.nFrames.toLong,
            frame_offsets = g.frameOffsets,
            embedding = Codecs.gifBandFeatures(g, embeddingDim).toSeq)
        } else if (Codecs.isPng(b) || Codecs.isJpeg(b)) {
          val img = Codecs.decodeImageIo(b)
          MediaFeatures(r.doc_id, r.kind, b.length,
            width = img.getWidth, height = img.getHeight,
            channels = img.getColorModel.getNumComponents,
            sample_rate = -1, n_frames = -1L, frame_offsets = Seq.empty,
            embedding = Codecs.imageBandFeatures(img, embeddingDim).toSeq)
        } else if (b != null && b.length >= 4 &&
            b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
          val a = Codecs.decodeWav(b)
          MediaFeatures(r.doc_id, r.kind, b.length,
            width = -1, height = -1, channels = a.channels,
            sample_rate = a.sampleRate, n_frames = a.nFrames,
            frame_offsets = Seq.empty,
            embedding = Codecs.wavBandFeatures(a, embeddingDim).toSeq)
        } else fallback.decodeBatch(Seq(r)).head
      } catch { case NonFatal(_) => fallback.decodeBatch(Seq(r)).head }
    }
}
