package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched per-partition
  * passes — the Spark-side architecture of an image/audio/video
  * pipeline.
  *
  * The IMAGE path runs a REAL codec: payloads are genuine PNG files
  * (encoded with `javax.imageio`), and every image stat the queries
  * emit — dimensions, pixel means, dHash, resize output — is computed
  * from `ImageIO.read` of those bytes, never from the generator's
  * arithmetic. Oracle checkability comes from the FIXTURES, not the
  * decode: each test image is block-constant on a 9x8 cell grid whose
  * cell values derive from md5(text), so DuckDB can state the expected
  * pixel truth while Spark must round-trip a real encoder+decoder to
  * reproduce it (PNG is lossless — any decode bug breaks the match).
  *
  * The AUDIO path is REAL as well: payloads are genuine RIFF/WAV files
  * (8-bit mono PCM written and parsed with `javax.sound.sampled`), and
  * audio stats come from the decoded sample stream. The fixture
  * samples equal the md5 byte stream, so the pre-codec oracles still
  * state the exact truth the decoder must reproduce.
  *
  * The VIDEO path runs a REAL multi-frame container: payloads are
  * animated GIFs (8 frames of 4x4 grayscale, LZW-compressed, written
  * frame-by-frame with an ImageIO write sequence and demuxed back with
  * an ImageIO reader). Frame j's row y holds that frame's four md5
  * bytes rotated by (3y mod 4) — every row is a distinct rotation, so
  * a demuxer that transposes, reverses, or reorders rows breaks the
  * oracle — and the frame-sampling oracle states the expected pixel
  * stream as rotated hex slices. (No mp4 codec exists on this
  * classpath; GIF is the honest real container available, and the
  * demux/frame-sample plumbing is identical.)
  */
object Multimodal {

  /** One media file: opaque payload + typed metadata columns. */
  final case class MediaFile(
      doc_id: Long, kind: String, format: String, content: Array[Byte])

  /** Decoded per-file stats: pixels for images (n_units = w*h, mean
    * pixel value in milli), PCM samples for audio and flattened frame
    * pixels for video (n_units = 32, mean value in milli). */
  final case class MediaMeta(
      doc_id: Long, kind: String, format: String,
      width: Int, height: Int, n_units: Long, mean_unit_milli: Long)

  /** A decoded grayscale image: row-major 0..255 samples. */
  final case class DecodedImage(width: Int, height: Int, px: Array[Int])

  /** Fixture grid: images are block-constant on GridW x GridH cells;
    * cell (cx, cy) holds hex byte CellOff + cy*GridW + cx of the
    * 80-byte md5 stream. 9 wide x 8 tall is the classic dHash layout
    * (horizontal neighbor compares -> 8x8 = 64 bits). */
  val GridW = 9
  val GridH = 8
  val CellOff = 8

  // In-memory ImageIO (no temp-file stream cache on executors).
  ImageIO.setUseCache(false)

  private def hexByteAt(hex: String, j: Int): Int =
    Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16)

  private def hexBytes(hex: String, n: Int): Array[Byte] =
    Array.tabulate(n)(j => hexByteAt(hex, j).toByte)

  /** Cell index of pixel x for the floor-boundary partition
    * [c*w/n, (c+1)*w/n): c = (n*(x+1)-1)/w — the exact inverse of the
    * box-filter regions in `boxDownscale`, so a block-constant fixture
    * survives encode -> decode -> downscale bit-for-bit. */
  def cellIndex(x: Int, n: Int, w: Int): Int = (n * (x + 1) - 1) / w

  def cellValue(hex: String, cx: Int, cy: Int): Int =
    hexByteAt(hex, CellOff + cy * GridW + cx)

  /** Encode the deterministic fixture image for one doc as real PNG
    * bytes: w = b0%48+16, h = b1%48+16, block-constant grayscale. */
  def genPng(hex: String): Array[Byte] = {
    val w = hexByteAt(hex, 0) % 48 + 16
    val h = hexByteAt(hex, 1) % 48 + 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      val cy = cellIndex(y, GridH, h)
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, cellValue(hex, cellIndex(x, GridW, w), cy))
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "no PNG writer available")
    bos.toByteArray
  }

  /** Frame geometry of the video fixtures: 8 frames of 4x4 grayscale.
    * The 32 md5 bytes map 4-per-frame; within frame j, row y is those
    * four bytes rotated right by y (pixel (x, y) = byte 4j + (x+3y)%4),
    * so all four rows are distinct rotations and the oracle can state
    * each row as a rotated hex slice.
    *
    * Round 5 shipped 4x1 frames in the belief that this JDK's GIF
    * writer drops the last row of taller frames. The real defect
    * (isolated round 6) is the writer's default INTERLACED output:
    * h in {2, 3, 4} frames come back with rows lost or permuted, while
    * h >= 5 survive because the interlace passes happen to cover them.
    * Writing with progressive mode disabled (see encodeGif) round-trips
    * every height 1..12 exactly — pinned in MultimodalSpec. */
  val VidFrames = 8
  val VidW = 4
  val VidH = 4

  /** 256-entry identity grayscale palette: palette index i = gray i.
    * Values are read back via getRGB (the COLOR, not the index), so the
    * round-trip is exact even if a writer permutes the palette. */
  private def grayFrame(px: Array[Int]): BufferedImage = {
    val cmap = Array.tabulate(256)(i => (0xff << 24) | (i << 16) | (i << 8) | i)
    val icm = new java.awt.image.IndexColorModel(
      8, 256, cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new BufferedImage(VidW, VidH, BufferedImage.TYPE_BYTE_INDEXED, icm)
    var y = 0
    while (y < VidH) {
      var x = 0
      while (x < VidW) {
        img.getRaster.setSample(x, y, 0, px(y * VidW + x))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode 8 sixteen-pixel frames as a REAL animated GIF (one ImageIO
    * write sequence; LZW-compressed multi-frame container). Progressive
    * (interlaced) output is explicitly DISABLED: the JDK writer's
    * default interlacing loses or permutes rows of frames with height
    * 2..4 on round-trip (the "last-row bug" round 5 worked around with
    * 4x1 frames was actually this); non-interlaced output round-trips
    * every height exactly. */
  def encodeGif(frames: Seq[Array[Int]]): Array[Byte] = {
    import javax.imageio.IIOImage
    import javax.imageio.stream.MemoryCacheImageOutputStream
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        writer.writeToSequence(new IIOImage(grayFrame(px), null, null), param)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Container sniff on the real payload bytes. */
  def isGif(content: Array[Byte]): Boolean =
    content.length > 6 &&
      content.slice(0, 4).sameElements("GIF8".getBytes("US-ASCII"))

  /** REAL demux: read every frame of the GIF with an ImageIO reader,
    * returning each frame's gray values row-major (via getRGB — the
    * color, not the palette index, so palette order can't drift it). */
  def decodeGifFrames(content: Array[Byte]): Seq[Array[Int]] = {
    import javax.imageio.stream.MemoryCacheImageInputStream
    require(isGif(content), "decodeGifFrames: payload is not a GIF")
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(new MemoryCacheImageInputStream(new ByteArrayInputStream(content)))
      (0 until reader.getNumImages(true)).map { i =>
        val img = reader.read(i)
        val out = new Array[Int](img.getWidth * img.getHeight)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            out(y * img.getWidth + x) = img.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        out
      }
    } finally reader.dispose()
  }

  // ---------------------------------------------------------------
  // AVI: a second, standard multi-frame video container, hand-muxed.
  // The JDK ships no mp4/avi codec, but RIFF AVI with uncompressed
  // 8-bit palettized DIB frames ('DIB ' handler, BI_RGB) is a fully
  // public format simple enough to mux and demux exactly — and being
  // lossless it stays oracle-checkable, unlike a lossy JPEG stream.
  // Layout per the public spec: RIFF('AVI ' LIST('hdrl' avih
  // LIST('strl' strh strf+palette)) LIST('movi' '00db'...) idx1),
  // little-endian sizes, chunks padded to even length, DIB rows
  // bottom-up and padded to 4-byte stride.
  // ---------------------------------------------------------------

  /** AVI fixture geometry: 8 frames of 8x8 — md5 bytes 8j..8j+7 are
    * frame j's first row, and row y is that slice rotated LEFT by y
    * (pixel (x, y) = byte 8j + (x+y)%8): 8 distinct rotations per
    * frame, so a demuxer that flips the bottom-up row order (the
    * classic DIB bug), transposes, or reorders frames breaks the
    * oracle's rotated-hex-slice statement. */
  val AviFrames = 8
  val AviW = 8
  val AviH = 8

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def u32(bos: ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }
  private def u16(bos: ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
  }
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes(Ascii)); u32(bos, data.length.toLong)
    bos.write(data)
    if (data.length % 2 == 1) bos.write(0) // RIFF pads chunks to even
    bos.toByteArray
  }
  private def riffList(listType: String, children: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(listType.getBytes(Ascii))
    children.foreach(bos.write)
    riffChunk("LIST", bos.toByteArray)
  }

  /** Mux grayscale frames into a REAL uncompressed-DIB AVI. */
  def encodeAvi(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      "encodeAvi: every frame must be w*h samples")
    val stride = (w + 3) / 4 * 4
    val frameBytes = stride * h

    val avih = { // MainAVIHeader (56 bytes)
      val b = new ByteArrayOutputStream()
      u32(b, 100000L)              // dwMicroSecPerFrame (10 fps)
      u32(b, frameBytes * 10L)     // dwMaxBytesPerSec
      u32(b, 0L)                   // dwPaddingGranularity
      u32(b, 0x10L)                // dwFlags = AVIF_HASINDEX
      u32(b, frames.length.toLong) // dwTotalFrames
      u32(b, 0L)                   // dwInitialFrames
      u32(b, 1L)                   // dwStreams
      u32(b, frameBytes.toLong)    // dwSuggestedBufferSize
      u32(b, w.toLong); u32(b, h.toLong)
      (0 until 4).foreach(_ => u32(b, 0L)) // dwReserved
      riffChunk("avih", b.toByteArray)
    }
    val strh = { // AVIStreamHeader (56 bytes)
      val b = new ByteArrayOutputStream()
      b.write("vids".getBytes(Ascii)); b.write("DIB ".getBytes(Ascii))
      u32(b, 0L)                   // dwFlags
      u16(b, 0); u16(b, 0)         // wPriority, wLanguage
      u32(b, 0L)                   // dwInitialFrames
      u32(b, 1L); u32(b, 10L)      // dwScale / dwRate = 10 fps
      u32(b, 0L)                   // dwStart
      u32(b, frames.length.toLong) // dwLength
      u32(b, frameBytes.toLong)    // dwSuggestedBufferSize
      u32(b, 0xffffffffL)          // dwQuality (default)
      u32(b, 0L)                   // dwSampleSize
      u16(b, 0); u16(b, 0); u16(b, w); u16(b, h) // rcFrame
      riffChunk("strh", b.toByteArray)
    }
    val strf = { // BITMAPINFOHEADER + 256-entry gray RGBQUAD palette
      val b = new ByteArrayOutputStream()
      u32(b, 40L); u32(b, w.toLong); u32(b, h.toLong) // positive h: bottom-up
      u16(b, 1); u16(b, 8)         // biPlanes, biBitCount
      u32(b, 0L)                   // biCompression = BI_RGB
      u32(b, frameBytes.toLong)    // biSizeImage
      u32(b, 0L); u32(b, 0L)       // biXPelsPerMeter, biYPelsPerMeter
      u32(b, 256L); u32(b, 0L)     // biClrUsed, biClrImportant
      (0 until 256).foreach { i => b.write(i); b.write(i); b.write(i); b.write(0) }
      riffChunk("strf", b.toByteArray)
    }
    val frameChunks = frames.map { px =>
      val data = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) { // DIB rows are stored bottom-up, stride-padded
        var x = 0
        while (x < w) { data((h - 1 - y) * stride + x) = px(y * w + x).toByte; x += 1 }
        y += 1
      }
      riffChunk("00db", data)
    }
    val idx1 = {
      val b = new ByteArrayOutputStream()
      var off = 4L // first chunk sits right after the 'movi' fourcc
      frameChunks.foreach { fc =>
        b.write("00db".getBytes(Ascii))
        u32(b, 0x10L) // AVIIF_KEYFRAME
        u32(b, off); u32(b, frameBytes.toLong)
        off += fc.length
      }
      riffChunk("idx1", b.toByteArray)
    }
    val hdrl = riffList("hdrl", Seq(avih, riffList("strl", Seq(strh, strf))))
    val movi = riffList("movi", frameChunks)
    val bos = new ByteArrayOutputStream()
    bos.write("AVI ".getBytes(Ascii))
    bos.write(hdrl); bos.write(movi); bos.write(idx1)
    riffChunk("RIFF", bos.toByteArray)
  }

  /** Container sniff on the real payload bytes. */
  def isAvi(content: Array[Byte]): Boolean =
    content.length > 12 &&
      content.slice(0, 4).sameElements("RIFF".getBytes(Ascii)) &&
      content.slice(8, 12).sameElements("AVI ".getBytes(Ascii))

  /** REAL demux: walk the RIFF chunk tree, read dims + palette from
    * 'strf', decode each '00db' DIB frame (bottom-up, stride-padded;
    * negative biHeight = top-down is honored), and map palette index
    * to its COLOR (like the GIF path: palette order can't drift the
    * values). Returns (width, height, frames row-major top-down). */
  def decodeAviFrames(content: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    require(isAvi(content), "decodeAviFrames: payload is not an AVI")
    def fourcc(pos: Int) = new String(content, pos, 4, Ascii)
    def u32At(pos: Int): Int =
      (content(pos) & 0xff) | ((content(pos + 1) & 0xff) << 8) |
        ((content(pos + 2) & 0xff) << 16) | ((content(pos + 3) & 0xff) << 24)
    var w = 0; var hRaw = 0
    val palette = Array.tabulate(256)(identity)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = fourcc(pos); val size = u32At(pos + 4)
        id match {
          case "LIST" =>
            val lt = fourcc(pos + 8)
            if (lt == "hdrl" || lt == "strl" || lt == "movi")
              walk(pos + 12, pos + 8 + size)
          case "strf" =>
            w = u32At(pos + 8 + 4); hRaw = u32At(pos + 8 + 8)
            require((u32At(pos + 8 + 14) & 0xffff) == 8,
              "decodeAviFrames: expected 8-bit DIB frames")
            val clrUsed = u32At(pos + 8 + 32)
            val n = math.min(if (clrUsed == 0) 256 else clrUsed, 256)
            var i = 0
            while (i < n) { // RGBQUAD order is b, g, r, reserved
              palette(i) = content(pos + 8 + 40 + 4 * i + 2) & 0xff
              i += 1
            }
          case "00db" | "00dc" =>
            require(w > 0, "decodeAviFrames: frame chunk before strf")
            val h = math.abs(hRaw); val topDown = hRaw < 0
            val stride = (w + 3) / 4 * 4
            val out = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val srcRow = if (topDown) y else h - 1 - y
              var x = 0
              while (x < w) {
                out(y * w + x) = palette(content(pos + 8 + srcRow * stride + x) & 0xff)
                x += 1
              }
              y += 1
            }
            frames += out
          case _ => () // avih/strh/idx1/JUNK: not needed for decode
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, content.length)
    (w, math.abs(hRaw), frames.toSeq)
  }

  /** The deterministic AVI fixture for one doc: 8 frames of 8x8, frame
    * j's row y = md5 bytes 8j..8j+7 rotated left by y. */
  def genAvi(hex: String): Array[Byte] =
    encodeAvi((0 until AviFrames).map(j =>
      Array.tabulate(AviW * AviH) { k =>
        val x = k % AviW; val y = k / AviW
        hexByteAt(hex, j * AviW + (x + y) % AviW)
      }), AviW, AviH)

  /** Encode 8-bit unsigned mono PCM samples as a real WAV file. */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Container sniff on the real payload bytes. */
  def isWav(content: Array[Byte]): Boolean =
    content.length > 12 &&
      content.slice(0, 4).sameElements("RIFF".getBytes("US-ASCII")) &&
      content.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))

  /** REAL decode: parse the WAV container with javax.sound.sampled and
    * return the unsigned 8-bit sample stream. */
  def decodeWav(content: Array[Byte]): Array[Int] = {
    import javax.sound.sampled.AudioSystem
    require(isWav(content), "decodeWav: payload is not a WAV file")
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
      s"decodeWav: expected 8-bit mono PCM, got $fmt")
    ais.readAllBytes().map(_ & 0xff)
  }

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Format sniff on the real payload bytes (not the metadata column). */
  def isPng(content: Array[Byte]): Boolean =
    content.length > PngMagic.length &&
      PngMagic.indices.forall(i => content(i) == PngMagic(i))

  /** Insert tEXt metadata chunks (PNG spec 11.3.4.3: Latin-1
    * keyword NUL text, CRC32 over type+data) immediately before IEND —
    * the chunk walk finds IEND by length hopping, so payloads with any
    * ancillary chunks survive. The pixel stream is untouched: every
    * decoder ignores unknown/ancillary chunks, so the image round-trips
    * bit-identically (MultimodalSpec pins it). */
  def insertTextChunks(png: Array[Byte], kvs: Seq[(String, String)]): Array[Byte] = {
    require(isPng(png), "insertTextChunks: payload is not a PNG")
    val iend = chunkOffsets(png).collectFirst {
      case (off, "IEND") => off
    }.getOrElse(sys.error("insertTextChunks: PNG without IEND"))
    val bos = new ByteArrayOutputStream()
    bos.write(png, 0, iend)
    kvs.foreach { case (k, v) =>
      val data = (k + "\u0000" + v).getBytes("ISO-8859-1")
      val typ = "tEXt".getBytes("US-ASCII")
      writeU32be(bos, data.length.toLong)
      bos.write(typ)
      bos.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ); crc.update(data)
      writeU32be(bos, crc.getValue)
    }
    bos.write(png, iend, png.length - iend)
    bos.toByteArray
  }

  /** All tEXt chunks as (keyword, text, crcOk) in file order. */
  def textChunks(png: Array[Byte]): Seq[(String, String, Boolean)] = {
    require(isPng(png), "textChunks: payload is not a PNG")
    chunkOffsets(png).filter(_._2 == "tEXt").map { case (off, _) =>
      val len = u32be(png, off)
      val data = java.util.Arrays.copyOfRange(png, off + 8, off + 8 + len)
      val crc = new java.util.zip.CRC32()
      crc.update(png, off + 4, 4 + len)
      val stored = u32be(png, off + 8 + len).toLong & 0xffffffffL
      val nul = data.indexOf(0.toByte)
      val (k, v) =
        if (nul < 0) (new String(data, "ISO-8859-1"), "")
        else (new String(data, 0, nul, "ISO-8859-1"),
          new String(data, nul + 1, data.length - nul - 1, "ISO-8859-1"))
      (k, v, stored == crc.getValue)
    }
  }

  /** (offset, type) of every chunk, by length hopping from byte 8. */
  private def chunkOffsets(png: Array[Byte]): Seq[(Int, String)] = {
    val out = Seq.newBuilder[(Int, String)]
    var pos = 8
    var done = false
    while (!done && pos + 8 <= png.length) {
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      out += pos -> typ
      if (typ == "IEND") done = true else pos += 12 + u32be(png, pos)
    }
    out.result()
  }

  private def u32be(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def writeU32be(bos: ByteArrayOutputStream, v: Long): Unit = {
    bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
    bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
  }

  /** REAL decode: parse the PNG payload with javax.imageio and pull the
    * grayscale samples out of the decoded raster. */
  def decodeImage(content: Array[Byte]): DecodedImage = {
    require(isPng(content), "decodeImage: payload is not a PNG")
    val img = ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "decodeImage: ImageIO returned null for PNG payload")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    DecodedImage(w, h, px)
  }

  /** Exact integer box filter to nw x nh: target cell (tx, ty) is the
    * floor-mean over source region [tx*w/nw, (tx+1)*w/nw) x [...]. All
    * arithmetic is integer, so DuckDB can mirror it closed-form. */
  def boxDownscale(d: DecodedImage, nw: Int, nh: Int): Array[Long] = {
    val out = new Array[Long](nw * nh)
    var ty = 0
    while (ty < nh) {
      val y0 = ty * d.height / nh; val y1 = (ty + 1) * d.height / nh
      var tx = 0
      while (tx < nw) {
        val x0 = tx * d.width / nw; val x1 = (tx + 1) * d.width / nw
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += d.px(y * d.width + x); x += 1 }
          y += 1
        }
        out(ty * nw + tx) = s / ((x1 - x0).toLong * (y1 - y0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 64-bit dHash from REAL pixels: box-downscale to 9x8, bit
    * (cy*8 + cx) set iff cell(cx,cy) > cell(cx+1,cy) — the standard
    * horizontal-gradient perceptual hash. A localized edit perturbs at
    * most two neighbor comparisons per affected cell. */
  def dHash64(d: DecodedImage): Long = {
    val cells = boxDownscale(d, GridW, GridH)
    var code = 0L
    var cy = 0
    while (cy < GridH) {
      var cx = 0
      while (cx < GridW - 1) {
        if (cells(cy * GridW + cx) > cells(cy * GridW + cx + 1))
          code |= 1L << (cy * (GridW - 1) + cx)
        cx += 1
      }
      cy += 1
    }
    code
  }

  /** REAL corrupted re-encode: decode the PNG, bump every pixel of
    * grid cell (pcx, pcy) by +delta mod 256, encode a fresh PNG. */
  def reencodePerturbed(content: Array[Byte], pcx: Int, pcy: Int,
      delta: Int): Array[Byte] = {
    val d = decodeImage(content)
    val img = new BufferedImage(d.width, d.height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < d.height) {
      val cy = cellIndex(y, GridH, d.height)
      var x = 0
      while (x < d.width) {
        val v = d.px(y * d.width + x)
        val cx = cellIndex(x, GridW, d.width)
        raster.setSample(x, y, 0, if (cx == pcx && cy == pcy) (v + delta) % 256 else v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** The planted near-dup for the perceptual-hash pipeline: cell (3,3)
    * bumped by +1 — flips at most 2 of the 64 dHash bits (the two
    * comparisons touching that cell). */
  def reencodePerturbed(content: Array[Byte]): Array[Byte] =
    reencodePerturbed(content, 3, 3, 1)

  /** Binary media table derived deterministically from documents:
    * images are real PNGs, audio real WAVs (32 samples of 8-bit PCM =
    * the md5 byte stream), video real animated GIFs (8 frames of 4x4,
    * frame j's row y = md5 bytes 4j..4j+3 rotated right by y). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    // barrier (round 12): the single-row-group documents scan plans one
    // partition, so WITHOUT it every media encode (here) AND decode
    // (all consumers chain mapPartitions on these partitions) ran on 1
    // of 32 cores — graft.Prof showed the whole multimodal pack
    // serialized into 1-task stages. Same adaptive no-op-on-real-layouts
    // rule as Dedup.corpus / Text.docs (Q.stageBarrier). The barrier
    // sits ABOVE the seed projection (guide §2.3: project before the
    // exchange, narrower types): the round-robin exchange ships the
    // 80-byte UNHEXED payload seed — never document text, and not the
    // 160-char hex string either (md5 output is incompressible, so hex
    // doubles the exchange for free). Re-hexing costs one byte loop per
    // row inside the already-heavy encode task. ScaleSpec's gauges pin
    // the O(rows × 88 B) bound.
    graft.Q.stageBarrier(Tables.documents(spark, sfDir)
        .select(col("doc_id"), unhex(hex80(col("text"))).as("seed")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, seed) =>
          val hx = bytesToHex(seed)
          (id % 3).toInt match {
            case 0 => MediaFile(id, "image", "png", genPng(hx))
            case 1 => MediaFile(id, "audio", "wav", encodeWav(hexBytes(hx, 32)))
            case _ => MediaFile(id, "video", "gif",
              encodeGif((0 until VidFrames).map(j =>
                Array.tabulate(VidW * VidH) { k =>
                  val x = k % VidW; val y = k / VidW
                  hexByteAt(hx, j * 4 + (x + 3 * y) % VidW)
                })))
          }
        }
      }
  }

  /** AVI twin of mediaTable's video slice: every video doc
    * (doc_id % 3 == 2) as a real hand-muxed AVI payload ([[genAvi]]) —
    * the same document can ship in two standard containers, and the
    * demux plumbing is format-dispatched like a real media pipeline. */
  def aviTable(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    // same barrier rationale as mediaTable (round 12): filter + narrow
    // unhexed-seed projection below the exchange, so only video-doc
    // seeds move, at 80 bytes each
    graft.Q.stageBarrier(Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id"), unhex(hex80(col("text"))).as("seed")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, seed) =>
        MediaFile(id, "video", "avi", genAvi(bytesToHex(seed)))
      })
  }

  /** Demux stats over REAL AVI payloads: frame count and dims from the
    * container walk, frame 0 fingerprinted as its row-major pixel hex
    * (pins bottom-up row recovery and palette mapping), mean over the
    * full decoded pixel stream in milli. */
  def aviDemux(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.map { f =>
      val (w, h, frames) = decodeAviFrames(f.content)
      val all = frames.flatten
      (f.doc_id, frames.length, w, h,
        frames.head.map(v => f"$v%02x").mkString,
        all.map(_.toLong).sum * 1000L / all.length)
    }.toDF("doc_id", "n_frames", "width", "height", "frame0_hex", "mean_milli")
  }

  /** 80 bytes (160 hex chars) of fixture truth per doc: bytes 0-1 are
    * the image dims, bytes 8..79 the 72 grid cells. The first 64 hex
    * chars equal the pre-round-5 payload stream, so the audio/video
    * oracles are unchanged. */
  /** Lowercase hex of a byte array — the closure-side inverse of the
    * `unhex` that narrows the stage-barrier exchange to raw seed bytes
    * (md5 hex is incompressible, so shipping the string would double
    * the exchange). Matches Spark's md5()/hex80 rendering exactly. */
  def bytesToHex(bs: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bs.length * 2)
    var i = 0
    while (i < bs.length) {
      sb.append(Character.forDigit((bs(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bs(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def hex80(text: Column): Column =
    concat(md5(text), md5(concat(text, lit("2"))), md5(concat(text, lit("3"))),
      md5(concat(text, lit("4"))), md5(concat(text, lit("5"))))

  def kindCol(docId: Column): Column =
    when(docId % 3 === 0, "image").when(docId % 3 === 1, "audio").otherwise("video")

  def formatCol(docId: Column): Column =
    when(docId % 3 === 0, "png").when(docId % 3 === 1, "wav").otherwise("gif")

  /** Video stats from the REAL demux: the flattened frame pixel stream
    * (128 values — frame j's row y = md5 bytes 4j..4j+3 rotated by y,
    * so every md5 byte appears exactly VidH times) drives the same
    * deterministic formulas the oracle states over the hex stream:
    * px(0)/px(1) are md5 bytes 0/1, and the mean over 4 rotated copies
    * equals the mean over the 32-byte stream. */
  def decodeVideo(f: MediaFile): MediaMeta = {
    val px = decodeGifFrames(f.content).flatten.toArray
    MediaMeta(f.doc_id, f.kind, f.format,
      width = px(0) % 48 + 16,
      height = px(1) % 48 + 16,
      n_units = px.length.toLong,
      mean_unit_milli = px.map(_.toLong).sum * 1000L / px.length)
  }

  /** Batched per-partition decode: one pass per partition (a real
    * codec's init cost amortizes here). Images go through the REAL PNG
    * decode, audio through the REAL WAV decode, video through the REAL
    * GIF demux — the "dims" stats keep the stream formulas the oracle
    * states. */
  def decodeAll(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        if (f.kind == "image") {
          val d = decodeImage(f.content)
          val n = d.width.toLong * d.height
          MediaMeta(f.doc_id, f.kind, f.format, d.width, d.height, n,
            d.px.foldLeft(0L)(_ + _) * 1000L / n)
        } else if (f.kind == "audio") {
          val sm = decodeWav(f.content)
          MediaMeta(f.doc_id, f.kind, f.format,
            sm(0) % 48 + 16, sm(1) % 48 + 16, sm.length.toLong,
            sm.map(_.toLong).sum * 1000L / sm.length)
        } else decodeVideo(f)
      }
    }
  }

  /** REAL frame sampling: demux the GIF, keep every `everyN`-th frame,
    * fingerprint each as the hex of its decoded pixel values. */
  def frameSample(f: MediaFile, everyN: Int): Seq[(Int, String)] =
    decodeGifFrames(f.content).zipWithIndex
      .filter { case (_, i) => i % everyN == 0 }
      .map { case (frame, i) =>
        i -> frame.map(v => f"$v%02x").mkString
      }

  /** Frames as rows: (doc_id, frame_idx, frame_hex). */
  def sampleFrames(files: Dataset[MediaFile], everyN: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "video")
      .flatMap(f => frameSample(f, everyN).map { case (i, hx) => (f.doc_id, i, hx) })
      .toDF("doc_id", "frame_idx", "frame_hex")
  }

  /** REAL image resize: decode the PNG, box-filter the actual pixels
    * to dstW x dstH, report source dims (from the decoded header),
    * floor-ppm scale factors, and the resized-pixel checksum that
    * proves the resample ran over real data. */
  def resizeImage(f: MediaFile, dstW: Int, dstH: Int): (Long, Int, Int, Int, Int, Long, Long, Long) = {
    val d = decodeImage(f.content)
    val resized = boxDownscale(d, dstW, dstH)
    (f.doc_id, d.width, d.height, dstW, dstH,
      dstW.toLong * 1000000L / d.width, dstH.toLong * 1000000L / d.height,
      resized.sum)
  }

  /** Resized-image metadata rows for the image subset. */
  def resizeAll(files: Dataset[MediaFile], dstW: Int, dstH: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "image")
      .mapPartitions(it => it.map(resizeImage(_, dstW, dstH)))
      .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h",
        "scale_w_ppm", "scale_h_ppm", "resized_sum")
  }

  /** REAL image contrast stats: decode the PNG, histogram the actual
    * pixel values (256 bins in-scan — never a shuffle), and pull exact
    * order statistics: pₖ = the ⌈k·n/100⌉-th smallest pixel value. The
    * p90−p10 spread is the standard low-contrast training-data gate. */
  def contrastStats(f: MediaFile): (Long, Int, Int, Long, Int, Int, Int, Int, Int) = {
    val d = decodeImage(f.content)
    val hist = new Array[Long](256)
    d.px.foreach(v => hist(v) += 1)
    val n = d.px.length.toLong
    def pct(k: Int): Int = {
      val target = (k * n + 99) / 100
      var cum = 0L; var v = 0
      while (v < 256) { cum += hist(v); if (cum >= target) return v; v += 1 }
      255
    }
    val vmin = d.px.min; val vmax = d.px.max
    (f.doc_id, d.width, d.height, n, vmin, pct(10), pct(50), pct(90), vmax)
  }

  /** Contrast-stat rows for the image subset. */
  def contrastAll(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "image")
      .mapPartitions(it => it.map(contrastStats))
      .toDF("doc_id", "w", "h", "n_pixels", "v_min", "p10", "p50", "p90", "v_max")
  }

  /** REAL audio feature extraction: decode the WAV, then report the
    * sample stream as 8 four-sample windows with per-window "energy" =
    * sample sum (the integer stand-in for RMS — the window/flatMap
    * shape of a real feature extractor, now over decoded PCM). */
  def audioEnergyWindows(f: MediaFile): Seq[(Long, Int, Long)] =
    decodeWav(f.content).grouped(4).zipWithIndex
      .map { case (win, i) => (f.doc_id, i, win.map(_.toLong).sum) }
      .toSeq

  /** Per-window energy rows for the audio subset. */
  def audioEnergy(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "audio")
      .flatMap(audioEnergyWindows)
      .toDF("doc_id", "win_idx", "energy")
  }

  /** REAL windowed spectral analysis with EXACT arithmetic: for an
    * N-sample window (4 | N) the DFT bins k = 0, N/4, N/2 have twiddle
    * factors in {1, -1, i, -i}, so their spectral powers |X_k|^2 are
    * exact integers — the classic fixed-point trick that lets a real
    * spectrum stay oracle-checkable (any other bin needs irrational
    * cos/sin). Per window: DC power, quarter-band power, Nyquist
    * power, and the high-frequency share in milli (Nyquist power over
    * the three-bin total, integer floor division). */
  def spectralBins(window: Array[Int]): (Long, Long, Long) = {
    var dc = 0L; var reQ = 0L; var imQ = 0L; var alt = 0L
    var n = 0
    while (n < window.length) {
      val v = window(n).toLong
      dc += v
      (n % 4: @annotation.switch) match {
        case 0 => reQ += v
        case 1 => imQ -= v // e^(-i*pi*n/2) = (-i)^n
        case 2 => reQ -= v
        case 3 => imQ += v
      }
      alt += (if (n % 2 == 0) v else -v)
      n += 1
    }
    (dc * dc, reQ * reQ + imQ * imQ, alt * alt)
  }

  /** Per-window exact spectral rows (8-sample windows) for one WAV. */
  def audioSpectrumWindows(f: MediaFile): Seq[(Long, Int, Long, Long, Long, Long)] =
    decodeWav(f.content).grouped(8).zipWithIndex.map { case (win, i) =>
      val (pDc, pQ, pN) = spectralBins(win)
      val denom = pDc + pQ + pN
      val hf = if (denom == 0) 0L else pN * 1000L / denom
      (f.doc_id, i, pDc, pQ, pN, hf)
    }.toSeq

  /** Exact three-bin spectrum rows for the audio subset. */
  def audioSpectrum(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "audio")
      .flatMap(audioSpectrumWindows)
      .toDF("doc_id", "win_idx", "p_dc", "p_quarter", "p_nyquist", "hf_milli")
  }

  /** Image-text alignment gate over REAL payloads: image docs ship a
    * PNG that should be the faithful render of their text-side truth,
    * but docs with doc_id % 7 == 0 carry a corrupted re-encode (cell
    * (4,2) bumped by +16 mod 256 — a real decode→edit→encode, not a
    * byte flip). The detector has no access to the plant: it decodes
    * the payload, box-downsamples to the 9x8 grid (exact on the
    * block-constant fixture), recomputes the expected grid from the
    * text hash, and reports mismatch count / max deviation / worst
    * cell. The multimodal consistency filter of an image-caption
    * pipeline, with both feature paths real. */
  def captionAlignment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // barrier + unhexed-seed projection (round 12, mediaTable's recipe):
    // the detector encodes AND decodes a PNG per row — on the one-row-
    // group fixture that ran on 1 of 32 cores without the exchange
    graft.Q.stageBarrier(Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), unhex(hex80(col("text"))).as("seed")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, seed) =>
        val hx = bytesToHex(seed)
        val base = genPng(hx)
        val payload =
          if (id % 7 == 0) reencodePerturbed(base, 4, 2, 16) else base
        val (nMis, maxDev, devCell) = alignmentStats(payload, hx)
        (id, nMis, maxDev, devCell, nMis == 0)
      })
      .toDF("doc_id", "n_mismatch", "max_dev", "dev_cell", "aligned")
  }

  /** The alignment detector itself: decode the payload, box-downscale
    * to the grid, diff against the text-predicted cells. Returns
    * (mismatched cells, max abs deviation, worst cell index or -1). */
  def alignmentStats(payload: Array[Byte], hx: String): (Int, Long, Int) = {
    val obs = boxDownscale(decodeImage(payload), GridW, GridH)
    var nMis = 0; var maxDev = 0L; var devCell = -1
    var i = 0
    while (i < GridW * GridH) {
      val dev = math.abs(obs(i) - cellValue(hx, i % GridW, i / GridW))
      if (dev > 0) nMis += 1
      if (dev > maxDev) { maxDev = dev; devCell = i }
      i += 1
    }
    (nMis, maxDev, devCell)
  }
}
