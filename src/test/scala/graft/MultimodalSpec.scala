package graft

import java.awt.image.BufferedImage

import graft.sources.Multimodal
import graft.sources.Multimodal.MediaFile

/** Multimodal plumbing tests: real PNG round-trip through javax.imageio
  * for the image path, payload determinism, stub-decode consistency for
  * audio/video, frame sampling shape. */
class MultimodalSpec extends SparkSpec {

  test("media table: real PNG images, real WAV audio, real GIF video, all deterministic") {
    val a = Multimodal.mediaTable(spark, sf).collect().sortBy(_.doc_id)
    val b = Multimodal.mediaTable(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length == b.length && a.length > 0)
    a.foreach { f =>
      f.kind match {
        case "image" => assert(Multimodal.isPng(f.content), s"doc ${f.doc_id} not PNG")
        case "audio" => assert(Multimodal.isWav(f.content), s"doc ${f.doc_id} not WAV")
        case _       => assert(Multimodal.isGif(f.content), s"doc ${f.doc_id} not GIF")
      }
    }
    assert(a.zip(b).forall { case (x, y) => x.content.sameElements(y.content) })
  }

  test("seed exchange narrowing: bytesToHex(unhex(hex80)) == hex80 on every doc") {
    // round 12: mediaTable/aviTable ship the 80-byte UNHEXED seed through
    // the stage-barrier exchange and re-hex it in the encode closure —
    // this pins the round-trip to the exact string the encoders consumed
    // before the change (lowercase, length 160), for all fixture docs.
    import org.apache.spark.sql.functions._
    val rows = Tables.documents(spark, sf)
      .select(Multimodal.hex80(col("text")).as("hx"),
        unhex(Multimodal.hex80(col("text"))).as("seed"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val hx = r.getString(0)
      assert(hx.length == 160)
      assert(Multimodal.bytesToHex(r.getAs[Array[Byte]](1)) == hx)
    }
  }

  test("audio decode is REAL: arbitrary PCM round-trips through the WAV container") {
    val samples = Array.tabulate(32)(j => ((j * 83 + 5) % 256).toByte)
    val wav = Multimodal.encodeWav(samples)
    assert(Multimodal.isWav(wav) && wav.length > 44) // RIFF header + data
    assert(Multimodal.decodeWav(wav).toSeq == samples.map(_ & 0xff).toSeq)
    intercept[IllegalArgumentException](Multimodal.decodeWav(Array.fill(40)(9.toByte)))
  }

  test("image decode is REAL: a hand-built PNG round-trips pixel-exact") {
    // Not a fixture: arbitrary pixels through encode -> decode.
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array(Array(0, 127, 255), Array(13, 200, 77))
    for (y <- 0 until 2; x <- 0 until 3) img.getRaster.setSample(x, y, 0, vals(y)(x))
    val png = Multimodal.encodePng(img)
    assert(Multimodal.isPng(png))
    val d = Multimodal.decodeImage(png)
    assert(d.width == 3 && d.height == 2)
    assert(d.px.toSeq == Seq(0, 127, 255, 13, 200, 77))
    // and a non-PNG payload must fail loudly, not decode garbage
    intercept[IllegalArgumentException](Multimodal.decodeImage(Array.fill(40)(7.toByte)))
  }

  test("fixture round-trip: decoded dims + box-downscale recover the cell truth") {
    val h96 = (0 until 80).map(j => f"${(j * 37 + 11) % 256}%02x").mkString
    val png = Multimodal.genPng(h96)
    val d = Multimodal.decodeImage(png)
    assert(d.width == Integer.parseInt(h96.substring(0, 2), 16) % 48 + 16)
    assert(d.height == Integer.parseInt(h96.substring(2, 4), 16) % 48 + 16)
    val cells = Multimodal.boxDownscale(d, Multimodal.GridW, Multimodal.GridH)
    for (cy <- 0 until Multimodal.GridH; cx <- 0 until Multimodal.GridW)
      assert(cells(cy * Multimodal.GridW + cx) == Multimodal.cellValue(h96, cx, cy),
        s"cell ($cx,$cy) lost in PNG round-trip")
  }

  test("re-encode perturbation flips at most 2 dHash bits") {
    val h96 = (0 until 80).map(j => f"${(j * 151 + 3) % 256}%02x").mkString
    val png = Multimodal.genPng(h96)
    val ph0 = Multimodal.dHash64(Multimodal.decodeImage(png))
    val ph1 = Multimodal.dHash64(Multimodal.decodeImage(Multimodal.reencodePerturbed(png)))
    assert(java.lang.Long.bitCount(ph0 ^ ph1) <= 2)
  }

  test("decodeAll: every kind's stats come from its real decode path") {
    val files = Multimodal.mediaTable(spark, sf)
    val metas = Multimodal.decodeAll(files).collect().sortBy(_.doc_id)
    assert(metas.nonEmpty)
    metas.foreach { m =>
      if (m.kind == "image") {
        assert(m.width >= 16 && m.width < 64 && m.height >= 16 && m.height < 64)
        assert(m.n_units == m.width.toLong * m.height)
      } else if (m.kind == "audio") {
        assert(m.n_units == 32L) // 32 PCM samples
      } else {
        assert(m.n_units == 128L) // 8 frames x 4x4 pixels
      }
      assert(m.mean_unit_milli >= 0L && m.mean_unit_milli <= 255000L)
    }
    // mapPartitions path == per-row path
    val viaRows = files.collect().sortBy(_.doc_id).map { f =>
      if (f.kind == "image") {
        val d = Multimodal.decodeImage(f.content)
        val n = d.width.toLong * d.height
        Multimodal.MediaMeta(f.doc_id, f.kind, f.format, d.width, d.height, n,
          d.px.foldLeft(0L)(_ + _) * 1000L / n)
      } else if (f.kind == "audio") {
        val sm = Multimodal.decodeWav(f.content)
        Multimodal.MediaMeta(f.doc_id, f.kind, f.format,
          sm(0) % 48 + 16, sm(1) % 48 + 16, sm.length.toLong,
          sm.map(_.toLong).sum * 1000L / sm.length)
      } else Multimodal.decodeVideo(f)
    }
    assert(metas.toSeq == viaRows.toSeq)
  }

  test("video demux is REAL: arbitrary 4x4 frames round-trip through the GIF container") {
    val frames = (0 until 8).map(j =>
      Array.tabulate(16)(k => (j * 31 + k * 53 + 7) % 256))
    val gif = Multimodal.encodeGif(frames)
    assert(Multimodal.isGif(gif))
    val back = Multimodal.decodeGifFrames(gif)
    assert(back.length == 8)
    frames.zip(back).zipWithIndex.foreach { case ((want, got), i) =>
      assert(got.toSeq == want.toSeq, s"frame $i lost in GIF round-trip")
    }
    intercept[IllegalArgumentException](Multimodal.decodeGifFrames(Array.fill(40)(3.toByte)))
  }

  test("multi-row GIF frames survive exactly: interlaced output stays disabled") {
    // Regression pin for the JDK GIF writer's interlaced default, which
    // loses row 1 of 2-row frames and permutes rows of 3/4-row frames on
    // round-trip. encodeGif writes MODE_DISABLED; if that regresses, the
    // distinct-rotation rows below come back reordered and this fails.
    val rows = Array(
      Array(10, 20, 30, 40), Array(40, 10, 20, 30),
      Array(30, 40, 10, 20), Array(20, 30, 40, 10))
    val frame = rows.flatten
    val back = Multimodal.decodeGifFrames(Multimodal.encodeGif(Seq(frame)))
    assert(back.length == 1)
    assert(back.head.toSeq == frame.toSeq, "row order not preserved through GIF round-trip")
  }

  test("AVI mux/demux is REAL: arbitrary multi-frame video round-trips exactly") {
    val frames = (0 until 8).map(j =>
      Array.tabulate(64)(k => (j * 37 + k * 101 + 13) % 256))
    val avi = Multimodal.encodeAvi(frames, 8, 8)
    assert(Multimodal.isAvi(avi) && !Multimodal.isWav(avi)) // both are RIFF
    val (w, h, back) = Multimodal.decodeAviFrames(avi)
    assert(w == 8 && h == 8 && back.length == 8)
    frames.zip(back).zipWithIndex.foreach { case ((want, got), i) =>
      assert(got.toSeq == want.toSeq, s"frame $i lost in AVI round-trip")
    }
    intercept[IllegalArgumentException](Multimodal.decodeAviFrames(Array.fill(40)(3.toByte)))
  }

  test("AVI stride padding: a width that is not a multiple of 4 round-trips") {
    // 5x3 frames force a 8-byte DIB stride with 3 pad bytes per row; a
    // demuxer that walks rows unpadded (or forgets bottom-up order — the
    // distinct rows below catch a flip) reads garbage.
    val frames = Seq(
      Array.tabulate(15)(k => (k * 17 + 1) % 256),
      Array.tabulate(15)(k => (k * 29 + 5) % 256))
    val (w, h, back) = Multimodal.decodeAviFrames(Multimodal.encodeAvi(frames, 5, 3))
    assert(w == 5 && h == 3 && back.length == 2)
    frames.zip(back).foreach { case (want, got) => assert(got.toSeq == want.toSeq) }
  }

  test("AVI fixture geometry: frame j row y = md5 bytes 8j..8j+7 rotated left by y") {
    val payloads = Multimodal.aviTable(spark, sf).collect()
    assert(payloads.nonEmpty && payloads.forall(f => Multimodal.isAvi(f.content)))
    val f = payloads.minBy(_.doc_id)
    val (w, h, frames) = Multimodal.decodeAviFrames(f.content)
    assert(w == Multimodal.AviW && h == Multimodal.AviH &&
      frames.length == Multimodal.AviFrames)
    // rows of each frame are distinct left-rotations of its 8-byte slice
    frames.zipWithIndex.foreach { case (px, j) =>
      val slice = px.slice(0, 8)
      (0 until 8).foreach { y =>
        val want = Array.tabulate(8)(x => slice((x + y) % 8))
        assert(px.slice(8 * y, 8 * y + 8).toSeq == want.toSeq,
          s"frame $j row $y is not the y-rotated slice")
      }
    }
  }

  test("spectral bins are a REAL DFT: integer powers equal the brute-force transform") {
    // the exact-twiddle shortcut must agree with |X_k|^2 from the
    // textbook O(N^2) floating DFT at k = 0, N/4, N/2 — for the decode
    // window size (8) and another 4-divisible width (12)
    def bruteforcePower(w: Array[Int], k: Int): Double = {
      val n = w.length
      val re = (0 until n).map(j => w(j) * math.cos(-2 * math.Pi * k * j / n)).sum
      val im = (0 until n).map(j => w(j) * math.sin(-2 * math.Pi * k * j / n)).sum
      re * re + im * im
    }
    val rnd = new scala.util.Random(20260813)
    Seq(8, 12).foreach { n =>
      (0 until 50).foreach { _ =>
        val w = Array.fill(n)(rnd.nextInt(256))
        val (pDc, pQ, pN) = Multimodal.spectralBins(w)
        assert(math.abs(pDc - bruteforcePower(w, 0)) < 1e-4, s"DC bin off (n=$n)")
        assert(math.abs(pQ - bruteforcePower(w, n / 4)) < 1e-4, s"quarter bin off (n=$n)")
        assert(math.abs(pN - bruteforcePower(w, n / 2)) < 1e-4, s"Nyquist bin off (n=$n)")
      }
    }
  }

  test("alignment detector localizes an arbitrary planted corruption") {
    // the detector must find a corrupted cell it was never told about —
    // plant at (7, 5) with a different delta than the registered query
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val hx = h("spec-doc") + h("spec-doc2") + h("spec-doc3") + h("spec-doc4") + h("spec-doc5")
    val clean = Multimodal.genPng(hx)
    assert(Multimodal.alignmentStats(clean, hx) == ((0, 0L, -1)), "clean render must align")
    val corrupted = Multimodal.reencodePerturbed(clean, 7, 5, 100)
    val (nMis, maxDev, devCell) = Multimodal.alignmentStats(corrupted, hx)
    val v = Integer.parseInt(hx.substring(2 * (Multimodal.CellOff + 5 * Multimodal.GridW + 7),
      2 * (Multimodal.CellOff + 5 * Multimodal.GridW + 7) + 2), 16)
    assert(nMis == 1 && devCell == 5 * Multimodal.GridW + 7, "wrong cell localized")
    assert(maxDev == math.abs((v + 100) % 256 - v), "deviation must be the real pixel delta")
  }

  test("tEXt metadata chunks: pixels untouched, values round-trip, CRC localizes corruption") {
    val hex = "ab" * 80
    val base = Multimodal.genPng(hex)
    val kvs = Seq("lang" -> "en", "note" -> "héllo wörld", "empty" -> "")
    val tagged = Multimodal.insertTextChunks(base, kvs)
    // insertion is pixel-invariant (decoders ignore ancillary chunks)
    val (d0, d1) = (Multimodal.decodeImage(base), Multimodal.decodeImage(tagged))
    assert(d0.width == d1.width && d0.height == d1.height && d0.px.sameElements(d1.px))
    // values round-trip byte-exactly, Latin-1 text included, CRCs green
    val got = Multimodal.textChunks(tagged)
    assert(got.map(t => (t._1, t._2)) == kvs && got.forall(_._3))
    // corrupting one chunk's data fails ONLY that chunk's CRC
    val idx = tagged.length - (12 + // IEND
      kvs.reverse.take(2).map(kv => 12 + kv._1.length + 1 +
        kv._2.getBytes("ISO-8859-1").length).sum) - 3 // inside chunk 1's value
    val bad = tagged.clone(); bad(idx) = (bad(idx) ^ 0x01).toByte
    val checked = Multimodal.textChunks(bad)
    assert(checked.map(_._3) == Seq(false, true, true),
      s"exactly the corrupted chunk must fail: ${checked.map(_._3)}")
    // idempotent layering: a second insert appends after the first set
    val twice = Multimodal.insertTextChunks(tagged, Seq("k2" -> "v2"))
    assert(Multimodal.textChunks(twice).map(_._1) == Seq("lang", "note", "empty", "k2"))
  }

  test("frame sampling keeps every Nth demuxed frame of video payloads") {
    // frame j: row y = bytes [4j..4j+3] rotated right by y — the
    // mediaTable fixture layout
    val gif = Multimodal.encodeGif((0 until 8).map(j =>
      Array.tabulate(16) { k =>
        val x = k % 4; val y = k / 4
        4 * j + (x + 3 * y) % 4
      }))
    val f = MediaFile(1L, "video", "gif", gif)
    val frames = Multimodal.frameSample(f, 2)
    assert(frames.map(_._1) == Seq(0, 2, 4, 6))
    assert(frames.head._2 == "00010203" + "03000102" + "02030001" + "01020300")
    val df = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf), 2)
    assert(df.groupBy("doc_id").count().collect().forall(_.getLong(1) == 4))
  }

  test("q278: contrast percentiles replay from a local decode of the real PNGs") {
    val files = Multimodal.mediaTable(spark, sf)
      .filter(_.kind == "image").collect()
    assert(files.nonEmpty)
    val rows = ops.Multimodal.q278ContrastGate.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    files.foreach { f =>
      val d = Multimodal.decodeImage(f.content)
      val sortedPx = d.px.sorted
      val n = sortedPx.length
      def pct(k: Int): Int = sortedPx(((k.toLong * n + 99) / 100).toInt - 1)
      val r = rows(f.doc_id)
      assert((r.getInt(1), r.getInt(2), r.getLong(3)) ==
        ((d.width, d.height, n.toLong)), s"doc ${f.doc_id} dims")
      assert(r.getInt(4) == sortedPx.head && r.getInt(8) == sortedPx.last,
        s"doc ${f.doc_id} min/max")
      assert((r.getInt(5), r.getInt(6), r.getInt(7)) ==
        ((pct(10), pct(50), pct(90))), s"doc ${f.doc_id} percentiles")
      assert(r.getLong(9) == (pct(90) - pct(10)).toLong, s"doc ${f.doc_id} contrast")
      assert(r.getBoolean(10) == (pct(90) - pct(10) < 64), s"doc ${f.doc_id} gate")
      // order statistics are ordered
      assert(sortedPx.head <= pct(10) && pct(10) <= pct(50) &&
        pct(50) <= pct(90) && pct(90) <= sortedPx.last)
    }
    assert(rows.size == files.length)
  }
}
