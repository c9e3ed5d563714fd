package graft.ops

import graft.{Q, Tables}
import graft.sources.{Multimodal => MM}
import org.apache.spark.sql.functions._

/** Multimodal metadata queries. Image payloads are REAL PNGs whose
  * content is a deterministic md5-derived fixture (block-constant on a
  * 9x8 cell grid — sources.Multimodal), so the DuckDB oracle states the
  * expected pixel truth closed-form while the Spark side must decode
  * the actual bytes with javax.imageio to reproduce it. Audio payloads
  * are real WAV files whose decoded PCM samples equal the md5 byte
  * stream (javax.sound.sampled), and video payloads real animated GIFs
  * (8 non-interlaced 4x4 frames; frame j's row y = md5 bytes 4j..4j+3
  * rotated right by y, written with a javax.imageio write sequence),
  * so the hex-slice oracles hold across all three real containers. */
object Multimodal {

  private val DHex = "md5(text) || md5(text || '2')"
  private val DHex80 =
    "md5(text) || md5(text || '2') || md5(text || '3') || md5(text || '4') || md5(text || '5')"
  private def dByte(j: Int) =
    s"CAST(concat('0x', substr(hx, ${2 * j + 1}, 2)) AS BIGINT)"
  private val DSumBytes = (0 until 32).map(dByte).mkString(" + ")

  /** Fixture grid-cell value (cx, cy) as a SQL expression over hx. */
  private def dCell(cx: Int, cy: Int): String =
    dByte(MM.CellOff + cy * MM.GridW + cx)

  /** Image dims CTE fragment: w/h are what genPng encoded, which the
    * real decode must read back from the PNG header. */
  private val DDims =
    s"CAST(${dByte(0)} % 48 + 16 AS BIGINT) AS w, CAST(${dByte(1)} % 48 + 16 AS BIGINT) AS h"

  /** 9x8 cell grid with per-cell pixel counts (the floor-boundary box
    * partition regions genPng painted). */
  private val DCellGrid =
    s"""SELECT doc_id, w, h, cx, cy,
       |    CAST(concat('0x', substr(hx, (${MM.CellOff} + cy*${MM.GridW} + cx)*2 + 1, 2)) AS BIGINT) AS v,
       |    cx*w//${MM.GridW} AS sx0, (cx+1)*w//${MM.GridW} AS sx1,
       |    cy*h//${MM.GridH} AS sy0, (cy+1)*h//${MM.GridH} AS sy1
       |  FROM dims
       |  CROSS JOIN (SELECT unnest(range(0, ${MM.GridW})) AS cx)
       |  CROSS JOIN (SELECT unnest(range(0, ${MM.GridH})) AS cy)""".stripMargin

  /** q43 — media metadata extraction: kind/format routing + per-file
    * stats. Image rows come from the REAL PNG decode (dims from the
    * decoded header, mean over decoded pixels); audio rows from the
    * REAL WAV decode (sample-stream stats); video rows from the REAL
    * GIF demux (flattened frame-pixel stats); the oracle predicts all
    * three from the fixture truth table. */
  val q43MediaMeta: Q = Q(
    "q43_media_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |    CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'gif' END AS format,
       |    $DHex80 AS hx
       |  FROM documents
       |), dims AS (
       |  SELECT doc_id, kind, format, hx, $DDims FROM m
       |), icell AS (
       |$DCellGrid
       |  WHERE doc_id % 3 = 0
       |), istat AS (
       |  SELECT doc_id, SUM(v * (sx1 - sx0) * (sy1 - sy0)) AS pxsum
       |  FROM icell GROUP BY doc_id
       |)
       |SELECT d.doc_id AS doc_id, kind, format,
       |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN w * h
       |            WHEN d.doc_id % 3 = 1 THEN 32 ELSE 128 END AS BIGINT) AS n_units,
       |  CASE WHEN d.doc_id % 3 = 0 THEN CAST(FLOOR(i.pxsum * 1000 / (w * h)) AS BIGINT)
       |       ELSE CAST(FLOOR(($DSumBytes) * 1000 / 32) AS BIGINT) END AS mean_unit_milli
       |FROM dims d LEFT JOIN istat i ON d.doc_id = i.doc_id
       |ORDER BY doc_id""") { (s, d) =>
    MM.decodeAll(MM.mediaTable(s, d)).toDF()
      .orderBy("doc_id")
  }

  /** q44 — corpus stats per (kind, format): the group-by after decode,
    * exactly the shape of a real media-pipeline profiling pass. Image
    * dims flow from the real PNG decode on the Spark side. */
  val q44MediaAgg: Q = Q(
    "q44_media_agg",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |    CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'gif' END AS format,
       |    $DHex AS hx
       |  FROM documents
       |), meta AS (
       |  SELECT kind, format,
       |    CAST(${dByte(0)} % 48 + 16 AS INT) AS width,
       |    CAST(${dByte(1)} % 48 + 16 AS INT) AS height
       |  FROM m
       |)
       |SELECT kind, format, COUNT(*) AS n,
       |  CAST(MIN(width) AS INT) AS min_w, CAST(MAX(width) AS INT) AS max_w,
       |  CAST(SUM(width * height) AS BIGINT) AS total_px
       |FROM meta GROUP BY kind, format ORDER BY kind, format""") { (s, d) =>
    MM.decodeAll(MM.mediaTable(s, d)).toDF()
      .groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
        min("width").as("min_w"), max("width").as("max_w"),
        sum(col("width").cast("long") * col("height")).as("total_px"))
      .orderBy("kind", "format")
  }

  /** q64 — REAL video frame sampling: each payload is an animated GIF
    * demuxed with an ImageIO reader; every 2nd frame is kept and
    * fingerprinted as the hex of its decoded pixel values in row-major
    * order. The fixture puts md5 bytes 4j..4j+3 in frame j, rotated
    * right by y on row y, so the oracle states the 16-pixel fingerprint
    * as the concatenation of four rotated hex slices — a demuxer that
    * transposes, reverses, or reorders rows (exactly what the JDK GIF
    * writer's interlaced default used to do) produces the wrong hex.
    * The keyframe-sampling plumbing of a media pipeline over a real
    * multi-frame container. */
  val q64FrameSample: Q = Q(
    "q64_frame_sample",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 2
       |), f AS (
       |  SELECT doc_id, i, substr(hx, i*8 + 1, 8) AS sl
       |  FROM m CROSS JOIN (SELECT unnest([0, 2, 4, 6]) AS i) t
       |)
       |SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |  sl || substr(sl, 7, 2) || substr(sl, 1, 6)
       |     || substr(sl, 5, 4) || substr(sl, 1, 4)
       |     || substr(sl, 3, 6) || substr(sl, 1, 2) AS frame_hex
       |FROM f
       |ORDER BY doc_id, frame_idx""") { (s, d) =>
    MM.sampleFrames(MM.mediaTable(s, d), everyN = 2)
      .orderBy("doc_id", "frame_idx")
  }

  /** q66 — REAL image resize: decode the PNG, box-filter the decoded
    * pixels to 16x16, report source dims (decoded header), floor-ppm
    * scale factors, and the resized-pixel checksum. The oracle computes
    * the identical box filter closed-form from the fixture cells (cell
    * value x overlap area between source-cell and target-cell regions),
    * so a resample that doesn't faithfully read real pixels fails. */
  val q66ImageResize: Q = Q(
    "q66_image_resize",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex80 AS hx FROM documents WHERE doc_id % 3 = 0
       |), dims AS (
       |  SELECT doc_id, hx, $DDims FROM m
       |), src AS (
       |$DCellGrid
       |), tgt AS (
       |  SELECT doc_id, tx, ty,
       |    SUM(v * GREATEST(0, LEAST(sx1, (tx+1)*w//16) - GREATEST(sx0, tx*w//16))
       |          * GREATEST(0, LEAST(sy1, (ty+1)*h//16) - GREATEST(sy0, ty*h//16))) AS s,
       |    MAX((tx+1)*w//16 - tx*w//16) AS cntx,
       |    MAX((ty+1)*h//16 - ty*h//16) AS cnty
       |  FROM src
       |  CROSS JOIN (SELECT unnest(range(0, 16)) AS tx)
       |  CROSS JOIN (SELECT unnest(range(0, 16)) AS ty)
       |  GROUP BY doc_id, tx, ty
       |), rs AS (
       |  SELECT doc_id, CAST(SUM(s // (cntx * cnty)) AS BIGINT) AS resized_sum
       |  FROM tgt GROUP BY doc_id
       |)
       |SELECT d.doc_id AS doc_id,
       |  CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       |  16 AS dst_w, 16 AS dst_h,
       |  16000000 // w AS scale_w_ppm, 16000000 // h AS scale_h_ppm,
       |  resized_sum
       |FROM dims d JOIN rs ON d.doc_id = rs.doc_id
       |ORDER BY doc_id""") { (s, d) =>
    MM.resizeAll(MM.mediaTable(s, d), dstW = 16, dstH = 16)
      .orderBy("doc_id")
  }

  /** q67 — audio feature extraction over REAL decoded PCM: each WAV
    * payload is parsed with javax.sound.sampled and its 32 samples
    * reported as 8 four-sample windows with integer "energy" = sample
    * sum (the RMS stand-in). The fixture samples equal the md5 byte
    * stream, so the oracle's hex arithmetic states exactly what the
    * decoder must reproduce. */
  val q67AudioEnergy: Q = Q(
    "q67_audio_energy",
    {
      val winSum = (j: Int) => (0 until 4).map(b => dByte(j * 4 + b)).mkString(" + ")
      s"""WITH m AS (
         |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 1
         |)
         |SELECT doc_id, CAST(i AS INT) AS win_idx,
         |  CASE ${(0 until 8).map(j => s"WHEN i = $j THEN ${winSum(j)}").mkString(" ")}
         |  END AS energy
         |FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS i) t
         |ORDER BY doc_id, win_idx"""
    }) { (s, d) =>
    MM.audioEnergy(MM.mediaTable(s, d))
      .orderBy("doc_id", "win_idx")
  }

  /** q115 — perceptual-hash near-dup detection over REAL image
    * payloads: 64-bit dHash from javax.imageio-decoded pixels (9x8
    * box-downscale, horizontal neighbor compares), planted near-dups
    * that are REAL re-encodes (decode -> bump grid cell (3,3) by +1
    * mod 256 -> fresh PNG; flips <= 2 of 64 bits), byte-banded LSH
    * (8 bands of 8 bits — a matching band is required, so the pair
    * stage joins on (band, byte) instead of comparing all pairs), then
    * exact Hamming <= 3 verification with the codegen'd
    * `graft_hamming` expression. The image-dedup twin of the text
    * SimHash pipeline, with the codec path fully real. */
  val q115PhashDedup: Q = Q(
    "q115_phash_dedup",
    {
      def eff(cx: Int, cy: Int) =
        if (cx == 3 && cy == 3)
          s"(CASE WHEN pert = 1 THEN (${dCell(cx, cy)} + 1) % 256 ELSE ${dCell(cx, cy)} END)"
        else dCell(cx, cy)
      def bitLit(b: Int) =
        if (b == 63) "(CAST(-9223372036854775807 AS BIGINT) - 1)"
        else s"CAST(${1L << b} AS BIGINT)"
      val phBits = (for (cy <- 0 until 8; cx <- 0 until 8) yield
        s"(CASE WHEN ${eff(cx, cy)} > ${eff(cx + 1, cy)} THEN ${bitLit(cy * 8 + cx)} ELSE CAST(0 AS BIGINT) END)")
        .mkString(" | ")
      s"""WITH m AS (
         |  SELECT doc_id, $DHex80 AS hx FROM documents WHERE doc_id % 3 = 0
         |), aug AS (
         |  SELECT doc_id, hx, 0 AS pert FROM m
         |  UNION ALL
         |  SELECT doc_id + 1000000, hx, 1 FROM m WHERE doc_id % 30 = 0
         |), codes AS (
         |  SELECT doc_id, ($phBits) AS ph FROM aug
         |), cbands AS (
         |  SELECT doc_id, ph, b, (ph >> (8*b)) & 255 AS byte
         |  FROM codes CROSS JOIN (SELECT unnest(range(0,8)) AS b)
         |), pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.ph AS pa, y.ph AS pb
         |  FROM cbands x JOIN cbands y
         |    ON x.b = y.b AND x.byte = y.byte AND x.doc_id < y.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(pa, pb)) <= 3
         |ORDER BY doc_a, doc_b"""
    }) { (s, d) =>
    import s.implicits._
    val imgs = MM.mediaTable(s, d).filter((f: MM.MediaFile) => f.doc_id % 3 == 0)
    val orig = imgs.map(f => (f.doc_id, MM.dHash64(MM.decodeImage(f.content))))
    val pert = imgs.filter((f: MM.MediaFile) => f.doc_id % 30 == 0)
      .map(f => (f.doc_id + 1000000L,
        MM.dHash64(MM.decodeImage(MM.reencodePerturbed(f.content)))))
    val codes = orig.union(pert).toDF("doc_id", "ph")
    val cbands = codes.select(col("doc_id"), col("ph"),
      explode(array((0 until 8).map(b => struct(lit(b).as("b"),
        shiftright(col("ph"), 8 * b).bitwiseAND(255).as("byte"))): _*)).as("bb"))
      .select(col("doc_id"), col("ph"), col("bb.b").as("b"), col("bb.byte").as("byte"))
    cbands.as("x").join(cbands.as("y"),
        col("x.b") === col("y.b") && col("x.byte") === col("y.byte")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.ph").as("pa"), col("y.ph").as("pb"))
      .distinct()
      .filter(expr("graft_hamming(pa, pb)") <= 3)
      .select(col("doc_a"), col("doc_b"),
        expr("graft_hamming(pa, pb)").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** q126 — REAL AVI demux: every video doc re-shipped in a second
    * standard container (hand-muxed RIFF AVI, uncompressed 8-bit DIB
    * frames — sources.Multimodal.encodeAvi), demuxed by walking the
    * RIFF chunk tree. The fixture puts md5 bytes 8j..8j+7 in frame j
    * with row y rotated left by y, so the oracle states frame 0's
    * 64-pixel fingerprint as eight rotated hex slices — a demuxer that
    * keeps DIB rows bottom-up (the classic bug), mis-strides, or maps
    * palette indexes wrong produces the wrong hex — plus the closed-
    * form stream mean (each byte appears exactly 8 times). */
  val q126AviDemux: Q = Q(
    "q126_avi_demux",
    {
      val rows = (0 until MM.AviH).map(y =>
        if (y == 0) "sl"
        else s"substr(sl, ${2 * y + 1}, ${16 - 2 * y}) || substr(sl, 1, ${2 * y})")
        .mkString(" || ")
      val sum64 = (0 until MM.AviFrames * MM.AviW).map(dByte).mkString(" + ")
      s"""WITH m AS (
         |  SELECT doc_id, $DHex80 AS hx FROM documents WHERE doc_id % 3 = 2
         |), f AS (
         |  SELECT doc_id, hx, substr(hx, 1, 16) AS sl FROM m
         |)
         |SELECT doc_id,
         |  CAST(${MM.AviFrames} AS INT) AS n_frames,
         |  CAST(${MM.AviW} AS INT) AS width, CAST(${MM.AviH} AS INT) AS height,
         |  $rows AS frame0_hex,
         |  CAST(FLOOR(($sum64) * 1000 / ${MM.AviFrames * MM.AviW}) AS BIGINT) AS mean_milli
         |FROM f
         |ORDER BY doc_id"""
    }) { (s, d) =>
    MM.aviDemux(MM.aviTable(s, d)).orderBy("doc_id")
  }

  /** q127 — exact windowed spectrum over REAL decoded PCM: the WAV's
    * 32 samples as 4 eight-sample windows, each reporting the DFT
    * powers at bins 0 (DC), N/4 (quarter band) and N/2 (Nyquist) —
    * the three bins whose twiddle factors are exactly {1, -1, +-i},
    * so a genuine spectral computation stays integer-exact
    * (sources.Multimodal.spectralBins; MultimodalSpec pins it against
    * a brute-force floating DFT). The oracle restates each power from
    * the fixture's hex bytes; hf_milli is the Nyquist share of the
    * three-bin total under floor division. */
  val q127AudioSpectrum: Q = Q(
    "q127_audio_spectrum",
    {
      val b = (j: Int, n: Int) => dByte(j * 8 + n)
      def cases(f: Int => String) =
        s"CASE ${(0 until 4).map(j => s"WHEN i = $j THEN ${f(j)}").mkString(" ")} END"
      val dc = cases(j => (0 until 8).map(b(j, _)).mkString(" + "))
      val req = cases(j => s"${b(j, 0)} - ${b(j, 2)} + ${b(j, 4)} - ${b(j, 6)}")
      val imq = cases(j => s"${b(j, 3)} + ${b(j, 7)} - ${b(j, 1)} - ${b(j, 5)}")
      val alt = cases(j => (0 until 8).map(n =>
        s"${if (n == 0) "" else if (n % 2 == 0) "+ " else "- "}${b(j, n)}").mkString(" "))
      s"""WITH m AS (
         |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 1
         |), w AS (
         |  SELECT doc_id, i, $dc AS dc, $req AS req, $imq AS imq, $alt AS alt
         |  FROM m CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
         |), p AS (
         |  SELECT doc_id, i, dc*dc AS p_dc, req*req + imq*imq AS p_quarter,
         |    alt*alt AS p_nyquist
         |  FROM w
         |)
         |SELECT doc_id, CAST(i AS INT) AS win_idx, p_dc, p_quarter, p_nyquist,
         |  CASE WHEN p_dc + p_quarter + p_nyquist = 0 THEN CAST(0 AS BIGINT)
         |       ELSE (p_nyquist * 1000) // (p_dc + p_quarter + p_nyquist)
         |  END AS hf_milli
         |FROM p
         |ORDER BY doc_id, win_idx"""
    }) { (s, d) =>
    MM.audioSpectrum(MM.mediaTable(s, d)).orderBy("doc_id", "win_idx")
  }

  /** q129 — image-text alignment gate: every image doc's payload is
    * decoded and its 9x8 box-downscaled grid compared against the grid
    * the TEXT side predicts; docs with doc_id % 7 == 0 carry a REAL
    * corrupted re-encode (cell (4,2) +16 mod 256 —
    * sources.Multimodal.captionAlignment), which the detector must
    * find without knowing the plant. The oracle states the closed
    * form: exactly one mismatched cell (index 22) with deviation 16,
    * or 240 when the bump wraps past 255. */
  val q129CaptionAlign: Q = Q(
    "q129_caption_align",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex80 AS hx FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS n_mismatch,
       |  CAST(CASE WHEN doc_id % 7 = 0
       |       THEN (CASE WHEN ${dCell(4, 2)} >= 240 THEN 240 ELSE 16 END)
       |       ELSE 0 END AS BIGINT) AS max_dev,
       |  CAST(CASE WHEN doc_id % 7 = 0 THEN ${2 * MM.GridW + 4} ELSE -1 END AS INT) AS dev_cell,
       |  doc_id % 7 <> 0 AS aligned
       |FROM m
       |ORDER BY doc_id""") { (s, d) =>
    MM.captionAlignment(s, d).orderBy("doc_id")
  }

  /** q142 — embedded media metadata round trip: write tEXt ancillary
    * chunks (PNG spec 11.3.4.3 — Latin-1 keyword NUL text, CRC32 over
    * type+data) into every fixture PNG at the chunk level, then walk
    * the container back, verify each chunk's CRC, and reconstruct the
    * metadata record FROM THE EXTRACTED BYTES. The oracle states the
    * expected record from the raw table columns, so a hash match proves
    * the chunk mux → chunk walk → CRC → Latin-1 decode path is
    * byte-exact per document — the sidecar-free metadata carriage a
    * multimodal corpus uses (EXIF's role, in the container this
    * classpath can really encode). MultimodalSpec additionally pins
    * that insertion leaves the decoded pixels bit-identical and that a
    * corrupted chunk fails ONLY its own CRC.
    *
    * Scale shape: one narrow per-row pass (build + walk are in-row
    * byte work, the md5 record fingerprint is a codegen'd projection);
    * the exchanges are the export sort plus, on low-split layouts only,
    * the stage barrier's O(rows × 88 B) seed exchange (round 12). */
  val q142PngMetadata: Q = Q(
    "q142_png_metadata",
    """SELECT doc_id, CAST(3 AS BIGINT) AS n_chunks, CAST(3 AS BIGINT) AS crc_ok,
      |  md5('lang=' || lang || ';source=' || source || ';chars=' ||
      |      CAST(n_chars AS VARCHAR)) AS meta_fp
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    import s.implicits._
    // barrier + unhexed-seed projection (round 12, mediaTable's recipe):
    // PNG encode + chunk insert + walk per row ran on 1 of 32 cores on
    // the one-row-group fixture without the exchange
    graft.Q.stageBarrier(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          unhex(MM.hex80(col("text"))).as("seed")))
      .as[(Long, String, String, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, lang, src, nch, seed) =>
        val hx = MM.bytesToHex(seed)
        val png = MM.insertTextChunks(MM.genPng(hx),
          Seq("lang" -> lang, "source" -> src, "chars" -> nch.toString))
        val got = MM.textChunks(png)
        val kv = got.map(t => t._1 -> t._2).toMap
        (id, got.size.toLong, got.count(_._3).toLong,
          s"lang=${kv("lang")};source=${kv("source")};chars=${kv("chars")}")
      })
      .toDF("doc_id", "n_chunks", "crc_ok", "rec")
      .select(col("doc_id"), col("n_chunks"), col("crc_ok"),
        md5(col("rec")).as("meta_fp"))
      .orderBy("doc_id")
  }

  /** q278 — image contrast gate over REAL decoded pixels: per-image
    * exact pixel-value percentiles (pₖ = ⌈k·n/100⌉-th smallest, from a
    * 256-bin in-scan histogram of the javax.imageio-decoded raster)
    * and the p90−p10 spread — the standard low-contrast/blank-image
    * filter a multimodal curation pipeline runs right after decode
    * (q43 profiles means; means can't see a washed-out image whose
    * mean is perfectly normal). The oracle states the same order
    * statistics closed-form off the block-constant cell grid: the
    * pixel histogram is Σ(cell-pixel-count) per value, so percentile
    * truth never touches the codec — while the Spark side must decode
    * real bytes to reproduce it.
    *
    * Scale: decode + histogram + order statistics all run in-scan per
    * image row (CPU, zero exchange); the only output is one stats row
    * per image. */
  val q278ContrastGate: Q = Q(
    "q278_contrast_gate",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex80 AS hx FROM documents WHERE doc_id % 3 = 0
       |), dims AS (
       |  SELECT doc_id, hx, $DDims FROM m
       |), src AS (
       |$DCellGrid
       |), hist AS (
       |  SELECT doc_id, w, h, v, SUM((sx1 - sx0) * (sy1 - sy0)) AS c
       |  FROM src GROUP BY doc_id, w, h, v
       |), cum AS (
       |  SELECT doc_id, w, h, v, w * h AS n,
       |    SUM(c) OVER (PARTITION BY doc_id ORDER BY v) AS cum
       |  FROM hist
       |), pct AS (
       |  SELECT doc_id, MIN(w) AS w, MIN(h) AS h, MIN(n) AS n,
       |    MIN(v) AS v_min, MAX(v) AS v_max,
       |    MIN(CASE WHEN cum >= (10 * n + 99) // 100 THEN v END) AS p10,
       |    MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END) AS p50,
       |    MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN v END) AS p90
       |  FROM cum GROUP BY doc_id
       |)
       |SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       |  CAST(n AS BIGINT) AS n_pixels,
       |  CAST(v_min AS INT) AS v_min, CAST(p10 AS INT) AS p10,
       |  CAST(p50 AS INT) AS p50, CAST(p90 AS INT) AS p90,
       |  CAST(v_max AS INT) AS v_max,
       |  CAST(p90 - p10 AS BIGINT) AS contrast,
       |  p90 - p10 < 64 AS low_contrast
       |FROM pct
       |ORDER BY doc_id""") { (s, d) =>
    MM.contrastAll(MM.mediaTable(s, d))
      .select(col("doc_id"), col("w"), col("h"), col("n_pixels"),
        col("v_min"), col("p10"), col("p50"), col("p90"), col("v_max"),
        (col("p90") - col("p10")).cast("long").as("contrast"),
        (col("p90") - col("p10") < 64).as("low_contrast"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q43MediaMeta, q44MediaAgg, q64FrameSample,
    q66ImageResize, q67AudioEnergy, q115PhashDedup, q126AviDemux,
    q127AudioSpectrum, q129CaptionAlign, q142PngMetadata, q278ContrastGate)
}
