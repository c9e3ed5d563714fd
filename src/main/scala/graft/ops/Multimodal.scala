package graft.ops

import graft.{Q, Tables}
import graft.sources.{Multimodal => MM}
import org.apache.spark.sql.functions._

/** Multimodal metadata queries. The binary payload is md5-derived, so
  * the DuckDB oracle reconstructs the same bytes as hex strings and
  * mirrors the stub-decode arithmetic with conv()-style hex slices —
  * the metadata path is fully hash-checked even though the decode is a
  * stub (sources.Multimodal). */
object Multimodal {

  /** Spark-side: byte j (0-based) of the payload as a long, computed on
    * the hex string so it exactly matches the oracle. */
  private def hexByte(hex: org.apache.spark.sql.Column, j: Int) =
    conv(substring(hex, 2 * j + 1, 2), 16, 10).cast("long")

  private val DHex = "md5(text) || md5(text || '2')"
  private def dByte(j: Int) =
    s"CAST(concat('0x', substr(hx, ${2 * j + 1}, 2)) AS BIGINT)"
  private val DSumBytes = (0 until 32).map(dByte).mkString(" + ")

  /** q43 — media metadata extraction: kind/format routing + stub-decode
    * stats, verified byte-for-byte via hex arithmetic. */
  val q43MediaMeta: Q = Q(
    "q43_media_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |    CASE WHEN doc_id % 3 = 0 THEN 'jpg' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
       |    $DHex AS hx
       |  FROM documents
       |)
       |SELECT doc_id, kind, format,
       |  CAST(${dByte(0)} % 48 + 16 AS INT) AS width,
       |  CAST(${dByte(1)} % 48 + 16 AS INT) AS height,
       |  32 AS n_bytes,
       |  CAST(FLOOR(($DSumBytes) * 1000 / 32) AS BIGINT) AS mean_byte_milli
       |FROM m ORDER BY doc_id""") { (s, d) =>
    MM.decodeAll(MM.mediaTable(s, d)).toDF()
      .withColumn("n_bytes", col("n_bytes"))
      .orderBy("doc_id")
  }

  /** q44 — corpus stats per (kind, format): the group-by after decode,
    * exactly the shape of a real media-pipeline profiling pass. */
  val q44MediaAgg: Q = Q(
    "q44_media_agg",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |    CASE WHEN doc_id % 3 = 0 THEN 'jpg' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
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

  /** q64 — video frame sampling: every 2nd stub-frame of each video
    * payload as (doc_id, frame_idx, frame_hex) rows — the demux/keyframe
    * plumbing of a media pipeline with the codec stubbed (the 32-byte
    * payload is 8 four-byte "frames"). The oracle reconstructs each kept
    * frame as a hex slice of the same md5-derived payload, so the
    * Dataset flatMap path is fully hash-checked. */
  val q64FrameSample: Q = Q(
    "q64_frame_sample",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 2
       |)
       |SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |  substr(hx, i*8 + 1, 8) AS frame_hex
       |FROM m CROSS JOIN (SELECT unnest([0, 2, 4, 6]) AS i) t
       |ORDER BY doc_id, frame_idx""") { (s, d) =>
    MM.sampleFrames(MM.mediaTable(s, d), everyN = 2)
      .orderBy("doc_id", "frame_idx")
  }

  /** q66 — image resize metadata: source dims from the stub decode,
    * fixed 16x16 target, scale factors in floor-ppm — the dims-in /
    * dims+factors-out plumbing of a thumbnail stage, codec stubbed. */
  val q66ImageResize: Q = Q(
    "q66_image_resize",
    s"""WITH m AS (
       |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT doc_id,
       |  CAST(${dByte(0)} % 48 + 16 AS INT) AS src_w,
       |  CAST(${dByte(1)} % 48 + 16 AS INT) AS src_h,
       |  16 AS dst_w, 16 AS dst_h,
       |  16000000 // (${dByte(0)} % 48 + 16) AS scale_w_ppm,
       |  16000000 // (${dByte(1)} % 48 + 16) AS scale_h_ppm
       |FROM m ORDER BY doc_id""") { (s, d) =>
    MM.resizeAll(MM.mediaTable(s, d), dstW = 16, dstH = 16)
      .orderBy("doc_id")
  }

  /** q67 — audio feature extraction: per-window byte-sum "energy" over
    * the 8 four-byte windows of each audio payload (stands in for RMS
    * over decoded samples; the flatMap window shape is the real part). */
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

  /** q115 — perceptual-hash near-dup detection over image payloads:
    * 32-bit dHash-style codes from the stub decode (planted one-byte
    * "re-encodes" of every 10th image flip ≤ 2 bits), byte-banded LSH
    * (q28's candidate shape — a matching 8-bit band is required, so
    * the pair stage joins on (band, byte) instead of comparing all
    * pairs), then exact Hamming ≤ 3 verification with the codegen'd
    * `graft_hamming` expression. The image-dedup twin of the text
    * SimHash pipeline, running entirely on the media plumbing: typed
    * stub decode → codes, ints-only from there. */
  val q115PhashDedup: Q = Q(
    "q115_phash_dedup",
    {
      def eff(j: Int) =
        if (j == 5) s"CASE WHEN pert = 1 THEN (${dByte(5)} + 1) % 256 ELSE ${dByte(5)} END"
        else dByte(j)
      val phBits = (0 until 32).map(j =>
        s"CASE WHEN (${eff(j)}) > (${eff((j + 1) % 32)}) THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH m AS (
         |  SELECT doc_id, $DHex AS hx FROM documents WHERE doc_id % 3 = 0
         |), aug AS (
         |  SELECT doc_id, hx, 0 AS pert FROM m
         |  UNION ALL
         |  SELECT doc_id + 1000000, hx, 1 FROM m WHERE doc_id % 30 = 0
         |), codes AS (
         |  SELECT doc_id, CAST($phBits AS BIGINT) AS ph FROM aug
         |), cbands AS (
         |  SELECT doc_id, ph, b, (ph >> (8*b)) & 255 AS byte
         |  FROM codes CROSS JOIN (SELECT unnest(range(0,4)) AS b)
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
    val orig = imgs.map(f => (f.doc_id, MM.phashStub(f.content)))
    val pert = imgs.filter((f: MM.MediaFile) => f.doc_id % 30 == 0)
      .map(f => (f.doc_id + 1000000L, MM.phashStub(MM.perturbStub(f.content))))
    val codes = orig.union(pert).toDF("doc_id", "ph")
    val cbands = codes.select(col("doc_id"), col("ph"),
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
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

  val all: Seq[Q] = Seq(q43MediaMeta, q44MediaAgg, q64FrameSample,
    q66ImageResize, q67AudioEnergy, q115PhashDedup)
}
