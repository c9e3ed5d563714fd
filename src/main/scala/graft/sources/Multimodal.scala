package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched per-partition
  * passes — the Spark-side architecture of an image/audio/video
  * pipeline.
  *
  * The decode itself is a STUB: this container has no image/audio
  * codecs, so `decodeStub` computes deterministic pseudo-stats from the
  * bytes (clearly fake, but the plumbing — schema, batching, partition
  * behavior, typed Dataset API — is real and tested). Swap `decodeStub`
  * for a real codec (JNI/javacv) without touching anything else: the
  * per-partition iterator shape is exactly where a real decoder would
  * amortize its init cost (the JVM analogue of mapInPandas batching).
  *
  * Media bytes are synthesized from the documents table (32 bytes =
  * unhex(md5(text) ++ md5(text+"2"))), so both engines can reconstruct
  * them — the metadata path stays DuckDB-oracle-checkable via hex
  * arithmetic (ops.Multimodal).
  */
object Multimodal {

  /** One media file: opaque payload + typed metadata columns. */
  final case class MediaFile(
      doc_id: Long, kind: String, format: String, content: Array[Byte])

  /** Decoded stub-stats for one payload. */
  final case class MediaMeta(
      doc_id: Long, kind: String, format: String,
      width: Int, height: Int, n_bytes: Int, mean_byte_milli: Long)

  /** Binary media table derived deterministically from documents. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        kindCol(col("doc_id")).as("kind"),
        formatCol(col("doc_id")).as("format"),
        unhex(concat(md5(col("text")), md5(concat(col("text"), lit("2"))))).as("content"))
      .as[MediaFile]
  }

  def kindCol(docId: Column): Column =
    when(docId % 3 === 0, "image").when(docId % 3 === 1, "audio").otherwise("video")

  def formatCol(docId: Column): Column =
    when(docId % 3 === 0, "jpg").when(docId % 3 === 1, "wav").otherwise("mp4")

  /** STUB decode — deterministic pseudo-stats standing in for a real
    * codec: "width"/"height" from the first two bytes, mean byte value
    * in milli-units. A real implementation would decode `content` here. */
  def decodeStub(f: MediaFile): MediaMeta = {
    val b = f.content.map(_ & 0xff)
    MediaMeta(f.doc_id, f.kind, f.format,
      width = b(0) % 48 + 16,
      height = b(1) % 48 + 16,
      n_bytes = b.length,
      mean_byte_milli = b.map(_.toLong).sum * 1000L / b.length)
  }

  /** Batched per-partition decode: one pass per partition, codec init
    * amortized across the partition's files. */
  def decodeAll(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // real codecs would initialize once here, per partition
      it.map(decodeStub)
    }
  }

  /** STUB frame sampling for video payloads: treat the payload as 8
    * 4-byte "frames", keep every `everyN`-th, fingerprint each. A real
    * implementation would demux + decode keyframes here. */
  def frameSampleStub(f: MediaFile, everyN: Int): Seq[(Int, String)] =
    f.content.grouped(4).zipWithIndex
      .filter { case (_, i) => i % everyN == 0 }
      .map { case (frame, i) =>
        i -> frame.map(b => f"${b & 0xff}%02x").mkString
      }.toSeq

  /** Frames as rows: (doc_id, frame_idx, frame_hex). */
  def sampleFrames(files: Dataset[MediaFile], everyN: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "video")
      .flatMap(f => frameSampleStub(f, everyN).map { case (i, hx) => (f.doc_id, i, hx) })
      .toDF("doc_id", "frame_idx", "frame_hex")
  }

  /** STUB image resize: source dims from the decode stub, fixed target,
    * scale factors in floor-ppm. A real implementation would decode and
    * resample pixels here; the metadata plumbing (dims in, dims +
    * factors out) is the real pipeline shape. */
  def resizeStub(f: MediaFile, dstW: Int, dstH: Int): (Long, Int, Int, Int, Int, Long, Long) = {
    val b = f.content.map(_ & 0xff)
    val srcW = b(0) % 48 + 16
    val srcH = b(1) % 48 + 16
    (f.doc_id, srcW, srcH, dstW, dstH,
      dstW.toLong * 1000000L / srcW, dstH.toLong * 1000000L / srcH)
  }

  /** Resized-image metadata rows for the image subset. */
  def resizeAll(files: Dataset[MediaFile], dstW: Int, dstH: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "image")
      .mapPartitions(it => it.map(resizeStub(_, dstW, dstH)))
      .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h", "scale_w_ppm", "scale_h_ppm")
  }

  /** STUB audio feature extraction: the 32-byte payload as 8 four-byte
    * windows, per-window "energy" = byte sum (stands in for RMS over
    * samples). */
  def audioEnergyStub(f: MediaFile): Seq[(Long, Int, Long)] =
    f.content.grouped(4).zipWithIndex
      .map { case (win, i) => (f.doc_id, i, win.map(b => (b & 0xff).toLong).sum) }
      .toSeq

  /** Per-window energy rows for the audio subset. */
  def audioEnergy(files: Dataset[MediaFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.filter(_.kind == "audio")
      .flatMap(audioEnergyStub)
      .toDF("doc_id", "win_idx", "energy")
  }

  /** STUB perceptual hash (dHash shape): 32-bit code, bit j set iff
    * byte j > byte (j+1) mod 32 — the adjacent-pixel-gradient rule of
    * a real dHash, on the stub "pixels". Robust to small payload edits
    * the way dHash is robust to re-encodes: a one-byte change flips at
    * most two bits. A real implementation would downscale to a 9x8
    * grayscale grid here and compare row neighbors. Pinned to the
    * 32-byte mediaTable payload contract — the q115 oracle hardwires
    * the same 32-bit wrap, so a different payload length must fail
    * loudly here rather than silently produce differently-wrapped
    * codes. */
  def phashStub(content: Array[Byte]): Long = {
    require(content.length == 32,
      s"phashStub expects the 32-byte media payload, got ${content.length}")
    val b = content.map(_ & 0xff)
    (0 until 32).foldLeft(0L) { (acc, j) =>
      if (b(j) > b((j + 1) % 32)) acc | (1L << j) else acc
    }
  }

  /** One-byte corruption (byte 5 += 1 mod 256) — the planted near-dup
    * for the perceptual-hash pipeline (a stand-in for a re-encode). */
  def perturbStub(content: Array[Byte]): Array[Byte] = {
    require(content.length > 5, s"payload too short: ${content.length}")
    val c = content.clone()
    c(5) = ((c(5) + 1) & 0xff).toByte
    c
  }
}
