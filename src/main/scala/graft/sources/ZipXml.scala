package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.zip.ZipInputStream

/** ZIP-of-XML ingest (SURVEY S7 + F15): `binaryFile` scan over day ZIPs,
  * per-partition unzip into (zip, entry, xml) rows, keeping only `*.xml`
  * entries (P4), with the reference's strict-UTF-8 → latin-1 charset
  * fallback (2b:479-482).
  *
  * Scale: binaryFile gives one task per ZIP, so a day of ZIPs fans out
  * across executors with no driver involvement; the unzip is the only
  * imperative (non-Catalyst) step in the whole engine and runs inside
  * flatMap with nothing collected. Date-range pruning happens on the
  * file listing (ZIP names encode the day) before any byte is read —
  * the filename-predicate pruning SURVEY §4 calls out. */
object ZipXml {

  /** Decode with strict UTF-8; on malformed bytes fall back to latin-1
    * (which never fails). Mirrors the reference exactly. */
  def decodeUtf8Latin1(bytes: Array[Byte]): String =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(bytes, StandardCharsets.ISO_8859_1)
    }

  /** (source_zip, source_xml_file, xml) rows from every ZIP under dir. */
  def zipEntries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".xml"))
          .map(e => (path, e.getName, decodeUtf8Latin1(zis.readAllBytes())))
          .toList
      }
      .toDF("source_zip", "source_xml_file", "xml")
  }

  /** The same rows through the DataSource V2 connector ([[ZipXmlDataSource]]):
    * the scan plans one InputPartition per ZIP, streams entries (never a
    * whole archive as one row value), and prunes entry inflation when
    * `xml` isn't selected — the production path at scale. */
  def zipEntriesV2(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-zip").load(dir)

  /** Full FaT extract stage: ZIP scan → unzip → dispatch/parse/flatten
    * with lineage (the Spark rendering of reference stage 2b). */
  def extractDir(spark: SparkSession, dir: String): DataFrame =
    FatXml.extract(zipEntries(spark, dir), Seq("source_zip", "source_xml_file"))
}
