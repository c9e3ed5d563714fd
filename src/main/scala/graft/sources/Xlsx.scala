package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Excel sink (reference `2a_extract_contracts_finder.py:654`,
  * `2b_extract_find_a_tender_XMLs.py:498`: one `.xlsx` workbook per
  * extract day). The offline classpath has no spreadsheet jar, but an
  * xlsx file IS a ZIP of OOXML parts — a fully public format — so the
  * sink muxes the four required parts with `java.util.zip` and inline
  * strings per the spec, producing workbooks any spreadsheet app (or
  * this repo's own ZIP-of-XML scanner, which the spec uses) can open.
  *
  * Scale shape: `writeDaily` repartitions by the day column and sorts
  * within partitions, so each executor streams its days sequentially
  * and writes one workbook per day through the Hadoop FileSystem API —
  * no driver collect, no whole-day buffering beyond the workbook being
  * built, works on any Hadoop-visible filesystem. Daily extract
  * workbooks are small by construction (the reference's are single-day
  * scrapes); this sink is for that export surface, not for shipping a
  * 100 TB table to Excel.
  */
object Xlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  /** A1-style column letters: 0 -> A, 25 -> Z, 26 -> AA. */
  def colLetters(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val WorkbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val WorkbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** One real workbook: header row + data rows, every cell an
    * inline string (the spec's jar-free cell encoding). */
  def workbookBytes(header: Seq[String], rows: Iterator[Seq[String]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    part("[Content_Types].xml", ContentTypes)
    part("_rels/.rels", RootRels)
    part("xl/workbook.xml", WorkbookXml)
    part("xl/_rels/workbook.xml.rels", WorkbookRels)
    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |""".stripMargin.getBytes("UTF-8"))
    var r = 1
    (Iterator(header) ++ rows).foreach { cells =>
      val row = cells.zipWithIndex.map { case (v, i) =>
        s"""<c r="${colLetters(i)}$r" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString(s"""<row r="$r">""", "", "</row>\n")
      zip.write(row.getBytes("UTF-8"))
      r += 1
    }
    zip.write("</sheetData>\n</worksheet>".getBytes("UTF-8"))
    zip.closeEntry()
    zip.close()
    bos.toByteArray
  }

  /** Per-day Excel export: one `<outDir>/<day>.xlsx` per distinct value
    * of `dayCol`, each written by the executor that owns that day after
    * a repartition-by-day + in-partition sort (days stream one at a
    * time; no driver collect). All columns are stringified null-safely;
    * rows within a workbook are ordered by the remaining columns so
    * re-runs are byte-stable. */
  def writeDaily(df: DataFrame, dayCol: String, outDir: String): Unit = {
    val cols = df.columns.toSeq
    val dataCols = cols.filterNot(_ == dayCol)
    val ordered = df
      .select(col(dayCol).cast("string").as(dayCol) +: dataCols.map(c => col(c).cast("string").as(c)): _*)
      .repartition(col(dayCol))
      .sortWithinPartitions(col(dayCol) +: dataCols.map(col): _*)
    ordered.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val fs = new Path(outDir).getFileSystem(new Configuration())
        fs.mkdirs(new Path(outDir))
        var day: String = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        def flush(): Unit = if (day != null && buf.nonEmpty) {
          val out = fs.create(new Path(outDir, s"$day.xlsx"), true)
          try out.write(workbookBytes(dataCols, buf.iterator))
          finally out.close()
          buf.clear()
        }
        it.foreach { row =>
          val d = Option(row.getString(0)).getOrElse("unknown")
          if (d != day) { flush(); day = d }
          buf += (1 until row.length).map(i => Option(row.getString(i)).getOrElse(""))
        }
        flush()
      }
    }
  }
}
