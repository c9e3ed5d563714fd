package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  /** Inverse of [[colLetters]]: the 0-based column index of an A1-style
    * cell reference ("B3" -> 1, "AA7" -> 26). */
  def colIndex(cellRef: String): Int = {
    var n = 0; var i = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      n = n * 26 + (cellRef.charAt(i).toUpper - 'A' + 1); i += 1
    }
    n - 1
  }

  /** Parse one workbook (this sink's inline-string dialect) into
    * (header, data rows) with the JDK's StAX pull parser — streaming,
    * no DOM materialization of the sheet. Cells land at the column
    * index their `r` reference names, so sparse rows (absent cells)
    * read back as nulls rather than shifting later columns left. */
  def parseWorkbook(bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    var sheet: Array[Byte] = null
    Iterator.continually(zis.getNextEntry).takeWhile(_ != null).foreach { e =>
      if (e.getName == "xl/worksheets/sheet1.xml") sheet = zis.readAllBytes()
    }
    require(sheet != null, "workbook has no xl/worksheets/sheet1.xml part")
    val xif = javax.xml.stream.XMLInputFactory.newInstance()
    xif.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(sheet))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellAt = -1
    var inT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if cells != null =>
              cellAt = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(cells.length)
            case "t" if cellAt >= 0 => inT = true; text.clear()
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" if inT =>
              inT = false
              while (cells.length <= cellAt) cells += null
              cells(cellAt) = text.toString
            case "c" => cellAt = -1
            case "row" if cells != null => rows += cells.toSeq; cells = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    if (rows.isEmpty) (Seq.empty, Seq.empty) else (rows.head, rows.tail.toSeq)
  }

  /** Glob-scan of daily workbooks (reference `3_merge_to_two.py:30-31`:
    * `glob('{ds}_????_??_??.xlsx')` then append-all). Distributed: a
    * `binaryFile` scan fans the workbooks across executors, each parsed
    * once with the streaming reader. Columns align BY HEADER NAME
    * against the union of all headers (first-seen order over
    * path-sorted files) — the `unionByName(allowMissingColumns)`
    * semantics SURVEY §2.8 picked to fix the reference's positional
    * merge hazard; a file lacking a column yields nulls there. Lineage
    * comes back as `source_file`. The header-union pre-pass ships only
    * header rows to the driver, never data. */
  def readDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val header: Seq[String] = bin
      .map { case (path, bytes) => (path, parseWorkbook(bytes)._1) }
      .collect().sortBy(_._1)
      .foldLeft(Vector.empty[String]) { case (acc, (_, h)) =>
        acc ++ h.filterNot(acc.contains)
      }
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        header.map(StructField(_, StringType, nullable = true)))
    val rows = bin.flatMap { case (path, bytes) =>
      val (h, data) = parseWorkbook(bytes)
      val at = header.map(h.indexOf) // -1 (absent column) -> null
      data.map { cells =>
        Row.fromSeq(path +: at.map(i =>
          if (i >= 0 && i < cells.length) cells(i) else null))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }

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
