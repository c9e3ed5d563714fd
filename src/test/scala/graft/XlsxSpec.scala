package graft

import java.io.ByteArrayInputStream

import graft.sources.Xlsx

/** Excel sink tests: the emitted workbooks must be genuine OOXML
  * packages — correct ZIP part layout, spec-conformant sheet XML that a
  * standard parser round-trips (including escaping), one workbook per
  * day, byte-stable ordering. */
class XlsxSpec extends SparkSpec {

  private def entryBytes(zf: java.util.zip.ZipFile, name: String): Array[Byte] = {
    val e = zf.getEntry(name)
    assert(e != null, s"workbook missing part $name")
    zf.getInputStream(e).readAllBytes()
  }

  test("writeDaily emits one real OOXML workbook per day") {
    import spark.implicits._
    val df = Seq(
      ("2020-01-02", "beta", "2"),
      ("2020-01-01", "a&b <q>", "1"),
      ("2020-01-01", "alpha", "3")
    ).toDF("day", "title", "amount")
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx").toString
    Xlsx.writeDaily(df, "day", dir)

    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq // Hadoop local-fs .crc sidecars
    assert(files == Seq("2020-01-01.xlsx", "2020-01-02.xlsx"),
      s"expected one workbook per day, got $files")

    val zf = new java.util.zip.ZipFile(new java.io.File(dir, "2020-01-01.xlsx"))
    try {
      // the four parts every conformant minimal workbook needs
      Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml")
        .foreach(p => entryBytes(zf, p))
      assert(new String(entryBytes(zf, "[Content_Types].xml"), "UTF-8")
        .contains("spreadsheetml.sheet.main+xml"))

      // the sheet must parse with the JDK's namespace-aware DOM parser
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      val doc = dbf.newDocumentBuilder()
        .parse(new ByteArrayInputStream(entryBytes(zf, "xl/worksheets/sheet1.xml")))
      val rows = doc.getElementsByTagNameNS("*", "row")
      assert(rows.getLength == 3, "header + 2 data rows")
      val ts = doc.getElementsByTagNameNS("*", "t")
      val texts = (0 until ts.getLength).map(ts.item(_).getTextContent)
      // header row, then data rows ordered by the non-day columns;
      // escaping must round-trip through a real parser
      assert(texts == Seq("title", "amount", "a&b <q>", "1", "alpha", "3"))
      val cells = doc.getElementsByTagNameNS("*", "c")
      assert(cells.item(0).getAttributes.getNamedItem("r").getNodeValue == "A1")
      assert(cells.item(0).getAttributes.getNamedItem("t").getNodeValue == "inlineStr")
    } finally zf.close()
  }

  test("column letters cover the multi-letter range") {
    assert(Seq(0, 25, 26, 51, 701, 702).map(Xlsx.colLetters) ==
      Seq("A", "Z", "AA", "AZ", "ZZ", "AAA"))
  }
}
