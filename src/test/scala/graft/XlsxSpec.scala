package graft

import java.io.ByteArrayInputStream

import graft.sources.Xlsx
import org.apache.spark.sql.functions.{col, regexp_extract}

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
    // colIndex is the exact inverse
    assert(Seq(0, 25, 26, 51, 701, 702).forall(i =>
      Xlsx.colIndex(Xlsx.colLetters(i) + "17") == i))
  }

  test("readDaily glob-merges workbooks by header name (union-by-name semantics)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-rd").toString
    // two daily extracts with DIFFERENT column sets — the reference's
    // positional-merge hazard case (3_merge_to_two.py:41-57)
    Xlsx.writeDaily(
      Seq(("2020-01-01", "alpha", "10")).toDF("day", "title", "amount"),
      "day", dir)
    Xlsx.writeDaily(
      Seq(("2020-01-02", "beta", "B-7")).toDF("day", "title", "ref"),
      "day", dir)

    val back = Xlsx.readDaily(spark, dir)
    assert(back.columns.toSeq == Seq("source_file", "title", "amount", "ref"),
      s"union-of-headers in first-seen path order, got ${back.columns.toSeq}")
    val rows = back
      .select(
        regexp_extract(col("source_file"), "([0-9-]+)\\.xlsx$", 1).as("day"),
        col("title"), col("amount"), col("ref"))
      .orderBy("day")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
    // a file lacking a column reads back null there, never shifted data
    assert(rows == Seq(
      ("2020-01-01", "alpha", "10", null),
      ("2020-01-02", "beta", null, "B-7")))

    // the full reference merge stage: glob xlsx -> one header'd CSV
    val csvDir = java.nio.file.Files.createTempDirectory("graft-xlsx-csv").toString
    graft.sources.ContractsFinder.mergeXlsxToCsv(spark, dir, csvDir)
    val merged = spark.read.option("header", "true").csv(csvDir)
    assert(merged.columns.toSeq == Seq("title", "amount", "ref"))
    assert(merged.count() == 2)
  }

  test("readDaily at width: 120 sparse columns round-trip by name (r6 stretch)") {
    import spark.implicits._
    // The q130 oracle covers 7 aggregate rows over a week; this drives
    // the merge at realistic extract WIDTH — 120 columns (multi-letter
    // A1 refs deep into 'DP'), each day carrying a different sparse
    // subset, so every alignment decision is by header NAME and every
    // absent (day, column) pair must read back null, never shifted.
    val allCols = (0 until 120).map(i => f"f$i%03d")
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-wide").toString
    // day d keeps columns where (i + d) % 3 != 0 — ~80 of 120, offset per day
    def keep(d: Int)(i: Int): Boolean = (i + d) % 3 != 0
    (0 until 3).foreach { d =>
      val cols = allCols.indices.filter(keep(d)).map(allCols)
      val row = ((s"2020-02-0${d + 1}") +: cols.map(c => s"$c@d$d")).toSeq
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row.fromSeq(row)),
        org.apache.spark.sql.types.StructType(
          ("day" +: cols).map(org.apache.spark.sql.types.StructField(
            _, org.apache.spark.sql.types.StringType, nullable = true))))
      Xlsx.writeDaily(df, "day", dir)
    }
    val back = Xlsx.readDaily(spark, dir)
    // union of headers in first-seen path order = day0's ~80 columns,
    // then the ones only later days introduce
    assert(back.columns.length == 121 && back.columns.head == "source_file")
    assert(back.columns.toSet == (allCols.toSet + "source_file"))
    val rows = back.withColumn("day",
        regexp_extract(col("source_file"), "2020-02-0([0-9])", 1).cast("int") - 1)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val d = r.getAs[Int]("day")
      allCols.zipWithIndex.foreach { case (c, i) =>
        val got = r.getAs[String](c)
        val want = if (keep(d)(i)) s"$c@d$d" else null
        assert(got == want, s"day $d col $c: got $got want $want")
      }
    }
  }

  test("parseWorkbook keeps sparse cells at their referenced column") {
    // a hand-built sheet with a missing middle cell: C must not shift to B
    val (h, rows) = Xlsx.parseWorkbook(Xlsx.workbookBytes(
      Seq("a", "b", "c"), Iterator(Seq("1", "2", "3"))))
    assert(h == Seq("a", "b", "c") && rows == Seq(Seq("1", "2", "3")))
    // forge sparsity by round-tripping a workbook whose writer skipped B2:
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c><c r="B1" t="inlineStr"><is><t>y</t></is></c></row>
        |<row r="2"><c r="B2" t="inlineStr"><is><t>only-b</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(sheet.getBytes("UTF-8")); zip.closeEntry(); zip.close()
    val (h2, rows2) = Xlsx.parseWorkbook(bos.toByteArray)
    assert(h2 == Seq("x", "y"))
    assert(rows2 == Seq(Seq(null, "only-b")), s"got $rows2")
  }
}
