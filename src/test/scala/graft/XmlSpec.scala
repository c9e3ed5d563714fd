package graft

import graft.sources.{FatXml, ZipXml}
import org.apache.spark.sql.functions._

/** Golden tests for the FaT XML path: dispatch priority, TED and UKx
  * field extraction, parse-error audit rows, charset fallback. */
class XmlSpec extends SparkSpec {
  import spark.implicits._

  private val ted =
    """<TED_EXPORT><TD_DOCUMENT_TYPE CODE=" o "/>
      |<NOTICE_DATA><NO_DOC_OJS>2024/S 123</NO_DOC_OJS>
      |<ORIGINAL_CPV CODE="45000000">Works</ORIGINAL_CPV>
      |<ORIGINAL_CPV CODE="30000000">IT</ORIGINAL_CPV>
      |<ORIGINAL_CPV CODE="45000000">Dup</ORIGINAL_CPV>
      |<NUTS2021 CODE="UKC14"/></NOTICE_DATA>
      |<TRANSLATION_SECTION><ML_TITLES>
      |<ML_TI_DOC LG="FR"><TI_TEXT>fr titre</TI_TEXT></ML_TI_DOC>
      |<ML_TI_DOC LG="EN"><TI_TEXT>en title</TI_TEXT></ML_TI_DOC>
      |</ML_TITLES></TRANSLATION_SECTION>
      |<CONTRACTING_BODY><OFFICIALNAME>Borough Council</OFFICIALNAME></CONTRACTING_BODY>
      |<OBJECT_CONTRACT><VAL_TOTAL CURRENCY="GBP">1234.50</VAL_TOTAL></OBJECT_CONTRACT>
      |</TED_EXPORT>""".stripMargin

  private val uk7 =
    """<UK7_2023><NOTICE_ID>UK7-42</NOTICE_ID>
      |<TENDER><TITLE>Road works</TITLE><VALUE>99.10</VALUE><CATEGORY>public works</CATEGORY></TENDER>
      |<BUYER><NAME>Town Hall</NAME></BUYER>
      |<TAGS><TAG>award</TAG><TAG>live</TAG></TAGS></UK7_2023>""".stripMargin

  private def extract(xmls: String*) =
    FatXml.extract(xmls.toDF("xml"), Seq.empty).collect().toSeq

  test("TED extraction: dedup-sorted CPV, NUTS coalesce, EN title, TD mapping") {
    val r = extract(ted).head
    assert(r.getAs[String]("source_form") == "TED")
    assert(r.getAs[String]("doc_id") == "2024/S 123")
    assert(r.getAs[String]("title") == "en title")
    assert(r.getAs[String]("buyer_name") == "Borough Council")
    assert(r.getAs[String]("cpv_codes") == "30000000;45000000")
    assert(r.getAs[String]("nuts") == "UKC14")
    assert(r.getAs[java.math.BigDecimal]("value_amount").doubleValue() == 1234.50)
    assert(r.getAs[String]("currency") == "GBP")
    assert(r.getAs[String]("notice_type_group") == "CONTRACT_NOTICE") // " o " normalized
    assert(r.getAs[String]("parse_error") == null)
  }

  test("UK7 extraction: title/value/ctype/tag group") {
    val r = extract(uk7).head
    assert(r.getAs[String]("source_form") == "UK7_2023")
    assert(r.getAs[String]("doc_id") == "UK7-42")
    assert(r.getAs[String]("title") == "Road works")
    assert(r.getAs[String]("buyer_name") == "Town Hall")
    assert(r.getAs[String]("ctype") == "WORKS")
    assert(r.getAs[String]("tag_group") == "UK7_AWARD")
    assert(r.getAs[String]("cpv_codes") == null)
  }

  test("UK7 with planning tags -> PLANNING; UK3 form with award tag -> OTHER") {
    val planning = uk7.replace("<TAG>award</TAG>", "<TAG>planning</TAG>")
    assert(extract(planning).head.getAs[String]("tag_group") == "PLANNING")
    val uk3 = uk7.replace("UK7_2023", "UK3_2023").replace("UK7-42", "UK3-1")
    val r3 = extract(uk3).head
    assert(r3.getAs[String]("source_form") == "UK3_2023")
    // form not in {UK6, UK7}: award tag does not make it UK7_AWARD
    assert(r3.getAs[String]("tag_group") == "OTHER")
  }

  test("dispatch priority: higher form number wins when multiple tags appear") {
    val both = s"<UK16_2023><NOTE>${uk7.replace("<", "[").replace(">", "]")}</NOTE><NOTICE_ID>UK16-1</NOTICE_ID></UK16_2023>"
    assert(extract(both).head.getAs[String]("source_form") == "UK16_2023")
  }

  test("legacy UK1_2022 form dispatches after every 2023 form (ref 2b:437-441)") {
    assert(FatXml.ukFormTags.last == "UK1_2022")
    assert(FatXml.ukFormTags.size == 17)
    val legacy = uk7.replace("UK7_2023", "UK1_2022").replace("UK7-42", "UK1L-1")
    val r = extract(legacy).head
    assert(r.getAs[String]("source_form") == "UK1_2022")
    // UK1_2023 beats UK1_2022 when both tags appear
    val both = s"<UK1_2023><NOTE>${legacy.replace("<", "[").replace(">", "]")}</NOTE><NOTICE_ID>UK1-1</NOTICE_ID></UK1_2023>"
    assert(extract(both).head.getAs[String]("source_form") == "UK1_2023")
  }

  test("malformed XML yields an audit row with parse_error, not a dropped row") {
    val rows = extract(ted, "<TED_EXPORT><NOTICE_DATA>broken")
    assert(rows.size == 2)
    val bad = rows.find(_.getAs[String]("parse_error") != null).get
    assert(bad.getAs[String]("doc_id") == null)
    assert(bad.getAs[String]("notice_type_group") == null)
  }

  test("charset fallback: strict UTF-8 first, then latin-1") {
    val utf8 = "café".getBytes("UTF-8")
    val latin1 = "café".getBytes("ISO-8859-1")
    assert(ZipXml.decodeUtf8Latin1(utf8) == "café")
    assert(ZipXml.decodeUtf8Latin1(latin1) == "café")
  }
}
