package graft

import graft.functions.RefFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit specs for the reference's pure helpers (SURVEY §2.7), including
  * the edge cases called out in SURVEY §5: null→OTHER and case/space
  * normalization (F12), the 8-char "download" strip (F4), 10..20→"th"
  * ordinals (F10), empty→null joins (A2/A3), missing-id lookup (J1). */
class RefFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("pipeJoin drops nulls/empties and yields null when nothing remains") {
    assert(one(pipeJoin(array(lit("a"), lit(null), lit("b"), lit("")))) == "a|b")
    assert(one(pipeJoin(array(lit(null), lit("")))) == null)
  }

  test("joinUnique strips, dedups, sorts, joins with ';'") {
    assert(one(joinUnique(array(lit(" b "), lit("a"), lit("b"), lit("  ")))) == "a;b")
    assert(one(joinUnique(array(lit(""), lit(null)))) == null)
  }

  test("sanitizeFilename replaces forbidden chars and trims") {
    assert(one(sanitizeFilename(lit(""" x<y>:"z"/\|?*.csv """))) == "x_y___z______.csv")
  }

  test("cleanLinkText takes first comma segment, strips 8-char 'download'") {
    assert(one(cleanLinkText(lit("Download Notices 2024, monthly CSV"))) == "Notices 2024")
    assert(one(cleanLinkText(lit("DOWNLOAD2024, x"))) == "2024")
    assert(one(cleanLinkText(lit("Notices 2024"))) == "Notices 2024")
  }

  test("absolutizeUrl prefixes host only for relative hrefs") {
    assert(one(absolutizeUrl(lit("/dataset/x"))) == "https://www.data.gov.uk/dataset/x")
    assert(one(absolutizeUrl(lit("https://e.com/x"))) == "https://e.com/x")
  }

  test("filename date extraction") {
    assert(one(filenameYear(lit("notices-2024-03-07.csv"))) == "2024")
    assert(one(filenameMonth(lit("notices-2024-03-07.csv"))) == "03")
    assert(one(filenameDay(lit("notices-2024-03-07.csv"))) == "07")
    assert(one(filenameYear(lit("no-date-here.csv"))) == "")
  }

  test("ordinal reproduces the reference's 10..20 -> th quirk") {
    val cases = Map(1L -> "1st", 2L -> "2nd", 3L -> "3rd", 4L -> "4th",
      10L -> "10th", 11L -> "11th", 13L -> "13th", 20L -> "20th",
      21L -> "21st", 22L -> "22nd", 23L -> "23rd", 111L -> "111th", 121L -> "121st")
    cases.foreach { case (n, want) => assert(one(ordinal(lit(n))) == want, s"n=$n") }
  }

  test("noticeTypeGroup normalizes case/whitespace, null -> OTHER") {
    assert(one(noticeTypeGroup(lit(" 0 "))) == "PIN")
    assert(one(noticeTypeGroup(lit("o"))) == "CONTRACT_NOTICE")
    assert(one(noticeTypeGroup(lit("7"))) == "CONTRACT_AWARD")
    assert(one(noticeTypeGroup(lit("k"))) == "MODIFICATION")
    assert(one(noticeTypeGroup(lit("z"))) == "OTHER")
    assert(one(noticeTypeGroup(lit(null: String))) == "OTHER")
  }

  test("ctypeFromCategory precedence works > services > supplies") {
    assert(one(ctypeFromCategory(lit("social work services"))) == "WORKS")
    assert(one(ctypeFromCategory(lit("professional Services"))) == "SERVICES")
    assert(one(ctypeFromCategory(lit("supply of goods"))) == "SUPPLIES")
    assert(one(ctypeFromCategory(lit("misc"))) == null)
    assert(one(ctypeFromCategory(lit(null: String))) == null)
  }

  test("firstOrNull / firstNonNullIn never throw on empty or all-null") {
    assert(one(firstOrNull(array())) == null)
    assert(one(firstNonNullIn(array(lit(null), lit("x"), lit("y")))) == "x")
    assert(one(firstNonNullIn(array(lit(null), lit(null)))) == null)
  }

  test("findFirstById: first match wins; null/empty id yields null") {
    val parties = array(
      struct(lit("p1").as("id"), lit("A").as("name")),
      struct(lit("p2").as("id"), lit("B").as("name")),
      struct(lit("p1").as("id"), lit("C").as("name")))
    assert(one(findFirstById(parties, lit("p1"))) == Row("p1", "A"))
    assert(one(findFirstById(parties, lit("zz"))) == null)
    assert(one(findFirstById(parties, lit(null: String))) == null)
    assert(one(findFirstById(parties, lit(""))) == null)
  }

  test("partiesWithRole and firstDocOfType filter nested arrays") {
    val parties = array(
      struct(lit("p1").as("id"), array(lit("buyer")).as("roles")),
      struct(lit("p2").as("id"), array(lit("supplier"), lit("payee")).as("roles")),
      struct(lit("p3").as("id"), array(lit("supplier")).as("roles")))
    assert(one(size(partiesWithRole(parties, "supplier"))) == 2)
    val docs = array(
      struct(lit("tenderNotice").as("documentType"), lit("u1").as("url")),
      struct(lit("awardNotice").as("documentType"), lit("u2").as("url")))
    assert(one(firstDocOfType(docs, "awardNotice").getField("url")) == "u2")
    assert(one(firstDocOfType(docs, "contractNotice"))== null)
  }
}
