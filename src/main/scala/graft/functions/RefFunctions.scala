package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar / array column functions reproducing the reference's pure helpers
  * (SURVEY.md §2.7). All are built-in Catalyst expressions / higher-order
  * functions — zero UDFs, so everything stays inside whole-stage codegen.
  *
  * Reference citations are to `/root/reference/` (read-only snapshot):
  *  - 2a = 2a_extract_contracts_finder.py
  *  - 2b = 2b_extract_find_a_tender_XMLs.py
  *  - 1a = 1a_gov_uk_scrape_contracts_finder.py
  */
object RefFunctions {

  /** A2 — `pipe_join` (2a:147-150): join non-null, non-empty stringified
    * values with '|'; null when nothing remains. */
  def pipeJoin(xs: Column): Column = {
    val cleaned = filter(xs, v => v.isNotNull && v.cast("string") =!= "")
    when(size(cleaned) === 0, lit(null: String))
      .otherwise(array_join(cleaned.cast("array<string>"), "|"))
  }

  /** A3 — `_join_unique` (2b:13-15): strip, drop blanks, sorted set, ';'
    * join; null when nothing remains. */
  def joinUnique(xs: Column): Column = {
    val cleaned = filter(transform(xs, v => trim(v.cast("string"))),
      v => v.isNotNull && v =!= "")
    when(size(cleaned) === 0, lit(null: String))
      .otherwise(array_join(array_sort(array_distinct(cleaned)), ";"))
  }

  /** F3 — `sanitize_filename` (1a:85-90, 1b:110-115): replace `<>:"/\|?*`
    * with '_', then trim. */
  def sanitizeFilename(c: Column): Column =
    trim(regexp_replace(c, """[<>:"/\\|?*]""", "_"))

  /** F4 — link-text → filename cleanup (1a:140-145): substring before first
    * ',', trimmed; strip a leading case-insensitive "download" (exactly 8
    * chars, as the reference does) and trim again. */
  def cleanLinkText(c: Column): Column = {
    val first = trim(split(c, ",").getItem(0))
    when(lower(first).startsWith("download"), trim(first.substr(lit(9), length(first))))
      .otherwise(first)
  }

  /** F5 — relative-URL absolutization (1a:72-73): prefix the data.gov.uk
    * host when the href starts with '/'. */
  def absolutizeUrl(c: Column, base: String = "https://www.data.gov.uk"): Column =
    when(c.startsWith("/"), concat(lit(base), c)).otherwise(c)

  /** F6 — `extract_date_from_filename` (2a:63-72): first `YYYY-MM-DD` in the
    * name; group 1..3 = year, month, day ("" when absent, per regexp_extract). */
  private val DatePat = """(\d{4})-(\d{2})-(\d{2})"""
  def filenameYear(c: Column): Column  = regexp_extract(c, DatePat, 1)
  def filenameMonth(c: Column): Column = regexp_extract(c, DatePat, 2)
  def filenameDay(c: Column): Column   = regexp_extract(c, DatePat, 3)

  /** F10 — `_ordinal` (2b:18-23). NOTE the reference maps n%100 in 10..20
    * (not just 11..13) to "th"; we reproduce that exactly. */
  def ordinal(n: Column): Column = {
    val suffix = when(n % 100 >= 10 && n % 100 <= 20, "th")
      .when(n % 10 === 1, "st")
      .when(n % 10 === 2, "nd")
      .when(n % 10 === 3, "rd")
      .otherwise("th")
    concat(n.cast("string"), suffix)
  }

  /** F12 — `_map_notice_type_group` (2b:26-38): TD code → group with
    * upper(trim()) normalization; null → OTHER. */
  def noticeTypeGroup(tdCode: Column): Column = {
    val code = upper(trim(tdCode))
    when(tdCode.isNull, "OTHER")
      .when(code === "0", "PIN")
      .when(code.isin("3", "O", "V"), "CONTRACT_NOTICE")
      .when(code === "7", "CONTRACT_AWARD")
      .when(code === "K", "MODIFICATION")
      .otherwise("OTHER")
  }

  /** F13 — mainProcurementCategory → CTYPE (2b:352-360): lowercase contains,
    * precedence works > services > supplies; null/no-match → null. */
  def ctypeFromCategory(c: Column): Column = {
    val lc = lower(c)
    when(lc.contains("work"), "WORKS")
      .when(lc.contains("service"), "SERVICES")
      .when(lc.contains("supply") || lc.contains("good"), "SUPPLIES")
      .otherwise(lit(null: String))
  }

  /** F14 — tag-based notice group for UKx forms (2b:363-369). */
  def tagNoticeGroup(formName: Column, tags: Column): Column =
    when(formName.isin("UK6", "UK7") && array_contains(tags, "award"), "UK7_AWARD")
      .when(array_contains(tags, "planning"), "PLANNING")
      .otherwise("OTHER")

  /** W1 — `first_or_none` (2a:75-79): first element or null (never errors,
    * unlike ANSI element_at). */
  def firstOrNull(xs: Column): Column = try_element_at(xs, lit(1))

  /** W2 — first non-null value across an array (coalesce-over-array,
    * 2a:120-144). */
  def firstNonNullIn(xs: Column): Column =
    try_element_at(filter(xs, _.isNotNull), lit(1))

  /** J1 — buyer→party first-match lookup (2a:82-91): first element of
    * `parties` whose `id` equals buyerId; null when buyerId is null. */
  def findFirstById(parties: Column, id: Column): Column =
    when(id.isNull || id === "", lit(null))
      .otherwise(try_element_at(filter(parties, p => p.getField("id") === id), lit(1)))

  /** J2 — supplier-role semi-filter (2a:94-101): parties whose roles
    * contain `role`. */
  def partiesWithRole(parties: Column, role: String): Column =
    filter(parties, p => array_contains(p.getField("roles"), role))

  /** J3 — document-type first-match (2a:104-117). */
  def firstDocOfType(docs: Column, docType: String): Column =
    try_element_at(filter(docs, d => d.getField("documentType") === docType), lit(1))
}
