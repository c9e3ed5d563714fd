package graft.ops

import graft.Q
import graft.functions.RefFunctions._
import org.apache.spark.sql.functions._

/** Scrape-stage discovery dataflow (SURVEY E1 / S3 / S4 / F1 / F2):
  * month sequence → localized target text → search URL → HTML
  * link-table scan → format + substring predicates → filename cleanup →
  * absolutized download URL. Offline by construction: the HTML is
  * rendered deterministically in-query (the network fetch is a
  * mapPartitions enrichment in production — SURVEY S1/S2 — and is
  * mocked exactly like this in tests).
  *
  * Scale note: discovery is a tiny driver-side-looking dataflow, but
  * expressing it relationally means a years-long backfill (thousands of
  * month-pages × link rows) fans out across executors for free. */
object Scrape {

  val q47ScrapeDiscovery: Q = Q(
    "q47_scrape_discovery",
    """WITH months AS (
      |  SELECT CAST(unnest(generate_series(DATE '2023-01-01', DATE '2024-12-01', INTERVAL 1 MONTH)) AS DATE) AS m
      |), t AS (
      |  SELECT m,
      |    'Contracts Finder Notices ' || strftime(m, '%B %Y') AS target_text,
      |    'https://www.data.gov.uk/search?q=' || replace('Contracts Finder Notices ' || strftime(m, '%B %Y'), ' ', '%20') AS search_url,
      |    '<tr><td><a class="govuk-link" href="/dataset/cf-' || strftime(m, '%Y-%m') || '">Download Contracts Finder Notices ' || strftime(m, '%B %Y') || ', monthly CSV</a></td><td>CSV</td></tr>'
      |      || '<tr><td><a class="govuk-link" href="/dataset/fat-' || strftime(m, '%Y-%m') || '">UK Public Procurement Notices ' || strftime(m, '%B %Y') || '</a></td><td>ZIP</td></tr>' AS html
      |  FROM months
      |), links AS (
      |  SELECT m, target_text, search_url,
      |    unnest(regexp_extract_all(html, '<a class="govuk-link" href="([^"]+)">([^<]+)</a></td><td>([A-Z]+)</td>', 1)) AS href,
      |    unnest(regexp_extract_all(html, '<a class="govuk-link" href="([^"]+)">([^<]+)</a></td><td>([A-Z]+)</td>', 2)) AS text,
      |    unnest(regexp_extract_all(html, '<a class="govuk-link" href="([^"]+)">([^<]+)</a></td><td>([A-Z]+)</td>', 3)) AS fmt
      |  FROM t
      |)
      |SELECT m AS month_start, target_text, search_url,
      |  CASE WHEN href LIKE '/%' THEN 'https://www.data.gov.uk' || href ELSE href END AS url,
      |  trim(regexp_replace(
      |    CASE WHEN lower(trim(string_split(text, ',')[1])) LIKE 'download%'
      |         THEN trim(substring(trim(string_split(text, ',')[1]), 9))
      |         ELSE trim(string_split(text, ',')[1]) END,
      |    '[<>:"/\|?*]', '_', 'g')) AS fname
      |FROM links
      |WHERE text LIKE '%Contracts Finder%' AND fmt = 'CSV'
      |ORDER BY month_start""") { (s, d) =>
    val monthName = date_format(col("m"), "MMMM yyyy")
    val target = concat(lit("Contracts Finder Notices "), monthName)
    val ym = date_format(col("m"), "yyyy-MM")
    val html = concat(
      lit("""<tr><td><a class="govuk-link" href="/dataset/cf-"""), ym,
      lit("\">Download Contracts Finder Notices "), monthName,
      lit(""", monthly CSV</a></td><td>CSV</td></tr>"""),
      lit("""<tr><td><a class="govuk-link" href="/dataset/fat-"""), ym,
      lit("\">UK Public Procurement Notices "), monthName,
      lit("""</a></td><td>ZIP</td></tr>"""))
    val rowPat = """<a class="govuk-link" href="([^"]+)">([^<]+)</a></td><td>([A-Z]+)</td>"""
    s.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("2023-01-01")),
        lit(java.sql.Date.valueOf("2024-12-01")),
        expr("interval 1 month"))).as("m"))
      .select(col("m"), target.as("target_text"),
        concat(lit("https://www.data.gov.uk/search?q="),
          regexp_replace(target, " ", "%20")).as("search_url"),
        html.as("html"))
      .select(col("m"), col("target_text"), col("search_url"),
        explode(arrays_zip(
          regexp_extract_all(col("html"), lit(rowPat), lit(1)),
          regexp_extract_all(col("html"), lit(rowPat), lit(2)),
          regexp_extract_all(col("html"), lit(rowPat), lit(3)))).as("l"))
      .select(col("m").as("month_start"), col("target_text"), col("search_url"),
        col("l").getField("0").as("href"),
        col("l").getField("1").as("text"),
        col("l").getField("2").as("fmt"))
      .filter(col("text").contains("Contracts Finder") && col("fmt") === "CSV")
      .select(col("month_start"), col("target_text"), col("search_url"),
        absolutizeUrl(col("href")).as("url"),
        sanitizeFilename(cleanLinkText(col("text"))).as("fname"))
      .orderBy("month_start")
  }

  /** Excel round-trip through the REAL sink and reader (SURVEY K1 + S8 +
    * U1; reference stage 2 writes one `.xlsx` per day — `2a:654`,
    * `2b:498` — and stage 3 glob-merges them — `3:30-57`). The query
    * slices a bounded week of orders, exports it through
    * [[graft.sources.Xlsx.writeDaily]] (genuine OOXML workbooks, one per
    * day), reads the workbooks back with the distributed StAX reader,
    * recovers the day from the FILENAME (F6 family — the data rows don't
    * carry it), and aggregates; the oracle computes the same aggregate
    * straight from parquet. A hash match proves the whole
    * stringify→zip→XML→parse round trip is lossless, in the driver's own
    * gate rather than only in ScalaTest.
    *
    * Determinism/oracle notes: money goes through DECIMAL(18,2) so the
    * workbook cell is plain digits and the re-parsed sum is exact
    * (shuffle-order double sums are banned — COVERAGE determinism
    * rules); final money column is DOUBLE on both engines, counts/key
    * sums BIGINT. Scale note: daily-extract workbooks are small by
    * construction (the reference's are single-day scrapes); the slice
    * here is one fixed week, so the export side stays bounded at any SF
    * while the scan/aggregate sides scale normally. */
  val q130XlsxRoundtrip: Q = Q(
    "q130_xlsx_roundtrip",
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-01-07'
      |GROUP BY 1
      |ORDER BY 1""") { (s, d) =>
    val slice = graft.Tables.orders(s, d)
      .filter(col("o_orderdate").between("1995-01-01", "1995-01-07"))
      .select(
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_orderkey").cast("string").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("string").as("price"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q130").toString
    graft.sources.Xlsx.writeDaily(slice, "day", dir)
    graft.sources.Xlsx.readDaily(s, dir)
      .select(
        regexp_extract(col("source_file"), "([0-9-]+)\\.xlsx$", 1).as("day"),
        expr("try_cast(price AS DECIMAL(18,2))").as("p"),
        col("o_orderkey").cast("bigint").as("k"))
      .groupBy("day")
      .agg(
        count(lit(1)).cast("bigint").as("n_orders"),
        sum(col("p")).cast("double").as("total_price"),
        sum(col("k")).cast("bigint").as("key_sum"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(q47ScrapeDiscovery, q130XlsxRoundtrip)
}
