package graft.sources

import graft.ops.Ocds
import graft.functions.RefFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contracts Finder extract stage (reference 2a, SURVEY E2): monthly
  * CSVs of notice URIs → first-column projection (P1) + blank skip (P5)
  * → per-URI dedup **with audit rows** (A1 — duplicates become status
  * rows, never dropped) → per-partition HTTP JSON fetch with bounded
  * retry (S1/S2 — transport injected so tests and offline runs use a
  * fake) → OCDS flatten (X1, reusing the release schema) → parquet
  * partitioned by the filename-encoded date (F6/K1), with a legacy CSV
  * export (K2).
  *
  * Scale shape: dedup happens BEFORE the expensive fetch (the
  * "push cheap reduction below expensive op" ordering the reference
  * hand-codes); the fetch itself is a mapPartitions enrichment so one
  * connection/client serves a whole partition, and executors give the
  * fan-out the reference only gets by running scripts side-by-side.
  */
object ContractsFinder {

  /** Injected transport: url → body. Throw IOException for transient
    * failures (retried), return invalid JSON for permanent ones. */
  type Fetcher = String => String

  /** A 4xx from the server: the request itself is wrong, so retrying is
    * pointless — `fetchWithRetry` rethrows immediately instead of
    * spending the retry budget. (Deliberate deviation from the
    * reference, which retries only ReadTimeout and breaks on any HTTP
    * error — we additionally retry 5xx, which IS transient in practice.) */
  final class PermanentHttpError(msg: String) extends java.io.IOException(msg)

  /** Production transport (S1/S2, reference `1a:45-58` / `2a:32-48`):
    * one JDK HttpURLConnection GET per call — zero-dependency, real
    * sockets. A 5xx raises IOException so `fetchWithRetry`'s bounded
    * retry engages exactly as on connect/read timeouts; a 4xx raises
    * [[PermanentHttpError]] (no retry). Streams are fully drained and
    * closed but the connection is NOT disconnect()ed — the JDK's
    * keep-alive cache then reuses the socket, so `enrich`'s
    * one-Fetcher-per-partition shape really does amortize the TCP
    * handshake across a partition's URIs. Spec-pinned over a 127.0.0.1
    * loopback server in CfPipelineSpec (zero egress). */
  def httpFetcher(connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Fetcher = { url =>
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestProperty("Accept", "application/json")
    val code = conn.getResponseCode
    if (code / 100 != 2) {
      // drain + close the error body so the keep-alive socket is clean
      // for reuse; disconnect() here would close the underlying socket
      // and force a fresh handshake per request
      val err = conn.getErrorStream
      if (err != null) try err.readAllBytes() finally err.close()
      if (code / 100 == 4) throw new PermanentHttpError(s"HTTP $code for $url")
      throw new java.io.IOException(s"HTTP $code for $url")
    }
    val in = conn.getInputStream
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** S1 retry loop: up to `maxRetries` attempts on transient
    * IOException, with a small sleep between attempts (the reference
    * sleeps 2 s on ReadTimeout, `2a:40-44`; we default lower because a
    * whole partition's URIs sit behind each sleep). A
    * [[PermanentHttpError]] (4xx) is never retried. */
  def fetchWithRetry(fetch: Fetcher, maxRetries: Int = 3,
      backoffMs: Long = 250L)(url: String): String = {
    var attempt = 1
    while (true) {
      try return fetch(url)
      catch {
        case e: PermanentHttpError => throw e
        case e: java.io.IOException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** S5/S6/P1/P5/F6 — URI rows from every monthly CSV under `csvDir`:
    * first column only, blanks skipped, per-file row_index in file
    * order, date parsed from the filename. */
  def uriTable(spark: SparkSession, csvDir: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(s"$csvDir/*.csv")
    val firstCol = raw.columns.head
    // per-file row order, guaranteed: when one CSV splits into several
    // read tasks, input_file_block_start() orders the chunks by their
    // byte offset inside the file, and monotonically_increasing_id() is
    // ascending within each task — so (block_start, mono) reconstructs
    // file order even when partition ids are assigned out of file order
    // (mono alone is NOT ordered across a file's splits).
    val w = Window.partitionBy("csv_file").orderBy("block_start", "mono")
    raw
      .select(col(firstCol).as("uri"),
        input_file_name().as("csv_file"),
        input_file_block_start().as("block_start"),
        monotonically_increasing_id().as("mono"))
      .withColumn("row_index", row_number().over(w).cast("long"))
      .drop("mono", "block_start")
      // row_index is assigned BEFORE the blank filter: the reference's
      // `df.iloc[:,0].dropna()` keeps pandas' original positional index,
      // so its enumeration also counts skipped blank rows.
      .filter(col("uri").isNotNull && trim(col("uri")) =!= "")
      .withColumn("file_date", concat_ws("-",
        filenameYear(col("csv_file")), filenameMonth(col("csv_file")),
        filenameDay(col("csv_file"))))
  }

  /** A1 — dedup-with-audit: first occurrence of each URI (by file, then
    * row) is fetchable; later duplicates stay as audit rows with
    * status='duplicate_uri_skipped_fetch'. Row count is preserved. */
  def dedupWithAudit(uris: DataFrame): DataFrame = {
    val w = Window.partitionBy("uri").orderBy("csv_file", "row_index")
    uris
      .withColumn("rn", row_number().over(w))
      .withColumn("status",
        when(col("rn") === 1, "pending_fetch").otherwise("duplicate_uri_skipped_fetch"))
      .drop("rn")
  }

  /** S2 — per-partition enrichment: fetch each pending URI, mark
    * failures instead of failing the job. `mkFetcher` runs once per
    * partition (connection/client reuse). */
  def enrich(spark: SparkSession, deduped: DataFrame, mkFetcher: () => Fetcher,
      maxRetries: Int = 3): DataFrame = {
    import spark.implicits._
    val cols = Seq("uri", "csv_file", "row_index", "file_date", "status")
    val ds = deduped.select(cols.map(col): _*)
      .as[(String, String, Long, String, String)]
    ds.mapPartitions { it =>
      lazy val fetch = mkFetcher()
      it.map { case (uri, f, i, d, status) =>
        if (status != "pending_fetch") (uri, f, i, d, status, null: String)
        else {
          try {
            val body = fetchWithRetry(fetch, maxRetries)(uri)
            (uri, f, i, d, "ok", body)
          } catch {
            case _: Exception => (uri, f, i, d, "fetch_failed_or_invalid_json", null: String)
          }
        }
      }
    }.toDF("uri", "csv_file", "row_index", "file_date", "status", "body")
  }

  /** X1 — flatten the fetched OCDS release package into the wide row
    * (subset of the q35 flatten; the reference consumes releases[0]),
    * preserving audit rows: a body that fails to parse downgrades
    * status to fetch_failed_or_invalid_json. */
  def flatten(enriched: DataFrame): DataFrame = {
    // package parsed once (CollapseProject won't duplicate the non-cheap
    // aliased from_json even though many fields read it)
    val withPkg = enriched.withColumn("_pkg", from_json(col("body"), Ocds.packageSchema))
    val pkg = col("_pkg")
    val r = firstOrNull(pkg.getField("releases"))
    val parsed = r.getField("ocid").isNotNull
    val buyer = findFirstById(r.getField("parties"), r.getField("buyer").getField("id"))
    val sups = partiesWithRole(r.getField("parties"), "supplier")
    withPkg.select(
      col("uri"), col("csv_file"), col("row_index"), col("file_date"),
      // the reference's identification uri: `top_uri or uri` (2a:501) —
      // Python-falsy, so only an EMPTY ("") or missing package uri falls
      // back to the fetched uri (coalesce would keep the ""). No trim:
      // Python treats a whitespace-only string as truthy and keeps it.
      // Null length is null → otherwise branch covers the missing field.
      when(length(pkg.getField("uri")) > 0, pkg.getField("uri"))
        .otherwise(col("uri")).as("package_uri"),
      when(col("status") === "ok" && !parsed, "fetch_failed_or_invalid_json")
        .otherwise(col("status")).as("status"),
      r.getField("ocid").as("ocid"),
      r.getField("date").as("release_date"),
      firstOrNull(r.getField("tag")).as("notice_tag"),
      buyer.getField("name").as("buyer_name"),
      pipeJoin(transform(sups, p => p.getField("name"))).as("supplier_names"),
      r.getField("tender").getField("title").as("tender_title"),
      r.getField("tender").getField("value").getField("amount").as("tender_value"),
      firstOrNull(r.getField("awards")).getField("value").getField("amount")
        .as("first_award_value"))
  }

  /** Full stage: CSVs → wide parquet partitioned by file_date (K1). */
  def runStage(spark: SparkSession, csvDir: String, outDir: String,
      mkFetcher: () => Fetcher): Unit = {
    val wide = flatten(enrich(spark, dedupWithAudit(uriTable(spark, csvDir)), mkFetcher))
    wide.write.mode("overwrite").partitionBy("file_date").parquet(outDir)
  }

  /** K2 — legacy single-CSV export with header (idempotent overwrite
    * replaces the reference's delete-then-append). */
  def exportCsv(df: DataFrame, outDir: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(outDir)

  /** Reference merge stage (`3_merge_to_two.py:30-57`): glob the
    * per-day Excel extracts, union them, export one header'd CSV —
    * here with the corrected union-BY-NAME semantics (SURVEY §2.8 U1)
    * instead of the reference's positional append, so days whose
    * column sets drifted merge as nulls rather than silently
    * misaligning. */
  def mergeXlsxToCsv(spark: SparkSession, xlsxDir: String, outDir: String): Unit =
    exportCsv(Xlsx.readDaily(spark, xlsxDir).drop("source_file"), outDir)
}
