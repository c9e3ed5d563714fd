package graft

import graft.sources.ContractsFinder
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** E2E test of the Contracts Finder extract stage (reference 2a):
  * fixture CSVs → URI projection → dedup-with-audit → mock fetch with
  * retry → OCDS flatten → partitioned parquet + legacy CSV export. */
/** Serializable fixture transport (a spec-class closure would drag the
  * non-serializable suite into the task). */
object CfFixtures extends Serializable {
  def ocds(id: String): String =
    s"""{"uri":"https://api.example/packages/$id","publishedDate":"2024-03-01T00:00:00Z",
       |"publisher":{"name":"UK Government"},"version":"1.1","releases":[
       |{"ocid":"$id","date":"2024-03-01","tag":["tender"],
       |"buyer":{"id":"b1","name":"Council $id"},
       |"parties":[{"id":"b1","name":"Council $id","roles":["buyer"],"region":"R"},
       |           {"id":"s1","name":"Supplier A","roles":["supplier"],"region":null}],
       |"tender":{"id":"t","title":"T-$id","value":{"amount":10.50},"items":[]},
       |"awards":[]}]}""".stripMargin.replaceAll("\n", "")

  // transport: /flaky fails once then succeeds (exercises S1 retry);
  // /bad always fails; /invalid returns non-JSON
  val mkFetcher: () => ContractsFinder.Fetcher = () => {
    val flakyAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    (url: String) => url match {
      case "http://x/flaky" if flakyAttempts.incrementAndGet() == 1 =>
        throw new java.io.IOException("timeout")
      case "http://x/bad" => throw new java.io.IOException("down")
      case "http://x/invalid" => "not json at all"
      case u => ocds(u.substring(u.lastIndexOf('/') + 1))
    }
  }
}

/** Serializable factory for the REAL socket transport — tasks capture
  * only this object, never the spec class or the server. */
object CfHttpFixture extends Serializable {
  val mk: () => ContractsFinder.Fetcher =
    () => ContractsFinder.httpFetcher(connectTimeoutMs = 2000, readTimeoutMs = 5000)
}

class CfPipelineSpec extends SparkSpec {
  import CfFixtures.mkFetcher

  test("S1/S2 over real sockets: loopback server, retry observed, permanent failure becomes a status row") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // zero-egress real-socket leg (round-10 VERDICT item 4): the only
    // transport the mock leg can't exercise is the HttpURLConnection
    // path itself — status-code mapping, stream read, timeout config
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val badHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1L else b.length.toLong)
      if (b.nonEmpty) { val os = ex.getResponseBody; os.write(b); os.close() }
      ex.close()
    }
    server.createContext("/pkg/", (ex: HttpExchange) =>
      respond(ex, 200, CfFixtures.ocds(ex.getRequestURI.getPath.stripPrefix("/pkg/"))))
    server.createContext("/flaky", (ex: HttpExchange) =>
      if (flakyHits.incrementAndGet() == 1) respond(ex, 500, "boom")
      else respond(ex, 200, CfFixtures.ocds("flaky")))
    server.createContext("/bad", (ex: HttpExchange) => {
      badHits.incrementAndGet(); respond(ex, 500, "down")
    })
    val goneHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/gone", (ex: HttpExchange) => {
      goneHits.incrementAndGet(); respond(ex, 404, "no such notice")
    })
    server.createContext("/invalid", (ex: HttpExchange) =>
      respond(ex, 200, "not json at all"))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dir = Files.createTempDirectory("graft-cf-http").toString
      Files.writeString(Paths.get(dir, "notices-2024-04-01.csv"),
        s"uri,ignored\n$base/pkg/a,j\n$base/flaky,j\n$base/bad,j\n$base/invalid,j\n$base/gone,j\n$base/pkg/a,dup\n")
      val wide = ContractsFinder.flatten(ContractsFinder.enrich(spark,
        ContractsFinder.dedupWithAudit(ContractsFinder.uriTable(spark, dir)),
        CfHttpFixture.mk)).collect()
      val status = wide.map(r =>
        r.getAs[String]("uri") -> r.getAs[String]("status")).toSeq
      assert(status.count(_ == (s"$base/pkg/a", "ok")) == 1)
      assert(status.contains((s"$base/pkg/a", "duplicate_uri_skipped_fetch")))
      // 500-then-200: fetchWithRetry's real socket path retried
      assert(status.contains((s"$base/flaky", "ok")))
      assert(flakyHits.get == 2, s"flaky endpoint must be hit twice, got ${flakyHits.get}")
      // permanent 500: all 3 attempts spent, then a status row, not a crash
      assert(status.contains((s"$base/bad", "fetch_failed_or_invalid_json")))
      assert(badHits.get == 3, s"bad endpoint must see maxRetries=3 attempts, got ${badHits.get}")
      // 4xx is permanent: exactly ONE attempt, no retry budget spent
      assert(status.contains((s"$base/gone", "fetch_failed_or_invalid_json")))
      assert(goneHits.get == 1, s"404 endpoint must be hit once (no retry), got ${goneHits.get}")
      // a 200 with an unparseable body downgrades at the flatten, as in the mock leg
      assert(status.contains((s"$base/invalid", "fetch_failed_or_invalid_json")))
      val ok = wide.find(r => r.getAs[String]("uri") == s"$base/pkg/a"
        && r.getAs[String]("status") == "ok").get
      assert(ok.getAs[String]("ocid") == "a" && ok.getAs[String]("buyer_name") == "Council a")
    } finally server.stop(0)
  }

  test("csv -> dedup-audit -> retrying mock fetch -> flatten -> sinks") {
    val dir = Files.createTempDirectory("graft-cf").toString
    Files.writeString(Paths.get(dir, "notices-2024-03-01.csv"),
      "uri,ignored\nhttp://x/a,junk\nhttp://x/b,junk\n,blank-skipped\nhttp://x/a,dup\n")
    Files.writeString(Paths.get(dir, "notices-2024-03-02.csv"),
      "uri,ignored\nhttp://x/a,cross-file-dup\nhttp://x/flaky,j\nhttp://x/bad,j\nhttp://x/invalid,j\n")

    val uris = ContractsFinder.uriTable(spark, dir)
    assert(uris.count() == 7) // blank line dropped

    val deduped = ContractsFinder.dedupWithAudit(uris)
    assert(deduped.count() == 7) // A1: audit rows preserved
    assert(deduped.filter(col("status") === "duplicate_uri_skipped_fetch").count() == 2)

    val wide = ContractsFinder.flatten(
      ContractsFinder.enrich(spark, deduped, mkFetcher))
    val byStatus = wide.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ok: a, b, flaky (succeeds on retry); failed: bad (IO), invalid
    // (JSON parse downgrade); dup: the two repeated a's
    assert(byStatus == Map(
      "ok" -> 3L,
      "fetch_failed_or_invalid_json" -> 2L,
      "duplicate_uri_skipped_fetch" -> 2L))
    // invalid JSON must not be "ok": parse failure downgrades
    val inv = wide.filter(col("uri") === "http://x/invalid").head()
    assert(inv.getAs[String]("status") == "fetch_failed_or_invalid_json")
    val ok = wide.filter(col("uri") === "http://x/a" && col("status") === "ok").head()
    assert(ok.getAs[String]("ocid") == "a" && ok.getAs[String]("buyer_name") == "Council a")
    assert(ok.getAs[String]("supplier_names") == "Supplier A")
    // reference 2a:501 `top_uri or uri`: package uri when parsed,
    // fetched uri as the fallback for unparseable bodies
    assert(ok.getAs[String]("package_uri") == "https://api.example/packages/a")
    assert(inv.getAs[String]("package_uri") == "http://x/invalid")

    // sinks: partitioned parquet + legacy CSV with header
    val outP = Files.createTempDirectory("graft-cf-out").toString
    ContractsFinder.runStage(spark, dir, outP, mkFetcher)
    val back = spark.read.parquet(outP)
    assert(back.count() == 7)
    assert(back.select("file_date").distinct().count() == 2)

    val outC = Files.createTempDirectory("graft-cf-csv").toString
    ContractsFinder.exportCsv(back.drop("file_date"), outC)
    val csvBack = spark.read.option("header", "true").csv(outC)
    assert(csvBack.count() == 7)
    assert(csvBack.columns.contains("ocid"))
  }

  test("package uri fallback is Python-falsy: whitespace-only is truthy and kept") {
    import spark.implicits._
    val enriched = Seq(
      ("http://x/ws", "f.csv", 0, "2024-03-01", "ok",
        """{"uri":"  ","releases":[{"ocid":"w"}]}"""),
      ("http://x/empty", "f.csv", 1, "2024-03-01", "ok",
        """{"uri":"","releases":[{"ocid":"e"}]}"""),
      ("http://x/missing", "f.csv", 2, "2024-03-01", "ok",
        """{"releases":[{"ocid":"m"}]}"""))
      .toDF("uri", "csv_file", "row_index", "file_date", "status", "body")
    val m = ContractsFinder.flatten(enriched).collect()
      .map(r => r.getAs[String]("uri") -> r.getAs[String]("package_uri")).toMap
    assert(m("http://x/ws") == "  ") // `"  " or uri` keeps the whitespace
    assert(m("http://x/empty") == "http://x/empty") // `"" or uri` falls back
    assert(m("http://x/missing") == "http://x/missing") // missing key → None → uri
  }
}
