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

class CfPipelineSpec extends SparkSpec {
  import CfFixtures.mkFetcher

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
