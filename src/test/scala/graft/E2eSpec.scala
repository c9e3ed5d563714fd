package graft

/** CI leg of `graft.E2eBench` (round-9 VERDICT stretch item 8): the
  * reference-parity scrape→extract→merge path — DSv2 ZIP connector →
  * FatXml family dispatch + error capture → date-partitioned parquet →
  * lineage merge/rollup → merged CSV — executes every round at reduced
  * volume instead of being a one-off measurement. The full-volume
  * numbers (64×1250, 13.4 s, 23 KiB shuffle) live in COVERAGE.md. */
class E2eSpec extends SparkSpec {

  test("E2eBench: 8 zips x 125 notices complete with exact error capture") {
    val r = E2eBench.run(spark, 8, 125)
    assert(r.notices == 1000)
    // ids 1..1000, every 50th payload planted malformed
    assert(r.nErr == 20, s"all 20 planted parse errors must surface, got ${r.nErr}")
    assert(r.nOk == 980, s"ok rows: ${r.nOk}")
    assert(r.tExtract > 0 && r.tMerge > 0 && r.tCsv > 0, "all three stages must run")
  }
}
