package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-pack invariants not already pinned by the DuckDB oracle —
  * cross-checks computed independently of the query's own plan. */
class TextSpec extends SparkSpec {

  test("q88: top pair count matches an independent recount and ordering is a deterministic top-k") {
    val out = ops.Text.q88PairMerge.fn(spark, sf).collect()
    assert(out.length == 50)
    // n_occ non-increasing; ties broken by pair ascending
    out.sliding(2).foreach { case Array(a, b) =>
      val (na, nb) = (a.getLong(1), b.getLong(1))
      assert(na > nb || (na == nb && a.getString(0) < b.getString(0)))
    }
    // recount the winning pair with an unrelated spelling (bigram
    // shingles) — the explode/slice window construction must agree
    val top = out.head
    val recount = Tables.documents(spark, sf)
      .select(explode(shingles(tokens(col("text")), 2)).as("bg"))
      .filter(col("bg") === top.getString(0))
      .count()
    assert(recount == top.getLong(1), s"pair '${top.getString(0)}' recount mismatch")
  }
}
