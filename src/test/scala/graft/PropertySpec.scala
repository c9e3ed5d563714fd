package graft

import graft.functions.TextFunctions._
import graft.sources.FatXml
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based specs (SURVEY §5.4): totality of the flatteners on
  * arbitrary input, count preservation of dedup-with-audit, column-order
  * invariance of the merge, and MinHash/Jaccard invariants. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest bridge isn't on
  * the offline classpath) — failures reproduce deterministically. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t"),
      Gen.const("<"), Gen.const("&"), Gen.const("\"")))
      .map(_.mkString).map(_.take(200))

  test("FatXml.extract is total: arbitrary strings yield audit rows, never throw") {
    val texts = samples(asciiText, 40)
    val out = FatXml.extract(texts.toDF("xml"), Seq.empty).collect()
    assert(out.length == texts.length)
    assert(out.forall(r =>
      r.getAs[String]("doc_id") != null || r.getAs[String]("parse_error") != null))
  }

  test("tokens/shingles/minhash are total and bounded on arbitrary text") {
    val df = samples(asciiText, 60).toDF("t")
      .select(minhashSig(shingles(tokens(col("t")), 5), 16).as("sig"))
    df.collect().foreach { row =>
      val sig = row.getAs[scala.collection.Seq[Long]]("sig")
      assert(sig.length == 16)
      assert(sig.forall(v => v >= 0 && v < MinhashPrime))
    }
  }

  test("native hash expressions equal their column spellings on arbitrary unicode input") {
    // unicode-heavy strings plus nulls/empties — the adversarial cases
    // for the fused md5 paths (multi-byte UTF-8, empty shingles)
    val uniToken: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("é", "ß", "中文", "🙂", "a b", ""),
      Gen.const(null: String))
    val arrays = samples(Gen.listOf(uniToken).map(_.take(12)), 60)
    val df = arrays.toDF("toks").select(
      tokenShingleHashes(col("toks")).as("sh_native"),
      shingleHashes(shingles(col("toks"), 5)).as("sh_cols"),
      org.apache.spark.sql.graft.PlanShim.column(
        graft.plans.MinHashSig(
          org.apache.spark.sql.graft.PlanShim.expression(col("toks")))).as("mh_native"),
      minhashSigFromHashes(shingleHashes(shingles(col("toks"), 5)), 16).as("mh_cols"),
      // string-typed spelled side: Hex32Rewrite only matches the
      // long-cast form, so the reference column stays un-rewritten
      transform(col("toks"), t => hex32(t).cast("string")).as("hx_native"),
      transform(col("toks"), t =>
        conv(substring(md5(t.cast("string")), 1, 8), 16, 10)).as("hx_spelled"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"shingle hashes diverge: $r")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"minhash diverges: $r")
      assert(r.getSeq[Any](4) == r.getSeq[Any](5), s"hex32 diverges: $r")
    }
  }

  test("graft_dot equals the HOF fold on arbitrary doubles (NaN/Inf/extremes included)") {
    val d: Gen[Double] = Gen.oneOf(
      Gen.choose(-1e3, 1e3),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e300, -1e300,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
    val pairs = samples(for {
      n <- Gen.choose(0, 16)
      m <- Gen.oneOf(Gen.const(n), Gen.choose(0, 16)) // sometimes ragged
      a <- Gen.listOfN(n, d)
      b <- Gen.listOfN(m, d)
    } yield (a, b), 100)
    val df = pairs.toDF("a", "b").select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, e) => acc + e).as("portable"))
    df.collect().foreach { r =>
      // ragged pairs: both spellings must agree on NULL
      assert(r.isNullAt(0) == r.isNullAt(1), s"null-ness diverges: $r")
      if (!r.isNullAt(0)) {
        val (n, p) = (r.getDouble(0), r.getDouble(1))
        // compare bit patterns so NaN == NaN and -0.0 != 0.0 are exact
        assert(java.lang.Double.doubleToRawLongBits(n) ==
          java.lang.Double.doubleToRawLongBits(p) ||
          (n.isNaN && p.isNaN), s"dot diverges: $n vs $p")
      }
    }
  }

  test("jaccardPpm is symmetric and within [0, 1e6]") {
    val words = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.take(12))
    val pairs = samples(Gen.zip(words, words), 50)
    val rows = pairs.toDF("xs", "ys")
      .select(jaccardPpm(col("xs"), col("ys")).as("j1"),
        jaccardPpm(col("ys"), col("xs")).as("j2"))
      .collect()
    rows.foreach { r =>
      val (j1, j2) = (r.getLong(0), r.getLong(1))
      assert(j1 == j2 && j1 >= 0 && j1 <= 1000000L)
    }
  }

  test("dedup-with-audit preserves row count for arbitrary uri multisets") {
    samples(Gen.listOfN(30, Gen.oneOf("u1", "u2", "u3", "u4", "u5")), 10)
      .filter(_.nonEmpty).foreach { uris =>
        val df = uris.zipWithIndex
          .map { case (u, i) => (u, "f.csv", i.toLong, "2024-01-01") }
          .toDF("uri", "csv_file", "row_index", "file_date")
        val out = graft.sources.ContractsFinder.dedupWithAudit(df)
        assert(out.count() == uris.length)
        assert(out.filter(col("status") === "pending_fetch").count() == uris.distinct.length)
      }
  }

  test("unionByName is column-order invariant (the reference's positional hazard, fixed)") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val bReversed = Seq(("y", 2L)).toDF("v", "k")
    val u = a.unionByName(bReversed).orderBy("k").collect()
    assert(u.map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }
}
