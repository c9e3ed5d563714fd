package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Unit specs for the text-pipeline primitives: tokenization edge cases,
  * shingle windows, MinHash/SimHash behavior on duplicates vs near-dups,
  * Jaccard, integer-ppm ratios. */
class TextFunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("tokens: lowercased, split on runs of whitespace, blanks removed") {
    assert(one(tokens(lit("  The  quick\tFox "))) == Seq("the", "quick", "fox"))
    assert(one(tokens(lit(""))) == Seq())
    assert(one(tokens(lit("   "))) == Seq())
  }

  test("shingles: sliding 5-gram windows; short docs yield one shingle") {
    val t = tokens(lit("a b c d e f"))
    assert(one(shingles(t, 5)) == Seq("a b c d e", "b c d e f"))
    assert(one(shingles(tokens(lit("a b")), 5)) == Seq("a b"))
  }

  test("minhash signature is identical for identical docs, mostly equal for near-dups") {
    val a = minhashSig(shingles(tokens(lit("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")), 5), 16)
    val b = minhashSig(shingles(tokens(lit("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")), 5), 16)
    assert(one(a) == one(b))
    val sigA = one(a).asInstanceOf[scala.collection.Seq[Long]]
    assert(sigA.length == 16 && sigA.forall(v => v >= 0 && v < MinhashPrime))
  }

  test("simhash: equal docs equal codes; disjoint docs differ; hamming works") {
    val c1 = simhash32(shingles(tokens(lit("a b c d e f g h")), 5))
    val c2 = simhash32(shingles(tokens(lit("a b c d e f g h")), 5))
    val c3 = simhash32(shingles(tokens(lit("z y x w v u t s")), 5))
    assert(one(hamming32(c1, c2)) == 0L)
    assert(one(hamming32(c1, c3)).asInstanceOf[Long] > 0L)
  }

  test("jaccardPpm: identical arrays 1e6, disjoint 0, half overlap floored") {
    assert(one(jaccardPpm(array(lit("a"), lit("b")), array(lit("a"), lit("b")))) == 1000000L)
    assert(one(jaccardPpm(array(lit("a")), array(lit("b")))) == 0L)
    // {a,b} vs {b,c}: 1 / 3
    assert(one(jaccardPpm(array(lit("a"), lit("b")), array(lit("b"), lit("c")))) == 333333L)
  }

  test("ppm ratios floor and handle zero denominators") {
    assert(one(punctPpm(lit("ab.!"))) == 500000L)
    assert(one(punctPpm(lit(""))) == 0L)
    assert(one(digitPpm(lit("a1b2c"))) == 400000L)
    assert(one(upperPpm(lit("aAbB"))) == 500000L)
    assert(one(stopwordPpm(tokens(lit("the cat and dog")), Seq("the", "and"))) == 500000L)
    assert(one(meanTokenLenMilli(tokens(lit("ab abcd")))) == 3000L)
  }

  test("langId votes with fixed tie-break; und when no stopwords hit") {
    assert(one(langId(tokens(lit("the cat of it")))) == "en")
    assert(one(langId(tokens(lit("der hund und die katze")))) == "de")
    assert(one(langId(tokens(lit("xyzzy plugh")))) == "und")
    // 'la' appears in fr and es lists -> fr wins by fixed order
    assert(one(langId(tokens(lit("la la")))) == "fr")
  }

  test("fingerprints: normalization-invariant doc_fp; min-shingle stable under tail edits") {
    assert(one(docFingerprint(lit("A  b\tC"))) == one(docFingerprint(lit("a b c"))))
    val long = ("w1 w2 w3 w4 w5 " * 4).trim // minimizer likely inside repeated prefix
    val fp1 = one(minShingleFingerprint(tokens(lit(long + " tailA"))))
    val fp2 = one(minShingleFingerprint(tokens(lit(long + " tailB"))))
    // not asserting equality (minimizer may sit in the tail) but both defined
    assert(fp1 != null && fp2 != null)
  }

  test("hex32 matches DuckDB's CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)") {
    // md5('hello') = 5d41402a... -> 0x5d41402a = 1564557354
    assert(one(hex32(lit("hello"))) == 1564557354L)
  }
}
