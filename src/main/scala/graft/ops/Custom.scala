package graft.ops

import graft.{Q, Tables}
import graft.functions.{MinHashAgg, TextFunctions}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Custom-operator pack: the native Catalyst expression and the typed
  * Aggregator, both oracle-checked against their relational
  * equivalents. */
object Custom {

  private val DHex32 = "CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)"

  /** q45 — the codegen'd `graft_hamming` expression (plans.HammingDistance,
    * injected by GraftExtensions) vs DuckDB bit_count(xor). */
  val q45NativeHamming: Q = Q(
    "q45_native_hamming",
    s"""WITH t AS (
       |  SELECT p_partkey,
       |    ${DHex32.replace("md5(s)", "md5(p_name)")} AS a,
       |    ${DHex32.replace("md5(s)", "md5(p_brand)")} AS b
       |  FROM part
       |)
       |SELECT p_partkey, a, b, CAST(bit_count(xor(a, b)) AS BIGINT) AS hamming
       |FROM t ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        hex32(col("p_name")).as("a"),
        hex32(col("p_brand")).as("b"))
      .withColumn("hamming", expr("graft_hamming(a, b)"))
      .orderBy("p_partkey")
  }

  /** q46 — distributed MinHash via the typed Aggregator: shingles are
    * exploded to rows and the signature is computed by map-side partial
    * aggregation (the shuffle carries one 16-long array per doc, never
    * the shingles). Must equal the expression-side signature of q27 —
    * and the oracle recomputes it relationally with 16 MIN()s. */
  val q46MinhashAgg: Q = Q(
    "q46_minhash_agg",
    {
      val mins = (0 until 16)
        .map(p => s"MIN((h * ${2 * p + 1} + ${p.toLong * p + 7}) % 2038074743)")
        .mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS toks
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks)-4, 1)+1),
         |    i -> array_to_string(toks[i:i+4], ' '))) AS s
         |  FROM toks
         |), hs AS (
         |  SELECT doc_id, $DHex32 AS h FROM sh
         |)
         |SELECT doc_id, concat_ws(',', $mins) AS sig
         |FROM hs GROUP BY doc_id ORDER BY doc_id"""
    }) { (s, d) =>
    val mh = udaf(new MinHashAgg(16))
    Tables.documents(s, d)
      .select(col("doc_id"),
        // fused native shingle hashing: the explode ships longs, never
        // shingle strings (plans.ShingleHashes; bit-identical to the
        // shingles+hex32 spelling)
        explode(tokenShingleHashes(TextFunctions.tokens(col("text")))).as("h"))
      .groupBy("doc_id")
      .agg(mh(col("h")).as("sigArr"))
      .select(col("doc_id"),
        array_join(transform(col("sigArr"), _.cast("string")), ",").as("sig"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q45NativeHamming, q46MinhashAgg)
}
