package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger scale factor from an existing one by local
  * replication with key remapping — the round-5 VERDICT's recipe for
  * demonstrating the scaling CURVE (sf0.1 → sf1) without network access.
  *
  * `runMain graft.ScaleUp [srcDir] [destDir] [factor]`
  *
  * Each fact row is multiplied by a broadcast 16-row `copy` table (an
  * in-place row multiplier: no shuffle, no skew — the same shape you'd
  * use to synthesize load on a real cluster), and every key column is
  * offset by `copy * 2^32` CONSISTENTLY across tables, so referential
  * integrity (customer↔orders↔lineitem, part/supplier↔lineitem,
  * doc↔chunks) survives: each copy is a disjoint key universe joining
  * only to itself. Dimensions that queries broadcast (region, nation)
  * keep a single copy, exactly like a production scale-up.
  *
  * Content dedup/ANN realism: verbatim text/vector replication would
  * make every document a 16-way near-duplicate — LSH buckets would grow
  * 16x and the pair stage 256x, measuring a pathological corpus rather
  * than engine scaling. Instead copy i>0 permutes each document's tokens
  * by a deterministic per-copy hash order (unigram statistics — length,
  * language id, quality ratios, BM25/LM counts — are preserved; w-shingle
  * sets decorrelate, so near-dup rates stay realistic) and rotates each
  * embedding vector by i positions (norm and component distribution
  * preserved; pairwise cosine between copies decorrelates).
  */
object ScaleUp {
  private val Stride = 1L << 32
  /** documents/embeddings use a SMALL stride: the corpus convention
    * (Dedup.corpus, q72/q83/q120) encodes semantics in doc_id RANGES —
    * ids < 1e6 are corpus rows and ids >= 2e6 are (synthesized)
    * benchmark rows — so scaled ids must stay inside [0, 1e6). Base ids
    * run 0..4999; 62,500 x 15 + 4,999 = 942,499 keeps 16 disjoint copies
    * in-band. */
  private val DocStride = 62500L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(16)

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", Tuning.codegenCacheMaxEntries.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(factor <= 16, s"doc_id band [0, 1e6) fits at most 16 copies, got $factor")
    val copies = broadcast(spark.range(factor).select(col("id").as("copy")))
    def remapBy(stride: Long)(keys: String*)(df: DataFrame): DataFrame =
      keys.foldLeft(df.crossJoin(copies)) { (d, k) =>
        d.withColumn(k, col(k) + col("copy") * stride)
      }
    def remap(keys: String*)(df: DataFrame): DataFrame = remapBy(Stride)(keys: _*)(df)

    def write(name: String, df: DataFrame): Unit = {
      df.drop("copy").write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scaleup] $name -> $dest")
    }

    // fixed dimensions: single copy, same as production
    write("region", spark.read.parquet(s"$src/region.parquet"))
    write("nation", spark.read.parquet(s"$src/nation.parquet"))

    write("customer", remap("c_custkey")(
      spark.read.parquet(s"$src/customer.parquet")))
    write("supplier", remap("s_suppkey")(
      spark.read.parquet(s"$src/supplier.parquet")))
    write("part", remap("p_partkey")(
      spark.read.parquet(s"$src/part.parquet")))
    write("orders", remap("o_orderkey", "o_custkey")(
      spark.read.parquet(s"$src/orders.parquet")))
    write("lineitem", remap("l_orderkey", "l_partkey", "l_suppkey")(
      spark.read.parquet(s"$src/lineitem.parquet")))
    // per-copy user universe: per-user event density (the sessionization
    // and window workloads' real cost driver) stays what it was.
    // events.ts has shipped as TIMESTAMP(NANOS) or timestamp[us] across
    // fixture generations. nanosAsLong makes a nanos source readable
    // (it passes through and is re-written as BIGINT); a timestamp[us]
    // source reads as TIMESTAMP_NTZ and is re-written as NTZ micros.
    // Either output shape round-trips through the schema-adaptive
    // Tables.events (nano shim vs NTZ→UTC cast) — asserted below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write("events", remap("event_id", "user_id")(
      spark.read.parquet(s"$src/events.parquet")))
    // Fail loud here rather than 16 queries deep: the derived events
    // file must load through Tables.events with the public schema.
    val tsType = Tables.events(spark, dest).schema("ts").dataType
    require(tsType == org.apache.spark.sql.types.TimestampType,
      s"derived events.ts must load as TIMESTAMP, got $tsType")

    // documents: remap doc_id; copy>0 permutes tokens deterministically
    // (hash-of-(token, copy) sort order; ties broken by the token)
    val docs = remapBy(DocStride)("doc_id")(spark.read.parquet(s"$src/documents.parquet"))
      .withColumn("text", when(col("copy") === 0, col("text")).otherwise(
        array_join(expr(
          "transform(array_sort(transform(split(text, ' '), " +
            "t -> struct(xxhash64(t, copy) as h, t as t))), s -> s.t)"),
          " ")))
      .withColumn("n_chars", length(col("text")))
    write("documents", docs)

    // embeddings: remap vec_id; rotate the vector by copy positions
    val dim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    val emb = remapBy(DocStride)("vec_id")(spark.read.parquet(s"$src/embeddings.parquet"))
      .withColumn("embedding", expr(
        s"concat(slice(embedding, cast(copy % $dim as int) + 1, " +
          s"$dim - cast(copy % $dim as int)), " +
          s"slice(embedding, 1, cast(copy % $dim as int)))"))
    write("embeddings", emb)

    println(s"[scaleup] done: $src x$factor -> $dest")
    spark.stop()
  }
}
