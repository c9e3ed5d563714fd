package graft

/** The zipf-mode scale-up derivation (round-9 VERDICT item 5) must be
  * deterministic and provably skewed: exact ×factor row growth, Zipf
  * block-merged hot keys (a residue-0 key carries factor× its base
  * density under ONE key; a residue-15 key stays in disjoint per-copy
  * universes), and the every-64th-doc long-text tail. */
class ScaleUpSpec extends SparkSpec {

  test("zipf mode: x4 tree has exact row growth, merged hot keys, long-doc tail") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val dest = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    ScaleUp.run(spark, src, dest, 4, "zipf")
    val f = 4L
    val stride = 1L << 32

    for (t <- Seq("customer", "orders", "lineitem", "events", "documents")) {
      val base = spark.read.parquet(s"$src/$t.parquet").count()
      val got = spark.read.parquet(s"$dest/$t.parquet").count()
      assert(got == base * f, s"$t rows: $got != ${base * f}")
    }

    // events.user_id: residue-0 users merge all 4 copies into ONE key at
    // 4x base density; residue-15 users keep 4 disjoint 1x universes
    val baseEv = Tables.events(spark, src).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotEv = Tables.events(spark, dest).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u0 = baseEv.keys.filter(u => ((u % 16) + 16) % 16 == 0)
      .minOption.getOrElse(fail("no residue-0 user in base events"))
    assert(gotEv(u0) == f * baseEv(u0), s"hot user $u0 density")
    (1L until f).foreach(c =>
      assert(!gotEv.contains(u0 + c * stride), s"hot user must not fork copy $c"))
    // cold = any residue with multiplicity 1 (11..15); sf0.001 has only
    // 15 distinct users, so residue 15 itself may be absent
    val u15 = baseEv.keys.filter(u => ((u % 16) + 16) % 16 >= 11)
      .minOption.getOrElse(fail("no cold-residue user in base events"))
    (0L until f).foreach(c =>
      assert(gotEv(u15 + c * stride) == baseEv(u15), s"cold user copy $c density"))

    // orders.o_custkey: same block-merge law (hot-customer join fan-in)
    val baseOrd = spark.read.parquet(s"$src/orders.parquet")
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotOrd = spark.read.parquet(s"$dest/orders.parquet")
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c0 = baseOrd.keys.filter(k => ((k % 16) + 16) % 16 == 0)
      .minOption.getOrElse(fail("no residue-0 custkey in base orders"))
    assert(gotOrd(c0) == f * baseOrd(c0), s"hot custkey $c0 fan-in")
    // referential integrity: every derived o_custkey exists in customer
    val missing = spark.read.parquet(s"$dest/orders.parquet")
      .select(col("o_custkey").as("k")).distinct()
      .join(spark.read.parquet(s"$dest/customer.parquet")
        .select(col("c_custkey").as("k")), Seq("k"), "left_anti").count()
    assert(missing == 0, s"$missing orphaned o_custkey values")

    // documents: every 64th base doc repeats its text 8x (copy-0 text is
    // unmutated, so the length law is exact: 8*len + 7 separators)
    val baseDocs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotLen = spark.read.parquet(s"$dest/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dLong = baseDocs.keys.filter(_ % 64 == 0)
      .minOption.getOrElse(fail("no 64-multiple doc_id in base documents"))
    assert(gotLen(dLong) == 8 * baseDocs(dLong) + 7, s"long-doc tail on $dLong")
    val dShort = baseDocs.keys.filter(_ % 64 != 0)
      .minOption.getOrElse(fail("no non-multiple doc_id"))
    assert(gotLen(dShort) == baseDocs(dShort), s"copy-0 short doc $dShort unchanged")
  }
}
