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

    // events.user_id: the super-hot head takes every event_id%8==0 row
    // onto user 0 (1/8 of the table on ONE key — partition-dominant);
    // the rest follow the block-merge law on their KEPT rows: residue-0
    // users merge all 4 copies into one key at 4x density, cold
    // residues (>=11) keep 4 disjoint 1x universes
    import org.apache.spark.sql.functions.pmod
    val baseKeepEv = Tables.events(spark, src)
      .filter(pmod(col("event_id"), lit(8L)) =!= 0)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseTotalEv = Tables.events(spark, src).count()
    val baseHotEv = baseTotalEv - baseKeepEv.values.sum // event_id%8==0 rows
    val gotEv = Tables.events(spark, dest).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotEv(0L) == f * (baseHotEv + baseKeepEv.getOrElse(0L, 0L)),
      s"super-hot user 0 must absorb every redirected row, got ${gotEv(0L)}")
    assert(gotEv(0L) >= f * baseTotalEv / 8, "hot head must dominate 1/8 of rows")
    // fully-merged law on a residue-1..6 user (multiplicity >= 4 = f at
    // factor 4): one key, f x kept-row density (sf0.001 has only user 0
    // at residue 0, and user 0 is the super-hot target)
    val u0 = baseKeepEv.keys.filter(u => { val r = ((u % 16) + 16) % 16; r >= 1 && r <= 6 })
      .minOption.getOrElse(fail("no residue-1..6 user in base events"))
    assert(gotEv(u0) == f * baseKeepEv(u0), s"merged user $u0 density")
    (1L until f).foreach(c =>
      assert(!gotEv.contains(u0 + c * stride), s"merged user must not fork copy $c"))
    // half-merged law on a residue-7..10 user (multiplicity 2): two keys
    // (blocks {0,1} and {2,3}), each at 2x kept-row density
    val u7 = baseKeepEv.keys.filter(u => { val r = ((u % 16) + 16) % 16; r >= 7 && r <= 10 })
      .minOption.getOrElse(fail("no residue-7..10 user in base events"))
    assert(gotEv(u7) == 2 * baseKeepEv(u7), s"half-merged user $u7 block 0")
    assert(gotEv(u7 + 2 * stride) == 2 * baseKeepEv(u7), s"half-merged user $u7 block 1")
    assert(!gotEv.contains(u7 + stride) && !gotEv.contains(u7 + 3 * stride),
      s"half-merged user $u7 must have exactly 2 keys")
    // cold = any residue with multiplicity 1 (11..15); sf0.001 has only
    // 15 distinct users, so residue 15 itself may be absent
    val u15 = baseKeepEv.keys.filter(u => ((u % 16) + 16) % 16 >= 11)
      .minOption.getOrElse(fail("no cold-residue user in base events"))
    (0L until f).foreach(c =>
      assert(gotEv(u15 + c * stride) == baseKeepEv(u15), s"cold user copy $c density"))

    // orders.o_custkey: same laws (super-hot head on custkey 16, block
    // merge on the kept rows)
    val baseKeepOrd = spark.read.parquet(s"$src/orders.parquet")
      .filter(pmod(col("o_orderkey"), lit(8L)) =!= 0)
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseTotalOrd = spark.read.parquet(s"$src/orders.parquet").count()
    val gotOrd = spark.read.parquet(s"$dest/orders.parquet")
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotOrd(16L) >= f * baseTotalOrd / 8, "hot custkey 16 must dominate")
    val c0 = baseKeepOrd.keys.filter(k => k != 16 && ((k % 16) + 16) % 16 == 0)
      .minOption.orElse(baseKeepOrd.keys.filter(k =>
        { val r = ((k % 16) + 16) % 16; r >= 1 && r <= 6 }).minOption)
      .getOrElse(fail("no mergeable custkey in base orders"))
    assert(gotOrd(c0) == f * baseKeepOrd(c0), s"merged custkey $c0 fan-in")
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
