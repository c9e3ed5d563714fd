package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Specs for the custom Catalyst layer: extension-registered native
  * expression (eval + codegen paths agree with the built-in equivalent)
  * and the MinHash Aggregator (partial-agg signature == expression-side
  * signature). */
class PlanSpec extends SparkSpec {

  test("graft_hamming resolves via extensions and matches bit_count(xor)") {
    val df = spark.range(1000).select(
      hex32(col("id").cast("string")).as("a"),
      hex32(concat(lit("x"), col("id").cast("string"))).as("b"))
    val got = df.selectExpr("graft_hamming(a, b) AS h", "bit_count(a ^ b) AS want")
    assert(got.filter(col("h") =!= col("want").cast("long")).count() == 0)
    // null-safety
    val n = spark.sql("SELECT graft_hamming(CAST(NULL AS LONG), 5L) AS h").head()
    assert(n.isNullAt(0))
    // stays inside whole-stage codegen: the Project carrying the
    // expression bears the `*(n)` codegen-stage marker
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_hamming") && l.trim.startsWith("*(")))
  }

  test("graft_simhash matches the HOF simhash and stays in codegen") {
    val hs = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        shingleHashes(array_distinct(shingles(tokens(col("text")), 5))).as("hs"))
    val both = hs.select(col("doc_id"),
      expr("graft_simhash(hs)").as("native"),
      simhash32FromHashes(col("hs")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // empty array: all votes -1 -> code 0; null array -> null
    val edge = spark.sql(
      "SELECT graft_simhash(CAST(array() AS ARRAY<BIGINT>)) AS e, " +
        "graft_simhash(CAST(NULL AS ARRAY<BIGINT>)) AS n")
    assert(edge.head.getLong(0) == 0L && edge.head.isNullAt(1))
    // codegen marker on a projection free of HOF lambdas (lambdas are
    // codegen-fallback and would evict the whole project from WSCG)
    val nat = spark.range(100)
      .select(array(col("id"), col("id") * 7, col("id") + 13).as("hs"))
      .selectExpr("graft_simhash(hs) AS native")
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_simhash") && l.trim.startsWith("*(")), s"not codegen'd:\n$plan")
  }

  test("graft_hex32 equals the conv(substring(md5)) spelling on real text") {
    // the spelled side stays STRING-typed so Hex32Rewrite (which only
    // matches the long-cast form) can't rewrite the reference column
    // out from under the comparison
    val both = Tables.documents(spark, sf)
      .select(hex32(col("text")).cast("string").as("native"),
        conv(substring(md5(col("text").cast("string")), 1, 8), 16, 10).as("spelled"),
        hex32(col("doc_id")).cast("string").as("nonstring"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .as("nonstring_spelled"))
    assert(both.filter(col("native") =!= col("spelled")
      || col("nonstring") =!= col("nonstring_spelled")).count() == 0)
    // null in -> null out; empty string hashes like md5('')
    val edge = spark.sql(
      "SELECT graft_hex32(CAST(NULL AS STRING)) AS n, graft_hex32('') AS e").head
    assert(edge.isNullAt(0) && edge.getLong(1) == java.lang.Long.parseLong("d41d8cd9", 16))
  }

  test("Hex32Rewrite rule: the portable long-cast spelling optimizes to graft_hex32") {
    val df = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST(id AS STRING)),1,8),16,10) AS BIGINT) AS h FROM range(10)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_hex32"), s"rule did not fire:\n$optimized")
    // and the rewritten plan still computes the md5 fold
    assert(df.collect().map(_.getLong(0)).min >= 0)
  }

  test("graft_shingle_hashes is bit-identical to shingleHashes(shingles(toks,5))") {
    val both = ops.Dedup.corpus(spark, sf)
      .select(tokenShingleHashes(col("toks")).as("native"),
        shingleHashes(shingles(col("toks"), 5)).as("cols"))
    assert(both.filter(col("native") =!= col("cols")).count() == 0)
    val edge = spark.sql(
      "SELECT graft_shingle_hashes(CAST(array() AS ARRAY<STRING>)) AS e, " +
        "graft_shingle_hashes(CAST(NULL AS ARRAY<STRING>)) AS n").head
    assert(edge.getSeq[Long](0).length == 1 && edge.isNullAt(1))
  }

  test("graft_minhash is bit-identical to the column-expression signature") {
    // the full dedup corpus, including synthesized near/exact copies and
    // the short-doc edge (< 5 tokens -> one truncated shingle)
    val both = ops.Dedup.corpus(spark, sf)
      .select(col("doc_id"), col("toks"),
        expr("graft_minhash(toks)").as("native"),
        minhashSigFromHashes(shingleHashes(shingles(col("toks"), 5)), 16).as("cols"))
    assert(both.filter(col("native") =!= col("cols")).count() == 0)
    // edge cases: empty array = signature of the single "" shingle
    // (matches the HOF's greatest(n-4,1) window floor); null -> null
    val emptySig = spark.sql("SELECT graft_minhash(CAST(array() AS ARRAY<STRING>)) AS s").head.getSeq[Long](0)
    val hofEmpty = spark.range(1)
      .select(minhashSigFromHashes(shingleHashes(shingles(
        expr("CAST(array() AS ARRAY<STRING>)"), 5)), 16).as("s")).head.getSeq[Long](0)
    assert(emptySig == hofEmpty)
    assert(spark.sql("SELECT graft_minhash(CAST(NULL AS ARRAY<STRING>)) AS s").head.isNullAt(0))
    // null tokens are joined over like concat_ws
    val withNull = spark.sql(
      "SELECT graft_minhash(array('a', CAST(NULL AS STRING), 'b')) AS n, " +
        "graft_minhash(array('a', 'b')) AS joined").head
    assert(withNull.getSeq[Long](0) != null)
    // codegen marker: the fused pass stays inside whole-stage codegen
    val nat = spark.range(100)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("toks"))
      .selectExpr("graft_minhash(toks) AS sig")
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_minhash") && l.trim.startsWith("*(")), s"not codegen'd:\n$plan")
  }

  test("graft_minhash_hashes over (distinct) shingle hashes equals graft_minhash") {
    // round-12 fused fingerprint pass: the dedup pack derives the
    // signature from the already-computed shingle-hash set instead of
    // re-running md5 per shingle; min over a set ignores multiplicity
    // and order, so both the raw and the distinct hash array must give
    // the signature graft_minhash computes from tokens
    val both = ops.Dedup.corpus(spark, sf)
      .select(col("doc_id"),
        expr("graft_minhash(toks)").as("direct"),
        expr("graft_minhash_hashes(graft_shingle_hashes(toks))").as("raw"),
        expr("graft_minhash_hashes(array_distinct(graft_shingle_hashes(toks)))")
          .as("dedup"))
    assert(both.filter(col("direct") =!= col("raw")).count() == 0)
    assert(both.filter(col("direct") =!= col("dedup")).count() == 0)
    // null propagates; a null element is skipped, not NPE'd
    assert(spark.sql("SELECT graft_minhash_hashes(CAST(NULL AS ARRAY<BIGINT>)) AS s")
      .head.isNullAt(0))
    val skipNull = spark.sql(
      "SELECT graft_minhash_hashes(array(7L, CAST(NULL AS BIGINT))) AS a, " +
        "graft_minhash_hashes(array(7L)) AS b").head
    assert(skipNull.getSeq[Long](0) == skipNull.getSeq[Long](1))
    // codegen marker: stays inside whole-stage codegen
    val nat = spark.range(100)
      .selectExpr("graft_minhash_hashes(array(id)) AS sig")
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_minhash_hashes") && l.trim.startsWith("*(")),
      s"not codegen'd:\n$plan")
  }

  test("AsofJoin plans as the merge exec over two sorted exchanges and equals the window spelling") {
    val q81 = ops.Events.q81AsofOperator.fn(spark, sf)
    val plan = q81.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(user_id") &&
      plan.contains("Exchange hashpartitioning(v_user"),
      s"both sides must cluster on their key:\n$plan")
    // exact same rows as the union+window spelling (q40)
    val q40 = ops.Events.q40AsofJoin.fn(spark, sf)
    assert(q40.exceptAll(q81).isEmpty && q81.exceptAll(q40).isEmpty)
    // unmatched left rows survive with null right side (LEFT semantics):
    // every purchase appears exactly once
    import org.apache.spark.sql.functions.col
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(q81.count() == nPurchases)
  }

  test("AsofJoin emits UnsafeRows (bare collect + sort above) and null keys never match") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1), ("a", 20L, 2), ("b", 5L, 3), (null: String, 10L, 4))
      .toDF("k", "t", "lid")
    val r = Seq(("a", 5L, 100), ("a", 15L, 200), ("c", 1L, 300), (null: String, 1L, 400))
      .toDF("rk", "rt", "rid")
    val j = graft.plans.AsofJoin(l, r, "k", "rk", "t", "rt")
    // bare collect: no ProjectExec above the exec → getByteArrayRdd
    // consumes the operator's own output rows (must be UnsafeRow)
    val byId = j.collect().map(x =>
      x.getAs[Int]("lid") -> Option(x.getAs[Any]("rid"))).toMap
    assert(byId == Map(1 -> Some(100), 2 -> Some(200), 3 -> None,
      4 -> None)) // lid 4: null key must NOT match the null-key right row
    // a global sort directly above (UnsafeExternalRowSorter casts to
    // UnsafeRow and BUFFERS rows — catches both convention violations)
    val sorted = j.orderBy(desc("t"), asc("lid")).collect()
    assert(sorted.map(_.getAs[Int]("lid")).toSeq == Seq(2, 1, 4, 3))
  }

  test("AsofJoin tolerance nulls a stale best match but keeps fresh ones") {
    import spark.implicits._
    val l = Seq(("a", 100L, 1), ("a", 200L, 2), ("b", 100L, 3)).toDF("k", "t", "lid")
    val r = Seq(("a", 95L, 100), ("a", 120L, 200), ("b", 10L, 300)).toDF("rk", "rt", "rid")
    val j = graft.plans.AsofJoin(l, r, "k", "rk", "t", "rt", toleranceUs = Some(50L))
    val byId = j.collect().map(x =>
      x.getAs[Int]("lid") -> Option(x.getAs[Any]("rid"))).toMap
    assert(byId == Map(
      1 -> Some(100), // best match rt=95, age 5 <= 50: fresh
      2 -> None,      // best match rt=120, age 80 > 50: stale, no fallback
      3 -> None))     // best match rt=10, age 90 > 50: stale -> null side
  }

  test("AsofJoin forward direction: smallest right time at-or-after, tolerance bounds the gap") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1), ("a", 20L, 2), ("a", 30L, 3), ("b", 5L, 4)).toDF("k", "t", "lid")
    val r = Seq(("a", 12L, 100), ("a", 20L, 200), ("a", 25L, 300), ("c", 1L, 400)).toDF("rk", "rt", "rid")
    val byId = graft.plans.AsofJoin(l, r, "k", "rk", "t", "rt", direction = "forward")
      .collect().map(x => x.getAs[Int]("lid") -> Option(x.getAs[Any]("rid"))).toMap
    assert(byId == Map(
      1 -> Some(100), // next at-or-after 10 is 12
      2 -> Some(200), // exact tie rt == t matches forward too
      3 -> None,      // nothing at-or-after 30
      4 -> None))     // no key b on the right
    val tb = graft.plans.AsofJoin(l, r, "k", "rk", "t", "rt",
        toleranceUs = Some(1L), direction = "forward")
      .collect().map(x => x.getAs[Int]("lid") -> Option(x.getAs[Any]("rid"))).toMap
    assert(tb == Map(1 -> None, 2 -> Some(200), 3 -> None, 4 -> None),
      "forward gap 2 must exceed tolerance 1; the exact tie stays")
  }

  test("AsofJoin nearest direction: closer side wins, ties go backward") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1), ("a", 14L, 2), ("a", 16L, 3), ("a", 100L, 4)).toDF("k", "t", "lid")
    val r = Seq(("a", 9L, 100), ("a", 19L, 200)).toDF("rk", "rt", "rid")
    val byId = graft.plans.AsofJoin(l, r, "k", "rk", "t", "rt", direction = "nearest")
      .collect().map(x => x.getAs[Int]("lid") -> Option(x.getAs[Any]("rid"))).toMap
    assert(byId == Map(
      1 -> Some(100), // back 1 vs fwd 9 -> backward
      2 -> Some(100), // back 5 == fwd 5 -> tie goes backward
      3 -> Some(200), // back 7 vs fwd 3 -> forward
      4 -> Some(200))) // only a backward candidate remains
  }

  test("q60 bucketed range join plans as a hash join, not a nested loop") {
    val plan = ops.Scale.q60RangeJoin.fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval predicate must be a residual filter, not the join condition")
  }

  test("TopKPerGroup plans as heap exec after one exchange, no window sort") {
    val in = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
    val topk = graft.plans.TopKPerGroup(in, Seq("o_custkey"),
      Seq("price" -> false, "o_orderkey" -> true), k = 3)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    // two-phase: a partial heap pass BELOW the exchange caps shuffle at
    // k rows per (group, partition); the final pass sits above it
    assert(plan.contains("TopKPerGroupPartial"), s"partial pass missing:\n$plan")
    assert(plan.indexOf("TopKPerGroupPartial") >
      plan.indexOf("Exchange hashpartitioning(o_custkey"),
      s"partial must be below the exchange:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_custkey"),
      s"missing clustered exchange:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"window/sort crept in:\n$plan")
    // equivalence with the window spelling
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("price").desc, col("o_orderkey"))
    val want = in.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
    assert(topk.exceptAll(want).isEmpty && want.exceptAll(topk).isEmpty)
  }

  test("MinHashAgg signature equals the expression-side minhashSig") {
    import graft.functions.MinHashAgg
    val docs = Tables.documents(spark, sf).limit(50)
    val exprSide = docs
      .select(col("doc_id"), minhashSig(shingles(tokens(col("text")), 5), 16).as("sig"))
    val mh = udaf(new MinHashAgg(16))
    val aggSide = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 5)).as("s"))
      .select(col("doc_id"), hex32(col("s")).as("h"))
      .groupBy("doc_id").agg(mh(col("h")).as("sig"))
    assert(exprSide.exceptAll(aggSide).isEmpty && aggSide.exceptAll(exprSide).isEmpty)
  }

  test("graft_dot is bit-identical to the HOF fold and stays in codegen") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val paired = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val hof = aggregate(zip_with(col("x"), col("y"), (p, q) => p * q),
      lit(0.0), (acc, e) => acc + e)
    val both = paired.select(
      expr("graft_dot(x, y)").as("native"), hof.as("portable"))
    // exact equality: same left-to-right addition order, same doubles
    assert(both.filter(col("native") =!= col("portable")).isEmpty)
    assert(both.count() > 0)
    // null safety
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
    assert(n.head().isNullAt(0))
    // the expression compiles into a whole-stage codegen span
    val plan = vecs.select(expr("graft_dot(v, v)")).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")), s"not codegen'd:\n$plan")
  }

  test("q35 sorts the narrow json rows below the wide flatten projection") {
    // The global sort must range-exchange only (o_orderkey, release_json):
    // if the 124-column flatten ever slips below the Sort again, the range
    // pass shuffles the whole wide output twice (the r03 regression).
    val df = ops.Ocds.q35OcdsFlatten.fn(spark, sf)
    assert(df.schema.length > 100, "flatten width lost")
    // check the optimized LOGICAL plan: the physical one hides inside
    // AdaptiveSparkPlanExec (no children for collect) until execution
    val plan = df.queryExecution.optimizedPlan
    val sorts = plan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s }
    assert(sorts.nonEmpty, s"no Sort in plan:\n$plan")
    assert(sorts.forall(_.child.output.length <= 2),
      s"sort carries wide rows: ${sorts.map(_.child.output.map(_.name))}")
  }

  test("graft_multi_count equals the replace() spelling and stays in codegen") {
    import spark.implicits._
    val pats = Seq("aa", "aba", "fast merge", "scan scan")
    // self-overlap torture + real corpus text: replace() semantics are
    // the contract (greedy left-to-right non-overlapping, per pattern)
    val torture = Seq("aaaa", "ababa", "aa scan scan scan aa",
      "fast merge fast merge", "", "no hits here").toDF("text")
    val corpus = Tables.documents(spark, sf).select("text").limit(300)
    for (df <- Seq(torture, corpus)) {
      val both = df.select(col("text"),
        multiCount(col("text"), pats).as("ac"),
        array(pats.map(p =>
          ((length(col("text")) - length(regexp_replace(col("text"),
            java.util.regex.Pattern.quote(p), ""))) / p.length).cast("long")): _*)
          .as("naive"))
      val diff = both.filter(col("ac") =!= col("naive")).take(1)
      assert(diff.isEmpty, diff.mkString)
    }
    // null text -> null; multi-byte text counts literal byte sequences
    val edge = Seq((null: String, 1), ("héllo héllo", 2)).toDF("text", "i")
      .select(multiCount(col("text"), Seq("héllo", "llo")).as("c"))
      .collect()
    assert(edge.exists(_.isNullAt(0)))
    assert(edge.exists(r => !r.isNullAt(0) && r.getSeq[Long](0) == Seq(2L, 2L)))
    // whole-stage codegen keeps the scan fused around the automaton call
    val plan = spark.range(100)
      .select(concat(lit("doc "), col("id").cast("string")).as("text"))
      .select(multiCount(col("text"), pats).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_multi_count") && l.trim.startsWith("*(")),
      s"not codegen'd:\n$plan")
  }

  test("BloomProbe: zero false negatives, null-safe, in codegen, and no UDF is left in the tree") {
    import org.apache.spark.sql.graft.PlanShim
    val keys = spark.range(1000).select((col("id") * 7).as("k"))
    val bloom = keys.stat.bloomFilter("k", 1000L, 0.01)
    def probe(c: org.apache.spark.sql.Column) =
      PlanShim.column(graft.plans.BloomProbe(PlanShim.expression(c), bloom))
    // bloom guarantee: every true member passes (false negatives impossible)
    val members = keys.filter(!probe(col("k")))
    assert(members.isEmpty, "bloom dropped a true member")
    // null in -> null out (nullSafeEval / nullSafeCodeGen)
    val n = spark.range(1)
      .select(probe(lit(null).cast("long")).as("p")).head()
    assert(n.isNullAt(0))
    // the probe compiles into a whole-stage codegen span
    val plan = keys.filter(probe(col("k"))).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_bloom_probe") && l.contains("*(")),
      s"not codegen'd:\n$plan")
    // round-8 VERDICT item 5 pin: the two bloom call sites were the last
    // UDFs in the tree — their plans must show the native probe and no
    // ScalaUDF/BatchEval node, now or ever again
    for (q <- SparkEntry.registry.filter(q =>
        Set("q83_bloom_decontam", "q246_bloom_prune_join")(q.name))) {
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("graft_bloom_probe"), s"${q.name}: native probe missing")
      assert(!p.contains("UDF"), s"${q.name}: a UDF crept back into the plan")
    }
  }
}
