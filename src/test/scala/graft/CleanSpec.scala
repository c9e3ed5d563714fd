package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-curation pack: PII redaction, normalization,
  * sampling determinism, contamination recall, funnel monotonicity. */
class CleanSpec extends SparkSpec {

  test("q70: every synthesized contact block is redacted — no raw PII survives") {
    val out = ops.Clean.q70PiiScrub.fn(spark, sf)
    // counts reflect the synthesized block: doc_id%3 emails, 1 phone, 1 ip
    val bad = out.filter(
      col("n_emails") =!= pmod(col("doc_id"), lit(3)) ||
        col("n_phones") =!= 1 || col("n_ips") =!= 1)
    assert(bad.isEmpty)
  }

  test("q71: normalization is idempotent (normalizing a normalized doc is a no-op)") {
    val docs = Tables.documents(spark, sf).limit(50)
    val once = ops.Clean.q71Normalize.fn(spark, sf).select("doc_id", "norm_fp")
    // re-normalize by writing the normalized text back through the same expr
    val norm = trim(regexp_replace(regexp_replace(
      translate(lower(col("text")), "àáâãäåèéêëìíîïòóôõöùúûüçñýÿ", "aaaaaaeeeeiiiiooooouuuucnyy"),
      "[^a-z0-9 ]", " "), " +", " "))
    val twice = docs.withColumn("text", norm).withColumn("text", norm)
      .select(col("doc_id"), md5(col("text")).as("norm_fp2"))
    val joined = once.join(twice, "doc_id")
    assert(joined.filter(col("norm_fp") =!= col("norm_fp2")).isEmpty)
  }

  test("q73: hash sampling is deterministic and partitioning-independent") {
    val a = ops.Clean.q73StratifiedSample.fn(spark, sf).collect().toSeq
    val b = ops.Clean.q73StratifiedSample.fn(spark, sf).collect().toSeq
    assert(a == b)
    // same sample regardless of how the input was partitioned
    val repart = Tables.documents(spark, sf).repartition(7)
    repart.createOrReplaceTempView("ignored")
    val c = ops.Clean.q73StratifiedSample.fn(spark, sf).collect().toSeq
    assert(a == c)
  }

  test("q72: contamination check recalls every planted exact copy at ppm=1000000") {
    val out = ops.Clean.q72Contamination.fn(spark, sf)
    // each benchmark doc (id+2000000) is an exact copy of its source:
    // the (source, copy) pair must appear with full overlap
    val planted = out.filter(col("bench_id") === col("corp_id") + 2000000L)
    val nBench = ops.Dedup.corpus(spark, sf)
      .filter(col("doc_id") >= 2000000L).count()
    assert(planted.count() == nBench)
    assert(planted.filter(col("contam_ppm") =!= 1000000L).isEmpty)
  }

  test("q76: packing respects capacity and never splits or reorders a stream") {
    val out = ops.Clean.q76DocPacking.fn(spark, sf).collect()
    val cap = ops.Clean.PackCap
    // a bin only exceeds capacity when a single doc alone is overlong
    val grouped = out.groupBy(r => (r.getString(0), r.getLong(3)))
    grouped.foreach { case ((lang, bin), rows) =>
      val total = rows.map(_.getLong(2)).sum
      assert(total <= cap || rows.length == 1,
        s"bin ($lang,$bin) holds $total tokens across ${rows.length} docs")
      assert(rows.map(_.getLong(4)).max == total, "bin_fill must end at the bin total")
    }
    // bin ids are non-decreasing in doc_id order within each lang
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("q77: the rarest language keeps rate 1000000 and n_kept <= n_docs") {
    val out = ops.Clean.q77MixtureRebalance.fn(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getLong(2) == 1000000L), "rarest lang must keep everything")
    out.foreach { r => assert(r.getLong(3) <= r.getLong(1)) }
  }

  test("q86: temperature sampling keeps everything for the rarest language and sits between uniform and proportional") {
    val out = ops.Clean.q86TemperatureSample.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    assert(out.values.map(_._2).max == 1000000L, "rarest lang must keep everything")
    out.values.foreach { case (nDocs, ratePpm, nKept) =>
      assert(ratePpm > 0L && ratePpm <= 1000000L)
      assert(nKept <= nDocs)
    }
    // α=0.5 damps less aggressively than α=0 equalization: the most
    // common language's temperature rate must be at least its q77 rate
    val q77 = ops.Clean.q77MixtureRebalance.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val biggest = out.maxBy(_._2._1)._1
    assert(out(biggest)._2 >= q77(biggest),
      s"temperature rate for $biggest below the equalizing rate")
  }

  test("q83: bloom prefilter is exact (equals the no-bloom spelling) and finds every leaked copy") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val out = ops.Clean.q83BloomDecontam.fn(spark, sf)
    // exact spelling without the bloom: plain semi-join + count
    val hs = ops.Dedup.corpus(spark, sf)
      .select(col("doc_id"), array_distinct(tokenShingleHashes(col("toks"))).as("hs"))
      .localCheckpoint()
    val ce = hs.filter(col("doc_id") < 1000000L)
      .select(col("doc_id").as("corp_id"), explode(col("hs")).as("h"))
    val bh = hs.filter(col("doc_id") >= 2000000L)
      .select(explode(col("hs")).as("h")).distinct()
    val exact = ce.join(bh, Seq("h"), "left_semi")
      .groupBy("corp_id").agg(count(lit(1)).as("n_hits"))
    assert(out.exceptAll(exact).isEmpty && exact.exceptAll(out).isEmpty)
    // every doc with a synthesized benchmark copy (doc_id%7=0) must be
    // flagged, and with ALL of its shingles shared
    val flagged = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaked = hs.filter(col("doc_id") < 1000000L && col("doc_id") % 7 === 0)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(leaked.nonEmpty)
    leaked.foreach { case (id, n) =>
      assert(flagged.getOrElse(id, 0L) == n, s"doc $id: expected all $n shingles shared")
    }
  }

  test("q95: the two-level distributed running sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val out = ops.Clean.q95TokenBudget.fn(spark, sf)
    // naive spelling: one global running-sum window (the single-partition
    // sort q95 avoids) — the technique must be semantically invisible
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        when(size(toks) === 0, 0L)
          .otherwise(floor(size(array_distinct(toks)).cast("long") * 1000000L / size(toks)))
          .cast("long").as("score"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = scored.withColumn("cum_tok", sum("n_tok").over(w))
      .filter(col("cum_tok") <= 15000L)
      .select("doc_id", "score", "n_tok", "cum_tok")
    assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty)
    // boundary: the next doc in order would have blown the budget
    val total = out.agg(sum("n_tok")).head().getLong(0)
    assert(total <= 15000L)
  }

  test("q74: funnel stage counts are monotonically non-increasing") {
    val stages = ops.Clean.q74CurationFunnel.fn(spark, sf)
      .orderBy("stage").select("n_docs").collect().map(_.getLong(0)).toSeq
    assert(stages.length == 4)
    assert(stages.sliding(2).forall { case Seq(x, y) => y <= x })
    assert(stages.head > 0)
  }

  test("q114: allocations conserve the budget, respect caps, and saturate small languages first") {
    val out = ops.Clean.q114Unimax.fn(spark, sf).collect()
    val nTok = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val alloc = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    val cap = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    val budget = nTok.values.sum * 6 / 10
    // caps are 2 epochs; budget is 60% of one epoch of everything, so
    // total capacity exceeds the budget and the fold must spend exactly it
    assert(alloc.values.sum == budget,
      s"allocated ${alloc.values.sum} != budget $budget")
    assert(out.forall(r => r.getLong(3) <= r.getLong(2)), "alloc over cap")
    assert(out.forall(r => r.getLong(4) <= 2000L), "over 2 epochs")
    // water-filling: visited ascending by capacity, allocations never
    // decrease (each step's share is >= the previous step's allocation —
    // the property the greedy actually guarantees; "every unsaturated
    // alloc >= every saturated cap" is NOT implied when the fair share
    // undercuts a cap early, e.g. caps [4,4] budget 7 -> [3,4])
    val visitOrder = out.sortBy(r => (r.getLong(2), r.getString(0))).map(_.getLong(3))
    assert(visitOrder.sliding(2).forall { case Array(x, y) => y >= x; case _ => true },
      s"allocations decreased in visit order: ${visitOrder.toSeq}")
    assert(cap.forall { case (l, c) => c == 2 * nTok(l) })
  }

  test("q133: planted header stripped, below-threshold second header survives, strip is surgical") {
    import graft.functions.TextFunctions.tokens
    val out = ops.Clean.q133BoilerplateStrip.fn(spark, sf)
    // threshold semantics in BOTH directions: the ~33%-frequency header is
    // boilerplate (exactly one chunk flagged on every %3 doc), the ~11%
    // second header on %9 docs is NOT (it stays under the 20% bar)
    assert(out.filter(col("doc_id") % 3 === 0 && col("n_boiler") =!= 1).isEmpty)
    assert(out.filter(col("doc_id") % 3 =!= 0 && col("n_boiler") =!= 0).isEmpty)
    // surgical strip: the planted header is exactly one 16-token chunk, so
    // a %3-not-%9 doc's cleaned text must equal its ORIGINAL tokenization
    // (chunks shift down by one; chunk-join == token-join)
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(array_join(tokens(col("text")), " ")).as("raw_fp"))
    val planted = out.filter(col("doc_id") % 3 === 0 && col("doc_id") % 9 =!= 0)
      .join(raw, "doc_id")
    assert(planted.filter(col("clean_fp") =!= col("raw_fp")).isEmpty)
    assert(planted.count() > 0)
  }

  test("q243: PRF expansion widens the match set beyond the seed query") {
    val rows = ops.Clean.q243PrfExpansion.fn(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 10)
    // deterministic ranking contract
    val scores = rows.map(_.getAs[Long]("score_milli")).toSeq
    assert(scores == scores.sorted.reverse)
    // expansion fired: with 8 query terms, some doc matches more than the
    // 3 seed terms could ever give
    assert(rows.map(_.getAs[Long]("n_terms")).max > 3,
      "no doc matched an expansion term — PRF was a no-op")
    assert(rows.map(_.getAs[Long]("n_terms")).max <= 8)
    // feedback docs score high under the expanded query too: at least one
    // of the 3 survives in the top-10
    assert(rows.exists(_.getAs[Boolean]("in_feedback")))
  }

  test("q231: novelty equals the exact local gram-set replay; ref slice absent") {
    import graft.functions.TextFunctions._
    val rows = ops.Clean.q231NgramNovelty.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("novel_grams"), r.getAs[Long]("novelty_ppm"))).toMap
    // reference sources (suffix % 4 == 0) must not be scored
    assert(rows.keys.forall(s => s.drop(3).toInt % 4 != 0))
    assert(rows.nonEmpty)
    // local replay: per-doc distinct gram hashes via the same fused expr,
    // then set arithmetic in plain Scala
    val grams = Tables.documents(spark, sf)
      .select(col("source"),
        array_distinct(tokenShingleHashes(tokens(col("text")))).as("hs"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val ref = grams.filter(_._1.drop(3).toInt % 4 == 0).flatMap(_._2).toSet
    val bySrc = grams.filter(_._1.drop(3).toInt % 4 != 0).groupBy(_._1)
    bySrc.foreach { case (src, docs) =>
      val all = docs.flatMap(_._2) // per-doc distinct, pooled WITH multiplicity
      val novel = all.count(h => !ref.contains(h)).toLong
      val (nd, ng, nv, ppm) = rows(src)
      assert(nd == docs.length.toLong && ng == all.length.toLong && nv == novel)
      assert(ppm == (if (ng == 0) 0L else math.floorDiv(novel * 1000000L, ng)))
    }
  }

  test("q279: McNemar discordant cells and continuity-corrected chi-square replay per language") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("lang", "text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getString(0), toks.length >= 30, r.getLong(2) >= 180, toks.distinct.length >= 20)
      }
    val rows = ops.Clean.q279Mcnemar.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val g = docs.filter(_._1 == lang)
      val bC = g.count(x => x._3 == x._2 && x._4 != x._2).toLong
      val cC = g.count(x => x._3 != x._2 && x._4 == x._2).toLong
      assert(r.getLong(1) == g.length.toLong, lang)
      assert(r.getLong(2) == g.count(x => x._3 == x._2).toLong, lang)
      assert(r.getLong(3) == g.count(x => x._4 == x._2).toLong, lang)
      assert((r.getLong(4), r.getLong(5)) == ((bC, cC)), lang)
      if (bC + cC > 0) {
        val d = math.max(math.abs(bC - cC) - 1, 0L)
        val chi2 = d * d * 1000L / (bC + cC)
        assert(r.getLong(6) == chi2, lang)
        assert(r.getBoolean(7) == (chi2 > 3841L), lang)
      } else {
        assert(r.isNullAt(6) && r.isNullAt(7), lang)
      }
    }
  }

  test("q292: HT expansion replays the q73 sample and brackets the truth") {
    import org.apache.spark.sql.functions._
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    val rates = Map("en" -> 120000L, "de" -> 250000L, "fr" -> 250000L,
      "es" -> 250000L, "zh" -> 400000L)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = ops.Clean.q292HorvitzThompson.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val rate = rates(lang)
      assert(r.getLong(1) == rate, lang)
      val g = docs.filter(_._2 == lang)
      val smp = g.filter(x => h32(s"smp_${x._1}") % 1000000L < rate)
      assert(r.getLong(2) == smp.length.toLong, lang)
      assert(r.getLong(3) == smp.length.toLong * 1000000L / rate, lang)
      assert(r.getLong(4) == g.length.toLong, lang)
      val htChars = smp.map(_._3).sum * 1000000L / rate
      val trueChars = g.map(_._3).sum
      assert(r.getLong(5) == htChars && r.getLong(6) == trueChars, lang)
      val err = if (htChars >= trueChars) (htChars - trueChars) * 1000000L / trueChars
        else -((trueChars - htChars) * 1000000L / trueChars)
      assert(r.getLong(7) == err, lang)
    }
  }

  test("q304: Cochran's Q replays from the three matched classifier bit-vectors") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val gold = toks.length >= 30
        val a = r.getLong(1) >= 180
        val b = toks.distinct.length >= 20
        val c = toks.nonEmpty && toks.map(_.length.toLong).sum * 10 >= 45L * toks.length
        (if (a == gold) 1L else 0L, if (b == gold) 1L else 0L, if (c == gold) 1L else 0L)
      }
    val rows = ops.Clean.q304CochranQ.fn(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (c1, c2, c3) = (docs.map(_._1).sum, docs.map(_._2).sum, docs.map(_._3).sum)
    val tt = docs.map(x => x._1 + x._2 + x._3).sum
    val r2 = docs.map(x => { val s = x._1 + x._2 + x._3; s * s }).sum
    assert(r.getLong(0) == docs.length.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((c1, c2, c3)))
    val den = 3 * (3 * tt - r2)
    assert(den > 0, "fixture must not be fully concordant")
    val num = BigInt(2) * Seq(c1, c2, c3).map(c => { val d = 3 * c - tt; BigInt(d) * d }).sum
    val q = (num * 1000 / den).toLong
    assert(r.getLong(4) == q)
    assert(r.getBoolean(5) == (q > 5991))
  }
}
