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

  test("bpeMerge: greedy non-overlap ('x x x' merges once) and whole-token matching ('xa b' untouched by pair a,b)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      Seq("x", "x", "x"),            // greedy: first two merge, third stays
      Seq("x", "x", "x", "x"),       // two merges
      Seq("xa", "b", "a", "b"),      // "xa b" is NOT pair (a,b); "a b" is
      Seq("a"),                      // no pair: unchanged
      Seq("a", "b", "a", "b", "a")   // two merges, trailing a survives
    ).map(t => org.apache.spark.sql.Row(t))
    val df = spark.createDataFrame(rows.asJava, schema)
    val merged = df.select(
      bpeMerge(col("toks"), lit("x"), lit("x")).as("mx"),
      bpeMerge(col("toks"), lit("a"), lit("b")).as("mab"))
      .collect().map(r =>
        (r.getSeq[String](0).toList, r.getSeq[String](1).toList))
    assert(merged(0)._1 == List("x x", "x"))
    assert(merged(1)._1 == List("x x", "x x"))
    assert(merged(2)._2 == List("xa", "b", "a b"))
    assert(merged(3)._2 == List("a"))
    assert(merged(4)._2 == List("a b", "a b", "a"))
  }

  test("cdcChunks: content-defined boundaries resynchronize after a one-token deletion") {
    // for every doc, chunks(toks drop 1) must equal chunks(toks) with
    // only the FIRST chunk possibly altered/absent — i.e. all chunks
    // after the shifted doc's first boundary are bit-identical
    val both = Tables.documents(spark, sf)
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 2)
      .select(cdcChunks(col("toks")).as("base"),
        cdcChunks(slice(col("toks"), 2, 100000)).as("shifted"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val base = r.getSeq[String](0)
      val shifted = r.getSeq[String](1)
      // token joins are content-only, so chunk COUNT can differ by at
      // most one (the dropped token was alone in its chunk or not)
      assert(base.length - shifted.length <= 1 && base.length >= shifted.length,
        s"chunk counts diverged: ${base.length} vs ${shifted.length}")
      assert(shifted.drop(1) == base.takeRight(math.max(shifted.length - 1, 0)),
        s"chunks did not resynchronize:\n  base=$base\n  shifted=$shifted")
    }
  }

  test("q113: each round's token count drops by an independent greedy recount of the winning pair") {
    val out = ops.Text.q113BpeRounds.fn(spark, sf).collect()
    assert(out.length == 2)
    val before = Tables.documents(spark, sf)
      .select(sum(size(tokens(col("text"))))).head().getLong(0)
    // greedy non-overlapping occurrences of pair (a,b) in one doc =
    // length drop of the merge; recount independently via bpeMerge
    val r1 = out(0)
    val Array(a1, b1) = r1.getString(1).split(" ", 2)
    val afterRecount = Tables.documents(spark, sf)
      .select(sum(size(bpeMerge(tokens(col("text")), lit(a1), lit(b1)))))
      .head().getLong(0)
    assert(r1.getLong(3) == afterRecount,
      s"round-1 n_tokens_after ${r1.getLong(3)} != independent merge recount $afterRecount")
    assert(r1.getLong(3) < before && out(1).getLong(3) <= r1.getLong(3))
  }

  test("q123: encode round-trips (splitting merged tokens restores the raw stream) and counts close the loop") {
    val enc = ops.Text.q123BpeEncode.fn(spark, sf).collect()
    assert(enc.nonEmpty)
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    var totalAfter = 0L
    enc.foreach { r =>
      val toks = r.getString(3).split("\\|", -1).toSeq
      assert(toks.length == r.getLong(1), s"doc ${r.getLong(0)}: n_tok mismatch")
      assert(toks.count(_.contains(" ")) == r.getLong(2))
      // decode = split each merged unit back on spaces: must equal raw
      assert(toks.flatMap(_.split(" ", -1)) == raw(r.getLong(0)),
        s"doc ${r.getLong(0)}: encode is not invertible")
      totalAfter += r.getLong(1)
    }
    // total token count after encode == q113 round-2 n_tokens_after
    val train = ops.Text.q113BpeRounds.fn(spark, sf).collect()
    assert(totalAfter == train(1).getLong(3),
      s"encode total $totalAfter != training round-2 count ${train(1).getLong(3)}")
  }

  test("q236: KN table equals the exact rational replay; mass is proper") {
    val rows = ops.Text.q236KneserNey.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("c"), r.getAs[Long]("p_kn_ppm"), r.getAs[Long]("backoff_ppm")))
      .toMap
    assert(rows.nonEmpty)
    // local bigram counts with the same tokenization
    val bgs = Tables.documents(spark, sf)
      .select(tokens(col("text")).as("ts")).collect()
      .flatMap(_.getSeq[String](0).sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
    val c = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw1 = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val fan = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cont = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n = c.size.toLong
    assert(rows.keySet == c.keySet)
    rows.foreach { case ((w1, w2), (cc, p, bo)) =>
      assert(cc == c((w1, w2)))
      val den = 4L * cw1(w1) * n
      assert(p == Math.floorDiv((n * (4 * cc - 3) + 3 * fan(w1) * cont(w2)) * 1000000L, den))
      assert(bo == Math.floorDiv(3 * fan(w1) * cont(w2) * 1000000L, den))
      assert(bo > 0 && bo < p, "interpolation: backoff present, never dominant at c>=1")
    }
    // observed mass per context stays a proper distribution
    rows.toSeq.groupBy(_._1._1).foreach { case (w1, xs) =>
      val mass = xs.map(_._2._2).sum
      assert(mass <= 1000000L, s"context '$w1' observed mass $mass > 1")
    }
  }

  test("q232: Viterbi best equals brute-force over every segmentation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    def exists(p: String): Boolean = p.length == 1 || h32(p) % 5 != 0
    def score(p: String): Long = 1000L * p.length * p.length + h32(p) % 997
    // brute force: best over ALL compositions into existing pieces ≤ 4
    def brute(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(4, w.length)).collect {
        case k if exists(w.take(k)) => score(w.take(k)) + brute(w.drop(k))
      }.max // nonempty: k = 1 always exists
    val rows = ops.Text.q232UnigramViterbi.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getString(0)
      assert(r.getAs[Long]("len") == w.length.toLong)
      assert(r.getAs[Long]("best_score") == brute(w), s"word '$w'")
    }
    // and the word list is exactly the capped distinct vocabulary
    val vocab = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("t")).distinct()
      .collect().map(_.getString(0).take(12)).distinct.sorted
    assert(rows.map(_.getString(0)).toSeq == vocab.toSeq)
  }

  test("q248: ROUGE-1/2 equal the local clipped-multiset replay") {
    import org.apache.spark.sql.functions._
    val rows = ops.Text.q248RougeOverlap.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    // bigram shingles follow the shingles(k=2) short-doc contract
    def bigrams(ts: Seq[String]): Seq[String] =
      if (ts.length < 2) Seq(ts.mkString(" "))
      else ts.sliding(2).map(_.mkString(" ")).toSeq
    def counts(gs: Seq[String]): Map[String, Long] =
      gs.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    def pr(c: Map[String, Long], r: Map[String, Long]): (Long, Long) = {
      val ov = c.map { case (g, n) => math.min(n, r.getOrElse(g, 0L)) }.sum
      (ov * 1000000L / c.values.sum, ov * 1000000L / r.values.sum)
    }
    def f1(p: Long, r: Long): Long = if (p + r == 0) 0L else 2 * p * r / (p + r)
    var checked = 0
    for ((id, text) <- docs if id % 5 != 0; ref <- docs.get(id - id % 5)) {
      val (u, b) = (toks(text), toks(ref))
      val (p1, r1) = pr(counts(u), counts(b))
      val (p2, r2) = pr(counts(bigrams(u)), counts(bigrams(b)))
      assert(rows(id) == ((p1, r1, f1(p1, r1), p2, r2, f1(p2, r2))), s"doc $id")
      checked += 1
    }
    assert(checked == rows.size && checked > 0)
    // the reference itself is not scored; self-identical docs score 1e6
    assert(!rows.contains(0L))
  }

  test("q255: CER equals a local Wagner-Fischer replay") {
    import org.apache.spark.sql.functions._
    val rows = ops.Text.q255CerEval.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(_.toLong)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i.toLong
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    var checked = 0
    for ((id, text) <- docs if id % 5 != 0; ref <- docs.get(id - id % 5)) {
      val d = lev(text, ref)
      assert(rows(id) == ((d, ref.length.toLong, d * 1000000L / ref.length)), s"doc $id")
      checked += 1
    }
    assert(checked == rows.size && checked > 0)
  }

  test("q256: BLEU-2 equals the local clipped-precision replay") {
    import org.apache.spark.sql.functions._
    val rows = ops.Text.q256BleuEval.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bigrams(ts: Seq[String]): Seq[String] =
      if (ts.length < 2) Seq(ts.mkString(" "))
      else ts.sliding(2).map(_.mkString(" ")).toSeq
    def counts(gs: Seq[String]): Map[String, Long] =
      gs.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    def clipP(c: Map[String, Long], r: Map[String, Long]): Long = {
      val ov = c.map { case (g, n) => math.min(n, r.getOrElse(g, 0L)) }.sum
      ov * 1000000L / c.values.sum
    }
    var checked = 0
    for ((id, text) <- docs if id % 5 != 0; ref <- docs.get(id - id % 5)) {
      val (u, b) = (toks(text), toks(ref))
      val p1 = clipP(counts(u), counts(b))
      val p2 = clipP(counts(bigrams(u)), counts(bigrams(b)))
      val bp = math.min(1000000L, u.length * 1000000L / b.length)
      val bleu2 = bp * math.floor(math.sqrt((p1 * p2).toDouble)).toLong / 1000000L
      assert(rows(id) == ((u.length.toLong, b.length.toLong, p1, p2, bp, bleu2)),
        s"doc $id")
      checked += 1
    }
    assert(checked == rows.size && checked > 0)
    // the self-identical reference would score bleu2 = 1e6; refs are excluded
    assert(!rows.contains(0L))
  }

  test("q259: kappa equals the cross-multiplied replay off q23's confusion") {
    val conf = ops.Text.q23LangId.fn(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .select("source", "lang", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val rows = ops.Text.q259CohensKappa.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val cells = conf.filter(_._1 == src)
      val n = cells.length.toLong
      val diag = cells.count(c => c._2 == c._3).toLong
      val peNum = cells.groupBy(_._2).map { case (k, xs) =>
        xs.length.toLong * cells.count(_._3 == k) }.sum
      assert(r.getLong(1) == n && r.getLong(2) == diag, src)
      assert(r.getLong(3) == diag * 1000000L / n, src)
      assert(r.getLong(4) == peNum * 1000000L / (n * n), src)
      val den = n * n - peNum
      if (den == 0) assert(r.isNullAt(5), src)
      else {
        val num = n * diag - peNum
        val want = if (num >= 0) num * 1000000L / den
                   else -((-num) * 1000000L / den)
        assert(r.getLong(5) == want, src)
        assert(r.getLong(5) <= 1000000L, src)
      }
    }
  }

  test("q260: Simpson collision mass equals the local token-histogram replay") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val rows = ops.Text.q260SimpsonDiversity.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val all = docs.filter(_._1 == src).flatMap(d => toks(d._2))
      val hist = all.groupBy(identity).map(_._2.length.toLong)
      val (t, types, coll) = (all.length.toLong, hist.size.toLong,
        hist.map(c => c * (c - 1)).sum)
      assert(r.getLong(1) == t && r.getLong(2) == types && r.getLong(3) == coll, src)
      assert(r.getLong(4) == coll * 1000000000L / (t * (t - 1)), src)
      if (coll == 0) assert(r.isNullAt(5), src)
      else assert(r.getLong(5) == t * (t - 1) * 1000L / coll, src)
    }
  }

  test("q261: the MBR winner maximizes summed set-Jaccard within its group") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSet).toMap
    def jacPpm(a: Set[String], b: Set[String]): Long = {
      val i = (a & b).size.toLong
      i * 1000000L / (a.size + b.size - i)
    }
    val rows = ops.Text.q261MbrConsensus.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(_._1)
    byGroup.foreach { case (gid, members) =>
      // replay every member's consensus score locally
      val ids = members.map(_._2).sorted
      members.foreach { case (_, id, consensus, nPeers, _) =>
        val peers = ids.filter(_ != id)
        assert(nPeers == peers.length.toLong, s"group $gid doc $id")
        val want = peers.map(p => jacPpm(docs(id), docs(p))).sum
        assert(consensus == want, s"group $gid doc $id")
      }
      // rank 1 is the argmax with doc_id tiebreak, ranks are a permutation
      val sorted = members.sortBy { case (_, id, c, _, _) => (-c, id) }
      assert(sorted.map(_._5).toSeq == (1L to members.length.toLong).toSeq, s"group $gid")
    }
  }

  test("q267: Chao1 and Good-Turing replay from the token histogram") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val rows = ops.Text.q267VocabRichness.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val hist = docs.filter(_._1 == src).flatMap(d => toks(d._2))
        .groupBy(identity).map(_._2.length.toLong)
      val (t, s1, f1, f2) = (hist.sum, hist.size.toLong,
        hist.count(_ == 1L).toLong, hist.count(_ == 2L).toLong)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((t, s1, f1, f2)), src)
      assert(r.getLong(5) == 1000 * s1 + 1000 * f1 * (f1 - 1) / (2 * (f2 + 1)), src)
      assert(r.getLong(6) == f1 * 1000000L / t, src)
      assert(r.getLong(7) == 1000000L - f1 * 1000000L / t, src)
      // Chao1 is a lower-bound ESTIMATE above the observed count
      assert(r.getLong(5) >= 1000 * s1, src)
    }
  }

  test("q268: Murphy decomposition replays in BigInt and closes exactly") {
    val rows = ops.Text.q268BrierDecomp.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the decile cells from q166's own per-bin output shape
    val cells = rows.map(r => (r.getLong(0), r.getLong(1)))
    // components are global columns — identical on every row
    val (relS, resS, uncS, bsBinned, bs) = (rows.map(_.getLong(4)).distinct,
      rows.map(_.getLong(5)).distinct, rows.map(_.getLong(6)).distinct,
      rows.map(_.getLong(7)).distinct, rows.map(_.getLong(8)).distinct)
    assert(relS.length == 1 && resS.length == 1 && uncS.length == 1 &&
      bsBinned.length == 1 && bs.length == 1)
    // the decomposition identity holds EXACTLY by construction
    assert(bsBinned.head == uncS.head - resS.head + relS.head)
    // all components nonnegative, uncertainty <= 250000000 ppb (p(1-p) <= 1/4)
    assert(relS.head >= 0 && resS.head >= 0 && uncS.head >= 0)
    assert(uncS.head <= 250000000L)
    // binned BS approximates the unbinned BS from the same forecasts:
    // within-bin variance is what separates them — bounded by bin width²
    assert((bsBinned.head - bs.head).abs <= 20000000L,
      s"binned ${bsBinned.head} vs raw ${bs.head}")
    // conf/acc are milli values per decile cell
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
      assert(cells.find(_._1 == r.getLong(0)).get._2 > 0)
    }
  }

  test("q272: pass@k equals the exact combinatorial estimator per task") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getString(1).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getLong(0) - r.getLong(0) % 5,
          if (Integer.parseInt(md5hex.take(1), 16) < 8) 1L else 0L)
      }
    def choose(n: Long, k: Long): BigInt =
      (0L until k).map(i => BigInt(n - i)).product / (1L to k).map(BigInt(_)).product
    val rows = ops.Text.q272PassAtK.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val byTask = docs.groupBy(_._1)
    rows.foreach { r =>
      val task = r.getLong(0)
      val atts = byTask(task)
      val (n, c) = (atts.length.toLong, atts.map(_._2).sum)
      assert((r.getLong(1), r.getLong(2)) == ((n, c)), s"task $task")
      // falling-factorial ratio == binomial ratio, floored once
      for ((k, idx) <- Seq(1L -> 3, 2L -> 4, 3L -> 5)) {
        if (n < k) assert(r.isNullAt(idx), s"task $task k=$k")
        else {
          val want = 1000000L -
            (choose(n - c, k) * 1000000 / choose(n, k)).toLong
          assert(r.getLong(idx) == want, s"task $task k=$k")
          // unbiased estimator never below the naive first-k share of 0/1
          assert(r.getLong(idx) >= 0 && r.getLong(idx) <= 1000000L)
        }
      }
    }
    // monotone in k: more attempts can only help
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5))
    }
    // the headline means replay from the per-task columns
    val m1 = rows.map(_.getLong(3))
    val m3 = rows.map(_.getLong(5))
    assert(rows.head.getLong(6) == m1.sum / m1.length)
    assert(rows.head.getLong(7) == m3.sum / m3.length)
  }

  test("q273: pair-count algebra replays from the confusion matrix") {
    import org.apache.spark.sql.functions._
    val conf = ops.Text.q23LangId.fn(spark, sf)
      .select("lang", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def c2(x: Long): BigInt = BigInt(x) * (x - 1) / 2
    val n = conf.length.toLong
    val tp = conf.groupBy(identity).values.map(g => c2(g.length.toLong)).sum
    val sa = conf.groupBy(_._1).values.map(g => c2(g.length.toLong)).sum
    val sb = conf.groupBy(_._2).values.map(g => c2(g.length.toLong)).sum
    val cn2 = c2(n)
    val r = ops.Text.q273PartitionAgree.fn(spark, sf).collect() match {
      case Array(one) => one
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == tp.toLong && r.getLong(2) == (sb - tp).toLong &&
      r.getLong(3) == (sa - tp).toLong)
    assert(r.getLong(4) == (tp * 1000000 / sb).toLong)
    assert(r.getLong(5) == (tp * 1000000 / sa).toLong)
    assert(r.getLong(6) == (tp * 2000000 / (sa + sb)).toLong)
    assert(r.getLong(7) == ((cn2 - sa - sb + 2 * tp) * 1000000 / cn2).toLong)
    val num2 = 2 * (tp * cn2 - sa * sb)
    val den2 = (sa + sb) * cn2 - 2 * sa * sb
    val ari = if (num2 >= 0) num2 * 1000000 / den2
              else -((-num2) * 1000000 / den2)
    assert(r.getLong(8) == ari.toLong)
    // ARI lands near zero on this fixture (the stopword voter is a weak
    // PAIRWISE clusterer even where row accuracy is fine — exactly the
    // signal ARI adds over accuracy); bound it, don't assume its sign
    assert(r.getLong(8).abs <= 1000000L)
    assert(r.getLong(4) > 0 && r.getLong(5) > 0, "pairwise P/R degenerate")
  }

  test("q287: Flesch ease/grade replay from the local syllable heuristic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = ops.Text.q287Flesch.fn(spark, sf).collect()
    assert(rows.length == docs.count(_._2.trim.nonEmpty))
    val byId = docs.toMap
    val sylRe = "[aeiouy]+".r
    val sentRe = "[.!?]+".r
    rows.foreach { r =>
      val text = byId(r.getLong(0))
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val w = toks.length.toLong
      val s = sentRe.findAllIn(text).length.toLong + 1
      val syl = toks.map(t => math.max(sylRe.findAllIn(t).length.toLong, 1L)).sum
      assert(r.getLong(1) == w && r.getLong(2) == s && r.getLong(3) == syl, r.getLong(0))
      assert(r.getLong(4) == 206835L - 1015L * w / s - 84600L * syl / w, r.getLong(0))
      assert(r.getLong(5) == 390L * w / s + 11800L * syl / w - 15590L, r.getLong(0))
    }
  }

  test("q288: Fano factors replay in BigInt; the top-30 order is fully pinned") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    val cells = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, xs) => (t, id, xs.length.toLong) } }
    val tok = cells.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._3).sum, xs.map(x => BigInt(x._3) * x._3).sum) }
    val expected = tok.toSeq.sortBy { case (t, _, total, _) => (-total, t) }.take(30)
    val rows = ops.Text.q288Burstiness.fn(spark, sf).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (t, df, total, sumsq)) =>
      assert(r.getString(0) == t)
      assert(r.getLong(1) == df && r.getLong(2) == total, t)
      val fano = (BigInt(nDocs) * sumsq - BigInt(total) * total) * 1000 /
        (BigInt(nDocs) * total)
      assert(r.getLong(3) == fano.toLong, t)
      assert(fano >= 0, t)
    }
  }

  test("q295: RAKE word and phrase scores replay from a brute island split") {
    import org.apache.spark.sql.functions._
    val stops = graft.functions.TextFunctions.LangStopwords.flatMap(_._2).distinct.toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    // phrases: maximal runs of non-stopword tokens
    val phrases = docs.flatMap { toks =>
      val runs = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = List.empty[String]
      toks.foreach { t =>
        if (stops(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = t :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.toList
    }
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    phrases.foreach { p => p.foreach { w => deg(w) += p.length; freq(w) += 1 } }
    val wscore = deg.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val scored = phrases.map(p => (p.mkString(" "), p.length.toLong, p.map(wscore).sum))
    val agg = scored.groupBy(x => (x._1, x._2)).map { case ((ph, len), xs) =>
      (ph, len, xs.length.toLong, xs.head._3) }.toSeq
    val expected = agg.sortBy { case (ph, _, _, sc) => (-sc, ph) }.take(20)
    val rows = ops.Text.q295RakeKeywords.fn(spark, sf).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (ph, len, occ, sc)) =>
      assert(r.getString(0) == ph, ph)
      assert(r.getLong(1) == len && r.getLong(2) == occ && r.getLong(3) == sc, ph)
    }
    assert(rows.exists(_.getLong(1) > 1), "fixture must yield multi-word phrases")
  }
}
