package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: noop-sink timing for a subset of registered queries.
  * Usage: runMain graft.Prof q42_xml_flatten q35_ocds_flatten */
object Prof {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .appName("graft-prof").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false)
      // static conf: match Bench (repeat passes reuse generated classes)
      .config("spark.sql.codegen.cache.maxEntries", Tuning.codegenCacheMaxEntries.toString)
    // A/B experiments: SPARK_GRAFT_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.queries ++ Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
        // 1<<20, not Int.MaxValue: seg+7 must not wrap (slice length)
        "q224_seg_off" -> ((s, d) => ops.Dedup.q224Pipeline(s, d, 1 << 20)),
        "xml_construct" -> ((s, d) => ops.Xml.docsTable(s, d)),
        "json_construct" -> ((s, d) => ops.Ocds.releaseJson(s, d)),
        "q46_scan_only" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          Tables.documents(s, d)
            .select(col("doc_id"),
              explode(shingles(tokens(col("text")), 5)).as("sx"))
            .select(col("doc_id"), hex32(col("sx")).as("h"))
            .groupBy("doc_id").agg(min(col("h")).as("m"))
        },
        "q46_sig16_expr" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          Tables.documents(s, d)
            .select(col("doc_id"),
              shingleHashes(shingles(tokens(col("text")), 5)).as("hs"))
            .select(col("doc_id"),
              array_join(transform(minhashSigFromHashes(col("hs"), 16),
                _.cast("string")), ",").as("sig"))
        },
        "q46_sig16_native" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          Tables.documents(s, d)
            .select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"),
              array_join(transform(expr("graft_minhash(toks)"),
                _.cast("string")), ",").as("sig"))
        },
        // round-12 fused-fingerprint diagnostics: is the sh column
        // evaluated once (guarded projection) or inlined twice?
        "fpx_sh_only" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          graft.Q.stageBarrier(Tables.documents(s, d))
            .select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"),
              array_distinct(tokenShingleHashes(col("toks"))).as("sh"))
        },
        "fpx_fused" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          graft.Q.stageBarrier(Tables.documents(s, d))
            .select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"),
              array_distinct(tokenShingleHashes(col("toks"))).as("sh"))
            .withColumn("sig", expr("graft_minhash_hashes(sh)"))
        },
        "fpx_two_exprs" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          graft.Q.stageBarrier(Tables.documents(s, d))
            .select(col("doc_id"), tokens(col("text")).as("toks"))
            .select(col("doc_id"),
              array_distinct(tokenShingleHashes(col("toks"))).as("sh"),
              expr("graft_minhash(toks)").as("sig"))
        },
        "q28_hash_stage" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import graft.functions.TextFunctions._
          Tables.documents(s, d)
            .select(col("doc_id"),
              transform(array_distinct(tokens(col("text"))), t => hex32(t)).as("hs"))
            .select(col("doc_id"), expr("graft_simhash(hs)").as("code"))
        },
        "q36_pruned" -> { (s, d) =>
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.types._
          val slim = StructType(Seq(StructField("releases", ArrayType(
            StructType(Seq(StructField("ocid", StringType)))))))
          val corrupted = ops.Ocds.releaseJson(s, d)
            .withColumn("release_json",
              when(col("o_orderkey") % 97 === 0,
                concat(lit("{corrupt::"), col("release_json"))).otherwise(col("release_json")))
          corrupted
            .select(try_element_at(from_json(col("release_json"), slim)
              .getField("releases"), lit(1)).as("r"))
            .select(when(col("r").getField("ocid").isNull, "parse_error").otherwise("ok").as("status"),
              col("r").getField("ocid").isNotNull.as("parsed"))
            .groupBy("status")
            .agg(count(lit(1)).as("n"), count(when(col("parsed"), 1)).as("n_parsed"))
            .orderBy("status")
        })
    if (args.contains("simhash_plan")) {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      val hs = Tables.documents(spark, sf).limit(20)
        .select(col("doc_id"),
          shingleHashes(array_distinct(shingles(tokens(col("text")), 5))).as("hs"))
      val both = hs.select(col("doc_id"), expr("graft_simhash(hs)").as("native"))
      println(both.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    // shuffle-volume listener: measured evidence for the per-operator
    // scale claims ("one 64-row shuffle", "ids only, never arrays") —
    // bytes written to / read from shuffle per profiled run
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    // skew-join engagement probe (round-9 VERDICT item 5): count
    // "skew=true" markers in the AQE-final executed plan — a
    // SortMergeJoinExec/ShuffledHashJoinExec that OptimizeSkewedJoin
    // split prints its nodeName with that suffix. Read AFTER execution
    // (the listener fires on success) so the ADAPTIVE final plan, not
    // the initial one, is what's scanned.
    val skewNodes = new java.util.concurrent.atomic.AtomicInteger
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val s = try qe.executedPlan.toString catch { case _: Throwable => "" }
        skewNodes.addAndGet("skew=true".r.findAllIn(s).length)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    // per-stage parallelism evidence: (numTasks, executor cpu-seconds);
    // distinguishes "the host was busy" from "AQE serialized the stage"
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Double)]
    // straggler telemetry (round-10 VERDICT item 8): per-stage task
    // wall times, so CPU-tail stragglers (q224's long-doc class — one
    // task serialized behind a single expensive row) are a RECORDED
    // max/median ratio per wave rather than a wall-ratio inference
    val taskSecs = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Double]]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskInfo != null)
            taskSecs.computeIfAbsent(te.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue[Double])
              .add(te.taskInfo.duration / 1e3)
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            stages.add((sc.stageInfo.stageId, sc.stageInfo.numTasks,
              m.executorRunTime / 1e3))
          }
        }
      })
    // warmup
    byName("q02_filter_project")(spark, sf).write.format("noop").mode("overwrite").save()
    for (name <- args; _ <- 1 to 2) {
      // drop accumulated localCheckpoint blocks so each measurement is
      // independent of what ran before it (same rationale as Bench)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      shufWrite.set(0); shufRead.set(0); stages.clear(); skewNodes.set(0)
      taskSecs.clear()
      val t0 = System.nanoTime()
      byName(name)(spark, sf).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150) // let the async listener bus drain stage events
      import scala.jdk.CollectionConverters._
      // straggler = worst max/median task-wall ratio over MATERIAL
      // stages (>= 4 tasks, max task >= 0.5 s — tiny stages are noise);
      // report the worst stage's absolutes alongside the ratio. The
      // median gets a 0.1 s floor in the RATIO (round-11 stretch item:
      // a ~0.02 s median under a 1.5 s max printed "75x" for stages
      // where salting is working fine — scheduling jitter, not skew);
      // absolutes still come from the true median, so nothing is hidden
      val strag = taskSecs.asScala.toSeq.flatMap { case (sid, q) =>
        val ts = q.asScala.toSeq.sorted
        if (ts.size >= 4 && ts.last >= 0.5) {
          val med = ts(ts.size / 2)
          if (med > 0) Some((ts.last / math.max(med, 0.1), sid, ts.last, med))
          else None
        } else None
      }.sortBy(-_._1).headOption
      val stragStr = strag.map { case (r, sid, mx, med) =>
        f"straggler=$r%.1fx(s$sid max=$mx%.1fs med=$med%.1fs)" }
        .getOrElse("straggler=1.0x")
      println(f"[prof] $name%-24s $sec%.2f s  shuffle w=${shufWrite.get / 1024}%d KiB r=${shufRead.get / 1024}%d KiB skew=${skewNodes.get}%d $stragStr")
      val heavy = stages.asScala.toSeq.sortBy(-_._3).take(6)
        .map { case (id, n, s) => f"s$id:$n%dt/$s%.1fs" }.mkString(" ")
      println(s"[prof-stages] $name $heavy")
    }
    spark.stop()
  }
}
