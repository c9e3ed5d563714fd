package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-vs-batch equivalence: every streaming transform is the same
  * DataFrame code run incrementally, so running it over a finite input
  * with Trigger.AvailableNow must reproduce the batch answer exactly. */
class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables.events(spark, sf)

  test("streaming hourly counts == batch hourly counts") {
    val q = Streaming.runToMemory(
      Streaming.hourlyCounts(Streaming.eventsStream(spark, sf)), "hourly")
    val got = spark.table("hourly")
      .groupBy("hour_start", "event_type")
      .agg(max("n").as("n"), max("total_value").as("total_value"))
    val want = Streaming.hourlyCounts(batchEvents)
    assert(got.count() > 0)
    assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty)
    q.stop()
  }

  test("streaming session windows == batch session windows") {
    val q = Streaming.runToMemory(
      Streaming.sessionCounts(Streaming.eventsStream(spark, sf)), "sessions",
      mode = "complete")
    val got = spark.table("sessions")
    val want = Streaming.sessionCounts(batchEvents)
    assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty)
    q.stop()
  }

  test("streaming dedup keeps one row per event_id") {
    val q = Streaming.runToMemory(
      Streaming.dedupStream(Streaming.eventsStream(spark, sf)), "dedup", mode = "append")
    assert(spark.table("dedup").count() == batchEvents.select("event_id").distinct().count())
    q.stop()
  }

  test("AvailableNow ingest writes date-partitioned parquet idempotently") {
    val out = Files.createTempDirectory("graft-ingest").toString
    val cp = Files.createTempDirectory("graft-cp").toString
    Streaming.ingestToParquet(Streaming.eventsStream(spark, sf), out, cp)
    val written = spark.read.parquet(out)
    assert(written.count() == batchEvents.count())
    assert(written.columns.contains("event_date"))
    // second run with a fresh checkpoint overwrites the same partitions
    val cp2 = Files.createTempDirectory("graft-cp2").toString
    Streaming.ingestToParquet(Streaming.eventsStream(spark, sf), out, cp2)
    assert(spark.read.parquet(out).count() == batchEvents.count())
  }
}
