package graft

import graft.sources.Multimodal
import graft.sources.Multimodal.MediaFile

/** Multimodal plumbing tests: payload determinism, stub-decode
  * consistency between the typed mapPartitions path and plain Scala,
  * frame sampling shape. */
class MultimodalSpec extends SparkSpec {

  test("media table: 32-byte payloads, deterministic across reads") {
    val a = Multimodal.mediaTable(spark, sf).collect().sortBy(_.doc_id)
    val b = Multimodal.mediaTable(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length == b.length && a.length > 0)
    assert(a.forall(_.content.length == 32))
    assert(a.zip(b).forall { case (x, y) => x.content.sameElements(y.content) })
  }

  test("decodeAll (mapPartitions) equals per-row decodeStub") {
    val files = Multimodal.mediaTable(spark, sf)
    val viaPartitions = Multimodal.decodeAll(files).collect().sortBy(_.doc_id)
    val viaRows = files.collect().sortBy(_.doc_id).map(Multimodal.decodeStub)
    assert(viaPartitions.toSeq == viaRows.toSeq)
    assert(viaPartitions.forall(m => m.width >= 16 && m.width < 64))
  }

  test("frame sampling keeps every Nth 4-byte frame of video payloads") {
    val f = MediaFile(1L, "video", "mp4", Array.tabulate(32)(_.toByte))
    val frames = Multimodal.frameSampleStub(f, 2)
    assert(frames.map(_._1) == Seq(0, 2, 4, 6))
    assert(frames.head._2 == "00010203")
    val df = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf), 2)
    assert(df.groupBy("doc_id").count().collect().forall(_.getLong(1) == 4))
  }
}
