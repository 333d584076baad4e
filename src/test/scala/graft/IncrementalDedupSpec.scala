package graft

import org.apache.spark.sql.functions._

import graft.streaming.IncrementalDedup

/** Incremental dedup against history: first-seen-wins across batches,
  * exactly-once under redelivery, and delta-sized appends (earlier
  * batches' state is never rewritten). */
class IncrementalDedupSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-idedup").toString

  private def cleanup(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))

  private def files(p: String): Map[String, Long] = {
    val dir = new java.io.File(p)
    if (!dir.isDirectory) Map.empty
    else dir.listFiles().filter(_.isFile).filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("cross-batch dups drop; a dup within the batch keeps min id") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      // batch 0: ids 1,2 distinct + 3 duplicating 1's content
      IncrementalDedup.applyBatch(
        Seq((1L, "ha"), (2L, "hb"), (3L, "ha")).toDF("id", "h"),
        "id", "h", 0L, dir)
      // batch 1: 4 re-sends hb (drop), 5 is new
      IncrementalDedup.applyBatch(
        Seq((4L, "hb"), (5L, "hc")).toDF("id", "h"), "id", "h", 1L, dir)
      val got = IncrementalDedup.readEmitted(s, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "ha"), (2L, "hb"), (5L, "hc")))
    } finally cleanup(dir)
  }

  test("redelivered batches no-op; history state is never rewritten") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      IncrementalDedup.applyBatch(
        Seq((1L, "ha"), (2L, "hb")).toDF("id", "h"), "id", "h", 0L, dir)
      val seen0 = files(s"$dir/seen/b0")
      val out0 = files(s"$dir/out/b0")
      assert(seen0.nonEmpty && out0.nonEmpty)
      IncrementalDedup.applyBatch(
        Seq((3L, "hc")).toDF("id", "h"), "id", "h", 1L, dir)
      // batch 1 wrote only its own dirs: batch 0's files untouched
      assert(files(s"$dir/seen/b0") == seen0)
      assert(files(s"$dir/out/b0") == out0)
      // redelivery of batch 1 is a no-op (marker already at 1)
      val out1 = files(s"$dir/out/b1")
      IncrementalDedup.applyBatch(
        Seq((3L, "hc"), (9L, "hz")).toDF("id", "h"), "id", "h", 1L, dir)
      assert(files(s"$dir/out/b1") == out1)
      assert(IncrementalDedup.readEmitted(s, dir).count() == 3)
    } finally cleanup(dir)
  }

  test("real stream wiring via MemoryStream emits first-seen only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmp()
    val ckpt = tmp()
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = IncrementalDedup.start(
        mem.toDF().toDF("id", "h"), "id", "h", dir, ckpt)
      try {
        mem.addData((1L, "ha"), (2L, "hb"))
        q.processAllAvailable()
        mem.addData((3L, "ha"), (4L, "hc")) // ha re-arrives -> dropped
        q.processAllAvailable()
      } finally q.stop()
      val got = IncrementalDedup.readEmitted(s, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "ha"), (2L, "hb"), (4L, "hc")))
    } finally { cleanup(dir); cleanup(ckpt) }
  }
}
