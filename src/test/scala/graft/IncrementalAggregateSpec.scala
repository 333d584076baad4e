package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalAggregate

/** The foreachBatch exactly-once upsert: streamed batches maintain a
  * running per-key table equal to the batch aggregate of everything
  * fed so far; replayed batch ids no-op; a restarted query (same
  * checkpoint) continues without double counting.
  */
class IncrementalAggregateSpec extends SparkSpec {

  private def freshDirs() = {
    val t = Files.createTempDirectory("inc_agg_tbl").toString
    val c = Files.createTempDirectory("inc_agg_ckp").toString
    (t, c)
  }

  private def snapshot(tableDir: String): Map[String, (Long, Double)] =
    IncrementalAggregate.read(spark, tableDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("two micro-batches merge into the running table; result equals one batch agg") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (tbl, ckp) = freshDirs()
    val mem = MemoryStream[(String, Double)]
    val q = IncrementalAggregate.start(
      mem.toDF().select(col("_1").as("k"), col("_2").as("v")),
      "k", "v", tbl, ckp)
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      assert(snapshot(tbl) == Map("a" -> ((2L, 3.0)), "b" -> ((1L, 10.0))))
      mem.addData(("a", 4.0), ("c", 7.0))
      q.processAllAvailable()
      assert(snapshot(tbl) ==
        Map("a" -> ((3L, 7.0)), "b" -> ((1L, 10.0)), "c" -> ((1L, 7.0))))
    } finally q.stop()
  }

  test("a redelivered batch id is a no-op (crash-replay idempotency)") {
    val s = spark
    import s.implicits._
    val (tbl, _) = freshDirs()
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    IncrementalAggregate.applyBatch(b0, 0L, "k", "v", tbl)
    val once = snapshot(tbl)
    IncrementalAggregate.applyBatch(b0, 0L, "k", "v", tbl) // replay
    assert(snapshot(tbl) == once)
    assert(IncrementalAggregate.lastApplied(tbl) == 0L)
    IncrementalAggregate.applyBatch(Seq(("a", 5.0)).toDF("k", "v"), 1L, "k", "v", tbl)
    assert(snapshot(tbl) == Map("a" -> ((2L, 6.0)), "b" -> ((1L, 2.0))))
  }

  test("crash between data write and pointer swap loses nothing") {
    val s = spark
    import s.implicits._
    val (tbl, _) = freshDirs()
    IncrementalAggregate.applyBatch(Seq(("a", 1.0)).toDF("k", "v"), 0L, "k", "v", tbl)
    IncrementalAggregate.applyBatch(Seq(("b", 2.0)).toDF("k", "v"), 1L, "k", "v", tbl)
    // simulate a crash mid-publish of batch 2: a (possibly partial)
    // version dir exists but the pointer was never swapped
    Files.createDirectories(java.nio.file.Paths.get(tbl, "v2"))
    Files.write(java.nio.file.Paths.get(tbl, "v2", "junk"), Array[Byte](1, 2, 3))
    assert(IncrementalAggregate.lastApplied(tbl) == 1L)
    assert(snapshot(tbl) == Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0)))) // nothing lost
    // the redelivered batch overwrites the leftover and publishes cleanly
    IncrementalAggregate.applyBatch(Seq(("a", 5.0)).toDF("k", "v"), 2L, "k", "v", tbl)
    assert(snapshot(tbl) == Map("a" -> ((2L, 6.0)), "b" -> ((1L, 2.0))))
  }

  test("restart from the same checkpoint continues without double counting") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (tbl, ckp) = freshDirs()
    val mem = MemoryStream[(String, Double)]
    val src = mem.toDF().select(col("_1").as("k"), col("_2").as("v"))
    val q1 = IncrementalAggregate.start(src, "k", "v", tbl, ckp)
    mem.addData(("a", 1.0), ("b", 2.0))
    q1.processAllAvailable()
    q1.stop()
    // same checkpoint, new query: batch ids continue, prior data stays applied
    val q2 = IncrementalAggregate.start(src, "k", "v", tbl, ckp)
    try {
      mem.addData(("a", 3.0))
      q2.processAllAvailable()
      assert(snapshot(tbl) == Map("a" -> ((2L, 4.0)), "b" -> ((1L, 2.0))))
    } finally q2.stop()
  }
}
