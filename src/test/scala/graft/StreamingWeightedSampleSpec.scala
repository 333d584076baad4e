package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingWeightedSample

/** Streaming E-S weighted sampling: bit-identical to the batch t26
  * sampler over the same rows (top-k mergeability + deterministic
  * keys), k-bounded state, redelivery no-op. */
class StreamingWeightedSampleSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sws").toString

  private def cleanup(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))

  /** t26's keyed frame: (id, n_chars, key) with the md5-derived E-S key. */
  private def keyed(d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(col("doc_id").as("id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long") + 1L).as("v"))
      .select(col("id"), col("n_chars"),
        round(log(col("v").cast("double") / lit(281474976710657.0))
          / col("n_chars"), 12).as("key"))
  }

  test("micro-batch replay is bit-identical to the batch t26 sampler") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val dir = tmp()
    try {
      val all = keyed(d).localCheckpoint(true)
      (0 to 2).foreach { b =>
        StreamingWeightedSample.applyBatch(
          all.filter(pmod(col("id"), lit(3)) === b), 20, b.toLong, dir)
      }
      val got = StreamingWeightedSample.read(s, dir)
        .collect().map(_.toString).sorted.toSeq
      val want = all.orderBy(col("key").desc, col("id").asc).limit(20)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want)
      assert(got.size == 20)
    } finally cleanup(dir)
  }

  test("eviction is permanent and state stays k-bounded") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      // batch 0: ids 1..5 with keys -1..-5 (higher = better)
      StreamingWeightedSample.applyBatch(
        (1 to 5).map(i => (i.toLong, -i.toDouble)).toDF("id", "key"),
        3, 0L, dir)
      assert(StreamingWeightedSample.read(s, dir)
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      // batch 1: two better keys evict 3; evicted rows never return
      StreamingWeightedSample.applyBatch(
        Seq((10L, 0.5), (11L, 0.4)).toDF("id", "key"), 3, 1L, dir)
      assert(StreamingWeightedSample.read(s, dir)
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 10L, 11L))
      // replay of batch 1 is a no-op
      StreamingWeightedSample.applyBatch(
        Seq((99L, 9.9)).toDF("id", "key"), 1, 1L, dir)
      assert(StreamingWeightedSample.read(s, dir)
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 10L, 11L))
    } finally cleanup(dir)
  }

  test("continuing a sample state under a different k is rejected") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val b0 = (1 to 30).map(i => (i.toLong, i.toDouble)).toDF("id", "key")
      StreamingWeightedSample.applyBatch(b0, k = 20, 0L, dir)
      // a larger k would claim rows the k=20 merges permanently
      // evicted — must fail loudly, like StreamingHeavyHitters
      intercept[IllegalArgumentException] {
        StreamingWeightedSample.applyBatch(b0, k = 30, 1L, dir)
      }
      // same k continues fine
      StreamingWeightedSample.applyBatch(
        (31 to 40).map(i => (i.toLong, 0.5)).toDF("id", "key"), k = 20, 1L, dir)
      assert(StreamingWeightedSample.read(s, dir).count() == 20)
    } finally cleanup(dir)
  }

  test("a pre-k (1-field) marker reads as unknown k and still continues") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val b0 = (1 to 5).map(i => (i.toLong, i.toDouble)).toDF("id", "key")
      StreamingWeightedSample.applyBatch(b0, k = 3, 0L, dir)
      // simulate a state written before k persistence
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_current"),
        "0".getBytes("UTF-8"))
      assert(StreamingWeightedSample.marker(dir) == (0L, -1))
      // unknown k relaxes the guard rather than crashing the stream,
      // and the sentinel propagates (history was never provably top-3)
      StreamingWeightedSample.applyBatch(b0, k = 3, 1L, dir)
      assert(StreamingWeightedSample.marker(dir) == (1L, -1))
    } finally cleanup(dir)
  }

  test("real stream wiring via MemoryStream matches the one-shot cut") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmp(); val ckpt = tmp()
    try {
      val mem = MemoryStream[(Long, Double)]
      val q = StreamingWeightedSample.start(
        mem.toDF().toDF("id", "key"), 4, dir, ckpt)
      try {
        mem.addData((1 to 10).map(i => (i.toLong, (i % 7).toDouble)): _*)
        q.processAllAvailable()
        mem.addData((11 to 20).map(i => (i.toLong, (i % 5).toDouble)): _*)
        q.processAllAvailable()
      } finally q.stop()
      val all = ((1 to 10).map(i => (i.toLong, (i % 7).toDouble)) ++
        (11 to 20).map(i => (i.toLong, (i % 5).toDouble))).toDF("id", "key")
      val want = all.orderBy(col("key").desc, col("id").asc).limit(4)
        .collect().map(_.toString).sorted.toSeq
      val got = StreamingWeightedSample.read(s, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want)
    } finally { cleanup(dir); cleanup(ckpt) }
  }
}
