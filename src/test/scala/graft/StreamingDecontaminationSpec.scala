package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDecontamination

/** Streaming decontamination: the accumulated hit state equals the
  * one-shot eval⋉train semi-join regardless of batch boundaries
  * (contamination is monotone — train appends can only add hits),
  * per-batch deltas are disjoint, and redelivery is a no-op. */
class StreamingDecontaminationSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sdc").toString

  private def cleanup(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))

  /** Small fixture: eval docs 1..3 with word grams, train grams g2/g5
    * overlapping doc 1 and 3. */
  private def evalGrams: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, "g1"), (1L, "g2"), (2L, "g3"), (2L, "g4"),
      (3L, "g5"), (3L, "g2")).toDF("doc_id", "g")
  }

  private def trainBatch(gs: String*): DataFrame = {
    val s = spark
    import s.implicits._
    gs.toDF("g")
  }

  test("final state is independent of how the train stream is batched") {
    val s = spark
    val all = Seq("g2", "g5", "g9", "g9", "g2")
    val oneShot = evalGrams.join(
        trainBatch(all: _*).distinct(), Seq("g"), "left_semi")
      .select(col("doc_id"), col("g"))
      .collect().map(_.toString).sorted.toSeq
    // split A: 2 batches; split B: 3 batches in a different order
    val splits = Seq(
      Seq(Seq("g2", "g5"), Seq("g9", "g9", "g2")),
      Seq(Seq("g9"), Seq("g5", "g2"), Seq("g2")))
    splits.foreach { batches =>
      val dir = tmp()
      try {
        batches.zipWithIndex.foreach { case (gs, b) =>
          StreamingDecontamination.applyBatch(
            trainBatch(gs: _*), evalGrams, "g", b.toLong, dir)
        }
        val got = StreamingDecontamination.readHits(s, dir)
          .collect().map(_.toString).sorted.toSeq
        assert(got == oneShot)
      } finally cleanup(dir)
    }
  }

  test("per-batch deltas are disjoint and hits accumulate monotonically") {
    val s = spark
    val dir = tmp()
    try {
      StreamingDecontamination.applyBatch(trainBatch("g2"), evalGrams, "g", 0L, dir)
      val after0 = StreamingDecontamination.readHits(s, dir).count()
      assert(after0 == 2) // (1,g2) and (3,g2)
      // g2 again + g5: only the (3,g5) hit is new
      StreamingDecontamination.applyBatch(
        trainBatch("g2", "g5"), evalGrams, "g", 1L, dir)
      assert(StreamingDecontamination.readHits(s, dir).count() == 3)
      assert(s.read.parquet(s"$dir/hits/b1").count() == 1)
      // a batch with no overlapping grams adds nothing
      StreamingDecontamination.applyBatch(
        trainBatch("zz"), evalGrams, "g", 2L, dir)
      assert(StreamingDecontamination.readHits(s, dir).count() == 3)
    } finally cleanup(dir)
  }

  test("redelivery of an applied batch is a no-op") {
    val s = spark
    val dir = tmp()
    try {
      StreamingDecontamination.applyBatch(trainBatch("g2"), evalGrams, "g", 0L, dir)
      StreamingDecontamination.applyBatch(trainBatch("g3"), evalGrams, "g", 1L, dir)
      val before = StreamingDecontamination.readHits(s, dir)
        .collect().map(_.toString).sorted.toSeq
      // redelivered batch 1 with DIFFERENT content must not apply
      StreamingDecontamination.applyBatch(trainBatch("g4"), evalGrams, "g", 1L, dir)
      val after = StreamingDecontamination.readHits(s, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(after == before)
    } finally cleanup(dir)
  }

  test("report shapes every eval doc with zero-filled clean rows") {
    val s = spark
    val dir = tmp()
    try {
      StreamingDecontamination.applyBatch(
        trainBatch("g2", "g5"), evalGrams, "g", 0L, dir)
      val rows = StreamingDecontamination.report(s, dir, evalGrams, "g")
        .orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq
      assert(rows == Seq((1L, 2L, 1L, true), (2L, 2L, 0L, false),
        (3L, 2L, 2L, true)))
    } finally cleanup(dir)
  }

  test("real stream wiring via MemoryStream matches the one-shot semi-join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmp(); val ckpt = tmp()
    try {
      val mem = MemoryStream[String]
      val q = StreamingDecontamination.start(
        mem.toDF().toDF("g"), evalGrams, "g", dir, ckpt)
      try {
        mem.addData("g2", "zz")
        q.processAllAvailable()
        mem.addData("g5", "g2")
        q.processAllAvailable()
      } finally q.stop()
      val want = evalGrams.join(
          trainBatch("g2", "zz", "g5").distinct(), Seq("g"), "left_semi")
        .select(col("doc_id"), col("g"))
        .collect().map(_.toString).sorted.toSeq
      val got = StreamingDecontamination.readHits(s, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want)
    } finally { cleanup(dir); cleanup(ckpt) }
  }
}
