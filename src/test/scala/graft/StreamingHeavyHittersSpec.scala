package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.streaming.StreamingHeavyHitters

/** The foreachBatch incremental MG variant reproduces batch sk04's
  * exact answer on replayed micro-batches (mergeable-summaries
  * soundness end-to-end), survives redelivery, and keeps k-bounded
  * state through real stream wiring. */
class StreamingHeavyHittersSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-shh").toString

  private def cleanup(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))

  test("micro-batch replay reproduces the batch operator hash-for-hash") {
    val s = spark
    import s.implicits._
    // the zipf stream HeavyHittersSpec drives eviction with, split into
    // 3 interleaved micro-batches (j % 3) so every batch carries a mix
    // of heavy and tail tokens
    val rows = (1 to 400).flatMap(j => Seq.fill(3000 / j)(s"t_$j" -> j))
    val dir = tmp()
    try {
      (0 to 2).foreach { b =>
        val slice = rows.filter(_._2 % 3 == b).map(_._1)
          .toDF("tok").repartition(8)
        StreamingHeavyHitters.applyBatch(slice, "tok", b.toLong, k = 63, dir)
      }
      val lake = rows.map(_._1).toDF("tok").repartition(8)
      val got = StreamingHeavyHitters.exactOverLake(lake, "tok", dir, 50.0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = HeavyHitters.exact(lake, "tok", k = 63, denom = 50.0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want)
      assert(got.nonEmpty, "degenerate fixture")
      val st = StreamingHeavyHitters.readState(s, dir).get
      assert(st.n == rows.size.toLong)
      assert(st.summary.size <= 63, s"state exceeded k: ${st.summary.size}")
    } finally cleanup(dir)
  }

  test("redelivered batches no-op (exactly-once under restart)") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val b0 = Seq.fill(10)("a").toDF("tok")
      StreamingHeavyHitters.applyBatch(b0, "tok", 0L, k = 8, dir)
      StreamingHeavyHitters.applyBatch(b0, "tok", 0L, k = 8, dir) // replay
      val st = StreamingHeavyHitters.readState(s, dir).get
      assert(st.n == 10L, s"replay double-counted: n=${st.n}")
      assert(st.summary == Map("a" -> 10L))
    } finally cleanup(dir)
  }

  test("real stream wiring: foreachBatch via MemoryStream matches batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmp()
    val ckpt = tmp()
    try {
      val mem = MemoryStream[String]
      val q = StreamingHeavyHitters.start(
        mem.toDF().toDF("tok"), "tok", k = 15, dir, ckpt)
      try {
        mem.addData(Seq.fill(40)("x") ++ (1 to 30).map(i => s"r_$i"): _*)
        q.processAllAvailable()
        mem.addData(Seq.fill(25)("y") ++ Seq.fill(10)("x"): _*)
        q.processAllAvailable()
      } finally q.stop()
      val lake = (Seq.fill(40)("x") ++ (1 to 30).map(i => s"r_$i") ++
        Seq.fill(25)("y") ++ Seq.fill(10)("x")).toDF("tok")
      val got = StreamingHeavyHitters.exactOverLake(lake, "tok", dir, 4.0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = HeavyHitters.exact(lake, "tok", k = 15, denom = 4.0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want)
      assert(got == Set(("x", 50L))) // n=105, threshold 26.25 -> only x
    } finally { cleanup(dir); cleanup(ckpt) }
  }

  test("denom outside the persisted-k guarantee window is rejected") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val b0 = Seq("a", "b", "a").toDF("tok")
      StreamingHeavyHitters.applyBatch(b0, "tok", 0L, k = 8, dir)
      val st = StreamingHeavyHitters.readState(s, dir).get
      assert(st.k == 8, "k not persisted with the state marker")
      // denom >= k+1 would silently return an incomplete set — must fail
      // loudly, mirroring HeavyHitters.exact's require
      intercept[IllegalArgumentException] {
        StreamingHeavyHitters.exactOverLake(b0, "tok", dir, denom = 9.0)
      }
      // in-window denom still answers
      assert(StreamingHeavyHitters.exactOverLake(b0, "tok", dir, denom = 2.0)
        .collect().map(_.getString(0)).toSet == Set("a"))
      // continuing the state under a different k voids the MG merge — reject
      intercept[IllegalArgumentException] {
        StreamingHeavyHitters.applyBatch(b0, "tok", 1L, k = 4, dir)
      }
    } finally cleanup(dir)
  }

  test("a pre-k (2-field) marker reads as unknown k without crashing") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val b0 = Seq("a", "a", "b").toDF("tok")
      StreamingHeavyHitters.applyBatch(b0, "tok", 0L, k = 4, dir)
      // simulate a state written before k persistence
      val (applied, n, _) = StreamingHeavyHitters.marker(dir)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_current"),
        s"$applied $n".getBytes("UTF-8"))
      val st = StreamingHeavyHitters.readState(s, dir).get
      assert(st.k == -1 && st.n == 3L)
      // unknown k: the denom guard relaxes, the answer still computes
      assert(StreamingHeavyHitters.exactOverLake(b0, "tok", dir, 2.0)
        .collect().map(_.getString(0)).toSet == Set("a"))
      // and the stream can continue (guard relaxes on kPrev = -1) —
      // but the unknown-k sentinel PROPAGATES: the history was never
      // provably bounded by the caller's k, so the state must not
      // start claiming it was
      StreamingHeavyHitters.applyBatch(b0, "tok", 1L, k = 4, dir)
      assert(StreamingHeavyHitters.readState(s, dir).get.k == -1)
    } finally cleanup(dir)
  }

  test("empty state answers empty; empty batch publishes readable state") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    try {
      val lake = Seq("a", "b").toDF("tok")
      assert(StreamingHeavyHitters.exactOverLake(lake, "tok", dir, 2.0)
        .collect().isEmpty)
      StreamingHeavyHitters.applyBatch(
        Seq.empty[String].toDF("tok"), "tok", 0L, k = 4, dir)
      val st = StreamingHeavyHitters.readState(s, dir).get
      assert(st.n == 0L && st.summary.isEmpty)
    } finally cleanup(dir)
  }
}
