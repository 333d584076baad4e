package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Ev

/** Structured-Streaming semantics: the same transform produces the same
  * result via readStream (MemoryStream) as via a batch DataFrame, and
  * the stateful sessionizer emits gap-closed sessions incrementally. */
class EventStreamSpec extends SparkSpec {

  test("windowAgg over a stream (complete mode) equals the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      ("2024-01-01 01:00:00", "click", 1.0),
      ("2024-01-01 02:30:00", "click", 2.0),
      ("2024-01-01 07:00:00", "view", 3.0),
      ("2024-01-01 11:59:59", "view", 4.5),
      ("2024-01-02 00:00:00", "click", 1.5))
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(to_timestamp(col("_1")).as("ts"), col("_2").as("event_type"),
        col("_3").as("value"))

    val batch = EventStream.windowAgg(toDf(rows.toDF())).collect().toSet

    val mem = MemoryStream[(String, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.windowAgg(toDf(mem.toDF()))
      .writeStream.format("memory").queryName("wagg")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("wagg").collect().toSet
    q.stop()
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("hoppingWindowAgg: every event lands in width/slide windows; stream equals batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      ("2024-01-01 01:00:00", "click", 1.0),  // windows starting 21:00(-1d) and 00:00
      ("2024-01-01 04:30:00", "click", 2.0),  // 00:00 and 03:00
      ("2024-01-01 07:00:00", "view", 3.0))   // 03:00 and 06:00
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(to_timestamp(col("_1")).as("ts"), col("_2").as("event_type"),
        col("_3").as("value"))

    val batch = EventStream.hoppingWindowAgg(toDf(rows.toDF()), "6 hours", "3 hours")
      .select(col("w.start").cast("long").as("ws"), col("event_type"),
        col("n"), col("total")).collect().toSet
    // width/slide = 2 windows per event -> 6 memberships; the two
    // clicks share the 00:00 window -> 5 (window, type) groups
    assert(batch.size == 5)
    assert(batch.exists { r => r.getLong(2) == 2L }) // the shared window

    val mem = MemoryStream[(String, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.hoppingWindowAgg(toDf(mem.toDF()), "6 hours", "3 hours")
      .select(col("w.start").cast("long").as("ws"), col("event_type"),
        col("n"), col("total"))
      .writeStream.format("memory").queryName("hwagg")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("hwagg").collect().toSet
    q.stop()
    assert(streamed == batch)
  }

  test("sessionWindowAgg boundary: exact-gap successor MERGES (same as w06's > gap); gap+1s splits") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // user 1: 00:00, then EXACTLY +30:00 (inclusive boundary -> same
      // session, empirically pinned), then +30:01 after that -> NEW session
      (1L, 10L, "2024-01-01 00:00:00", 1.0),
      (1L, 11L, "2024-01-01 00:30:00", 2.0),
      (1L, 12L, "2024-01-01 01:00:01", 4.0),
      // user 2: one lone event
      (2L, 20L, "2024-01-01 05:00:00", 8.0))
    val df = rows.toDF("user_id", "event_id", "_ts", "value")
      .select(col("user_id"), col("event_id"), to_timestamp(col("_ts")).as("ts"),
        col("value"))
    val out = EventStream.sessionWindowAgg(df, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq == Seq(
      (1L, "2024-01-01 00:00:00", 2L),
      (1L, "2024-01-01 01:00:01", 1L),
      (2L, "2024-01-01 05:00:00", 1L)))
  }

  test("sessionWindowAgg over a stream (complete mode) equals the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.0),
      (1L, 11L, "2024-01-01 00:10:00", 2.0),
      (1L, 12L, "2024-01-01 02:00:00", 4.0),
      (2L, 20L, "2024-01-01 05:00:00", 8.0),
      (2L, 21L, "2024-01-01 05:20:00", 0.5))
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_id"),
        to_timestamp(col("_3")).as("ts"), col("_4").as("value"))

    val batch = EventStream.sessionWindowAgg(toDf(rows.toDF())).collect().toSet

    val mem = MemoryStream[(Long, Long, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.sessionWindowAgg(toDf(mem.toDF()))
      .writeStream.format("memory").queryName("swagg")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("swagg").collect().toSet
    q.stop()
    assert(streamed == batch)
    assert(batch.size == 3)
  }

  test("enrich over a stream joins the static dim per micro-batch, equal to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "HOME")).toDF("user_id", "segment")
    val rows = Seq((1L, "click", 1.0), (2L, "view", 2.0), (1L, "view", 3.0),
      (3L, "click", 9.0)) // user 3 has no dim row -> dropped by the inner join
    def agg(df: org.apache.spark.sql.DataFrame) =
      EventStream.enrich(df, dim, "user_id")
        .groupBy(col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_type"),
        col("_3").as("value"))

    val batch = agg(toDf(rows.toDF())).collect().toSet
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows: _*)
    val q = agg(toDf(mem.toDF()))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("enrich").collect().toSet
    q.stop()
    assert(streamed == batch)
    // segment is column 0 of the agg output; a left-join regression
    // would surface user 3 with a null segment
    assert(batch.size == 3 && !batch.exists(_.isNullAt(0)))
  }

  test("file-source stream: windowAggStreaming over NDJSON files arriving in a directory") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$dir/in"; new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, String, Double)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/$name"),
        rows.map { case (ts, et, v) =>
          s"""{"ts": "$ts", "event_type": "$et", "value": $v}"""
        }.mkString("", "\n", "\n"))
    writeBatch("b1.json", Seq(
      ("2024-01-01 01:00:00", "click", 1.0),
      ("2024-01-01 02:00:00", "click", 2.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = s.readStream.schema(schema).json(inDir)
    val q = EventStream.windowAgg(stream)
      .writeStream.format("memory").queryName("fwagg")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("complete").start()
    q.processAllAvailable()
    assert(s.table("fwagg").collect().map(r =>
      (r.getString(0), r.getLong(2))).toSet == Set(("2024-01-01 00:00", 2L)))
    // a late-arriving file lands in an existing AND a new window
    writeBatch("b2.json", Seq(
      ("2024-01-01 03:00:00", "click", 4.0),
      ("2024-01-01 07:00:00", "view", 8.0)))
    q.processAllAvailable()
    val after = s.table("fwagg").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    q.stop()
    assert(after(("2024-01-01 00:00", "click")) == ((3L, 7.0)))
    assert(after(("2024-01-01 06:00", "view")) == ((1L, 8.0)))
  }

  test("dedupStream drops redelivered events; state bounded by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, "2024-01-01 01:00:00", "click", 1.0),
      (2L, "2024-01-01 01:05:00", "view", 2.0),
      (1L, "2024-01-01 01:00:00", "click", 1.0), // redelivery of event 1
      (3L, "2024-01-01 02:00:00", "click", 3.0),
      (2L, "2024-01-01 01:05:00", "view", 2.0)) // redelivery of event 2
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("event_id"), to_timestamp(col("_2")).as("ts"),
        col("_3").as("event_type"), col("_4").as("value"))

    val batch = EventStream.dedupBatch(toDf(rows.toDF()), Seq("event_id"))
      .collect().toSet

    val mem = MemoryStream[(Long, String, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.dedupStream(toDf(mem.toDF()), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("dedup").collect().toSet
    q.stop()
    assert(streamed == batch)
    assert(streamed.size == 3)
  }

  test("intervalJoin over two watermarked streams equals the batch join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = Seq(
      (1L, 100L, "2024-01-01 01:00:00"),
      (1L, 101L, "2024-01-01 03:00:00"),
      (2L, 102L, "2024-01-01 01:00:00"))
    val clicks = Seq(
      (1L, 200L, "2024-01-01 01:30:00"), // within 1h of view 100
      (1L, 201L, "2024-01-01 02:30:00"), // matches neither (>1h after 100, before 101)
      (1L, 202L, "2024-01-01 03:59:00"), // within 1h of view 101
      (2L, 203L, "2024-01-01 00:30:00")) // before the view -> no match
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_id"),
        to_timestamp(col("_3")).as("ts"))
    def out(j: org.apache.spark.sql.DataFrame) =
      j.select(col("l.event_id").as("view_id"), col("r.event_id").as("click_id"))

    val batch = out(EventStream.intervalJoin(
      toDf(views.toDF()), toDf(clicks.toDF()))).collect().toSet

    val vMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, Long, String)]
    vMem.addData(views: _*)
    cMem.addData(clicks: _*)
    val joined = EventStream.intervalJoin(
      toDf(vMem.toDF()).withWatermark("ts", "2 hours"),
      toDf(cMem.toDF()).withWatermark("ts", "2 hours"))
    val q = out(joined).writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("ij").collect().toSet
    q.stop()
    assert(streamed == batch)
    assert(batch == Set(Row(100L, 200L), Row(101L, 202L)))
  }

  test("left-outer intervalJoin: unmatched views emit null-padded after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = Seq(
      (1L, 100L, "2024-01-01 01:00:00"),  // matched by click 200
      (1L, 101L, "2024-01-01 03:00:00"),  // matched by click 202
      (2L, 102L, "2024-01-01 01:00:00"))  // never matched -> null row
    val clicks = Seq(
      (1L, 200L, "2024-01-01 01:30:00"),
      (1L, 201L, "2024-01-01 02:30:00"),  // matches neither view
      (1L, 202L, "2024-01-01 03:59:00"),
      (2L, 203L, "2024-01-01 00:30:00"),  // before the view -> no match
      (99L, 999L, "2024-01-02 00:00:00")) // advances the watermark only
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_id"),
        to_timestamp(col("_3")).as("ts"))
    def out(j: org.apache.spark.sql.DataFrame) =
      j.select(col("l.event_id").as("view_id"), col("r.event_id").as("click_id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))

    val batch = out(EventStream.intervalJoinLeftOuter(
      toDf(views.toDF()), toDf(clicks.toDF()))).collect().map(key).toSet
    assert(batch == Set((100L, 200L), (101L, 202L), (102L, -1L)))

    val vMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, Long, String)]
    vMem.addData(views: _*)
    cMem.addData(clicks: _*)
    val joined = EventStream.intervalJoinLeftOuter(
      toDf(vMem.toDF()).withWatermark("ts", "1 minute"),
      toDf(cMem.toDF()).withWatermark("ts", "1 minute"))
    val q = out(joined).writeStream.format("memory").queryName("ijlo")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("ijlo").collect().map(key).toSet
    q.stop()
    assert(streamed == batch)
  }

  test("full-outer intervalJoin: unmatched rows on BOTH sides null-emit after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = Seq(
      (1L, 100L, "2024-01-01 01:00:00"),  // matched by click 200
      (1L, 101L, "2024-01-01 03:00:00"),  // matched by click 202
      (2L, 102L, "2024-01-01 01:00:00"))  // never matched -> (102, null)
    val clicks = Seq(
      (1L, 200L, "2024-01-01 01:30:00"),
      (1L, 201L, "2024-01-01 02:30:00"),  // matches neither view -> (null, 201)
      (1L, 202L, "2024-01-01 03:59:00"),
      (2L, 203L, "2024-01-01 00:30:00"),  // before the view -> (null, 203)
      (99L, 999L, "2024-01-02 00:00:00")) // no view at all -> (null, 999)
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_id"),
        to_timestamp(col("_3")).as("ts"))
    def out(j: org.apache.spark.sql.DataFrame) =
      j.select(col("l.event_id").as("view_id"), col("r.event_id").as("click_id"))
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))

    val batch = out(EventStream.intervalJoinFullOuter(
      toDf(views.toDF()), toDf(clicks.toDF()))).collect().map(key).toSet
    assert(batch == Set((100L, 200L), (101L, 202L), (102L, -1L),
      (-1L, 201L), (-1L, 203L), (-1L, 999L)))

    val vMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, Long, String)]
    vMem.addData(views: _*)
    cMem.addData(clicks: _*)
    val joined = EventStream.intervalJoinFullOuter(
      toDf(vMem.toDF()).withWatermark("ts", "1 minute"),
      toDf(cMem.toDF()).withWatermark("ts", "1 minute"))
    val q = out(joined).writeStream.format("memory").queryName("ijfo")
      .outputMode("append").start()
    q.processAllAvailable()
    // push the watermark past click 999 on BOTH sides so its null row
    // evicts (the pusher rows themselves stay in state, unemitted)
    vMem.addData((98L, 998L, "2024-01-03 00:00:00"))
    cMem.addData((97L, 997L, "2024-01-03 00:00:00"))
    q.processAllAvailable()
    val streamed = s.table("ijfo").collect().map(key).toSet
    q.stop()
    assert(streamed == batch)
  }

  test("left-semi intervalJoin: matched views emit once, no multiplication, stream equals batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = Seq(
      (1L, 100L, "2024-01-01 01:00:00"),  // TWO clicks in window -> emit ONCE
      (1L, 101L, "2024-01-01 03:00:00"),  // one click in window
      (2L, 102L, "2024-01-01 01:00:00"))  // click before the view -> no emit
    val clicks = Seq(
      (1L, 200L, "2024-01-01 01:30:00"),
      (1L, 201L, "2024-01-01 01:45:00"),  // second match for view 100
      (1L, 202L, "2024-01-01 03:59:00"),
      (2L, 203L, "2024-01-01 00:30:00"),
      (99L, 999L, "2024-01-02 00:00:00")) // advances the watermark only
    def toDf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("user_id"), col("_2").as("event_id"),
        to_timestamp(col("_3")).as("ts"))

    val batch = EventStream.intervalJoinLeftSemi(
        toDf(views.toDF()), toDf(clicks.toDF()))
      .select(col("l.event_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(batch == Seq(100L, 101L)) // once each, 102 absent

    val vMem = MemoryStream[(Long, Long, String)]
    val cMem = MemoryStream[(Long, Long, String)]
    vMem.addData(views: _*)
    cMem.addData(clicks: _*)
    val joined = EventStream.intervalJoinLeftSemi(
      toDf(vMem.toDF()).withWatermark("ts", "1 minute"),
      toDf(cMem.toDF()).withWatermark("ts", "1 minute"))
    val q = joined.select(col("l.event_id")).writeStream.format("memory")
      .queryName("ijls").outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("ijls").collect().map(_.getLong(0)).toSeq.sorted
    q.stop()
    assert(streamed == batch)
  }

  test("sessionizeStream emits sessions closed by a gap within the stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // NoTimeout in-test: processing-time timeouts schedule perpetual
    // no-data batches that keep processAllAvailable from returning
    val q = EventStream.sessionizeStream(mem.toDS(), gapMs = 1000L, useTimeout = false)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // one user: events 0..500ms, then a 5s jump -> first session closes
    mem.addData(Ev(1, 10, 0, 1.0), Ev(1, 11, 500, 2.0), Ev(1, 12, 6000, 3.0))
    q.processAllAvailable()
    val out = s.table("sess").as[EventStream.SessionOut].collect()
    q.stop()
    assert(out.length == 1)
    val s0 = out.head
    assert(s0.user_id == 1 && s0.session_id == 1 && s0.n_events == 2 &&
      s0.first_event_id == 10 && s0.last_event_id == 11 &&
      s0.duration_ms == 500 && s0.session_value == 3.0)
    // the open session (event 12) correctly stays in state, not emitted
  }
}
