package graft

import graft.operators.Sessionize
import graft.operators.Sessionize.Ev

class SessionizeSpec extends SparkSpec {

  private def run(evs: Seq[Ev], gapMs: Long = 1000L) = {
    val s = spark
    import s.implicits._
    Sessionize.sessionize(evs.toDS(), gapMs).collect()
      .sortBy(x => (x.user_id, x.session_id))
  }

  test("splits at gaps strictly greater than the threshold") {
    val out = run(Seq(
      Ev(1, 10, 0, 1.0),
      Ev(1, 11, 1000, 2.0),   // gap == 1000 -> same session (not >)
      Ev(1, 12, 2001, 3.0),   // gap 1001 -> new session
      Ev(1, 13, 2500, 4.0)))
    assert(out.map(_.session_id).toSeq == Seq(1L, 2L))
    assert(out(0).n_events == 2 && out(1).n_events == 2)
    assert(out(0).session_value == 3.0 && out(1).session_value == 7.0)
    assert(out(0).duration_ms == 1000 && out(1).duration_ms == 499)
  }

  test("single event forms a single session with zero duration") {
    val out = run(Seq(Ev(7, 42, 12345, 9.5)))
    assert(out.length == 1)
    val s0 = out.head
    assert(s0.session_id == 1 && s0.n_events == 1 &&
      s0.first_event_id == 42 && s0.last_event_id == 42 &&
      s0.duration_ms == 0 && s0.session_value == 9.5)
  }

  test("users are independent; out-of-order input is sorted per user") {
    val out = run(Seq(
      Ev(2, 21, 5000, 1.0),
      Ev(1, 12, 3000, 1.0), // arrives before user 1's first event
      Ev(1, 11, 0, 1.0),
      Ev(2, 22, 5500, 1.0)))
    val u1 = out.filter(_.user_id == 1)
    val u2 = out.filter(_.user_id == 2)
    assert(u1.map(_.session_id).toSeq == Seq(1L, 2L)) // 3000ms gap splits
    assert(u2.map(_.session_id).toSeq == Seq(1L))
    assert(u1(0).first_event_id == 11 && u1(1).first_event_id == 12)
  }

  test("same-ms events keep one session and permutation-invariant stats") {
    val out = run(Seq(Ev(3, 32, 100, 2.0), Ev(3, 31, 100, 1.0)))
    assert(out.length == 1)
    assert(out.head.n_events == 2 && out.head.first_event_id == 31 &&
      out.head.last_event_id == 32 && out.head.session_value == 3.0)
  }

  test("streaming sessionizer closed sessions match the batch operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = Seq(
      graft.streaming.EventStream.Ev(1, 10, 0, 1.0),
      graft.streaming.EventStream.Ev(1, 11, 500, 2.0),
      graft.streaming.EventStream.Ev(1, 12, 9000, 3.0),  // closes session 1
      graft.streaming.EventStream.Ev(2, 20, 100, 4.0),
      graft.streaming.EventStream.Ev(2, 21, 20000, 5.0)) // closes user 2's s1
    val mem = MemoryStream[graft.streaming.EventStream.Ev]
    mem.addData(evs: _*)
    val q = graft.streaming.EventStream
      .sessionizeStream(mem.toDS(), gapMs = 1000L, useTimeout = false)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = s.table("sess_parity")
      .as[graft.streaming.EventStream.SessionOut].collect()
      .map(x => (x.user_id, x.session_id, x.n_events, x.first_event_id,
        x.last_event_id, x.duration_ms, x.session_value)).toSet
    q.stop()
    val batch = Sessionize.sessionize(
        evs.map(e => Ev(e.user_id, e.event_id, e.ms, e.value)).toDS(), 1000L)
      .collect()
      .map(x => (x.user_id, x.session_id, x.n_events, x.first_event_id,
        x.last_event_id, x.duration_ms, x.session_value)).toSet
    // streaming emits only CLOSED sessions; batch emits all — the
    // streamed set must be exactly the batch set minus open sessions
    assert(streamed.subsetOf(batch))
    assert(streamed.map(t => (t._1, t._2)) ==
      Set((1L, 1L), (2L, 1L))) // one closed session per user
  }

  test("matches the SQL window formulation on the sf0.001 events table") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val stateful = graft.SparkEntry.queries("w06b_sessionize_stateful")(s, d)
    val sql = graft.SparkEntry.queries("w06_sessionize")(s, d)
    assert(stateful.count() == sql.count())
    assert(stateful.except(sql).isEmpty && sql.except(stateful).isEmpty)
  }
}
