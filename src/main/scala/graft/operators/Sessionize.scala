package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Gap-based sessionization as a typed stateful operator — the
  * possession-segmentation pattern of the reference
  * (/root/reference/scripts/build_pbp_plays_enriched.py:113-276, which
  * sorts each game's plays and runs a state machine), re-expressed as
  * `groupByKey(key).flatMapGroups` per SURVEY.md §2.5 W6.
  *
  * Scale design: one shuffle on the session key distributes state across
  * executors; per-key event streams are sorted in-memory inside the
  * group (bounded by per-user volume, not dataset volume). The SQL
  * window-function formulation (queries.Windows w06) is plan-equivalent
  * for plain gap splitting; this operator exists for the semantics a
  * window can't express (procedural lookahead, conditional state hand-off
  * — the reference's and-1/free-throw rules) and is parity-tested
  * against the SQL form where they overlap.
  */
object Sessionize {

  /** Input event: ms = epoch millis (µs-truncated upstream). */
  final case class Ev(user_id: Long, event_id: Long, ms: Long, value: Double)

  final case class Sess(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      first_event_id: Long,
      last_event_id: Long,
      duration_ms: Long,
      session_value: Double)

  /** Split each user's time-ordered events at gaps > gapMs; emit one row
    * per session. Aggregates are permutation-invariant within a session,
    * so (ms, event_id) ordering matches the SQL form's full-resolution
    * (ts, event_id) ordering on every output column. */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val evs = it.toArray.sortBy(e => (e.ms, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[Sess]()
      var sid = 0L
      var n = 0L
      var firstId = 0L; var lastId = 0L
      var minMs = 0L; var maxMs = 0L
      var sum = 0.0
      var prevMs = Long.MinValue
      def emit(): Unit = if (n > 0) {
        out += Sess(uid, sid, n, firstId, lastId, maxMs - minMs,
          BigDecimal(sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      evs.foreach { e =>
        if (prevMs == Long.MinValue || e.ms - prevMs > gapMs) {
          emit()
          sid += 1
          n = 0
          firstId = e.event_id; lastId = e.event_id
          minMs = e.ms; maxMs = e.ms
          sum = 0.0
        }
        n += 1
        firstId = math.min(firstId, e.event_id)
        lastId = math.max(lastId, e.event_id)
        minMs = math.min(minMs, e.ms)
        maxMs = math.max(maxMs, e.ms)
        sum += e.value
        prevMs = e.ms
      }
      emit()
      out.iterator
    }
  }
}
