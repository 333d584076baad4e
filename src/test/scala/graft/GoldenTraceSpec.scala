package graft

import org.apache.spark.sql.types._
import graft.pbp.PossessionEngine
import graft.pbp.PossessionEngine.Play

/** Full-game golden-trace differential for the possession engine: five
  * HAND-TRACED games (src/test/resources/golden_pbp/) covering every
  * state-machine rule in combination — and-1 with 1/2/3-FT sequences, a
  * missed last FT, a same-clock-only foul window, first-possession FT,
  * period reset clearing pending offense, def-rebound hand-off chains,
  * null-team plays mid-possession, null seconds sorting last, scrambled
  * input order, and every garbage-time margin/clock boundary. The
  * expected file was traced by hand from the reference's rules
  * (build_pbp_plays_enriched.py:106-276), not dumped from the engine,
  * so it is an oracle for the full chain, not a change detector. The
  * per-rule scenario specs remain in PossessionEngineSpec; this asserts
  * whole-game traces bit-for-bit through the DISTRIBUTED enrich path.
  */
class GoldenTraceSpec extends SparkSpec {

  private val playsSchema = StructType(Seq(
    StructField("id", LongType), StructField("gameId", LongType),
    StructField("teamId", LongType), StructField("opponentId", LongType),
    StructField("period", IntegerType),
    StructField("secondsRemaining", LongType),
    StructField("playType", StringType), StructField("playText", StringType),
    StructField("scoringPlay", BooleanType),
    StructField("shootingPlay", BooleanType),
    StructField("scoreValue", DoubleType),
    StructField("homeScore", LongType), StructField("awayScore", LongType),
    StructField("isHomeTeam", BooleanType)))

  private val expectedSchema = StructType(Seq(
    StructField("id", LongType), StructField("gameId", LongType),
    StructField("possession_id", LongType),
    StructField("offense_team_id", LongType),
    StructField("defense_team_id", LongType),
    StructField("possession_end", BooleanType),
    StructField("garbage_time", BooleanType)))

  private def res(name: String): String =
    getClass.getResource(s"/golden_pbp/$name").getPath

  test("five hand-traced games match the engine bit-for-bit, end to end") {
    val s = spark
    import s.implicits._
    val plays = s.read.schema(playsSchema)
      .option("header", "true").option("nullValue", "")
      .csv(res("plays.csv")).as[Play]

    val out = PossessionEngine.enrich(plays).collect()
    assert(out.length == 57)

    val got = out.map(e => e.id ->
      ((e.gameId, e.possession_id, e.offense_team_id, e.defense_team_id,
        e.possession_end, e.garbage_time))).toMap
    val want = s.read.schema(expectedSchema)
      .option("header", "true").option("nullValue", "")
      .csv(res("expected.csv")).collect()
      .map { r =>
        def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), optL(3), optL(4),
          r.getBoolean(5), r.getBoolean(6)))
      }.toMap

    assert(got.keySet == want.keySet)
    val diffs = want.keys.toSeq.sorted.filter(id => got(id) != want(id))
    assert(diffs.isEmpty, diffs.map(id =>
      s"play $id: engine=${got(id)} expected=${want(id)}").mkString("\n"))
  }

  test("per-game possession counts match the hand trace") {
    val s = spark
    import s.implicits._
    val plays = s.read.schema(playsSchema)
      .option("header", "true").option("nullValue", "")
      .csv(res("plays.csv")).as[Play]
    val counts = PossessionEngine.enrich(plays).collect()
      .groupBy(_.gameId).map { case (g, es) => g -> es.map(_.possession_id).max }
    assert(counts == Map(1L -> 7L, 2L -> 5L, 3L -> 3L, 4L -> 8L, 5L -> 4L))
  }
}
