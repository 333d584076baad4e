package graft

import graft.pbp.{GameTeamStats, PlayClassifier, PossessionEngine}
import graft.pbp.PossessionEngine.Play

/** Possession state-machine scenarios per FIXTURES.md §A3, mirroring the
  * reference's semantics (build_pbp_plays_enriched.py:113-276). */
class PossessionEngineSpec extends SparkSpec {

  private val cls = new PlayClassifier()
  private val T1 = Some(1L)
  private val T2 = Some(2L)

  private var nextId = 0L
  private def play(team: Option[Long], period: Int, sec: Long, pt: String,
      scoring: Boolean = false, value: Option[Double] = None,
      hs: Long = 0, as: Long = 0): Play = {
    nextId += 1
    Play(nextId, 7L, team, team.map(t => if (t == 1L) 2L else 1L),
      Some(period), Some(sec), Some(pt), None, scoring, None, value,
      Some(hs), Some(as), team.map(_ == 1L))
  }

  private def enrich(ps: Seq[Play]) = PossessionEngine.enrichGame(ps, cls)

  test("scenario 1: made FG ends possession; opponent takes the next one") {
    val out = enrich(Seq(
      play(T1, 1, 1180, "JumpShot", scoring = true, value = Some(2.0)),
      play(T2, 1, 1160, "LayUpShot", scoring = true, value = Some(2.0)),
      play(T1, 1, 1140, "JumpShot", scoring = false)))
    assert(out.map(_.possession_id) == Seq(1L, 2L, 3L))
    assert(out(0).possession_end && out(1).possession_end)
    assert(out(0).offense_team_id == T1)
    assert(out(1).offense_team_id == T2)
    assert(!out(2).possession_end) // missed FG alone doesn't end it
  }

  test("scenario 2: def rebound ends possession and rebounder gets the next") {
    val out = enrich(Seq(
      play(T1, 1, 1180, "JumpShot", scoring = false),
      play(T2, 1, 1178, "Defensive Rebound"),
      play(T2, 1, 1160, "DunkShot", scoring = true, value = Some(2.0)),
      play(T1, 1, 1150, "Lost Ball Turnover"),
      play(T2, 1, 1140, "JumpShot", scoring = false),
      play(T1, 1, 1138, "Defensive Rebound")))
    // poss 1: T1 shot + T2 dreb; poss 2: T2 (rebounder); poss 3: T1 (after
    // T2's make, opponent flip); turnover ends it; poss 4: T2
    assert(out.map(_.possession_id) == Seq(1L, 1L, 2L, 3L, 4L, 4L))
    assert(out(1).possession_end) // dreb ends
    assert(out(2).offense_team_id == T2) // pending offense = rebounder
    assert(out(3).offense_team_id == T1)
    assert(out(3).possession_end) // turnover
    assert(out(4).offense_team_id == T2)
  }

  test("scenario 3: and-1 — made FG + same-clock foul + 1 FT: FG does NOT end, made FT does") {
    val out = enrich(Seq(
      play(T1, 1, 900, "DunkShot", scoring = true, value = Some(2.0)),
      play(T2, 1, 900, "PersonalFoul"),
      play(T1, 1, 900, "Made Free Throw", scoring = true, value = Some(1.0)),
      play(T2, 1, 880, "JumpShot", scoring = true, value = Some(2.0))))
    assert(!out(0).possession_end) // and-1 suppresses the make's end
    assert(!out(1).possession_end)
    assert(out(2).possession_end)  // last made FT ends
    assert(out.map(_.possession_id) == Seq(1L, 1L, 1L, 2L))
    assert(out(3).offense_team_id == T2)
  }

  test("scenario 4: missed three + foul -> 3 FTs; only the last made FT ends") {
    val out = enrich(Seq(
      play(T1, 1, 700, "Three Point Jump Shot", scoring = false, value = Some(3.0)),
      play(T2, 1, 700, "Shooting Foul"),
      play(T1, 1, 700, "Free Throw 1 of 3", scoring = true, value = Some(1.0)),
      play(T1, 1, 700, "Free Throw 2 of 3", scoring = false, value = Some(1.0)),
      play(T1, 1, 700, "Free Throw 3 of 3", scoring = true, value = Some(1.0)),
      play(T2, 1, 680, "JumpShot", scoring = false)))
    assert(!out(0).possession_end)
    assert(!out(2).possession_end && !out(3).possession_end)
    assert(out(4).possession_end) // 3rd FT, made
    assert(out.map(_.possession_id) == Seq(1L, 1L, 1L, 1L, 1L, 2L))
  }

  test("scenario 5: period boundary force-ends the previous possession and resets") {
    val out = enrich(Seq(
      play(T1, 1, 30, "JumpShot", scoring = false),
      play(T2, 2, 1200, "LayUpShot", scoring = true, value = Some(2.0)),
      play(T1, 2, 1180, "JumpShot", scoring = false)))
    assert(out(0).possession_end) // forced by period change
    assert(out(1).possession_id == 2L)
    assert(out(1).offense_team_id == T2) // reset, no pending carry-over
  }

  test("scenario 6: garbage-time flags per margin/clock thresholds") {
    val out = enrich(Seq(
      play(T1, 2, 700, "JumpShot", scoring = false, hs = 80, as = 55), // margin 25, >10min left: no
      play(T1, 2, 590, "JumpShot", scoring = false, hs = 80, as = 58), // margin 22, <=600s: yes
      play(T1, 2, 290, "JumpShot", scoring = false, hs = 80, as = 64), // margin 16, <=300s: yes
      play(T1, 2, 290, "JumpShot", scoring = false, hs = 80, as = 67), // margin 13: no
      play(T1, 1, 100, "JumpShot", scoring = false, hs = 40, as = 10))) // period 1: never
    assert(out.filter(_.period.contains(1)).forall(!_.garbage_time))
    val p2 = out.filter(_.period.contains(2)).sortBy(_.id)
    assert(p2.map(_.garbage_time) == Seq(false, true, true, false))
  }

  test("scenario 7: first-possession FT special case opens possession 1") {
    val out = enrich(Seq(
      play(T1, 1, 1190, "Technical Free Throw", scoring = true, value = Some(1.0)),
      play(T2, 1, 1170, "JumpShot", scoring = false)))
    assert(out(0).possession_id == 1L) // FT counts as action only at possession 0
    assert(out(0).offense_team_id == T1)
  }

  test("distributed enrich matches the pure per-game function") {
    val s = spark
    import s.implicits._
    nextId = 100
    val ps = Seq(
      play(T1, 1, 1180, "JumpShot", scoring = true, value = Some(2.0)),
      play(T2, 1, 1160, "Lost Ball Turnover"),
      play(T1, 1, 1100, "Three Point Jump Shot", scoring = true, value = Some(3.0)))
    val local = PossessionEngine.enrichGame(ps, cls)
    val dist = PossessionEngine.enrich(ps.toDS()).collect().sortBy(_.id).toSeq
    assert(dist == local)
  }

  test("garbage-removed variant: excluded plays drop from stats; minutes integrate the clock") {
    val s = spark
    import s.implicits._
    nextId = 300
    val ps = Seq(
      play(T1, 1, 1180, "JumpShot", scoring = true, value = Some(2.0), hs = 10, as = 8),
      play(T2, 1, 1160, "Lost Ball Turnover", hs = 10, as = 8),
      play(T1, 2, 700, "JumpShot", scoring = true, value = Some(2.0), hs = 80, as = 55), // margin 25, >600s: kept
      play(T1, 2, 590, "JumpShot", scoring = true, value = Some(2.0), hs = 80, as = 58), // garbage
      play(T2, 2, 550, "Lost Ball Turnover", hs = 80, as = 60),                          // garbage
      play(T1, 2, 500, "JumpShot", scoring = false, hs = 80, as = 65),                   // margin 15, >300s: kept
      play(T2, 2, 290, "JumpShot", scoring = true, value = Some(2.0), hs = 80, as = 64)) // garbage
    val enriched = PossessionEngine.enrich(ps.toDS()).toDF()
    def byTeam(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("teamId") -> r).toMap
    val full = byTeam(GameTeamStats.build(enriched))
    val clean = byTeam(GameTeamStats.build(enriched, excludeGarbage = true))

    assert(full(1L).getAs[Long]("fga") == 4L && clean(1L).getAs[Long]("fga") == 3L)
    assert(full(1L).getAs[Double]("pts") == 6.0 && clean(1L).getAs[Double]("pts") == 4.0)
    assert(full(2L).getAs[Long]("tov") == 2L && clean(2L).getAs[Long]("tov") == 1L)
    assert(full(2L).getAs[Double]("pts") == 2.0 && clean(2L).getAs[Double]("pts") == 0.0)
    // opponent context reflects the filtered table too
    assert(clean(2L).getAs[Double]("opp_pts") == 4.0)

    // clock integration (reference :301-314): period-2 distinct instants
    // 700(n) 590(g) 550(g) 500(n) 290(g) → 590-550 + 550-500 + 290-0 = 380 s
    val gm = GameTeamStats.garbageMinutes(enriched).collect()
    assert(gm.length == 1)
    assert(gm(0).getAs[Double]("garbage_time_minutes") == 380.0 / 60.0)
  }

  test("game-team stats: conditional aggs, possessions, opponent join, OT minutes") {
    val s = spark
    import s.implicits._
    nextId = 200
    val ps = Seq(
      play(T1, 1, 1180, "JumpShot", scoring = true, value = Some(2.0)),
      play(T2, 1, 1160, "JumpShot", scoring = false),
      play(T1, 1, 1158, "Defensive Rebound"),
      play(T1, 1, 1100, "Three Point Jump Shot", scoring = true, value = Some(3.0)),
      play(T2, 1, 1050, "Lost Ball Turnover"),
      play(T1, 3, 200, "Free Throw 1 of 1", scoring = true, value = Some(1.0)), // OT
      play(T2, 3, 100, "LayUpShot", scoring = true, value = Some(2.0)))
    val enriched = PossessionEngine.enrich(ps.toDS())
    val stats = GameTeamStats.build(enriched.toDF())
      .collect().map(r => r.getAs[Long]("teamId") -> r).toMap

    val t1 = stats(1L)
    assert(t1.getAs[Long]("fga") == 2L)   // FT is not a shot
    assert(t1.getAs[Long]("fgm") == 2L && t1.getAs[Long]("fg3m") == 1L)
    assert(t1.getAs[Long]("fta") == 1L && t1.getAs[Long]("ftm") == 1L)
    assert(t1.getAs[Long]("dreb") == 1L)
    assert(t1.getAs[Double]("pts") == 6.0)
    assert(t1.getAs[Double]("game_minutes") == 45.0) // one OT
    assert(t1.getAs[Long]("opponentId") == 2L)
    assert(stats(2L).getAs[Long]("tov") == 1L)
    assert(stats(2L).getAs[Double]("opp_pts") == 6.0)
    // event-possessions credit the OFFENSE: T1's two makes end T1
    // possessions; the dreb play ends T2's possession (offense = the
    // shooting team); a standalone made FT-1-of-1 ends nothing
    // (reference: only and-1-sequence last FTs end possessions)
    assert(t1.getAs[Long]("possessions_event") == 2L)
    assert(stats(2L).getAs[Long]("possessions_event") == 3L)
  }
}
