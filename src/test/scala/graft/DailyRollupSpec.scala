package graft

import org.apache.spark.sql.functions._
import graft.rollup.DailyRollup

class DailyRollupSpec extends SparkSpec {

  test("dense calendar: one row per team per day, cumulative totals carry over idle days") {
    val s = spark
    import s.implicits._
    val gameTeams = Seq(
      // teamid, startdate, team_points, opp_points, team_poss, opp_poss, minutes
      (1L, "2025-01-01T19:00:00", 80.0, 70.0, 70.0, 70.0, 40.0),
      (1L, "2025-01-04T19:00:00", 90.0, 60.0, 72.0, 72.0, 40.0),
      (2L, "2025-01-02T19:00:00", 65.0, 75.0, 68.0, 68.0, 45.0))
      .toDF("teamid", "startdate", "team_points", "opp_points",
        "team_poss", "opp_poss", "game_minutes")
    val out = DailyRollup.build(gameTeams)

    // calendar Jan 1..4 x 2 teams = 8 rows
    assert(out.count() == 8)
    val t1 = out.filter(col("teamid") === 1L).orderBy(col("date"))
      .collect().map(r => r.getAs[java.sql.Date]("date").toString -> r).toMap

    // idle day Jan 2: totals unchanged from Jan 1
    assert(t1("2025-01-02").getAs[Long]("games_played") == 1L)
    assert(t1("2025-01-02").getAs[Double]("team_points_total") == 80.0)
    // after game 2 on Jan 4
    assert(t1("2025-01-04").getAs[Long]("games_played") == 2L)
    assert(t1("2025-01-04").getAs[Double]("team_points_total") == 170.0)
    assert(math.abs(t1("2025-01-04").getAs[Double]("team_points_per_game") - 85.0) < 1e-9)
    assert(math.abs(t1("2025-01-04").getAs[Double]("off_eff")
      - 170.0 / 142.0 * 100.0) < 1e-9)
    // pace = per-game possession average on a 40-min basis: the games
    // factor cancels to ((tposs+oposs)/2)·(40/total_mins) — after two
    // 40-min games averaging 71 possessions, pace must be ~71, NOT ~142
    assert(math.abs(t1("2025-01-04").getAs[Double]("pace")
      - (142.0 + 142.0) / 2.0 * 40.0 / 80.0) < 1e-9)

    // team 2 before its first game: zero rows still emitted with 0 games
    val t2d1 = out.filter(col("teamid") === 2L && col("date") === "2025-01-01").head()
    assert(t2d1.getAs[Long]("games_played") == 0L)
    assert(t2d1.isNullAt(t2d1.fieldIndex("team_points_per_game")))
  }

  test("sweep orders configs by MAE") {
    val ranked = graft.ratings.Backtest.sweep(Seq(10.0, 5.0, 20.0))(hl => hl)
    assert(ranked.map(_._1) == Seq(5.0, 10.0, 20.0))
  }
}
