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

  test("four factors + TS% derived from running shooting sums when present") {
    val s = spark
    import s.implicits._
    val names = Seq("team_points", "opp_points", "team_poss", "opp_poss",
      "game_minutes",
      "team_fga", "team_fgm", "team_fg3m", "team_fta", "team_ftm",
      "team_tov", "team_oreb", "team_dreb",
      "opp_fga", "opp_fgm", "opp_fg3m", "opp_fta", "opp_ftm",
      "opp_tov", "opp_oreb", "opp_dreb")
    // day 1: 60 fga (24 made, 6 threes), 20 fta (15 made), 12 tov,
    //        10 oreb, 22 dreb; opp: 55/20/4, 18/12, 14 tov, 8 oreb, 24 dreb
    val rows = Seq(
      (1L, "2025-01-01T19:00:00", Seq(69.0, 62.0, 70.0, 70.0, 40.0,
        60.0, 24.0, 6.0, 20.0, 15.0, 12.0, 10.0, 22.0,
        55.0, 20.0, 4.0, 18.0, 12.0, 14.0, 8.0, 24.0)),
      (1L, "2025-01-03T19:00:00", Seq(80.0, 70.0, 72.0, 72.0, 40.0,
        62.0, 30.0, 8.0, 16.0, 12.0, 10.0, 12.0, 20.0,
        58.0, 26.0, 6.0, 14.0, 10.0, 11.0, 9.0, 21.0)))
    val gameTeams = names.zipWithIndex.foldLeft(
      rows.toDF("teamid", "startdate", "vals")) { case (df, (n, i)) =>
        df.withColumn(n, col("vals").getItem(i))
      }.drop("vals")
    val out = DailyRollup.build(gameTeams)
    val last = out.filter(col("teamid") === 1L && col("date") === "2025-01-03").head()
    // cumulative sums: fga 122, fgm 54, fg3m 14, fta 36, tov 22,
    // oreb 22, opp_dreb 45
    assert(math.abs(last.getAs[Double]("team_efg_pct")
      - (54.0 + 0.5 * 14.0) / 122.0) < 1e-9)
    assert(math.abs(last.getAs[Double]("team_ts_pct")
      - 149.0 / (2.0 * (122.0 + 0.44 * 36.0))) < 1e-9)
    assert(math.abs(last.getAs[Double]("team_ft_rate") - 36.0 / 122.0) < 1e-9)
    assert(math.abs(last.getAs[Double]("team_tov_ratio") - 22.0 / 142.0) < 1e-9)
    assert(math.abs(last.getAs[Double]("team_oreb_pct")
      - 22.0 / (22.0 + 45.0)) < 1e-9)
    assert(math.abs(last.getAs[Double]("opp_tov_ratio") - 25.0 / 142.0) < 1e-9)
    assert(math.abs(last.getAs[Double]("team_points_per_poss") - 149.0 / 142.0) < 1e-9)

    // without shooting inputs the ratios are null, not zero
    val bare = DailyRollup.build(gameTeams.select("teamid", "startdate",
      "team_points", "opp_points", "team_poss", "opp_poss", "game_minutes"))
      .filter(col("teamid") === 1L && col("date") === "2025-01-03").head()
    assert(bare.isNullAt(bare.fieldIndex("team_efg_pct")))
    assert(bare.isNullAt(bare.fieldIndex("team_oreb_pct")))
  }

  test("fromGameTeamStats chains box stats into the rollup with the opp mirror") {
    val s = spark
    import s.implicits._
    // GameTeamStats.build output shape (one row per game-team)
    val stats = Seq(
      (10L, 1L, 75.0, 70.0, 40.0, 60L, 28L, 7L, 18L, 12L, 11L, 9L, 23L),
      (10L, 2L, 68.0, 69.0, 40.0, 58L, 25L, 5L, 20L, 13L, 13L, 8L, 25L),
      (11L, 1L, 81.0, 71.0, 45.0, 63L, 30L, 9L, 15L, 11L, 10L, 11L, 22L),
      (11L, 3L, 77.0, 70.0, 45.0, 61L, 29L, 6L, 17L, 12L, 12L, 10L, 20L))
      .toDF("gameId", "teamId", "pts", "possessions_formula", "game_minutes",
        "fga", "fgm", "fg3m", "fta", "ftm", "tov", "oreb", "dreb")
    val dates = Seq((10L, "2025-01-01T19:00:00"), (11L, "2025-01-03T19:00:00"))
      .toDF("gameId", "startDate")

    val flat = DailyRollup.fromGameTeamStats(stats, dates)
    // team 1's game-10 row mirrors team 2's line as opp_*
    val r = flat.filter(col("teamid") === 1L && col("gameId") === 10L).head()
    assert(r.getAs[Double]("opp_points") == 68.0)
    assert(r.getAs[Long]("opp_fga") == 58L && r.getAs[Long]("opp_dreb") == 25L)

    val rollup = DailyRollup.build(flat)
    val last = rollup.filter(col("teamid") === 1L && col("date") === "2025-01-03").head()
    assert(last.getAs[Long]("games_played") == 2L)
    assert(last.getAs[Double]("team_points_total") == 156.0)
    // oreb_pct over both games: (9+11)/((9+11)+(25+20))
    assert(math.abs(last.getAs[Double]("team_oreb_pct") - 20.0 / 65.0) < 1e-9)
    // and the rollup row feeds the gold season summary reader names
    Seq("team_points_per_game", "team_efg_pct", "team_tov_ratio",
      "team_oreb_pct", "team_ft_rate", "pace")
      .foreach(c => assert(!last.isNullAt(last.fieldIndex(c)), s"$c present"))
  }

  test("sweep orders configs by MAE") {
    val ranked = graft.ratings.Backtest.sweep(Seq(10.0, 5.0, 20.0))(hl => hl)
    assert(ranked.map(_._1) == Seq(5.0, 10.0, 20.0))
  }
}
