package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.gold._
import graft.ratings.IterativeRatings

/** Gold transforms over reference-shaped fixtures — scenarios mirror the
  * reference's own tests (/root/reference/tests/test_gold.py: labels
  * computed, spread flipped for away side, conference-game detection,
  * ATS calculations, W/L record, zero-division guards). */
class GoldSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  // --- fixtures (FIXTURES.md §A2: 3 teams, 3-game round robin) -------------

  private lazy val dimTeams = {
    val s = spark
    import s.implicits._
    Seq(
      (101L, "Duke", "ACC"),
      (102L, "UNC", "ACC"),
      (103L, "Kentucky", "SEC"),
      (104L, "Smallville", null.asInstanceOf[String])) // non-D1
      .toDF("teamId", "school", "conference")
  }

  private lazy val games = {
    val s = spark
    import s.implicits._
    Seq(
      // gameId, startDate, home, away, hs, as, neutral
      (1L, "2025-01-10T19:00:00", 101L, 102L, 80L, 70L, false), // Duke beats UNC (conf game)
      (2L, "2025-01-15T19:00:00", 102L, 103L, 65L, 75L, false), // Kentucky beats UNC
      (3L, "2025-01-20T19:00:00", 103L, 101L, 60L, 90L, true))  // Duke beats Kentucky (neutral)
      .toDF("gameId", "startDate", "homeTeamId", "awayTeamId",
        "homeScore", "awayScore", "neutralSite")
  }

  private lazy val lines = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "consensus", -5.5, 145.5, -200.0, 170.0),
      (1L, "zother", -6.0, 146.0, -210.0, 180.0), // 2nd provider, same game
      (2L, "consensus", 3.5, 140.5, 150.0, -180.0),
      (3L, "consensus", 7.5, 150.5, 250.0, -300.0))
      .toDF("gameId", "provider", "spread", "overUnder",
        "homeMoneyline", "awayMoneyline")
  }

  private lazy val adj = {
    val s = spark
    import s.implicits._
    Seq(
      (101L, "Duke", "ACC", 118.0, 92.0, 26.0),
      (102L, "UNC", "ACC", 110.0, 98.0, 12.0),
      (103L, "Kentucky", "SEC", 112.0, 95.0, 17.0))
      .toDF("teamid", "team", "conference", "offenserating",
        "defenserating", "netrating")
  }

  private lazy val srs = {
    val s = spark
    import s.implicits._
    Seq((101L, 2025, 20.0), (102L, 2025, 8.0), (103L, 2025, 12.0),
      (101L, 2024, 15.0)) // other season filtered out
      .toDF("teamId", "season", "rating")
  }

  private lazy val recruiting = {
    val s = spark
    import s.implicits._
    Seq(
      (9001L, 2025, 5L, 12L, 0.99, "DUKE"),     // case-insensitive school match
      (9002L, 2025, 4L, 40L, 0.92, "duke"),
      (9003L, 2025, 5L, 3L, 0.995, "Kentucky"),
      (9004L, 2025, 3L, 200L, 0.80, "Nowhere U")) // no dim match -> dropped
      .toDF("playerId", "season", "stars", "ranking", "rating", "committedTo")
  }

  // --- market_lines_analysis -----------------------------------------------

  test("market lines: ATS labels computed per reference semantics") {
    val out = MarketLinesAnalysis.build(lines, games, dimTeams, 2025)
    val rows = out.collect().map(r => (r.getAs[Long]("gameId"),
      r.getAs[String]("provider")) -> r).toMap
    assert(rows.size == 4) // inner join keeps all lines w/ outcomes, per provider

    val g1 = rows((1L, "consensus"))
    assert(g1.getAs[Long]("total_points") == 150L)
    assert(g1.getAs[Long]("home_margin") == 10L)
    assert(g1.getAs[Boolean]("home_win"))
    // ats_margin = margin + spread = 10 + (-5.5) = 4.5 -> covered
    assert(math.abs(g1.getAs[Double]("ats_margin") - 4.5) < 1e-9)
    assert(g1.getAs[Boolean]("home_covered"))
    // over: 150 > 145.5
    assert(g1.getAs[Boolean]("over_hit"))
    // spread_error = |margin - (-spread)| = |10 - 5.5| = 4.5
    assert(math.abs(g1.getAs[Double]("spread_error") - 4.5) < 1e-9)
    assert(g1.getAs[String]("home_team") == "Duke")
    assert(g1.getAs[String]("away_conference") == "ACC")
    assert(g1.getAs[String]("game_date") == "2025-01-10")

    val g2 = rows((2L, "consensus"))
    // margin = -10, spread 3.5 -> ats -6.5, not covered; total 140 < 140.5
    assert(!g2.getAs[Boolean]("home_covered"))
    assert(!g2.getAs[Boolean]("over_hit"))
  }

  // --- team_season_summary -------------------------------------------------

  private lazy val seasonRollup = {
    val s = spark
    import s.implicits._
    // teamid, ppg, opp_ppg, efg, opp_efg, tov, opp_tov, oreb, opp_oreb,
    // ftr, opp_ftr, pace — team 103 absent (null pass-throughs)
    Seq(
      (101L, 78.5, 66.25, 0.5625, 0.46875, 0.15625, 0.1875, 0.34375, 0.28125, 0.3125, 0.25, 68.75),
      (102L, 70.25, 74.5, 0.46875, 0.53125, 0.21875, 0.15625, 0.28125, 0.34375, 0.25, 0.3125, 71.5))
      .toDF("teamid", "team_points_per_game", "opp_points_per_game",
        "team_efg_pct", "opp_efg_pct", "team_tov_ratio", "opp_tov_ratio",
        "team_oreb_pct", "opp_oreb_pct", "team_ft_rate", "opp_ft_rate",
        "pace")
  }

  test("season summary: W/L + conference record + D1 restriction + recruiting") {
    val out = TeamSeasonSummary.build(games, dimTeams, adj, srs,
      seasonRollup, recruiting, 2025)
    val rows = out.collect().map(r => r.getAs[Long]("teamId") -> r).toMap
    assert(rows.keySet == Set(101L, 102L, 103L)) // D1 only (spine = adj)

    val duke = rows(101L)
    assert(duke.getAs[Long]("wins") == 2 && duke.getAs[Long]("losses") == 0)
    // only game 1 (Duke/UNC, both ACC) is a conference game
    assert(duke.getAs[Long]("conf_wins") == 1 && duke.getAs[Long]("conf_losses") == 0)
    assert(math.abs(duke.getAs[Double]("win_pct") - 1.0) < 1e-9)
    assert(math.abs(duke.getAs[Double]("conf_win_pct") - 1.0) < 1e-9)
    assert(duke.getAs[Double]("srs_rating") == 20.0) // 2025 row, not 2024's 15.0
    // Four Factors pass-throughs + derived margin
    assert(math.abs(duke.getAs[Double]("ppg") - 78.5) < 1e-9)
    assert(math.abs(duke.getAs[Double]("margin") - (78.5 - 66.25)) < 1e-9)
    assert(math.abs(duke.getAs[Double]("efg_pct") - 0.5625) < 1e-9)
    assert(math.abs(duke.getAs[Double]("pace") - 68.75) < 1e-9)
    // recruiting: DUKE + duke match case-insensitively
    assert(duke.getAs[Long]("recruiting_class_size") == 2)
    assert(duke.getAs[Long]("recruiting_top_star") == 5)
    assert(math.abs(duke.getAs[Double]("recruiting_avg_rating") - 0.955) < 1e-9)

    val unc = rows(102L)
    assert(unc.getAs[Long]("wins") == 0 && unc.getAs[Long]("losses") == 2)
    assert(unc.getAs[Long]("conf_losses") == 1) // game 2 vs SEC is non-conf
    assert(unc.isNullAt(unc.fieldIndex("conf_win_pct")) ||
      unc.getAs[Double]("conf_win_pct") == 0.0)
    assert(unc.isNullAt(unc.fieldIndex("recruiting_class_size")) ||
      unc.getAs[Long]("recruiting_class_size") == 0)

    val uk = rows(103L)
    assert(uk.getAs[Long]("wins") == 1 && uk.getAs[Long]("losses") == 1)
    assert(uk.getAs[Long]("conf_wins") == 0 && uk.getAs[Long]("conf_losses") == 0)
    // absent from the rollup -> null pass-throughs and margin
    assert(uk.isNullAt(uk.fieldIndex("ppg")))
    assert(uk.isNullAt(uk.fieldIndex("margin")))
  }

  test("season summary: zero games -> win_pct null, zero counts (guard)") {
    val s = spark
    import s.implicits._
    val noGames = Seq.empty[(Long, String, Long, Long, Long, Long, Boolean)]
      .toDF("gameId", "startDate", "homeTeamId", "awayTeamId",
        "homeScore", "awayScore", "neutralSite")
    val out = TeamSeasonSummary.build(noGames, dimTeams, adj, srs,
      seasonRollup, recruiting, 2025)
    val duke = out.filter(col("teamId") === 101L).head()
    assert(duke.getAs[Long]("wins") == 0)
    assert(duke.isNullAt(duke.fieldIndex("win_pct")))
  }

  // --- team_power_rankings -------------------------------------------------

  test("power rankings: latest poll per type + distinct-value composite") {
    val s = spark
    import s.implicits._
    val polls = Seq(
      // pollType, pollDate, teamId, ranking — two dates, latest must win
      ("AP Top 25", "2025-01-06", 101L, 4L),
      ("AP Top 25", "2025-01-13", 101L, 2L),
      ("AP Top 25", "2025-01-13", 103L, 8L),
      ("Coaches Poll", "2025-01-13", 101L, 3L))
      .toDF("pollType", "pollDate", "teamId", "ranking")
    val pbpAdj = Seq((101L, 24.0), (102L, 10.0), (103L, 18.0))
      .toDF("teamid", "adj_net_eff") // no off/def cols -> null pass-throughs
    val pbpRollup = Seq(
      // teamid, team_pts, opp_pts, team_poss, opp_poss, games, minutes
      (101L, 1600.0, 1400.0, 1380.0, 1370.0, 20L, Some(810.0)),
      (102L, 1500.0, 1550.0, 1400.0, 1390.0, 20L, Option.empty[Double]), // minutes missing -> 40-min default
      (103L, 1550.0, 1500.0, 0.0, 1380.0, 0L, Some(800.0))) // zero poss + zero games
      .toDF("teamid", "team_points_total", "opp_points_total",
        "team_possessions", "opp_possessions", "games_played",
        "game_minutes_total")

    val out = TeamPowerRankings.build(adj, srs, polls, pbpRollup, pbpAdj,
      dimTeams, 2025)
    val rows = out.collect().map(r => r.getAs[Long]("teamId") -> r).toMap

    assert(rows(101L).getAs[Long]("ap_rank") == 2L) // latest date, not 4
    assert(rows(101L).getAs[Long]("coaches_rank") == 3L)
    assert(rows(102L).isNullAt(rows(102L).fieldIndex("ap_rank")))

    // PBP rollup derivations (reference team_power_rankings.py:140-180)
    val duke = rows(101L)
    assert(math.abs(duke.getAs[Double]("pbp_off_eff") - 1600.0 / 1380.0 * 100) < 1e-9)
    assert(math.abs(duke.getAs[Double]("pbp_def_eff") - 1400.0 / 1370.0 * 100) < 1e-9)
    assert(math.abs(duke.getAs[Double]("pbp_net_eff") -
      (1600.0 / 1380.0 * 100 - 1400.0 / 1370.0 * 100)) < 1e-9)
    // pace = avg_poss * 40/avg_mins = (1380/20) * 40/(810/20)
    assert(math.abs(duke.getAs[Double]("pbp_pace") - 69.0 * (40.0 / 40.5)) < 1e-9)
    assert(duke.getAs[Int]("games_played") == 20)
    // missing minutes -> 40-minute default -> pace = avg_poss
    assert(math.abs(rows(102L).getAs[Double]("pbp_pace") - 70.0) < 1e-9)
    // zero possessions -> null off/net; zero games -> null pace
    val uk = rows(103L)
    assert(uk.isNullAt(uk.fieldIndex("pbp_off_eff")))
    assert(uk.isNullAt(uk.fieldIndex("pbp_net_eff")))
    assert(uk.isNullAt(uk.fieldIndex("pbp_pace")))
    assert(uk.getAs[Double]("pbp_def_eff") > 0)
    // absent adj off/def inputs and ranking_* -> null pass-throughs
    assert(duke.isNullAt(duke.fieldIndex("pbp_adj_off_eff")))
    assert(duke.isNullAt(duke.fieldIndex("ranking_offense")))

    // composite: Duke tops every metric -> 100; UNC bottom -> 0
    assert(math.abs(rows(101L).getAs[Double]("composite_rank") - 100.0) < 1e-9)
    assert(math.abs(rows(102L).getAs[Double]("composite_rank") - 0.0) < 1e-9)
    val mid = rows(103L).getAs[Double]("composite_rank")
    assert(mid > 0 && mid < 100)
  }

  // --- game_predictions_features -------------------------------------------

  test("features: two rows per game, away side flips spread + moneylines") {
    val out = GamePredictionsFeatures.build(games, adj, srs, seasonRollup,
      lines, dimTeams, 2025)
    assert(out.count() == 6) // 3 games x 2 sides
    val rows = out.collect()
      .map(r => (r.getAs[Long]("gameId"), r.getAs[Boolean]("is_home")) -> r).toMap

    val homeSide = rows((1L, true))
    val awaySide = rows((1L, false))
    // first provider (provider asc: 'consensus' < 'zother') wins -> -5.5
    assert(math.abs(homeSide.getAs[Double]("spread") - (-5.5)) < 1e-9)
    assert(math.abs(awaySide.getAs[Double]("spread") - 5.5) < 1e-9)
    // moneylines follow the side
    assert(homeSide.getAs[Double]("team_moneyline") == -200.0)
    assert(awaySide.getAs[Double]("team_moneyline") == 170.0)
    assert(awaySide.getAs[Double]("opp_moneyline") == -200.0)
    // labels
    assert(homeSide.getAs[Long]("team_score") == 80L)
    assert(awaySide.getAs[Long]("team_score") == 70L)
    assert(homeSide.getAs[Boolean]("team_win") && !awaySide.getAs[Boolean]("team_win"))
    // names + conference-game flag (Duke/UNC both ACC)
    assert(homeSide.getAs[String]("team_name") == "Duke")
    assert(homeSide.getAs[String]("opp_name") == "UNC")
    assert(homeSide.getAs[Boolean]("is_conference_game"))
    assert(!rows((2L, true)).getAs[Boolean]("is_conference_game")) // UNC vs UK
    // team/opp ratings swap across sides
    assert(homeSide.getAs[Double]("team_adj_net") == 26.0)
    assert(homeSide.getAs[Double]("opp_adj_net") == 12.0)
    assert(awaySide.getAs[Double]("team_adj_net") == 12.0)
    // rollup features follow the side (team 101 ppg = 78.5)
    assert(math.abs(homeSide.getAs[Double]("team_ppg") - 78.5) < 1e-9)
    assert(math.abs(awaySide.getAs[Double]("opp_ppg") - 78.5) < 1e-9)
    // team 103 absent from rollup -> null features on its side
    val ukSide = rows((2L, false))
    assert(ukSide.isNullAt(ukSide.fieldIndex("team_ppg")))
  }

  // --- player_season_impact ------------------------------------------------

  test("player impact: efficiency ratios with zero-division guards") {
    val s = spark
    import s.implicits._
    val stats = Seq(
      (9001L, "Duke", "ACC", 30L, 900.0, 450.0, 150.0, 90.0, 30.0, 12.0, 60.0,
        175.0, 367.0, 45.0, 120.0, 95.0, 110.0),
      // zero-minutes player: every per-minute stat must be null, not NaN
      (9999L, "Duke", "ACC", 0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("playerId", "team", "conference", "games", "minutes", "points",
        "rebounds", "assists", "steals", "blocks", "turnovers",
        "fieldGoalsMade", "fieldGoalsAttempted",
        "threePointFieldGoalsMade", "threePointFieldGoalsAttempted",
        "freeThrowsMade", "freeThrowsAttempted")
    val out = PlayerSeasonImpact.build(stats, recruiting, 2025)
    val rows = out.collect().map(r => r.getAs[Long]("playerId") -> r).toMap

    val p = rows(9001L)
    assert(math.abs(p.getAs[Double]("ppg") - 15.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("efg_pct") - (175.0 + 0.5 * 45.0) / 367.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("true_shooting")
      - 450.0 / (2 * (367.0 + 0.44 * 110.0))) < 1e-9)
    assert(math.abs(p.getAs[Double]("per_40_pts") - 450.0 / 900.0 * 40.0) < 1e-9)
    assert(p.getAs[Long]("recruiting_stars") == 5L) // joined by playerId
    // raw stat pass-throughs keep reference names
    assert(p.getAs[Double]("fgm") == 175.0 && p.getAs[Double]("fta") == 110.0)
    assert(p.getAs[Double]("steals") == 30.0)

    val z = rows(9999L)
    Seq("mpg", "ppg", "efg_pct", "true_shooting", "usage_rate", "per_40_pts")
      .foreach(c => assert(z.isNullAt(z.fieldIndex(c)), s"$c must be null"))
  }

  test("player impact: raw silver shape — dict-string shooting fields, athleteId") {
    // mirrors reference tests/test_gold.py::test_player_stats_string_dict_fields
    val s = spark
    import s.implicits._
    val raw = Seq(
      (747L, "Abilene Christian", "WAC", 31L, 985L, 482L,
        "{'offensive': 31, 'defensive': 110, 'total': 141}", 36L, 43L, 7L, 72L,
        "{'made': 175, 'attempted': 367, 'pct': 47.7}",
        "{'made': 115, 'attempted': 158, 'pct': 72.8}",
        "{'made': 17, 'attempted': 49, 'pct': 34.7}"))
      .toDF("athleteId", "team", "conference", "games", "minutes", "points",
        "rebounds", "assists", "steals", "blocks", "turnovers",
        "fieldGoals", "freeThrows", "threePointFieldGoals")
    val emptyRec = Seq.empty[(Long, Long, Double, Long)]
      .toDF("playerId", "stars", "rating", "ranking")
    val out = PlayerSeasonImpact.build(raw, emptyRec, 2024)
    val p = out.head()
    assert(p.getAs[Long]("playerId") == 747L) // athleteId candidate
    assert(p.getAs[Double]("fgm") == 175.0 && p.getAs[Double]("fga") == 367.0)
    assert(p.getAs[Double]("ftm") == 115.0 && p.getAs[Double]("fta") == 158.0)
    assert(p.getAs[Double]("fg3m") == 17.0 && p.getAs[Double]("fg3a") == 49.0)
    assert(p.getAs[Double]("rebounds") == 141.0) // dict total
    assert(math.abs(p.getAs[Double]("rpg") - 141.0 / 31.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("efg_pct") - (175.0 + 0.5 * 17.0) / 367.0) < 1e-9)
  }

  test("gold builders: candidate columns (homePoints, offensiveRating)") {
    // mirrors reference test_games_homepoints_columns /
    // test_ratings_adjusted_real_columns (pydict_get_first)
    val s = spark
    import s.implicits._
    val gamesAlt = games
      .withColumnRenamed("homeScore", "homePoints")
      .withColumnRenamed("awayScore", "awayPoints")
    val adjAlt = adj
      .withColumnRenamed("offenserating", "offensiveRating")
      .withColumnRenamed("defenserating", "defensiveRating")

    val ml = MarketLinesAnalysis.build(lines, gamesAlt, dimTeams, 2025)
    val g1 = ml.filter(col("gameId") === 1L && col("provider") === "consensus").head()
    assert(g1.getAs[Long]("home_score") == 80L && g1.getAs[Long]("home_margin") == 10L)

    val feats = GamePredictionsFeatures.build(gamesAlt, adjAlt, srs,
      seasonRollup, lines, dimTeams, 2025)
    val home1 = feats.filter(col("gameId") === 1L && col("is_home")).head()
    assert(home1.getAs[Long]("team_score") == 80L)
    assert(home1.getAs[Double]("team_adj_off") == 118.0)

    val summary = TeamSeasonSummary.build(gamesAlt, dimTeams, adjAlt, srs,
      seasonRollup, recruiting, 2025)
    val duke = summary.filter(col("teamId") === 101L).head()
    assert(duke.getAs[Long]("wins") == 2)
    assert(duke.getAs[Double]("adj_off_rating") == 118.0)
  }

  test("power rankings: missing SRS -> null rating, composite from the rest") {
    // mirrors reference test_missing_srs
    val s = spark
    import s.implicits._
    val emptySrs = Seq.empty[(Long, Int, Double)].toDF("teamId", "season", "rating")
    val pbpAdj = Seq((101L, 24.0), (102L, 10.0), (103L, 18.0))
      .toDF("teamid", "adj_net_eff")
    val emptyRollup = Seq.empty[(Long, Double, Double, Double, Double, Long, Double)]
      .toDF("teamid", "team_points_total", "opp_points_total",
        "team_possessions", "opp_possessions", "games_played",
        "game_minutes_total")
    val polls = Seq.empty[(String, String, Long, Long)]
      .toDF("pollType", "pollDate", "teamId", "ranking")
    val out = TeamPowerRankings.build(adj, emptySrs, polls, emptyRollup,
      pbpAdj, dimTeams, 2025)
    val rows = out.collect().map(r => r.getAs[Long]("teamId") -> r).toMap
    assert(rows(101L).isNullAt(rows(101L).fieldIndex("srs_rating")))
    // composite still computed from adj_net + pbp_adj_net percentiles
    assert(math.abs(rows(101L).getAs[Double]("composite_rank") - 100.0) < 1e-9)
    assert(math.abs(rows(102L).getAs[Double]("composite_rank") - 0.0) < 1e-9)
  }

  test("gold builders: empty inputs produce empty outputs, not errors") {
    // mirrors reference test_empty_season / test_empty_games /
    // test_empty_lines / test_empty_stats
    val s = spark
    import s.implicits._
    val noGames = Seq.empty[(Long, String, Long, Long, Long, Long, Boolean)]
      .toDF("gameId", "startDate", "homeTeamId", "awayTeamId",
        "homeScore", "awayScore", "neutralSite")
    val noLines = Seq.empty[(Long, String, Double, Double, Double, Double)]
      .toDF("gameId", "provider", "spread", "overUnder",
        "homeMoneyline", "awayMoneyline")
    val noAdj = Seq.empty[(Long, String, String, Double, Double, Double)]
      .toDF("teamid", "team", "conference", "offenserating",
        "defenserating", "netrating")
    val noStats = Seq.empty[(Long, String, String, Long, Double, Double,
        Double, Double, Double, Double, Double)]
      .toDF("playerId", "team", "conference", "games", "minutes", "points",
        "rebounds", "assists", "turnovers", "fieldGoalsMade",
        "fieldGoalsAttempted")

    assert(MarketLinesAnalysis.build(noLines, games, dimTeams, 2025).count() == 0)
    assert(MarketLinesAnalysis.build(lines, noGames, dimTeams, 2025).count() == 0)
    assert(GamePredictionsFeatures.build(noGames, adj, srs, seasonRollup,
      lines, dimTeams, 2025).count() == 0)
    assert(TeamSeasonSummary.build(games, dimTeams, noAdj, srs, seasonRollup,
      recruiting, 2025).count() == 0) // empty D1 spine
    assert(PlayerSeasonImpact.build(noStats, recruiting, 2025).count() == 0)
    val emptyPolls = Seq.empty[(String, String, Long, Long)]
      .toDF("pollType", "pollDate", "teamId", "ranking")
    val emptyRoll = seasonRollup.limit(0)
    val emptyPbp = Seq.empty[(Long, Double)].toDF("teamid", "adj_net_eff")
    assert(TeamPowerRankings.build(noAdj, srs, emptyPolls, emptyRoll,
      emptyPbp, dimTeams, 2025).count() == 0)
  }

  // --- team_adjusted_efficiencies ------------------------------------------

  test("adjusted efficiencies: JSON parse (incl. python-repr), per-date warm-start snapshots") {
    val s = spark
    import s.implicits._
    val gameTeams = Seq(
      // canonical JSON side + python-repr side in the same table
      (1L, 101L, """{"possessions": 70, "points": {"total": 80}}""",
        """{"possessions": 70, "points": {"total": 70}}"""),
      (1L, 102L, """{'possessions': 70, 'points': {'total': 70}}""",
        """{'possessions': 70, 'points': {'total': 80}}"""),
      (2L, 102L, """{"possessions": 68, "points": {"total": 65}}""",
        """{"possessions": 68, "points": {"total": 75}}"""),
      (2L, 103L, """{"possessions": 68, "points": {"total": 75}}""",
        """{"possessions": 68, "points": {"total": 65}}"""),
      (3L, 103L, """{"possessions": 72, "points": {"total": 60}}""",
        """{"possessions": 72, "points": {"total": 90}}"""),
      (3L, 101L, """{"possessions": 72, "points": {"total": 90}}""",
        """{"possessions": 72, "points": {"total": 60}}"""),
      // invalid row: possessions <= 0 must be filtered (P6)
      (3L, 104L, """{"possessions": 0, "points": {"total": 10}}""",
        """{"possessions": 0, "points": {"total": 10}}"""))
      .toDF("gameId", "teamId", "teamStats", "opponentStats")

    val out = AdjustedEfficiencies.build(s, gameTeams, games, dimTeams, 2025)
    val rows = out.collect()
    // 3 distinct dates; snapshot at date d covers teams seen up to d
    val dates = rows.map(_.getAs[String]("rating_date")).distinct.sorted
    assert(dates.toSeq == Seq("2025-01-10", "2025-01-15", "2025-01-20"))
    val last = rows.filter(_.getAs[String]("rating_date") == "2025-01-20")
      .map(r => r.getAs[Long]("teamId") -> r).toMap
    assert(last.keySet == Set(101L, 102L, 103L)) // 104 filtered (non-D1 + poss<=0)
    // Duke won both its games -> best net rating at the final snapshot
    def net(t: Long) = last(t).getAs[Double]("adj_oe") - last(t).getAs[Double]("adj_de")
    assert(net(101L) > net(103L) && net(103L) > net(102L))
    assert(last(101L).getAs[Double]("barthag") > 0.5)
    // first snapshot only knows game 1's teams
    val first = rows.filter(_.getAs[String]("rating_date") == "2025-01-10")
    assert(first.map(_.getAs[Long]("teamId")).toSet == Set(101L, 102L))
  }

  test("schema contracts: sorted columns, hinted types, PK dedup") {
    val s = spark
    import s.implicits._
    val ml = GoldSchemas.conform(
      MarketLinesAnalysis.build(lines, games, dimTeams, 2025),
      "market_lines_analysis")
    // alphabetical column order (reference normalize_records sorts)
    assert(ml.columns.toSeq == ml.columns.toSeq.sorted)
    // hinted types applied
    val byName = ml.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("gameId") == org.apache.spark.sql.types.LongType)
    assert(byName("season") == org.apache.spark.sql.types.IntegerType)
    assert(byName("home_win") == org.apache.spark.sql.types.BooleanType)
    assert(byName("spread") == org.apache.spark.sql.types.DoubleType)
    // values survive the conform pass
    assert(ml.count() == 4)

    // PK dedup keeps the first row per (gameId, provider) by the order col
    val dup = Seq((1L, "consensus", -5.5), (1L, "consensus", -6.0),
      (2L, "consensus", 3.5)).toDF("gameId", "provider", "spread")
    val deduped = GoldSchemas.dedupeByPk(dup, "market_lines_analysis",
      col("spread").desc)
    assert(deduped.count() == 2)
    assert(deduped.filter(col("gameId") === 1L).head().getAs[Double]("spread") == -5.5)
  }

  // --- runner ---------------------------------------------------------------

  test("gold runner: end-to-end over a silver lake root, partitioned output") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-gold").toString
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$root/$name")
    write(dimTeams, "dim_teams"); write(games, "fct_games")
    write(lines, "fct_lines"); write(adj, "fct_ratings_adjusted")
    write(srs, "fct_ratings_srs"); write(recruiting, "fct_recruiting_players")
    write(seasonRollup, "fct_pbp_team_daily_rollup")

    val res = GoldRunner.run(s, root, 2025, only = Some("market_lines_analysis"))
    assert(res("market_lines_analysis") == Right(4L))
    val written = s.read.parquet(s"$root/gold/market_lines_analysis")
    assert(written.filter(col("season") === 2025).count() == 4)

    // dry run must not write
    val res2 = GoldRunner.run(s, root, 2025, only = Some("team_season_summary"),
      dryRun = true)
    assert(res2("team_season_summary").isRight)
    assert(!new java.io.File(s"$root/gold/team_season_summary").exists())

    // missing input -> Left(error), run continues (reference runner.py:98-108)
    val res3 = GoldRunner.run(s, root, 2025, only = Some("player_season_impact"))
    assert(res3("player_season_impact").isLeft)
  }
}
