package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gold.{GamePredictionsFeatures, MarketLinesAnalysis, TeamPowerRankings, TeamSeasonSummary}
import graft.sources.Tables

/** The gold transforms under the hard cross-engine gate.
  *
  * The driver's DuckDB oracle only sees the ten generic test tables, so
  * reference-shaped silver inputs (games / lines / dim_teams / ratings /
  * polls / recruiting — shapes per /root/reference/tests/conftest.py:
  * 136-237) are derived deterministically FROM those tables inside each
  * query; the Spark side feeds them to the REAL `graft.gold.*` builders
  * and the oracle replays the same derivation + transform in SQL CTEs.
  * A wrong constant in any gold transform now fails the hash gate.
  *
  * Parity rule: every fixture double is a dyadic rational (quarters,
  * halves, 32nds), so sums/averages are exact in IEEE754 regardless of
  * accumulation order — no cross-engine rounding drift.
  */
object GoldGate {

  val Season = 2025

  // ---------------------------------------------------------------- fixtures

  /** 25 teams: nation ⋈ region (5 "conferences" of 5). */
  def dimTeams(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("teamId"), col("n_name").as("school"),
        col("r_name").as("conference"))

  /** One game per order; team ids from custkey, scores from key modulos.
    * away = home + (orderkey%7 + 1) mod 25 — never equal to home. */
  def games(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
        col("o_orderkey").as("gameId"),
        concat(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("T19:00:00")).as("startDate"),
        (col("o_custkey") % 25).as("homeTeamId"),
        ((col("o_custkey") + col("o_orderkey") % 7 + 1) % 25).as("awayTeamId"),
        (lit(55L) + col("o_orderkey") % 50).as("homeScore"),
        (lit(55L) + (col("o_orderkey") * 7 + col("o_custkey")) % 50).as("awayScore"),
        (col("o_orderkey") % 10 === 0).as("neutralSite"))
      .filter(col("homeTeamId") =!= col("awayTeamId"))

  /** Two providers, lines for 1/3 of games ('consensus') and 1/6
    * ('bovada') — the inner join in market_lines drops uncovered games
    * and (gameId, provider) is unique so first-wins dedup is stable. */
  def lines(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val consensus = o.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey").as("gameId"), lit("consensus").as("provider"),
      ((col("o_orderkey") % 27).cast("double") - 13.5).as("spread"),
      (lit(120.5) + (col("o_custkey") % 60).cast("double")).as("overUnder"),
      (lit(-110.0) - (col("o_orderkey") % 150).cast("double")).as("homeMoneyline"),
      (lit(100.0) + (col("o_custkey") % 150).cast("double")).as("awayMoneyline"))
    val bovada = o.filter(col("o_orderkey") % 6 === 0).select(
      col("o_orderkey").as("gameId"), lit("bovada").as("provider"),
      ((col("o_orderkey") % 27).cast("double") - 13.0).as("spread"),
      (lit(121.0) + (col("o_custkey") % 60).cast("double")).as("overUnder"),
      (lit(-120.0) - (col("o_orderkey") % 150).cast("double")).as("homeMoneyline"),
      (lit(110.0) + (col("o_custkey") % 150).cast("double")).as("awayMoneyline"))
    consensus.unionByName(bovada)
  }

  /** Adjusted-ratings spine: exact quarter-point ratings per team. */
  def adj(s: SparkSession, d: String): DataFrame =
    dimTeams(s, d).select(
        col("teamId").as("teamid"), col("school").as("team"), col("conference"),
        (lit(95.0) + (col("teamId") * 7 % 40).cast("double") * 0.25).as("offenserating"),
        (lit(105.0) - (col("teamId") * 11 % 40).cast("double") * 0.25).as("defenserating"))
      .withColumn("netrating", col("offenserating") - col("defenserating"))

  /** SRS ratings for two seasons (the transform must keep only 2025). */
  def srs(s: SparkSession, d: String): DataFrame = {
    val dt = dimTeams(s, d)
    dt.select(col("teamId"), lit(Season).as("season"),
        ((col("teamId") * 13 % 50).cast("double") * 0.5 - 10.0).as("rating"))
      .unionByName(dt.select(col("teamId"), lit(Season - 1).as("season"),
        lit(0.0).as("rating")))
  }

  /** Two poll types, two dates — latest-per-(type, team) must win. */
  def polls(s: SparkSession, d: String): DataFrame = {
    val dt = dimTeams(s, d)
    val even = dt.filter(col("teamId") % 2 === 0)
    even.select(lit("AP Top 25").as("pollType"), lit("2025-01-06").as("pollDate"),
        col("teamId"), (col("teamId") + 10).as("ranking"))
      .unionByName(even.select(lit("AP Top 25").as("pollType"),
        lit("2025-01-13").as("pollDate"), col("teamId"), (col("teamId") + 1).as("ranking")))
      .unionByName(dt.filter(col("teamId") % 3 === 0)
        .select(lit("Coaches Poll").as("pollType"), lit("2025-01-13").as("pollDate"),
          col("teamId"), (col("teamId") + 2).as("ranking")))
  }

  /** PBP rollup ratings with some nulls (null-aware composite). */
  def pbpAdj(s: SparkSession, d: String): DataFrame =
    dimTeams(s, d).select(col("teamId").as("teamid"),
      when(col("teamId") % 5 =!= 4,
        (col("teamId") * 17 % 60).cast("double") * 0.25 - 7.5).as("adj_net_eff"))

  /** Recruiting players committed to case-varied school names. */
  def recruiting(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") % 4 === 0)
      .join(broadcast(dimTeams(s, d)), col("c_custkey") % 25 === col("teamId"))
      .select(
        col("c_custkey").as("playerId"), lit(Season).as("season"),
        (lit(3L) + col("c_custkey") % 3).as("stars"),
        (col("c_custkey") % 300 + 1).as("ranking"),
        (lit(0.5) + (col("c_custkey") % 16).cast("double") / 32.0).as("rating"),
        when(col("c_custkey") % 2 === 0, upper(col("school")))
          .otherwise(lower(col("school"))).as("committedTo"))

  /** The same fixtures as DuckDB CTEs (interpolated into each oracle). */
  val FixtureSql: String = """
    dim_t AS (SELECT n_nationkey AS teamId, n_name AS school, r_name AS conference
              FROM nation JOIN region ON n_regionkey = r_regionkey),
    fx_games AS (
      SELECT o_orderkey AS gameId,
             strftime(o_orderdate, '%Y-%m-%d') || 'T19:00:00' AS startDate,
             o_custkey % 25 AS homeTeamId,
             (o_custkey + o_orderkey % 7 + 1) % 25 AS awayTeamId,
             55 + o_orderkey % 50 AS homeScore,
             55 + (o_orderkey * 7 + o_custkey) % 50 AS awayScore,
             o_orderkey % 10 = 0 AS neutralSite
      FROM orders
      WHERE (o_custkey % 25) <> ((o_custkey + o_orderkey % 7 + 1) % 25)),
    fx_lines AS (
      SELECT o_orderkey AS gameId, 'consensus' AS provider,
             CAST(o_orderkey % 27 AS DOUBLE) - 13.5 AS spread,
             120.5 + CAST(o_custkey % 60 AS DOUBLE) AS overUnder,
             -110.0 - CAST(o_orderkey % 150 AS DOUBLE) AS homeMoneyline,
             100.0 + CAST(o_custkey % 150 AS DOUBLE) AS awayMoneyline
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 'bovada',
             CAST(o_orderkey % 27 AS DOUBLE) - 13.0,
             121.0 + CAST(o_custkey % 60 AS DOUBLE),
             -120.0 - CAST(o_orderkey % 150 AS DOUBLE),
             110.0 + CAST(o_custkey % 150 AS DOUBLE)
      FROM orders WHERE o_orderkey % 6 = 0),
    fx_adj AS (
      SELECT teamId AS teamid, school AS team, conference,
             95.0 + CAST(teamId * 7 % 40 AS DOUBLE) * 0.25 AS offenserating,
             105.0 - CAST(teamId * 11 % 40 AS DOUBLE) * 0.25 AS defenserating,
             (95.0 + CAST(teamId * 7 % 40 AS DOUBLE) * 0.25)
               - (105.0 - CAST(teamId * 11 % 40 AS DOUBLE) * 0.25) AS netrating
      FROM dim_t),
    fx_srs AS (
      SELECT teamId, 2025 AS season,
             CAST(teamId * 13 % 50 AS DOUBLE) * 0.5 - 10.0 AS rating FROM dim_t
      UNION ALL
      SELECT teamId, 2024, 0.0 FROM dim_t),
    fx_polls AS (
      SELECT 'AP Top 25' AS pollType, '2025-01-06' AS pollDate, teamId,
             teamId + 10 AS ranking FROM dim_t WHERE teamId % 2 = 0
      UNION ALL
      SELECT 'AP Top 25', '2025-01-13', teamId, teamId + 1 FROM dim_t WHERE teamId % 2 = 0
      UNION ALL
      SELECT 'Coaches Poll', '2025-01-13', teamId, teamId + 2 FROM dim_t WHERE teamId % 3 = 0),
    fx_pbp AS (
      SELECT teamId AS teamid,
             CASE WHEN teamId % 5 <> 4
                  THEN CAST(teamId * 17 % 60 AS DOUBLE) * 0.25 - 7.5 END AS adj_net_eff
      FROM dim_t),
    fx_rec AS (
      SELECT c_custkey AS playerId, 2025 AS season,
             3 + c_custkey % 3 AS stars, (c_custkey % 300) + 1 AS ranking,
             0.5 + CAST(c_custkey % 16 AS DOUBLE) / 32.0 AS rating,
             CASE WHEN c_custkey % 2 = 0 THEN upper(school) ELSE lower(school) END AS committedTo
      FROM customer JOIN dim_t ON c_custkey % 25 = teamId
      WHERE c_custkey % 4 = 0)"""

  // ---------------------------------------------------------------- queries

  def defs: Seq[Q] = Seq(

    Q(
      "g01_gold_market_lines",
      "Gold market_lines_analysis (reference gold/market_lines_analysis" +
        ".py:19-162) over reference-shaped fixtures derived from orders/" +
        "nation/region — the REAL graft.gold.MarketLinesAnalysis.build " +
        "runs on the Spark side; the oracle replays fixture + transform " +
        "in SQL. ATS labels, cover/over flags, spread error.",
      (s, d) => MarketLinesAnalysis.build(lines(s, d), games(s, d), dimTeams(s, d), Season),
      Some(s"""
        WITH $FixtureSql,
        g AS (SELECT gameId, homeTeamId, awayTeamId, homeScore, awayScore,
                     substr(startDate, 1, 10) AS game_date FROM fx_games),
        j AS (
          SELECT l.gameId, l.provider, l.spread, l.overUnder, l.homeMoneyline,
                 l.awayMoneyline, g.homeScore, g.awayScore, g.game_date,
                 dh.school AS home_team, dh.conference AS home_conference,
                 da.school AS away_team, da.conference AS away_conference
          FROM fx_lines l
          JOIN g ON l.gameId = g.gameId
          LEFT JOIN dim_t dh ON g.homeTeamId = dh.teamId
          LEFT JOIN dim_t da ON g.awayTeamId = da.teamId)
        SELECT gameId, 2025 AS season, game_date, provider, home_team, away_team,
               home_conference, away_conference, spread, overUnder AS over_under,
               homeMoneyline AS home_moneyline, awayMoneyline AS away_moneyline,
               homeScore AS home_score, awayScore AS away_score,
               homeScore + awayScore AS total_points,
               homeScore - awayScore AS home_margin,
               homeScore > awayScore AS home_win,
               CAST(homeScore - awayScore AS DOUBLE) + spread > 0 AS home_covered,
               CAST(homeScore + awayScore AS DOUBLE) > overUnder AS over_hit,
               CAST(homeScore - awayScore AS DOUBLE) + spread AS ats_margin,
               CAST(homeScore + awayScore AS DOUBLE) - overUnder AS total_vs_line,
               abs(CAST(homeScore - awayScore AS DOUBLE) - (-spread)) AS spread_error
        FROM j""")),

    Q(
      "g02_gold_season_summary",
      "Gold team_season_summary (reference gold/team_season_summary.py:" +
        "20-360): W/L + conference record via two-sided unpivot, D1 " +
        "spine from adjusted ratings, SRS season filter, case-" +
        "insensitive recruiting join — real builder vs SQL-CTE oracle.",
      (s, d) => TeamSeasonSummary.build(games(s, d), dimTeams(s, d), adj(s, d),
        srs(s, d), recruiting(s, d), Season),
      Some(s"""
        WITH $FixtureSql,
        gg AS (
          SELECT g.*, dh.conference AS h_conf, da.conference AS a_conf
          FROM fx_games g
          LEFT JOIN dim_t dh ON g.homeTeamId = dh.teamId
          LEFT JOIN dim_t da ON g.awayTeamId = da.teamId
          WHERE g.homeTeamId IS NOT NULL AND g.awayTeamId IS NOT NULL
            AND g.homeScore IS NOT NULL AND g.awayScore IS NOT NULL),
        sides AS (
          SELECT homeTeamId AS teamId, homeScore > awayScore AS won,
                 homeScore < awayScore AS lost,
                 (h_conf IS NOT NULL AND a_conf IS NOT NULL AND h_conf = a_conf) AS is_conf
          FROM gg
          UNION ALL
          SELECT awayTeamId, awayScore > homeScore, awayScore < homeScore,
                 (h_conf IS NOT NULL AND a_conf IS NOT NULL AND h_conf = a_conf)
          FROM gg),
        record AS (
          SELECT teamId,
                 CAST(sum(CASE WHEN won THEN 1 ELSE 0 END) AS BIGINT) AS wins,
                 CAST(sum(CASE WHEN lost THEN 1 ELSE 0 END) AS BIGINT) AS losses,
                 CAST(sum(CASE WHEN won AND is_conf THEN 1 ELSE 0 END) AS BIGINT) AS conf_wins,
                 CAST(sum(CASE WHEN lost AND is_conf THEN 1 ELSE 0 END) AS BIGINT) AS conf_losses
          FROM sides GROUP BY 1),
        adjsel AS (SELECT teamid AS teamId, offenserating AS adj_off,
                          defenserating AS adj_def, netrating AS adj_net FROM fx_adj),
        spine AS (SELECT DISTINCT teamId FROM adjsel),
        srssel AS (SELECT teamId, rating AS srs FROM fx_srs WHERE season = 2025),
        recagg AS (
          SELECT d.teamId, avg(r.rating) AS recruit_avg_rating,
                 count(r.rating) AS recruit_class_size,
                 max(r.stars) AS recruit_top_stars
          FROM fx_rec r JOIN dim_t d ON lower(r.committedTo) = lower(d.school)
          GROUP BY 1)
        SELECT s.teamId, 2025 AS season, d.school, d.conference,
               coalesce(wins, 0) AS wins, coalesce(losses, 0) AS losses,
               coalesce(conf_wins, 0) AS conf_wins,
               coalesce(conf_losses, 0) AS conf_losses,
               CASE WHEN coalesce(wins, 0) + coalesce(losses, 0) > 0
                    THEN coalesce(wins, 0)
                         / CAST(coalesce(wins, 0) + coalesce(losses, 0) AS DOUBLE)
               END AS win_pct,
               adj_off, adj_def, adj_net, srs,
               recruit_avg_rating, recruit_class_size, recruit_top_stars
        FROM spine s
        LEFT JOIN record USING (teamId)
        LEFT JOIN adjsel USING (teamId)
        LEFT JOIN srssel USING (teamId)
        LEFT JOIN recagg USING (teamId)
        LEFT JOIN dim_t d USING (teamId)""")),

    Q(
      "g03_gold_power_rankings",
      "Gold team_power_rankings (reference gold/team_power_rankings.py:" +
        "34-296): latest poll per (type, team), distinct-value " +
        "percentiles — (rank-1)/(n-1)*100, single value → 50 — and the " +
        "null-aware composite — real builder vs SQL-CTE oracle.",
      (s, d) => TeamPowerRankings.build(adj(s, d), srs(s, d), polls(s, d),
        pbpAdj(s, d), dimTeams(s, d), Season),
      Some(s"""
        WITH $FixtureSql,
        latest AS (
          SELECT * FROM (
            SELECT p.*, row_number() OVER (PARTITION BY pollType, teamId
                                           ORDER BY pollDate DESC) AS rn
            FROM fx_polls p) WHERE rn = 1),
        pollcols AS (
          SELECT teamId,
                 min(CASE WHEN lower(pollType) IN ('ap top 25', 'ap')
                          THEN ranking END) AS ap_rank,
                 min(CASE WHEN lower(pollType) IN ('coaches poll', 'coaches')
                          THEN ranking END) AS coaches_rank
          FROM latest GROUP BY 1),
        joined AS (
          SELECT a.teamid AS teamId,
                 coalesce(a.team, d.school) AS team,
                 coalesce(a.conference, d.conference) AS conference,
                 a.offenserating AS adj_off, a.defenserating AS adj_def,
                 a.netrating AS adj_net, s.srs, pc.ap_rank, pc.coaches_rank,
                 pb.adj_net_eff AS pbp_adj_net
          FROM fx_adj a
          LEFT JOIN (SELECT teamId, rating AS srs FROM fx_srs WHERE season = 2025) s
            ON a.teamid = s.teamId
          LEFT JOIN pollcols pc ON a.teamid = pc.teamId
          LEFT JOIN fx_pbp pb ON a.teamid = pb.teamid
          LEFT JOIN dim_t d ON a.teamid = d.teamId),
        p1 AS (SELECT v, CASE WHEN count(*) OVER () > 1
                              THEN CAST((row_number() OVER (ORDER BY v ASC) - 1) * 100 AS DOUBLE)
                                   / (count(*) OVER () - 1)
                              ELSE 50.0 END AS p
               FROM (SELECT DISTINCT adj_net AS v FROM joined WHERE adj_net IS NOT NULL)),
        p2 AS (SELECT v, CASE WHEN count(*) OVER () > 1
                              THEN CAST((row_number() OVER (ORDER BY v ASC) - 1) * 100 AS DOUBLE)
                                   / (count(*) OVER () - 1)
                              ELSE 50.0 END AS p
               FROM (SELECT DISTINCT pbp_adj_net AS v FROM joined WHERE pbp_adj_net IS NOT NULL)),
        p3 AS (SELECT v, CASE WHEN count(*) OVER () > 1
                              THEN CAST((row_number() OVER (ORDER BY v ASC) - 1) * 100 AS DOUBLE)
                                   / (count(*) OVER () - 1)
                              ELSE 50.0 END AS p
               FROM (SELECT DISTINCT srs AS v FROM joined WHERE srs IS NOT NULL))
        SELECT j.teamId, 2025 AS season, j.team, j.conference,
               j.adj_off, j.adj_def, j.adj_net, j.srs, j.ap_rank, j.coaches_rank,
               j.pbp_adj_net,
               CASE WHEN (CASE WHEN p1.p IS NOT NULL THEN 1 ELSE 0 END
                          + CASE WHEN p2.p IS NOT NULL THEN 1 ELSE 0 END
                          + CASE WHEN p3.p IS NOT NULL THEN 1 ELSE 0 END) > 0
                    THEN (coalesce(p1.p, 0.0) + coalesce(p2.p, 0.0) + coalesce(p3.p, 0.0))
                         / (CASE WHEN p1.p IS NOT NULL THEN 1 ELSE 0 END
                            + CASE WHEN p2.p IS NOT NULL THEN 1 ELSE 0 END
                            + CASE WHEN p3.p IS NOT NULL THEN 1 ELSE 0 END)
               END AS composite_rank
        FROM joined j
        LEFT JOIN p1 ON j.adj_net = p1.v
        LEFT JOIN p2 ON j.pbp_adj_net = p2.v
        LEFT JOIN p3 ON j.srs = p3.v""")),

    Q(
      "g04_gold_predictions",
      "Gold game_predictions_features (reference gold/game_predictions_" +
        "features.py:35-290): two rows per game via the home/away " +
        "unpivot, same ratings lookup joined twice, first-provider " +
        "lines, away side flips the spread — real builder vs SQL-CTE " +
        "oracle.",
      (s, d) => GamePredictionsFeatures.build(games(s, d), adj(s, d), srs(s, d),
        lines(s, d), Season),
      Some(s"""
        WITH $FixtureSql,
        g AS (SELECT * FROM fx_games
              WHERE homeTeamId IS NOT NULL AND awayTeamId IS NOT NULL),
        sides AS (
          SELECT gameId, substr(startDate, 1, 10) AS game_date, neutralSite,
                 true AS is_home, homeTeamId AS teamId, awayTeamId AS oppId,
                 homeScore - awayScore AS margin,
                 homeScore AS team_score, awayScore AS opp_score
          FROM g
          UNION ALL
          SELECT gameId, substr(startDate, 1, 10), neutralSite,
                 false, awayTeamId, homeTeamId, awayScore - homeScore,
                 awayScore, homeScore
          FROM g),
        ratings AS (SELECT teamid AS tid, offenserating AS off,
                           defenserating AS def, netrating AS net FROM fx_adj),
        srssel AS (SELECT teamId AS tid, rating AS srs FROM fx_srs WHERE season = 2025),
        firstlines AS (
          SELECT gameId, spread, overUnder FROM (
            SELECT gameId, spread, overUnder,
                   row_number() OVER (PARTITION BY gameId ORDER BY provider ASC) AS rn
            FROM fx_lines) WHERE rn = 1)
        SELECT s.gameId, 2025 AS season, s.game_date, s.teamId, s.oppId,
               s.is_home, s.neutralSite,
               t.off AS team_off, t.def AS team_def, t.net AS team_net,
               ts.srs AS team_srs,
               o.off AS opp_off, o.def AS opp_def, o.net AS opp_net,
               os.srs AS opp_srs,
               t.net - o.net AS rating_diff, ts.srs - os.srs AS srs_diff,
               CASE WHEN s.is_home THEN fl.spread ELSE -fl.spread END AS team_spread,
               fl.overUnder AS over_under, s.margin,
               s.team_score > s.opp_score AS won
        FROM sides s
        LEFT JOIN ratings t ON s.teamId = t.tid
        LEFT JOIN ratings o ON s.oppId = o.tid
        LEFT JOIN srssel ts ON s.teamId = ts.tid
        LEFT JOIN srssel os ON s.oppId = os.tid
        LEFT JOIN firstlines fl ON s.gameId = fl.gameId"""))
  )
}
