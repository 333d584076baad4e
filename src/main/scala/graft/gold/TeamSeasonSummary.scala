package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold: team_season_summary — one row per D1 team per season: W/L +
  * conference record, Four Factors + pace from the PBP rollup, adjusted
  * ratings, SRS, recruiting class quality (semantics and the full output
  * column set per /root/reference/gold/team_season_summary.py:20-360).
  *
  * Spark shape: the W/L record is the two-sided unpivot (SURVEY J9):
  * each game contributes one row from the home perspective and one from
  * the away perspective, then one groupBy(teamId) with conditional sums.
  * D1 restriction = left_semi join against the adjusted-ratings spine
  * (SURVEY P4); recruiting joins on lower(school) (SURVEY J5).
  */
object TeamSeasonSummary {

  import IoHelpers.{colFirst, colOrNull}

  def build(games: DataFrame, dimTeams: DataFrame, adj: DataFrame,
      srs: DataFrame, pbpRollup: DataFrame, recruiting: DataFrame,
      season: Int): DataFrame = {
    val dim = dimTeams.select(col("teamId"), col("school"), col("conference"))
    val confOf = dim.select(col("teamId"), col("conference"))

    // conference-game flag needs both sides' conferences (non-null, equal)
    val g = games
      .withColumn("homeScore", colFirst(games, Seq("homeScore", "homePoints"), "long"))
      .withColumn("awayScore", colFirst(games, Seq("awayScore", "awayPoints"), "long"))
      .filter(col("homeTeamId").isNotNull && col("awayTeamId").isNotNull &&
        col("homeScore").isNotNull && col("awayScore").isNotNull)
      .join(broadcast(confOf.toDF("homeTeamId", "h_conf")), Seq("homeTeamId"), "left")
      .join(broadcast(confOf.toDF("awayTeamId", "a_conf")), Seq("awayTeamId"), "left")
      .withColumn("is_conf",
        col("h_conf").isNotNull && col("a_conf").isNotNull &&
          col("h_conf") === col("a_conf"))

    // two-sided unpivot: (team, won, is_conf) per game per side
    val sides = g.select(explode(array(
        struct(col("homeTeamId").as("teamId"),
          (col("homeScore") > col("awayScore")).as("won"),
          (col("homeScore") < col("awayScore")).as("lost"), col("is_conf")),
        struct(col("awayTeamId").as("teamId"),
          (col("awayScore") > col("homeScore")).as("won"),
          (col("awayScore") < col("homeScore")).as("lost"), col("is_conf"))))
        .as("s"))
      .select(col("s.*"))

    val record = sides.groupBy(col("teamId")).agg(
      sum(when(col("won"), 1L).otherwise(0L)).as("wins"),
      sum(when(col("lost"), 1L).otherwise(0L)).as("losses"),
      sum(when(col("won") && col("is_conf"), 1L).otherwise(0L)).as("conf_wins"),
      sum(when(col("lost") && col("is_conf"), 1L).otherwise(0L)).as("conf_losses"))

    // D1 spine: every team with adjusted ratings keeps a row even with
    // no games (reference :63-79); teams without ratings are dropped
    val adjSel = adj.select(col("teamid").as("teamId"),
      colFirst(adj, Seq("offenserating", "offensiveRating"), "double").as("adj_off_rating"),
      colFirst(adj, Seq("defenserating", "defensiveRating"), "double").as("adj_def_rating"),
      col("netrating").as("adj_net_rating"))
    val spine = adjSel.select(col("teamId")).distinct()

    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId"), col("rating").as("srs_rating"))

    // Four Factors + pace: pass-throughs from the PBP season rollup
    // (reference :126-175); margin derived when both ppg sides present
    val rollSel = pbpRollup.select(col("teamid").as("teamId"),
      colOrNull(pbpRollup, "team_points_per_game", "double").as("ppg"),
      colOrNull(pbpRollup, "opp_points_per_game", "double").as("opp_ppg"),
      colOrNull(pbpRollup, "team_efg_pct", "double").as("efg_pct"),
      colOrNull(pbpRollup, "opp_efg_pct", "double").as("opp_efg_pct"),
      colOrNull(pbpRollup, "team_tov_ratio", "double").as("tov_ratio"),
      colOrNull(pbpRollup, "opp_tov_ratio", "double").as("opp_tov_ratio"),
      colOrNull(pbpRollup, "team_oreb_pct", "double").as("oreb_pct"),
      colOrNull(pbpRollup, "opp_oreb_pct", "double").as("opp_oreb_pct"),
      colOrNull(pbpRollup, "team_ft_rate", "double").as("ft_rate"),
      colOrNull(pbpRollup, "opp_ft_rate", "double").as("opp_ft_rate"),
      colOrNull(pbpRollup, "pace", "double").as("pace"))

    // recruiting: join on lower(committedTo) == lower(school)
    val recAgg = recruiting
      .join(broadcast(dim.select(lower(col("school")).as("__school"),
        col("teamId"))), lower(col("committedTo")) === col("__school"))
      .groupBy(col("teamId"))
      .agg(
        avg(col("rating")).as("recruiting_avg_rating"),
        count(col("rating")).as("recruiting_class_size"),
        max(col("stars")).as("recruiting_top_star"))

    val w = coalesce(col("wins"), lit(0L))
    val l = coalesce(col("losses"), lit(0L))
    val cw = coalesce(col("conf_wins"), lit(0L))
    val cl = coalesce(col("conf_losses"), lit(0L))
    spine
      // record is one row per team post-agg — always dim-sized, but the
      // static planner only sees the pre-agg fact cardinality, so hint it
      .join(broadcast(record), Seq("teamId"), "left")
      .join(broadcast(adjSel), Seq("teamId"), "left")
      .join(broadcast(srsSel), Seq("teamId"), "left")
      .join(broadcast(rollSel), Seq("teamId"), "left")
      .join(broadcast(recAgg), Seq("teamId"), "left")
      .join(broadcast(dim), Seq("teamId"), "left")
      .withColumn("season", lit(season))
      .select(
        col("teamId"), col("season"), col("school").as("team"),
        col("conference"),
        w.as("wins"), l.as("losses"),
        when(w + l > 0, w / (w + l).cast("double")).as("win_pct"),
        cw.as("conf_wins"), cl.as("conf_losses"),
        when(cw + cl > 0, cw / (cw + cl).cast("double")).as("conf_win_pct"),
        col("ppg"), col("opp_ppg"),
        when(col("ppg").isNotNull && col("opp_ppg").isNotNull,
          col("ppg") - col("opp_ppg")).as("margin"),
        col("adj_off_rating"), col("adj_def_rating"), col("adj_net_rating"),
        col("srs_rating"),
        col("efg_pct"), col("opp_efg_pct"),
        col("tov_ratio"), col("opp_tov_ratio"),
        col("oreb_pct"), col("opp_oreb_pct"),
        col("ft_rate"), col("opp_ft_rate"), col("pace"),
        col("recruiting_avg_rating"), col("recruiting_top_star"),
        col("recruiting_class_size"))
  }
}
