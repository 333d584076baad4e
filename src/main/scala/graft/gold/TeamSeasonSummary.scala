package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold: team_season_summary — one row per D1 team per season: W/L +
  * conference record, adjusted ratings, SRS, recruiting class quality
  * (semantics per /root/reference/gold/team_season_summary.py:20-360).
  *
  * Spark shape: the W/L record is the two-sided unpivot (SURVEY J9):
  * each game contributes one row from the home perspective and one from
  * the away perspective, then one groupBy(teamId) with conditional sums.
  * D1 restriction = left_semi join against the adjusted-ratings spine
  * (SURVEY P4); recruiting joins on lower(school) (SURVEY J5).
  */
object TeamSeasonSummary {

  def build(games: DataFrame, dimTeams: DataFrame, adj: DataFrame,
      srs: DataFrame, recruiting: DataFrame, season: Int): DataFrame = {
    val dim = dimTeams.select(col("teamId"), col("school"), col("conference"))
    val confOf = dim.select(col("teamId"), col("conference"))

    // conference-game flag needs both sides' conferences (non-null, equal)
    val g = games
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
      col("offenserating").as("adj_off"), col("defenserating").as("adj_def"),
      col("netrating").as("adj_net"))
    val spine = adjSel.select(col("teamId")).distinct()

    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId"), col("rating").as("srs"))

    // recruiting: join on lower(committedTo) == lower(school)
    val recAgg = recruiting
      .join(broadcast(dim.select(lower(col("school")).as("__school"),
        col("teamId"))), lower(col("committedTo")) === col("__school"))
      .groupBy(col("teamId"))
      .agg(
        avg(col("rating")).as("recruit_avg_rating"),
        count(col("rating")).as("recruit_class_size"),
        max(col("stars")).as("recruit_top_stars"))

    spine
      .join(record, Seq("teamId"), "left")
      .join(broadcast(adjSel), Seq("teamId"), "left")
      .join(broadcast(srsSel), Seq("teamId"), "left")
      .join(broadcast(recAgg), Seq("teamId"), "left")
      .join(broadcast(dim), Seq("teamId"), "left")
      .withColumn("season", lit(season))
      .select(
        col("teamId"), col("season"), col("school"), col("conference"),
        coalesce(col("wins"), lit(0L)).as("wins"),
        coalesce(col("losses"), lit(0L)).as("losses"),
        coalesce(col("conf_wins"), lit(0L)).as("conf_wins"),
        coalesce(col("conf_losses"), lit(0L)).as("conf_losses"),
        when(coalesce(col("wins"), lit(0L)) + coalesce(col("losses"), lit(0L)) > 0,
          coalesce(col("wins"), lit(0L)) /
            (coalesce(col("wins"), lit(0L)) + coalesce(col("losses"), lit(0L))).cast("double"))
          .as("win_pct"),
        col("adj_off"), col("adj_def"), col("adj_net"), col("srs"),
        col("recruit_avg_rating"), col("recruit_class_size"),
        col("recruit_top_stars"))
  }
}
