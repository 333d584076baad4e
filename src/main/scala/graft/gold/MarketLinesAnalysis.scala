package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold: market_lines_analysis — lines/spreads merged with game outcomes
  * for ATS analysis; one row per game per provider (semantics per
  * /root/reference/gold/market_lines_analysis.py:19-162; SURVEY §7.2's
  * minimum slice).
  *
  * Spark shape: first-wins dedups via row_number, INNER join lines↔games
  * on gameId ("only games with both lines and outcomes",
  * market_lines_analysis.py:94), broadcast dim_teams joined twice
  * (home/away aliases), then pure column derivations. One shuffle on
  * gameId; dims broadcast; scales linearly in lines volume.
  */
object MarketLinesAnalysis {

  /** First-wins dedup under a deterministic order (SURVEY §1.5). */
  private def dedupFirst(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  def build(lines: DataFrame, games: DataFrame, dimTeams: DataFrame,
      season: Int): DataFrame = {
    val l = dedupFirst(lines, Seq("gameId", "provider"), "gameId")
    // candidate-name score reads (reference :58-59 pydict_get_first)
    val g0 = games
      .withColumn("homeScore",
        IoHelpers.colFirst(games, Seq("homeScore", "homePoints"), "long"))
      .withColumn("awayScore",
        IoHelpers.colFirst(games, Seq("awayScore", "awayPoints"), "long"))
    val g = dedupFirst(g0, Seq("gameId"), "startDate")
      .select(col("gameId"), col("homeTeamId"), col("awayTeamId"),
        col("homeScore"), col("awayScore"),
        substring(col("startDate"), 1, 10).as("game_date"))
    val dimH = dimTeams.select(col("teamId").as("homeTeamId"),
      col("school").as("home_team"), col("conference").as("home_conference"))
    val dimA = dimTeams.select(col("teamId").as("awayTeamId"),
      col("school").as("away_team"), col("conference").as("away_conference"))

    l.join(g, Seq("gameId"), "inner")
      .join(broadcast(dimH), Seq("homeTeamId"), "left")
      .join(broadcast(dimA), Seq("awayTeamId"), "left")
      .withColumn("season", lit(season))
      .withColumn("total_points", col("homeScore") + col("awayScore"))
      .withColumn("home_margin", col("homeScore") - col("awayScore"))
      .withColumn("home_win", col("homeScore") > col("awayScore"))
      .withColumn("ats_margin",
        col("home_margin").cast("double") + col("spread"))
      .withColumn("home_covered", col("ats_margin") > 0)
      .withColumn("spread_error",
        abs(col("home_margin").cast("double") - (-col("spread"))))
      .withColumn("total_vs_line",
        col("total_points").cast("double") - col("overUnder"))
      .withColumn("over_hit", col("total_points").cast("double") > col("overUnder"))
      .select(
        col("gameId"), col("season"), col("game_date"), col("provider"),
        col("home_team"), col("away_team"),
        col("home_conference"), col("away_conference"),
        col("spread"), col("overUnder").as("over_under"),
        col("homeMoneyline").as("home_moneyline"),
        col("awayMoneyline").as("away_moneyline"),
        col("homeScore").as("home_score"), col("awayScore").as("away_score"),
        col("total_points"), col("home_margin"), col("home_win"),
        col("home_covered"), col("over_hit"), col("ats_margin"),
        col("total_vs_line"), col("spread_error"))
  }
}
