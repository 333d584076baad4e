package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold: game_predictions_features — ML feature vectors, TWO rows per
  * game (one per side) with team/opponent ratings and first-provider
  * lines (semantics per
  * /root/reference/gold/game_predictions_features.py:35-290).
  *
  * Spark shape: the home/away unpivot is explode(array(struct…))
  * (SURVEY J2); team-side and opponent-side ratings come from the SAME
  * broadcast lookup joined twice under different aliases;
  * first-provider-wins lines = row_number over gameId ordered by a
  * deterministic provider order (SURVEY §7.4 hard-part 3 — the
  * reference depends on encounter order; we pin provider asc).
  */
object GamePredictionsFeatures {

  def build(games: DataFrame, adj: DataFrame, srs: DataFrame,
      lines: DataFrame, season: Int): DataFrame = {
    val g = games.filter(col("homeTeamId").isNotNull && col("awayTeamId").isNotNull)

    // one row per game-side: is_home, teamId, oppId, label margin
    val sides = g.select(
        col("gameId"), substring(col("startDate"), 1, 10).as("game_date"),
        col("neutralSite"),
        explode(array(
          struct(lit(true).as("is_home"),
            col("homeTeamId").as("teamId"), col("awayTeamId").as("oppId"),
            (col("homeScore") - col("awayScore")).as("margin"),
            col("homeScore").as("team_score"), col("awayScore").as("opp_score")),
          struct(lit(false).as("is_home"),
            col("awayTeamId").as("teamId"), col("homeTeamId").as("oppId"),
            (col("awayScore") - col("homeScore")).as("margin"),
            col("awayScore").as("team_score"), col("homeScore").as("opp_score"))))
          .as("s"))
      .select(col("gameId"), col("game_date"), col("neutralSite"), col("s.*"))

    val ratings = adj.select(col("teamid").as("__tid"),
      col("offenserating").as("off"), col("defenserating").as("def"),
      col("netrating").as("net"))
    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId").as("__tid"), col("rating").as("srs"))

    // first provider wins, made deterministic by provider asc
    val lw = Window.partitionBy(col("gameId")).orderBy(col("provider").asc)
    val firstLines = lines.withColumn("__rn", row_number().over(lw))
      .filter(col("__rn") === 1)
      .select(col("gameId"), col("spread"), col("overUnder"))

    val t = ratings.toDF("teamId", "team_off", "team_def", "team_net")
    val o = ratings.toDF("oppId", "opp_off", "opp_def", "opp_net")
    val ts = srsSel.toDF("teamId", "team_srs")
    val os = srsSel.toDF("oppId", "opp_srs")

    sides
      .join(broadcast(t), Seq("teamId"), "left")
      .join(broadcast(o), Seq("oppId"), "left")
      .join(broadcast(ts), Seq("teamId"), "left")
      .join(broadcast(os), Seq("oppId"), "left")
      .join(broadcast(firstLines), Seq("gameId"), "left")
      // away side sees the negated home spread (reference :99-106)
      .withColumn("team_spread",
        when(col("is_home"), col("spread")).otherwise(-col("spread")))
      .withColumn("rating_diff", col("team_net") - col("opp_net"))
      .withColumn("srs_diff", col("team_srs") - col("opp_srs"))
      .withColumn("won", col("team_score") > col("opp_score"))
      .withColumn("season", lit(season))
      .select(
        col("gameId"), col("season"), col("game_date"), col("teamId"),
        col("oppId"), col("is_home"), col("neutralSite"),
        col("team_off"), col("team_def"), col("team_net"), col("team_srs"),
        col("opp_off"), col("opp_def"), col("opp_net"), col("opp_srs"),
        col("rating_diff"), col("srs_diff"), col("team_spread"),
        col("overUnder").as("over_under"),
        col("margin"), col("won"))
  }
}
