package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold: game_predictions_features — ML feature vectors, TWO rows per
  * game (one per side) with team/opponent names, ratings, SRS, PBP
  * rollup features, and first-provider lines (semantics and the full
  * output column set per
  * /root/reference/gold/game_predictions_features.py:35-290).
  *
  * Spark shape: the home/away unpivot is explode(array(struct…))
  * (SURVEY J2); team-side and opponent-side lookups come from the SAME
  * broadcast frame joined twice under different aliases;
  * first-provider-wins lines = row_number over gameId ordered by a
  * deterministic provider order (SURVEY §7.4 hard-part 3 — the
  * reference depends on encounter order; we pin provider asc).
  */
object GamePredictionsFeatures {

  import IoHelpers.{colFirst, colOrNull}

  def build(games: DataFrame, adj: DataFrame, srs: DataFrame,
      pbpRollup: DataFrame, lines: DataFrame, dimTeams: DataFrame,
      season: Int): DataFrame = {
    // candidate-name reads (reference :42-43 pydict_get_first)
    val g = games
      .withColumn("homeScore", colFirst(games, Seq("homeScore", "homePoints"), "long"))
      .withColumn("awayScore", colFirst(games, Seq("awayScore", "awayPoints"), "long"))
      .filter(col("homeTeamId").isNotNull && col("awayTeamId").isNotNull)

    // one row per game-side: is_home, teamId, opponentId, labels
    val sides = g.select(
        col("gameId"), substring(col("startDate"), 1, 10).as("game_date"),
        explode(array(
          struct(lit(true).as("is_home"),
            col("homeTeamId").as("teamId"), col("awayTeamId").as("opponentId"),
            col("homeScore").as("team_score"), col("awayScore").as("opp_score")),
          struct(lit(false).as("is_home"),
            col("awayTeamId").as("teamId"), col("homeTeamId").as("opponentId"),
            col("awayScore").as("team_score"), col("homeScore").as("opp_score"))))
          .as("s"))
      .select(col("gameId"), col("game_date"), col("s.*"))

    val ratings = adj.select(col("teamid").as("tid"),
      colFirst(adj, Seq("offenserating", "offensiveRating"), "double").as("off"),
      colFirst(adj, Seq("defenserating", "defensiveRating"), "double").as("def"),
      col("netrating").as("net"))
    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId").as("tid"), col("rating").as("srs"))
    val dim = dimTeams.select(col("teamId").as("tid"),
      col("school"), col("conference"))
    val ru = pbpRollup.select(col("teamid").as("tid"),
      colOrNull(pbpRollup, "team_points_per_game", "double").as("ppg"),
      colOrNull(pbpRollup, "opp_points_per_game", "double").as("opp_ppg"),
      colOrNull(pbpRollup, "pace", "double").as("pace"),
      colOrNull(pbpRollup, "team_efg_pct", "double").as("efg"),
      colOrNull(pbpRollup, "team_tov_ratio", "double").as("tov"),
      colOrNull(pbpRollup, "team_oreb_pct", "double").as("oreb"),
      colOrNull(pbpRollup, "team_ft_rate", "double").as("ftr"))

    // first provider wins, made deterministic by provider asc
    val lw = Window.partitionBy(col("gameId")).orderBy(col("provider").asc)
    val firstLines = lines.withColumn("__rn", row_number().over(lw))
      .filter(col("__rn") === 1)
      .select(col("gameId"), col("spread"), col("overUnder"),
        col("homeMoneyline"), col("awayMoneyline"))

    val t = ratings.toDF("teamId", "team_adj_off", "team_adj_def", "team_adj_net")
    val o = ratings.toDF("opponentId", "opp_adj_off", "opp_adj_def", "opp_adj_net")
    val ts = srsSel.toDF("teamId", "team_srs")
    val os = srsSel.toDF("opponentId", "opp_srs")
    val td = dim.toDF("teamId", "team_name", "team_conference")
    val od = dim.toDF("opponentId", "opp_name", "opp_conference")
    val tr = ru.toDF("teamId", "team_ppg", "team_opp_ppg", "team_pace",
      "team_efg_pct", "team_tov_ratio", "team_oreb_pct", "team_ft_rate")
    val or_ = ru.toDF("opponentId", "opp_ppg", "opp_opp_ppg", "opp_pace",
      "opp_efg_pct", "opp_tov_ratio", "opp_oreb_pct", "opp_ft_rate")

    sides
      .join(broadcast(td), Seq("teamId"), "left")
      .join(broadcast(od), Seq("opponentId"), "left")
      .join(broadcast(t), Seq("teamId"), "left")
      .join(broadcast(o), Seq("opponentId"), "left")
      .join(broadcast(ts), Seq("teamId"), "left")
      .join(broadcast(os), Seq("opponentId"), "left")
      .join(broadcast(tr), Seq("teamId"), "left")
      .join(broadcast(or_), Seq("opponentId"), "left")
      // lines are fact-sized (one row per game) — no broadcast hint; at
      // bench scale AQE converts to broadcast, at 100 TB it stays a
      // shuffle join co-partitioned on gameId
      .join(firstLines, Seq("gameId"), "left")
      // away side sees the negated home spread and the away moneyline
      // (reference :98-105)
      .withColumn("spread",
        when(col("is_home"), col("spread")).otherwise(-col("spread")))
      .withColumn("team_moneyline",
        when(col("is_home"), col("homeMoneyline")).otherwise(col("awayMoneyline")))
      .withColumn("opp_moneyline",
        when(col("is_home"), col("awayMoneyline")).otherwise(col("homeMoneyline")))
      .withColumn("is_conference_game",
        col("team_conference").isNotNull && col("opp_conference").isNotNull &&
          col("team_conference") === col("opp_conference"))
      .withColumn("team_win", col("team_score") > col("opp_score"))
      .withColumn("season", lit(season))
      .select(
        col("gameId"), col("season"), col("game_date"), col("teamId"),
        col("opponentId"), col("is_home"),
        col("team_name"), col("team_conference"),
        col("opp_name"), col("opp_conference"), col("is_conference_game"),
        col("spread"), col("overUnder").as("over_under"),
        col("team_moneyline"), col("opp_moneyline"),
        col("team_adj_off"), col("team_adj_def"), col("team_adj_net"),
        col("opp_adj_off"), col("opp_adj_def"), col("opp_adj_net"),
        col("team_srs"), col("opp_srs"),
        col("team_ppg"), col("team_opp_ppg"), col("team_pace"),
        col("opp_ppg"), col("opp_opp_ppg"), col("opp_pace"),
        col("team_efg_pct"), col("team_tov_ratio"),
        col("team_oreb_pct"), col("team_ft_rate"),
        col("opp_efg_pct"), col("opp_tov_ratio"),
        col("opp_oreb_pct"), col("opp_ft_rate"),
        col("team_score"), col("opp_score"), col("team_win"))
  }
}
