package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold: player_season_impact — per-player efficiency/usage profile
  * with recruiting pedigree (semantics per
  * /root/reference/gold/player_season_impact.py:79-308).
  *
  * Spark shape: zero-safe ratio derivations as codegen'd column
  * expressions (SURVEY F7/F8: eFG%, TS%, usage, per-40), broadcast left
  * join to recruiting by playerId (J4). The reference's candidate-name
  * fallback reads (games vs gamesPlayed vs gp) are handled upstream by
  * LakeIO.coalesceCandidates.
  */
object PlayerSeasonImpact {

  private def safeDiv(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
      scale: Double = 1.0) =
    when(d.isNotNull && d > 0, n * scale / d)

  def build(playerStats: DataFrame, recruiting: DataFrame, season: Int): DataFrame = {
    val rec = recruiting.select(col("playerId"),
      col("stars").as("recruit_stars"), col("rating").as("recruit_rating"),
      col("ranking").as("recruit_ranking"))

    playerStats
      .join(broadcast(rec), Seq("playerId"), "left")
      .withColumn("mpg", safeDiv(col("minutes"), col("games")))
      .withColumn("ppg", safeDiv(col("points"), col("games")))
      .withColumn("rpg", safeDiv(col("rebounds"), col("games")))
      .withColumn("apg", safeDiv(col("assists"), col("games")))
      .withColumn("fg_pct", safeDiv(col("fieldGoalsMade"), col("fieldGoalsAttempted")))
      .withColumn("fg3_pct", safeDiv(col("threePointFieldGoalsMade"),
        col("threePointFieldGoalsAttempted")))
      .withColumn("ft_pct", safeDiv(col("freeThrowsMade"), col("freeThrowsAttempted")))
      .withColumn("efg_pct", safeDiv(
        col("fieldGoalsMade") + lit(0.5) * col("threePointFieldGoalsMade"),
        col("fieldGoalsAttempted")))
      .withColumn("true_shooting", safeDiv(col("points"),
        lit(2.0) * (col("fieldGoalsAttempted") + lit(0.44) * col("freeThrowsAttempted"))))
      .withColumn("usage_rate", safeDiv(
        col("fieldGoalsAttempted") + lit(0.44) * col("freeThrowsAttempted")
          + coalesce(col("turnovers"), lit(0.0)),
        col("minutes")))
      .withColumn("per_40_pts", safeDiv(col("points"), col("minutes"), 40.0))
      .withColumn("per_40_reb", safeDiv(col("rebounds"), col("minutes"), 40.0))
      .withColumn("per_40_ast", safeDiv(col("assists"), col("minutes"), 40.0))
      .withColumn("ast_to_ratio", safeDiv(col("assists"), col("turnovers")))
      .withColumn("season", lit(season))
      .select(
        col("playerId"), col("season"), col("team"), col("conference"),
        col("games"), col("minutes"), col("mpg"), col("ppg"), col("rpg"),
        col("apg"), col("fg_pct"), col("fg3_pct"), col("ft_pct"),
        col("efg_pct"), col("true_shooting"), col("usage_rate"),
        col("per_40_pts"), col("per_40_reb"), col("per_40_ast"),
        col("ast_to_ratio"), col("recruit_stars"), col("recruit_rating"),
        col("recruit_ranking"))
  }
}
