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

  import IoHelpers.colOrNull

  private def safeDiv(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
      scale: Double = 1.0) =
    when(d.isNotNull && d > 0, n * scale / d)

  def build(playerStats: DataFrame, recruiting: DataFrame, season: Int): DataFrame = {
    val rec = recruiting.select(col("playerId"),
      col("stars").as("recruiting_stars"),
      col("rating").as("recruiting_rating"),
      col("ranking").as("recruiting_rank"))

    playerStats
      .join(broadcast(rec), Seq("playerId"), "left")
      .withColumn("steals", colOrNull(playerStats, "steals", "double"))
      .withColumn("blocks", colOrNull(playerStats, "blocks", "double"))
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
      // reference :133-135: usage needs tov PRESENT (a null turnover
      // column nulls the rate, it is not treated as zero)
      .withColumn("usage_rate", when(col("turnovers").isNotNull,
        safeDiv(col("fieldGoalsAttempted") + lit(0.44) * col("freeThrowsAttempted")
          + col("turnovers"), col("minutes"))))
      .withColumn("per_40_pts", safeDiv(col("points"), col("minutes"), 40.0))
      .withColumn("per_40_reb", safeDiv(col("rebounds"), col("minutes"), 40.0))
      .withColumn("per_40_ast", safeDiv(col("assists"), col("minutes"), 40.0))
      .withColumn("ast_to_ratio", safeDiv(col("assists"), col("turnovers")))
      .withColumn("season", lit(season))
      .select(
        col("playerId"), col("season"), col("team"), col("conference"),
        col("games"), col("minutes"), col("mpg"),
        col("points"), col("ppg"), col("rebounds"), col("rpg"),
        col("assists"), col("apg"), col("steals"), col("blocks"),
        col("turnovers"),
        col("fieldGoalsMade").as("fgm"),
        col("fieldGoalsAttempted").as("fga"), col("fg_pct"),
        col("threePointFieldGoalsMade").as("fg3m"),
        col("threePointFieldGoalsAttempted").as("fg3a"), col("fg3_pct"),
        col("freeThrowsMade").as("ftm"),
        col("freeThrowsAttempted").as("fta"), col("ft_pct"),
        col("efg_pct"), col("true_shooting"), col("usage_rate"),
        col("per_40_pts"), col("per_40_reb"), col("per_40_ast"),
        col("ast_to_ratio"), col("recruiting_rank"),
        col("recruiting_stars"), col("recruiting_rating"))
  }
}
