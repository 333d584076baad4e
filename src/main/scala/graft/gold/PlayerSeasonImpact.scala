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

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
  import graft.silver.Normalize

  private def safeDiv(n: Column, d: Column, scale: Double = 1.0) =
    when(d.isNotNull && d > 0, n * scale / d)

  private val maSchema = StructType(Seq(
    StructField("made", DoubleType), StructField("attempted", DoubleType)))
  private val totSchema = StructType(Seq(StructField("total", DoubleType)))

  private def firstName(df: DataFrame, names: Seq[String]): Option[String] =
    names.find(df.columns.contains)

  /** Numeric-or-numeric-string stat column (reference _to_float,
    * player_season_impact.py:249-256): bad strings go null, not error. */
  private def statCol(df: DataFrame, names: Seq[String]): Column =
    firstName(df, names).map(n => expr(s"try_cast(`$n` AS DOUBLE)"))
      .getOrElse(lit(null).cast("double"))

  /** made/attempted pair: explicit columns win; else parse the raw
    * "{'made': 175, 'attempted': 367, ...}" dict string (reference
    * :52-70 _parse_made_attempted over fieldGoals/threePointFieldGoals/
    * freeThrows). */
  private def madeAtt(df: DataFrame, made: Seq[String], att: Seq[String],
      raw: String): (Column, Column) =
    (firstName(df, made), firstName(df, Seq(raw))) match {
      case (Some(_), _) => (statCol(df, made), statCol(df, att))
      case (None, Some(r)) =>
        val p = Normalize.lenientFromJsonStruct(col(r), maSchema)
        (p.getField("made"), p.getField("attempted"))
      case _ => (lit(null).cast("double"), lit(null).cast("double"))
    }

  /** Normalize raw silver player stats to the canonical flat shape the
    * metric derivations expect (reference :40-75 candidate-name reads +
    * dict-string healing; the rebounds column may itself be a
    * "{'offensive': …, 'total': …}" repr). */
  def normalizeStats(stats: DataFrame): DataFrame = {
    val (fgm, fga) = madeAtt(stats,
      Seq("fieldGoalsMade", "fgm", "fg"), Seq("fieldGoalsAttempted", "fga"),
      "fieldGoals")
    val (fg3m, fg3a) = madeAtt(stats,
      Seq("threePointFieldGoalsMade", "fg3m", "threeFGM", "threesMade"),
      Seq("threePointFieldGoalsAttempted", "fg3a", "threeFGA", "threesAttempted"),
      "threePointFieldGoals")
    val (ftm, fta) = madeAtt(stats,
      Seq("freeThrowsMade", "ftm", "ft"), Seq("freeThrowsAttempted", "fta"),
      "freeThrows")
    val rebRaw = firstName(stats, Seq("rebounds", "totalRebounds", "reb", "trb"))
    val reb = rebRaw match {
      case Some(n) if stats.schema(n).dataType == StringType =>
        // numeric strings cast; dict-repr strings fall through to total
        coalesce(expr(s"try_cast(`$n` AS DOUBLE)"),
          Normalize.lenientFromJsonStruct(col(n), totSchema).getField("total"))
      case Some(n) => col(n).cast("double")
      case None => lit(null).cast("double")
    }
    stats.select(
      IoHelpers.colFirst(stats, Seq("playerId", "athleteId", "id"), "bigint").as("playerId"),
      IoHelpers.colFirst(stats, Seq("team", "school", "teamName"), "string").as("team"),
      IoHelpers.colFirst(stats, Seq("conference", "conf"), "string").as("conference"),
      statCol(stats, Seq("games", "gamesPlayed", "gp", "g")).as("games"),
      statCol(stats, Seq("minutes", "minutesPlayed", "min", "mpg")).as("minutes"),
      statCol(stats, Seq("points", "pts")).as("points"),
      reb.as("rebounds"),
      statCol(stats, Seq("assists", "ast")).as("assists"),
      statCol(stats, Seq("steals", "stl")).as("steals"),
      statCol(stats, Seq("blocks", "blk")).as("blocks"),
      statCol(stats, Seq("turnovers", "to", "tov")).as("turnovers"),
      fgm.as("fieldGoalsMade"), fga.as("fieldGoalsAttempted"),
      fg3m.as("threePointFieldGoalsMade"), fg3a.as("threePointFieldGoalsAttempted"),
      ftm.as("freeThrowsMade"), fta.as("freeThrowsAttempted"))
  }

  def build(playerStats: DataFrame, recruiting: DataFrame, season: Int): DataFrame = {
    val rec = recruiting.select(
      IoHelpers.colFirst(recruiting, Seq("playerId", "athleteId", "id"), "bigint")
        .as("playerId"), // reference :278 candidate reads
      col("stars").as("recruiting_stars"),
      col("rating").as("recruiting_rating"),
      col("ranking").as("recruiting_rank"))

    normalizeStats(playerStats)
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
        // reference emits games as int(gp) (:158)
        col("games").cast("long").as("games"), col("minutes"), col("mpg"),
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
