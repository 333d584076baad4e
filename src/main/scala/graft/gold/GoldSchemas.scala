package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-schema contracts for the gold tables — the engine analog of
  * the reference's normalize_records + TABLE_SPECS
  * (/root/reference/normalize.py:10-45,593-790,853-880): declared
  * primary keys, per-column type hints, alphabetical column order, and
  * first-wins PK dedup. `conform` is pure projection/cast — no shuffle;
  * `dedupeByPk` is one keyed window.
  */
object GoldSchemas {

  final case class TableSpec(
      name: String,
      primaryKeys: Seq[String],
      typeHints: Map[String, DataType])

  /** Shared hints applied to every table (reference COMMON_TYPE_HINTS). */
  val CommonHints: Map[String, DataType] = Map(
    "id" -> LongType, "gameId" -> LongType, "playerId" -> LongType,
    "teamId" -> LongType, "homeTeamId" -> LongType, "awayTeamId" -> LongType,
    "season" -> IntegerType, "year" -> IntegerType, "week" -> IntegerType,
    "date" -> StringType)

  val Specs: Map[String, TableSpec] = Map(
    "team_power_rankings" -> TableSpec("team_power_rankings",
      Seq("teamId", "season"), Map(
        "adj_off_rating" -> DoubleType, "adj_def_rating" -> DoubleType,
        "adj_net_rating" -> DoubleType, "ranking_offense" -> LongType,
        "ranking_defense" -> LongType, "ranking_net" -> LongType,
        "srs_rating" -> DoubleType, "ap_rank" -> LongType,
        "coaches_rank" -> LongType, "pbp_off_eff" -> DoubleType,
        "pbp_def_eff" -> DoubleType, "pbp_net_eff" -> DoubleType,
        "pbp_adj_off_eff" -> DoubleType, "pbp_adj_def_eff" -> DoubleType,
        "pbp_adj_net_eff" -> DoubleType, "pbp_pace" -> DoubleType,
        "games_played" -> LongType, "composite_rank" -> DoubleType)),
    "game_predictions_features" -> TableSpec("game_predictions_features",
      Seq("gameId", "teamId"), Map(
        "opponentId" -> LongType, "is_home" -> BooleanType,
        "is_conference_game" -> BooleanType, "spread" -> DoubleType,
        "over_under" -> DoubleType, "team_moneyline" -> DoubleType,
        "opp_moneyline" -> DoubleType, "team_score" -> LongType,
        "opp_score" -> LongType, "team_win" -> BooleanType)),
    "player_season_impact" -> TableSpec("player_season_impact",
      Seq("playerId", "season"), Map(
        "games" -> LongType, "minutes" -> DoubleType,
        "recruiting_rank" -> LongType, "recruiting_stars" -> LongType,
        "recruiting_rating" -> DoubleType)),
    "market_lines_analysis" -> TableSpec("market_lines_analysis",
      Seq("gameId", "provider"), Map(
        "home_score" -> LongType, "away_score" -> LongType,
        "total_points" -> LongType, "home_margin" -> LongType,
        "home_win" -> BooleanType, "home_covered" -> BooleanType,
        "over_hit" -> BooleanType, "spread" -> DoubleType,
        "over_under" -> DoubleType, "ats_margin" -> DoubleType,
        "total_vs_line" -> DoubleType, "spread_error" -> DoubleType)),
    "team_season_summary" -> TableSpec("team_season_summary",
      Seq("teamId", "season"), Map(
        "wins" -> LongType, "losses" -> LongType, "win_pct" -> DoubleType,
        "conf_wins" -> LongType, "conf_losses" -> LongType,
        "conf_win_pct" -> DoubleType,
        "recruiting_top_star" -> LongType,
        "recruiting_class_size" -> LongType)),
    "team_adjusted_efficiencies" -> TableSpec("team_adjusted_efficiencies",
      Seq("teamId", "season", "rating_date"), Map(
        "rating_date" -> StringType, "adj_oe" -> DoubleType,
        "adj_de" -> DoubleType, "adj_tempo" -> DoubleType,
        "barthag" -> DoubleType, "adj_margin" -> DoubleType,
        "games_played" -> LongType)),
    "team_adjusted_efficiencies_no_garbage" -> TableSpec(
      "team_adjusted_efficiencies_no_garbage",
      Seq("teamId", "season", "rating_date"), Map(
        "rating_date" -> StringType, "adj_oe" -> DoubleType,
        "adj_de" -> DoubleType, "adj_tempo" -> DoubleType,
        "barthag" -> DoubleType, "adj_margin" -> DoubleType,
        "games_played" -> LongType)))

  /** Alphabetical column order + hint casts over the PRESENT columns
    * (reference normalize_records: the schema is the union of record
    * fields, sorted; hints win over inferred types). */
  def conform(df: DataFrame, table: String): DataFrame = {
    val hints = Specs.get(table).map(_.typeHints).getOrElse(Map.empty) ++
      CommonHints
    val cols = df.columns.sorted.map { c =>
      hints.get(c) match {
        case Some(t) => col(c).cast(t).as(c)
        case None => col(c)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** First-wins dedup by the declared primary key under a deterministic
    * order (reference dedupe_records keeps the first-seen row; we pin
    * "first" to the given ordering column for reproducibility). */
  def dedupeByPk(df: DataFrame, table: String,
      ord: org.apache.spark.sql.Column): DataFrame =
    Specs.get(table).filter(_.primaryKeys.nonEmpty).fold(df) { spec =>
      val w = Window.partitionBy(spec.primaryKeys.map(col): _*).orderBy(ord)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
}
