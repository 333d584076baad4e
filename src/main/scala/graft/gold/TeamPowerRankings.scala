package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold: team_power_rankings — adjusted-ratings spine + SRS + latest
  * polls + PBP season rollup + PBP adjusted efficiencies, with a
  * composite percentile rank (semantics and the full output column set
  * per /root/reference/gold/team_power_rankings.py:34-296).
  *
  * Spark shape: chained broadcast left joins on the spine (SURVEY J1);
  * latest-poll-per-type = row_number over (pollType, teamId) ordered by
  * pollDate desc (W1); composite = mean of per-metric percentile ranks
  * computed over DISTINCT metric values — (rank-1)/(n-1)*100, single
  * value → 50 (reference :277-279) — via a rank table on the distinct
  * set joined back (A11), so the global window only ever sees the tiny
  * distinct-value set.
  */
object TeamPowerRankings {

  import IoHelpers.colOrNull

  /** Percentile over distinct values of `metric`, joined back as `out`.
    * Rank via the two-stage GlobalRank (range partition + local rank +
    * offsets) and n via a scalar agg — no single-partition window even
    * when the distinct metric set grows with the data (a11's pattern). */
  private def withDistinctPercentile(df: DataFrame, metric: String, out: String): DataFrame = {
    val dv = df.filter(col(metric).isNotNull).select(col(metric).as("__v")).distinct()
    val n = dv.agg(count(lit(1)).as("__n"))
    val ranks = graft.operators.GlobalRank.zeroBasedIndex(dv, "__v")
      .crossJoin(broadcast(n))
      .select(col("__v"),
        when(col("__n") > 1, col("idx") * lit(100.0) / (col("__n") - 1))
          .otherwise(lit(50.0)).as(out))
    df.join(broadcast(ranks), df(metric) === ranks("__v"), "left").drop("__v")
  }

  def build(adj: DataFrame, srs: DataFrame, polls: DataFrame,
      pbpRollup: DataFrame, pbpAdj: DataFrame, dimTeams: DataFrame,
      season: Int): DataFrame = {
    val spine = adj.select(col("teamid").as("teamId"), col("team"),
      col("conference"),
      IoHelpers.colFirst(adj, Seq("offenserating", "offensiveRating"), "double")
        .as("adj_off_rating"),
      IoHelpers.colFirst(adj, Seq("defenserating", "defensiveRating"), "double")
        .as("adj_def_rating"),
      col("netrating").as("adj_net_rating"),
      // ranking_* are pass-throughs from the ratings feed (reference
      // :44-46); absent column -> all-null
      colOrNull(adj, "ranking_offense", "bigint").as("ranking_offense"),
      colOrNull(adj, "ranking_defense", "bigint").as("ranking_defense"),
      colOrNull(adj, "ranking_net", "bigint").as("ranking_net"))

    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId"), col("rating").as("srs_rating"))

    // latest poll snapshot per (pollType, teamId); AP + Coaches pivoted
    val pw = Window.partitionBy(col("pollType"), col("teamId"))
      .orderBy(col("pollDate").desc)
    val latest = polls.withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") === 1)
    val pollCols = latest.groupBy(col("teamId")).agg(
      min(when(lower(col("pollType")).isin("ap top 25", "ap"),
        col("ranking"))).as("ap_rank"),
      min(when(lower(col("pollType")).isin("coaches poll", "coaches"),
        col("ranking"))).as("coaches_rank"))

    // PBP season rollup -> raw efficiencies + pace (reference :140-180):
    // off = pts/poss*100 when poss > 0; pace = (poss/gp)*(40/avg_mins),
    // avg_mins defaulting to a 40-minute game when minutes are missing
    val rollSel = pbpRollup.select(col("teamid").as("teamId"),
      colOrNull(pbpRollup, "team_points_total", "double").as("__tp"),
      colOrNull(pbpRollup, "opp_points_total", "double").as("__op"),
      colOrNull(pbpRollup, "team_possessions", "double").as("__tposs"),
      colOrNull(pbpRollup, "opp_possessions", "double").as("__oposs"),
      colOrNull(pbpRollup, "games_played", "double").as("__gp"),
      colOrNull(pbpRollup, "game_minutes_total", "double").as("__mins"))

    val pbpSel = pbpAdj.select(col("teamid").as("teamId"),
      colOrNull(pbpAdj, "adj_off_eff", "double").as("pbp_adj_off_eff"),
      colOrNull(pbpAdj, "adj_def_eff", "double").as("pbp_adj_def_eff"),
      col("adj_net_eff").as("pbp_adj_net_eff"))

    val dimFill = dimTeams.select(col("teamId"),
      col("school").as("__school"), col("conference").as("__conf"))

    val joined = spine
      .join(broadcast(srsSel), Seq("teamId"), "left")
      .join(broadcast(pollCols), Seq("teamId"), "left")
      .join(broadcast(rollSel), Seq("teamId"), "left")
      .join(broadcast(pbpSel), Seq("teamId"), "left")
      .join(broadcast(dimFill), Seq("teamId"), "left")
      // fill-if-null from dim (reference J1 fill behavior)
      .withColumn("team", coalesce(col("team"), col("__school")))
      .withColumn("conference", coalesce(col("conference"), col("__conf")))
      .drop("__school", "__conf")
      .withColumn("pbp_off_eff",
        when(col("__tposs") > 0, col("__tp") / col("__tposs") * 100))
      .withColumn("pbp_def_eff",
        when(col("__oposs") > 0, col("__op") / col("__oposs") * 100))
      .withColumn("pbp_net_eff",
        when(col("pbp_off_eff").isNotNull && col("pbp_def_eff").isNotNull,
          col("pbp_off_eff") - col("pbp_def_eff")))
      // __gp > 0 guard matters: this column is materialized standalone by
      // the spine checkpoint below, so it can no longer rely on being
      // inlined under pbp_pace's own __gp > 0 branch (ANSI divide-by-zero)
      .withColumn("__avg_mins",
        when(col("__mins") > 0 && col("__gp") > 0, col("__mins") / col("__gp"))
          .otherwise(lit(40.0)))
      .withColumn("pbp_pace",
        when(col("__gp") > 0 && col("__tposs").isNotNull,
          col("__tposs") / col("__gp") * (lit(40.0) / col("__avg_mins"))))
      .withColumn("games_played", col("__gp").cast("int"))

    // materialize the spine ONCE (team-cardinality — tiny): each of the
    // three percentile tables takes a distinct() over it, and an
    // unmaterialized lineage would re-run the whole join chain per metric
    val spine5 = joined.localCheckpoint(true)

    val ranked = withDistinctPercentile(
      withDistinctPercentile(
        withDistinctPercentile(spine5, "adj_net_rating", "__p_adj"),
        "pbp_adj_net_eff", "__p_pbp"),
      "srs_rating", "__p_srs")

    // composite = mean of AVAILABLE percentiles (null-aware)
    val avail = Seq("__p_adj", "__p_pbp", "__p_srs")
    val sumP = avail.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
    val nP = avail.map(c => when(col(c).isNotNull, 1).otherwise(0)).reduce(_ + _)
    ranked
      .withColumn("composite_rank", when(nP > 0, sumP / nP))
      .withColumn("season", lit(season))
      .select(
        col("teamId"), col("season"), col("team"), col("conference"),
        col("adj_off_rating"), col("adj_def_rating"), col("adj_net_rating"),
        col("ranking_offense"), col("ranking_defense"), col("ranking_net"),
        col("srs_rating"), col("ap_rank"), col("coaches_rank"),
        col("pbp_off_eff"), col("pbp_def_eff"), col("pbp_net_eff"),
        col("pbp_adj_off_eff"), col("pbp_adj_def_eff"), col("pbp_adj_net_eff"),
        col("pbp_pace"), col("games_played"), col("composite_rank"))
  }
}
