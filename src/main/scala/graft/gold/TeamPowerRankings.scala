package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold: team_power_rankings — adjusted-ratings spine + SRS + latest
  * polls + PBP rollup, with a composite percentile rank (semantics per
  * /root/reference/gold/team_power_rankings.py:34-296).
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

  /** Percentile over distinct values of `metric`, joined back as `out`. */
  private def withDistinctPercentile(df: DataFrame, metric: String, out: String): DataFrame = {
    val dv = df.filter(col(metric).isNotNull).select(col(metric).as("__v")).distinct()
    val w = Window.orderBy(col("__v").asc)
    val n = count(lit(1)).over(Window.partitionBy())
    val ranks = dv.select(col("__v"),
      when(n > 1, (row_number().over(w) - 1) * lit(100.0) / (n - 1))
        .otherwise(lit(50.0)).as(out))
    df.join(broadcast(ranks), df(metric) === ranks("__v"), "left").drop("__v")
  }

  def build(adj: DataFrame, srs: DataFrame, polls: DataFrame,
      pbpAdj: DataFrame, dimTeams: DataFrame, season: Int): DataFrame = {
    val spine = adj.select(col("teamid").as("teamId"), col("team"),
      col("conference"), col("offenserating").as("adj_off"),
      col("defenserating").as("adj_def"), col("netrating").as("adj_net"))

    val srsSel = srs.filter(col("season") === season)
      .select(col("teamId"), col("rating").as("srs"))

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

    val pbpSel = pbpAdj.select(col("teamid").as("teamId"),
      col("adj_net_eff").as("pbp_adj_net"))

    val dimFill = dimTeams.select(col("teamId"),
      col("school").as("__school"), col("conference").as("__conf"))

    val joined = spine
      .join(broadcast(srsSel), Seq("teamId"), "left")
      .join(broadcast(pollCols), Seq("teamId"), "left")
      .join(broadcast(pbpSel), Seq("teamId"), "left")
      .join(broadcast(dimFill), Seq("teamId"), "left")
      // fill-if-null from dim (reference J1 fill behavior)
      .withColumn("team", coalesce(col("team"), col("__school")))
      .withColumn("conference", coalesce(col("conference"), col("__conf")))
      .drop("__school", "__conf")

    val ranked = withDistinctPercentile(
      withDistinctPercentile(
        withDistinctPercentile(joined, "adj_net", "__p_adj"),
        "pbp_adj_net", "__p_pbp"),
      "srs", "__p_srs")

    // composite = mean of AVAILABLE percentiles (null-aware)
    val avail = Seq("__p_adj", "__p_pbp", "__p_srs")
    val sumP = avail.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
    val nP = avail.map(c => when(col(c).isNotNull, 1).otherwise(0)).reduce(_ + _)
    ranked
      .withColumn("composite_rank", when(nP > 0, sumP / nP))
      .withColumn("season", lit(season))
      .select(
        col("teamId"), col("season"), col("team"), col("conference"),
        col("adj_off"), col("adj_def"), col("adj_net"), col("srs"),
        col("ap_rank"), col("coaches_rank"), col("pbp_adj_net"),
        col("composite_rank"))
  }
}
