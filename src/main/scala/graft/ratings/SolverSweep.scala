package graft.ratings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE pass of the iterative SOS solver as a declarative DataFrame
  * transform — the (league/opp)^alpha-weighted re-estimate from
  * `IterativeRatings.solve` (reference iterative_ratings.py:225-297)
  * with unit weights and damping 1. SQL-expressible, so the driver's
  * DuckDB gate can hash-match it (dm10b); `RatingsPropertiesSpec` pins
  * it to `solve(maxIter = 1)` so the procedural loop and the gated
  * single step can't drift apart.
  *
  * Scale shape: two keyed aggregations over the observation table plus
  * one broadcast join of the (tiny) per-team init state — no driver
  * collect, works at any fact cardinality.
  *
  * Input columns: team, opp, pts, opp_pts, poss (double), is_home
  * (boolean; neutral not modeled — unit-weight home/away pairs).
  */
object SolverSweep {

  def oneSweep(obs: DataFrame,
      hca: Double = 4.0266,
      alpha: Double = 0.85,
      clampLo: Double = 40.0,
      clampHi: Double = 200.0): DataFrame = {
    def clamp(c: org.apache.spark.sql.Column) =
      least(greatest(c, lit(clampLo)), lit(clampHi))

    // per-game HCA-adjusted efficiencies (gameEff): a - b == a + (-b)
    val eff = obs
      .withColumn("go", col("pts") / col("poss") * 100.0
        + when(col("is_home"), -hca).otherwise(hca))
      .withColumn("gd", col("opp_pts") / col("poss") * 100.0
        + when(col("is_home"), hca).otherwise(-hca))

    val league = eff.agg((sum(col("pts")) / sum(col("poss")) * 100.0).as("league"))

    // init state = clamped raw per-team mean efficiency
    val init = eff.groupBy(col("team")).agg(
        (sum(col("go")) / count(lit(1))).as("ro"),
        (sum(col("gd")) / count(lit(1))).as("rd"))
      .select(col("team"), clamp(col("ro")).as("oe0"), clamp(col("rd")).as("de0"))
    val oppInit = init.select(col("team").as("opp"),
      col("oe0").as("opp_oe"), col("de0").as("opp_de"))

    // one re-estimate pass: scale each game eff by (league/opp)^alpha
    eff.join(broadcast(oppInit), Seq("opp"))
      .crossJoin(broadcast(league))
      .groupBy(col("team"))
      .agg(
        count(lit(1)).as("games"),
        (sum(col("go") * pow(col("league") / col("opp_de"), alpha))
          / count(lit(1))).as("to"),
        (sum(col("gd") * pow(col("league") / col("opp_oe"), alpha))
          / count(lit(1))).as("td"))
      .select(col("team"), col("games"),
        clamp(col("to")).as("adj_oe1"), clamp(col("td")).as("adj_de1"))
  }
}
