package graft.ratings

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spread-backtest harness (SURVEY §2.9 I5; semantics per
  * /root/reference/scripts/backtest_spreads.py:258-366): model vs book
  * margin errors (MAE/mean/std), closing-line value on games where the
  * model disagrees with the book by > 3, and simulated ATS betting ROI
  * at thresholds 1–7 under −110 juice.
  *
  * Spark shape: unlike the reference's driver loops, everything is one
  * DataFrame pass — the per-threshold ROI table is an explode over the
  * threshold list followed by a single conditional aggregation, so the
  * predictions table is scanned once regardless of threshold count.
  * Input: one row per game with model_margin, book_spread, actual_margin.
  */
object Backtest {

  val Thresholds: Seq[Int] = Seq(1, 2, 3, 4, 5, 6, 7)

  /** Error metrics + CLV. Output: one row. */
  def errorMetrics(predictions: DataFrame): DataFrame = {
    val p = predictions
      .withColumn("book_margin", -col("book_spread"))
      .withColumn("model_err", col("model_margin") - col("actual_margin"))
      .withColumn("book_err", col("book_margin") - col("actual_margin"))
      .withColumn("is_clv_game",
        abs(col("model_margin") - col("book_margin")) > 3)
      .withColumn("clv_win", col("is_clv_game") &&
        abs(col("model_err")) < abs(col("book_err")))
      .filter(!isnan(col("model_margin")) && col("model_margin").isNotNull)
    p.agg(
      count(lit(1)).as("n_games"),
      avg(abs(col("model_err"))).as("model_mae"),
      avg(abs(col("book_err"))).as("book_mae"),
      avg(col("model_err")).as("model_mean"),
      avg(col("book_err")).as("book_mean"),
      // population std (reference divides by n)
      sqrt(avg(col("model_err") * col("model_err"))
        - avg(col("model_err")) * avg(col("model_err"))).as("model_std"),
      sqrt(avg(col("book_err") * col("book_err"))
        - avg(col("book_err")) * avg(col("book_err"))).as("book_std"),
      sum(col("is_clv_game").cast("long")).as("clv_total"),
      sum(col("clv_win").cast("long")).as("clv_wins"))
      .withColumn("clv_rate",
        when(col("clv_total") > 0, col("clv_wins") / col("clv_total").cast("double"))
          .otherwise(0.0))
  }

  /** ROI table: one row per threshold. Bet home when model − book > t,
    * away when < −t; push on ats == 0; profit = 100·wins − 110·losses. */
  def roiTable(predictions: DataFrame): DataFrame = {
    val p = predictions
      .filter(!isnan(col("model_margin")) && col("model_margin").isNotNull)
      .withColumn("diff", col("model_margin") - (-col("book_spread")))
      .withColumn("ats", col("actual_margin") + col("book_spread"))
      .withColumn("threshold",
        explode(array(Thresholds.map(lit(_)): _*)))
      .filter(abs(col("diff")) >= col("threshold"))
      .withColumn("outcome",
        when(col("ats") === 0, "push")
          .when((col("diff") > 0 && col("ats") > 0) ||
            (col("diff") < 0 && col("ats") < 0), "win")
          .otherwise("loss"))
    p.groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("bets"),
        sum(when(col("outcome") === "win", 1L).otherwise(0L)).as("wins"),
        sum(when(col("outcome") === "loss", 1L).otherwise(0L)).as("losses"),
        sum(when(col("outcome") === "push", 1L).otherwise(0L)).as("pushes"))
      .withColumn("resolved", col("wins") + col("losses"))
      .withColumn("win_rate",
        when(col("resolved") > 0, col("wins") * 100.0 / col("resolved")).otherwise(0.0))
      .withColumn("roi",
        when(col("resolved") > 0,
          (col("wins") * 100.0 - col("losses") * 110.0)
            / (col("resolved") * 110.0) * 100.0).otherwise(0.0))
      .orderBy(col("threshold"))
  }

  /** Parameter sweep (SURVEY §2.9 I6, reference scripts/tune_ratings.py):
    * grid over solver configs, scoring each by model MAE on the supplied
    * observation set + predictions builder. Pure driver loop over the
    * pure solver — each grid point is independent, so at scale the grid
    * itself parallelizes trivially (one task per config). */
  def sweep[C](configs: Seq[C])(evalMae: C => Double): Seq[(C, Double)] =
    configs.map(c => c -> evalMae(c)).sortBy(_._2)

  /** Model home margin from ratings (reference predict_home_margin):
    * expected pace × per-possession efficiency edge + HCA. */
  def predictHomeMargin(hOe: Double, hDe: Double, aOe: Double, aDe: Double,
      hTempo: Double, aTempo: Double, leagueTempo: Double,
      leagueEff: Double, hca: Double): Double = {
    val pace = hTempo * aTempo / math.max(leagueTempo, 1e-9)
    val hPts = hOe * aDe / math.max(leagueEff, 1e-9) * pace / 100.0
    val aPts = aOe * hDe / math.max(leagueEff, 1e-9) * pace / 100.0
    hPts - aPts + hca
  }
}
