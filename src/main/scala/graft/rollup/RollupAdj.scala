package graft.rollup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver: fct_pbp_team_daily_rollup_adj — per-CALENDAR-day additive
  * opponent-adjusted efficiencies with empirical HCA (clean-room port of
  * /root/reference/scripts/build_pbp_team_daily_rollup_adj.py:60-310).
  * This is the producer of the `pbpAdj` input the gold power rankings
  * consume (adj_off_eff / adj_def_eff / adj_net_eff + _formula twins +
  * opponent-weighted means + hca_points_per_100).
  *
  * Semantics: ratings for day d use STRICTLY PRIOR games (no leakage);
  * HCA is estimated from the data ((mean home off − mean away off)/2);
  * the additive solver initializes at the league mean and iterates
  * off[t] = mean(off_eff − def[opp] − hca_sign·hca) a fixed 25 rounds;
  * emitted ratings re-add the league average.
  *
  * Spark shape: per-game efficiency derivation is distributed; the
  * per-season observation set (≤ ~6k games) is collected and the
  * per-date loop runs on the driver, exactly like AdjustedEfficiencies
  * (SURVEY I1/I2 — warm sequencing makes dates inherently serial; the
  * parallel axis is seasons). */
object RollupAdj {

  final case class GameRow(team: Long, opp: Long, isHome: Option[Boolean],
      date: String, offEff: Double, defEff: Double,
      offEffF: Double, defEffF: Double)

  /** Empirical HCA: (mean home off_eff − mean away off_eff)/2, 0 when
    * either side is empty (reference :78-83). */
  def estimateHca(games: collection.Seq[GameRow]): Double = {
    val home = games.filter(_.isHome.contains(true)).map(_.offEff)
    val away = games.filter(_.isHome.contains(false)).map(_.offEff)
    if (home.isEmpty || away.isEmpty) 0.0
    else (home.sum / home.size - away.sum / away.size) / 2.0
  }

  /** Fixed-iteration additive solve over residuals (reference :86-146):
    * no recentering, league-mean init, hca_sign from the venue flag. */
  def iterate(games: collection.Seq[GameRow], teams: Seq[Long], hca: Double,
      iterations: Int): (Map[Long, Double], Map[Long, Double], Map[Long, Double], Map[Long, Double]) = {
    var off = teams.map(_ -> 0.0).toMap
    var deff = teams.map(_ -> 0.0).toMap
    var offF = teams.map(_ -> 0.0).toMap
    var defF = teams.map(_ -> 0.0).toMap
    if (games.nonEmpty) {
      val n = games.size
      val oa = games.map(_.offEff).sum / n
      val da = games.map(_.defEff).sum / n
      val oaF = games.map(_.offEffF).sum / n
      val daF = games.map(_.defEffF).sum / n
      off = teams.map(_ -> oa).toMap; deff = teams.map(_ -> da).toMap
      offF = teams.map(_ -> oaF).toMap; defF = teams.map(_ -> daF).toMap
    }
    for (_ <- 0 until iterations) {
      val os = collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      val oc = collection.mutable.Map[Long, Int]().withDefaultValue(0)
      val ds = collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      val dc = collection.mutable.Map[Long, Int]().withDefaultValue(0)
      val osF = collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      val dsF = collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      games.foreach { g =>
        val sign = g.isHome match {
          case Some(true) => 1.0
          case Some(false) => -1.0
          case None => 0.0
        }
        os(g.team) += g.offEff - deff.getOrElse(g.opp, 0.0) - sign * hca
        oc(g.team) += 1
        ds(g.team) += g.defEff - off.getOrElse(g.opp, 0.0) + sign * hca
        dc(g.team) += 1
        osF(g.team) += g.offEffF - defF.getOrElse(g.opp, 0.0) - sign * hca
        dsF(g.team) += g.defEffF - offF.getOrElse(g.opp, 0.0) + sign * hca
      }
      off = off.map { case (t, v) => t -> (if (oc(t) > 0) os(t) / oc(t) else v) }
      deff = deff.map { case (t, v) => t -> (if (dc(t) > 0) ds(t) / dc(t) else v) }
      offF = offF.map { case (t, v) => t -> (if (oc(t) > 0) osF(t) / oc(t) else v) }
      defF = defF.map { case (t, v) => t -> (if (dc(t) > 0) dsF(t) / dc(t) else v) }
    }
    (off, deff, offF, defF)
  }

  final case class AdjRow(teamid: Long, rating_date: String,
      adj_off_eff: Double, adj_def_eff: Double, adj_net_eff: Double,
      adj_off_eff_formula: Double, adj_def_eff_formula: Double,
      adj_net_eff_formula: Double,
      weighted_off_eff: Double, weighted_def_eff: Double,
      weighted_off_eff_formula: Double, weighted_def_eff_formula: Double,
      hca_points_per_100: Double)

  /** Flat game-team rows (teamid, opponentid, startdate, ishometeam,
    * team_points_total, opp_points_total, team_possessions,
    * opp_possessions [, *_formula]) → one row per team per calendar
    * day.
    *
    * Scale guard: the driver only ever holds ONE season's observation
    * set (≤ ~6k games — the I1/I2 domain contract). A multi-season
    * frame is split on the Aug-cutoff season label (Aug–Dec dates
    * belong to the season ending the following year) and each season is
    * collected, solved and released independently, each with its own
    * calendar, team universe, HCA and strictly-prior window — ratings
    * never leak across a season boundary, and driver memory is bounded
    * by the largest season, not the input. */
  def build(spark: SparkSession, flat: DataFrame, iterations: Int = 25): DataFrame = {
    import spark.implicits._
    import graft.gold.IoHelpers.colOrNull
    val selected = flat.select(
        col("teamid").cast("long"), col("opponentid").cast("long"),
        substring(col("startdate").cast("string"), 1, 10).as("__d"),
        colOrNull(flat, "ishometeam", "boolean"),
        col("team_points_total").cast("double"),
        col("opp_points_total").cast("double"),
        col("team_possessions").cast("double"),
        col("opp_possessions").cast("double"),
        colOrNull(flat, "team_possessions_formula", "double"),
        colOrNull(flat, "opp_possessions_formula", "double"))
      .withColumn("__season", year(to_date(col("__d")))
        + when(month(to_date(col("__d"))) >= 8, 1).otherwise(0))

    val seasons = selected.select(col("__season")).where(col("__season").isNotNull)
      .distinct().collect().map(_.getInt(0)).sorted
    val out = collection.mutable.ArrayBuffer[AdjRow]()
    seasons.foreach { season =>
      val rows = selected.filter(col("__season") === season)
        .drop("__season").collect()
      out ++= solveSeason(rows, iterations)
    }
    if (out.isEmpty) Seq.empty[AdjRow].toDF() else out.toSeq.toDF()
  }

  /** One season's per-date loop. The prior-games window is extended
    * incrementally over date-sorted observations (O(N + D) list work,
    * vs re-filtering all N observations for each of D calendar days). */
  private def solveSeason(rows: Array[org.apache.spark.sql.Row],
      iterations: Int): Seq[AdjRow] = {
    def eff(p: Double, poss: Double) = if (poss > 0) p * 100.0 / poss else 0.0
    val obs = rows.toSeq.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) None
      else {
        def d(i: Int) = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
        Some(GameRow(r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3)),
          r.getString(2),
          eff(d(4), d(6)), eff(d(5), d(7)), eff(d(4), d(8)), eff(d(5), d(9))))
      }
    }.sortBy(g => (g.date, g.team, g.opp)).toIndexedSeq // fixed float-accumulation order

    if (obs.isEmpty) return Seq.empty
    val teams = obs.flatMap(g => Seq(g.team, g.opp)).distinct.sorted
    val d0 = java.time.LocalDate.parse(obs.head.date)
    val d1 = java.time.LocalDate.parse(obs.last.date)
    val calendar = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1)).map(_.toString).toSeq

    val out = collection.mutable.ArrayBuffer[AdjRow]()
    val prior = collection.mutable.ArrayBuffer[GameRow]() // strictly prior: no leakage
    var next = 0
    calendar.foreach { d =>
      while (next < obs.size && obs(next).date < d) { prior += obs(next); next += 1 }
      val hca = estimateHca(prior)
      val (off, deff, offF, defF) = iterate(prior, teams, hca, iterations)
      val n = prior.size
      val lOff = if (n > 0) prior.map(_.offEff).sum / n else 0.0
      val lDef = if (n > 0) prior.map(_.defEff).sum / n else 0.0
      val lOffF = if (n > 0) prior.map(_.offEffF).sum / n else 0.0
      val lDefF = if (n > 0) prior.map(_.defEffF).sum / n else 0.0
      val adjOff = teams.map(t => t -> (off(t) + lOff)).toMap
      val adjDef = teams.map(t => t -> (deff(t) + lDef)).toMap
      val adjOffF = teams.map(t => t -> (offF(t) + lOffF)).toMap
      val adjDefF = teams.map(t => t -> (defF(t) + lDefF)).toMap
      // opponent-strength-weighted raw efficiencies (reference :272-294)
      val wo = collection.mutable.Map[Long, List[Double]]().withDefaultValue(Nil)
      val wd = collection.mutable.Map[Long, List[Double]]().withDefaultValue(Nil)
      val woF = collection.mutable.Map[Long, List[Double]]().withDefaultValue(Nil)
      val wdF = collection.mutable.Map[Long, List[Double]]().withDefaultValue(Nil)
      prior.foreach { g =>
        wo(g.team) = (if (lDef != 0) g.offEff * (adjDef.getOrElse(g.opp, lDef) / lDef)
          else g.offEff) :: wo(g.team)
        wd(g.team) = (if (lOff != 0) g.defEff * (adjOff.getOrElse(g.opp, lOff) / lOff)
          else g.defEff) :: wd(g.team)
        woF(g.team) = (if (lDefF != 0) g.offEffF * (adjDefF.getOrElse(g.opp, lDefF) / lDefF)
          else g.offEffF) :: woF(g.team)
        wdF(g.team) = (if (lOffF != 0) g.defEffF * (adjOffF.getOrElse(g.opp, lOffF) / lOffF)
          else g.defEffF) :: wdF(g.team)
      }
      teams.foreach { t =>
        def mean(xs: List[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
        out += AdjRow(t, d,
          adjOff(t), adjDef(t), adjOff(t) - adjDef(t),
          adjOffF(t), adjDefF(t), adjOffF(t) - adjDefF(t),
          mean(wo(t).reverse), mean(wd(t).reverse),
          mean(woF(t).reverse), mean(wdF(t).reverse), hca)
      }
    }
    out.toSeq
  }
}
