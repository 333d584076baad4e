package graft.ratings

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ratings.IterativeRatings.{Config, GameObs}

/** Parameter-tuning sweep for the rating solver (SURVEY §2.9 I6) — a
  * clean-room re-expression of the reference's grid harness
  * (/root/reference/scripts/tune_ratings_holdout.py:46-47,138-171 and
  * sos_sweep_solver.py:38-43): grid over half-life × margin-cap ×
  * SOS exponent, each cell scored by the MAE of ratings-implied spread
  * predictions against actual game margins.
  *
  * Spark shape: the observation set is the bounded per-game table a
  * gold build pre-aggregates (teams × games, driver-sized by the same
  * argument as IterativeRatings), so the grid is a driver loop over
  * the pure solver; the sweep table is returned as a DataFrame so
  * downstream ranking/joining is Spark-native.
  */
object TuningSweep {

  /** One game, home perspective; `poss` shared by both sides. */
  final case class Game(
      gameId: Long,
      date: LocalDate,
      home: Long,
      away: Long,
      homePts: Double,
      awayPts: Double,
      poss: Double,
      neutral: Boolean)

  /** One grid cell's score; marginCap None = uncapped. */
  final case class Cell(
      half_life: Double,
      margin_cap: Option[Double],
      sos_exponent: Double,
      mae: Double,
      n_games: Long)

  /** Empirical per-side HCA: (home scoring rate − away scoring rate)/2
    * over non-neutral games (reference tune_ratings.py:65-100). */
  def empiricalHca(games: Seq[Game]): Double = {
    var hp = 0.0; var hq = 0.0; var ap = 0.0; var aq = 0.0
    games.foreach { g =>
      if (!g.neutral && g.poss > 0) {
        hp += g.homePts; hq += g.poss
        ap += g.awayPts; aq += g.poss
      }
    }
    if (hq == 0 || aq == 0) 1.4
    else (hp / hq * 100.0 - ap / aq * 100.0) / 2.0
  }

  /** Cap |margin| at `cap`, splitting the excess evenly between the
    * sides (reference adjusted_efficiencies.py:183-208). */
  def applyMarginCap(g: Game, cap: Double): Game = {
    val margin = g.homePts - g.awayPts
    if (math.abs(margin) <= cap) g
    else {
      val excess = math.abs(margin) - cap
      if (margin > 0)
        g.copy(homePts = g.homePts - excess / 2, awayPts = g.awayPts + excess / 2)
      else
        g.copy(homePts = g.homePts + excess / 2, awayPts = g.awayPts - excess / 2)
    }
  }

  /** Solve one cell and score it: decay-weight from days before the
    * latest date, cap margins for the SOLVER input only, and compute
    * MAE against the UNCAPPED actual margins (tune_ratings_holdout
    * .py:138-171: predicted = home net − away net + HCA·2 when not
    * neutral). */
  def scoreCell(games: Seq[Game], halfLife: Double, marginCap: Option[Double],
      sosExponent: Double, hca: Double,
      maxIter: Int = 200, tol: Double = 0.01): Cell = {
    val latest = games.map(_.date).max
    val obs = games.flatMap { g0 =>
      val g = marginCap.fold(g0)(c => applyMarginCap(g0, c))
      val daysAgo = ChronoUnit.DAYS.between(g.date, latest).toDouble
      val w = IterativeRatings.decayWeight(daysAgo, halfLife)
      Seq(
        GameObs(g.home, g.away, g.homePts, g.poss, g.awayPts, g.poss, w,
          isHome = true, neutral = g.neutral),
        GameObs(g.away, g.home, g.awayPts, g.poss, g.homePts, g.poss, w,
          isHome = false, neutral = g.neutral))
    }
    val ratings = IterativeRatings.solve(obs,
      Config(maxIter = maxIter, tol = tol, hca = hca, sosExponent = sosExponent))
    val net = ratings.map(r => r.team -> (r.adjOe - r.adjDe)).toMap
    val errors = games.flatMap { g =>
      for (h <- net.get(g.home); a <- net.get(g.away)) yield {
        val predicted = h - a + (if (g.neutral) 0.0 else 2.0 * hca)
        math.abs(predicted - (g.homePts - g.awayPts))
      }
    }
    val mae = if (errors.isEmpty) Double.PositiveInfinity
      else errors.sum / errors.size
    Cell(halfLife, marginCap, sosExponent, mae, errors.size.toLong)
  }

  /** Full grid; rows ordered (half_life, margin_cap, sos_exponent). */
  def sweep(spark: SparkSession, games: Seq[Game],
      halfLives: Seq[Double] = Seq(15, 20, 30, 45, 60),
      marginCaps: Seq[Option[Double]] = Seq(Some(10.0), Some(15.0), Some(20.0), None),
      sosExponents: Seq[Double] = Seq(0.5, 0.7, 0.85, 1.0),
      hca: Option[Double] = None,
      maxIter: Int = 200, tol: Double = 0.01): DataFrame = {
    val h = hca.getOrElse(empiricalHca(games))
    val cells = for {
      hl <- halfLives
      mc <- marginCaps
      e <- sosExponents
    } yield scoreCell(games, hl, mc, e, h, maxIter, tol)
    import spark.implicits._
    cells.toDF()
  }
}
