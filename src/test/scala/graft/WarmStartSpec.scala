package graft

import org.apache.spark.sql.functions._

import graft.gold.AdjustedEfficiencies
import graft.queries.GoldGate
import graft.ratings.IterativeRatings
import graft.ratings.IterativeRatings.{Config, GameObs}

/** Pins the warm-start property of the per-date solver (VERDICT r11
  * #4) deterministically — on synthetic games, so the pins survive
  * test-data regeneration:
  *
  *  1. re-solving the SAME game set seeded from its own converged
  *     ratings stops almost immediately (the fixed point is the init);
  *  2. after a SMALL increment (1 game on 300), warm start converges
  *     in strictly fewer sweeps than the cold raw init;
  *  3. at build level, date 1 is warm-start-neutral (no prior date).
  *
  * The production-sized measurement lives in tools.SeasonSolver
  * (150 dates x 360 teams at sf0.1: warm trajectory 52 -> 17, total
  * 3324 vs 4605 sweeps — BENCH_SCALE.md r12). The saving REQUIRES
  * history >> increment and a large team field: measured at 25 teams
  * the cold raw init is already near the fixed point and warm start
  * saves nothing (ratio 1.23 at 40 dates) — also in BENCH_SCALE. */
class WarmStartSpec extends SparkSpec {

  // 60 teams, 10 "rounds" x 30 games, deterministic scores
  private def mkGames(n: Int): Seq[GameObs] =
    (0 until n).map { i =>
      val t = i % 60
      val o = (t + 1 + (i / 60)) % 60
      GameObs(t.toLong, o.toLong,
        pts = 60.0 + (i * 7 % 30), poss = 65.0 + (i % 9),
        oppPts = 60.0 + (i * 11 % 30), oppPoss = 65.0 + (i % 9),
        weight = 1.0, isHome = i % 2 == 0, neutral = i % 10 == 0)
    }

  private val cfg = Config()

  test("re-solving the same games from their converged ratings is immediate") {
    val s = mkGames(300)
    val cold = IterativeRatings.solve(s, cfg)
    val warmMap = cold.map(r => r.team -> (r.adjOe, r.adjDe)).toMap
    val re = IterativeRatings.solve(s, cfg, warmMap)
    assert(cold.head.iterations > 5, "fixture must need real iteration")
    assert(re.head.iterations <= 2,
      s"warm-from-answer took ${re.head.iterations} sweeps")
    // and stays within the convergence tolerance of the cold answer
    // (the stop is tol-based, so the one verification sweep may still
    // move each rating by < tol — bit-equality would be wrong)
    re.zip(cold).foreach { case (a, b) =>
      assert(a.team == b.team)
      assert(math.abs(a.adjOe - b.adjOe) <= cfg.tol &&
        math.abs(a.adjDe - b.adjDe) <= cfg.tol,
        s"team ${a.team}: ${a.adjOe}/${a.adjDe} vs ${b.adjOe}/${b.adjDe}")
    }
  }

  test("a small increment converges strictly faster warm than cold") {
    val hist = mkGames(300)
    val warmMap = IterativeRatings.solve(hist, cfg)
      .map(r => r.team -> (r.adjOe, r.adjDe)).toMap
    val next = hist ++ mkGames(301).takeRight(1)
    val coldIters = IterativeRatings.solve(next, cfg).head.iterations
    val warmIters = IterativeRatings.solve(next, cfg, warmMap).head.iterations
    assert(warmIters < coldIters,
      s"warm=$warmIters cold=$coldIters on a 1-in-300 increment")
  }

  test("build level: date 1 is warm-start-neutral, later dates may differ") {
    val sf = "/root/testdata/sf0.01"
    def traj(warm: Boolean): Seq[(String, Int)] = {
      val g0 = GoldGate.games(spark, sf)
      val dates = g0.select(substring(col("startDate"), 1, 10).as("gd"))
        .distinct().orderBy(col("gd").asc).limit(5)
        .collect().map(_.getString(0)).toSeq
      val g = g0.filter(substring(col("startDate"), 1, 10).isin(dates: _*))
      AdjustedEfficiencies.build(
          spark, GoldGate.gameTeamsOf(g), g, GoldGate.dimD1(spark, sf),
          season = 2025, warm = warm)
        .select(col("rating_date"), col("iterations"))
        .distinct().orderBy(col("rating_date").asc)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    }
    val w = traj(warm = true)
    val c = traj(warm = false)
    assert(w.map(_._1) == c.map(_._1))
    assert(w.head == c.head, s"date 1 must not see a warm map: $w vs $c")
  }
}
