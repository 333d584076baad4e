package graft

import org.apache.spark.sql.functions._
import graft.ratings.{IterativeRatings, SolverSweep}
import graft.ratings.IterativeRatings.{Config, GameObs}

/** Pins the declarative single-sweep DataFrame form (gated as dm10b)
  * to the procedural solver run for exactly one iteration — the two
  * expressions of the same math must not drift. */
class SolverSweepSpec extends SparkSpec {

  test("oneSweep == IterativeRatings.solve(maxIter = 1) on a synthetic corpus") {
    val s = spark
    import s.implicits._

    // deterministic 8-team corpus, both perspectives per game
    val games = for {
      h <- 0L until 8L
      a <- 0L until 8L if h != a
    } yield (h, a, 60.0 + (h * 7 + a * 3) % 30, 60.0 + (a * 5 + h) % 30,
      65.0 + (h + a) % 10)

    val obs = games.flatMap { case (h, a, hp, ap, poss) =>
      Seq((h, a, hp, ap, poss, true), (a, h, ap, hp, poss, false))
    }.toDF("team", "opp", "pts", "opp_pts", "poss", "is_home")

    val got = SolverSweep.oneSweep(obs).collect()
      .map(r => r.getAs[Long]("team") ->
        ((r.getAs[Double]("adj_oe1"), r.getAs[Double]("adj_de1"),
          r.getAs[Long]("games")))).toMap

    val solverObs = games.flatMap { case (h, a, hp, ap, poss) =>
      Seq(
        GameObs(h, a, hp, poss, ap, poss, 1.0, isHome = true, neutral = false),
        GameObs(a, h, ap, poss, hp, poss, 1.0, isHome = false, neutral = false))
    }
    val want = IterativeRatings.solve(solverObs, Config(maxIter = 1, damping = 1.0))
      .map(r => r.team -> ((r.adjOe, r.adjDe, r.games.toLong))).toMap

    assert(got.keySet == want.keySet)
    got.foreach { case (t, (oe, de, n)) =>
      val (wo, wd, wn) = want(t)
      assert(n == wn, s"games for team $t")
      assert(math.abs(oe - wo) < 1e-9, s"adj_oe for team $t: $oe vs $wo")
      assert(math.abs(de - wd) < 1e-9, s"adj_de for team $t: $de vs $wd")
    }
  }
}
