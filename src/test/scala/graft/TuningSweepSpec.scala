package graft

import java.time.LocalDate

import graft.ratings.TuningSweep
import graft.ratings.TuningSweep.Game

/** The I6 grid harness on a self-consistent synthetic corpus: margins
  * exactly reflect true net strengths + HCA, so the solver can recover
  * them — the uncapped cells must beat any cell whose cap distorts the
  * input, and the sweep must enumerate the full grid deterministically. */
class TuningSweepSpec extends SparkSpec {

  // 8 teams with fixed strengths; round-robin over 4 weeks; margins are
  // strength differences + 3 home points, several exceeding a cap of 5
  private lazy val corpus: Seq[Game] = {
    val strength = (0L until 8L).map(t => t -> (t * 2.5)).toMap
    var gid = 0L
    for {
      h <- 0L until 8L
      a <- 0L until 8L if h != a
    } yield {
      gid += 1
      val margin = strength(h) - strength(a) + 3.0
      val date = LocalDate.of(2025, 1, 5).plusDays((gid % 28).toInt)
      // poss = 100 so efficiency units == point units: the solver can
      // then recover margins exactly and capping is pure distortion
      Game(gid, date, h, a, 100.0 + margin / 2, 100.0 - margin / 2, 100.0,
        neutral = false)
    }
  }

  test("sweep enumerates the full grid with finite scores") {
    val df = TuningSweep.sweep(spark, corpus,
      halfLives = Seq(20, 60), marginCaps = Seq(Some(5.0), None),
      sosExponents = Seq(0.85, 1.0))
    val rows = df.collect()
    assert(rows.length == 2 * 2 * 2)
    rows.foreach { r =>
      assert(!r.getAs[Double]("mae").isNaN)
      assert(r.getAs[Double]("mae") >= 0.0)
      assert(r.getAs[Long]("n_games") == corpus.size)
    }
  }

  test("known-best: uncapped cells beat the distorting cap=5 cells") {
    val df = TuningSweep.sweep(spark, corpus,
      halfLives = Seq(60), marginCaps = Seq(Some(5.0), None),
      sosExponents = Seq(0.85))
    val byCap = df.collect()
      .map(r => Option(r.getAs[java.lang.Double]("margin_cap"))
        .map(_.toDouble) -> r.getAs[Double]("mae")).toMap
    // max |margin| = 17.5+3 > 5, so the cap rewrites most games
    assert(byCap(None) < byCap(Some(5.0)),
      s"uncapped=${byCap(None)} capped=${byCap(Some(5.0))}")
  }

  test("empirical HCA recovers the built-in 3-point home edge (1.5 per side)") {
    val h = TuningSweep.empiricalHca(corpus)
    // symmetric round robin at poss=100: home − away rate = 3 → 1.5/side
    assert(math.abs(h - 1.5) < 1e-9)
  }

  test("sweep is deterministic") {
    val a = TuningSweep.sweep(spark, corpus, Seq(30), Seq(None), Seq(0.85))
      .collect().map(_.toString).toSeq
    val b = TuningSweep.sweep(spark, corpus, Seq(30), Seq(None), Seq(0.85))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
