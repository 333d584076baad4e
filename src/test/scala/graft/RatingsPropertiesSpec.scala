package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ratings.IterativeRatings
import graft.ratings.IterativeRatings.{Config, GameObs}

/** ScalaCheck-generator property tests for the solver math (SURVEY §5
  * plan). The scalatest/scalacheck bridge isn't in the offline cache,
  * so generators are sampled directly with fixed seeds — same coverage,
  * deterministic replays. */
class RatingsPropertiesSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g(params, Seed(seed)).getOrElse(sys.error("gen failed"))
  private def forAllSeeds[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach(i => f(sample(g, i.toLong * 7919)))

  private val genEff = Gen.choose(40.0, 200.0)

  test("property: barthag stays in [0,1] and is antisymmetric") {
    forAllSeeds(Gen.zip(genEff, genEff)) { case (oe, de) =>
      val b = IterativeRatings.barthag(oe, de, 11.5)
      assert(b >= 0.0 && b <= 1.0)
      assert(math.abs(b + IterativeRatings.barthag(de, oe, 11.5) - 1.0) < 1e-9)
    }
  }

  test("property: barthag is monotone in offense") {
    forAllSeeds(Gen.zip(genEff, genEff, Gen.choose(0.1, 30.0))) {
      case (oe, de, d) =>
        assert(IterativeRatings.barthag(oe + d, de, 11.5) >=
          IterativeRatings.barthag(oe, de, 11.5))
    }
  }

  test("property: decay weight is in (0,1] and monotone decreasing in age") {
    forAllSeeds(Gen.zip(Gen.choose(0.0, 400.0), Gen.choose(1.0, 120.0))) {
      case (days, hl) =>
        val w = IterativeRatings.decayWeight(days, hl)
        assert(w > 0.0 && w <= 1.0)
        assert(IterativeRatings.decayWeight(days + 1, hl) <= w)
    }
  }

  private val genGame: Gen[GameObs] = for {
    t <- Gen.choose(0L, 7L)
    o <- Gen.choose(0L, 7L).suchThat(_ != t)
    tp <- Gen.choose(40.0, 110.0)
    op <- Gen.choose(40.0, 110.0)
    poss <- Gen.choose(55.0, 80.0)
    home <- Gen.oneOf(true, false)
    neutral <- Gen.oneOf(true, false)
  } yield GameObs(t, o, tp, poss, op, poss, 1.0, home, neutral)

  private val genGames: Gen[List[GameObs]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, genGame))

  test("property: solver output always respects clamp bounds and team set") {
    forAllSeeds(genGames, n = 60) { games =>
      val r = IterativeRatings.solve(games, Config(maxIter = 50))
      assert(r.map(_.team).toSet == games.map(_.team).toSet)
      r.foreach { x =>
        assert(x.adjOe >= 40.0 && x.adjOe <= 200.0)
        assert(x.adjDe >= 40.0 && x.adjDe <= 200.0)
        assert(x.barthag >= 0.0 && x.barthag <= 1.0)
      }
    }
  }

  test("early stop: a converged solve equals the fixed-sweep solve at its iteration count") {
    forAllSeeds(genGames, n = 60) { games =>
      val conv = IterativeRatings.solve(games, Config(maxIter = 50, tol = 0.45))
      val k = conv.head.iterations
      assert(k < 50, "tolerance must engage before maxIter for this fixture family")
      assert(conv.forall(_.iterations == k))
      // replaying exactly k pinned sweeps reproduces the converged state
      assert(conv == IterativeRatings.solve(games, Config(maxIter = k, tol = -1.0))
        .map(_.copy(iterations = k)))
      // and one fewer sweep would not have satisfied the tolerance
      if (k > 1) {
        val prev = IterativeRatings.solve(games, Config(maxIter = k - 1, tol = -1.0))
          .map(r => r.team -> ((r.adjOe, r.adjDe))).toMap
        val maxDelta = conv.map { r =>
          math.max(math.abs(r.adjOe - prev(r.team)._1),
            math.abs(r.adjDe - prev(r.team)._2))
        }.max
        assert(maxDelta <= 0.45, s"stop-sweep delta $maxDelta must be within tol")
      }
    }
  }

  test("property: solver is invariant to input order") {
    forAllSeeds(Gen.zip(genGames, Gen.long), n = 60) { case (games, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(games)
      assert(IterativeRatings.solve(games, Config(maxIter = 20)) ==
        IterativeRatings.solve(shuffled, Config(maxIter = 20)))
    }
  }
}
