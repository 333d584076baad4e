package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention flag (VERDICT r8 #8): spread/median strictly
  * above the bound flags; at-the-bound and zero-median rows do not. */
class BenchStatsSpec extends AnyFunSuite {

  test("flags exactly the queries whose spread exceeds bound x median") {
    val rs = Seq(
      ("steady", 2.0, 0.4),     // 0.2x  -> clean
      ("spiky", 4.0, 6.5),      // 1.6x  -> flagged
      ("boundary", 1.0, 1.0),   // 1.0x  -> NOT flagged (strict >)
      ("justover", 1.0, 1.001), // >1.0x -> flagged
      ("zeromed", 0.0, 9.9))    // guard: never divides by zero
    assert(Bench.contendedFlags(rs, 1.0) == Seq("spiky", "justover"))
    // a tighter bound flags more; a looser one fewer
    assert(Bench.contendedFlags(rs, 0.1) ==
      Seq("steady", "spiky", "boundary", "justover"))
    assert(Bench.contendedFlags(rs, 2.0) == Seq.empty)
  }

  test("flagSpread trims one worst sample per earned re-run") {
    // 5 main-pass samples, one polluted (9.0): raw spread regime
    val main = Seq(1.0, 1.1, 9.0, 1.0, 1.2)
    assert(Bench.flagSpread(main, runs = 5) == 8.0)
    // +2 adaptive re-run samples, both clean: the polluted sample is
    // excluded, spread collapses to the clean envelope
    val rerun = main ++ Seq(1.05, 1.15)
    assert(math.abs(Bench.flagSpread(rerun, runs = 5) - 0.15) < 1e-9)
    // TWO polluted passes of a heavy query (the r12 gr01 shape: 9
    // samples, 2 polluted): 4 earned re-runs trim 4 worst, the flag
    // judges the best-5 subset [1.65..2.33] and clean evidence wins
    val twoPolluted = Seq(2.81, 2.59, 2.33, 6.39, 7.56) ++
      Seq(2.10, 2.04, 1.85, 1.65)
    assert(math.abs(Bench.flagSpread(twoPolluted, runs = 5) -
      (2.33 - 1.65)) < 1e-9)
    // a polluted RE-RUN is trimmed like a polluted main pass: with 7
    // samples and 2 polluted (one main, one re-run), the best-5
    // subset is the clean envelope — and the median over all 7 (1.1)
    // is itself clean, which is exactly what the flag certifies
    val noisy = main ++ Seq(7.5, 1.0)
    assert(math.abs(Bench.flagSpread(noisy, runs = 5) - 0.2) < 1e-9)
    // a genuinely noisy query (every sample far apart) keeps a wide
    // spread at any sample count: even its best-runs subset spans 5x
    val genuine = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 3.0, 6.0, 12.0, 24.0)
    assert(Bench.flagSpread(genuine, runs = 5) >= 3.0)
  }

  test("median of zero samples is -1, never a fake latency") {
    // a query that throws on every visit records NO samples (ADVICE
    // r16: fail-fast, errors map); its reported median must be the
    // sentinel, not a crash or a near-zero number
    assert(Bench.med(Seq.empty) == -1.0)
    assert(Bench.med(Seq(2.0)) == 2.0)
    assert(Bench.med(Seq(1.0, 2.0, 9.0)) == 2.0)
  }

  test("re-run budget scales with the median: heavy queries get more samples") {
    // the 2 s boundary: a light query keeps the base budget; a query
    // whose median exceeds 2 s gets the heavy budget (2 extra samples
    // cannot outvote two polluted passes of a multi-second query)
    assert(Bench.rerunCap(median = 0.5, base = 2, heavy = 4) == 2)
    assert(Bench.rerunCap(median = 2.0, base = 2, heavy = 4) == 2)
    assert(Bench.rerunCap(median = 2.01, base = 2, heavy = 4) == 4)
    assert(Bench.rerunCap(median = 14.5, base = 2, heavy = 4) == 4)
  }
}
