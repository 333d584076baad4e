package graft

import graft.ratings.{Backtest, BacktestReport}
import BacktestReport.{RoiRow, VariantResult}

/** The markdown emitter renders the reference's report shapes
  * (backtest_spreads.py save_report:499-560 /
  * save_multi_season_report:425-497) byte-stably: golden strings on a
  * hand-computed dyadic fixture — every metric below is checkable by
  * hand (all errors are exact halves/quarters). */
class BacktestReportSpec extends SparkSpec {

  // 4 games: (model_margin, book_spread, actual_margin)
  //   g1: err(model)=+1.0  err(book)=+2.0  diff=-1.0 ats=-2.0 -> away win @1
  //   g2: err=+4.5 / +4.0  diff=+0.5       no bet at any threshold
  //   g3: err=-2.0 / -8.0  diff=+6.0 ats=+8 -> CLV game, home win @1-6
  //   g4: err=+1.0 /  0.0  diff=+1.0 ats=0  -> push @1
  private val fixture = Seq(
    (2.0, -3.0, 1.0),
    (-1.5, 2.0, -6.0),
    (8.0, -2.0, 10.0),
    (-4.0, 5.0, -5.0))

  private val seasonGolden =
    """# Backtest: Adjusted Efficiency Ratings vs Spreads (Season 2025)
      |HCA (game points): 3.20
      |
      |## All games
      |Games with spreads: 4
      |### Spread Prediction Accuracy
      || Metric | Model | Book | Edge |
      ||--------|-------|------|------|
      || MAE | 2.125 | 3.500 | **YES** |
      || Mean error | 1.125 | -0.500 | |
      || Std dev | 2.301 | 4.555 | |
      |
      |### Closing Line Value (|diff| > 3 pts)
      |Model closer to actual: 1/1 (100.0%)
      |
      |### Simulated Betting ROI (-110 juice)
      || Threshold | Bets | W | L | P | Win% | ROI% |
      ||-----------|------|---|---|---|------|------|
      || 1 | 3 | 2 | 0 | 1 | 100.0% | 90.9% |
      || 2 | 1 | 1 | 0 | 0 | 100.0% | 90.9% |
      || 3 | 1 | 1 | 0 | 0 | 100.0% | 90.9% |
      || 4 | 1 | 1 | 0 | 0 | 100.0% | 90.9% |
      || 5 | 1 | 1 | 0 | 0 | 100.0% | 90.9% |
      || 6 | 1 | 1 | 0 | 0 | 100.0% | 90.9% |
      || 7 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      |""".stripMargin

  test("season report renders the gated metric frames byte-stably") {
    val s = spark
    import s.implicits._
    val preds = fixture.toDF("model_margin", "book_spread", "actual_margin")
    val r = BacktestReport.collectResult("All games",
      Backtest.errorMetrics(preds), Backtest.roiTable(preds))
    assert(r.nGames == 4 && r.clvTotal == 1 && r.clvWins == 1)
    assert(r.roi.map(_.threshold) == (1 to 7)) // zero-bet rows filled in
    val md = BacktestReport.renderSeasonReport(Seq(r), hcaGame = 3.2)
    assert(md == seasonGolden, s"render drifted:\n$md")
    // byte-stable: a second render of the same frames is identical
    val r2 = BacktestReport.collectResult("All games",
      Backtest.errorMetrics(preds), Backtest.roiTable(preds))
    assert(BacktestReport.renderSeasonReport(Seq(r2), hcaGame = 3.2) == md)
  }

  test("two variants add the comparison summary section") {
    val s = spark
    import s.implicits._
    val preds = fixture.toDF("model_margin", "book_spread", "actual_margin")
    val r = BacktestReport.collectResult("All games",
      Backtest.errorMetrics(preds), Backtest.roiTable(preds))
    val md = BacktestReport.renderSeasonReport(
      Seq(r, r.copy(label = "Capped")), hcaGame = 3.2)
    assert(md.contains("## Comparison Summary"))
    assert(md.contains("| Capped | 2.125 | 2.301 | 100.0% | 90.9% | 90.9% |"))
  }

  private def roiSeq(rows: Map[Int, (Long, Long, Long, Double, Double)]) =
    (1 to 7).map { t =>
      rows.get(t) match {
        case Some((w, l, p, wr, roi)) => RoiRow(t, w + l + p, w, l, p, wr, roi)
        case None => RoiRow(t, 0, 0, 0, 0, 0.0, 0.0)
      }
    }

  private val multiGolden =
    """# Multi-Season Backtest: Adjusted Efficiency Ratings vs Spreads
      |
      |## Per-Season Summary
      |
      || Season | Games | Model MAE | Book MAE | CLV% | ROI@3 | ROI@5 | HCA |
      ||--------|-------|-----------|----------|------|-------|-------|-----|
      || 2023 | 100 | 10.500 | 11.250 | 50.0% | 9.1% | -4.5% | 3.00 |
      || 2024 | 50 | 9.000 | 8.750 | 25.0% | -13.2% | 27.3% | 2.50 |
      || **TOTAL** | **150** | **10.000** | **10.417** | **40.0%** | **0.5%** | **2.8%** | — |
      |
      |## Aggregate Betting ROI (-110 juice, all seasons)
      |
      || Threshold | Bets | W | L | P | Win% | ROI% |
      ||-----------|------|---|---|---|------|------|
      || 1 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      || 2 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      || 3 | 60 | 30 | 27 | 3 | 52.6% | 0.5% |
      || 4 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      || 5 | 13 | 7 | 6 | 0 | 53.8% | 2.8% |
      || 6 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      || 7 | 0 | 0 | 0 | 0 | 0.0% | 0.0% |
      |""".stripMargin

  test("multi-season report aggregates by games and bet counts (golden)") {
    val s2023 = VariantResult("Season 2023", 100, 10.5, 11.25, 0.0, 0.0,
      0.0, 0.0, 60, 30, 0.5,
      roiSeq(Map(3 -> ((20L, 15L, 2L, 57.1, 9.0909090909)),
        5 -> ((5L, 5L, 0L, 50.0, -4.5454545454)))))
    val s2024 = VariantResult("Season 2024", 50, 9.0, 8.75, 0.0, 0.0,
      0.0, 0.0, 40, 10, 0.25,
      roiSeq(Map(3 -> ((10L, 12L, 1L, 45.5, -13.223140495)),
        5 -> ((2L, 1L, 0L, 66.7, 27.272727272)))))
    val md = BacktestReport.renderMultiSeasonReport(
      Seq((2023, s2023, 3.0), (2024, s2024, 2.5)))
    assert(md == multiGolden, s"render drifted:\n$md")
  }

  test("zero-game seasons are skipped like the reference") {
    val empty = VariantResult("Season 2022", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      roiSeq(Map.empty))
    val md = BacktestReport.renderMultiSeasonReport(Seq((2022, empty, 1.0)))
    assert(!md.contains("2022"))
    assert(!md.contains("TOTAL")) // no aggregate row without games
  }
}
