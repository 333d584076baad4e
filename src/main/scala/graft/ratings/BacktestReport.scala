package graft.ratings

import org.apache.spark.sql.DataFrame

/** Markdown report emitter for the backtest harness — the last
  * reference artifact with no repo analog (scripts/backtest_spreads.py
  * `save_report`:499-560 and `save_multi_season_report`:425-497, which
  * write reports/backtest_2025.md and reports/backtest_multi_season.md).
  *
  * Every number rendered here is computed (and hash-gated, bt01) by
  * [[Backtest.errorMetrics]] / [[Backtest.roiTable]]; this layer is
  * deterministic driver-side string formatting only. The collects are
  * the sanctioned bounded class: one metrics row and one ROI row per
  * threshold (7) per variant.
  */
object BacktestReport {

  final case class RoiRow(threshold: Int, bets: Long, wins: Long,
      losses: Long, pushes: Long, winRate: Double, roi: Double)

  final case class VariantResult(label: String, nGames: Long,
      modelMae: Double, bookMae: Double, modelMean: Double, bookMean: Double,
      modelStd: Double, bookStd: Double, clvTotal: Long, clvWins: Long,
      clvRate: Double, roi: Seq[RoiRow])

  /** Collect one variant's frames into the report row shape
    * (backtest_spreads.py:355-366's result dict). Bounded: 1 + 7 rows. */
  def collectResult(label: String, metrics: DataFrame,
      roiTable: DataFrame): VariantResult = {
    val m = metrics.head()
    def d(n: String) = m.getDouble(m.fieldIndex(n))
    def l(n: String) = m.getLong(m.fieldIndex(n))
    val roi = roiTable.orderBy("threshold").collect().toSeq.map { r =>
      RoiRow(
        r.getInt(r.fieldIndex("threshold")),
        r.getLong(r.fieldIndex("bets")),
        r.getLong(r.fieldIndex("wins")),
        r.getLong(r.fieldIndex("losses")),
        r.getLong(r.fieldIndex("pushes")),
        r.getDouble(r.fieldIndex("win_rate")),
        r.getDouble(r.fieldIndex("roi")))
    }
    // roiTable only emits thresholds that attracted bets; the report
    // prints all of them (the reference appends every threshold)
    val present = roi.map(_.threshold).toSet
    val full = (roi ++ Backtest.Thresholds.filterNot(present)
      .map(t => RoiRow(t, 0L, 0L, 0L, 0L, 0.0, 0.0))).sortBy(_.threshold)
    VariantResult(label, l("n_games"), d("model_mae"), d("book_mae"),
      d("model_mean"), d("book_mean"), d("model_std"), d("book_std"),
      l("clv_total"), l("clv_wins"), d("clv_rate"), full)
  }

  private def pct1(x: Double): String = f"${x * 100}%.1f%%"

  /** reports/backtest_<season>.md (save_report:499-560): per-variant
    * accuracy + CLV + ROI sections, then a comparison summary when
    * more than one variant ran. */
  def renderSeasonReport(results: Seq[VariantResult], hcaGame: Double,
      season: Int = 2025): String = {
    val sb = new StringBuilder
    sb ++= s"# Backtest: Adjusted Efficiency Ratings vs Spreads (Season $season)\n"
    sb ++= f"HCA (game points): $hcaGame%.2f\n"
    results.filter(_.nGames > 0).foreach { r =>
      sb ++= s"\n## ${r.label}\n"
      sb ++= s"Games with spreads: ${r.nGames}\n"
      val edge = if (r.modelMae < r.bookMae) "**YES**" else "no"
      sb ++= "### Spread Prediction Accuracy\n"
      sb ++= "| Metric | Model | Book | Edge |\n|--------|-------|------|------|\n"
      sb ++= f"| MAE | ${r.modelMae}%.3f | ${r.bookMae}%.3f | $edge |\n"
      sb ++= f"| Mean error | ${r.modelMean}%.3f | ${r.bookMean}%.3f | |\n"
      sb ++= f"| Std dev | ${r.modelStd}%.3f | ${r.bookStd}%.3f | |\n"
      sb ++= "\n### Closing Line Value (|diff| > 3 pts)\n"
      sb ++= s"Model closer to actual: ${r.clvWins}/${r.clvTotal} (${pct1(r.clvRate)})\n"
      sb ++= "\n### Simulated Betting ROI (-110 juice)\n"
      sb ++= "| Threshold | Bets | W | L | P | Win% | ROI% |\n"
      sb ++= "|-----------|------|---|---|---|------|------|\n"
      r.roi.foreach { x =>
        sb ++= f"| ${x.threshold} | ${x.bets} | ${x.wins} | ${x.losses} |" +
          f" ${x.pushes} | ${x.winRate}%.1f%% | ${x.roi}%.1f%% |\n"
      }
    }
    val shown = results.filter(_.nGames > 0)
    if (results.length >= 2) {
      sb ++= "\n## Comparison Summary\n"
      sb ++= "| Variant | MAE | Std | CLV% | ROI@3 | ROI@5 |\n"
      sb ++= "|---------|-----|-----|------|-------|-------|\n"
      shown.foreach { r =>
        val roi3 = r.roi.find(_.threshold == 3).map(_.roi).getOrElse(0.0)
        val roi5 = r.roi.find(_.threshold == 5).map(_.roi).getOrElse(0.0)
        sb ++= f"| ${r.label} | ${r.modelMae}%.3f | ${r.modelStd}%.3f |" +
          f" ${pct1(r.clvRate)} | $roi3%.1f%% | $roi5%.1f%% |\n"
      }
    }
    sb.toString
  }

  private def roiOf(w: Long, l: Long): Double = {
    val resolved = w + l
    if (resolved == 0) 0.0
    else (w * 100.0 - l * 110.0) / (resolved * 110.0) * 100.0
  }

  /** One aggregate-ROI-table row (all seasons pooled) at a threshold. */
  final case class AggRoiRow(threshold: Int, bets: Long, wins: Long,
      losses: Long, pushes: Long, winPct: Double, roi: Double)

  /** The games-weighted TOTAL row of the multi-season report. */
  final case class SeasonTotals(games: Long, modelMae: Double,
      bookMae: Double, clvWins: Long, clvTotal: Long, clvRate: Double)

  /** The cross-season aggregation rendered by
    * [[renderMultiSeasonReport]] (save_multi_season_report:455-497),
    * extracted so the bt02 gate hashes the same code path the report
    * prints: seasons with zero games are dropped, MAEs are
    * games-weighted means of the per-season means, CLV counters sum,
    * and the ROI table pools per-season W/L/P at every threshold
    * (zero-filled where no season attracted bets). */
  def aggregateSeasons(seasonResults: Seq[(Int, VariantResult, Double)])
      : (SeasonTotals, Seq[AggRoiRow]) = {
    val shown = seasonResults.sortBy(_._1).filter(_._2.nGames > 0)
    val aggGames = shown.map(_._2.nGames).sum
    val mae =
      if (aggGames > 0) shown.map(x => x._2.modelMae * x._2.nGames).sum / aggGames
      else 0.0
    val bmae =
      if (aggGames > 0) shown.map(x => x._2.bookMae * x._2.nGames).sum / aggGames
      else 0.0
    val clvW = shown.map(_._2.clvWins).sum
    val clvT = shown.map(_._2.clvTotal).sum
    val clvRate = if (clvT > 0) clvW.toDouble / clvT else 0.0
    val rows = Backtest.Thresholds.map { t =>
      val rs = shown.flatMap(_._2.roi.filter(_.threshold == t))
      val (w, l, p) =
        (rs.map(_.wins).sum, rs.map(_.losses).sum, rs.map(_.pushes).sum)
      val resolved = w + l
      val winPct = if (resolved > 0) w.toDouble / resolved * 100 else 0.0
      AggRoiRow(t, w + l + p, w, l, p, winPct, roiOf(w, l))
    }
    (SeasonTotals(aggGames, mae, bmae, clvW, clvT, clvRate), rows)
  }

  /** reports/backtest_multi_season.md (save_multi_season_report:425-497):
    * per-season summary rows, a games-weighted TOTAL row, and the
    * bet-count-aggregated ROI table across all seasons. */
  def renderMultiSeasonReport(
      seasonResults: Seq[(Int, VariantResult, Double)]): String = {
    val sb = new StringBuilder
    sb ++= "# Multi-Season Backtest: Adjusted Efficiency Ratings vs Spreads\n\n"
    sb ++= "## Per-Season Summary\n\n"
    sb ++= "| Season | Games | Model MAE | Book MAE | CLV% | ROI@3 | ROI@5 | HCA |\n"
    sb ++= "|--------|-------|-----------|----------|------|-------|-------|-----|\n"
    val shown = seasonResults.sortBy(_._1).filter(_._2.nGames > 0)
    shown.foreach { case (season, r, hca) =>
      val roi3 = r.roi.find(_.threshold == 3).map(_.roi).getOrElse(0.0)
      val roi5 = r.roi.find(_.threshold == 5).map(_.roi).getOrElse(0.0)
      sb ++= f"| $season | ${r.nGames} | ${r.modelMae}%.3f |" +
        f" ${r.bookMae}%.3f | ${pct1(r.clvRate)} |" +
        f" $roi3%.1f%% | $roi5%.1f%% | $hca%.2f |\n"
    }
    val (totals, aggRows) = aggregateSeasons(seasonResults)
    if (totals.games > 0) {
      def aggRoi(t: Int): Double =
        aggRows.find(_.threshold == t).map(_.roi).getOrElse(0.0)
      sb ++= f"| **TOTAL** | **${totals.games}** | **${totals.modelMae}%.3f** |" +
        f" **${totals.bookMae}%.3f** | **${pct1(totals.clvRate)}** |" +
        f" **${aggRoi(3)}%.1f%%** | **${aggRoi(5)}%.1f%%** | — |\n"
    }
    sb ++= "\n## Aggregate Betting ROI (-110 juice, all seasons)\n\n"
    sb ++= "| Threshold | Bets | W | L | P | Win% | ROI% |\n"
    sb ++= "|-----------|------|---|---|---|------|------|\n"
    aggRows.foreach { r =>
      sb ++= f"| ${r.threshold} | ${r.bets} | ${r.wins} | ${r.losses} |" +
        f" ${r.pushes} | ${r.winPct}%.1f%% | ${r.roi}%.1f%% |\n"
    }
    sb.toString
  }

  /** Write a report string to a file (UTF-8). */
  def save(report: String, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      report.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
