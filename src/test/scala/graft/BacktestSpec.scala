package graft

import org.apache.spark.sql.functions._
import graft.ratings.Backtest
import graft.sources.CheckpointStore

class BacktestSpec extends SparkSpec {

  private def preds = {
    val s = spark
    import s.implicits._
    // (model_margin, book_spread, actual_margin)
    Seq(
      (10.0, -5.5, 8.0),   // book margin 5.5; model closer to 8 -> CLV win; diff 4.5 -> bet home, ats 2.5 -> win
      (2.0, -6.0, 7.0),    // book margin 6; diff -4; bet away; ats = 1 -> loss; CLV: |2-7|=5 vs |6-7|=1 -> book closer
      (-3.0, 2.0, -2.0),   // book margin -2; diff -1 -> below all thresholds except... |diff|=1 >= 1 -> bet away; ats = 0 -> push
      (5.0, -5.0, 0.0))    // diff 0 -> never bet; not a CLV game
      .toDF("model_margin", "book_spread", "actual_margin")
  }

  test("error metrics + CLV match hand computation") {
    val m = Backtest.errorMetrics(preds).head()
    assert(m.getAs[Long]("n_games") == 4)
    // model errors: 2, -5, -1, 5 -> MAE 3.25; book errors: -2.5, -1, 0, 5 -> MAE 2.125
    assert(math.abs(m.getAs[Double]("model_mae") - 3.25) < 1e-9)
    assert(math.abs(m.getAs[Double]("book_mae") - 2.125) < 1e-9)
    // CLV games: |model-book| > 3 -> rows 1 (|10-5.5|=4.5) and 2 (|2-6|=4)
    assert(m.getAs[Long]("clv_total") == 2)
    assert(m.getAs[Long]("clv_wins") == 1) // row 1 model closer; row 2 book closer
    assert(math.abs(m.getAs[Double]("clv_rate") - 0.5) < 1e-9)
  }

  test("ROI table applies thresholds, pushes, and -110 juice") {
    val roi = Backtest.roiTable(preds).collect()
      .map(r => r.getAs[Int]("threshold") -> r).toMap
    // t=1: bets rows 1 (win), 2 (loss), 3 (push)
    val t1 = roi(1)
    assert(t1.getAs[Long]("wins") == 1 && t1.getAs[Long]("losses") == 1 &&
      t1.getAs[Long]("pushes") == 1)
    // profit = 100 - 110 = -10 over 220 risked -> -4.5454..%
    assert(math.abs(t1.getAs[Double]("roi") - (-10.0 / 220.0 * 100)) < 1e-9)
    assert(math.abs(t1.getAs[Double]("win_rate") - 50.0) < 1e-9)
    // t=5: no row qualifies (diffs 4.5, 4, 1, 0) -> absent from output
    assert(!roi.contains(5))
  }

  test("predictHomeMargin: symmetric teams at home win by exactly the HCA") {
    val m = Backtest.predictHomeMargin(110, 95, 110, 95, 68, 68, 68, 100, 4.0266)
    assert(math.abs(m - 4.0266) < 1e-9)
    val better = Backtest.predictHomeMargin(115, 95, 105, 100, 68, 68, 68, 100, 0.0)
    assert(better > 0)
  }

  test("checkpoint store: get/put/skip-completed roundtrip and update") {
    val s = spark
    val path = java.nio.file.Files.createTempDirectory("graft-ckpt").toString + "/ckpt"
    val store = new CheckpointStore(s, path)
    assert(store.get("games", "h1").isEmpty)
    store.put("games", "h1", lastCompletedSeason = Some(2024))
    assert(store.get("games", "h1").contains((Some(2024), None)))
    assert(store.isSeasonCompleted("games", "h1", 2024))
    assert(store.isSeasonCompleted("games", "h1", 2023))
    assert(!store.isSeasonCompleted("games", "h1", 2025))
    // update one key, add another; both survive
    store.put("games", "h1", lastCompletedSeason = Some(2025),
      lastIngestedDate = Some("2025-03-01"))
    store.put("plays", "h2", lastIngestedDate = Some("2025-02-27"))
    assert(store.get("games", "h1").contains((Some(2025), Some("2025-03-01"))))
    assert(store.get("plays", "h2").contains((None, Some("2025-02-27"))))
  }
}
