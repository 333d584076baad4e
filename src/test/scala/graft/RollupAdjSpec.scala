package graft

import org.apache.spark.sql.functions._
import graft.rollup.RollupAdj
import graft.rollup.RollupAdj.GameRow

/** Additive adjusted-rollup semantics mirroring
  * build_pbp_team_daily_rollup_adj.py: strictly-prior (leakage-free)
  * per-date ratings, empirical HCA, league re-add, weighted means. */
class RollupAdjSpec extends SparkSpec {

  test("empirical HCA: half the home-away off-eff gap; 0 without both sides") {
    val g = Seq(
      GameRow(1, 2, Some(true), "2025-01-01", 110.0, 100.0, 110.0, 100.0),
      GameRow(2, 1, Some(false), "2025-01-01", 100.0, 110.0, 100.0, 110.0))
    assert(math.abs(RollupAdj.estimateHca(g) - 5.0) < 1e-12)
    assert(RollupAdj.estimateHca(g.take(1)) == 0.0) // no away rows
    assert(RollupAdj.estimateHca(Nil) == 0.0)
  }

  test("per-date build: leakage-free, league re-add, winner rated higher") {
    val s = spark
    import s.implicits._
    // two-sided flat rows: game 1 on Jan 1 (1 beats 2 on neutral),
    // game 2 on Jan 3 (1 beats 3)
    val flat = Seq(
      (1L, 2L, "2025-01-01T19:00:00", None: Option[Boolean], 80.0, 70.0, 70.0, 70.0),
      (2L, 1L, "2025-01-01T19:00:00", None: Option[Boolean], 70.0, 80.0, 70.0, 70.0),
      (1L, 3L, "2025-01-03T19:00:00", Some(true), 85.0, 65.0, 68.0, 68.0),
      (3L, 1L, "2025-01-03T19:00:00", Some(false), 65.0, 85.0, 68.0, 68.0))
      .toDF("teamid", "opponentid", "startdate", "ishometeam",
        "team_points_total", "opp_points_total",
        "team_possessions", "opp_possessions")

    val out = RollupAdj.build(s, flat, iterations = 25)
    // 3 teams x 3 calendar days
    assert(out.count() == 9)
    val rows = out.collect()
      .map(r => (r.getAs[Long]("teamid"), r.getAs[String]("rating_date")) -> r).toMap

    // day 1 uses strictly-prior games -> none -> all zeros, hca 0
    val d1 = rows((1L, "2025-01-01"))
    assert(d1.getAs[Double]("adj_net_eff") == 0.0)
    assert(d1.getAs[Double]("hca_points_per_100") == 0.0)

    // day 2 sees game 1 only: team 1 net > 0 > team 2 net; 3 at league
    val t1d2 = rows((1L, "2025-01-02"))
    val t2d2 = rows((2L, "2025-01-02"))
    assert(t1d2.getAs[Double]("adj_net_eff") > 0.0)
    assert(t2d2.getAs[Double]("adj_net_eff") < 0.0)
    assert(math.abs(t1d2.getAs[Double]("adj_net_eff")
      + t2d2.getAs[Double]("adj_net_eff")) < 1e-9) // symmetric 2-team case
    // weighted_off for team 1 day 2: one game, off_eff * adjDef(2)/leagueDef
    val lDef = (80.0 / 70 * 100 + 70.0 / 70 * 100) / 2
    val w = t1d2.getAs[Double]("weighted_off_eff")
    assert(math.abs(w - 80.0 / 70 * 100
      * (t2d2.getAs[Double]("adj_def_eff") / lDef)) < 1e-9)

    // formula columns absent -> 0-valued efficiencies, no crash
    assert(t1d2.getAs[Double]("adj_net_eff_formula") == 0.0)

    // day 3 ratings exclude that day's own game (leakage-free): team 3
    // is still unrated relative to league on Jan 3
    val t3d3 = rows((3L, "2025-01-03"))
    assert(math.abs(t3d3.getAs[Double]("adj_net_eff")) < 1e-9)
  }

  test("multi-season input is processed per-season (no cross-season leakage)") {
    val s = spark
    import s.implicits._
    // season 2025: two games Dec 30/31 2024; season 2026: one game
    // Nov 5 2025. Team 1 plays in both; team 4 only in season 2026.
    val flat = Seq(
      (1L, 2L, "2024-12-30T19:00:00", None: Option[Boolean], 80.0, 70.0, 70.0, 70.0),
      (2L, 1L, "2024-12-30T19:00:00", None: Option[Boolean], 70.0, 80.0, 70.0, 70.0),
      (1L, 3L, "2024-12-31T19:00:00", None: Option[Boolean], 75.0, 70.0, 70.0, 70.0),
      (3L, 1L, "2024-12-31T19:00:00", None: Option[Boolean], 70.0, 75.0, 70.0, 70.0),
      (1L, 4L, "2025-11-05T19:00:00", None: Option[Boolean], 90.0, 60.0, 70.0, 70.0),
      (4L, 1L, "2025-11-05T19:00:00", None: Option[Boolean], 60.0, 90.0, 70.0, 70.0))
      .toDF("teamid", "opponentid", "startdate", "ishometeam",
        "team_points_total", "opp_points_total",
        "team_possessions", "opp_possessions")

    val out = RollupAdj.build(s, flat, iterations = 25).collect()
    val byKey = out.map(r => (r.getAs[Long]("teamid"),
      r.getAs[String]("rating_date")) -> r).toMap

    // each season gets its OWN calendar and team universe: 3 teams x
    // 2 days + 2 teams x 1 day — no rows for the 300-day summer gap,
    // no team-4 rows in season 2025, no team-2/3 rows in season 2026
    assert(out.length == 8, out.map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(!byKey.contains((4L, "2024-12-31")))
    assert(!byKey.contains((2L, "2025-11-05")))
    val dates = out.map(_.getAs[String]("rating_date")).distinct.sorted
    assert(dates.sameElements(Array("2024-12-30", "2024-12-31", "2025-11-05")))

    // season-2026 opening day has NO prior games in its own season:
    // team 1's season-2025 results must not leak across the boundary
    val t1s2 = byKey((1L, "2025-11-05"))
    assert(t1s2.getAs[Double]("adj_net_eff") == 0.0)
    assert(t1s2.getAs[Double]("hca_points_per_100") == 0.0)

    // and within season 2025 the day-2 rating still sees day-1's game
    assert(byKey((1L, "2024-12-31")).getAs[Double]("adj_net_eff") > 0.0)
  }
}
