package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pbp.PlayClassifier
import graft.ratings.{Backtest, SolverSweep}
import graft.sources.Tables

/** SQL-expressible gates for the procedural operators, so each carries
  * a hard DuckDB hash check; only UNBOUNDED iteration counts stay
  * rows-only (dm10, v05), and even those have their wiring gated.
  *
  *  - dm10b: one solver sweep (the (league/opp)^α re-estimate) — the
  *    same observations dm10 feeds the full fixed-point solver.
  *  - v05b: one Lloyd assignment step against the deterministic
  *    md5-seeded centroids KMeans.fit starts from.
  *  - v05c: the REAL KMeans.fit at iterations=2 (assign → centroid
  *    update → re-assign) vs a full SQL replay — the iterative wiring.
  *  - pbp02: the classifier + flags + ends_possession stage of the PBP
  *    chain.
  *  - pbp03: the ENTIRE possession state machine incl. the and-1
  *    lookahead, replayed in SQL with bounded window scans.
  */
object CarveOutGate {

  private def dot(a: String, b: String): Column =
    graft.plans.DotProduct.ofCols(col(a), col(b))

  /** The foul-enriched synthetic play stream shared by pbp03/pbp04:
    * coarse 149-value clock (coprime to the %5 foul selector, so
    * same-clock shot+foul sequences occur) over the events table. */
  private def pbpPlays(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d).select(
        col("event_id").as("id"),
        col("user_id").as("gameId"),
        (lit(1L) + col("event_id") % 2).as("teamId"),
        (lit(2L) - col("event_id") % 2).as("opponentId"),
        (lit(1) + (col("event_id") % 97 % 2)).cast("int").as("period"),
        (lit(1200L) - (col("event_id") % 149) * 8).as("secondsRemaining"),
        when(col("event_id") % 5 === 2, "Personal Foul")
          .when(col("event_type") === "click", "JumpShot")
          .when(col("event_type") === "view", "Defensive Rebound")
          .when(col("event_type") === "purchase", "Three Point Jump Shot")
          .when(col("event_type") === "signup", "Free Throw 1 of 1")
          .otherwise("Lost Ball Turnover").as("playType"),
        lit(null).cast("string").as("playText"),
        (col("value") > 0.5).as("scoringPlay"),
        lit(null).cast("boolean").as("shootingPlay"),
        when(col("event_id") % 5 === 2, lit(null).cast("double"))
          .when(col("event_type") === "signup", 1.0)
          .when(col("event_type") === "purchase", 3.0)
          .when(col("event_type") === "click", 2.0).as("scoreValue"),
        (col("event_id") % 40).as("homeScore"),
        (col("event_id") % 37).as("awayScore"),
        (col("event_id") % 2 === 0).as("isHomeTeam"))
      .as[graft.pbp.PossessionEngine.Play]
  }

  /** pbp01's exact play stream (DomainOps pbp01): fine 1200-value
    * clock, NO foul injection — gated by pbp05. */
  private def noFoulPlays(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d).select(
        col("event_id").as("id"),
        col("user_id").as("gameId"),
        (lit(1L) + col("event_id") % 2).as("teamId"),
        (lit(2L) - col("event_id") % 2).as("opponentId"),
        (lit(1) + (col("event_id") % 97 % 2)).cast("int").as("period"),
        (lit(1200L) - col("event_id") % 1200).as("secondsRemaining"),
        when(col("event_type") === "click", "JumpShot")
          .when(col("event_type") === "view", "Defensive Rebound")
          .when(col("event_type") === "purchase", "Three Point Jump Shot")
          .when(col("event_type") === "signup", "Free Throw 1 of 1")
          .otherwise("Lost Ball Turnover").as("playType"),
        lit(null).cast("string").as("playText"),
        (col("value") > 0.5).as("scoringPlay"),
        lit(null).cast("boolean").as("shootingPlay"),
        when(col("event_type") === "signup", 1.0)
          .when(col("event_type") === "purchase", 3.0)
          .when(col("event_type") === "click", 2.0).as("scoreValue"),
        (col("event_id") % 40).as("homeScore"),
        (col("event_id") % 37).as("awayScore"),
        (col("event_id") % 2 === 0).as("isHomeTeam"))
      .as[graft.pbp.PossessionEngine.Play]
  }

  /** The foul-enriched play stream (pbp03/pbp04) as the SQL `plays`
    * CTE body — coarse 149-value clock, %5 foul injection. */
  private val FoulPlaysSelect: String = """
          SELECT event_id AS id, user_id AS game_id,
                 1 + event_id % 2 AS team_id, 2 - event_id % 2 AS opp_id,
                 CAST(1 + (event_id % 97 % 2) AS INT) AS period,
                 1200 - (event_id % 149) * 8 AS sec,
                 CASE WHEN event_id % 5 = 2 THEN 'Personal Foul'
                      ELSE CASE event_type WHEN 'click' THEN 'JumpShot'
                                           WHEN 'view' THEN 'Defensive Rebound'
                                           WHEN 'purchase' THEN 'Three Point Jump Shot'
                                           WHEN 'signup' THEN 'Free Throw 1 of 1'
                                           ELSE 'Lost Ball Turnover' END END AS play_type,
                 value > 0.5 AS scoring,
                 CASE WHEN event_id % 5 = 2 THEN NULL
                      ELSE CASE event_type WHEN 'signup' THEN 1.0
                                           WHEN 'purchase' THEN 3.0
                                           WHEN 'click' THEN 2.0 END END AS sv,
                 event_id % 40 AS hs, event_id % 37 AS aw
          FROM events"""

  /** pbp01's play stream as the SQL `plays` CTE body: the same
    * event-type mapping WITHOUT foul injection and with the
    * fine-grained clock (`1200 - id % 1200`). */
  private[queries] val NoFoulPlaysSelect: String = """
          SELECT event_id AS id, user_id AS game_id,
                 1 + event_id % 2 AS team_id, 2 - event_id % 2 AS opp_id,
                 CAST(1 + (event_id % 97 % 2) AS INT) AS period,
                 1200 - event_id % 1200 AS sec,
                 CASE event_type WHEN 'click' THEN 'JumpShot'
                                 WHEN 'view' THEN 'Defensive Rebound'
                                 WHEN 'purchase' THEN 'Three Point Jump Shot'
                                 WHEN 'signup' THEN 'Free Throw 1 of 1'
                                 ELSE 'Lost Ball Turnover' END AS play_type,
                 value > 0.5 AS scoring,
                 CASE event_type WHEN 'signup' THEN 1.0
                                 WHEN 'purchase' THEN 3.0
                                 WHEN 'click' THEN 2.0 END AS sv,
                 event_id % 40 AS hs, event_id % 37 AS aw
          FROM events"""

  /** The game-team aggregate CTEs (stats/poss/t/j) over a play-stream
    * CTE `src` — the SQL replay of GameTeamStats.build's aggregate
    * layer (box aggs, event + formula possessions, opponent
    * self-join). Parameterized on the source so ONE copy serves the
    * full stream (pbp04/pbp07: enr) AND the garbage-filtered stream
    * (pbp06: enrx) — a fix to a coefficient or a possession rule in
    * this layer reaches every PBP oracle or none. */
  private[queries] def gameTeamAggCtes(src: String): String = s"""stats AS (
          SELECT game_id, team_id,
                 CAST(sum(CASE WHEN is_fga THEN 1 ELSE 0 END) AS BIGINT) AS fga,
                 CAST(sum(CASE WHEN is_fga AND scoring THEN 1 ELSE 0 END) AS BIGINT) AS fgm,
                 CAST(sum(CASE WHEN is_fga AND scoring AND sv = 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS fg3m,
                 CAST(sum(CASE WHEN is_ft THEN 1 ELSE 0 END) AS BIGINT) AS fta,
                 CAST(sum(CASE WHEN is_ft AND scoring THEN 1 ELSE 0 END) AS BIGINT) AS ftm,
                 CAST(sum(CASE WHEN is_to THEN 1 ELSE 0 END) AS BIGINT) AS tov,
                 CAST(sum(CASE WHEN is_dr THEN 1 ELSE 0 END) AS BIGINT) AS dreb,
                 CAST(0 AS BIGINT) AS oreb,
                 CAST(sum(CASE WHEN scoring THEN sv ELSE CAST(0.0 AS DOUBLE) END) AS DOUBLE) AS pts,
                 CAST(max(coalesce(period, 1)) AS INT) AS max_period
          FROM $src GROUP BY 1, 2),
        poss AS (
          SELECT game_id, offense_team_id AS team_id,
                 CAST(count(*) AS BIGINT) AS possessions_event
          FROM $src WHERE possession_end AND offense_team_id IS NOT NULL
          GROUP BY 1, 2),
        t AS (
          SELECT s.*,
                 CAST(coalesce(p.possessions_event, 0) AS BIGINT) AS possessions_event,
                 s.fga - s.oreb + s.tov + CAST(0.44 AS DOUBLE) * s.fta AS possessions_formula
          FROM stats s LEFT JOIN poss p
            ON s.game_id = p.game_id AND s.team_id = p.team_id),
        j AS (
          SELECT t1.*, t2.team_id AS opp_tid, t2.pts AS opp_pts,
                 t2.possessions_formula AS opp_poss_formula,
                 t2.dreb AS opp_dreb, t2.fga AS opp_fga
          FROM t t1 JOIN t t2
            ON t1.game_id = t2.game_id AND t1.team_id <> t2.team_id)"""

  /** The per-team derivation column list (raw box columns +
    * game_minutes/eFG/TS/ft-rate/tov-ratio/oreb-pct/pace) — shared
    * verbatim by the standalone tail below and pbp06's
    * garbage-extended tail, so the formula constants (0.44 FTA
    * weight, 0.5 three bonus, 40+5*OT minutes) exist in ONE copy. */
  private[queries] val GameTeamDeriveCols: String = """
               fga, fgm, fg3m, fta, ftm, tov, dreb, oreb, pts, max_period,
               possessions_event, possessions_formula,
               opp_pts, opp_poss_formula, opp_dreb, opp_fga,
               CAST(40 + 5 * greatest(max_period - 2, 0) AS DOUBLE) AS game_minutes,
               CASE WHEN fga > 0
                    THEN (fgm + CAST(0.5 AS DOUBLE) * fg3m) / fga END AS efg_pct,
               CASE WHEN fga + CAST(0.44 AS DOUBLE) * fta > 0
                    THEN pts / (CAST(2.0 AS DOUBLE) * (fga + CAST(0.44 AS DOUBLE) * fta))
               END AS ts_pct,
               CASE WHEN fga > 0 THEN CAST(fta AS DOUBLE) / fga END AS ft_rate,
               CASE WHEN possessions_formula > 0
                    THEN tov / possessions_formula END AS tov_ratio,
               CASE WHEN oreb + opp_dreb > 0
                    THEN CAST(oreb AS DOUBLE) / (oreb + opp_dreb) END AS oreb_pct,
               CASE WHEN CAST(40 + 5 * greatest(max_period - 2, 0) AS DOUBLE) > 0
                    THEN (possessions_formula + opp_poss_formula) / 2.0
                         * (CAST(40.0 AS DOUBLE)
                            / CAST(40 + 5 * greatest(max_period - 2, 0) AS DOUBLE))
               END AS pace"""

  /** The full standalone game-team aggregate layer over `enr` — the
    * tail shared VERBATIM by pbp04 (foul stream) and pbp07 (pbp01's
    * no-foul stream — VERDICT r13 #6) so a fix to the aggregate layer
    * can never desynchronize the two "same pipeline" oracles — the
    * adcAllSql convention applied to the PBP family. */
  private[queries] val GameTeamAggSql: String = s"""${gameTeamAggCtes("enr")}
        SELECT game_id AS gameId, team_id AS teamId, opp_tid AS opponentId,
               team_id = 1 AS is_home_team,
               $GameTeamDeriveCols
        FROM j"""

  /** Full SQL replay of the possession state machine over any play
    * stream (pbp03/pbp04 foul-enriched; pbp01 the no-foul stream): the
    * and-1 lookahead as bounded window scans, possession ids as running
    * counts over boundary flags, offense via the last start's pending
    * rule with the period-reset fallback. Ends with the `enr` CTE — one
    * row per play with flags + possession columns. */
  private[queries] def pbpChainCtes(playsSelect: String): String = s"""
        WITH plays AS ($playsSelect),
        f AS (
          SELECT *,
                 row_number() OVER (PARTITION BY game_id
                   ORDER BY period ASC, sec DESC, id ASC) AS rn,
                 play_type IN ('JumpShot', 'Three Point Jump Shot') AS is_fga,
                 play_type = 'Lost Ball Turnover' AS is_to,
                 play_type = 'Defensive Rebound' AS is_dr,
                 sv = 1.0 AS is_ft,
                 lower(play_type) LIKE '%foul%' AS is_foul
          FROM plays),
        g AS (SELECT *, is_fga OR is_to OR is_dr AS is_action_base FROM f),
        nx AS (
          SELECT *,
                 min(CASE WHEN is_action_base THEN rn END) OVER
                   (PARTITION BY game_id ORDER BY rn
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_action
          FROM g),
        fouls AS (
          SELECT a.game_id, a.rn AS shot_rn, min(b.rn) AS foul_rn
          FROM nx a JOIN nx b
            ON a.game_id = b.game_id AND b.rn > a.rn
           AND b.rn < coalesce(a.next_action, 2147483647)
           AND b.is_foul AND b.sec = a.sec
          WHERE a.is_fga
          GROUP BY 1, 2),
        exp AS (
          SELECT n.game_id, n.rn, n.next_action, fl.foul_rn,
                 CASE WHEN n.scoring THEN 1 WHEN n.sv = 3.0 THEN 3 ELSE 2 END AS expected
          FROM nx n JOIN fouls fl ON n.game_id = fl.game_id AND n.rn = fl.shot_rn),
        ftc AS (
          SELECT e.game_id, e.rn AS shot_rn, c.rn AS ft_rn, e.expected,
                 row_number() OVER (PARTITION BY e.game_id, e.rn ORDER BY c.rn ASC) AS k
          FROM exp e JOIN nx c
            ON c.game_id = e.game_id AND c.rn > e.foul_rn
           AND c.rn < coalesce(e.next_action, 2147483647)
           AND c.is_ft),
        lastft AS (SELECT game_id, shot_rn, max(ft_rn) AS last_ft_rn
                   FROM ftc WHERE k <= expected GROUP BY 1, 2),
        pe AS (
          SELECT n.*,
                 CASE WHEN n.is_ft THEN (lf.rn IS NOT NULL AND n.scoring)
                      WHEN n.is_fga AND a1.shot_rn IS NOT NULL THEN false
                      ELSE (n.is_to OR n.is_dr OR (n.is_fga AND n.scoring))
                 END AS end_c
          FROM nx n
          LEFT JOIN (SELECT DISTINCT game_id, last_ft_rn AS rn FROM lastft) lf
            ON n.game_id = lf.game_id AND n.rn = lf.rn
          LEFT JOIN (SELECT DISTINCT game_id, shot_rn FROM lastft) a1
            ON n.game_id = a1.game_id AND n.rn = a1.shot_rn),
        fin AS (
          SELECT *,
                 end_c OR coalesce(lead(period) OVER (PARTITION BY game_id
                   ORDER BY rn) <> period, false) AS end_f
          FROM pe),
        firstaf AS (SELECT game_id, min(rn) AS first_rn
                    FROM fin WHERE is_action_base OR is_ft GROUP BY 1),
        act AS (
          SELECT f3.*,
                 f3.is_action_base OR (f3.is_ft AND f3.rn = fa.first_rn) AS is_action
          FROM fin f3 LEFT JOIN firstaf fa ON f3.game_id = fa.game_id),
        b AS (
          SELECT *,
                 coalesce(max(CASE WHEN end_f THEN rn END) OVER
                   (PARTITION BY game_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS last_b
          FROM act),
        st AS (
          SELECT *,
                 is_action AND coalesce(max(CASE WHEN is_action THEN rn END) OVER
                   (PARTITION BY game_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) <= last_b AS is_start
          FROM b),
        pid AS (
          SELECT *, sum(CASE WHEN is_start THEN 1 ELSE 0 END) OVER
                   (PARTITION BY game_id ORDER BY rn) AS possession_id
          FROM st),
        off0 AS (
          SELECT p.*,
                 CASE WHEN p.is_start THEN
                   CASE WHEN p.last_b = 0 THEN p.team_id
                        WHEN bb.period <> p.period THEN p.team_id
                        WHEN bb.is_dr THEN bb.team_id
                        ELSE bb.opp_id END
                 END AS start_off
          FROM pid p LEFT JOIN pid bb
            ON p.game_id = bb.game_id AND p.last_b = bb.rn AND p.last_b > 0),
        enr AS (
          -- the period reset clears currentOffense: rows after a period
          -- change but before the next start fall back to their own team
          SELECT id, game_id, team_id, opp_id, period, sec, play_type,
                 scoring, CAST(sv AS DOUBLE) AS sv, hs, aw,
                 is_fga, is_ft, is_to, is_dr,
                 CAST(possession_id AS BIGINT) AS possession_id,
                 CAST(CASE WHEN last_value(CASE WHEN is_start THEN period END
                                           IGNORE NULLS) OVER w = period
                           THEN coalesce(last_value(start_off IGNORE NULLS) OVER w,
                                         team_id)
                           ELSE team_id END AS BIGINT) AS offense_team_id,
                 end_f AS possession_end,
                 period >= 2 AND
                   ((abs(hs - aw) >= 20 AND sec <= 600) OR
                    (abs(hs - aw) >= 15 AND sec <= 300)) AS garbage_time
          FROM off0
          WINDOW w AS (PARTITION BY game_id ORDER BY rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""

  /** The dm10 observation fixture as driver GameObs: orders → the
    * bounded 40-team (home, away) pair grid → two observations per
    * cell (the dm10c/dm10d input pipeline, one copy — an edit to the
    * grid cannot desynchronize the converged-solve gates from each
    * other or from tools.RatingsConvergenceProbe). */
  private[graft] def dm10Games(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[graft.ratings.IterativeRatings.GameObs] = {
    val rows = Tables.orders(s, d).select(
        (col("o_orderkey") % 40).as("home"),
        ((col("o_orderkey") % 40) + 1 + (col("o_custkey") % 39)).mod(40).as("away"),
        (lit(60) + col("o_orderkey") % 40).cast("double").as("home_pts"),
        (lit(60) + col("o_custkey") % 40).cast("double").as("away_pts"),
        (lit(65) + col("o_orderkey") % 10).cast("double").as("poss"))
      .filter(col("home") =!= col("away"))
      .groupBy(col("home"), col("away"))
      .agg(count(lit(1)).as("n"), sum(col("home_pts")).as("shp"),
        sum(col("away_pts")).as("sap"), sum(col("poss")).as("sps"))
      .collect()
    rows.iterator.flatMap { r =>
      val (h, a) = (r.getLong(0), r.getLong(1))
      val n = r.getLong(2).toDouble
      val (hp, ap, ps) =
        (r.getDouble(3) / n, r.getDouble(4) / n, r.getDouble(5) / n)
      Iterator(
        graft.ratings.IterativeRatings.GameObs(h, a, hp, ps, ap, ps, n,
          isHome = true, neutral = false),
        graft.ratings.IterativeRatings.GameObs(a, h, ap, ps, hp, ps, n,
          isHome = false, neutral = false))
    }.toSeq
  }

  /** The dm10 fixture + solver-init CTEs (base → grid → obs → eff →
    * lg → init), one copy shared by the dm10d and dm10e oracles (the
    * GameTeamAggSql convention — an edit to the grid or the clamp
    * cannot desynchronize the converged-solve gates). dm10c keeps its
    * own copy: its init carries the extra raw/tempo columns. */
  private val Dm10FixtureSql: String = """base AS (
          SELECT o_orderkey % 40 AS home,
                 ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40 AS away,
                 CAST(60 + o_orderkey % 40 AS DOUBLE) AS home_pts,
                 CAST(60 + o_custkey % 40 AS DOUBLE) AS away_pts,
                 CAST(65 + o_orderkey % 10 AS DOUBLE) AS poss
          FROM orders
          WHERE (o_orderkey % 40) <> ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40),
        grid AS (
          SELECT home, away, CAST(count(*) AS DOUBLE) AS w,
                 sum(home_pts) / count(*) AS hp,
                 sum(away_pts) / count(*) AS ap,
                 sum(poss) / count(*) AS ps
          FROM base GROUP BY 1, 2),
        obs AS (
          SELECT home AS team, away AS opp, hp AS pts, ap AS opp_pts,
                 ps AS poss, w, true AS is_home FROM grid
          UNION ALL
          SELECT away, home, ap, hp, ps, w, false FROM grid),
        eff AS (
          SELECT *,
                 pts / poss * 100.0 + CASE WHEN is_home THEN -4.0266 ELSE 4.0266 END AS go,
                 opp_pts / poss * 100.0 + CASE WHEN is_home THEN 4.0266 ELSE -4.0266 END AS gd
          FROM obs),
        lg AS (SELECT sum(w * pts) / sum(w * poss) * 100.0 AS league FROM eff),
        init AS (
          SELECT team,
                 least(greatest(sum(w * go) / sum(w), 40.0), 200.0) AS oe0,
                 least(greatest(sum(w * gd) / sum(w), 40.0), 200.0) AS de0
          FROM eff GROUP BY 1)"""

  /** One solver sweep as a CTE: s<i> re-estimates every team's
    * clamped (oe, de) against sweep i-1's opponent ratings (init for
    * i=1) — the dm10b/dm10d sweep SQL, parameterized over the sweep
    * index so dm10e can unroll an arbitrary chain. */
  private def dm10SweepSql(i: Int, materialized: Boolean = false): String = {
    val (pt, po, pd) =
      if (i == 1) ("init", "oe0", "de0")
      else (s"s${i - 1}", s"oe${i - 1}", s"de${i - 1}")
    // MATERIALIZED: each sweep is referenced three times (next sweep,
    // its delta, the stop dispatch); DuckDB inlines plain CTEs per
    // reference, which goes exponential down a 24-sweep chain ("too
    // many open files" on the fixture parquet before it even plans)
    val kw = if (materialized) "MATERIALIZED " else ""
    s"""s$i AS $kw(
          SELECT e.team,
                 least(greatest(sum(e.w * e.go * pow(league / p.$pd, 0.85)) / sum(e.w),
                                40.0), 200.0) AS oe$i,
                 least(greatest(sum(e.w * e.gd * pow(league / p.$po, 0.85)) / sum(e.w),
                                40.0), 200.0) AS de$i
          FROM eff e JOIN $pt p ON e.opp = p.team, lg
          GROUP BY e.team)"""
  }

  /** Oracle sweep-unroll depth for dm10e. Measured
    * (tools.RatingsConvergenceProbe): the solver stops at 17/18/18
    * sweeps at sf0.001/0.01/0.1 — deltas decay ~0.85x per sweep in an
    * oscillating pair pattern, so tol=0.01 sits deep in the tail. 24
    * leaves 6+ sweeps of headroom for a fixture regeneration to move
    * the stop without emptying the oracle's dispatch. Boundary
    * margins at the stop (gate SF 0.01): delta_17 is 1.5e-4 ABOVE tol,
    * delta_18 is 8.0e-4 below — and the measured cross-engine delta
    * disagreement (engine fixed-fold vs DuckDB sum order, diffed at
    * full precision per sweep) is <= 4.3e-14 absolute, ~9 orders under
    * the thinner margin (scripts/dm10e_margin.md). */
  private val Dm10OracleSweeps = 24

  /** dm10e's oracle: `n` unrolled sweeps, the per-sweep max-|delta|
    * sequence AS DATA (d<i> compares sweep i to sweep i-1 over both
    * rating columns — the solver's maxDelta), the stop k = min{i :
    * delta_i <= tol}, and a dispatch that emits exactly sweep k's
    * ratings with iterations=k. Replaying the convergence TEST (not a
    * pinned count) is what makes the gate regen-proof: both engines
    * derive the stop from the same data. */
  private def dm10ConvergedSql(tol: Double, n: Int): String = {
    val sweeps = (1 to n).map { i =>
      val (pt, po, pd) =
        if (i == 1) ("init", "oe0", "de0")
        else (s"s${i - 1}", s"oe${i - 1}", s"de${i - 1}")
      s"""${dm10SweepSql(i, materialized = true)},
        d$i AS (SELECT max(greatest(abs(c.oe$i - p.$po), abs(c.de$i - p.$pd))) AS md
               FROM s$i c JOIN $pt p ON c.team = p.team)"""
    }.mkString(",\n        ")
    val deltas = (1 to n)
      .map(i => s"SELECT $i AS i, (SELECT md FROM d$i) AS md")
      .mkString("\n          UNION ALL ")
    val dispatch = (1 to n).map { i =>
      s"""SELECT s.team, round(s.oe$i, 3) AS adj_oe, round(s.de$i, 3) AS adj_de,
               g.games, CAST($i AS INT) AS iterations
        FROM s$i s JOIN gcnt g ON s.team = g.team
        WHERE (SELECT k FROM stop) = $i"""
    }.mkString("\n        UNION ALL\n        ") +
      // ADVICE r15: if a fixture regen pushes convergence past the
      // unroll depth, stop.k is NULL and every arm above emits zero
      // rows — fail NAMING the exhausted headroom (DuckDB error())
      // instead of as a bare hash mismatch. The message concatenates a
      // GENUINELY data-dependent aggregate (the best delta the $n
      // sweeps reached, read from the deltas CTE over the fixture
      // tables) so no optimizer version can constant-fold the error
      // expression into an unconditional plan-time raise — ADVICE r16
      // flagged the previous `(SELECT n AS n) x` derived table as
      // flattenable to a constant. The scan emits zero rows whenever
      // the solver converged in time, and the min-delta also makes the
      // failure actionable (how far from tol the run got).
      s"""
        UNION ALL
        SELECT CAST(error('dm10e oracle exhausted: no sweep delta <= $tol within $n unrolled sweeps (best delta reached: '
                 || CAST(x.best AS VARCHAR)
                 || ') - raise Dm10OracleSweeps') AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS INT), CAST(NULL AS INT)
        FROM (SELECT min(md) AS best FROM deltas) x
        WHERE (SELECT k FROM stop) IS NULL"""
    s"""
        WITH $Dm10FixtureSql,
        $sweeps,
        deltas AS (
          $deltas),
        stop AS (SELECT min(i) AS k FROM deltas WHERE md <= $tol),
        gcnt AS (SELECT team, CAST(count(*) AS INT) AS games
                 FROM eff GROUP BY 1)
        $dispatch"""
  }

  def defs: Seq[Q] = Seq(

    // ----- I1 single sweep ------------------------------------------------------
    Q(
      "dm10b_solver_sweep",
      "One sweep of the iterative SOS solver (I1, iterative_ratings.py:" +
        "225-297) on the SAME synthetic observations as dm10, as a pure " +
        "DataFrame transform (graft.ratings.SolverSweep) — hash-matched " +
        "vs the SQL re-statement; RatingsPropertiesSpec pins it to " +
        "solve(maxIter=1) so the procedural loop can't drift.",
      (s, d) => {
        val base = Tables.orders(s, d).select(
            (col("o_orderkey") % 40).as("home"),
            ((col("o_orderkey") % 40) + 1 + (col("o_custkey") % 39)).mod(40).as("away"),
            (lit(60) + col("o_orderkey") % 40).cast("double").as("home_pts"),
            (lit(60) + col("o_custkey") % 40).cast("double").as("away_pts"),
            (lit(65) + col("o_orderkey") % 10).cast("double").as("poss"))
          .filter(col("home") =!= col("away"))
        val obs = base.select(explode(array(
            struct(col("home").as("team"), col("away").as("opp"),
              col("home_pts").as("pts"), col("away_pts").as("opp_pts"),
              col("poss"), lit(true).as("is_home")),
            struct(col("away").as("team"), col("home").as("opp"),
              col("away_pts").as("pts"), col("home_pts").as("opp_pts"),
              col("poss"), lit(false).as("is_home")))).as("s"))
          .select(col("s.*"))
        SolverSweep.oneSweep(obs)
          .select(col("team"), col("games"),
            round(col("adj_oe1"), 3).as("adj_oe1"),
            round(col("adj_de1"), 3).as("adj_de1"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey % 40 AS home,
                 ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40 AS away,
                 CAST(60 + o_orderkey % 40 AS DOUBLE) AS home_pts,
                 CAST(60 + o_custkey % 40 AS DOUBLE) AS away_pts,
                 CAST(65 + o_orderkey % 10 AS DOUBLE) AS poss
          FROM orders
          WHERE (o_orderkey % 40) <> ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40),
        obs AS (
          SELECT home AS team, away AS opp, home_pts AS pts, away_pts AS opp_pts,
                 poss, true AS is_home FROM base
          UNION ALL
          SELECT away, home, away_pts, home_pts, poss, false FROM base),
        eff AS (
          SELECT *,
                 pts / poss * 100.0 + CASE WHEN is_home THEN -4.0266 ELSE 4.0266 END AS go,
                 opp_pts / poss * 100.0 + CASE WHEN is_home THEN 4.0266 ELSE -4.0266 END AS gd
          FROM obs),
        lg AS (SELECT sum(pts) / sum(poss) * 100.0 AS league FROM eff),
        init AS (
          SELECT team,
                 least(greatest(sum(go) / count(*), 40.0), 200.0) AS oe0,
                 least(greatest(sum(gd) / count(*), 40.0), 200.0) AS de0
          FROM eff GROUP BY 1)
        SELECT e.team, CAST(count(*) AS BIGINT) AS games,
               round(least(greatest(sum(e.go * pow(league / i.de0, 0.85)) / count(*),
                                    40.0), 200.0), 3) AS adj_oe1,
               round(least(greatest(sum(e.gd * pow(league / i.oe0, 0.85)) / count(*),
                                    40.0), 200.0), 3) AS adj_de1
        FROM eff e JOIN init i ON e.opp = i.team, lg
        GROUP BY e.team""")),

    // ----- full Rating output surface at one pinned sweep ------------------------
    Q(
      "dm10c_rating_outputs",
      "The REAL IterativeRatings.solve at maxIter=1 (negative tol pins " +
        "exactly one sweep) emitting the FULL Rating surface — adj_oe/" +
        "adj_de, raw_oe/raw_de, barthag (exp 11.5), adj_tempo, sos_oe/" +
        "sos_de, games, iterations — hash-matched against a SQL replay " +
        "(iterative_ratings.py:58-77,187-202,305-353). Together with " +
        "g07 (warm-start wiring) and dm10b (sweep math), every output " +
        "column of the solver is now cross-engine gated; only the " +
        "unbounded convergence loop itself stays rows-only (dm10).",
      (s, d) => {
        import s.implicits._
        // dm10's exact input pipeline: pre-aggregate to the bounded
        // (home, away) pair grid BEFORE .collect() — driver memory
        // independent of fact cardinality
        val games = dm10Games(s, d)
        val ratings = graft.ratings.IterativeRatings.solve(games,
          graft.ratings.IterativeRatings.Config(maxIter = 1, tol = -1.0))
        ratings.map(r => (r.team, r.adjOe, r.adjDe, r.rawOe, r.rawDe,
            r.barthag, r.adjTempo, r.sosOe, r.sosDe, r.games, r.iterations))
          .toDF("team", "adj_oe", "adj_de", "raw_oe", "raw_de", "barthag",
            "adj_tempo", "sos_oe", "sos_de", "games", "iterations")
          .select(col("team"),
            round(col("adj_oe"), 3).as("adj_oe"),
            round(col("adj_de"), 3).as("adj_de"),
            round(col("raw_oe"), 3).as("raw_oe"),
            round(col("raw_de"), 3).as("raw_de"),
            round(col("barthag"), 6).as("barthag"),
            round(col("adj_tempo"), 3).as("adj_tempo"),
            round(col("sos_oe"), 3).as("sos_oe"),
            round(col("sos_de"), 3).as("sos_de"),
            col("games"), col("iterations"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey % 40 AS home,
                 ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40 AS away,
                 CAST(60 + o_orderkey % 40 AS DOUBLE) AS home_pts,
                 CAST(60 + o_custkey % 40 AS DOUBLE) AS away_pts,
                 CAST(65 + o_orderkey % 10 AS DOUBLE) AS poss
          FROM orders
          WHERE (o_orderkey % 40) <> ((o_orderkey % 40) + 1 + (o_custkey % 39)) % 40),
        grid AS (
          SELECT home, away, CAST(count(*) AS DOUBLE) AS w,
                 sum(home_pts) / count(*) AS hp,
                 sum(away_pts) / count(*) AS ap,
                 sum(poss) / count(*) AS ps
          FROM base GROUP BY 1, 2),
        obs AS (
          SELECT home AS team, away AS opp, hp AS pts, ap AS opp_pts,
                 ps AS poss, w, true AS is_home FROM grid
          UNION ALL
          SELECT away, home, ap, hp, ps, w, false FROM grid),
        eff AS (
          SELECT *,
                 pts / poss * 100.0 + CASE WHEN is_home THEN -4.0266 ELSE 4.0266 END AS go,
                 opp_pts / poss * 100.0 + CASE WHEN is_home THEN 4.0266 ELSE -4.0266 END AS gd
          FROM obs),
        lg AS (SELECT sum(w * pts) / sum(w * poss) * 100.0 AS league FROM eff),
        init AS (
          SELECT team,
                 sum(w * go) / sum(w) AS raw_oe, sum(w * gd) / sum(w) AS raw_de,
                 least(greatest(sum(w * go) / sum(w), 40.0), 200.0) AS oe0,
                 least(greatest(sum(w * gd) / sum(w), 40.0), 200.0) AS de0,
                 sum(w * poss) / sum(w) AS raw_tempo
          FROM eff GROUP BY 1),
        s1 AS (
          SELECT e.team, CAST(count(*) AS INT) AS games,
                 least(greatest(sum(e.w * e.go * pow(league / i.de0, 0.85)) / sum(e.w),
                                40.0), 200.0) AS oe1,
                 least(greatest(sum(e.w * e.gd * pow(league / i.oe0, 0.85)) / sum(e.w),
                                40.0), 200.0) AS de1
          FROM eff e JOIN init i ON e.opp = i.team, lg
          GROUP BY e.team),
        lt AS (SELECT avg(raw_tempo) AS league_tempo FROM init WHERE raw_tempo > 0),
        sos AS (
          SELECT e.team,
                 sum(e.w * s.de1) / sum(e.w) AS sos_oe,
                 sum(e.w * s.oe1) / sum(e.w) AS sos_de,
                 sum(e.w * i.raw_tempo) / sum(e.w) AS avg_opp_tempo
          FROM eff e JOIN s1 s ON e.opp = s.team
                     JOIN init i ON e.opp = i.team
          WHERE e.poss > 0 GROUP BY e.team)
        SELECT s.team,
               round(s.oe1, 3) AS adj_oe, round(s.de1, 3) AS adj_de,
               round(i.raw_oe, 3) AS raw_oe, round(i.raw_de, 3) AS raw_de,
               round(pow(s.oe1, 11.5) / (pow(s.oe1, 11.5) + pow(s.de1, 11.5)), 6) AS barthag,
               round(i.raw_tempo * (lt.league_tempo / so.avg_opp_tempo), 3) AS adj_tempo,
               round(so.sos_oe, 3) AS sos_oe, round(so.sos_de, 3) AS sos_de,
               s.games, CAST(1 AS INT) AS iterations
        FROM s1 s JOIN init i ON s.team = i.team
                  JOIN sos so ON s.team = so.team, lt""")),

    // ----- the convergence TEST itself under the hash gate ------------------------
    Q(
      "dm10d_converged_solve",
      "The early-stop convergence path of IterativeRatings.solve " +
        "(reference adjusted_efficiencies.py:592-597 logs iterations-to-" +
        "convergence; iterative_ratings.py:225-297 the max-|Δ| test): " +
        "maxIter=50 with tol=0.45 on the dm10 fixture, where the per-" +
        "sweep deltas (0.67 after sweep 1, 0.16 after sweep 2 at the " +
        "gate SF — measured, bracketing the tolerance with >0.2 margin " +
        "on both sides) make the solver STOP at exactly 2 sweeps. The " +
        "oracle replays init -> sweep -> sweep and pins iterations=2, " +
        "so the convergence test, not a pinned sweep count, produces " +
        "the hash-matched result.",
      (s, d) => {
        import s.implicits._
        val games = dm10Games(s, d)
        val ratings = graft.ratings.IterativeRatings.solve(games,
          graft.ratings.IterativeRatings.Config(maxIter = 50, tol = 0.45))
        ratings.map(r => (r.team, r.adjOe, r.adjDe, r.games, r.iterations))
          .toDF("team", "adj_oe", "adj_de", "games", "iterations")
          .select(col("team"),
            round(col("adj_oe"), 3).as("adj_oe"),
            round(col("adj_de"), 3).as("adj_de"),
            col("games"), col("iterations"))
      },
      Some(s"""
        WITH $Dm10FixtureSql,
        ${dm10SweepSql(1)},
        s2 AS (
          SELECT e.team, CAST(count(*) AS INT) AS games,
                 least(greatest(sum(e.w * e.go * pow(league / s.de1, 0.85)) / sum(e.w),
                                40.0), 200.0) AS oe2,
                 least(greatest(sum(e.w * e.gd * pow(league / s.oe1, 0.85)) / sum(e.w),
                                40.0), 200.0) AS de2
          FROM eff e JOIN s1 s ON e.opp = s.team, lg
          GROUP BY e.team)
        SELECT team, round(oe2, 3) AS adj_oe, round(de2, 3) AS adj_de,
               games, CAST(2 AS INT) AS iterations
        FROM s2""")),

    // ----- the PRODUCTION operating point under the hash gate ---------------------
    Q(
      "dm10e_production_converged_solve",
      "dm10's PRODUCTION configuration hash-gated (VERDICT r14 #4 — " +
        "the one operating point the dm10 family never replayed): " +
        "IterativeRatings.solve at the reference defaults maxIter=200, " +
        "tol=0.01 (iterative_ratings.py:85-89) on the dm10 fixture. " +
        "Unlike dm10d, the oracle does NOT pin the stop round: it " +
        "unrolls the sweep chain, computes every per-sweep max-|delta| " +
        "as data, derives the stop k = min{i : delta_i <= tol} exactly " +
        "like the solver's while-loop, and emits sweep k's ratings " +
        "with iterations=k — the convergence TEST itself is replayed " +
        "on both engines, so a fixture regeneration that moves the " +
        "stop round moves both sides together (the v21b data-computed-" +
        "rule discipline applied to dm10d's recipe). " +
        "tools.RatingsConvergenceProbe measures the delta sequence " +
        "and the |delta_k - tol| margins per SF.",
      (s, d) => {
        import s.implicits._
        val games = dm10Games(s, d)
        val ratings = graft.ratings.IterativeRatings.solve(games,
          graft.ratings.IterativeRatings.Config(maxIter = 200, tol = 0.01))
        ratings.map(r => (r.team, r.adjOe, r.adjDe, r.games, r.iterations))
          .toDF("team", "adj_oe", "adj_de", "games", "iterations")
          .select(col("team"),
            round(col("adj_oe"), 3).as("adj_oe"),
            round(col("adj_de"), 3).as("adj_de"),
            col("games"), col("iterations"))
      },
      Some(dm10ConvergedSql(tol = 0.01, n = Dm10OracleSweeps))),

    // ----- one Lloyd assignment step ---------------------------------------------
    Q(
      "v05b_lloyd_assign",
      "One Lloyd assignment step against the deterministic seed " +
        "centroids KMeans.fit starts from (k=8 smallest md5(vec_id)): " +
        "max-dot-product cluster per vector with a (dot desc, seed asc) " +
        "tiebreak — the per-iteration kernel of v05, hash-matched.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val seeds = e.select(col("vec_id").as("sid"), col("embedding").as("se"),
            md5(col("vec_id").cast("string")).as("h"))
          .orderBy(col("h").asc, col("sid").asc).limit(8)
          .select(col("sid"), col("se"))
        val c = e.select(col("vec_id"), col("embedding").as("ce"))
        // argmax via max_by (hash agg, no per-key sort); tiebreak
        // (dot desc, sid asc) via the (dot, -sid) ordering key
        c.join(broadcast(seeds), lit(true))
          .withColumn("dot", dot("se", "ce"))
          .groupBy(col("vec_id"))
          .agg(
            max_by(col("sid"), struct(col("dot"), (-col("sid")).as("ns"))).as("cluster_seed"),
            round(max(struct(col("dot"), (-col("sid")).as("ns"))).getField("dot"), 4).as("dot"))
      },
      Some("""
        WITH seeds AS (
          SELECT vec_id AS sid, embedding::DOUBLE[] AS se
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 8),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
        s AS (SELECT vec_id, sid, list_dot_product(se, ce) AS dot FROM c, seeds)
        SELECT vec_id, sid AS cluster_seed, round(dot, 4) AS dot
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY dot DESC, sid ASC) rn FROM s)
        WHERE rn = 1""")),

    // ----- two composed Lloyd steps (assign → update → re-assign) ---------------
    Q(
      "v05c_lloyd_iterate",
      "The REAL KMeans.fit at iterations=2 — seed assignment, centroid " +
        "mean update (empty clusters keep their seed), re-assignment " +
        "against the updated centroids — hash-matched against a full " +
        "SQL replay of both steps. This gates the iterative WIRING of " +
        "the k-means build (what v05b's single step couldn't), the " +
        "same upgrade g07 gives the ratings solver; only unbounded " +
        "iteration counts remain procedural (v05).",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val (assign, _) = graft.operators.KMeans.fit(s, e, k = 8, iterations = 2)
        assign.select(col("vec_id"), col("cluster").cast("long").as("cluster"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToD2}
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM (
          SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dot DESC, cluster ASC) AS rn
          FROM d2) WHERE rn = 1""")),

    // ----- the k-means convergence TEST itself under the hash gate ----------------
    Q(
      "v05d_kmeans_converged",
      "The early-stop convergence path of KMeans.fitConverged (the " +
        "dm10d recipe applied to the last rows-only carve-out family): " +
        "maxIter=25 with tol=0.12 on the embeddings table, where the " +
        "max per-coordinate centroid movement is ~0.32-0.34 after Lloyd " +
        "iteration 1 and ~0.017-0.034 after iteration 2 at every test " +
        "SF (measured via tools.KmProbe — the tolerance is bracketed " +
        "with >0.08 margin on both sides), so the convergence test " +
        "STOPS at exactly 2 iterations. The oracle replays assign -> " +
        "update -> re-assign -> update in SQL and pins iterations=2: " +
        "the hash matches only if the early-stop fires where the " +
        "bracketing says it must, and the FINAL centroids are what two " +
        "exact Lloyd updates produce.",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val (_, cent, iters) = graft.operators.KMeans.fitConverged(
          s, e, k = 8, maxIter = 25, tol = 0.12)
        cent.zipWithIndex.flatMap { case (c, ci) =>
          c.zipWithIndex.map { case (v, pos) =>
            (ci.toLong, pos.toLong, v, iters.toLong)
          }
        }.toSeq.toDF("cluster", "pos", "cv0", "iterations")
          .select(col("cluster"), col("pos"),
            round(col("cv0"), 4).as("cv"), col("iterations"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2}
        SELECT CAST(cluster AS BIGINT) AS cluster, CAST(pos AS BIGINT) AS pos,
               round(cv, 4) AS cv, CAST(2 AS BIGINT) AS iterations
        FROM cent2""")),

    // ----- FULL possession chain incl. and-1 lookahead -----------------------------
    Q(
      "pbp03_full_chain",
      "The ENTIRE possession state machine — and-1 lookahead included — " +
        "hash-matched against a full SQL replay. The lookahead is " +
        "bounded-window-expressible: next-action index per row, first " +
        "same-clock foul before it, ranked FT collection capped at the " +
        "expected count; possession ids are then a running count over " +
        "computed boundary flags, and offense follows the last start's " +
        "pending-offense rule (def-rebound keeps, else flips; period " +
        "change clears). Runs the REAL PossessionEngine.enrich on a " +
        "foul-enriched play stream (coarse 150-value clock so same-" +
        "clock shot+foul sequences occur organically). Upgrades pbp01 " +
        "from rows-only + golden fixture to a cross-engine hash gate " +
        "of the full chain on 10k plays.",
      (s, d) => {
        graft.pbp.PossessionEngine.enrich(pbpPlays(s, d)).toDF()
          .select(col("id"), col("gameId").as("game_id"),
            col("possession_id"), col("offense_team_id"),
            col("possession_end"), col("garbage_time"))
      },
      Some(s"""${pbpChainCtes(FoulPlaysSelect)}
        SELECT id, game_id, possession_id, offense_team_id,
               possession_end, garbage_time
        FROM enr""")),

    // ----- the WHOLE pbp01 pipeline: chain + game-team aggregates -----------------
    Q(
      "pbp04_game_team_stats",
      "The COMPLETE pbp01 pipeline under the hash gate: the real " +
        "PossessionEngine.enrich + GameTeamStats.build (conditional box " +
        "aggs, event-counted possessions crediting the offense team, " +
        "formula possessions, opponent self-join, eFG/TS/ft-rate/" +
        "tov-ratio/oreb-pct/pace derivations — build_pbp_game_team_" +
        "stats.py:155-283) vs the pbp03 chain CTEs plus the aggregate " +
        "layer in SQL. With this, nothing in the PBP surface rests on " +
        "rows-only checks: pbp01 itself stays rows-only purely as the " +
        "driver-contract smoke query.",
      (s, d) => {
        val enriched = graft.pbp.PossessionEngine.enrich(pbpPlays(s, d))
        graft.pbp.GameTeamStats.build(enriched.toDF())
          .select(col("gameId"), col("teamId"), col("opponentId"),
            col("is_home_team"), col("fga"), col("fgm"), col("fg3m"),
            col("fta"), col("ftm"), col("tov"), col("dreb"), col("oreb"),
            col("pts"), col("max_period"), col("possessions_event"),
            col("possessions_formula"), col("opp_pts"),
            col("opp_poss_formula"), col("opp_dreb"), col("opp_fga"),
            col("game_minutes"), col("efg_pct"), col("ts_pct"),
            col("ft_rate"), col("tov_ratio"), col("oreb_pct"), col("pace"))
      },
      Some(s"""${pbpChainCtes(FoulPlaysSelect)},
        $GameTeamAggSql""")),

    // ----- the garbage-removed variant of the game-team table ---------------------
    Q(
      "pbp06_garbage_removed",
      "The garbage-removed PBP aggregate table (build_pbp_game_teams_" +
        "flat.py:185-186 exclude-garbage filter + :301-314 clock-" +
        "segment garbage-minutes integration): GameTeamStats.build with " +
        "excludeGarbage=true — every box stat recomputed over non-" +
        "garbage plays only — joined to the per-game garbage_time_" +
        "minutes integral (distinct clock instants OR-flagged, each " +
        "flagged instant contributing sec - next_sec). Oracle extends " +
        "the pbp04 CTEs with the garbage filter and the same lag-window " +
        "integration in SQL. Covers SURVEY P5 + W7's un-gated variant.",
      (s, d) => {
        val enriched =
          graft.pbp.PossessionEngine.enrich(pbpPlays(s, d)).toDF()
        val stats = graft.pbp.GameTeamStats.build(enriched,
          excludeGarbage = true)
        val gm = graft.pbp.GameTeamStats.garbageMinutes(enriched)
        stats.join(gm, Seq("gameId"), "left")
          .withColumn("garbage_time_minutes",
            coalesce(col("garbage_time_minutes"), lit(0.0)))
          .select(col("gameId"), col("teamId"), col("opponentId"),
            col("is_home_team"), col("fga"), col("fgm"), col("fg3m"),
            col("fta"), col("ftm"), col("tov"), col("dreb"), col("oreb"),
            col("pts"), col("max_period"), col("possessions_event"),
            col("possessions_formula"), col("opp_pts"),
            col("opp_poss_formula"), col("opp_dreb"), col("opp_fga"),
            col("game_minutes"), col("efg_pct"), col("ts_pct"),
            col("ft_rate"), col("tov_ratio"), col("oreb_pct"),
            col("pace"), col("garbage_time_minutes"))
      },
      Some(s"""${pbpChainCtes(FoulPlaysSelect)},
        enrx AS (SELECT * FROM enr WHERE NOT garbage_time),
        ${gameTeamAggCtes("enrx")},
        clock AS (
          SELECT game_id, period, sec,
                 max(CASE WHEN garbage_time THEN 1 ELSE 0 END) AS g
          FROM enr WHERE period IS NOT NULL AND sec IS NOT NULL
          GROUP BY 1, 2, 3),
        seg AS (
          SELECT *, coalesce(lead(sec) OVER (PARTITION BY game_id, period
                      ORDER BY sec DESC), 0) AS next_sec
          FROM clock),
        gm AS (
          SELECT game_id,
                 sum(CASE WHEN g = 1 THEN greatest(sec - next_sec, 0)
                          ELSE 0 END) / 60.0 AS garbage_time_minutes
          FROM seg GROUP BY 1)
        SELECT j.game_id AS gameId, team_id AS teamId, opp_tid AS opponentId,
               team_id = 1 AS is_home_team,
               $GameTeamDeriveCols,
               coalesce(gm.garbage_time_minutes, 0.0) AS garbage_time_minutes
        FROM j LEFT JOIN gm ON j.game_id = gm.game_id""")),

    // ----- backtest harness: all four metric families in one pass ------------------
    Q(
      "bt01_backtest_metrics",
      "The spread-backtest harness (I5, backtest_spreads.py:296-366) " +
        "on a dyadic fixture (model margins in quarters, book spreads " +
        "in halves, integer actual margins — every error sum is exactly " +
        "representable, so cross-engine float order cannot drift): " +
        "MAE/mean/std vs the book, CLV on |model−book|>3 games, and the " +
        "ROI table at thresholds 1–7 under −110 juice. One scan feeds " +
        "the metrics row; the ROI table is the threshold-explode + " +
        "conditional-agg pass of Backtest.roiTable; the 7×1 combine is " +
        "a broadcast nested loop, not a cartesian.",
      (s, d) => {
        val preds = Tables.orders(s, d).select(
          (((col("o_orderkey") % 41) - 20).cast("double") * 0.25)
            .as("model_margin"),
          (((col("o_custkey") % 29) - 14).cast("double") * 0.5)
            .as("book_spread"),
          ((col("o_orderkey") % 33) - 16).cast("double").as("actual_margin"))
        val metrics = Backtest.errorMetrics(preds).select(
          col("n_games"),
          round(col("model_mae"), 6).as("model_mae"),
          round(col("book_mae"), 6).as("book_mae"),
          round(col("model_mean"), 6).as("model_mean"),
          round(col("book_mean"), 6).as("book_mean"),
          round(col("model_std"), 6).as("model_std"),
          round(col("book_std"), 6).as("book_std"),
          col("clv_total"), col("clv_wins"),
          round(col("clv_rate"), 6).as("clv_rate"))
        val roi = Backtest.roiTable(preds).select(
          col("threshold"), col("bets"), col("wins"), col("losses"),
          col("pushes"), col("resolved"),
          round(col("win_rate"), 6).as("win_rate"),
          round(col("roi"), 6).as("roi"))
        roi.crossJoin(broadcast(metrics))
      },
      Some("""
        WITH preds AS (
          SELECT CAST(o_orderkey % 41 - 20 AS DOUBLE) * 0.25 AS model_margin,
                 CAST(o_custkey % 29 - 14 AS DOUBLE) * 0.5 AS book_spread,
                 CAST(o_orderkey % 33 - 16 AS DOUBLE) AS actual_margin
          FROM orders),
        e AS (
          SELECT *,
                 model_margin - actual_margin AS model_err,
                 (-book_spread) - actual_margin AS book_err,
                 model_margin - (-book_spread) AS diff,
                 actual_margin + book_spread AS ats
          FROM preds),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n_games,
                 round(avg(abs(model_err)), 6) AS model_mae,
                 round(avg(abs(book_err)), 6) AS book_mae,
                 round(avg(model_err), 6) AS model_mean,
                 round(avg(book_err), 6) AS book_mean,
                 round(sqrt(avg(model_err * model_err)
                            - avg(model_err) * avg(model_err)), 6) AS model_std,
                 round(sqrt(avg(book_err * book_err)
                            - avg(book_err) * avg(book_err)), 6) AS book_std,
                 CAST(sum(CASE WHEN abs(diff) > 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS clv_total,
                 CAST(sum(CASE WHEN abs(diff) > 3
                                AND abs(model_err) < abs(book_err)
                               THEN 1 ELSE 0 END) AS BIGINT) AS clv_wins
          FROM e),
        m2 AS (
          SELECT *,
                 round(CASE WHEN clv_total > 0
                            THEN CAST(clv_wins AS DOUBLE) / clv_total
                            ELSE 0.0 END, 6) AS clv_rate
          FROM m),
        t AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(threshold)),
        bets AS (
          SELECT t.threshold, e.diff, e.ats,
                 CASE WHEN ats = 0 THEN 'push'
                      WHEN (diff > 0 AND ats > 0) OR (diff < 0 AND ats < 0)
                      THEN 'win' ELSE 'loss' END AS outcome
          FROM e JOIN t ON abs(e.diff) >= t.threshold),
        r AS (
          SELECT threshold,
                 CAST(count(*) AS BIGINT) AS bets,
                 CAST(sum(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
                 CAST(sum(CASE WHEN outcome = 'loss' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
                 CAST(sum(CASE WHEN outcome = 'push' THEN 1 ELSE 0 END) AS BIGINT) AS pushes
          FROM bets GROUP BY 1),
        r2 AS (
          SELECT threshold, bets, wins, losses, pushes,
                 wins + losses AS resolved,
                 round(CASE WHEN wins + losses > 0
                            THEN CAST(wins AS DOUBLE) * 100.0 / (wins + losses)
                            ELSE 0.0 END, 6) AS win_rate,
                 round(CASE WHEN wins + losses > 0
                            THEN (CAST(wins AS DOUBLE) * 100.0
                                  - CAST(losses AS DOUBLE) * 110.0)
                                 / (CAST(wins + losses AS DOUBLE) * 110.0) * 100.0
                            ELSE 0.0 END, 6) AS roi
          FROM r)
        SELECT r2.*, m2.* FROM r2, m2""")),

    // ----- multi-season backtest aggregation --------------------------------------
    Q(
      "bt02_backtest_multi_season",
      "The multi-season backtest aggregation END-TO-END (I5, " +
        "backtest_spreads.py save_multi_season_report:425-497): bt01's " +
        "dyadic fixture split into 3 seasons (o_orderkey % 3), each " +
        "run through the REAL Backtest.errorMetrics + roiTable, " +
        "collected by BacktestReport.collectResult (absent thresholds " +
        "zero-filled), and pooled by BacktestReport.aggregateSeasons - " +
        "the exact code path renderMultiSeasonReport prints: " +
        "games-weighted MAE means, summed CLV counters, per-threshold " +
        "pooled W/L/P with -110 ROI. The oracle replays the " +
        "per-season-then-pool arithmetic (weighted mean of per-season " +
        "means, not one global mean - numerically equal only if the " +
        "season plumbing neither drops nor double-counts a season). " +
        "Closes the last spec-only math in the report layer.",
      (s, d) => {
        import s.implicits._
        val preds0 = Tables.orders(s, d).select(
          (((col("o_orderkey") % 41) - 20).cast("double") * 0.25)
            .as("model_margin"),
          (((col("o_custkey") % 29) - 14).cast("double") * 0.5)
            .as("book_spread"),
          ((col("o_orderkey") % 33) - 16).cast("double").as("actual_margin"),
          (lit(2023) + col("o_orderkey") % 3).cast("int").as("season"))
        val perSeason = Seq(2023, 2024, 2025).map { yr =>
          val p = preds0.filter(col("season") === yr)
          (yr,
            graft.ratings.BacktestReport.collectResult(
              "adjusted", Backtest.errorMetrics(p), Backtest.roiTable(p)),
            4.0266)
        }
        val (tot, rows) =
          graft.ratings.BacktestReport.aggregateSeasons(perSeason)
        // round like the SQL round(x, 6): HALF_UP, away from zero
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        rows.map(r => (r.threshold, r.bets, r.wins, r.losses, r.pushes,
            r6(r.winPct), r6(r.roi), tot.games, r6(tot.modelMae),
            r6(tot.bookMae), tot.clvWins, tot.clvTotal, r6(tot.clvRate)))
          .toDF("threshold", "bets", "wins", "losses", "pushes",
            "win_pct", "roi", "total_games", "model_mae_w", "book_mae_w",
            "clv_wins", "clv_total", "clv_rate")
      },
      Some("""
        WITH preds AS (
          SELECT CAST(o_orderkey % 41 - 20 AS DOUBLE) * 0.25 AS model_margin,
                 CAST(o_custkey % 29 - 14 AS DOUBLE) * 0.5 AS book_spread,
                 CAST(o_orderkey % 33 - 16 AS DOUBLE) AS actual_margin,
                 CAST(2023 + o_orderkey % 3 AS INT) AS season
          FROM orders),
        e AS (
          SELECT *,
                 model_margin - actual_margin AS model_err,
                 (-book_spread) - actual_margin AS book_err,
                 model_margin - (-book_spread) AS diff,
                 actual_margin + book_spread AS ats
          FROM preds),
        sm AS (
          SELECT season, count(*) AS n,
                 avg(abs(model_err)) AS mmae, avg(abs(book_err)) AS bmae,
                 sum(CASE WHEN abs(diff) > 3 THEN 1 ELSE 0 END) AS clv_t,
                 sum(CASE WHEN abs(diff) > 3
                           AND abs(model_err) < abs(book_err)
                          THEN 1 ELSE 0 END) AS clv_w
          FROM e GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS total_games,
                 round(sum(mmae * n) / sum(n), 6) AS model_mae_w,
                 round(sum(bmae * n) / sum(n), 6) AS book_mae_w,
                 CAST(sum(clv_w) AS BIGINT) AS clv_wins,
                 CAST(sum(clv_t) AS BIGINT) AS clv_total,
                 round(CASE WHEN sum(clv_t) > 0
                            THEN CAST(sum(clv_w) AS DOUBLE) / sum(clv_t)
                            ELSE 0.0 END, 6) AS clv_rate
          FROM sm),
        thr AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(threshold)),
        b AS (
          SELECT thr.threshold,
                 CASE WHEN ats = 0 THEN 'push'
                      WHEN (diff > 0 AND ats > 0) OR (diff < 0 AND ats < 0)
                      THEN 'win' ELSE 'loss' END AS outcome
          FROM e JOIN thr ON abs(e.diff) >= thr.threshold),
        r0 AS (
          SELECT threshold,
                 CAST(count(*) AS BIGINT) AS bets,
                 CAST(sum(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
                 CAST(sum(CASE WHEN outcome = 'loss' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
                 CAST(sum(CASE WHEN outcome = 'push' THEN 1 ELSE 0 END) AS BIGINT) AS pushes
          FROM b GROUP BY 1),
        r AS (
          SELECT thr.threshold,
                 coalesce(r0.bets, 0) AS bets, coalesce(r0.wins, 0) AS wins,
                 coalesce(r0.losses, 0) AS losses, coalesce(r0.pushes, 0) AS pushes
          FROM thr LEFT JOIN r0 USING (threshold))
        SELECT r.threshold, r.bets, r.wins, r.losses, r.pushes,
               round(CASE WHEN r.wins + r.losses > 0
                          THEN CAST(r.wins AS DOUBLE) * 100.0 / (r.wins + r.losses)
                          ELSE 0.0 END, 6) AS win_pct,
               round(CASE WHEN r.wins + r.losses > 0
                          THEN (CAST(r.wins AS DOUBLE) * 100.0
                                - CAST(r.losses AS DOUBLE) * 110.0)
                               / (CAST(r.wins + r.losses AS DOUBLE) * 110.0) * 100.0
                          ELSE 0.0 END, 6) AS roi,
               t.total_games, t.model_mae_w, t.book_mae_w,
               t.clv_wins, t.clv_total, t.clv_rate
        FROM r, tot t""")),

    // ----- tuning grid: full holdout sweep table at a pinned 1-sweep solve ---------
    Q(
      "tu01_holdout_sweep",
      "The FULL tuning-grid sweep table (I6, tune_ratings_holdout.py:" +
        "46-47,138-171): half-life × margin-cap × SOS-exponent, each " +
        "cell scored by spread-prediction MAE against uncapped actual " +
        "margins. The solver is pinned to exactly one sweep (maxIter=1, " +
        "tol<0 — the dm10c recipe) so every cell's decay weighting, " +
        "margin-cap split, HCA-adjusted efficiency, clamped init, and " +
        "(league/opp)^alpha re-estimate replay in SQL. Games are the " +
        "bounded (home, away, day, neutral) grid pre-aggregated BEFORE " +
        "collect — ≤20·19·60·2 cells regardless of fact cardinality.",
      (s, d) => {
        val rows = Tables.orders(s, d).select(
            (col("o_orderkey") % 20).as("home"),
            ((col("o_orderkey") % 20) + 1 + (col("o_custkey") % 19)).mod(20).as("away"),
            (col("o_custkey") % 60).cast("int").as("d"),
            (col("o_orderkey") % 7 === 0).as("neutral"),
            (lit(60) + col("o_orderkey") % 30).cast("double").as("home_pts"),
            (lit(55) + col("o_custkey") % 30).cast("double").as("away_pts"),
            (lit(65) + col("o_orderkey") % 10).cast("double").as("poss"))
          .filter(col("home") =!= col("away"))
          .groupBy(col("home"), col("away"), col("d"), col("neutral"))
          .agg(count(lit(1)).as("n"), sum(col("home_pts")).as("shp"),
            sum(col("away_pts")).as("sap"), sum(col("poss")).as("sps"))
          .collect()
        val games = rows.toSeq.zipWithIndex.map { case (r, i) =>
          val n = r.getAs[Long]("n").toDouble
          graft.ratings.TuningSweep.Game(
            i.toLong,
            java.time.LocalDate.of(2025, 1, 1).plusDays(r.getAs[Int]("d").toLong),
            r.getAs[Long]("home"), r.getAs[Long]("away"),
            r.getAs[Double]("shp") / n, r.getAs[Double]("sap") / n,
            r.getAs[Double]("sps") / n, r.getAs[Boolean]("neutral"))
        }
        graft.ratings.TuningSweep.sweep(s, games,
            halfLives = Seq(30.0, 60.0),
            marginCaps = Seq(Some(10.0), None),
            sosExponents = Seq(0.7, 1.0),
            hca = Some(2.0), maxIter = 1, tol = -1.0)
          .select(col("half_life"), col("margin_cap"), col("sos_exponent"),
            round(col("mae"), 6).as("mae"), col("n_games"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey % 20 AS home,
                 ((o_orderkey % 20) + 1 + (o_custkey % 19)) % 20 AS away,
                 CAST(o_custkey % 60 AS INT) AS d,
                 o_orderkey % 7 = 0 AS neutral,
                 CAST(60 + o_orderkey % 30 AS DOUBLE) AS home_pts,
                 CAST(55 + o_custkey % 30 AS DOUBLE) AS away_pts,
                 CAST(65 + o_orderkey % 10 AS DOUBLE) AS poss
          FROM orders
          WHERE (o_orderkey % 20) <> ((o_orderkey % 20) + 1 + (o_custkey % 19)) % 20),
        grid AS (
          SELECT home, away, d, neutral,
                 sum(home_pts) / count(*) AS hp,
                 sum(away_pts) / count(*) AS ap,
                 sum(poss) / count(*) AS ps
          FROM base GROUP BY 1, 2, 3, 4),
        mx AS (SELECT max(d) AS maxd FROM grid),
        cells AS (
          SELECT cid, CAST(half_life AS DOUBLE) AS half_life,
                 CAST(margin_cap AS DOUBLE) AS margin_cap,
                 CAST(sos_exponent AS DOUBLE) AS sos_exponent
          FROM (VALUES (1, 30.0, 10.0, 0.7), (2, 30.0, 10.0, 1.0),
                       (3, 30.0, NULL, 0.7), (4, 30.0, NULL, 1.0),
                       (5, 60.0, 10.0, 0.7), (6, 60.0, 10.0, 1.0),
                       (7, 60.0, NULL, 0.7), (8, 60.0, NULL, 1.0))
               AS v(cid, half_life, margin_cap, sos_exponent)),
        g2 AS (
          SELECT c.cid, g.home, g.away, g.neutral, g.ps,
                 g.hp - g.ap AS margin,
                 pow(0.5, (mx.maxd - g.d) / c.half_life) AS w,
                 CASE WHEN c.margin_cap IS NOT NULL
                           AND abs(g.hp - g.ap) > c.margin_cap
                      THEN CASE WHEN g.hp - g.ap > 0
                                THEN g.hp - (abs(g.hp - g.ap) - c.margin_cap) / 2
                                ELSE g.hp + (abs(g.hp - g.ap) - c.margin_cap) / 2 END
                      ELSE g.hp END AS chp,
                 CASE WHEN c.margin_cap IS NOT NULL
                           AND abs(g.hp - g.ap) > c.margin_cap
                      THEN CASE WHEN g.hp - g.ap > 0
                                THEN g.ap + (abs(g.hp - g.ap) - c.margin_cap) / 2
                                ELSE g.ap - (abs(g.hp - g.ap) - c.margin_cap) / 2 END
                      ELSE g.ap END AS cap
          FROM grid g, mx, cells c),
        obs AS (
          SELECT cid, home AS team, away AS opp, chp AS pts, cap AS opp_pts,
                 ps, w, neutral, true AS is_home FROM g2
          UNION ALL
          SELECT cid, away, home, cap, chp, ps, w, neutral, false FROM g2),
        eff AS (
          SELECT *,
                 pts / ps * 100.0 + CASE WHEN neutral THEN 0.0
                                         WHEN is_home THEN -2.0
                                         ELSE 2.0 END AS go,
                 opp_pts / ps * 100.0 + CASE WHEN neutral THEN 0.0
                                             WHEN is_home THEN 2.0
                                             ELSE -2.0 END AS gd
          FROM obs),
        lg AS (
          SELECT cid, sum(w * pts) / sum(w * ps) * 100.0 AS league
          FROM eff GROUP BY 1),
        init AS (
          SELECT cid, team,
                 least(greatest(sum(w * go) / sum(w), 40.0), 200.0) AS oe0,
                 least(greatest(sum(w * gd) / sum(w), 40.0), 200.0) AS de0
          FROM eff GROUP BY 1, 2),
        s1 AS (
          SELECT e.cid, e.team,
                 least(greatest(
                   sum(e.w * e.go * pow(l.league / i.de0, c.sos_exponent)) / sum(e.w),
                   40.0), 200.0)
                 - least(greatest(
                   sum(e.w * e.gd * pow(l.league / i.oe0, c.sos_exponent)) / sum(e.w),
                   40.0), 200.0) AS net
          FROM eff e
          JOIN init i ON e.cid = i.cid AND e.opp = i.team
          JOIN lg l ON e.cid = l.cid
          JOIN cells c ON e.cid = c.cid
          GROUP BY 1, 2),
        err AS (
          SELECT g.cid,
                 abs(sh.net - sa.net
                     + CASE WHEN g.neutral THEN 0.0 ELSE 4.0 END
                     - g.margin) AS e
          FROM g2 g
          JOIN s1 sh ON g.cid = sh.cid AND g.home = sh.team
          JOIN s1 sa ON g.cid = sa.cid AND g.away = sa.team)
        SELECT c.half_life, c.margin_cap, c.sos_exponent,
               round(avg(err.e), 6) AS mae,
               CAST(count(*) AS BIGINT) AS n_games
        FROM err JOIN cells c ON err.cid = c.cid
        GROUP BY 1, 2, 3""")),

    // ----- the pbp01 stream itself under the chain gate ----------------------------
    Q(
      "pbp05_nofoul_chain",
      "The possession state machine on pbp01's EXACT play stream (fine " +
        "1200-value clock, no foul injection) — the same SQL replay as " +
        "pbp03 parameterized over the no-foul stream. With pbp03 gating " +
        "the foul/and-1 path and this gating pbp01's own input, the " +
        "rows-only pbp01 entry is pure driver-contract smoke.",
      (s, d) => {
        graft.pbp.PossessionEngine.enrich(noFoulPlays(s, d)).toDF()
          .select(col("id"), col("gameId").as("game_id"),
            col("possession_id"), col("offense_team_id"),
            col("possession_end"), col("garbage_time"))
      },
      Some(s"""${pbpChainCtes(NoFoulPlaysSelect)}
        SELECT id, game_id, possession_id, offense_team_id,
               possession_end, garbage_time
        FROM enr""")),

    // ----- pbp01's EXACT composition under the hash gate ---------------------------
    Q(
      "pbp07_nofoul_game_team_stats",
      "pbp01's EXACT computation as a hash twin (VERDICT r13 #6 — the " +
        "dm10d recipe applied to the last rows-only family): the full " +
        "enrich + GameTeamStats.build composition on pbp01's own play " +
        "stream (fine 1200-value clock, no foul injection). pbp04 " +
        "gated the composition on the FOUL stream and pbp05 gated the " +
        "state machine on THIS stream; this gate closes the remaining " +
        "cell of the matrix — the aggregate layer over the no-foul " +
        "chain — so every computation pbp01 performs is now hash-" +
        "matched cross-engine and the rows-only pbp01 entry is purely " +
        "the driver-contract smoke query. Oracle: the no-foul chain " +
        "CTEs + the SAME GameTeamAggSql layer pbp04 replays (shared " +
        "verbatim, the adcAllSql convention).",
      (s, d) => {
        val enriched = graft.pbp.PossessionEngine.enrich(noFoulPlays(s, d))
        graft.pbp.GameTeamStats.build(enriched.toDF())
          .select(col("gameId"), col("teamId"), col("opponentId"),
            col("is_home_team"), col("fga"), col("fgm"), col("fg3m"),
            col("fta"), col("ftm"), col("tov"), col("dreb"), col("oreb"),
            col("pts"), col("max_period"), col("possessions_event"),
            col("possessions_formula"), col("opp_pts"),
            col("opp_poss_formula"), col("opp_dreb"), col("opp_fga"),
            col("game_minutes"), col("efg_pct"), col("ts_pct"),
            col("ft_rate"), col("tov_ratio"), col("oreb_pct"), col("pace"))
      },
      Some(s"""${pbpChainCtes(NoFoulPlaysSelect)},
        $GameTeamAggSql""")),

    // ----- PBP classifier + flags stage --------------------------------------------
    Q(
      "pbp02_classifier_flags",
      "The classifier + flags + ends_possession stage of the PBP chain " +
        "(pbp_stats.py:10-110 classify + build_pbp_plays_enriched.py " +
        "possession-end rule, BEFORE the procedural and-1 lookahead), " +
        "plus the garbage-time rule — all column expressions on the " +
        "same play stream pbp01 derives from events, hash-matched.",
      (s, d) => {
        val cls = new PlayClassifier()
        val plays = Tables.events(s, d).select(
          col("event_id").as("id"),
          col("user_id").as("game_id"),
          when(col("event_type") === "click", "JumpShot")
            .when(col("event_type") === "view", "Defensive Rebound")
            .when(col("event_type") === "purchase", "Three Point Jump Shot")
            .when(col("event_type") === "signup", "Free Throw 1 of 1")
            .otherwise("Lost Ball Turnover").as("playType"),
          lit(null).cast("string").as("playText"),
          (col("value") > 0.5).as("scoringPlay"),
          lit(null).cast("boolean").as("shootingPlay"),
          when(col("event_type") === "signup", 1.0)
            .when(col("event_type") === "purchase", 3.0)
            .when(col("event_type") === "click", 2.0).as("scoreValue"),
          (lit(1) + (col("event_id") % 97 % 2)).cast("int").as("period"),
          (lit(1200L) - col("event_id") % 1200).as("seconds_remaining"),
          (col("event_id") % 40).as("home_score"),
          (col("event_id") % 37).as("away_score"))
        val text = cls.textCol(col("playType"), col("playText"))
        val isFt = cls.isFtCol(text, col("scoreValue"))
        val isShot = cls.isShotCol(text, col("shootingPlay"), col("scoreValue"))
        val isTo = cls.isTurnoverCol(text)
        val isDr = cls.isDefReboundCol(text)
        val isOr = cls.isOffReboundCol(text)
        val isLastFt = cls.isLastFtCol(text)
        val isPe = cls.isPeriodEndCol(text)
        val madeFg = isShot && col("scoringPlay")
        val madeFt = isFt && col("scoringPlay")
        val margin = abs(col("home_score") - col("away_score"))
        plays.select(
          col("id"), col("game_id"), col("playType").as("play_type"),
          isTo.as("is_turnover"), isDr.as("is_def_rebound"),
          isOr.as("is_off_rebound"), isShot.as("is_fga"),
          madeFg.as("is_made_fg"), isFt.as("is_fta"), madeFt.as("is_made_ft"),
          isLastFt.as("is_last_ft"), isPe.as("is_period_end"),
          (isTo || isDr || madeFg || (madeFt && isLastFt) || isPe).as("ends_possession"),
          (col("period") >= 2 &&
            ((margin >= 20 && col("seconds_remaining") <= 600) ||
             (margin >= 15 && col("seconds_remaining") <= 300))).as("garbage_time"))
      },
      Some("""
        WITH plays AS (
          SELECT event_id AS id, user_id AS game_id,
                 CASE event_type WHEN 'click' THEN 'JumpShot'
                                 WHEN 'view' THEN 'Defensive Rebound'
                                 WHEN 'purchase' THEN 'Three Point Jump Shot'
                                 WHEN 'signup' THEN 'Free Throw 1 of 1'
                                 ELSE 'Lost Ball Turnover' END AS play_type,
                 value > 0.5 AS scoring,
                 CASE event_type WHEN 'signup' THEN 1.0
                                 WHEN 'purchase' THEN 3.0
                                 WHEN 'click' THEN 2.0 END AS score_value,
                 CAST(1 + (event_id % 97 % 2) AS INT) AS period,
                 1200 - event_id % 1200 AS seconds_remaining,
                 event_id % 40 AS home_score, event_id % 37 AS away_score
          FROM events),
        f AS (
          SELECT *, trim(play_type || ' ') AS text,
                 CASE WHEN score_value IS NOT NULL THEN score_value = 1.0
                      ELSE regexp_matches(play_type, '(?i)(Free Throw)') END AS is_fta
          FROM plays),
        g AS (
          SELECT *,
                 regexp_matches(text, '(?i)(Offensive Charge|Lost Ball Turnover|Foul Turnover)') AS is_turnover,
                 regexp_matches(text, '(?i)(Defensive Rebound|Dead Ball Rebound)') AS is_def_rebound,
                 regexp_matches(text, '(?i)(Offensive Rebound)') AS is_off_rebound,
                 CASE WHEN is_fta THEN false
                      ELSE regexp_matches(text, '(?i)(Shot|JumpShot|RegularJumpShot|LayUpShot|LayupShot|DunkShot|TipShot|Three Pointer|Three Point Jump Shot)')
                 END AS is_fga,
                 regexp_matches(text, '(?i)(Free Throw 1 of 1)') AS is_last_ft,
                 regexp_matches(text, '(?i)(End Game|End Period)') AS is_period_end
          FROM f)
        SELECT id, game_id, play_type, is_turnover, is_def_rebound,
               is_off_rebound, is_fga,
               is_fga AND scoring AS is_made_fg, is_fta,
               is_fta AND scoring AS is_made_ft, is_last_ft, is_period_end,
               is_turnover OR is_def_rebound OR (is_fga AND scoring)
                 OR ((is_fta AND scoring) AND is_last_ft) OR is_period_end AS ends_possession,
               period >= 2 AND
                 ((abs(home_score - away_score) >= 20 AND seconds_remaining <= 600) OR
                  (abs(home_score - away_score) >= 15 AND seconds_remaining <= 300)) AS garbage_time
        FROM g"""))
  )
}
