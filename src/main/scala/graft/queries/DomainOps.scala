package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.multimodal.MediaOps
import graft.operators.Sessionize
import graft.ratings.IterativeRatings

/** Domain (reference-semantics) operators exercised on the generic test
  * tables: the basketball formula families (SURVEY.md §2.8 F8–F10), the
  * regex play-classifier pattern (F1), leakage-free as-of windows (W4),
  * the iterative SOS solver (§2.9 I1), the stateful sessionizer (W6),
  * and the multimodal payload plumbing.
  */
object DomainOps {

  def defs: Seq[Q] = Seq(

    // ----- F8: possessions / shooting-efficiency formula family ---------------
    Q(
      "dm01_possession_formula",
      "Basketball formula family (F8, build_pbp_game_team_stats.py:271, " +
        "build_pbp_game_teams_flat.py:277-293): conditional counting " +
        "stats then poss = FGA - OREB + TOV + 0.44*FTA, eFG%, TS%, FT " +
        "rate, TOV ratio — pure conditional-agg + arithmetic, one " +
        "shuffle.",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_quantity") > 10, 1L).otherwise(0L)).as("fga"),
            sum(when(col("l_discount") < 0.03, 1L).otherwise(0L)).as("fgm"),
            sum(when(col("l_tax") > 0.06, 1L).otherwise(0L)).as("fg3m"),
            sum(when(col("l_quantity") < 5, 1L).otherwise(0L)).as("fta"),
            sum(when(col("l_discount") > 0.08, 1L).otherwise(0L)).as("oreb"),
            sum(when(col("l_quantity").between(20, 25), 1L).otherwise(0L)).as("tov"),
            sum(col("l_quantity")).as("pts"))
          .select(
            col("l_returnflag"), col("fga"), col("fta"), col("tov"),
            round(col("fga") - col("oreb") + col("tov") + lit(0.44) * col("fta"), 2).as("poss"),
            round((col("fgm") + lit(0.5) * col("fg3m")) * lit(1.0) / col("fga"), 4).as("efg"),
            round(col("pts") / (lit(2.0) * (col("fga") + lit(0.44) * col("fta"))), 4).as("ts_pct"),
            round(col("fta") * lit(1.0) / col("fga"), 4).as("ft_rate"),
            round(col("tov") / (col("fga") - col("oreb") + col("tov") + lit(0.44) * col("fta")), 4).as("tov_ratio"))
      },
      Some("""
        WITH a AS (
          SELECT l_returnflag,
                 sum(CASE WHEN l_quantity > 10 THEN 1 ELSE 0 END) AS fga,
                 sum(CASE WHEN l_discount < 0.03 THEN 1 ELSE 0 END) AS fgm,
                 sum(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END) AS fg3m,
                 sum(CASE WHEN l_quantity < 5 THEN 1 ELSE 0 END) AS fta,
                 sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS oreb,
                 sum(CASE WHEN l_quantity BETWEEN 20 AND 25 THEN 1 ELSE 0 END) AS tov,
                 sum(l_quantity) AS pts
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, CAST(fga AS BIGINT) AS fga,
               CAST(fta AS BIGINT) AS fta, CAST(tov AS BIGINT) AS tov,
               round(fga - oreb + tov + 0.44 * fta, 2) AS poss,
               round((fgm + 0.5 * fg3m) * 1.0 / fga, 4) AS efg,
               round(pts / (2.0 * (fga + 0.44 * fta)), 4) AS ts_pct,
               round(fta * 1.0 / fga, 4) AS ft_rate,
               round(tov / (fga - oreb + tov + 0.44 * fta), 4) AS tov_ratio
        FROM a""")),

    // ----- F9: rating math (clamp, barthag, SOS multiplier) --------------------
    Q(
      "dm02_rating_math",
      "Rating math family (F9, iterative_ratings.py:27-28,58-77,254-264): " +
        "efficiency clamped to [40,200], BARTHAG = oe^11.5/(oe^11.5 + " +
        "de^11.5), SOS multiplier (league/opp)^0.85 vs a broadcast league " +
        "average.",
      (s, d) => {
        val sup = Tables.supplier(s, d)
        val li = Tables.lineitem(s, d)
        val n = Tables.nation(s, d)
        val base = li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            avg(col("l_extendedprice")).as("ap"),
            avg(col("l_quantity")).as("aq"))
          .select(col("n_name"),
            least(greatest(col("ap") / 400.0, lit(40.0)), lit(200.0)).as("oe"),
            least(greatest(col("aq") * 4.0, lit(40.0)), lit(200.0)).as("de"))
        val league = base.agg(avg(col("de")).as("league_de"))
        base.crossJoin(broadcast(league))
          .select(
            col("n_name"), round(col("oe"), 4).as("oe"), round(col("de"), 4).as("de"),
            round(pow(col("oe"), 11.5) / (pow(col("oe"), 11.5) + pow(col("de"), 11.5)), 6).as("barthag"),
            round(pow(col("league_de") / col("de"), 0.85), 6).as("sos_mult"))
      },
      Some("""
        WITH base AS (
          SELECT n_name,
                 least(greatest(avg(l_extendedprice) / 400.0, 40.0), 200.0) AS oe,
                 least(greatest(avg(l_quantity) * 4.0, 40.0), 200.0) AS de
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1),
        lg AS (SELECT avg(de) AS league_de FROM base)
        SELECT n_name, round(oe, 4) AS oe, round(de, 4) AS de,
               round(pow(oe, 11.5) / (pow(oe, 11.5) + pow(de, 11.5)), 6) AS barthag,
               round(pow(league_de / de, 0.85), 6) AS sos_mult
        FROM base, lg""")),

    // ----- F10: ATS / betting-market derivations --------------------------------
    Q(
      "dm03_ats_market",
      "ATS derivation family (F10, market_lines_analysis.py:110-132 + " +
        "margin-cap splitting, adjusted_efficiencies.py:183-208): derive " +
        "scores/spread per game row, ats_margin = margin + spread, cover " +
        "and over flags, abs spread error, capped margin (excess halved); " +
        "rolled up per priority bucket.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val g = o.select(
          col("o_orderpriority"),
          (col("o_orderkey") % 100).cast("double").as("home_score"),
          (col("o_custkey") % 100).cast("double").as("away_score"),
          ((col("o_orderkey") % 30) - lit(15) + lit(0.5)).as("spread"))
          .withColumn("margin", col("home_score") - col("away_score"))
          .withColumn("ats_margin", col("margin") + col("spread"))
          .withColumn("total_points", col("home_score") + col("away_score"))
          .withColumn("capped_margin",
            signum(col("margin")) * (least(abs(col("margin")), lit(15.0))
              + greatest(abs(col("margin")) - 15.0, lit(0.0)) * 0.5))
        g.groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            round(avg(when(col("ats_margin") > 0, 1.0).otherwise(0.0)), 4).as("cover_rate"),
            round(avg(when(col("total_points") > 95.5, 1.0).otherwise(0.0)), 4).as("over_rate"),
            round(avg(abs(col("margin") + col("spread"))), 4).as("avg_spread_error"),
            round(avg(col("capped_margin")), 4).as("avg_capped_margin"))
      },
      Some("""
        WITH g AS (
          SELECT o_orderpriority,
                 CAST(o_orderkey % 100 AS DOUBLE) AS home_score,
                 CAST(o_custkey % 100 AS DOUBLE) AS away_score,
                 (o_orderkey % 30) - 15 + 0.5 AS spread
          FROM orders),
        h AS (SELECT *, home_score - away_score AS margin,
                     home_score + away_score AS total_points FROM g),
        i AS (SELECT *, margin + spread AS ats_margin,
                     sign(margin) * (least(abs(margin), 15.0)
                       + greatest(abs(margin) - 15.0, 0.0) * 0.5) AS capped_margin
              FROM h)
        SELECT o_orderpriority, count(*) AS n,
               round(avg(CASE WHEN ats_margin > 0 THEN 1.0 ELSE 0.0 END), 4) AS cover_rate,
               round(avg(CASE WHEN total_points > 95.5 THEN 1.0 ELSE 0.0 END), 4) AS over_rate,
               round(avg(abs(margin + spread)), 4) AS avg_spread_error,
               round(avg(capped_margin), 4) AS avg_capped_margin
        FROM i GROUP BY 1""")),

    // ----- F1: regex classification ----------------------------------------------
    Q(
      "dm04_regex_classify",
      "Regex play-classifier pattern (F1, pbp_stats.py:10-110: ordered " +
        "pattern classes, first match wins) applied to documents: " +
        "precedence when-chain of rlike classes, rolled up per " +
        "(lang, class).",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.withColumn("class",
            when(col("text").rlike("stream|window"), "streaming")
              .when(col("text").rlike("join|merge"), "join")
              .when(col("text").rlike("vector|embedding"), "vector")
              .when(col("text").rlike("scan|filter|sort"), "scan")
              .otherwise("other"))
          .groupBy(col("lang"), col("class"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("n_chars")), 2).as("avg_chars"))
      },
      Some("""
        SELECT lang,
               CASE WHEN regexp_matches(text, 'stream|window') THEN 'streaming'
                    WHEN regexp_matches(text, 'join|merge') THEN 'join'
                    WHEN regexp_matches(text, 'vector|embedding') THEN 'vector'
                    WHEN regexp_matches(text, 'scan|filter|sort') THEN 'scan'
                    ELSE 'other' END AS class,
               count(*) AS n, round(avg(n_chars), 2) AS avg_chars
        FROM documents GROUP BY 1, 2""")),

    // ----- W4: leakage-free strictly-prior window ---------------------------------
    Q(
      "dm05_leakage_free_prior",
      "Leakage-free as-of stats (W4, build_pbp_team_daily_rollup_adj.py" +
        ":255-313 'prior games only'): per order, aggregates over the " +
        "customer's STRICTLY prior orders — rowsBetween(unboundedPreceding" +
        ", -1), the frame the reference hand-rolls with a driver loop.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        // sum not avg: cent-valued sums stay safely off the half-way
        // rounding boundaries that avg/2^k lands on cross-engine
        o.select(
          col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("prior_n"),
          round(sum(col("o_totalprice")).over(w), 2).as("prior_total_price"),
          round(max(col("o_totalprice")).over(w), 2).as("prior_max_price"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(count(*) OVER w AS BIGINT) AS prior_n,
               round(sum(o_totalprice) OVER w, 2) AS prior_total_price,
               round(max(o_totalprice) OVER w, 2) AS prior_max_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""")),

    // ----- W6: stateful sessionizer parity ----------------------------------------
    Q(
      "w06b_sessionize_stateful",
      "The flatMapGroups stateful sessionizer (graft.operators." +
        "Sessionize) run against the SAME DuckDB oracle as the SQL-window " +
        "form w06 — procedural operator, declarative semantics, " +
        "hash-matched.",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("value"))
          .as[Sessionize.Ev]
        Sessionize.sessionize(e, 1800000L).toDF()
      },
      Some(Windows.SessionizeOracle)),

    // ----- I1: iterative SOS-adjusted ratings solver --------------------------------
    Q(
      "dm10_iterative_ratings",
      "The iterative SOS-adjustment fixed-point solver (I1, " +
        "iterative_ratings.py:80-353) over synthetic games derived " +
        "deterministically from orders. Scale contract: the fact rows " +
        "are pre-aggregated to the bounded (home, away) pair grid " +
        "(≤ 40x39 rows — count as solver weight, mean game per pair, " +
        "league Σpts/Σposs preserved exactly) BEFORE .collect(), so " +
        "driver memory is independent of fact cardinality. " +
        "Non-SQL-expressible: driver records a rows-only check; " +
        "invariants live in IterativeRatingsSpec; the single-sweep " +
        "core is hash-gated as dm10b.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val rows = o.select(
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
        val games = rows.iterator.flatMap { r =>
          val (h, a) = (r.getLong(0), r.getLong(1))
          val n = r.getLong(2).toDouble
          val (hp, ap, ps) =
            (r.getDouble(3) / n, r.getDouble(4) / n, r.getDouble(5) / n)
          Iterator(
            IterativeRatings.GameObs(h, a, hp, ps, ap, ps, n, isHome = true, neutral = false),
            IterativeRatings.GameObs(a, h, ap, ps, hp, ps, n, isHome = false, neutral = false))
        }.toSeq
        val ratings = IterativeRatings.solve(games,
          IterativeRatings.Config(maxIter = 100, tol = 1e-4))
        import s.implicits._
        ratings.map(r => (r.team, math.rint(r.adjOe * 1e4) / 1e4,
            math.rint(r.adjDe * 1e4) / 1e4,
            math.rint(r.barthag * 1e6) / 1e6, r.games))
          .toDF("team", "adj_oe", "adj_de", "barthag", "games")
      },
      None),

    // ----- I4: opponent-weighted efficiency ------------------------------------------
    Q(
      "dm06_opponent_weighted",
      "Opponent-weighted efficiency (I4, build_pbp_team_daily_rollup_adj" +
        ".py:276-307): each supplier's per-item revenue scaled by its " +
        "order-partners' group strength relative to the league mean — " +
        "join the per-group rating back onto the fact rows, then a " +
        "weighted mean per supplier.",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // 'opponent group' = the part's brand; rating = brand avg price
        val p = Tables.part(s, d)
        val brandStrength = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand")).agg(avg(col("l_extendedprice")).as("brand_rating"))
        val league = brandStrength.agg(avg(col("brand_rating")).as("league_rating"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(brandStrength), Seq("p_brand"))
          .crossJoin(broadcast(league))
          .groupBy(col("l_suppkey"))
          .agg(
            count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * col("league_rating") / col("brand_rating"))
              / sum(lit(1.0)), 2).as("opp_weighted_rev"))
          .filter(col("n_items") >= 200)
      },
      Some("""
        WITH bs AS (SELECT p_brand, avg(l_extendedprice) AS brand_rating
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    GROUP BY 1),
        lg AS (SELECT avg(brand_rating) AS league_rating FROM bs)
        SELECT l_suppkey, count(*) AS n_items,
               round(sum(l_extendedprice * league_rating / brand_rating)
                     / sum(1.0), 2) AS opp_weighted_rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN bs USING (p_brand), lg
        GROUP BY 1 HAVING count(*) >= 200""")),

    // ----- I6: external-reference correlation -----------------------------------------
    Q(
      "dm07_external_corr",
      "External-reference rating validation (I6: tune_ratings.py:49-61 " +
        "pearson_r, verify_kenpom.py intent): per-group Pearson r " +
        "between an internal metric and an external one via the " +
        "explicit-sums formula — a single partial-aggregable pass, no " +
        "collect. Dyadic inputs keep every sum exact cross-engine.",
      (s, d) => {
        val sup = Tables.supplier(s, d)
        val base = sup.select(col("s_nationkey"),
          ((col("s_suppkey") * 7 % 160).cast("double") * 0.25).as("x"),
          ((col("s_suppkey") * 7 % 160).cast("double") * 0.125 +
            (col("s_suppkey") * 13 % 80).cast("double") * 0.25).as("y"))
        val agg = base.groupBy(col("s_nationkey")).agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        agg.select(col("s_nationkey"),
          col("n").cast("long").as("n"),
          round(
            when(
              (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
                (col("n") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                  sqrt(col("n") * col("syy") - col("sy") * col("sy")))),
            6).as("pearson_r"))
      },
      Some("""
        WITH base AS (
          SELECT s_nationkey,
                 CAST(s_suppkey * 7 % 160 AS DOUBLE) * 0.25 AS x,
                 CAST(s_suppkey * 7 % 160 AS DOUBLE) * 0.125
                   + CAST(s_suppkey * 13 % 80 AS DOUBLE) * 0.25 AS y
          FROM supplier),
        a AS (
          SELECT s_nationkey, CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
          FROM base GROUP BY 1)
        SELECT s_nationkey, CAST(n AS BIGINT) AS n,
               round(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                          THEN (n * sxy - sx * sy)
                               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                     END, 6) AS pearson_r
        FROM a""")),

    // ----- A14: anomaly detection vs median ------------------------------------------
    Q(
      "a15_median_anomaly",
      "Audit anomaly detection vs median (A14, audit_lakehouse.py:187-245" +
        "): monthly row counts compared to the exact median month; " +
        "anomaly = count below half the median. The median is computed " +
        "over the tiny per-month aggregate, broadcast back.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val monthly = o.groupBy(
            to_date(date_trunc("month", col("o_orderdate"))).as("month"))
          .agg(count(lit(1)).as("n"))
        val med = monthly.agg(
          expr("percentile(n, 0.5)").as("median_n"))
        monthly.crossJoin(broadcast(med))
          .select(
            col("month"), col("n"),
            round(col("median_n"), 2).as("median_n"),
            round(col("n") / col("median_n"), 4).as("ratio_to_median"),
            (col("n") < col("median_n") * 0.5).as("is_anomaly"))
      },
      Some("""
        WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                          count(*) AS n
                   FROM orders GROUP BY 1),
        md AS (SELECT quantile_cont(n, 0.5) AS median_n FROM m)
        SELECT month, n, round(median_n, 2) AS median_n,
               round(n / median_n, 4) AS ratio_to_median,
               n < median_n * 0.5 AS is_anomaly
        FROM m, md""")),

    // ----- W6/A1/J8: full PBP chain (classifier -> possessions -> box stats) --------
    Q(
      "pbp01_game_team_stats",
      "The full PBP derivation chain (SURVEY §3.3) on a deterministic " +
        "play stream derived from events: regex classification (F1) -> " +
        "possession state machine with and-1 lookahead (W6, " +
        "graft.pbp.PossessionEngine flatMapGroups) -> per-game-team " +
        "conditional aggs + opponent self-join (A1/J8, " +
        "graft.pbp.GameTeamStats). Rows-only here (the aggregate " +
        "composition); the chain itself is hash-gated: pbp03 replays " +
        "the WHOLE state machine incl. the and-1 lookahead in SQL, " +
        "pbp02 gates the flags stage, GoldenTraceSpec pins 5 " +
        "hand-traced games bit-for-bit.",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val plays = e.select(
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
        val enriched = graft.pbp.PossessionEngine.enrich(plays)
        graft.pbp.GameTeamStats.build(enriched.toDF())
          .orderBy(col("gameId"), col("teamId"))
      },
      None),

    // ----- multimodal payload plumbing ----------------------------------------------
    Q(
      "m01_multimodal_meta",
      "Multimodal binary-column plumbing (graft.multimodal.MediaOps): " +
        "payload as binary, typed metadata struct from the (stubbed) " +
        "decode, fixed-size frame sampling with per-frame fingerprints. " +
        "The oracle replays the same derivations on the text bytes.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        MediaOps.withFrameHashes(MediaOps.withMeta(MediaOps.withPayload(docs)))
          .select(
            col("doc_id"),
            col("media_meta.byte_len").as("byte_len"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"),
            col("n_frames"),
            md5(col("payload")).as("payload_md5"),
            element_at(col("frame_hashes"), 1).as("frame0_md5"),
            element_at(col("frame_hashes"), -1).as("frame_last_md5"))
      },
      Some(s"""
        WITH p AS (SELECT doc_id, length(text) AS byte_len,
                          upper(to_hex(text::BLOB)) AS hx, text
                   FROM documents),
        f AS (SELECT doc_id, byte_len,
                     byte_len % 640 AS width, (byte_len * 7) % 480 AS height,
                     CAST(ceil(byte_len / ${MediaOps.FrameBytes}.0) AS BIGINT) AS n_frames,
                     md5(text) AS payload_md5,
                     md5(substr(hx, 1, ${MediaOps.FrameBytes * 2})) AS frame0_md5,
                     md5(substr(hx, (CAST(ceil(byte_len / ${MediaOps.FrameBytes}.0) AS BIGINT) - 1)
                                    * ${MediaOps.FrameBytes * 2} + 1, ${MediaOps.FrameBytes * 2})) AS frame_last_md5
              FROM p)
        SELECT doc_id, byte_len, width, height, n_frames, payload_md5,
               frame0_md5, frame_last_md5
        FROM f""")),

    Q(
      "m03_frame_dedup",
      "Cross-media duplicate-frame detection (the dedup family applied " +
        "to the multimodal surface — the intro/outro/black-frame drop " +
        "every video curation pipeline runs): explode m01's per-frame " +
        "fingerprints, group by hash, keep frames appearing in 2+ " +
        "distinct media with occurrence/doc counts and the canonical " +
        "(min) doc. One explode + one hash-keyed aggregation: shuffle " +
        "carries (hash, doc) pairs, never payload bytes.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        MediaOps.withFrameHashes(MediaOps.withMeta(MediaOps.withPayload(docs)))
          .select(col("doc_id"), explode(col("frame_hashes")).as("fh"))
          .groupBy(col("fh"))
          .agg(
            count(lit(1)).as("n_occurrences"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("canonical_doc"))
          .filter(col("n_docs") >= 2)
      },
      Some(s"""
        WITH p AS (SELECT doc_id, length(text) AS byte_len,
                          upper(to_hex(text::BLOB)) AS hx
                   FROM documents),
        n AS (SELECT doc_id, hx,
                     CAST(ceil(byte_len / ${MediaOps.FrameBytes}.0) AS BIGINT) AS n_frames
              FROM p),
        fr AS (SELECT doc_id,
                      md5(substr(hx, CAST(fi AS BIGINT) * ${MediaOps.FrameBytes * 2} + 1,
                                 ${MediaOps.FrameBytes * 2})) AS fh
               FROM (SELECT doc_id, hx, unnest(range(n_frames)) AS fi FROM n))
        SELECT fh, count(*) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc
        FROM fr GROUP BY 1
        HAVING count(DISTINCT doc_id) >= 2""")),

    Q(
      "m02_multimodal_features",
      "The mapPartitions feature-extraction path (MediaOps." +
        "extractFeatures): payload bytes -> fixed-width Float feature " +
        "per doc, one (stub) codec init per partition — the same batch " +
        "shape a real decode-and-embed pipeline uses. Gated by scaling " +
        "the float lanes back to their exact integer byte sums " +
        "(accumulated f32 error << 0.5 at test payload sizes), which " +
        "the oracle recomputes per mod-8 byte lane; the corpus is " +
        "ASCII so byte == codepoint.",
      (s, d) => {
        import s.implicits._
        val media = MediaOps.withPayload(Tables.documents(s, d))
          .select(col("doc_id"), col("payload")).as[MediaOps.MediaIn]
        val lanes = (0 until 8).map(j =>
          round(element_at(col("feature"), j + 1) * 255.0, 0).cast("long")
            .as(s"lane$j"))
        MediaOps.extractFeatures(media, dim = 8)
          .select(col("doc_id") +: col("byte_len").cast("long").as("byte_len") +: lanes: _*)
      },
      Some(s"""
        SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
               ${(0 until 8).map(j =>
                  s"CAST(coalesce(list_sum(list_transform(range($j, length(text), 8), " +
                  s"i -> ascii(substr(text, CAST(i AS INT) + 1, 1)))), 0) AS BIGINT) AS lane$j")
                  .mkString(",\n               ")}
        FROM documents"""))
  )
}
