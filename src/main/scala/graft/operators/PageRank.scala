package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame PageRank — the third join-based graph kernel (with
  * ConnectedComponents and Triangles): rank flows along edges as one
  * join + one aggregation per iteration, all shuffles keyed on the
  * node id, no driver-side graph state.
  *
  * `edges` is interpreted as UNDIRECTED (each edge contributes both
  * directions), matching the co-purchase / co-occurrence graphs the
  * corpus queries build; every node then has out-degree ≥ 1, so there
  * is no dangling-mass term. The update is the standard
  * p' = (1-d) + d·Σ_in p/outdeg (unnormalized form: ranks sum to N,
  * initial rank 1 per node).
  *
  * The iteration count is a CALLER-PINNED parameter, not a
  * convergence loop — the dm10/v05 gating convention: bounded
  * iterations make the computation SQL-replayable and hash-gateable,
  * and production callers pick the usual 10-20. Each round
  * materializes through an eager localCheckpoint (the
  * ConnectedComponents lesson: iterative lineage doubles per round
  * and eventually OOMs the planner itself).
  */
object PageRank {

  /** Fixed-point integer variant: ranks held in micro-units (1.0 ≡
    * 1,000,000) and every step uses BIGINT arithmetic with truncating
    * division — p' = 150000 + Σ (p_j · 85) div (100 · od_j). No float
    * ever appears, so the result is bit-identical on any engine and
    * any summation order (the t23 integer-milli-weight convention) —
    * this is the HASH-GATED form. Truncation loses < 1 micro-unit per
    * in-edge per round vs the real-valued update (PageRankSpec pins
    * the agreement bound); production callers wanting float ranks use
    * [[run]].
    */
  def runExactMicro(edges: DataFrame, a: String, b: String,
      iters: Int): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters $iters outside [0, 100]")
    val e = edges.select(col(a).as("s"), col(b).as("t"))
      .filter(col("s") =!= col("t"))
      .distinct()
    val dir = e.unionAll(e.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val outdeg = dir.groupBy(col("s")).agg(count(lit(1)).as("od"))
    val withDeg = dir.join(outdeg, Seq("s")).localCheckpoint(true)
    var ranks = outdeg.select(col("s").as("node"), lit(1000000L).as("pm"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      ranks = withDeg
        .join(ranks, col("s") === col("node"))
        .groupBy(col("t"))
        .agg(sum(expr("(pm * 85) div (100 * od)")).as("m"))
        .select(col("t").as("node"), (lit(150000L) + col("m")).as("pm"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Converged fixed-point variant (the dm10d/v05d early-stop recipe
    * applied to the last bounded-iteration-only kernel): iterate
    * [[runExactMicro]]'s exact BIGINT update until the L-infinity
    * rank delta is <= `tolMicro` micro-units, then return the ranks
    * plus an `iters` column recording the round the convergence TEST
    * stopped at. Because every quantity is an exact integer, the
    * stop decision is bit-deterministic on any engine/partitioning —
    * there is no float tolerance cliff; any tolMicro strictly between
    * the round-K and round-K+1 deltas pins K exactly.
    *
    * Throws if maxIters rounds pass without convergence (the
    * ConnectedComponents unconverged-exit convention) — a silent
    * truncated result would be indistinguishable from a converged
    * one. The per-round delta is a single driver-side scalar (the
    * sanctioned bounded-collect class). */
  def runConvergedMicro(edges: DataFrame, a: String, b: String,
      tolMicro: Long, maxIters: Int): DataFrame = {
    require(maxIters >= 1 && maxIters <= 100,
      s"maxIters $maxIters outside [1, 100]")
    val e = edges.select(col(a).as("s"), col(b).as("t"))
      .filter(col("s") =!= col("t"))
      .distinct()
    val dir = e.unionAll(e.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val outdeg = dir.groupBy(col("s")).agg(count(lit(1)).as("od"))
    val withDeg = dir.join(outdeg, Seq("s")).localCheckpoint(true)
    var ranks = outdeg.select(col("s").as("node"), lit(1000000L).as("pm"))
      .localCheckpoint(true)
    var it = 0
    var delta = Long.MaxValue
    while (delta > tolMicro) {
      if (it >= maxIters)
        throw new IllegalStateException(
          s"PageRank did not converge to L-inf <= $tolMicro micro-units " +
            s"in $maxIters iterations (last delta $delta)")
      // the previous rank rides the update into the SAME checkpoint
      // pass (r17): the delta probe then scans the checkpointed
      // blocks instead of planning a fresh two-frame join per round
      val next = withDeg
        .join(ranks, col("s") === col("node"))
        .groupBy(col("t"))
        .agg(sum(expr("(pm * 85) div (100 * od)")).as("m"))
        .select(col("t").as("node"), (lit(150000L) + col("m")).as("pm"))
        .join(ranks.select(col("node"), col("pm").as("__pm0")), Seq("node"))
        .localCheckpoint(true)
      val row = next.agg(max(abs(col("pm") - col("__pm0"))).as("d")).head()
      delta = if (row.isNullAt(0)) 0L else row.getLong(0)
      ranks = next.select(col("node"), col("pm"))
      it += 1
    }
    ranks.withColumn("iters", lit(it))
  }

  /** @return (node, rank) after exactly `iters` updates, damping `d`. */
  def run(edges: DataFrame, a: String, b: String,
      iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters $iters outside [0, 100]")
    val e = edges.select(col(a).as("s"), col(b).as("t"))
      .filter(col("s") =!= col("t"))
      .distinct()
    val dir = e.unionAll(e.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val outdeg = dir.groupBy(col("s")).agg(count(lit(1)).as("od"))
    val withDeg = dir.join(outdeg, Seq("s")).localCheckpoint(true)
    var ranks = outdeg.select(col("s").as("node"), lit(1.0).as("p"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      ranks = withDeg
        .join(ranks, col("s") === col("node"))
        .groupBy(col("t"))
        .agg(sum(col("p") / col("od")).as("m"))
        .select(col("t").as("node"), (lit(1.0 - d) + lit(d) * col("m")).as("p"))
        .localCheckpoint(true)
    }
    ranks
  }
}
