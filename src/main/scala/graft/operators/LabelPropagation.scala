package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection (Raghavan,
  * Albert & Kumara 2007), determinized: every node starts labeled with
  * its own id; each round every node adopts the most frequent label
  * among its neighbors, ties broken by SMALLEST label. The async
  * original visits nodes in random order — useless for a gated engine;
  * the synchronous min-tie variant is order-free, and because labels
  * and counts are integers the rounds are bit-deterministic on any
  * engine, partitioning or summation order (the gr02 micro-unit
  * property without needing micro-units).
  *
  * Distributed shape (per round): one node-keyed equi-join of the
  * directed edge list against the n-row label table, one (node, label)
  * keyed count (map-side combined, so hub fan-in never concentrates on
  * one task), one node-partitioned argmax window. No driver-side graph
  * state; lineage is cut per round by eager localCheckpoint (the
  * ConnectedComponents lesson — without it round k replays rounds
  * 1..k-1 and the plan grows quadratically). At 100 TB each round is
  * one shuffle of the 2m-row message list plus one of the n-row label
  * table — the same budget as a PageRank round.
  */
object LabelPropagation {

  /** `iters` synchronous rounds over undirected edges (u, v); returns
    * (node, label). Synchronous LP can oscillate on bipartite-ish
    * structures, so production callers pick a bounded iteration count
    * (the dm10/v05 convention) rather than a convergence test. */
  def run(edges: DataFrame, u: String, v: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dir = edges.select(col(u).as("s"), col(v).as("t"))
      .union(edges.select(col(v).as("s"), col(u).as("t")))
      .localCheckpoint(true) // the edge list feeds every round
    var labels = dir.select(col("s").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("n").desc, col("label").asc)
    (1 to iters).foreach { _ =>
      labels = dir
        .join(labels.select(col("node").as("s"), col("label")), Seq("s"))
        .groupBy(col("t").as("node"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
