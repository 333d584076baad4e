package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the CLUSTERING stage of the near-dup dedup
  * cascade (LSH candidate pairs → duplicate GROUPS → keep one doc per
  * group), the piece that turns pairwise similarity into an actual
  * dedup decision at corpus scale.
  *
  * Shape per round: one join (neighbor labels) + one keyed min — two
  * shuffles, no driver state; rounds = component diameter. Near-dup
  * clusters are shallow and small, so propagation converges in a few
  * rounds; for adversarially deep graphs the upgrade path is
  * large-star/small-star (same join primitives). Each round EAGERLY
  * localCheckpoints its label frame and drops the previous round's
  * blocks: a plain persist is NOT enough for iterative DataFrames —
  * the logical plan doubles per round (labels feed both the next
  * round and the convergence check) and the planner itself OOMs
  * around a dozen rounds. Checkpointing truncates the lineage, so
  * plan size and storage stay O(1) per round; the returned frame is
  * one (id, component) row per node — tiny relative to the corpus.
  *
  * Determinism: labels are mins over node ids — no RNG, no
  * order-dependence.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two node-id columns (undirected)
    * @return (id, component) for every node appearing in `edges`,
    *         component = min node id in the component */
  def minLabel(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxRounds: Int = 50): DataFrame = {
    // materialize the edge list ONCE, BEFORE symmetrizing: the loop
    // touches it twice per round and the union reads it twice, so an
    // unmaterialized lineage (e.g. a full LSH candidate pipeline)
    // would otherwise re-execute end-to-end 2x at build + 2x per
    // round — measured 26s -> ~3s on the d05 dedup-cluster query
    val e0 = edges.select(col(src).as("s"), col(dst).as("d"))
      .localCheckpoint(true)
    val sym = e0.union(e0.select(col("d").as("s"), col("s").as("d")))

    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val nbrMin = sym.join(labels, col("d") === col("id"))
        .groupBy(col("s")).agg(min(col("component")).as("__nc"))
      // eager checkpoint: materialize AND truncate the logical plan
      val next = labels.join(nbrMin, col("id") === col("s"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nc"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      changed = next.join(
          labels.withColumnRenamed("component", "__prev"), Seq("id"))
        .filter(col("component") =!= col("__prev")).count()
      labels.unpersist() // next is materialized; prior blocks can go
      labels = next
      round += 1
    }
    e0.unpersist() // labels is materialized; edge blocks can go
    labels
  }
}
