package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the CLUSTERING
  * stage of the near-dup dedup cascade (LSH candidate pairs → duplicate
  * GROUPS → keep one doc per group), the piece that turns pairwise
  * similarity into an actual dedup decision at corpus scale.
  *
  * Hybrid kernel (round-7 A/B, BENCH_SCALE.md):
  *
  *  1. MIN-LABEL PROPAGATION for up to 8 rounds — one join + one keyed
  *     min per round, the cheapest per-round shape. Near-dup clusters
  *     are shallow (diameter ≤ a few), so the common case converges
  *     here and pays nothing more. Measured 3x faster than the star
  *     kernel on 2M 5-node clusters (22 s vs 65 s).
  *  2. If not converged, CONTRACT the graph by the partial labels
  *     (quotient edges between label groups) and finish with
  *     alternating LARGE-STAR/SMALL-STAR (Kiveris et al., "Connected
  *     Components in MapReduce and Beyond", SoCC'14), which collapses
  *     any remaining structure in O(log² n) rounds REGARDLESS of
  *     diameter. Propagation alone is diameter-bound: on a 100k-node
  *     chain it silently bails at maxRounds with 99,950 bogus
  *     components; the hybrid returns the single true component.
  *
  * Correctness of the contraction: after r propagation rounds each
  * label is the min node id within r hops, so label groups are
  * connected subsets; the quotient graph has the same component
  * structure, and the min over a quotient component's labels is the
  * original component's min node id (the global min labels itself).
  *
  * Every round EAGERLY localCheckpoints its frame and drops the
  * previous round's blocks: a plain persist is NOT enough for
  * iterative DataFrames — the logical plan doubles per round and the
  * planner itself OOMs around a dozen rounds. Checkpointing truncates
  * the lineage, so plan size and storage stay O(1) per round; the
  * returned frame is one (id, component) row per node — tiny relative
  * to the corpus.
  *
  * Determinism: labels are mins over node ids — no RNG, no
  * order-dependence. Skew note: the star joins key on hub nodes; AQE
  * skew-join splitting handles it (the aggregates are partial/final
  * and immune).
  */
object ConnectedComponents {

  /** Propagation rounds before contracting to the star kernel. */
  private val PropagationBudget = 8

  /** @param edges DataFrame with two node-id columns (undirected)
    * @return (id, component) for every node appearing in `edges`,
    *         component = min node id in the component */
  def minLabel(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxRounds: Int = 50): DataFrame = {
    // materialize the edge list ONCE: an unmaterialized lineage (e.g. a
    // full LSH candidate pipeline) would re-execute end-to-end for each
    // loop touch — measured 26s -> ~3s on the d05 dedup-cluster query
    val e0 = edges.select(col(src).as("s"), col(dst).as("d"))
      .localCheckpoint(true)
    val sym = e0.union(e0.select(col("d").as("s"), col("s").as("d")))

    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var round = 0
    var changed = 1L
    while (changed > 0 && round < math.min(PropagationBudget, maxRounds)) {
      val nbrMin = sym.join(labels, col("d") === col("id"))
        .groupBy(col("s")).agg(min(col("component")).as("__nc"))
      // the changed flag rides the update into the SAME checkpoint
      // pass (r17): the probe then scans the checkpointed blocks
      // instead of planning a fresh two-frame join per round
      val next = labels.join(nbrMin, col("id") === col("s"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nc"), col("component")))
            .as("component"),
          (least(col("component"), coalesce(col("__nc"), col("component")))
            =!= col("component")).as("__chg"))
        .localCheckpoint(true)
      changed = next.filter(col("__chg")).count()
      Lineage.free(labels)
      labels = next.select(col("id"), col("component"))
      round += 1
    }

    if (changed > 0) {
      // deep graph: contract by the partial labels, finish with stars
      val ls = labels.select(col("id").as("__n"), col("component").as("__c"))
      val qe = sym
        .join(ls, col("s") === col("__n"))
        .select(col("d"), col("__c").as("qs"))
        .join(ls.withColumnRenamed("__c", "__c2"), col("d") === col("__n"))
        .select(col("qs"), col("__c2").as("qd"))
        .filter(col("qs") =!= col("qd"))
        .distinct()
      val roots = starComponents(qe, "qs", "qd", maxRounds)
        .select(col("id").as("__q"), col("component").as("__root"))
      val resolved = labels
        .join(roots, col("component") === col("__q"), "left")
        .select(col("id"),
          coalesce(col("__root"), col("component")).as("component"))
        .localCheckpoint(true)
      Lineage.free(labels)
      labels = resolved
    }
    Lineage.free(e0)
    labels
  }

  /** Alternating large-star/small-star to the fixed point. */
  private def starComponents(edges: DataFrame, src: String, dst: String,
      maxRounds: Int): DataFrame = {
    val e0 = edges.select(col(src).as("s"), col(dst).as("d"))
      .localCheckpoint(true)
    val nodes = e0.select(col("s").as("id"))
      .union(e0.select(col("d").as("id"))).distinct()
      .localCheckpoint(true)

    // canonical working set: (u > v), no self-loops, deduped
    var cur = e0.filter(col("s") =!= col("d"))
      .select(greatest(col("s"), col("d")).as("u"),
        least(col("s"), col("d")).as("v"))
      .distinct()
      .localCheckpoint(true)

    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // ---- large-star: (b, m(a)) for every neighbor b > a, where
      // m(a) = min(Γ(a) ∪ {a}) over the SYMMETRIZED neighborhood
      val nbrs = cur.select(col("u").as("a"), col("v").as("b"))
        .union(cur.select(col("v").as("a"), col("u").as("b")))
      val lsMin = nbrs.groupBy(col("a"))
        .agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      val ls = nbrs.join(lsMin, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      // ---- small-star on the (u > v) orientation: hang every smaller
      // neighbor (and u itself) off the min smaller neighbor
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = ls.join(ssMin, Seq("u"))
        .select(col("v").as("nu"), col("m").as("nv"))
        .union(ssMin.select(col("u").as("nu"), col("m").as("nv")))
        .filter(col("nu") =!= col("nv"))
        .select(col("nu").as("u"), col("nv").as("v"))
        .distinct()
        .localCheckpoint(true)

      // fixed point: the canonical edge set stopped changing — one
      // full-outer symmetric-difference count instead of two anti-join
      // jobs (r17; same value: |next \ cur| + |cur \ next|)
      changed = next.withColumn("__a", lit(1))
        .join(cur.withColumn("__b", lit(1)), Seq("u", "v"), "full_outer")
        .filter(col("__a").isNull || col("__b").isNull).count()
      Lineage.free(ls)
      Lineage.free(cur)
      cur = next
      round += 1
    }
    // an unconverged exit would return silently-unmerged components — the
    // exact failure class the hybrid replaced; fail loudly instead
    if (changed > 0)
      throw new IllegalStateException(
        s"starComponents did not reach its fixed point in $maxRounds rounds " +
          s"($changed edges still changing); raise maxRounds")

    // at the fixed point `cur` is a union of stars (v -> component min);
    // nodes never appearing as a star leaf are their own component
    val out = nodes
      .join(cur.withColumnRenamed("u", "id"), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("v"), col("id"))).as("component"))
      .localCheckpoint(true)
    Lineage.free(cur)
    Lineage.free(nodes)
    Lineage.free(e0)
    out
  }

  /** The star kernel standalone (A/B surface for graft.tools.CcBench). */
  private[graft] def minLabelStar(edges: DataFrame,
      src: String = "src", dst: String = "dst",
      maxRounds: Int = 50): DataFrame =
    starComponents(edges, src, dst, maxRounds)

  /** The pre-r7 min-label PROPAGATION variant, kept for A/B comparison
    * (graft.tools.CcBench; BENCH_SCALE.md round-7 table). Two shuffles
    * per round but rounds = component DIAMETER: fine on shallow dup
    * clusters, non-convergent (capped at maxRounds) on deep graphs —
    * the reason minLabel is a hybrid. */
  private[graft] def minLabelPropagation(edges: DataFrame,
      src: String = "src", dst: String = "dst",
      maxRounds: Int = 50): DataFrame = {
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
      val next = labels.join(nbrMin, col("id") === col("s"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nc"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      changed = next.join(
          labels.withColumnRenamed("component", "__prev"), Seq("id"))
        .filter(col("component") =!= col("__prev")).count()
      Lineage.free(labels)
      labels = next
      round += 1
    }
    Lineage.free(e0)
    labels
  }
}
