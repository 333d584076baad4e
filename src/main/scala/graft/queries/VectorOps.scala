package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}
import graft.sources.Tables

/** Embedding similarity-search surface over the `embeddings` table
  * (64-dim float vectors): brute-force cosine top-k as the exact
  * baseline, IVF-style cluster-probed ANN as the scale path, and
  * hyperplane-LSH bucketed near-duplicate pairing.
  *
  * Scale design: the query set is broadcast and the corpus is scanned
  * once (never corpus x corpus); IVF probes one cluster; LSH pairs only
  * within equal 8-bit codes. Dot products run as codegen'd higher-order
  * array functions (zip_with + aggregate) — no UDFs — with float→double
  * casts so the math matches the oracle's DOUBLE[] list_dot_product.
  */

/** The v05c/v05d oracle CTE chain — a full SQL replay of
  * KMeans.fitConverged's two Lloyd iterations over the embeddings
  * table (deterministic md5 seeds, assignment, mean update with
  * empty-cluster carry, re-assignment, second update). Shared by the
  * v05c/v05d gates (CarveOutGate) and the v09 geometric-IVF gates so
  * the replay of the index build exists in exactly one copy.
  */
private[queries] object KmeansSql {

  /** seeds → first assignment (a1) → first update (cent1) → dots vs
    * cent1 (d2): what v05c ranks for its re-assignment gate.
    * k-parameterized (VERDICT r11 #5): the scaled gates (v14b at
    * k=25) replay the same 2-Lloyd chain with a wider seed LIMIT —
    * tools.KmProbe brackets that tol=0.12 stops at exactly 2
    * iterations for k=25 too (iter-1 delta ~0.33, iter-2 ~0.05 at
    * every SF), so cent2 is the converged stop for both k's. */
  def upToD2(k: Int): String = s"""
        seeds0 AS (
          SELECT vec_id AS sid, embedding::DOUBLE[] AS se
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT $k),
        seeds AS (
          SELECT sid, se,
                 row_number() OVER (ORDER BY CAST(sid AS VARCHAR) ASC) - 1 AS cluster
          FROM seeds0),
        long AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                        unnest(range(len(embedding))) AS pos
                 FROM embeddings),
        sg AS (SELECT cluster, unnest(se) AS sv, unnest(range(len(se))) AS pos
               FROM seeds),
        d1 AS (SELECT l.vec_id, g.cluster, sum(l.v * g.sv) AS dot
               FROM long l JOIN sg g USING (pos) GROUP BY 1, 2),
        a1 AS (SELECT vec_id, cluster FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d1) WHERE rn = 1),
        sums AS (SELECT a.cluster, l.pos, sum(l.v) AS s, count(*) AS n
                 FROM long l JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        cent1 AS (SELECT g.cluster, g.pos, coalesce(m.s / m.n, g.sv) AS cv
                  FROM sg g LEFT JOIN sums m
                    ON g.cluster = m.cluster AND g.pos = m.pos),
        d2 AS (SELECT l.vec_id, c.cluster, sum(l.v * c.cv) AS dot
               FROM long l JOIN cent1 c USING (pos) GROUP BY 1, 2)"""

  /** The k=8 chain every pre-r12 gate composes. */
  val UpToD2: String = upToD2(8)

  /** …second assignment (a2) → second update (cent2): the centroids
    * KMeans.fitConverged(k=8, tol=0.12) stops on (v05d pins that the
    * early-stop fires at exactly 2 iterations). */
  def upToCent2(k: Int): String = upToD2(k) + """,
        a2 AS (SELECT vec_id, cluster FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d2) WHERE rn = 1),
        sums2 AS (SELECT a.cluster, l.pos, sum(l.v) AS s, count(*) AS n
                  FROM long l JOIN a2 a USING (vec_id) GROUP BY 1, 2),
        cent2 AS (SELECT c1.cluster, c1.pos, coalesce(m.s / m.n, c1.cv) AS cv
                  FROM cent1 c1 LEFT JOIN sums2 m
                    ON c1.cluster = m.cluster AND c1.pos = m.pos)"""

  /** The k=8 full chain every pre-r12 gate composes. */
  val UpToCent2: String = upToCent2(8)
}

object VectorOps {

  /** Left-to-right double dot product over two float-array columns —
    * the native codegen expression (plans/DotProduct, r17): the
    * composed zip_with/aggregate twin below is CodegenFallback and
    * paid a lambda-dispatch-per-element plus an array allocation per
    * ROW under every pair join (knnGraph/vamana/walk scoring — the
    * tier's flop budget). Bit-identical accumulation order, so every
    * hash gate riding a cos/dsq column is unchanged; DotProductSpec
    * pins parity against the composed twin. */
  private[graft] def dot(a: String, b: String): Column =
    graft.plans.DotProduct.ofCols(col(a), col(b))

  /** The composed higher-order twin dot — parity pin for
    * DotProductSpec (the pqCodeColComposed convention). */
  private[graft] def dotComposed(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  private[graft] def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  // ===== shared recall-gate machinery (v02b / v02c / v09 / v09b) ==========
  // One truth builder, one ANN builder per cell scheme, one recall join —
  // the v02b/v02c twins used to carry ~50 duplicated lines each (ADVICE
  // r9); any fix to the truth/recall construction now lands everywhere.

  /** Exact brute-force cosine top-3 (qid, cid) ground truth for the
    * broadcast query set (vec_id < 20) — what every recall gate
    * measures against. */
  private[graft] def bruteTruth(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    // norms ride the row (the v14 convention): sqrt(dot(x,x)) is the
    // same double whether computed per row or per pair, so the cosine
    // values — and the oracle hash — are unchanged, but each pair
    // costs one dot product instead of three
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** v02's label-partitioned IVF top-3 at a given probe count:
    * per-label centroids in long form, each query routed to its
    * `nprobe` max-dot centroids (deterministic (dot desc, label asc)
    * ranking), cosine ranked within the probed partitions only. */
  private[graft] def labelAnn(s: SparkSession, d: String, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val long = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos"),
        col("col").cast("double").as("v"))
    val cent = long.groupBy(col("label").as("c_label"), col("pos"))
      .agg(avg(col("v")).as("cv"))
    val qlong = long.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("pos"), col("v").as("qv"))
    val assignW = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("c_label").asc)
    val probes = qlong.join(cent, Seq("pos"))
      .groupBy(col("qid"), col("c_label"))
      .agg(sum(col("qv") * col("cv")).as("dot"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("c_label").as("probe_label"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("label").as("c_lab"),
      col("embedding").as("ce"))
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(probes.join(q, Seq("qid"))),
        col("c_lab") === col("probe_label") && col("cid") =!= col("qid"))
      .withColumn("cos", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** Geometric (KMeans-cell) IVF top-3 at a given probe count — the
    * production fix v02b's doc names: coarse cells are the CONVERGED
    * Lloyd centroids of v05d (k=8, tol=0.12 → stops at exactly 2
    * iterations, bracketing-pinned there), not label partitions.
    * Corpus vectors are assigned to their max-dot centroid in one
    * broadcast pass (centroids are k×dim driver doubles — tiny);
    * queries route to their `nprobe` nearest centroids; cosine ranks
    * within the probed cells only. At 100 TB the corpus is written
    * bucketed by cell id and a probe reads ~nprobe/k of it — the same
    * scan shape as v02, now with geometric locality behind it. */
  /** Top-`n` nearest cells of a vector column against driver-held
    * centroids, as ONE map-side expression: per-cell dots via
    * codegen'd zip_with/aggregate over centroid LITERALS, ranked by
    * lexicographic struct sort on (dot desc, cell asc). No join, no
    * shuffle — k×dim literal doubles ride the plan the way a broadcast
    * rides the task, which is the textbook IVF assignment shape (the
    * centroid table is tiny; the corpus should never shuffle for it). */
  private[graft] def nearestCells(cent: Array[Array[Double]], vec: String,
      n: Int): Column = nearestCells(cent, col(vec), n)

  /** Native codegen expression since r17 (plans/NearestCellsExpr): the
    * composed struct-sort twin below held k·dim literal nodes per
    * instance (analyzer/optimizer tax on every assignment-bearing
    * plan) and folded through CodegenFallback lambdas per row.
    * Bit-identical dots, ranking and output shape — NearestCellsSpec
    * pins parity against the composed twin. */
  private[graft] def nearestCells(cent: Array[Array[Double]], vec: Column,
      n: Int): Column = graft.plans.NearestCellsExpr.ofCol(vec, cent, n)

  /** The composed higher-order twin — parity pin for NearestCellsSpec
    * (the pqCodeColComposed convention). */
  private[graft] def nearestCellsComposed(cent: Array[Array[Double]],
      vec: Column, n: Int): Column = {
    val ranked = cent.indices.map { i =>
      val cv = array(cent(i).map(lit(_)): _*)
      val prod = zip_with(cv, vec, (x, y) => x * y.cast("double"))
      struct(
        aggregate(prod, lit(0.0), (acc, v) => acc + v).as("dot"),
        lit(-i.toLong).as("nc"))
    }
    // array_sort asc on (dot, nc), reversed → (dot desc, -cell desc)
    // = (dot desc, cell asc): v02's deterministic probe tiebreak
    slice(reverse(array_sort(array(ranked: _*))), 1, n)
  }

  private[graft] def geoAnn(s: SparkSession, d: String, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cent = TrainedIndex.centroids(s, d, k = 8)
    // corpus assignment is map-only (no exchange anywhere before the
    // broadcast probe join — the 100-TB index build writes this frame
    // partitioned by cell, BucketingSpec pins the pruned probe scan)
    val asg = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .filter(col("cid").isNotNull)
      .withColumn("cell",
        -element_at(nearestCells(cent, "ce", 1), 1).getField("nc"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(nearestCells(cent, "embedding", nprobe)).as("pc"))
      .select(col("qid"), (-col("pc.nc")).as("cell"), col("qe"))
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    asg.join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** Exact brute-force cosine top-3 truth RESTRICTED to candidates
    * sharing the query's label — what a metadata-filtered search is
    * graded against (the v18 gates). */
  private[graft] def bruteTruthFiltered(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("q_lab"),
        col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val c = e.select(col("vec_id").as("cid"), col("label").as("c_lab"),
      col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q),
        col("qid") =!= col("cid") && col("c_lab") === col("q_lab"))
      .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** Metadata-filtered IVF serving: the query carries an equality
    * constraint (here: its own label — "similar items in my
    * category") and candidates must satisfy it. `preFilter = true`
    * applies the predicate BEFORE the per-query rank (the correct
    * plan: the label rides the same map-side projection as the cell
    * assignment, so filtering costs nothing and the top-3 budget is
    * spent only on eligible rows); `preFilter = false` is the naive
    * post-filter (rank the unfiltered cell top-3, then drop
    * non-matching rows) — same scan budget, but the rank budget is
    * wasted on ineligible rows and recall collapses at selective
    * filters, which is the production trap the gate pair measures. */
  private[graft] def filteredGeoAnn(s: SparkSession, d: String,
      nprobe: Int, preFilter: Boolean): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cent = TrainedIndex.centroids(s, d, k = 8)
    val asg = e.select(col("vec_id").as("cid"), col("label").as("c_lab"),
        col("embedding").as("ce"))
      .filter(col("cid").isNotNull)
      .withColumn("cell",
        -element_at(nearestCells(cent, "ce", 1), 1).getField("nc"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("q_lab"),
        col("embedding").as("qe"),
        explode(nearestCells(cent, "embedding", nprobe)).as("pc"))
      .select(col("qid"), col("q_lab"), (-col("pc.nc")).as("cell"),
        col("qe"))
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    val joined = asg.join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
    val ranked = (if (preFilter) joined.filter(col("c_lab") === col("q_lab"))
      else joined)
      .withColumn("cos", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 3)
    (if (preFilter) ranked
      else ranked.filter(col("c_lab") === col("q_lab")))
      .select(col("qid"), col("cid"))
  }

  /** The RARE-predicate serving plan (v18c): when the filter keeps
    * ~sel*n rows with sel << 1/kCells, cell routing starves — the
    * probed cells hold ~sel*n*nprobe/k eligible rows (<1 at the gate
    * point: measured 17/49 recall for the cell-routed pre-filter,
    * 0/49 for post-filter, vs 49/49 here at 0.66% selectivity) — so
    * the correct plan inverts: the predicate becomes the JOIN KEY
    * (label, residue) and the exact rank runs over the equi-joined
    * eligible subset only. No index is consulted at all; at 100 TB
    * the lake's label/tenant partitioning turns the join into
    * partition-pruned point lookups reading sel of the corpus,
    * cheaper than any probe. The complement regime (90.4%
    * selectivity) is where pre/post-filter CONVERGE (measured 32/60
    * vs 31/60) — the full selectivity sweep is tools.FilteredAnnAb's
    * table in BENCH_SCALE. */
  /** The composite-key modulus of the rare-filter regime (label AND
    * vec_id % this — ~0.66% selectivity at the gate SF). One constant
    * shared by the gate pair below AND tools.FilteredAnnAb, so the
    * gate and the A/B sweep can never measure different predicates. */
  private[graft] val RareResidueMod = 16

  /** The (query, corpus) frames of the rare-filter regime — labels,
    * residues, embeddings and norms, built once and shared by the
    * truth and serving plans so the predicate columns exist in
    * exactly one copy. */
  private def rareFrames(s: SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("q_lab"),
        pmod(col("vec_id"), lit(RareResidueMod)).as("q_res"),
        col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val c = e.select(col("vec_id").as("cid"), col("label").as("c_lab"),
      pmod(col("vec_id"), lit(RareResidueMod)).as("c_res"),
      col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))
    (q, c)
  }

  private[graft] def rareFilteredExact(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val (q, c) = rareFrames(s, d)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q),
        col("c_lab") === col("q_lab") && col("c_res") === col("q_res") &&
          col("qid") =!= col("cid"))
      .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** Brute-force truth for the rare composite predicate — all-pairs
    * scored, THEN filtered and ranked (the grading frame v18c's
    * equi-join plan must reproduce). */
  private[graft] def bruteTruthRare(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val (q, c) = rareFrames(s, d)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
      .filter(col("c_lab") === col("q_lab") && col("c_res") === col("q_res"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** v07's SemDeDup assignment kernel, k-parameterized: deterministic
    * md5-seed pick, broadcast seed assignment with a max_by argmax
    * that carries the embedding through the agg, repartitioned on the
    * cluster key. Shared by the v07 gate (k=8) and tools.SemDedupKAb's
    * k-scaling A/B so the kernel exists in exactly one copy.
    *
    * vec_id.isNotNull is explicit (it is never null in the data) so
    * constraint inference from the pair join's a_id < b_id can't add
    * it to only two of the three consumer branches and break
    * exchange-subplan identity. The assignment frame feeds three
    * consumers (both pair-join sides + the rollup); first(ce) carries
    * the embedding through the argmax agg (ce is functionally
    * dependent on the group key, so "first" is deterministic here)
    * instead of re-joining the corpus, and the trailing repartition
    * on the pair-join key is the AQE exchange-reuse point — without
    * it the alias projections on each side defeat ReusedExchange and
    * the corpus x seeds assignment would run three times (the j08
    * rename lesson; same trick as TextOps.signatures). */
  private[graft] def semDedupAsg(s: SparkSession, d: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val seeds = e.select(col("vec_id").as("sid"), col("embedding").as("se"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h").asc, col("sid").asc).limit(k)
      .select(col("sid"), col("se"))
    val c = e.select(col("vec_id"), col("embedding").as("ce"))
      .filter(col("vec_id").isNotNull)
    c.join(broadcast(seeds), lit(true))
      .withColumn("dot", dot("se", "ce"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("sid"), struct(col("dot"), (-col("sid")).as("ns")))
          .as("cluster_seed"),
        first(col("ce")).as("ce"))
      .filter(col("cluster_seed").isNotNull)
      .repartition(col("cluster_seed"))
  }

  /** The within-cluster pair-compare stage: the DISTINCT set of
    * (cluster_seed, b_id) where b is the higher id of a pair with
    * cosine >= 0.2 — cluster-local join, the quadratic the cluster
    * bounds. */
  private[graft] def semDedupDropped(s: SparkSession,
      asg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val a = asg.select(col("cluster_seed"), col("vec_id").as("a_id"),
      col("ce").as("ae"))
    val b = asg.select(col("cluster_seed"), col("vec_id").as("b_id"),
      col("ce").as("be"))
    graft.plans.CosineSimilarity.register(s)
    a.join(b, Seq("cluster_seed"))
      .filter(col("a_id") < col("b_id"))
      .filter(expr("cosine_sim(ae, be)") >= 0.2)
      .select(col("cluster_seed"), col("b_id")).distinct()
  }

  /** Per-query recall row: truth-set size + EXACT integer intersection
    * with the ANN candidate set (left-semi on (qid, cid) — no float
    * thresholds anywhere in the comparison). Both sides are
    * top-3-per-query frames, so the join is query-set-sized regardless
    * of corpus size. */
  private[graft] def recallOf(truth: org.apache.spark.sql.DataFrame,
      ann: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hits = truth.join(ann, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("h"))
    truth.groupBy(col("qid")).agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid").as("query_id"), col("n_truth"),
        coalesce(col("h"), lit(0L)).as("n_hit"))
  }

  /** Oracle CTEs for the brute-force truth set (q, c, bf, truth). */
  private[queries] val TruthSql = """
        q AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id cid, label c_lab, embedding::DOUBLE[] ce FROM embeddings),
        bf AS (SELECT qid, cid, list_dot_product(qe, ce)
                      / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
               FROM q, c WHERE qid <> cid),
        truth AS (SELECT qid, cid
                  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, cid ASC) rn FROM bf)
                  WHERE rn <= 3)"""

  /** Oracle CTEs for the label-FILTERED truth (qf, cf, bff, truth):
    * brute-force top-3 among candidates sharing the query's label —
    * the grading set of the v18 filtered-serving pair. bff carries
    * both labels so the ann CTEs can place the predicate below
    * (v18) or above (v18b) the rank. */
  private val FilteredTruthSql = """
        qf AS (SELECT vec_id qid, label q_lab, embedding::DOUBLE[] qe
               FROM embeddings WHERE vec_id < 20),
        cf AS (SELECT vec_id cid, label c_lab, embedding::DOUBLE[] ce
               FROM embeddings),
        bff AS (SELECT qid, cid, c_lab, q_lab,
                       list_dot_product(qe, ce)
                       / (sqrt(list_dot_product(qe, qe))
                          * sqrt(list_dot_product(ce, ce))) AS cos
                FROM qf, cf WHERE qid <> cid),
        truth AS (SELECT qid, cid
                  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, cid ASC) rn
                        FROM bff WHERE c_lab = q_lab)
                  WHERE rn <= 3)"""

  /** Oracle CTEs for the label-partitioned ANN side (…, ann). */
  private[graft] def labelAnnSql(nprobe: Int) = s"""
        long AS (SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
                        unnest(range(len(embedding))) AS pos
                 FROM embeddings),
        cent AS (SELECT label AS c_label, pos, avg(v) AS cv
                 FROM long GROUP BY 1, 2),
        qlong AS (SELECT vec_id AS qid, pos, v AS qv FROM long WHERE vec_id < 20),
        assign AS (SELECT qid, c_label, sum(qv * cv) AS dot
                   FROM qlong JOIN cent USING (pos) GROUP BY 1, 2),
        probes AS (SELECT qid, c_label AS probe_label
                   FROM (SELECT *, row_number() OVER (PARTITION BY qid
                           ORDER BY dot DESC, c_label ASC) rn FROM assign)
                   WHERE rn <= $nprobe),
        sc AS (SELECT p.qid, c.cid,
                      list_dot_product(q.qe, c.ce)
                      / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS cos
               FROM probes p JOIN q ON p.qid = q.qid
               JOIN c ON c.c_lab = p.probe_label AND c.cid <> p.qid),
        ann AS (SELECT qid, cid
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, cid ASC) rn FROM sc)
                WHERE rn <= 3)"""

  /** Oracle CTEs for the KMeans-cell ANN side: one dot frame vs the
    * v05d-pinned cent2 centroids feeds BOTH the corpus assignment and
    * the query probes (…, ann). */
  /** Just the cell-routing part (d3g, a3, probes) — corpus assignment
    * plus query probes against cent2 — so v13's IVF-PQ oracle can
    * reuse the routing with a different (ADC) scoring tail. */
  private[graft] def geoCellsSql(nprobe: Int,
      qPred: String = "vec_id < 20") = s"""
        d3g AS (SELECT l.vec_id, c2.cluster, sum(l.v * c2.cv) AS dot
                FROM long l JOIN cent2 c2 USING (pos) GROUP BY 1, 2),
        a3 AS (SELECT vec_id AS g_cid, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g) WHERE rn = 1),
        probes AS (SELECT vec_id AS qid, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g WHERE $qPred) WHERE rn <= $nprobe)"""

  private[graft] def geoAnnSql(nprobe: Int) = s"""${geoCellsSql(nprobe)},
        sc AS (SELECT p.qid, g.g_cid AS cid,
                      list_dot_product(q.qe, c.ce)
                      / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS cos
               FROM probes p
               JOIN a3 g ON g.cell = p.cell AND g.g_cid <> p.qid
               JOIN q ON q.qid = p.qid
               JOIN c ON c.cid = g.g_cid),
        ann AS (SELECT qid, cid
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, cid ASC) rn FROM sc)
                WHERE rn <= 3)"""

  /** Oracle CTEs for v06-convention int8 quantization (sc, quant) —
    * shared by the v08 and v08b serving gates. */
  private val QuantSql = """
        sc AS (SELECT vec_id, label, embedding::DOUBLE[] AS de,
                      greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-30)
                        / 127.0 AS scale
               FROM embeddings),
        quant AS (SELECT vec_id, label, scale,
                         list_transform(de, x ->
                           CAST(least(greatest(floor(x / scale + 0.5), -127.0), 127.0) AS BIGINT)) AS q
                  FROM sc)"""

  /** Oracle tail: the exact-intersection recall rollup. */
  private[queries] val RecallTailSql = """
        hits AS (SELECT t.qid, count(*) AS h
                 FROM truth t JOIN ann a ON t.qid = a.qid AND t.cid = a.cid
                 GROUP BY 1)
        SELECT t.qid AS query_id, count(*) AS n_truth,
               coalesce(any_value(h.h), 0) AS n_hit
        FROM truth t LEFT JOIN hits h ON t.qid = h.qid
        GROUP BY t.qid"""

  /** Oracle CTEs for the stored hub graph + entry medoids (cn, ep,
    * md, edges0, hub, hedges, edges, f0) — the SQL replay of
    * hubGraphAndEntry, shared by the v17 and v19 gates. Expects
    * KmeansSql.UpToCent2 and geoCellsSql (d3g, a3, probes) upstream. */
  private[queries] def hubGraphSql(degree: Int): String = s"""
        cn AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
                      sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) AS nrm
               FROM embeddings),
        ep AS (SELECT x.g_cid AS src, y.g_cid AS dst,
                      list_dot_product(ca.ce, cb.ce)
                      / (ca.nrm * cb.nrm) AS cos
               FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.g_cid <> y.g_cid
               JOIN cn ca ON ca.cid = x.g_cid
               JOIN cn cb ON cb.cid = y.g_cid),
        md AS (SELECT cell, g_cid AS mid FROM (
                 SELECT a.cell, a.g_cid,
                        row_number() OVER (PARTITION BY a.cell
                          ORDER BY d.dot DESC, a.g_cid ASC) AS rn
                 FROM a3 a JOIN d3g d
                   ON d.vec_id = a.g_cid AND d.cluster = a.cell)
               WHERE rn = 1),
        edges0 AS (SELECT src, dst FROM (
                   SELECT *, row_number() OVER (PARTITION BY src
                     ORDER BY cos DESC, dst ASC) rn FROM ep)
                 WHERE rn <= $degree),
        hub AS (SELECT vec_id AS src, cluster AS cell2 FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g) WHERE rn = 2),
        hedges AS (SELECT h.src, m.mid AS dst
                   FROM hub h JOIN md m ON m.cell = h.cell2
                   WHERE m.mid <> h.src),
        edges AS (SELECT DISTINCT src, dst FROM (
                   SELECT src, dst FROM edges0
                   UNION ALL SELECT src, dst FROM hedges)),
        f0 AS (SELECT DISTINCT p.qid, m.mid AS cid
               FROM probes p JOIN md m USING (cell)
               WHERE m.mid <> p.qid)"""

  /** Oracle CTEs replaying buildVamanaGraph (v22): the 2-nearest-cell
    * candidate pool ranked on squared Euclidean distance (d2 = n2a +
    * n2b - 2*dot, same op order as the engine's column expression),
    * capped at `poolCap`, the one-shot alpha-occlusion test as an
    * EXISTS over closer pool rows, and the (occluded ASC, dsq ASC,
    * cand ASC) fill to `degree`. Emits `edges` + `f0` with the same
    * shape as hubGraphSql so the beamHops CTE chains compose
    * unchanged. Expects a3 / d3g / probes in scope (KmeansSql chain +
    * geoCellsSql). */
  private[queries] def vamanaGraphSql(degree: Int,
      poolCap: Int = VamanaPoolCap): String = s"""
        cn AS MATERIALIZED (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
                      list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[]) AS n2
               FROM embeddings),
        md AS (SELECT cell, g_cid AS mid FROM (
                 SELECT a.cell, a.g_cid,
                        row_number() OVER (PARTITION BY a.cell
                          ORDER BY d.dot DESC, a.g_cid ASC) AS rn
                 FROM a3 a JOIN d3g d
                   ON d.vec_id = a.g_cid AND d.cluster = a.cell)
               WHERE rn = 1),
        va2 AS (SELECT vec_id AS src, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g) WHERE rn <= 2),
        vpool AS (SELECT p.src, m.g_cid AS cand,
                         cs.n2 + cc.n2
                           - 2.0 * list_dot_product(cs.ce, cc.ce) AS dsq
                  FROM va2 p JOIN a3 m
                    ON m.cell = p.cell AND m.g_cid <> p.src
                  JOIN cn cs ON cs.cid = p.src
                  JOIN cn cc ON cc.cid = m.g_cid),
        vcap AS MATERIALIZED (SELECT src, cand, dsq, rk FROM (
                   SELECT *, row_number() OVER (PARTITION BY src
                     ORDER BY dsq ASC, cand ASC) AS rk FROM vpool)
                  WHERE rk <= $poolCap),
        voccj AS (SELECT c.src, c.cand,
                         max(CASE WHEN $VamanaAlphaSq * (cp.n2 + cc2.n2
                               - 2.0 * list_dot_product(cp.ce, cc2.ce))
                               <= c.dsq THEN 1 ELSE 0 END) AS occ1
                  FROM vcap c
                  JOIN vcap p ON p.src = c.src AND p.rk < c.rk
                  JOIN cn cp ON cp.cid = p.cand
                  JOIN cn cc2 ON cc2.cid = c.cand
                  GROUP BY c.src, c.cand),
        vocc AS MATERIALIZED (
                 SELECT v.src, v.cand, v.dsq,
                        coalesce(j.occ1, 0) = 1 AS occluded
                 FROM vcap v LEFT JOIN voccj j
                   ON j.src = v.src AND j.cand = v.cand),
        edges AS MATERIALIZED (SELECT src, dst FROM (
                   SELECT src, cand AS dst,
                          row_number() OVER (PARTITION BY src
                            ORDER BY occluded ASC, dsq ASC, cand ASC) AS rn
                   FROM vocc) WHERE rn <= $degree),
        f0 AS (SELECT DISTINCT p.qid, m.mid AS cid
               FROM probes p JOIN md m USING (cell)
               WHERE m.mid <> p.qid)"""

  /** Oracle CTEs replaying graphAnnServeAdc's walk: like beamHopsSql
    * but every beam cut ranks on the INTEGER ADC score from `adcall`,
    * and the final `ann` is the exact-cosine re-rank of the last
    * beam (bf already holds every cosine). */
  /** The ADC walk's CTEs up to the final beam cut b<hops> — shared by
    * the plain (v19/v20/st19) and refined (v21) oracle tails. */
  private def beamHopsAdcCtes(beam: Int, hops: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""
        s0 AS (SELECT f.qid, f.cid, a.score
               FROM f0 f JOIN adcall a ON a.qid = f.qid AND a.cid = f.cid),
        b0 AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid ASC) rn FROM s0)
               WHERE rn <= $beam)""")
    for (h <- 1 to hops) {
      val p = h - 1
      sb.append(s""",
        c$h AS (SELECT DISTINCT qid, cid FROM (
                 SELECT qid, cid FROM b$p
                 UNION ALL
                 SELECT b.qid, e.dst AS cid
                 FROM b$p b JOIN edges e ON e.src = b.cid)
               WHERE cid <> qid),
        s$h AS (SELECT x.qid, x.cid, a.score
               FROM c$h x JOIN adcall a ON a.qid = x.qid AND a.cid = x.cid),
        b$h AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid ASC) rn FROM s$h)
               WHERE rn <= $beam)""")
    }
    sb.toString
  }

  private[queries] def beamHopsAdcSql(beam: Int, hops: Int): String =
    beamHopsAdcCtes(beam, hops) + s""",
        rr AS (SELECT b.qid, b.cid, bf.cos
               FROM b$hops b JOIN bf ON bf.qid = b.qid AND bf.cid = b.cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM rr)
               WHERE rn <= 3)"""

  /** v21's refined ADC tail: the refine union ranked on the INTEGER
    * ADC scores (adcall — the code compass, no vector reads), the
    * surviving `shortlist` re-ranked exactly, top 3. */
  private[queries] def beamHopsAdcRefinedSql(beam: Int, hops: Int,
      refine: Int, shortlist: Int): String =
    beamHopsAdcRefinedSql(beam, hops, refine, shortlist.toString)

  /** Same tail with the shortlist cut as a SQL expression — v21b/st19c
    * pass the corpus-coupled `scaledShortlistSql` scalar subquery here
    * so the oracle derives R from the data exactly like the engine. */
  private[queries] def beamHopsAdcRefinedSql(beam: Int, hops: Int,
      refine: Int, shortlistSql: String): String =
    beamHopsAdcCtes(beam, hops) + "," + refineUnionCtes(refine, hops) + s""",
        su AS (SELECT x.qid, x.cid, a.score
               FROM cu x JOIN adcall a ON a.qid = x.qid AND a.cid = x.cid),
        sl AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid ASC) rn FROM su)
               WHERE rn <= ($shortlistSql)),
        rr AS (SELECT b.qid, b.cid, bf.cos
               FROM sl b JOIN bf ON bf.qid = b.qid AND bf.cid = b.cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM rr)
               WHERE rn <= 3)"""

  /** The ADC walk's converged twin (the v22b form of
    * beamHopsConvergedCtes): every beam cut ranks on the INTEGER ADC
    * score from `adcall`; the stop derives from per-hop new-row
    * counts exactly like the exact walk's. Ends with sk/bk dispatch
    * CTEs. */
  private def beamHopsAdcConvergedCtes(beam: Int, maxHops: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""
        s0 AS MATERIALIZED (SELECT f.qid, f.cid, a.score
               FROM f0 f JOIN adcall a ON a.qid = f.qid AND a.cid = f.cid),
        b0 AS MATERIALIZED (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid ASC) rn FROM s0)
               WHERE rn <= $beam)""")
    for (h <- 1 to maxHops) {
      val p = h - 1
      sb.append(s""",
        c$h AS (SELECT DISTINCT qid, cid FROM (
                 SELECT qid, cid FROM b$p
                 UNION ALL
                 SELECT b.qid, e.dst AS cid
                 FROM b$p b JOIN edges e ON e.src = b.cid)
               WHERE cid <> qid),
        s$h AS MATERIALIZED (SELECT x.qid, x.cid, a.score
               FROM c$h x JOIN adcall a ON a.qid = x.qid AND a.cid = x.cid),
        b$h AS MATERIALIZED (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid ASC) rn FROM s$h)
               WHERE rn <= $beam),
        dl$h AS (SELECT count(*) AS d FROM b$h t
                 LEFT JOIN b$p pb ON pb.qid = t.qid AND pb.cid = t.cid
                 WHERE pb.qid IS NULL)""")
    }
    val deltas = (1 to maxHops)
      .map(h => s"SELECT $h AS h, (SELECT d FROM dl$h) AS d")
      .mkString("\n          UNION ALL ")
    val bk = (1 to maxHops)
      .map(h => s"SELECT qid, cid FROM b$h WHERE (SELECT k FROM wstop) = $h")
      .mkString("\n               UNION ALL ")
    sb.append(s""",
        wdeltas AS MATERIALIZED (
          $deltas),
        wstop AS MATERIALIZED (
          SELECT coalesce(min(h), $maxHops) AS k FROM wdeltas WHERE d = 0),
        bk AS ($bk)""")
    sb.toString
  }

  /** Converged ADC plain tail: exact re-rank of the dispatched final
    * beam, top 3 (beamHopsAdcSql's rr/ann over bk). */
  private[queries] def beamHopsAdcConvergedSql(beam: Int,
      maxHops: Int): String =
    beamHopsAdcConvergedCtes(beam, maxHops) + s""",
        rr AS (SELECT b.qid, b.cid, bf.cos
               FROM bk b JOIN bf ON bf.qid = b.qid AND bf.cid = b.cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM rr)
               WHERE rn <= 3)"""

  /** Oracle CTEs replaying graphAnnServe's beam walk hop by hop:
    * entry scoring (s0/b0 — f0's medoid entries ranked), then per hop
    * h: candidate union c<h> (previous beam + its out-edges, exact
    * DISTINCT, self excluded), exact re-score s<h> (bf already holds
    * every qid x cid cosine — the truth side computes it anyway), and
    * beam cut b<h>. Ends with the top-3 `ann` the recall tail joins. */
  /** The exact walk's CTEs up to the final beam cut b<hops> — shared
    * by the plain (v17) and refined (v17d) oracle tails. */
  private def beamHopsCtes(beam: Int, hops: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""
        s0 AS (SELECT f.qid, f.cid, bf.cos
               FROM f0 f JOIN bf ON bf.qid = f.qid AND bf.cid = f.cid),
        b0 AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM s0)
               WHERE rn <= $beam)""")
    for (h <- 1 to hops) {
      val p = h - 1
      sb.append(s""",
        c$h AS (SELECT DISTINCT qid, cid FROM (
                 SELECT qid, cid FROM b$p
                 UNION ALL
                 SELECT b.qid, e.dst AS cid
                 FROM b$p b JOIN edges e ON e.src = b.cid)
               WHERE cid <> qid),
        s$h AS (SELECT x.qid, x.cid, bf.cos
               FROM c$h x JOIN bf ON bf.qid = x.qid AND bf.cid = x.cid),
        b$h AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM s$h)
               WHERE rn <= $beam)""")
    }
    sb.toString
  }

  private def beamHopsSql(beam: Int, hops: Int): String =
    beamHopsCtes(beam, hops) + s""",
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM s$hops)
               WHERE rn <= 3)"""

  /** The refine-union CTEs (refpr/refc/cu): the query's `refine`
    * nearest cells' members (the d3g dot frame re-ranked at width
    * `refine` — the same deterministic (dot DESC, cluster ASC) probe
    * order as geoCellsSql, self excluded) UNIONED with the walk's
    * final beam b<hops>. ONE copy shared by the v17d (exact) and v21
    * (ADC) tails — the GameTeamAggSql convention: an edit to the
    * probe predicate or tie-break cannot desynchronize the two
    * refined oracles. */
  private def refineUnionCtes(refine: Int, hops: Int): String =
    refineUnionCtes(refine, s"b$hops")

  /** Same union with the walk's final beam as an explicit CTE NAME —
    * the converged tails pass the dispatched `bk`. */
  private def refineUnionCtes(refine: Int, beamCte: String): String = s"""
        refpr AS (SELECT vec_id AS qid, cluster AS cell FROM (
                   SELECT vec_id, cluster,
                          row_number() OVER (PARTITION BY vec_id
                            ORDER BY dot DESC, cluster ASC) AS rn
                   FROM d3g WHERE vec_id < 20) WHERE rn <= $refine),
        refc AS (SELECT DISTINCT p.qid, g.g_cid AS cid
                 FROM refpr p JOIN a3 g
                   ON g.cell = p.cell AND g.g_cid <> p.qid),
        cu AS (SELECT qid, cid FROM $beamCte
               UNION SELECT qid, cid FROM refc)"""

  /** v17d's refined tail: the refine union, one exact re-rank, top 3. */
  private[queries] def beamHopsRefinedSql(beam: Int, hops: Int,
      refine: Int): String =
    beamHopsCtes(beam, hops) + "," + refineUnionCtes(refine, hops) + s""",
        su AS (SELECT x.qid, x.cid, bf.cos
               FROM cu x JOIN bf ON bf.qid = x.qid AND bf.cid = x.cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM su)
               WHERE rn <= 3)"""

  /** The exact walk with the hop count as a DATA-DERIVED convergence
    * test (VERDICT r15 #4 — the dm10e recipe applied to the walk):
    * `maxHops` hop CTEs unrolled MATERIALIZED (each s/b is referenced
    * by the next hop, its delta, and the stop dispatch — plain CTEs
    * inline per reference in DuckDB and go exponential down the
    * chain), each hop's NEW-ROW count dl<h> computed as data via an
    * anti-join (correlated EXISTS does not decorrelate through CTEs),
    * the stop k = min{h : dl<h> = 0} (cap when the walk never settles
    * — mirroring the engine loop, which runs exactly maxHops then),
    * and sk/bk dispatching the stop hop's scored candidates / beam.
    * Each hop's candidates contain the previous beam, so dl<h> = 0 is
    * exactly frontier-set equality — the engine's left-anti probe. */
  private def beamHopsConvergedCtes(beam: Int, maxHops: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""
        s0 AS MATERIALIZED (SELECT f.qid, f.cid, bf.cos
               FROM f0 f JOIN bf ON bf.qid = f.qid AND bf.cid = f.cid),
        b0 AS MATERIALIZED (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM s0)
               WHERE rn <= $beam)""")
    for (h <- 1 to maxHops) {
      val p = h - 1
      sb.append(s""",
        c$h AS (SELECT DISTINCT qid, cid FROM (
                 SELECT qid, cid FROM b$p
                 UNION ALL
                 SELECT b.qid, e.dst AS cid
                 FROM b$p b JOIN edges e ON e.src = b.cid)
               WHERE cid <> qid),
        s$h AS MATERIALIZED (SELECT x.qid, x.cid, bf.cos
               FROM c$h x JOIN bf ON bf.qid = x.qid AND bf.cid = x.cid),
        b$h AS MATERIALIZED (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM s$h)
               WHERE rn <= $beam),
        dl$h AS (SELECT count(*) AS d FROM b$h t
                 LEFT JOIN b$p pb ON pb.qid = t.qid AND pb.cid = t.cid
                 WHERE pb.qid IS NULL)""")
    }
    val deltas = (1 to maxHops)
      .map(h => s"SELECT $h AS h, (SELECT d FROM dl$h) AS d")
      .mkString("\n          UNION ALL ")
    val sk = (1 to maxHops)
      .map(h => s"SELECT qid, cid, cos FROM s$h WHERE (SELECT k FROM wstop) = $h")
      .mkString("\n               UNION ALL ")
    val bk = (1 to maxHops)
      .map(h => s"SELECT qid, cid FROM b$h WHERE (SELECT k FROM wstop) = $h")
      .mkString("\n               UNION ALL ")
    sb.append(s""",
        wdeltas AS MATERIALIZED (
          $deltas),
        wstop AS MATERIALIZED (
          SELECT coalesce(min(h), $maxHops) AS k FROM wdeltas WHERE d = 0),
        sk AS ($sk),
        bk AS ($bk)""")
    sb.toString
  }

  /** Converged-walk plain tail: top-3 of the stop hop's scored set. */
  private[queries] def beamHopsConvergedSql(beam: Int, maxHops: Int): String =
    beamHopsConvergedCtes(beam, maxHops) + s""",
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM sk)
               WHERE rn <= 3)"""

  /** Converged-walk refined tail: the refine union over the
    * dispatched final beam, one exact re-rank, top 3. */
  private[queries] def beamHopsConvergedRefinedSql(beam: Int,
      maxHops: Int, refine: Int): String =
    beamHopsConvergedCtes(beam, maxHops) + "," +
      refineUnionCtes(refine, "bk") + s""",
        su AS (SELECT x.qid, x.cid, bf.cos
               FROM cu x JOIN bf ON bf.qid = x.qid AND bf.cid = x.cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM su)
               WHERE rn <= 3)"""

  // m=8 subspaces of 8 dims, k=16 codewords each: 1024 codebook
  // doubles, 8x4 = 32 bits per vector. r11 retune from (4, 16, 16) —
  // same codebook size, finer subspaces + Euclidean assignment
  // (measured full-scan ADC recall@3 at the gate SF: 8/60 -> 12/60;
  // converged per-subspace Lloyd only reaches ~18/60 on this data,
  // which is why serving re-ranks an ADC SHORTLIST with exact
  // vectors — v13 — instead of trusting ADC order; tools.IvfPqDebug
  // prints the iteration and (nprobe, R) sweeps).
  private[graft] val PqM = 8
  private[graft] val PqSubDim = 8
  private[graft] val PqK = 16

  /** PQ codebook training, one copy shared by v12/v12b (pqAdcTop3) and
    * v13 (ivfPqTop3): per-subspace codebooks (m=4 subspaces of 16
    * dims, k=16 codewords; deterministic md5 seeds + ONE Lloyd update
    * per subspace — the v05b recipe), collected as m*k*16 = 1024
    * driver doubles (the KMeans-centroid bounded class: the codebook
    * trains on a driver-sized sample at 100 TB and rides every
    * executor as literals). */
  private[graft] def pqCodebook(s: SparkSession, d: String)
      : Array[Array[Array[Double]]] = {
    val m = PqM; val subDim = PqSubDim; val k = PqK
    val e = Tables.embeddings(s, d)
    // --- codebook training: md5 seeds + one Lloyd update per
    // subspace. The k seed vectors collect to the driver (k x dim
    // doubles — the KMeans-centroid bounded class), so the Lloyd
    // ASSIGNMENT runs as the same codebook-literal map-side
    // expression the encode uses (pqCodeCol — one copy, zero
    // shuffle) and the whole update is ONE corpus explode + ONE
    // m*k*subDim-group aggregate: no joins, no per-(vec, sub)
    // windows. Assignment is EUCLIDEAN (argmax of <x,c> - ||c||^2/2;
    // max-dot is wrong for subvectors, whose norms vary — it herds
    // everything onto long codewords; measured full-scan ADC
    // recall@3 8/60 max-dot vs 12/60 euclidean at the gate SF).
    val seedRows = e.select(col("vec_id").as("sid"),
        col("embedding").cast("array<double>").as("se"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h").asc, col("sid").asc).limit(k)
      // unpartitioned window on a post-LIMIT k-row frame (the
      // documented exemption; v10's rank windows set the precedent)
      .withColumn("code",
        row_number().over(Window.orderBy(col("sid").cast("string").asc)) - 1)
      .select(col("code"), col("se")).collect()
    // fail fast on degenerate corpora (ADVICE r11): with fewer than k
    // seed vectors the missing codewords would stay zero-filled, and a
    // zero codeword's Euclidean key (0) can out-rank negative keys in
    // the engine while the oracle only seeds actual codes
    require(seedRows.length == k,
      s"PQ codebook needs >= $k corpus vectors to seed, got ${seedRows.length}")
    val seedCb = Array.fill(m, k, subDim)(0.0)
    seedRows.foreach { r =>
      val code = r.getInt(0)
      val se = r.getSeq[Double](1)
      for (sub <- 0 until m; p <- 0 until subDim)
        seedCb(sub)(code)(p) = se(sub * subDim + p)
    }
    val sums = pqTrainAgg(e, seedCb)
      .collect() // <= m*k*subDim = 1024 rows: the bounded class
    // empty codewords keep their seed value (the oracle cb1 coalesce)
    val cb = seedCb.map(_.map(_.clone()))
    sums.foreach { r =>
      cb(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
        r.getDouble(3) / r.getLong(4)
    }
    cb
  }

  /** The Lloyd-update aggregation frame: per-(sub, code, lpos) sums
    * and counts of assigned subvector components, with the assignment
    * done by the seed-codebook literals (pqCodeCol). Factored out of
    * pqCodebook so PlanSpec can pin the property the map-side rewrite
    * bought — the whole training pass is ONE explode + ONE 1024-group
    * aggregate with NO join and NO window. */
  private[graft] def pqTrainAgg(e: org.apache.spark.sql.DataFrame,
      seedCb: Array[Array[Array[Double]]])
      : org.apache.spark.sql.DataFrame = {
    val m = PqM; val subDim = PqSubDim
    e.select(
        col("embedding") +:
          (0 until m).map(i => pqCodeCol(seedCb, i).as(s"c$i")): _*)
      .select(posexplode(col("embedding")),
        array((0 until m).map(i => col(s"c$i")): _*).as("cs"))
      .select((col("pos") / subDim).cast("int").as("sub"),
        (col("pos") % subDim).as("lpos"),
        col("col").cast("double").as("v"), col("cs"))
      .withColumn("code", element_at(col("cs"), col("sub") + 1))
      .groupBy(col("sub"), col("code"), col("lpos"))
      .agg(sum(col("v")).as("sm"), count(lit(1)).as("n"))
  }

  // --- map-side encode + LUT from codebook literals (zero shuffle:
  // the whole codebook is expression literals, the v09 nearestCells
  // shape applied per subspace)
  private def pqSubcol(i: Int, vec: String): Column =
    expr(s"slice($vec, ${i * PqSubDim + 1}, $PqSubDim)")

  /** Euclidean code assignment for subspace i, as ONE native codegen'd
    * expression (plans/PqSubspaceCode): per codeword key
    * (dot - ||c||^2/2), argmax with ties to the smaller code — the
    * same math the composed struct-sort form (pqCodeColComposed)
    * declares, in one flat primitive loop. The composed form's
    * zip_with/aggregate are CodegenFallback, and BatchProfile measured
    * the 16-codeword tree at ~100x the raw flops per row; the native
    * swap is bit-identical (PqSubspaceSpec pins it), so every PQ hash
    * gate is unchanged. */
  private[graft] def pqCodeCol(cb: Array[Array[Array[Double]]], i: Int,
      vec: String = "embedding"): Column =
    org.apache.spark.sql.GraftPlanBridge.column(graft.plans.PqSubspaceCode(
      org.apache.spark.sql.GraftPlanBridge.expr(col(vec)), cb(i), i * PqSubDim))

  /** The composed higher-order-function twin of pqCodeCol — kept as
    * the parity oracle for PqSubspaceSpec (the d03/d03b convention:
    * the declarative form documents the semantics, the native form
    * runs them). */
  private[graft] def pqCodeColComposed(cb: Array[Array[Array[Double]]],
      i: Int, vec: String = "embedding"): Column = {
    val ranked = cb(i).indices.map { c =>
      val cw = cb(i)(c)
      val cv = array(cw.map(lit(_)): _*)
      val prod = zip_with(cv, pqSubcol(i, vec), (x, y) => x * y.cast("double"))
      struct(
        (aggregate(prod, lit(0.0), (acc, v) => acc + v) -
          lit(cw.map(x => x * x).sum / 2)).as("key"),
        lit(-c.toLong).as("nc"))
    }
    (-element_at(slice(reverse(array_sort(array(ranked: _*))), 1, 1), 1)
      .getField("nc")).cast("int")
  }

  /** Query LUT for subspace i: per-codeword dots quantized to integer
    * MICRO-UNITS (the t31 fixed-point convention), so the ADC score —
    * a sum of m lookups — is exact integer math and both the rank key
    * and the reported score are bit-identical cross-engine regardless
    * of summation order. Native codegen'd expression
    * (plans/PqSubspaceLut) for the same reason as pqCodeCol; the
    * round/cast semantics are Spark's own, replicated exactly
    * (PqSubspaceSpec). */
  private[graft] def pqLutCol(cb: Array[Array[Array[Double]]], i: Int,
      vec: String = "embedding"): Column =
    org.apache.spark.sql.GraftPlanBridge.column(graft.plans.PqSubspaceLut(
      org.apache.spark.sql.GraftPlanBridge.expr(col(vec)), cb(i), i * PqSubDim))

  /** Composed twin of pqLutCol (parity oracle for PqSubspaceSpec). */
  private[graft] def pqLutColComposed(cb: Array[Array[Array[Double]]],
      i: Int, vec: String = "embedding"): Column =
    array((0 until PqK).map { c =>
      round(aggregate(
        zip_with(array(cb(i)(c).map(lit(_)): _*), pqSubcol(i, vec),
          (x, y) => x * y.cast("double")),
        lit(0.0), (acc, v) => acc + v) * 1e6).cast("long")
    }: _*)

  /** Corpus encode frame: (cid, c0..c<m-1>) from codebook literals. */
  private[graft] def pqCorpus(e: org.apache.spark.sql.DataFrame,
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame =
    e.select(col("vec_id").as("cid") +:
      (0 until PqM).map(i => pqCodeCol(cb, i).as(s"c$i")): _*)

  /** Query LUT frame: (qid, l0..l<m-1>) from codebook literals. */
  private def pqQueries(e: org.apache.spark.sql.DataFrame,
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame =
    e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid") +:
        (0 until PqM).map(i => pqLutCol(cb, i).as(s"l$i")): _*)

  /** ADC score: sum of one lookup per subspace. The LUT entries are
    * integer micro-units (pqLutCol), so the sum is exact and term
    * order is immaterial cross-engine. */
  private[graft] def pqScoreCol: Column =
    (0 until PqM).map(i =>
      element_at(col(s"l$i"), col(s"c$i") + 1)).reduce(_ + _)

  /** Base-k positional packing of the m codes — pins the ENCODING in
    * the v12 hash gate, not just the ranking. */
  private[graft] def pqCodeKeyCol: Column =
    (0 until PqM).map { i =>
      col(s"c$i").cast("long") *
        lit(math.pow(PqK, PqM - 1 - i).toLong)
    }.reduce(_ + _)

  private[graft] def pqAdcTop3(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cb = TrainedIndex.codebook(s, d)
    // score is an exact integer (micro-unit LUT entries — pqLutCol),
    // so the rank key needs no rounding: identical cross-engine by
    // construction, ties resolved by the cid tiebreak
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid").asc)
    pqCorpus(e, cb).join(broadcast(pqQueries(e, cb)),
        col("cid") =!= col("qid"))
      .withColumn("score", pqScoreCol)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"), pqCodeKeyCol.as("code_key"),
        col("score"), col("rank"))
  }

  /** IVF-PQ fused serving (v13) — the production composition the
    * v09/v12 pair sets up: queries route to their `nprobe` nearest
    * geometric cells (v09's centroid-literal argmax, zero shuffle)
    * and ONLY those cells' candidates are scored, via the PQ/ADC
    * lookup tables (v12's 4-array-lookup score over stored codes).
    * Scan budget is nprobe/k of the corpus AND each candidate costs
    * 4 code lookups instead of 64 floats — the two axes (which rows,
    * how many bytes per row) compose multiplicatively, which is how
    * a 100-TB index actually serves (Jegou et al. TPAMI'11 §V,
    * IVFADC). The rank key is the exact integer micro-unit ADC
    * score (pqLutCol's fixed-point quantization), so no cross-engine
    * float tie can flip it. */
  private[graft] def ivfPqTop3(s: SparkSession, d: String, nprobe: Int)
      : org.apache.spark.sql.DataFrame =
    ivfPqShortlist(s, d, nprobe, 3)

  /** Cell-routed ADC top-`r` shortlist per query — the candidate
    * generation stage of IVFADC+R. Artifacts come from the
    * train-once TrainedIndex cache (VERDICT r11 #3). */
  private[graft] def ivfPqShortlist(s: SparkSession, d: String,
      nprobe: Int, r: Int): org.apache.spark.sql.DataFrame =
    ivfPqShortlistWith(s, d, nprobe, r,
      TrainedIndex.centroids(s, d, k = 8), TrainedIndex.codebook(s, d))

  /** Shortlist generation against EXPLICIT artifacts — the serving
    * path v15 drives from a loaded IndexArtifacts store. */
  private[graft] def ivfPqShortlistWith(s: SparkSession, d: String,
      nprobe: Int, r: Int, cent: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val corpus = e.select(col("vec_id").as("cid") +:
      (-element_at(nearestCells(cent, col("embedding"), 1), 1)
        .getField("nc")).as("cell") +:
      (0 until PqM).map(i => pqCodeCol(cb, i).as(s"c$i")): _*)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid") +:
        explode(nearestCells(cent, col("embedding"), nprobe)).as("pc") +:
        (0 until PqM).map(i => pqLutCol(cb, i).as(s"l$i")): _*)
      .select(col("qid") +: (-col("pc.nc")).as("cell") +:
        (0 until PqM).map(i => col(s"l$i")): _*)
    val rankW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid").asc)
    corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("score", pqScoreCol)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= r)
      .select(col("qid"), col("cid"))
  }

  /** v14's cell-local kNN-graph kernel, k-parameterized: per-point
    * top-3 cosine neighbors within the point's own KMeans cell. The
    * gate pins kCells=8 (the oracle-replayable KmeansSql chain);
    * tools.KnnGraphAb measures the k~sqrt(n) scaling rule that keeps
    * sum(cell_i^2) pair volume flat per point as the corpus grows. */
  private[graft] def knnGraph(s: SparkSession, d: String, kCells: Int,
      degree: Int = 3): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    // norms ride the row: computed once per VECTOR before the join,
    // not re-derived per pair (cuts the per-pair fold work to one
    // dot product — at sum(cell_i^2) pairs that is the dominant
    // flop count)
    val asg = e.select(col("vec_id"),
      (-element_at(nearestCells(cent, "embedding", 1), 1)
        .getField("nc")).as("cell"),
      col("embedding"),
      sqrt(dot("embedding", "embedding")).as("nrm"))
    val aSide = asg.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("ae"), col("nrm").as("na"))
    val bSide = asg.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("be"), col("nrm").as("nb"))
    // the top-3 cut runs through the TopKPerKey heap operator at its
    // designed use: the pair stream arrives partitioned by cell, and
    // every a_id's candidates live in ONE cell partition, so the
    // partial heap already reduces each point to <=3 rows — the
    // final exchange ships 3n rows where a row_number window would
    // re-shuffle ALL sum(cell_i^2) pairs.
    // shuffle_hash FORCES that cell partitioning (r16): a small
    // single-file corpus sits under the auto-broadcast threshold, and
    // a broadcast join here would stream the sum(cell^2) pair compute
    // through the scan's OWN splits — ONE task on a one-file fixture
    // (measured: the 10x vamana build ran 383 s serial vs 63 s
    // cell-parallel). The build cost model ("pairs spread across
    // cells") only holds when the exchange actually happens.
    val pairs = aSide.join(bSide.hint("shuffle_hash"), Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos", dot("ae", "be") / (col("na") * col("nb")))
      .select(col("a_id"), col("b_id"), col("cos"))
    val top = graft.plans.TopKPerKey.topK(
      pairs, Seq("a_id"), Seq(col("cos").desc, col("b_id").asc), degree)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("b_id").asc)
    top.withColumn("rank", row_number().over(w)) // over degree*n rows
      .select(col("a_id").as("vec_id"), col("rank"),
        col("b_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
  }

  /** IVFADC+R (Jegou et al. TPAMI'11 §VI): exact-cosine re-rank of the
    * cell-routed ADC shortlist. The shortlist is query-count bounded
    * (|queries| x r rows), so it broadcasts into the corpus scan and
    * only the shortlisted rows' full vectors are ever touched. */
  private[graft] def ivfAdcRerank(s: SparkSession, d: String,
      nprobe: Int, r: Int): org.apache.spark.sql.DataFrame =
    ivfAdcRerankWith(s, d, nprobe, r,
      TrainedIndex.centroids(s, d, k = 8), TrainedIndex.codebook(s, d))

  /** Re-ranked serving against EXPLICIT artifacts (the v15 path). */
  private[graft] def ivfAdcRerankWith(s: SparkSession, d: String,
      nprobe: Int, r: Int, cent: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val sl = ivfPqShortlistWith(s, d, nprobe, r, cent, cb)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(sl.join(q, Seq("qid"))), Seq("cid"))
      .withColumn("cos", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"))
  }

  /** BATCH IVFADC+R serving (v16): every corpus vector is a query —
    * the shape of a full index refresh / all-pairs enrichment job,
    * where the online-serving assumptions (tiny query set, broadcast
    * joins, per-query rank windows) all break. Nothing broadcasts:
    * the ADC stage is a cell-co-partitioned shuffle join of two
    * corpus-sized frames, and BOTH per-query cuts (shortlist top-r,
    * re-rank top-3) ride the TopKPerKey heap operator, whose partial
    * heaps reduce each query to <=r rows per map task BEFORE the
    * exchange — a row_number window would re-shuffle the full
    * |corpus| x cell-size pair stream by qid. At 100 TB the
    * shortlist is the only inter-stage frame and it is r rows per
    * query, so every join after the ADC stage is delta-proportional.
    * The batch-rebuild analogue of the reference's full-lake rebuild
    * pass (scripts/rebuild_from_raw.py — every row reprocessed, not
    * an online probe), re-expressed as the VERDICT-r11 plan note on
    * v13 prescribes. */
  private[graft] def ivfAdcBatchServe(s: SparkSession, d: String,
      nprobe: Int, r: Int,
      kCells: Int = 8): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    val cb = TrainedIndex.codebook(s, d)
    val corpus = e.select(col("vec_id").as("cid") +:
      (-element_at(nearestCells(cent, col("embedding"), 1), 1)
        .getField("nc")).as("cell") +:
      (0 until PqM).map(i => pqCodeCol(cb, i).as(s"c$i")): _*)
    val queries = e.select(col("vec_id").as("qid") +:
        explode(nearestCells(cent, col("embedding"), nprobe)).as("pc") +:
        (0 until PqM).map(i => pqLutCol(cb, i).as(s"l$i")): _*)
      .select(col("qid") +: (-col("pc.nc")).as("cell") +:
        (0 until PqM).map(i => col(s"l$i")): _*)
    // no broadcast hint: both sides are corpus-sized, the join
    // co-partitions on cell — EXPLICITLY. The repartition is not just
    // the 100-TB shape: the exchange MATERIALIZES the encode/LUT
    // projections. Fused into a broadcast-join stage they become
    // deferred stream-side variables that codegen re-evaluates PER
    // MATCH (measured: 128 BigDecimal rounds x |pairs| — the tiny-SF
    // plan burned 75 s in round() at 1M pairs; the composed
    // higher-order forms were accidentally immune because
    // CodegenFallback forced their Project out of the fused stage).
    val scored = corpus.repartition(col("cell"))
      .join(queries.repartition(col("cell")), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("score", pqScoreCol)
      .select(col("qid"), col("cid"), col("score"))
    val sl = graft.plans.TopKPerKey.topK(scored, Seq("qid"),
        Seq(col("score").desc, col("cid").asc), r)
      .select(col("qid"), col("cid"))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val rr = sl.join(q, Seq("qid")).join(c, Seq("cid"))
      .withColumn("cos", cosine("qe", "ce"))
      .select(col("qid"), col("cid"), col("cos"))
    val top = graft.plans.TopKPerKey.topK(rr, Seq("qid"),
      Seq(col("cos").desc, col("cid").asc), 3)
    // rank over the <=3-rows-per-qid frame (the v14 convention)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), round(col("cos"), 4).as("cosine"))
  }

  /** Greedy beam-search ANN serving over the STORED kNN graph (v17) —
    * the graph-navigation serving pattern (HNSW layer 0, Malkov &
    * Yashunin TPAMI'18 §4; NSG, Fu et al. VLDB'19) re-expressed as a
    * fixed number of bounded relational hops. Where IVF serving
    * (v09/v13) scans whole cells, graph serving touches only
    * `beam * degree` graph rows per query per hop: enter at the
    * query's nprobe=2 nearest cells' MEDOIDS (the corpus vector with
    * the max dot against its own cell centroid — k driver rows, the
    * TrainedIndex artifact pattern), then each hop expands the
    * current beam's out-edges, scores the candidate union exactly,
    * and keeps the top-`beam` per query. Every per-hop frame is
    * queries x beam x (1 + degree) rows — corpus-size-independent —
    * so the hop joins broadcast the frontier into the stored edge /
    * embedding tables; at 100 TB those tables are id-bucketed and
    * each hop is a bucket-pruned point-lookup join, never a scan.
    * The graph itself is v14's kernel built ONCE (the eager local
    * checkpoint stands in for the stored edge table so hop joins
    * read it instead of replaying the build per hop). Determinism:
    * ranks order by (cos DESC, cid ASC) like every serving gate, and
    * candidate sets are exact-distinct, so the walk is replayable in
    * SQL hop by hop. */
  /** The graph-tier BUILD shared by the graph-serving gates (v17
    * exact-cosine walk, v19 ADC walk): v14's cell-local kernel at
    * `degree` edges per node UNION one long-range HUB edge (node ->
    * the medoid of its SECOND-nearest cell — a cell-local graph
    * traps the walk in the entry cells, measured 4/60 recall@3 at
    * degree 3; the hub edges are HNSW's upper-layer insight in
    * single-table form, out-degree <= degree+1). Per-cell medoid =
    * argmax_{v in cell} dot(v, centroid(cell)), ties to the lower
    * id — map-side: the dot vs the OWN centroid is exactly
    * nearestCells' top-1 struct, and max_by's partial aggregation
    * reduces each map task to k rows. Returns (edges, medoids) —
    * the frames TrainedIndex persists through IndexArtifacts
    * (VERDICT r12 #1); serving NEVER calls this directly. */
  private[graft] def buildHubGraph(s: SparkSession, d: String,
      degree: Int, kCells: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    val (hub, medoids) = hubAndMedoidsFrom(Tables.embeddings(s, d), cent)
    val edges = knnGraph(s, d, kCells = kCells, degree = degree)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .union(hub).distinct()
    (edges, medoids)
  }

  /** Vamana-style alpha-pruned graph build (VERDICT r14 #3; DiskANN /
    * RobustPrune, Subramanya et al. NeurIPS'19 §2 — public paper,
    * clean-room declarative form). A pure-kNN edge list spends the
    * whole degree budget on one direction (the nearest cluster);
    * RobustPrune keeps a neighbor only if no closer pool candidate
    * already "covers" it (alpha * d(p, c) <= d(src, c) prunes c), so
    * the budget buys DIVERSE directions — short edges plus the
    * escapes greedy search needs. Measured effect (BENCH_SCALE r15):
    * +4 recall@3 over the hub-kNN graph at 10x (40 vs 36/60) with
    * -14 vs -18 decay under 10x corpus growth, equal at sf0.1 —
    * PROVIDED the walk's search budget is adequate (beam 64, hops to
    * convergence); at a starved budget every graph collapses the
    * same and the comparison inverts.
    *
    * The paper's prune is a sequential sieve per node (kept neighbors
    * prune later candidates). The declarative form used here is the
    * ONE-SHOT occlusion test (the HNSW "select neighbors" heuristic
    * family, Malkov & Yashunin TPAMI'20 — any CLOSER pool candidate
    * may occlude, kept or not): strictly more aggressive than the
    * sieve, and one join instead of degree dependent rounds. Occluded
    * candidates are not discarded — the final cut ranks (occluded ASC,
    * dsq ASC) and fills to `degree`, the keepPrunedConnections shape,
    * so no node loses connectivity to the prune. Two enrichments were
    * built and ABLATED AWAY as measurement-neutral at every measured
    * point (r15): an all-cell-medoid global candidate arm and a
    * hybrid nearest-mesh fill — the shipped form is the simple one,
    * and its out-degree is exactly `degree`, not degree + mesh.
    *
    * Scale shape: the candidate pool is the node's 2 nearest cells'
    * members (the same n^1.5-class cell join every v14 build pays at
    * k~sqrt(n)) CAPPED at `poolCap` nearest through the TopKPerKey
    * partial heaps, so the occlusion self-join is n * poolCap^2 rows —
    * linear in n at fixed cap, no all-pairs anywhere. Distances are
    * squared Euclidean assembled from row-riding squared norms and one
    * dot product per pair (d2 = n2a + n2b - 2*dot), identical op
    * order on both engines so the occlusion boolean is bit-exact. */
  private[graft] val VamanaAlphaSq = 1.44 // alpha = 1.2, compared on d^2
  private[graft] val VamanaPoolCap = 64

  private[graft] def buildVamanaGraph(s: SparkSession, d: String,
      degree: Int, kCells: Int, poolCap: Int = VamanaPoolCap)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    vamanaGraphFrom(s, Tables.embeddings(s, d),
      TrainedIndex.centroids(s, d, k = kCells), degree, poolCap)

  /** The alpha-pruned build over an ARBITRARY (vec_id, embedding)
    * frame — the hubAndMedoidsFrom convention applied to the vamana
    * kernel, so the maintained-lake OPTIMIZE pass (st19d) and the
    * batch artifact build (v22) share ONE occlusion/fill and cannot
    * desynchronize. */
  private[graft] def vamanaGraphFrom(s: SparkSession,
      e: org.apache.spark.sql.DataFrame, cent: Array[Array[Double]],
      degree: Int, poolCap: Int = VamanaPoolCap)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (_, medoids) = hubAndMedoidsFrom(e, cent) // hub frame unused (lazy)
    // members by primary cell, squared norm riding the row
    val m = e.select(col("vec_id").as("cand"), col("embedding").as("ce"),
      dot("embedding", "embedding").as("n2c"),
      (-element_at(nearestCells(cent, "embedding", 1), 1)
        .getField("nc")).as("cell"))
    // each source probes its 2 nearest cells map-side (the hub build's
    // second-cell reach, now feeding candidates through the prune
    // instead of a single medoid edge)
    val srcs = e.select(col("vec_id").as("src"), col("embedding").as("se"),
        dot("embedding", "embedding").as("n2s"),
        explode(nearestCells(cent, "embedding", 2)).as("pc"))
      .select(col("src"), col("se"), col("n2s"), (-col("pc.nc")).as("cell"))
    // shuffle_hash, not broadcast (r16): the n*poolCap pair compute
    // must run cell-partitioned — on a single-file corpus the
    // broadcast arm streams it through ONE scan split (see knnGraph)
    val pool = m.join(srcs.hint("shuffle_hash"), Seq("cell"))
      .filter(col("cand") =!= col("src"))
      .withColumn("dsq",
        col("n2s") + col("n2c") - lit(2.0) * dot("se", "ce"))
      .select(col("src"), col("cand"), col("ce"), col("n2c"), col("dsq"))
    val capped = graft.plans.TopKPerKey.topK(pool, Seq("src"),
      Seq(col("dsq").asc, col("cand").asc), poolCap)
    // rank within the capped pool once; checkpoint so the occlusion
    // self-join reads the ~n*poolCap frame twice instead of re-running
    // the cell join twice
    val ranked = capped.withColumn("rk", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("dsq").asc, col("cand").asc)))
      .localCheckpoint(true)
    val cRows = ranked
    val pRows = ranked.select(col("src"), col("ce").as("pe"),
      col("n2c").as("n2p"), col("rk").as("p_rk"))
    val occSet = cRows.join(pRows, Seq("src"))
      .filter(col("p_rk") < col("rk"))
      .filter(lit(VamanaAlphaSq) *
        (col("n2p") + col("n2c") - lit(2.0) * dot("pe", "ce"))
        <= col("dsq"))
      .select(col("src"), col("cand")).distinct()
    val flagged = cRows.select(col("src"), col("cand"), col("dsq"))
      .join(occSet.withColumn("occluded", lit(true)),
        Seq("src", "cand"), "left")
      .withColumn("occluded", coalesce(col("occluded"), lit(false)))
    // fill to `degree` ordered (occluded ASC, dsq ASC): survivors of
    // the prune first — the diverse directions — then the nearest
    // pruned rows (the keepPrunedConnections shape), so no node loses
    // connectivity to the prune
    val edges = graft.plans.TopKPerKey.topK(flagged, Seq("src"),
        Seq(col("occluded").asc, col("dsq").asc, col("cand").asc), degree)
      .select(col("src"), col("cand").as("dst"))
    (edges, medoids)
  }

  /** The hub-edge + entry-medoid kernel over an ARBITRARY (vec_id,
    * embedding) frame — one copy shared by the batch build (raw
    * table) and the maintained-lake serving path (st19), so the
    * medoid tie-break and the second-nearest-cell hub convention
    * can never diverge between them (both must match hubGraphSql). */
  private[graft] def hubAndMedoidsFrom(
      vecs: org.apache.spark.sql.DataFrame, cent: Array[Array[Double]])
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val medoids = vecs.select(col("vec_id"),
        element_at(nearestCells(cent, "embedding", 1), 1).as("best"))
      .select(col("vec_id"), (-col("best.nc")).as("cell"),
        col("best.dot").as("dt"))
      .groupBy(col("cell"))
      .agg(max_by(col("vec_id"),
        struct(col("dt"), -col("vec_id"))).as("mid"))
    val hub = vecs.select(col("vec_id").as("src"),
        (-element_at(nearestCells(cent, "embedding", 2), 2)
          .getField("nc")).as("cell"))
      .join(broadcast(medoids), Seq("cell"))
      .filter(col("mid") =!= col("src"))
      .select(col("src"), col("mid").as("dst"))
    (hub, medoids)
  }

  /** Entry frontier f0 for the broadcast query set: each query's
    * `entries` nearest cells' medoids (self excluded) — queries route
    * map-side against centroid literals, medoids broadcast. Factored
    * out of the build so serving paths that LOAD the medoid frame
    * (v20 artifact round-trip, st19 maintained graph) compute their
    * entries from the stored artifact. Every gate pins entries=2
    * (the oracle f0 CTE); wider entry sets are the multi-entry
    * search lever GraphAnnAb measures — when the greedy walk
    * converges to a local minimum (recall saturates in beam/degree/
    * hops), more DIVERSE starts are the remaining recall axis, at
    * `entries` extra scored rows per query and zero graph cost. */
  private[graft] def graphEntries(s: SparkSession, d: String,
      cent: Array[Array[Double]],
      medoids: org.apache.spark.sql.DataFrame,
      entries: Int = 2): org.apache.spark.sql.DataFrame = {
    val probes = Tables.embeddings(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"),
        explode(nearestCells(cent, "embedding", entries)).as("pc"))
      .select(col("qid"), (-col("pc.nc")).as("cell"))
    probes.join(broadcast(medoids), Seq("cell"))
      .filter(col("mid") =!= col("qid"))
      .select(col("qid"), col("mid").as("cid")).distinct()
  }

  /** Stored graph + entry frontier for serving: loads the persisted
    * (edges, medoids) frames from the TrainedIndex artifact store —
    * the first demand per JVM builds and persists, every later call
    * is a parquet scan (the v13→v15 train-once payoff applied to the
    * graph tier, VERDICT r12 #1). */
  private def hubGraphAndEntry(s: SparkSession, d: String, degree: Int,
      kCells: Int = 8, entries: Int = 2)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (edges, medoids) = TrainedIndex.graph(s, d, degree, kCells)
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    (edges, graphEntries(s, d, cent, medoids, entries))
  }

  private[graft] def graphAnnServe(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = hubGraphAndEntry(s, d, degree, kCells, entries)
    exactWalkServe(s, d, edges, f0, beam, hops)
  }

  /** Stored Vamana graph + entry frontier (the hubGraphAndEntry shape
    * over the alpha-pruned artifact). */
  private def vamanaGraphAndEntry(s: SparkSession, d: String,
      degree: Int, kCells: Int, entries: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (edges, medoids) = TrainedIndex.vamanaGraph(s, d, degree, kCells)
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    (edges, graphEntries(s, d, cent, medoids, entries))
  }

  /** v22: the exact-cosine beam walk over the alpha-pruned graph —
    * same serving kernel as v17, only the edge artifact differs. */
  private[graft] def vamanaAnnServe(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    exactWalkServe(s, d, edges, f0, beam, hops)
  }

  /** The ADC-compassed walk (v19's memory economics) over the
    * alpha-pruned graph. */
  private[graft] def vamanaAnnServeAdc(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    adcWalkServe(s, d, edges, f0, beam, hops,
      Some(TrainedIndex.codes(s, d)))
  }

  /** v22b's serve with the CONVERGED ADC walk (the v22 stop rule on
    * the code compass): walk to the integer-score fixed point, one
    * exact re-rank of the dispatched final beam. */
  private[graft] def vamanaAnnServeAdcConverged(s: SparkSession,
      d: String, beam: Int, degree: Int, kCells: Int, entries: Int,
      maxHops: Int = WalkMaxHops): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    val frontier = adcWalkFrontierConverged(s, d, edges, f0, beam,
      maxHops, Some(TrainedIndex.codes(s, d)))
    exactRerankTop3(s, d, frontier.select(col("qid"), col("cid")))
  }

  /** The query's `refine` nearest cells' MEMBERS as (qid, cid)
    * candidates — the IVF scan set, map-side assignment against
    * centroid literals on both sides (geoAnn's shape, parameterized
    * over the centroid artifact so the k~sqrt(n) geometry serves
    * O(sqrt n) candidates per query instead of O(n/8)). */
  private[graft] def cellCandidates(s: SparkSession, d: String,
      cent: Array[Array[Double]], refine: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val asg = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("cell",
        -element_at(nearestCells(cent, "ce", 1), 1).getField("nc"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"),
        explode(nearestCells(cent, "embedding", refine)).as("pc"))
      .select(col("qid"), (-col("pc.nc")).as("cell"))
    asg.join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"))
  }

  /** v17d's REFINED graph serving: the beam walk's final frontier
    * UNIONED with the query's `refine` nearest cells' members, then
    * ONE exact re-rank cut. The walk supplies long-range candidates
    * the cell scan cannot see (hub escapes), the cell scan supplies
    * the dense local neighborhood greedy descent walks past (the
    * measured recall-saturation failure: every per-walk axis — beam,
    * degree, hops, and past ~16 even entry diversity — plateaus at a
    * local-minimum set). Cost per query is beam + refine x n/kCells
    * scored rows; at the gated k~sqrt(n) geometry that is O(sqrt n) —
    * the IVF nprobe economics — vs the walk's O(1), the price of
    * recall above the walk's plateau. The refinement is one candidate
    * union + one exact scoring pass: no second walk, no extra hop
    * over the stored graph. */
  private[graft] def graphAnnServeRefined(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2, refine: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    val (edges, f0) = hubGraphAndEntry(s, d, degree, kCells, entries)
    refinedExactServeFrom(s, d, edges, f0, beam, hops, kCells, refine)
  }

  /** The exact-refined tail over an EXPLICIT (edges, f0) pair — one
    * copy shared by the hub (v17d) and vamana (v22c) refined serves,
    * the refinedAdcServe convention applied to the exact tier. */
  private def refinedExactServeFrom(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, hops: Int, kCells: Int, refine: Int)
      : org.apache.spark.sql.DataFrame =
    refinedExactTail(s, d,
      exactWalkFrontier(s, d, edges, f0, beam, hops), kCells, refine)

  /** The refined union + exact re-rank over an EXPLICIT final
    * frontier — one copy shared by the fixed-hop (v17d) and converged
    * (v22c/st19d) refined serves. */
  private def refinedExactTail(s: SparkSession, d: String,
      frontier: org.apache.spark.sql.DataFrame, kCells: Int, refine: Int)
      : org.apache.spark.sql.DataFrame = {
    val cent = TrainedIndex.centroids(s, d, k = kCells)
    val cands = frontier.select(col("qid"), col("cid"))
      .union(cellCandidates(s, d, cent, refine))
      .distinct()
    exactRerankTop3(s, d, cands)
  }

  /** v22c: the refined union over the alpha-pruned walk — the
    * max-recall composition (v17d's union lever on v22's graph). */
  private[graft] def vamanaAnnServeRefined(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2, refine: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    refinedExactServeFrom(s, d, edges, f0, beam, hops, kCells, refine)
  }

  /** The CONVERGED exact-cosine walk's top-3 serve over an explicit
    * (edges, f0) pair — exactWalkServe with the hop count as a
    * convergence test; shared by v22 and the maintained tier
    * (st19d). */
  private[graft] def exactWalkServeConverged(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, maxHops: Int = WalkMaxHops)
      : org.apache.spark.sql.DataFrame =
    graft.plans.TopKPerKey.topK(
      exactWalkFrontierConverged(s, d, edges, f0, beam, maxHops),
      Seq("qid"), Seq(col("cos").desc, col("cid").asc), 3)
      .select(col("qid"), col("cid"))

  /** v22's serve with the hop count as a CONVERGENCE TEST (VERDICT
    * r15 #4): the exact-cosine walk over the alpha-pruned graph hops
    * until the frontier stops changing (capped at [[WalkMaxHops]]),
    * then cuts top-3. */
  private[graft] def vamanaAnnServeConverged(s: SparkSession, d: String,
      beam: Int, degree: Int, kCells: Int, entries: Int,
      maxHops: Int = WalkMaxHops): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    exactWalkServeConverged(s, d, edges, f0, beam, maxHops)
  }

  /** Probe form of [[vamanaAnnServeConverged]]: (top-3 serve, stop
    * hop) — GraphAnnAb's `vamconv` mode and GraphAnnSpec use it to
    * measure that the cap is headroom, not the budget. */
  private[graft] def vamanaWalkStop(s: SparkSession, d: String,
      beam: Int, degree: Int, kCells: Int, entries: Int,
      maxHops: Int = WalkMaxHops)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    val (frontier, stop) =
      exactWalkFrontierConvergedWithStop(s, d, edges, f0, beam, maxHops)
    (graft.plans.TopKPerKey.topK(frontier, Seq("qid"),
      Seq(col("cos").desc, col("cid").asc), 3)
      .select(col("qid"), col("cid")), stop)
  }

  /** v22c's refined union over the CONVERGED alpha-pruned walk. */
  private[graft] def vamanaAnnServeRefinedConverged(s: SparkSession,
      d: String, beam: Int, degree: Int, kCells: Int, entries: Int,
      refine: Int, maxHops: Int = WalkMaxHops)
      : org.apache.spark.sql.DataFrame = {
    val (edges, f0) = vamanaGraphAndEntry(s, d, degree, kCells, entries)
    refinedExactTail(s, d,
      exactWalkFrontierConverged(s, d, edges, f0, beam, maxHops),
      kCells, refine)
  }

  /** v17's exact-cosine beam walk over an EXPLICIT (edges, f0) pair —
    * the serving kernel, decoupled from where the graph came from
    * (artifact store, st18-maintained roots, or a fresh build). */
  private[graft] def exactWalkServe(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, hops: Int): org.apache.spark.sql.DataFrame =
    graft.plans.TopKPerKey.topK(
      exactWalkFrontier(s, d, edges, f0, beam, hops), Seq("qid"),
      Seq(col("cos").desc, col("cid").asc), 3)
      .select(col("qid"), col("cid"))

  /** The walk's FINAL frontier (qid, cid, cos) — factored out of
    * exactWalkServe so the refined variant (v17d) can union it with
    * the entry cells' members before the last exact cut. */
  private[graft] def exactWalkFrontier(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, hops: Int): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    // norms ride the row (the v14 convention)
    val qn = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val cn = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))

    // exact scoring of a (qid, cid) candidate frame: the tiny frame
    // broadcasts into the embedding scan (bucket point-lookups at
    // scale), queries broadcast by construction
    def scoredOf(cands: org.apache.spark.sql.DataFrame) =
      cn.join(broadcast(cands), Seq("cid"))
        .join(broadcast(qn), Seq("qid"))
        .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
        .select(col("qid"), col("cid"), col("cos"))

    def topB(sc: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerKey.topK(sc, Seq("qid"),
        Seq(col("cos").desc, col("cid").asc), beam)

    // each frontier is <= queries x beam rows, driver-materialized
    // (see DriverFrontier): one action per hop funds the next hop's
    // LocalRelation, its pushdown ids, and (in the converged forms)
    // the convergence test
    var frontier = materializeFrontier(s, topB(scoredOf(f0)))
    for (_ <- 1 to hops) {
      val neigh = hopEdgesOf(edges, frontier)
      val cands = frontier.df.select(col("qid"), col("cid"))
        .union(neigh)
        .filter(col("cid") =!= col("qid"))
        .distinct()
      frontier = materializeFrontier(s, topB(scoredOf(cands)))
    }
    frontier.df
  }

  /** Convergence CAP for [[exactWalkFrontierConverged]] — a runaway
    * bound, NOT the search budget (VERDICT r15 #4 / BENCH_SCALE r15:
    * hops is a convergence budget ~log n, and a pinned constant
    * silently re-starves the walk at the next corpus jump — "measuring
    * a graph at a starved budget measures the budget"). Measured stops
    * at beam=64/entries=16 over the alpha-pruned k=25 graph
    * (GraphAnnAb vamconv, r16): hop 6 at sf0.1 and hop 9 at the 10x
    * fixture — a first cap candidate of 8 was measured BINDING at 10x
    * (stop=8 == cap; raising it converged at 9 with +1 recall), the
    * exact silent-starvation failure this test exists to prevent. 16
    * is the dm10e unroll-depth discipline: 7 hops of headroom past
    * the largest observed stop, and the oracle unrolls the same 16
    * materialized hop CTEs so a stop drift moves both engines
    * together. The engine loop EXITS at the stop (cap hops are never
    * paid when converged); only the oracle pays the full unroll.
    * GraphAnnSpec asserts the stop is strictly inside the cap. */
  private[graft] val WalkMaxHops = 16

  /** The beam walk iterated TO FIXED POINT (the dm10e recipe applied
    * to the walk, VERDICT r15 #4): hop until the frontier SET stops
    * changing, capped at `maxHops`. The stop derives from the data on
    * both engines — the oracle (beamHopsConvergedSql) unrolls
    * `maxHops` materialized hop CTEs, computes each hop's
    * new-row count as data, and dispatches the first unchanged hop —
    * so a corpus jump that needs more hops moves both sides together
    * instead of silently starving the engine. Convergence is
    * monotone-safe: each hop's candidates contain the previous
    * frontier, so the per-qid beam cut can only improve, and
    * `new \ old = {}` is exactly set equality. The emptiness test is
    * a driver-side set comparison over the two <= queries x beam
    * materialized frontiers (r17, see DriverFrontier) — the same
    * bounded class, one action per hop instead of three. */
  private[graft] def exactWalkFrontierConverged(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, maxHops: Int = WalkMaxHops)
      : org.apache.spark.sql.DataFrame =
    exactWalkFrontierConvergedWithStop(s, d, edges, f0, beam, maxHops)._1

  /** The converged walk plus its measured stop hop — the probe form
    * GraphAnnSpec and tools use to verify the cap is headroom, not
    * the budget. */
  private[graft] def exactWalkFrontierConvergedWithStop(
      s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame,
      beam: Int, maxHops: Int = WalkMaxHops)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val e = Tables.embeddings(s, d)
    val qn = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val cn = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))
    def scoredOf(cands: org.apache.spark.sql.DataFrame) =
      cn.join(broadcast(cands), Seq("cid"))
        .join(broadcast(qn), Seq("qid"))
        .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
        .select(col("qid"), col("cid"), col("cos"))
    def topB(sc: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerKey.topK(sc, Seq("qid"),
        Seq(col("cos").desc, col("cid").asc), beam)

    var frontier = materializeFrontier(s, topB(scoredOf(f0)))
    var h = 0
    var converged = false
    while (h < maxHops && !converged) {
      val neigh = hopEdgesOf(edges, frontier)
      val cands = frontier.df.select(col("qid"), col("cid"))
        .union(neigh)
        .filter(col("cid") =!= col("qid"))
        .distinct()
      val next = materializeFrontier(s, topB(scoredOf(cands)))
      // `next \ frontier = {}` on driver-held sets — the identical
      // anti-join emptiness test, without a per-hop probe plan
      converged = next.pairs.subsetOf(frontier.pairs)
      frontier = next
      h += 1
    }
    (frontier.df, h)
  }

  /** Frontier-id pushdown cap for [[hopEdges]] (VERDICT r13 #2). Below
    * it the hop inlines the frontier ids as an isin literal; above it
    * the literal list itself becomes the cost — O(ids) analysis/codegen
    * work per hop plan, which at a fleet-sized serving batch (10^4
    * queries x beam 32 ~ 10^5 ids) bloats the plan long before the scan
    * ever wins — so the hop falls back to the PLAIN broadcast join, the
    * semantic base the pruned form is row-equal to (GraphAnnSpec pins
    * both regimes). 1024 keeps every gate (20 queries x beam <= 48)
    * on the point-lookup arm while bounding the literal list at ~3
    * orders of magnitude under the pathological case. */
  private[graft] val HopPushdownMaxIds = 1024

  /** One hop's out-edge expansion: the frontier's src ids ride into
    * the stored edge table's SCAN as a pushed predicate before the
    * broadcast join resolves (qid, dst) pairs. The id set is
    * driver-bounded TWICE over: by construction (<= queries x beam
    * rows — the frontier is already localCheckpointed, so the collect
    * re-reads checkpoint blocks, not the plan) and by `limit(cap+1)`,
    * so even a mis-sized frontier can never collect more than the cap
    * before the hop flips to the join arm. Semantically a no-op (the
    * join restricts to the same keys), but it is what makes a hop a
    * POINT LOOKUP instead of a full edge scan: the isin lands in the
    * parquet scan's PushedFilters (GraphAnnSpec pins it; past
    * parquet's inFilterThreshold=10 the reader prunes row groups by
    * the id range, which the src-sorted edge artifact keeps tight —
    * the >10-id shape is spec-pinned too), so at 100 TB an id-sorted/
    * bucketed edge artifact serves each hop from the few row groups
    * holding the frontier's ids. */
  private[graft] def hopEdges(edges: org.apache.spark.sql.DataFrame,
      frontier: org.apache.spark.sql.DataFrame,
      maxPushIds: Int = HopPushdownMaxIds)
      : org.apache.spark.sql.DataFrame = {
    val srcIds = frontier.select(col("cid")).distinct()
      .limit(if (maxPushIds >= Int.MaxValue - 1) Int.MaxValue
             else maxPushIds + 1) // saturating: cap+1 must not overflow
      .collect().map(_.getLong(0)).toSeq
    val scan =
      if (srcIds.size <= maxPushIds) edges.filter(col("src").isin(srcIds: _*))
      else edges // fleet-sized frontier: literal list would bloat the plan
    scan
      .join(broadcast(frontier.select(col("qid"), col("cid").as("src"))),
        Seq("src"))
      .select(col("qid"), col("dst").as("cid"))
  }

  /** DRIVER-MATERIALIZED walk frontier (r17, guide §1.2/§5): a frontier
    * is <= queries x beam rows BY CONSTRUCTION (TopKPerKey k=beam per
    * qid over the broadcast query set — the same bounded class as
    * hopEdges' id collect), yet the walk loops used to pay THREE
    * actions per hop on it: the eager localCheckpoint, hopEdges'
    * id collect, and (converged forms) the anti-join emptiness probe —
    * each with its own analyzed/optimized plan. ONE collect now funds
    * all three: the rows become a LocalRelation for the next hop's
    * broadcast joins (doubles/longs round-trip the driver bit-exactly,
    * so every downstream value is unchanged), the hop's pushdown ids
    * derive from the rows, and convergence is a driver-side set
    * comparison (`next \ frontier = {}` == `pairs subsetOf prev` —
    * the identical test). Rows are sorted by the (qid, cid) key —
    * unique per row — so the LocalRelation is deterministic even
    * though collect order off a shuffle is not. At a fleet-sized
    * serving batch the frontier outgrows the driver exactly when it
    * outgrows hopEdges' literal list (HopPushdownMaxIds); the
    * checkpointed form (exactWalkFrontier's shape pre-r17) is the
    * documented escalation for that regime. */
  private final case class DriverFrontier(
      rows: Array[org.apache.spark.sql.Row],
      df: org.apache.spark.sql.DataFrame) {
    /** The (qid, cid) pair set — the convergence subject. */
    lazy val pairs: Set[(Long, Long)] =
      rows.iterator.map(r => (r.getLong(0), r.getLong(1))).toSet
    /** Distinct candidate ids — hopEdges' pushdown list. */
    lazy val ids: Seq[Long] = rows.iterator.map(_.getLong(1)).toSeq.distinct
  }

  private def materializeFrontier(s: SparkSession,
      df: org.apache.spark.sql.DataFrame): DriverFrontier = {
    val rows = df.collect().sortBy(r => (r.getLong(0), r.getLong(1)))
    DriverFrontier(rows,
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema))
  }

  /** hopEdges over a driver-materialized frontier: same two arms and
    * the same cap decision, with the id list taken from the rows
    * already on the driver instead of a second collect. */
  private def hopEdgesOf(edges: org.apache.spark.sql.DataFrame,
      f: DriverFrontier, maxPushIds: Int = HopPushdownMaxIds)
      : org.apache.spark.sql.DataFrame = {
    val scan =
      if (f.ids.size <= maxPushIds) edges.filter(col("src").isin(f.ids: _*))
      else edges // fleet-sized frontier: literal list would bloat the plan
    scan
      .join(broadcast(f.df.select(col("qid"), col("cid").as("src"))),
        Seq("src"))
      .select(col("qid"), col("dst").as("cid"))
  }

  /** DiskANN-style serving (v19, Subramanya et al. NeurIPS'19): the
    * v17 beam walk COMPASSED BY PQ/ADC scores instead of exact
    * cosines — candidates are scored from their stored 32-bit codes
    * against the query's lookup table (integer micro-unit sums, so
    * every beam cut ranks on exact integers), and full vectors are
    * touched ONLY for the final beam's exact re-rank. That is
    * DiskANN's memory economics: the walk reads codes (RAM-resident
    * at any corpus size), the exact pass reads queries x beam
    * vectors (the "disk" tier) once at the end. */
  private[graft] def graphAnnServeAdc(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2): org.apache.spark.sql.DataFrame = {
    val (edges, f0) = hubGraphAndEntry(s, d, degree, kCells, entries)
    adcWalkServe(s, d, edges, f0, beam, hops,
      Some(TrainedIndex.codes(s, d)))
  }

  /** v19's ADC beam walk over an EXPLICIT (edges, f0) pair.
    * `codesIn` is the stored 32-bit serving representation (cid,
    * c0..c<m-1>) — normally the persisted TrainedIndex.codes frame,
    * so the walk reads the code ARTIFACT, never the vector column;
    * None falls back to the map-side encode (codes are deterministic
    * ints, so both sources are bit-identical). Query LUTs always
    * compute at query time — queries are not stored. */
  private[graft] def adcWalkServe(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame, beam: Int, hops: Int,
      codesIn: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val frontier = adcWalkFrontier(s, d, edges, f0, beam, hops, codesIn)
    // the one full-vector touch: exact re-rank of the final beam
    exactRerankTop3(s, d, frontier.select(col("qid"), col("cid")))
  }

  /** The ADC walk's FINAL frontier (qid, cid, score) — factored out of
    * adcWalkServe so the code-compassed refined variant (v21) can
    * union it with the entry cells' members before its shortlist cut. */
  private[graft] def adcWalkFrontier(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame, beam: Int, hops: Int,
      codesIn: Option[org.apache.spark.sql.DataFrame] = None,
      qlutIn: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cb = TrainedIndex.codebook(s, d)
    val codes = codesIn.getOrElse(pqCorpus(e, cb))
    val qlut = qlutIn.getOrElse(queryLuts(s, d))
    def topB(sc: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerKey.topK(sc, Seq("qid"),
        Seq(col("score").desc, col("cid").asc), beam)
    var frontier = materializeFrontier(s, topB(scoredAdcOf(codes, qlut, f0)))
    for (_ <- 1 to hops) {
      val neigh = hopEdgesOf(edges, frontier)
      val cands = frontier.df.select(col("qid"), col("cid"))
        .union(neigh)
        .filter(col("cid") =!= col("qid"))
        .distinct()
      frontier = materializeFrontier(s, topB(scoredAdcOf(codes, qlut, cands)))
    }
    frontier.df
  }

  /** The ADC walk iterated TO FIXED POINT — exactWalkFrontierConverged
    * with the integer code compass (v22b's budget made data-derived
    * like v22's): hop until the frontier set stops changing, cap
    * [[WalkMaxHops]]. Integer scores are bit-exact on both engines,
    * so the per-hop sets — and therefore the stop — replay in SQL. */
  private[graft] def adcWalkFrontierConverged(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame, beam: Int,
      maxHops: Int = WalkMaxHops,
      codesIn: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val cb = TrainedIndex.codebook(s, d)
    val codes = codesIn.getOrElse(pqCorpus(e, cb))
    val qlut = queryLuts(s, d)
    def topB(sc: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerKey.topK(sc, Seq("qid"),
        Seq(col("score").desc, col("cid").asc), beam)
    var frontier = materializeFrontier(s, topB(scoredAdcOf(codes, qlut, f0)))
    var h = 0
    var converged = false
    while (h < maxHops && !converged) {
      val neigh = hopEdgesOf(edges, frontier)
      val cands = frontier.df.select(col("qid"), col("cid"))
        .union(neigh)
        .filter(col("cid") =!= col("qid"))
        .distinct()
      val next = materializeFrontier(s, topB(scoredAdcOf(codes, qlut, cands)))
      converged = next.pairs.subsetOf(frontier.pairs)
      frontier = next
      h += 1
    }
    frontier.df
  }

  /** The broadcast query set's integer ADC lookup tables (qid,
    * l0..l<m-1>) over the stored codebook — ONE construction shared
    * by the walk and the refined tail (the codebook rides the
    * expressions as literals, so duplicating the build used to pay
    * the analysis/codegen for the LUT columns twice per serve). */
  private def queryLuts(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val cb = TrainedIndex.codebook(s, d)
    Tables.embeddings(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid") +:
        (0 until PqM).map(i => pqLutCol(cb, i).as(s"l$i")): _*)
  }

  /** Integer ADC scoring of a (qid, cid) candidate frame from the
    * stored codes + query LUTs — the shared compass of the walk and
    * the v21 refined shortlist (candidates broadcast into the code
    * scan; no vector byte is read). */
  private def scoredAdcOf(codes: org.apache.spark.sql.DataFrame,
      qlut: org.apache.spark.sql.DataFrame,
      cands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    codes.join(broadcast(cands), Seq("cid"))
      .join(broadcast(qlut), Seq("qid"))
      .withColumn("score", pqScoreCol)
      .select(col("qid"), col("cid"), col("score"))

  /** Exact-cosine top-3 of a (qid, cid) candidate frame — the final
    * full-vector touch shared by the ADC serving paths. */
  private def exactRerankTop3(s: SparkSession, d: String,
      cands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val qn = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        sqrt(dot("embedding", "embedding")).as("nq"))
    val cn = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      sqrt(dot("embedding", "embedding")).as("nc"))
    val rr = cn.join(broadcast(cands), Seq("cid"))
      .join(broadcast(qn), Seq("qid"))
      .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
      .select(col("qid"), col("cid"), col("cos"))
    graft.plans.TopKPerKey.topK(rr, Seq("qid"),
      Seq(col("cos").desc, col("cid").asc), 3)
      .select(col("qid"), col("cid"))
  }

  /** v21's refined serving at DiskANN memory economics: v17d's
    * candidate-union recall lever (walk final beam ∪ the query's
    * `refine` nearest cells' members) with the union scored from the
    * stored 32-bit CODES — integer ADC, no vector byte — and only the
    * surviving `beam` shortlist re-ranked exactly. Where v17d's
    * refinement reads refine x n/k VECTORS per query (the exact-tier
    * price), v21 reads refine x n/k CODES (64x smaller — the RAM
    * tier) and queries x beam vectors once: the recall-above-plateau
    * lever at the memory budget that lets a billion-vector corpus
    * serve from RAM-resident codes. The ADC compass is lossy, so the
    * shortlist can drop true neighbors the exact tier keeps — the
    * measured recall gap to v17d is the price of the 64x, the same
    * tradeoff v19 gates against v17. */
  private[graft] def graphAnnServeAdcRefined(s: SparkSession, d: String,
      beam: Int, hops: Int, degree: Int = 8, kCells: Int = 8,
      entries: Int = 2, refine: Int = 2, shortlist: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    val r = if (shortlist > 0) shortlist else beam // IVFADC+R's R knob
    val (edges, f0) = hubGraphAndEntry(s, d, degree, kCells, entries)
    refinedAdcServe(s, d, edges, f0, beam, hops, kCells, refine, r)
  }

  /** The refined-ADC SERVE over an explicit (edges, f0) pair: ADC
    * walk to the final frontier, then the refined tail. ONE copy of
    * the wiring ABOVE refinedAdcTail (codes source, walk params,
    * centroid artifact) shared by v21/v21b (artifact-built graph via
    * graphAnnServeAdcRefined) and st19c (maintained graph) — an edit
    * to the frontier construction can no longer desynchronize the
    * refined gates while their shared tail stays green. */
  private[graft] def refinedAdcServe(s: SparkSession, d: String,
      edges: org.apache.spark.sql.DataFrame,
      f0: org.apache.spark.sql.DataFrame, beam: Int, hops: Int,
      kCells: Int, refine: Int, shortlist: Int)
      : org.apache.spark.sql.DataFrame = {
    val codes = TrainedIndex.codes(s, d)
    // one LUT build serves both the walk and the tail; the 20-row
    // frame is checkpointed so neither replays the codebook-literal
    // projection over the corpus scan
    val qlut = queryLuts(s, d).localCheckpoint(true)
    val frontier = adcWalkFrontier(s, d, edges, f0, beam, hops,
      Some(codes), Some(qlut))
    refinedAdcTail(s, d, frontier,
      TrainedIndex.centroids(s, d, k = kCells), refine, shortlist,
      codes, Some(qlut))
  }

  /** The refined-ADC serving tail — walk frontier ∪ the query's
    * `refine` nearest cells' members, the union ranked on INTEGER ADC
    * scores from the stored codes, the surviving `shortlist` re-ranked
    * exactly. ONE copy shared by v21/v21b (artifact-built graph) and
    * st19c (maintained graph) — the GameTeamAggSql convention: an edit
    * to the union, the integer compass, or the cut cannot
    * desynchronize the refined serving gates. */
  private[graft] def refinedAdcTail(s: SparkSession, d: String,
      frontier: org.apache.spark.sql.DataFrame,
      cent: Array[Array[Double]], refine: Int, shortlist: Int,
      codes: org.apache.spark.sql.DataFrame,
      qlutIn: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val cands = frontier.select(col("qid"), col("cid"))
      .union(cellCandidates(s, d, cent, refine))
      .distinct()
    val qlut = qlutIn.getOrElse(queryLuts(s, d))
    val sl = graft.plans.TopKPerKey.topK(
      scoredAdcOf(codes, qlut, cands), Seq("qid"),
      Seq(col("score").desc, col("cid").asc), shortlist)
    exactRerankTop3(s, d, sl.select(col("qid"), col("cid")))
  }

  /** The corpus-coupled shortlist rule (BENCH_SCALE r14: a FIXED R
    * keeps a shrinking fraction of a union that grows as
    * refine x n/kCells, so recall decays with corpus growth — at 10x,
    * R=128 reads 29/60 where R~union reads 42/60). This pins R at the
    * measured 20%-of-union knee (R=128 at the sf0.1 gate geometry,
    * refine=8, kCells=25, n=2000): R = ceil(refine*n / (5*kCells)),
    * exact integer ceil-division so the engine and the oracle cannot
    * round apart. Under the gated k~sqrt(n) rule the union is
    * O(sqrt n), so R — and the per-query vector reads it bounds — stays
    * O(sqrt n) too: the kept fraction, not the absolute count, is the
    * scale-invariant knob. */
  private[graft] def scaledShortlist(n: Long, refine: Int,
      kCells: Int): Int = {
    val den = 5L * kCells
    // toIntExact: a shortlist past Int.MaxValue (n ~ 3e10 at the gate
    // constants) means the serving tier is misconfigured — fail loudly
    // instead of wrapping negative and silently serving R=beam while
    // the oracle's BIGINT computes the true cut
    Math.toIntExact(((refine.toLong * n) + den - 1) / den)
  }

  /** The same rule as a DuckDB scalar subquery (n = corpus rows). */
  private[graft] def scaledShortlistSql(refine: Int, kCells: Int)
      : String = {
    val den = 5L * kCells
    s"SELECT ($refine*count(*) + ${den - 1}) // $den FROM embeddings"
  }

  /** Oracle CTEs for the PQ codebook build + encode (<p>longp …
    * <p>codes, <p>ck): per-subspace md5-seeded one-step-Lloyd
    * codebooks, corpus encode, and the query-side dot frame <p>d2
    * (restricted to qids it IS the ADC lookup table). The CTE names
    * are prefix-parameterized because v13 composes this chain with
    * KmeansSql.UpToCent2, whose CTE names (seeds0/seeds/sg/d1/a1/
    * sums/d2) it would otherwise collide with; v12/v12b use the
    * unprefixed form via PqAdcSql. */
  /** `CASE sub` arms of the base-k positional code packing. */
  private def pqCkWeightsSql: String =
    (0 until PqM).map(i =>
      s"WHEN $i THEN ${math.pow(PqK, PqM - 1 - i).toLong}").mkString(" ")

  /** Per-subspace ADC sum over micro-unit-quantized dots (matches the
    * engine's pqLutCol quantization term for term — the sum is exact
    * integer math, so term order is immaterial cross-engine). */
  private[queries] def pqAdcTermsSql(c: String, l: String): String =
    (0 until PqM).map(i =>
      s"sum(CASE WHEN $c.sub = $i THEN CAST(round($l.dot * 1000000) AS BIGINT) END)")
      .mkString("\n                       + ")

  /** The all-candidates integer ADC frame over the p-prefixed PQ
    * chain (qid < 20, self excluded) — the beam compass's oracle
    * scores, shared VERBATIM by the v19/v20/st19 gates so a fix to
    * the join keys or the query predicate can never desynchronize
    * the three "identical replay" oracles. */
  private[queries] def adcAllSql: String =
    s"""adcall AS (SELECT l.vec_id AS qid, pc.vec_id AS cid,
                          ${pqAdcTermsSql("pc", "l")} AS score
                   FROM pcodes pc
                   JOIN pd2 l ON l.sub = pc.sub AND l.code = pc.code
                   WHERE l.vec_id < 20 AND l.vec_id <> pc.vec_id
                   GROUP BY 1, 2)"""

  private[graft] def pqChainSql(p: String): String = s"""${p}longp AS (
                         SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                                unnest(range(len(embedding))) AS pos
                         FROM embeddings),
        ${p}subv AS (SELECT vec_id, CAST(pos // $PqSubDim AS INT) AS sub,
                        pos % $PqSubDim AS lpos, v
                 FROM ${p}longp),
        ${p}seeds0 AS (SELECT vec_id AS sid, embedding::DOUBLE[] AS se
                   FROM embeddings
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT $PqK),
        ${p}seeds AS (SELECT sid, se,
                         row_number() OVER (ORDER BY CAST(sid AS VARCHAR) ASC) - 1 AS code
                  FROM ${p}seeds0),
        ${p}sgl AS (SELECT code, unnest(se) AS sv, unnest(range(len(se))) AS pos
                FROM ${p}seeds),
        ${p}sg AS (SELECT code, CAST(pos // $PqSubDim AS INT) AS sub,
                      pos % $PqSubDim AS lpos, sv
               FROM ${p}sgl),
        ${p}sgn AS (SELECT sub, code, sum(sv * sv) / 2 AS hn
                FROM ${p}sg GROUP BY 1, 2),
        ${p}d1 AS (SELECT s.vec_id, g.sub, g.code, sum(s.v * g.sv) AS dot
               FROM ${p}subv s JOIN ${p}sg g ON s.sub = g.sub AND s.lpos = g.lpos
               GROUP BY 1, 2, 3),
        ${p}a1 AS (SELECT vec_id, sub, code FROM (
                 SELECT d.vec_id, d.sub, d.code,
                        row_number() OVER (PARTITION BY d.vec_id, d.sub
                          ORDER BY d.dot - n.hn DESC, d.code ASC) AS rn
                 FROM ${p}d1 d JOIN ${p}sgn n
                   ON d.sub = n.sub AND d.code = n.code) WHERE rn = 1),
        ${p}sums AS (SELECT a.sub, a.code, s.lpos, sum(s.v) AS sm, count(*) AS n
                 FROM ${p}subv s JOIN ${p}a1 a ON s.vec_id = a.vec_id AND s.sub = a.sub
                 GROUP BY 1, 2, 3),
        ${p}cb1 AS (SELECT g.sub, g.code, g.lpos, coalesce(m.sm / m.n, g.sv) AS cv
                FROM ${p}sg g LEFT JOIN ${p}sums m
                  ON g.sub = m.sub AND g.code = m.code AND g.lpos = m.lpos),
        ${p}cbn AS (SELECT sub, code, sum(cv * cv) / 2 AS hn
                FROM ${p}cb1 GROUP BY 1, 2),
        ${p}d2 AS (SELECT s.vec_id, c.sub, c.code, sum(s.v * c.cv) AS dot
               FROM ${p}subv s JOIN ${p}cb1 c ON s.sub = c.sub AND s.lpos = c.lpos
               GROUP BY 1, 2, 3),
        ${p}codes AS (SELECT vec_id, sub, code FROM (
                    SELECT d.vec_id, d.sub, d.code,
                           row_number() OVER (PARTITION BY d.vec_id, d.sub
                             ORDER BY d.dot - n.hn DESC, d.code ASC) AS rn
                    FROM ${p}d2 d JOIN ${p}cbn n
                      ON d.sub = n.sub AND d.code = n.code) WHERE rn = 1),
        ${p}ck AS (SELECT vec_id,
                      CAST(sum((CASE sub $pqCkWeightsSql
                                ELSE 1 END) * code) AS BIGINT) AS code_key
               FROM ${p}codes GROUP BY 1)"""

  /** pqChainSql plus the all-candidates fixed-order per-subspace ADC
    * score. Shared by the v12 gate and the v12b recall gate. */
  private val PqAdcSql = pqChainSql("") + s""",
        adc AS (SELECT l.vec_id AS qid, c.vec_id AS cid,
                       ${pqAdcTermsSql("c", "l")} AS score
                FROM codes c
                JOIN d2 l ON l.sub = c.sub AND l.code = c.code
                WHERE l.vec_id < 20 AND l.vec_id <> c.vec_id
                GROUP BY 1, 2)"""

  /** In-cell ADC scoring of the probed candidates (adc) — composes
    * after geoCellsSql (probes, a3) and pqChainSql("p") (pcodes,
    * pd2). Shared by the v13 gate and the st17 streamed-index gate. */
  private[graft] def ivfAdcCellSql: String = s"""
        adc AS (SELECT p.qid, g.g_cid AS cid,
                       ${pqAdcTermsSql("pc", "l")} AS score
                FROM probes p
                JOIN a3 g ON g.cell = p.cell AND g.g_cid <> p.qid
                JOIN pcodes pc ON pc.vec_id = g.g_cid
                JOIN pd2 l ON l.vec_id = p.qid AND l.sub = pc.sub
                          AND l.code = pc.code
                GROUP BY 1, 2)"""

  /** The +R stage (sl, rr): ADC top-`r` shortlist on the rounded
    * score, exact-cosine re-rank of the shortlist only. qT/cT name
    * CTEs exposing (qid, qe) / (cid, ce). Shared by v13 and st17. */
  private[graft] def ivfAdcRerankSql(r: Int, qT: String, cT: String)
      : String = s"""
        sl AS (SELECT qid, cid
               FROM (SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY score DESC, cid ASC) rn FROM adc)
               WHERE rn <= $r),
        rr AS (SELECT s.qid, s.cid,
                      list_dot_product($qT.qe, $cT.ce)
                      / (sqrt(list_dot_product($qT.qe, $qT.qe))
                         * sqrt(list_dot_product($cT.ce, $cT.ce))) AS cos
               FROM sl s JOIN $qT ON $qT.qid = s.qid
               JOIN $cT ON $cT.cid = s.cid)"""

  def defs: Seq[Q] = Seq(

    // ----- exact brute-force top-k --------------------------------------------
    Q(
      "v01_knn_bruteforce",
      "Brute-force cosine top-5 neighbors for a broadcast query set " +
        "(vec_id < 20): one corpus scan x |queries|, ranked per query " +
        "with a deterministic id tiebreak. The exact baseline every ANN " +
        "variant is measured against.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // norms ride the row (the v14/bruteTruth convention): same
        // doubles, one dot per pair instead of three
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            sqrt(dot("embedding", "embedding")).as("nq"))
        val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
          sqrt(dot("embedding", "embedding")).as("nc"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid").asc)
        c.join(broadcast(q), col("qid") =!= col("cid"))
          .withColumn("cos", dot("qe", "ce") / (col("nq") * col("nc")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("qid").as("query_id"), col("rank"),
            col("cid").as("neighbor_id"), round(col("cos"), 4).as("cosine"))
      },
      Some("""
        WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id cid, embedding::DOUBLE[] ce FROM embeddings),
        s AS (SELECT qid, cid, list_dot_product(qe, ce)
                     / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE qid <> cid)
        SELECT qid AS query_id, CAST(rn AS INT) AS rank, cid AS neighbor_id,
               round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM s)
        WHERE rn <= 5""")),

    // ----- IVF-style cluster-probed ANN ----------------------------------------
    Q(
      "v02_ivf_ann",
      "IVF-style ANN: per-label centroids (long-form avg over posexplode), " +
        "assign each query to its max-dot-product centroid, then search " +
        "only that cluster for cosine top-3. At 100 TB the corpus is " +
        "bucketed by cluster id, so a probe reads ~1/n_clusters of the " +
        "data.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val long = e.select(col("vec_id"), col("label"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("label"), col("pos"),
            col("col").cast("double").as("v"))
        val cent = long.groupBy(col("label").as("c_label"), col("pos"))
          .agg(avg(col("v")).as("cv"))
        val qlong = long.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("pos"), col("v").as("qv"))
        val assignW = Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("c_label").asc)
        val probe = qlong.join(cent, Seq("pos"))
          .groupBy(col("qid"), col("c_label"))
          .agg(sum(col("qv") * col("cv")).as("dot"))
          .withColumn("rn", row_number().over(assignW))
          .filter(col("rn") === 1)
          .select(col("qid"), col("c_label").as("probe_label"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = e.select(col("vec_id").as("cid"), col("label").as("c_lab"),
          col("embedding").as("ce"))
        val rankW = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid").asc)
        graft.plans.CosineSimilarity.register(s)
        c.join(broadcast(probe.join(q, Seq("qid"))),
            col("c_lab") === col("probe_label") && col("cid") =!= col("qid"))
          .withColumn("cos", expr("cosine_sim(qe, ce)"))
          .withColumn("rank", row_number().over(rankW))
          .filter(col("rank") <= 3)
          .select(col("qid").as("query_id"), col("probe_label"),
            col("rank"), col("cid").as("neighbor_id"),
            round(col("cos"), 4).as("cosine"))
      },
      Some("""
        WITH long AS (SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
                             unnest(range(len(embedding))) AS pos
                      FROM embeddings),
        cent AS (SELECT label AS c_label, pos, avg(v) AS cv
                 FROM long GROUP BY 1, 2),
        qlong AS (SELECT vec_id AS qid, pos, v AS qv FROM long WHERE vec_id < 20),
        assign AS (SELECT qid, c_label, sum(qv * cv) AS dot
                   FROM qlong JOIN cent USING (pos) GROUP BY 1, 2),
        probe AS (SELECT qid, c_label AS probe_label
                  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY dot DESC, c_label ASC) rn FROM assign)
                  WHERE rn = 1),
        q AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id cid, label c_lab, embedding::DOUBLE[] ce FROM embeddings),
        s AS (SELECT p.qid, p.probe_label, c.cid,
                     list_dot_product(q.qe, c.ce)
                     / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS cos
              FROM probe p JOIN q ON p.qid = q.qid
              JOIN c ON c.c_lab = p.probe_label AND c.cid <> p.qid)
        SELECT qid AS query_id, probe_label, CAST(rn AS INT) AS rank,
               cid AS neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM s)
        WHERE rn <= 3""")),

    // ----- ANN recall@k vs exact ground truth -----------------------------------
    Q(
      "v02b_ann_recall",
      "Recall@3 of the v02 IVF probe vs the exact brute-force top-3 - " +
        "the number a user actually tunes nprobe against (v02 " +
        "hash-matches a FIXED 1-probe result; this gate measures what " +
        "that probe setting costs in recall). Per query point: an " +
        "EXACT integer intersection count between the ANN neighbor " +
        "set and the ground-truth set (left-semi join on (qid, cid) - " +
        "no float thresholds anywhere in the comparison), plus the " +
        "truth-set size. MEASURED at the gate SF: recall@3 = 4/60 " +
        "(6.7%) at nprobe=1 - honestly poor, because v02's coarse " +
        "'clusters' are per-LABEL partitions, not geometric cells, so " +
        "the probed partition rarely holds true cosine neighbors; " +
        "v02c doubles the probes and v09 is the production fix " +
        "(geometric KMeans cells: 15/60 at the same nprobe=1). " +
        "nprobe=n_clusters degenerates to v01's exact scan. Scale: " +
        "both sides are top-3-per-query frames (query-set-sized), so " +
        "the recall join is broadcast-sized regardless of corpus size.",
      (s, d) => recallOf(bruteTruth(s, d), labelAnn(s, d, nprobe = 1)),
      Some(s"""
        WITH $TruthSql,
        ${labelAnnSql(nprobe = 1)},
        $RecallTailSql""")),

    // ----- multi-probe recall: the nprobe knob demonstrated ----------------------
    Q(
      "v02c_ann_recall_multiprobe",
      "v02b's recall gate at nprobe=2 - the tradeoff made concrete: " +
        "each query searches its TWO nearest centroids' partitions " +
        "(2x the scan of v02) and recall@3 rises with coverage " +
        "(measured at the gate SF: 4/60 -> 13/60 -> 22/60 -> 32/60 " +
        "at nprobe=1..4 - near-linear in partitions scanned, the " +
        "signature of label-partitioned cells with no geometric " +
        "locality; v09's KMeans cells hit 15/60 at nprobe=1). The " +
        "probe set is rn <= 2 of the same deterministic (dot desc, " +
        "label asc) centroid ranking; truth, ANN ranking and the " +
        "exact-intersection recall join are the shared gate " +
        "machinery (recallOf/labelAnn - one copy, v02b the other " +
        "caller).",
      (s, d) => recallOf(bruteTruth(s, d), labelAnn(s, d, nprobe = 2)),
      Some(s"""
        WITH $TruthSql,
        ${labelAnnSql(nprobe = 2)},
        $RecallTailSql""")),

    // ----- geometric IVF: KMeans cells as the coarse quantizer -------------------
    Q(
      "v09_ivf_geo_recall",
      "Geometric IVF recall@3 (the production fix v02b/v02c's measured " +
        "4/60-13/60 recall names): coarse cells are v05d's CONVERGED " +
        "KMeans centroids instead of label partitions, so a probe " +
        "searches the cell that is geometrically nearest the query. " +
        "Same exact integer-intersection recall gate as v02b. " +
        "MEASURED recall@3 at the gate SF (tools.IvfProbe, " +
        "reproducible), v09 KMeans cells vs v02b/c label cells at " +
        "equal nprobe:\n" +
        "    nprobe      1      2      3      4\n" +
        "    label       4/60  13/60  22/60  32/60\n" +
        "    kmeans     15/60  33/60  45/60  48/60\n" +
        "    ivfadc+r25 15/60  30/60  31/60  30/60\n" +
        "(ivfadc+r25 = v13's fused serving: ADC top-25 shortlist from " +
        "32-bit codes + exact re-rank — IDENTICAL to exact in-cell " +
        "scoring at nprobe=1, where 25 of ~62 candidates lose " +
        "nothing, and saturating near 30 beyond nprobe=2 because the " +
        "FIXED R=25 shortlist caps recall while the candidate pool " +
        "grows — the R~nprobe coupling a production config tunes.)\n" +
        "- 3.8x the recall at nprobe=1 and 80% by nprobe=4 (half the " +
        "cells scanned) where the label scheme is still under half; " +
        "the residual gap to 60/60 is the coarse build itself (k=8 " +
        "cells, the 2 bracketing-pinned Lloyd iterations of v05d - " +
        "recall rises with k and iterations, scan fraction is " +
        "nprobe/k either way). The oracle replays the " +
        "full 2-Lloyd-iteration centroid build (the v05c/v05d CTE " +
        "chain, KmeansSql.UpToCent2) plus assignment, probe and " +
        "recall in SQL - the hash matches only if the END-TO-END " +
        "index build + probe pipeline agrees cross-engine.",
      (s, d) => recallOf(bruteTruth(s, d), geoAnn(s, d, nprobe = 1)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $TruthSql,
        ${geoAnnSql(nprobe = 1)},
        $RecallTailSql""")),

    Q(
      "v09b_ivf_geo_recall_multiprobe",
      "v09 at nprobe=2 (33/60 measured vs v02c's 13/60 at the same " +
        "probe budget) - the recall/scan-fraction curve of a real IVF " +
        "index: with geometric cells the early probes buy the big " +
        "increments (15 -> 33 -> 45 -> 48, flattening) because the " +
        "nearest cells hold most true neighbors, where the label " +
        "scheme's near-linear curve showed its cells carried no " +
        "locality at all. Shares every stage with v09 " +
        "(geoAnn/recallOf + the KmeansSql oracle chain).",
      (s, d) => recallOf(bruteTruth(s, d), geoAnn(s, d, nprobe = 2)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $TruthSql,
        ${geoAnnSql(nprobe = 2)},
        $RecallTailSql""")),

    // ----- codegen'd Catalyst expression variant ---------------------------------
    Q(
      "v04_knn_codegen",
      "v01's brute-force top-5, but the cosine is the native Catalyst " +
        "expression graft.plans.CosineSimilarity (doGenCode single-pass " +
        "loop inside whole-stage codegen, registered via " +
        "SparkSessionExtensions / functionRegistry) instead of the " +
        "3-pass zip_with+aggregate composition. Same oracle as v01 — " +
        "identical numerics, different physical evaluation.",
      (s, d) => {
        graft.plans.CosineSimilarity.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid").asc)
        c.join(broadcast(q), col("qid") =!= col("cid"))
          .withColumn("cos", expr("cosine_sim(qe, ce)"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("qid").as("query_id"), col("rank"),
            col("cid").as("neighbor_id"), round(col("cos"), 4).as("cosine"))
      },
      Some("""
        WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id cid, embedding::DOUBLE[] ce FROM embeddings),
        s AS (SELECT qid, cid, list_dot_product(qe, ce)
                     / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE qid <> cid)
        SELECT qid AS query_id, CAST(rn AS INT) AS rank, cid AS neighbor_id,
               round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM s)
        WHERE rn <= 5""")),

    // ----- IVF index build (k-means) ---------------------------------------------
    Q(
      "v05_kmeans_build",
      "IVF index BUILD: deterministic Lloyd's k-means " +
        "(graft.operators.KMeans - driver-held centroids, one " +
        "distributed assignment + partial-sum pass per iteration) over " +
        "the embeddings; output = per-cluster occupancy stats, the " +
        "index metadata an IVF probe consumes. HASH-GATED since r10: " +
        "fit(iterations=2) returns exactly the second-iteration " +
        "assignment that v05c's SQL replay reproduces (a2 in the " +
        "shared KmeansSql chain), so the occupancy rollup is " +
        "SQL-expressible and the long-standing rows-only carve-out " +
        "closes - only unbounded-iteration production runs stay " +
        "procedural (and v05d gates the convergence test itself).",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val (assign, _) = graft.operators.KMeans.fit(s, e, k = 8, iterations = 2)
        assign.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_vectors"),
            min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
          .orderBy(col("cluster"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2}
        SELECT CAST(cluster AS INT) AS cluster,
               count(*) AS n_vectors,
               min(vec_id) AS min_vec, max(vec_id) AS max_vec
        FROM a2 GROUP BY 1""")),

    // ----- hyperplane-LSH near-dup pairs ----------------------------------------
    Q(
      "v03_cosine_neardup",
      "Embedding near-dup pairing via 8-bit random-hyperplane LSH: " +
        "deterministic +/-1 planes from md5(j:pos), sign-bit signatures, " +
        "equal-code bucket join, exact cosine >= 0.2 on candidates only. " +
        "Pair volume is bounded by bucket occupancy, never a dense n². " +
        "8 bits = 256 buckets is sized for the test corpus; a FIXED " +
        "width still grows pairs as n²/2^bits (measured 20.7x at 10x " +
        "data) — v03b is the widened scale path.",
      (s, d) => neardupLsh(s, d, bits = 8),
      Some(neardupLshSql(bits = 8))),

    Q(
      "v03b_cosine_neardup_wide",
      "The v03 hyperplane LSH at 16-bit code width — the scale path: " +
        "bucket count must track corpus size (bits ~ log2(n) + c) to " +
        "keep per-bucket occupancy, and therefore candidate-pair " +
        "volume, CONSTANT per vector. Same deterministic planes, same " +
        "exact-cosine verify, hash-matched against the same oracle " +
        "shape; at 10x data this variant scales linearly where the " +
        "fixed-width form went quadratic.",
      (s, d) => neardupLsh(s, d, bits = 16),
      Some(neardupLshSql(bits = 16))),

    // ----- int8 embedding quantization ------------------------------------------
    Q(
      "v06_quantize_int8",
      "Symmetric int8 embedding quantization (the storage/serving " +
        "compression step: 4x smaller vectors for ANN shortlists): " +
        "per-vector absmax scale, q = clamp(floor(x/scale + 0.5), " +
        "-127, 127), plus reconstruction MSE. floor(x+0.5) instead of " +
        "round() because both engines compute floor identically while " +
        "round() half-handling differs; all math in DOUBLE lambdas — " +
        "codegen'd higher-order array functions, zero shuffle, " +
        "embarrassingly parallel at any corpus size.",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
          .select(col("vec_id"), col("e"),
            expr("greatest(array_max(transform(e, x -> abs(x))), 1e-30d) / 127.0d")
              .as("scale"))
          .select(col("vec_id"), col("e"), col("scale"),
            expr("transform(e, x -> CAST(least(greatest(floor(x / scale + 0.5d), " +
              "-127.0d), 127.0d) AS BIGINT))").as("q"))
          .select(
            col("vec_id"),
            round(col("scale"), 8).as("scale_r"),
            expr("aggregate(q, 0L, (acc, v) -> acc + v)").as("q_sum"),
            expr("aggregate(q, 0L, (acc, v) -> acc + abs(v))").as("q_l1"),
            md5(expr("array_join(transform(q, v -> CAST(v AS STRING)), ',')"))
              .as("q_md5"),
            round(
              expr("aggregate(zip_with(e, q, (x, v) -> pow(x - v * scale, 2.0d)), " +
                "CAST(0 AS DOUBLE), (acc, v) -> acc + v) / size(e)"), 10)
              .as("recon_mse"))
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        sc AS (SELECT vec_id, e,
                      greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127.0 AS scale
               FROM e),
        q AS (SELECT vec_id, e, scale,
                     list_transform(e, x ->
                       CAST(least(greatest(floor(x / scale + 0.5), -127.0), 127.0) AS BIGINT)) AS q
              FROM sc)
        SELECT vec_id,
               round(scale, 8) AS scale_r,
               CAST(list_sum(q) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_l1,
               md5(array_to_string(q, ',')) AS q_md5,
               round(list_sum(list_transform(range(len(e)), i ->
                       pow(e[i + 1] - q[i + 1] * scale, 2.0))) / len(e), 10) AS recon_mse
        FROM q""")),

    // ----- SemDeDup-style semantic dedup ----------------------------------------
    Q(
      "v07_semantic_dedup",
      "SemDeDup-style semantic dedup (cluster-then-compare, Abbas et " +
        "al. 2023): assign every embedding to its nearest seed centroid " +
        "(the same deterministic md5 seeds as v05b), compare pairs ONLY " +
        "within a cluster, and drop the higher vec_id of any pair with " +
        "cosine >= 0.2 — per-cluster keep/drop stats out. The cluster " +
        "bounds the quadratic: pair volume is the sum of per-cluster " +
        "m², never corpus n², and k GROWS with n at scale — the " +
        "paper's k ~ sqrt(n) balances the n*k assignment term against " +
        "the n²/k pair term (tools.SemDedupKAb measures it: at 10x " +
        "data, fixed k=8 pays ~100x the pair volume, sqrt-scaled k=25 " +
        "cuts that 3.1x and halves the pair-stage wall time — " +
        "BENCH_SCALE). Seeds are broadcast; the pair join shuffles " +
        "on cluster id only.",
      (s, d) => {
        val asg = semDedupAsg(s, d, k = 8)
        val dropped = semDedupDropped(s, asg)
          .groupBy(col("cluster_seed")).agg(count(lit(1)).as("n_dropped"))
        // first_kept == min(vec_id): the cluster min has no smaller
        // in-cluster partner, so it can never appear as a dropped b_id.
        // Rolling totals and drop counts up separately (two 8-row
        // aggregates joined at the end) replaces a corpus-wide outer
        // join, and both rollups group on the repartition key so they
        // reuse the cluster exchange with no further shuffle.
        val totals = asg.groupBy(col("cluster_seed"))
          .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_kept"))
        totals.join(dropped, Seq("cluster_seed"), "left")
          .select(col("cluster_seed"), col("n_vecs"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"), col("first_kept"))
      },
      Some("""
        WITH seeds AS (
          SELECT vec_id AS sid, embedding::DOUBLE[] AS se
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 8),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
        sd AS (SELECT vec_id, sid, list_dot_product(se, ce) AS dot FROM c, seeds),
        asg AS (SELECT vec_id, sid AS cluster_seed
                FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dot DESC, sid ASC) rn FROM sd) WHERE rn = 1),
        pairs AS (
          SELECT b.vec_id AS b_id
          FROM asg a JOIN asg b ON a.cluster_seed = b.cluster_seed
                                AND a.vec_id < b.vec_id
          JOIN c ca ON ca.vec_id = a.vec_id
          JOIN c cb ON cb.vec_id = b.vec_id
          WHERE list_dot_product(ca.ce, cb.ce)
                / (sqrt(list_dot_product(ca.ce, ca.ce))
                   * sqrt(list_dot_product(cb.ce, cb.ce))) >= 0.2),
        dup AS (SELECT DISTINCT b_id FROM pairs)
        SELECT g.cluster_seed, count(*) AS n_vecs,
               CAST(sum(CASE WHEN dup.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               min(CASE WHEN dup.b_id IS NULL THEN g.vec_id END) AS first_kept
        FROM asg g LEFT JOIN dup ON dup.b_id = g.vec_id
        GROUP BY 1""")),

    // ----- SemDeDup on geometric cells (the paper's actual design) ---------------
    Q(
      "v07b_semantic_dedup_geo",
      "SemDeDup with the clustering the paper actually prescribes " +
        "(Abbas et al. 2023 run k-means and compare within clusters; " +
        "v07 approximated the clusters with md5-seed assignment): " +
        "every embedding lands in its v05d converged-KMeans cell via " +
        "the map-side centroid-literal argmax (the v09 shape - no " +
        "shuffle to build the clustering), pairs compare ONLY within " +
        "a cell, and the higher vec_id of any pair with cosine >= 0.2 " +
        "drops. Per-cell keep/drop stats out. Same quadratic-bounding " +
        "scale story as v07 (pair volume = sum of per-cell m^2; k " +
        "grows ~sqrt(n), the assignment-vs-pair-cost balance point - " +
        "measured in tools.SemDedupKAb / BENCH_SCALE), now with cells " +
        "that are geometrically real: " +
        "near-dups actually co-locate, so the within-cell compare " +
        "FINDS them instead of missing cross-seed pairs. Oracle " +
        "replays centroid build + assignment + pair compare + drop.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cent = TrainedIndex.centroids(s, d, k = 8)
        val asg = e.select(col("vec_id"), col("embedding").as("ce"))
          .filter(col("vec_id").isNotNull)
          .withColumn("cell",
            -element_at(nearestCells(cent, "ce", 1), 1).getField("nc"))
          // the cell exchange is the AQE reuse point for the three
          // consumers (both pair-join sides + the rollup), exactly as
          // in v07 - without it the per-row assignment would recompute
          .repartition(col("cell"))
        val a = asg.select(col("cell"), col("vec_id").as("a_id"), col("ce").as("ae"))
        val b = asg.select(col("cell"), col("vec_id").as("b_id"), col("ce").as("be"))
        graft.plans.CosineSimilarity.register(s)
        val dropped = a.join(b, Seq("cell"))
          .filter(col("a_id") < col("b_id"))
          .filter(expr("cosine_sim(ae, be)") >= 0.2)
          .select(col("cell"), col("b_id")).distinct()
          .groupBy(col("cell")).agg(count(lit(1)).as("n_dropped"))
        val totals = asg.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_kept"))
        totals.join(dropped, Seq("cell"), "left")
          .select(col("cell"), col("n_vecs"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            col("first_kept"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        d3g AS (SELECT l.vec_id, c2.cluster, sum(l.v * c2.cv) AS dot
                FROM long l JOIN cent2 c2 USING (pos) GROUP BY 1, 2),
        a3 AS (SELECT vec_id, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g) WHERE rn = 1),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
        pairs AS (
          SELECT g.cell, b.vec_id AS b_id
          FROM a3 g JOIN a3 b ON g.cell = b.cell AND g.vec_id < b.vec_id
          JOIN c ca ON ca.vec_id = g.vec_id
          JOIN c cb ON cb.vec_id = b.vec_id
          WHERE list_dot_product(ca.ce, cb.ce)
                / (sqrt(list_dot_product(ca.ce, ca.ce))
                   * sqrt(list_dot_product(cb.ce, cb.ce))) >= 0.2),
        dup AS (SELECT DISTINCT cell, b_id FROM pairs)
        SELECT g.cell, count(*) AS n_vecs,
               CAST(sum(CASE WHEN dup.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               min(g.vec_id) AS first_kept
        FROM a3 g LEFT JOIN dup ON dup.cell = g.cell AND dup.b_id = g.vec_id
        GROUP BY 1""")),

    // ----- IVF + int8 quantized scoring (the IVF-PQ serving shape) --------------
    Q(
      "v08_ivf_pq",
      "IVF probe with int8 quantized scoring (the IVF-PQ serving " +
        "pattern, scalar-quantization flavor: coarse centroids route " +
        "the query, candidates are scored on 4x-compressed codes): " +
        "v02's float centroid probe picks the cluster, then candidates " +
        "rank by the QUANTIZED inner product idot(qa,qb) * scale_a * " +
        "scale_b using v06's symmetric int8 codes. The integer dot is " +
        "exact in both engines (no float summation order), so scores " +
        "are bit-identical cross-engine; at scale the scored payload " +
        "is a quarter of the float corpus and the probe reads " +
        "~1/n_clusters of it.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // v06's quantization: per-vector absmax scale, q in [-127, 127]
        val quant = e.select(col("vec_id"), col("label"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("de"))
          .select(col("vec_id"), col("label"),
            expr("greatest(array_max(transform(de, x -> abs(x))), 1e-30d) / 127.0d")
              .as("scale"),
            col("de"))
          .select(col("vec_id"), col("label"), col("scale"),
            expr("transform(de, x -> CAST(least(greatest(floor(x / scale + 0.5d), " +
              "-127.0d), 127.0d) AS BIGINT))").as("q"))
        // v02's float coarse probe: per-label centroids, argmax by dot
        val long = e.select(col("vec_id"), col("label"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("label"), col("pos"),
            col("col").cast("double").as("v"))
        val cent = long.groupBy(col("label").as("c_label"), col("pos"))
          .agg(avg(col("v")).as("cv"))
        val qlong = long.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("pos"), col("v").as("qv"))
        val assignW = Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("c_label").asc)
        val probe = qlong.join(cent, Seq("pos"))
          .groupBy(col("qid"), col("c_label"))
          .agg(sum(col("qv") * col("cv")).as("dot"))
          .withColumn("rn", row_number().over(assignW))
          .filter(col("rn") === 1)
          .select(col("qid"), col("c_label").as("probe_label"))
        val qq = quant.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("scale").as("q_scale"),
            col("q").as("qa"))
        val cq = quant.select(col("vec_id").as("cid"), col("label").as("c_lab"),
          col("scale").as("c_scale"), col("q").as("qb"))
        val rankW = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("cid").asc)
        cq.join(broadcast(probe.join(qq, Seq("qid"))),
            col("c_lab") === col("probe_label") && col("cid") =!= col("qid"))
          .withColumn("idot",
            expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
          .withColumn("score", col("idot") * col("q_scale") * col("c_scale"))
          .withColumn("rank", row_number().over(rankW))
          .filter(col("rank") <= 3)
          .select(col("qid").as("query_id"), col("probe_label"), col("rank"),
            col("cid").as("neighbor_id"), col("idot"),
            round(col("score"), 6).as("approx_ip"))
      },
      Some(s"""
        WITH $QuantSql,
        long AS (SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
                        unnest(range(len(embedding))) AS pos
                 FROM embeddings),
        cent AS (SELECT label AS c_label, pos, avg(v) AS cv
                 FROM long GROUP BY 1, 2),
        qlong AS (SELECT vec_id AS qid, pos, v AS qv FROM long WHERE vec_id < 20),
        assign AS (SELECT qid, c_label, sum(qv * cv) AS dot
                   FROM qlong JOIN cent USING (pos) GROUP BY 1, 2),
        probe AS (SELECT qid, c_label AS probe_label
                  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY dot DESC, c_label ASC) rn FROM assign)
                  WHERE rn = 1),
        qq AS (SELECT vec_id AS qid, scale AS q_scale, q AS qa
               FROM quant WHERE vec_id < 20),
        cq AS (SELECT vec_id AS cid, label AS c_lab, scale AS c_scale, q AS qb
               FROM quant),
        cand AS (SELECT p.qid, p.probe_label, c.cid,
                        CAST(list_sum(list_transform(range(len(q.qa)), i ->
                          q.qa[i + 1] * c.qb[i + 1])) AS BIGINT) AS idot,
                        q.q_scale, c.c_scale
                 FROM probe p JOIN qq q ON p.qid = q.qid
                 JOIN cq c ON c.c_lab = p.probe_label AND c.cid <> p.qid),
        scored AS (SELECT qid, probe_label, cid, idot,
                          idot * q_scale * c_scale AS score
                   FROM cand)
        SELECT qid AS query_id, probe_label, CAST(rn AS INT) AS rank,
               cid AS neighbor_id, idot, round(score, 6) AS approx_ip
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, cid ASC) rn FROM scored)
        WHERE rn <= 3""")),

    // ----- IVF-PQ serving on GEOMETRIC cells (both production fixes composed) ----
    Q(
      "v08b_ivf_pq_geo",
      "The production ANN serving shape with BOTH fixes composed: " +
        "v08's int8 quantized scoring routed by v09's geometric KMeans " +
        "cells instead of label partitions. Everything before the " +
        "final per-query rank is MAP-SIDE per-row expression work - " +
        "cell assignment (centroid-literal argmax, the v09 PlanSpec " +
        "shape), absmax scale and int8 codes (v06) - so the corpus " +
        "never shuffles and the candidate payload is the 4x-compressed " +
        "codes; the integer dot is exact in both engines, making " +
        "scores bit-identical cross-engine. The oracle replays the " +
        "whole thing: 2-Lloyd-iteration centroid build (KmeansSql), " +
        "quantization (QuantSql), assignment, probe, quantized " +
        "scoring.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cent = TrainedIndex.centroids(s, d, k = 8)
        def quantized(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("de", expr("transform(__v, x -> CAST(x AS DOUBLE))"))
          .withColumn("__scale",
            expr("greatest(array_max(transform(de, x -> abs(x))), 1e-30d) / 127.0d"))
          .withColumn("__q", expr(
            "transform(de, x -> CAST(least(greatest(floor(x / __scale + 0.5d), " +
              "-127.0d), 127.0d) AS BIGINT))"))
        val corpus = quantized(
          e.select(col("vec_id").as("cid"), col("embedding").as("__v"))
            .filter(col("cid").isNotNull)
            .withColumn("cell",
              -element_at(nearestCells(cent, "__v", 1), 1).getField("nc")))
          .select(col("cid"), col("cell"),
            col("__scale").as("c_scale"), col("__q").as("qb"))
        val probes = quantized(
          e.filter(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("embedding").as("__v"))
            .withColumn("pc", explode(nearestCells(cent, "__v", 1)))
            .withColumn("cell", -col("pc.nc")))
          .select(col("qid"), col("cell"),
            col("__scale").as("q_scale"), col("__q").as("qa"))
        val rankW = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("cid").asc)
        corpus.join(broadcast(probes), Seq("cell"))
          .filter(col("cid") =!= col("qid"))
          .withColumn("idot",
            expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
          .withColumn("score", col("idot") * col("q_scale") * col("c_scale"))
          .withColumn("rank", row_number().over(rankW))
          .filter(col("rank") <= 3)
          .select(col("qid").as("query_id"), col("cell"), col("rank"),
            col("cid").as("neighbor_id"), col("idot"),
            round(col("score"), 6).as("approx_ip"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $QuantSql,
        d3g AS (SELECT l.vec_id, c2.cluster, sum(l.v * c2.cv) AS dot
                FROM long l JOIN cent2 c2 USING (pos) GROUP BY 1, 2),
        a3 AS (SELECT vec_id, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g) WHERE rn = 1),
        probes AS (SELECT vec_id AS qid, cluster AS cell FROM (
                 SELECT vec_id, cluster,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY dot DESC, cluster ASC) AS rn
                 FROM d3g WHERE vec_id < 20) WHERE rn <= 1),
        cand AS (SELECT p.qid, p.cell, a.vec_id AS cid,
                        CAST(list_sum(list_transform(range(len(qq.q)), i ->
                          qq.q[i + 1] * cq.q[i + 1])) AS BIGINT) AS idot,
                        qq.scale AS q_scale, cq.scale AS c_scale
                 FROM probes p
                 JOIN a3 a ON a.cell = p.cell AND a.vec_id <> p.qid
                 JOIN quant qq ON qq.vec_id = p.qid
                 JOIN quant cq ON cq.vec_id = a.vec_id),
        scored AS (SELECT qid, cell, cid, idot,
                          idot * q_scale * c_scale AS score
                   FROM cand)
        SELECT qid AS query_id, cell, CAST(rn AS INT) AS rank,
               cid AS neighbor_id, idot, round(score, 6) AS approx_ip
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, cid ASC) rn FROM scored)
        WHERE rn <= 3""")),

    // ----- hybrid retrieval: reciprocal-rank fusion ------------------------------
    Q(
      "v10_rrf_hybrid",
      "Hybrid retrieval with reciprocal-rank fusion (the standard " +
        "RAG-stack combiner, Cormack et al. SIGIR'09): the lexical arm " +
        "is t24's BM25 top-20 (the shared bm25Top20/Bm25Sql recipe - " +
        "one copy), the vector arm is cosine top-20 to a fixed query " +
        "embedding (vec_id 0, the engine-neutral stand-in for an " +
        "encoded query string), and the fused score is RRF_60: the sum " +
        "of 1/(60+rank) over the arms a doc appears in. Determinism: " +
        "ranks are integers from the arms' (score desc, id asc) " +
        "row_number convention, each RRF term is ONE correctly-rounded " +
        "division and the two-term sum evaluates in fixed expression " +
        "order - bit-identical cross-engine, so ordering on the raw " +
        "double is safe; 6dp round on output only. Absent ranks " +
        "surface as 0 (never in 1..20, unambiguous). Scale: each arm " +
        "is top-k-bounded BEFORE fusion (TakeOrderedAndProject, never " +
        "a global sort of the corpus), so the full-outer fuse joins " +
        "two <=20-row frames - trivial at any corpus size; the rank " +
        "windows run on post-LIMIT frames (bounded by k, not data - " +
        "the documented PlanSpec exemption).",
      (s, d) => {
        val lexW = Window.orderBy(col("bm25").desc, col("doc_id").asc)
        val lex = TextOps.bm25Top20(s, d)
          .withColumn("lex_rank", row_number().over(lexW))
          .select(col("doc_id"), col("lex_rank"))
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val vecW = Window.orderBy(col("cos").desc, col("doc_id").asc)
        val vec = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("doc_id"), col("embedding").as("ce"))
          .crossJoin(broadcast(q))
          .withColumn("cos", cosine("qe", "ce"))
          .orderBy(col("cos").desc, col("doc_id").asc).limit(20)
          .withColumn("vec_rank", row_number().over(vecW))
          .select(col("doc_id"), col("vec_rank"))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
            (coalesce(lit(1.0) / (col("lex_rank") + 60), lit(0.0)) +
              coalesce(lit(1.0) / (col("vec_rank") + 60), lit(0.0))).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id").asc)
          .limit(10)
          .select(col("doc_id"),
            coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
            coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
            round(col("rrf"), 6).as("rrf_score"))
      },
      Some(s"""
        WITH ${TextOps.Bm25Sql},
        lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS lex_rank
                FROM (SELECT doc_id, bm25 FROM bm25_scored
                      ORDER BY bm25 DESC, doc_id ASC LIMIT 20)),
        vq AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        vc AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id <> 0),
        vs AS (SELECT doc_id, list_dot_product(qe, ce)
                      / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
               FROM vc, vq),
        vec AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS vec_rank
                FROM (SELECT doc_id, cos FROM vs
                      ORDER BY cos DESC, doc_id ASC LIMIT 20)),
        fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                         l.lex_rank, v.vec_rank,
                         coalesce(CAST(1.0 AS DOUBLE) / (l.lex_rank + 60), 0.0)
                           + coalesce(CAST(1.0 AS DOUBLE) / (v.vec_rank + 60), 0.0) AS rrf
                  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
        SELECT doc_id, coalesce(lex_rank, 0) AS lex_rank,
               coalesce(vec_rank, 0) AS vec_rank,
               round(rrf, 6) AS rrf_score
        FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10""")),

    // ----- MMR diversified selection ---------------------------------------------
    Q(
      "v11_mmr_diversify",
      "Maximal-marginal-relevance re-ranking (Carbonell & Goldstein " +
        "SIGIR'98 - the diversity pass a RAG stack runs after " +
        "retrieval): from the cosine top-10 for the fixed query " +
        "(vec_id 0), greedily pick 5 docs maximizing 0.7*rel - " +
        "0.3*max(sim to already-picked). The greedy is inherently " +
        "sequential but k-BOUNDED: the distributed part is the corpus " +
        "top-10 scan (TakeOrderedAndProject) and the 10x10 pairwise " +
        "cosines (broadcast self-join of a post-LIMIT frame); the " +
        "collect is <=10+45 rows REGARDLESS of corpus size (the " +
        "sanctioned bounded class - BacktestReport precedent), so the " +
        "driver loop costs O(k^2) doubles at 100 TB exactly as here. " +
        "Determinism: rel/sim doubles are bit-identical cross-engine " +
        "(the v01/v04 precedent), the MMR score is two multiplies and " +
        "a subtract in fixed order with EXPLICIT 0.7/0.3 double " +
        "literals (never 1-lambda, whose rounding differs from the " +
        "0.3 literal), argmax ties break on doc_id, and the oracle " +
        "unrolls the same 5 greedy stages in SQL.",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val cand = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
          .crossJoin(broadcast(q))
          .withColumn("rel", cosine("qe", "ce"))
          .orderBy(col("rel").desc, col("cid").asc).limit(10)
          .select(col("cid"), col("rel"), col("ce"))
          .localCheckpoint(true) // 10 rows; feeds sims twice + collect
        val a = cand.select(col("cid").as("a_id"), col("ce").as("ae"))
        val b = cand.select(col("cid").as("b_id"), col("ce").as("be"))
        val sims = a.join(broadcast(b), col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), cosine("ae", "be").as("sim"))
        val rels = cand.select(col("cid"), col("rel")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1))
        val simMap = sims.collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        def simOf(x: Long, y: Long): Double =
          if (x < y) simMap((x, y)) else simMap((y, x))
        var picked = Vector.empty[(Long, Double)]
        var remaining = rels.toVector
        while (picked.size < 5 && remaining.nonEmpty) {
          val scored = remaining.map { case (id, rel) =>
            val pen =
              if (picked.isEmpty) 0.0
              else picked.map(p => simOf(id, p._1)).max
            (id, 0.7 * rel - 0.3 * pen)
          }
          val best = scored.minBy { case (id, sc) => (-sc, id) }
          picked :+= best
          remaining = remaining.filterNot(_._1 == best._1)
        }
        import s.implicits._
        // raw doubles back through Spark's round() — the same rounding
        // convention every other gate pairs with DuckDB's round()
        picked.zipWithIndex.map { case ((id, sc), i) => (i + 1, id, sc) }
          .toDF("pick", "doc_id", "mmr")
          .select(col("pick"), col("doc_id"),
            round(col("mmr"), 6).as("mmr_score"))
      },
      Some("""
        WITH vq AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        vc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id <> 0),
        cand0 AS (SELECT cid, ce, list_dot_product(qe, ce)
                       / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS rel
                  FROM vc, vq),
        cand AS (SELECT cid, ce, rel FROM cand0
                 ORDER BY rel DESC, cid ASC LIMIT 10),
        sims AS (SELECT a.cid AS a_id, b.cid AS b_id,
                        list_dot_product(a.ce, b.ce)
                        / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) AS sim
                 FROM cand a JOIN cand b ON a.cid < b.cid),
        p1 AS (SELECT cid, CAST(0.7 AS DOUBLE) * rel AS mmr FROM cand
               ORDER BY mmr DESC, cid ASC LIMIT 1),
        picked1 AS (SELECT cid FROM p1),
        rem1 AS (SELECT c.cid, c.rel FROM cand c
                 WHERE c.cid NOT IN (SELECT cid FROM picked1)),
        pen2 AS (SELECT r.cid, r.rel, max(s.sim) AS pen
                 FROM rem1 r CROSS JOIN picked1 p
                 JOIN sims s ON s.a_id = least(r.cid, p.cid)
                           AND s.b_id = greatest(r.cid, p.cid)
                 GROUP BY 1, 2),
        p2 AS (SELECT cid, CAST(0.7 AS DOUBLE) * rel
                           - CAST(0.3 AS DOUBLE) * pen AS mmr
               FROM pen2 ORDER BY mmr DESC, cid ASC LIMIT 1),
        picked2 AS (SELECT cid FROM p1 UNION ALL SELECT cid FROM p2),
        rem2 AS (SELECT c.cid, c.rel FROM cand c
                 WHERE c.cid NOT IN (SELECT cid FROM picked2)),
        pen3 AS (SELECT r.cid, r.rel, max(s.sim) AS pen
                 FROM rem2 r CROSS JOIN picked2 p
                 JOIN sims s ON s.a_id = least(r.cid, p.cid)
                           AND s.b_id = greatest(r.cid, p.cid)
                 GROUP BY 1, 2),
        p3 AS (SELECT cid, CAST(0.7 AS DOUBLE) * rel
                           - CAST(0.3 AS DOUBLE) * pen AS mmr
               FROM pen3 ORDER BY mmr DESC, cid ASC LIMIT 1),
        picked3 AS (SELECT cid FROM picked2 UNION ALL SELECT cid FROM p3),
        rem3 AS (SELECT c.cid, c.rel FROM cand c
                 WHERE c.cid NOT IN (SELECT cid FROM picked3)),
        pen4 AS (SELECT r.cid, r.rel, max(s.sim) AS pen
                 FROM rem3 r CROSS JOIN picked3 p
                 JOIN sims s ON s.a_id = least(r.cid, p.cid)
                           AND s.b_id = greatest(r.cid, p.cid)
                 GROUP BY 1, 2),
        p4 AS (SELECT cid, CAST(0.7 AS DOUBLE) * rel
                           - CAST(0.3 AS DOUBLE) * pen AS mmr
               FROM pen4 ORDER BY mmr DESC, cid ASC LIMIT 1),
        picked4 AS (SELECT cid FROM picked3 UNION ALL SELECT cid FROM p4),
        rem4 AS (SELECT c.cid, c.rel FROM cand c
                 WHERE c.cid NOT IN (SELECT cid FROM picked4)),
        pen5 AS (SELECT r.cid, r.rel, max(s.sim) AS pen
                 FROM rem4 r CROSS JOIN picked4 p
                 JOIN sims s ON s.a_id = least(r.cid, p.cid)
                           AND s.b_id = greatest(r.cid, p.cid)
                 GROUP BY 1, 2),
        p5 AS (SELECT cid, CAST(0.7 AS DOUBLE) * rel
                           - CAST(0.3 AS DOUBLE) * pen AS mmr
               FROM pen5 ORDER BY mmr DESC, cid ASC LIMIT 1)
        SELECT CAST(1 AS INT) AS pick, cid AS doc_id, round(mmr, 6) AS mmr_score FROM p1
        UNION ALL SELECT 2, cid, round(mmr, 6) FROM p2
        UNION ALL SELECT 3, cid, round(mmr, 6) FROM p3
        UNION ALL SELECT 4, cid, round(mmr, 6) FROM p4
        UNION ALL SELECT 5, cid, round(mmr, 6) FROM p5""")),

    // ----- true product quantization + ADC serving -------------------------------
    Q(
      "v12_pq_adc",
      "TRUE product quantization with asymmetric distance computation " +
        "(Jegou et al. TPAMI'11 - the codebook form v08's scalar " +
        "quantization approximates): the 64-dim space splits into m=8 " +
        "subspaces of 8 dims, each with its own k=16 codeword " +
        "codebook (deterministic md5 seeds + one Lloyd update, the " +
        "v05b recipe per subspace), a vector encodes as 8 codes by " +
        "EUCLIDEAN assignment (argmax of dot - ||c||^2/2, the " +
        "half-norm bias that makes max-key equal argmin ||x-c||^2 - " +
        "max-dot assignment is wrong for subvectors, whose norms " +
        "vary; code asc tiebreak), and a query scores candidates by " +
        "LOOKUP: per-subspace tables of query-x-codeword dots, " +
        "score = lut0[c0]+...+lut7[c7] in fixed expression order. " +
        "Spark shape: codebook training is two bounded aggregations; " +
        "the trained codebook (m*k*8 = 1024 doubles) collects to the " +
        "driver - the KMeans-centroid bounded class - and corpus " +
        "ENCODE + query LUT build are then pure map-side codebook-" +
        "literal expressions (the v09 nearestCells shape, no corpus " +
        "shuffle, PlanSpec-pinned), so serving is one broadcast join " +
        "+ 8 array lookups per candidate row: memory-bandwidth bound " +
        "over 32 bits of codes instead of 64 floats (64x fewer " +
        "bytes), which is the entire point of PQ at 100 TB (the " +
        "codebook trains on a driver-sized sample and rides every " +
        "executor as literals). code_key pins all 8 codes of each " +
        "returned neighbor, so the hash gates the ENCODING, not just " +
        "the ranking. Oracle replays seeds, the per-subspace Lloyd " +
        "update, Euclidean encode, LUT and ADC relationally.",
      (s, d) => pqAdcTop3(s, d)
        .select(col("qid").as("query_id"), col("rank"),
          col("cid").as("neighbor_id"), col("code_key"),
          round(col("score").cast("double") / lit(1e6), 4)
            .as("approx_ip")),
      Some(s"""
        WITH $PqAdcSql
        SELECT a.qid AS query_id, CAST(a.rn AS INT) AS rank,
               a.cid AS neighbor_id, k.code_key,
               round(CAST(a.score AS DOUBLE) / 1000000, 4) AS approx_ip
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, cid ASC) rn FROM adc) a
        JOIN ck k ON k.vec_id = a.cid
        WHERE a.rn <= 3""")),

    Q(
      "v12b_pq_recall",
      "Recall@3 of the v12 PQ/ADC probe vs the exact brute-force " +
        "top-3 - the compression-loss number a user tunes (m, k) " +
        "against, completing the family symmetry: every ANN tier has " +
        "a measured recall gate (v02b label cells, v09 geometric " +
        "cells, v12b quantized codes). Same exact integer-intersection " +
        "machinery (recallOf/bruteTruth - no float thresholds in the " +
        "comparison). MEASURED at the gate SF: full-scan ADC-only " +
        "recall@3 = 12/60 (and converged per-subspace Lloyd only " +
        "reaches ~18/60 - tools.IvfPqDebug prints the iteration " +
        "sweep): at 32 bits the quantization noise swamps the small " +
        "cosine gaps between this corpus's tightly-packed " +
        "candidates. That number is the POINT of the gate - it is " +
        "why production never serves from ADC order directly but " +
        "re-ranks an ADC shortlist with exact vectors (v13: 30/60 at " +
        "nprobe=2/R=25, within 3 hits of exact in-cell scoring at " +
        "1/5 the full-vector touches). The oracle replays the whole " +
        "codebook build + encode + LUT + ADC chain (PqAdcSql, one " +
        "copy with v12) before the recall join.",
      (s, d) => recallOf(bruteTruth(s, d),
        pqAdcTop3(s, d).select(col("qid"), col("cid"))),
      Some(s"""
        WITH $PqAdcSql,
        $TruthSql,
        ann AS (SELECT qid, cid
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY score DESC, cid ASC) rn FROM adc)
                WHERE rn <= 3),
        $RecallTailSql""")),

    Q(
      "v13_ivf_pq_recall",
      "IVFADC+R fused serving (Jegou et al. TPAMI'11 SV-VI - the " +
        "production composition the v09/v12 pair sets up), three " +
        "tiers per query: (1) ROUTE to the nprobe=2 nearest " +
        "geometric cells (v09's centroid-literal argmax, zero " +
        "shuffle; partition-pruned cell dirs at 100 TB), (2) PRUNE " +
        "the probed candidates to an ADC top-25 shortlist using only " +
        "the stored 32-bit PQ codes (v12's 8-lookup LUT score - no " +
        "full vectors touched), (3) exact-cosine RE-RANK of the 25 " +
        "shortlisted vectors only. MEASURED recall@3 at the gate SF: " +
        "30/60, vs 33/60 for exact scoring of ALL ~125 probed-cell " +
        "candidates (v09b) and 8/60 for ADC-only top-3 in the same " +
        "cells - i.e. the codes buy a 5x cut in full-vector touches " +
        "for 3 of 60 hits, which is precisely the role ADC plays in " +
        "production (the shortlist generator, never the final " +
        "ranker; tools.IvfPqDebug prints the (nprobe, R) sweep). " +
        "Shortlist rank key is the exact integer micro-unit ADC " +
        "score (the t31 fixed-point convention applied to the LUT " +
        "entries - no cross-engine float tie can flip it); the " +
        "re-rank is exact cosine with the cid tiebreak. The oracle " +
        "replays BOTH builds end-" +
        "to-end (KmeansSql.UpToCent2 cell chain + the p-prefixed PQ " +
        "chain) plus routing, in-cell ADC shortlist, exact re-rank " +
        "and the recall join.",
      (s, d) => recallOf(bruteTruth(s, d),
        ivfAdcRerank(s, d, nprobe = 2, r = 25)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        ${geoCellsSql(nprobe = 2)},
        ${pqChainSql("p")},
        $ivfAdcCellSql,
        $TruthSql,
        ${ivfAdcRerankSql(r = 25, qT = "q", cT = "c")},
        ann AS (SELECT qid, cid
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, cid ASC) rn FROM rr)
                WHERE rn <= 3),
        $RecallTailSql""")),

    Q(
      "v13b_ivf_pq_recall_scaled",
      "v13 with the R~nprobe coupling applied (nprobe=3, R=50): a " +
        "FIXED shortlist caps recall as the candidate pool grows - " +
        "v13's measured plateau is 30/31/30 of 60 at R=25 across " +
        "nprobe 2-4 - so a production config scales the re-rank " +
        "budget with the probe budget. MEASURED at the gate SF: " +
        "39/60, vs 45/60 for v09-style exact scoring of the same 3 " +
        "cells - 87% of the exact in-cell recall while touching 50 " +
        "full vectors per query instead of ~190 (tools.IvfPqDebug " +
        "prints the whole (nprobe, R) sweep). Shares every stage " +
        "with v13 (ivfAdcRerank + the KMeans/PQ/ADC/re-rank CTE " +
        "helpers); only the operating point differs.",
      (s, d) => recallOf(bruteTruth(s, d),
        ivfAdcRerank(s, d, nprobe = 3, r = 50)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        ${geoCellsSql(nprobe = 3)},
        ${pqChainSql("p")},
        $ivfAdcCellSql,
        $TruthSql,
        ${ivfAdcRerankSql(r = 50, qT = "q", cT = "c")},
        ann AS (SELECT qid, cid
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, cid ASC) rn FROM rr)
                WHERE rn <= 3),
        $RecallTailSql""")),

    Q(
      "v14_knn_graph",
      "Cell-local kNN-graph construction: top-3 cosine neighbors for " +
        "EVERY corpus vector, candidates restricted to the vector's " +
        "own geometric cell - the graph-building primitive SemDeDup, " +
        "clustering and graph-based dedup run over the whole corpus. " +
        "Contrast v01/v09, which serve a BOUNDED query set: here " +
        "every point is a query, so broadcasting is impossible and " +
        "all-pairs would be corpus^2. Spark shape: map-side cell " +
        "assignment (centroid literals, the v09 shape), ONE " +
        "cell-keyed self-join - both sides shuffle by cell once, " +
        "which at 100 TB is the write-once cell-bucketed layout " +
        "whose bucket-local self-join BucketingSpec pins for d02 - " +
        "then the top-3 cut through the TopKPerKey HEAP operator at " +
        "its designed use: every point's candidates live in one cell " +
        "partition, so the partial heap reduces each point to <=3 " +
        "rows before the exchange - a row_number window would " +
        "re-shuffle every pair. Pair volume is sum(cell_i^2) ~ " +
        "corpus^2/k for " +
        "balanced cells; cell-size skew is the AQE skew-join case, " +
        "and k grows ~sqrt(n) with the corpus (the SemDedupKAb " +
        "prescription) to hold per-cell occupancy flat. Isolated " +
        "singleton cells emit no rows for their vector - the " +
        "documented recall limit of cell-local graphs (SemDeDup " +
        "accepts it; a higher-recall build unions nprobe>1 cell " +
        "pairings exactly like v09b). Oracle replays the KMeans " +
        "chain + cell assignment + in-cell pairing + rank.",
      (s, d) => knnGraph(s, d, kCells = 8),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        ${geoCellsSql(nprobe = 1)},
        cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
                      sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) AS nrm
               FROM embeddings),
        sc AS (SELECT x.g_cid AS a_id, y.g_cid AS b_id,
                      list_dot_product(ca.ce, cb.ce)
                      / (ca.nrm * cb.nrm) AS cos
               FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.g_cid <> y.g_cid
               JOIN cc ca ON ca.cid = x.g_cid
               JOIN cc cb ON cb.cid = y.g_cid)
        SELECT a_id AS vec_id, CAST(rn AS INT) AS rank,
               b_id AS neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY a_id
                ORDER BY cos DESC, b_id ASC) rn FROM sc)
        WHERE rn <= 3""")),

    Q(
      "v14b_knn_graph_scaled",
      "v14 at the sqrt(n)-scaled operating point (kCells=25 - the " +
        "SemDedupKAb/KnnGraphAb prescription the v14 doc string " +
        "cites, now GATED rather than A/B evidence only, mirroring " +
        "how v13b gates v13's operating point): per-cell pair volume " +
        "is sum(cell_i^2) ~ n^2/k, so holding per-cell occupancy " +
        "flat as the corpus grows means k ~ sqrt(n); KnnGraphAb " +
        "measured fixed k=8 paying 73x the pair volume at 10x rows. " +
        "Same kernel (knnGraph - ONE cell-keyed self-join + " +
        "TopKPerKey partial heaps), same TrainedIndex artifact " +
        "cache at its own k; the oracle replays the identical " +
        "2-Lloyd chain at k=25 (KmeansSql.upToCent2(25) - " +
        "tools.KmProbe brackets that tol=0.12 stops at exactly 2 " +
        "iterations for k=25 at every SF: iter-1 delta ~0.33, " +
        "iter-2 ~0.05).",
      (s, d) => knnGraph(s, d, kCells = 25),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        ${geoCellsSql(nprobe = 1)},
        cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
                      sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) AS nrm
               FROM embeddings),
        sc AS (SELECT x.g_cid AS a_id, y.g_cid AS b_id,
                      list_dot_product(ca.ce, cb.ce)
                      / (ca.nrm * cb.nrm) AS cos
               FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.g_cid <> y.g_cid
               JOIN cc ca ON ca.cid = x.g_cid
               JOIN cc cb ON cb.cid = y.g_cid)
        SELECT a_id AS vec_id, CAST(rn AS INT) AS rank,
               b_id AS neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY a_id
                ORDER BY cos DESC, b_id ASC) rn FROM sc)
        WHERE rn <= 3""")),

    Q(
      "v15_index_artifacts",
      "Train-once/serve-many artifact round-trip (VERDICT r11 #3 - " +
        "the reference's checkpoint pattern, checkpoint.py:18-45, " +
        "applied to the ANN index): the trained IVF centroids + PQ " +
        "codebook are PERSISTED through the versioned IndexArtifacts " +
        "store (parquet roots + the StreamingVectorIndex atomic-" +
        "pointer marker), LOADED back, and the full IVFADC+R tier " +
        "stack is served from the LOADED copies at a distinct " +
        "operating point (nprobe=2, R=10). Doubles round-trip " +
        "parquet bit-exactly, so the served top-3 must hash-match " +
        "the oracle's from-scratch replay (KMeans chain + PQ chain + " +
        "ADC + re-rank) - which is exactly the train-once/serve-many " +
        "guarantee production needs: a probe off frozen artifacts " +
        "equals a probe off a fresh build. Both artifact tables are " +
        "driver-bounded forever (k x dim and m x k x subDim " +
        "doubles), so save/load cost is corpus-size-independent; at " +
        "100 TB the store is the serving fleet's shared index " +
        "pointer, retrained on its own cadence and swapped " +
        "atomically. IndexArtifactsSpec pins the marker semantics " +
        "(version advance, crash-mid-save invisibility, bit-exact " +
        "arrays).",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_v15_")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(dir.toFile)
        graft.sources.IndexArtifacts.save(s, dir.toString,
          Some(TrainedIndex.centroids(s, d, k = 8)),
          Some(TrainedIndex.codebook(s, d)))
        val cent = graft.sources.IndexArtifacts.loadCentroids(s, dir.toString)
        val cb = graft.sources.IndexArtifacts.loadCodebook(s, dir.toString).get
        val sl = ivfAdcRerankWith(s, d, nprobe = 2, r = 10, cent, cb)
        sl.select(col("qid"), col("cid"))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        ${geoCellsSql(nprobe = 2)},
        ${pqChainSql("p")},
        $ivfAdcCellSql,
        qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 20),
        cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings),
        ${ivfAdcRerankSql(r = 10, qT = "qq", cT = "cc")}
        SELECT qid, cid
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM rr)
        WHERE rn <= 3""")),

    Q(
      "v16_batch_ann_serving",
      "BATCH IVFADC+R: every corpus vector queries the index " +
        "(nprobe=2, R=25) - the full-refresh / all-pairs-enrichment " +
        "job shape where online serving's assumptions break: the " +
        "query side is corpus-sized so nothing broadcasts (the ADC " +
        "stage is a cell-co-partitioned shuffle join of two " +
        "corpus-sized frames), and BOTH per-query cuts (ADC top-25 " +
        "shortlist, exact-cosine top-3 re-rank) ride the TopKPerKey " +
        "heap operator: partial heaps reduce each query to <=k rows " +
        "per map task BEFORE the exchange, where v13's row_number " +
        "window would re-shuffle the whole |corpus| x cell-size " +
        "pair stream by qid (the VERDICT-r11 plan note on v13, now " +
        "gated). After the shortlist every join is delta-" +
        "proportional (R rows per query). Artifacts come from the " +
        "TrainedIndex cache - batch serving trains nothing. Oracle " +
        "replays the full KMeans + PQ + routed-ADC + re-rank chain " +
        "with an all-vectors probe set.",
      (s, d) => ivfAdcBatchServe(s, d, nprobe = 2, r = 25),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        ${geoCellsSql(nprobe = 2, qPred = "TRUE")},
        ${pqChainSql("p")},
        $ivfAdcCellSql,
        bq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings),
        bc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings),
        ${ivfAdcRerankSql(r = 25, qT = "bq", cT = "bc")}
        SELECT qid AS query_id, CAST(rn AS INT) AS rank,
               cid AS neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM rr)
        WHERE rn <= 3""")),

    Q(
      "v16b_batch_ann_serving_scaled",
      "v16 at the sqrt(n)-scaled cell count (kCells=25), GATING the " +
        "operating point BatchServeAb measures — the v13b/v14b " +
        "convention applied to batch serving: with every corpus " +
        "vector querying the index, the cell-co-partitioned ADC " +
        "join's pair volume is nprobe*n^2/k, so a FIXED cell count " +
        "goes quadratic as the corpus grows while k~sqrt(n) holds " +
        "per-query candidate lists to sqrt(n) (measured at the 10x " +
        "fixture, medians of 5: k=8 10.8 s vs k=25 7.5 s — and the " +
        "gap compounds with scale). Same kernel (ivfAdcBatchServe), " +
        "same TrainedIndex artifact cache at its own k; the oracle " +
        "replays the identical chain at k=25 (KmeansSql." +
        "upToCent2(25) — tools.KmProbe brackets that tol=0.12 stops " +
        "at exactly 2 Lloyd iterations for k=25 at every SF).",
      (s, d) => ivfAdcBatchServe(s, d, nprobe = 2, r = 25, kCells = 25),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        ${geoCellsSql(nprobe = 2, qPred = "TRUE")},
        ${pqChainSql("p")},
        $ivfAdcCellSql,
        bq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings),
        bc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings),
        ${ivfAdcRerankSql(r = 25, qT = "bq", cT = "bc")}
        SELECT qid AS query_id, CAST(rn AS INT) AS rank,
               cid AS neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, cid ASC) rn FROM rr)
        WHERE rn <= 3""")),

    Q(
      "v17_graph_ann_beam",
      "Graph-navigation ANN serving (HNSW layer 0 / NSG pattern): " +
        "greedy beam search over a STORED kNN graph — enter at the " +
        "query's 2 nearest cells' medoids, then 3 hops of " +
        "expand-out-edges / exact-score / keep-top-16, exact " +
        "intersection recall@3 vs brute force. The graph is v14's " +
        "cell-local kernel at degree 16 UNION one long-range hub " +
        "edge per node (-> the medoid of its second-nearest cell — " +
        "HNSW's upper-layer escape in single-table form; without it " +
        "the walk is trapped in the entry cells at 4/60). The third " +
        "serving tier next to cell scans (v09) and IVFADC (v13): " +
        "per query a hop touches beam x degree GRAPH rows and " +
        "scores beam x (1 + degree) vectors — corpus-size-" +
        "INDEPENDENT once the graph exists, which is why graph " +
        "indexes dominate high-recall online serving. Measured " +
        "recall@3 at the gate SF (tools.GraphAnnAb): 35/60 at " +
        "degree=16/beam=16/hops=3 — ABOVE v09b's 33/60 full scan " +
        "of the same 2 entry cells (hub escapes reach neighbors " +
        "the cell scan cannot) at ~800 scored vectors per query vs " +
        "the scan's 2n/8, a gap that widens with corpus size; the " +
        "full degree/beam/hops grid is in BENCH_SCALE. Spark shape: " +
        "per-hop frames are queries x beam x (1 + degree) rows, so " +
        "hops broadcast the frontier into the stored edge/embedding " +
        "tables (id-bucketed point lookups at 100 TB, never a " +
        "scan); the one corpus-sized stage is the graph build " +
        "itself (cell-keyed self-join + TopKPerKey heaps), built " +
        "once and local-checkpointed as the stand-in for the " +
        "stored edge table. Entry medoids are map-side max_by " +
        "against centroid literals (k driver rows). Oracle replays " +
        "the whole thing hop by hop: KMeans chain, in-cell edge " +
        "build + hub union, medoid argmax, then beam CTEs " +
        "b0->c1->b1->c2->b2->c3->top-3 — the hash matches only if " +
        "every beam cut agrees cross-engine at every hop.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServe(s, d, beam = 16, hops = 3, degree = 16)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $TruthSql,
        ${geoCellsSql(nprobe = 2)},
        ${hubGraphSql(degree = 16)},
        ${beamHopsSql(beam = 16, hops = 3)},
        $RecallTailSql""")),

    Q(
      "v17b_graph_ann_scaled",
      "v17 with the graph BUILT at the sqrt(n)-scaled cell count " +
        "(kCells=25) — VERDICT r12 #2: the serving walk was already " +
        "corpus-size-independent (beam x degree rows per hop), but " +
        "the in-gate build pinned kCells=8, whose sum(cell^2)/k " +
        "pair volume BENCH_SCALE measured at 40-48x at 10x data; " +
        "k~sqrt(n) (the gated v14b/v16b rule) holds per-cell " +
        "occupancy flat, so the build's pair volume grows linearly " +
        "with the corpus instead of quadratically. Same kernels " +
        "(buildHubGraph -> persisted TrainedIndex.graph artifact -> " +
        "exactWalkServe), same (degree=16, beam=16, hops=3) " +
        "operating point; entry medoids and hub escapes now come " +
        "from the k=25 cell geometry. The oracle replays the " +
        "identical 2-Lloyd chain at k=25 (KmeansSql.upToCent2(25) — " +
        "tools.KmProbe brackets that tol=0.12 stops at exactly 2 " +
        "iterations for k=25 at every SF) plus the hub-graph and " +
        "beam-walk CTEs, so every beam cut must agree cross-engine " +
        "on the scaled geometry too.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServe(s, d, beam = 16, hops = 3, degree = 16,
          kCells = 25)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 2)},
        ${hubGraphSql(degree = 16)},
        ${beamHopsSql(beam = 16, hops = 3)},
        $RecallTailSql""")),

    Q(
      "v17c_graph_ann_multientry",
      "v17b's scaled geometry with MULTI-ENTRY search (entries=8): " +
        "the measured answer to the recall-saturation finding in " +
        "GraphAnnAb's 10x grid — once the greedy walk converges to " +
        "a local minimum, recall saturates in EVERY per-walk axis " +
        "(beam 16->48: 15->17/60; degree 16->32: 17/60 flat; hops " +
        "3->8: 17/60 flat at the 10x fixture), and the remaining " +
        "lever is entry DIVERSITY: starting the walk from the " +
        "query's 8 nearest cells' medoids instead of 2 lifts 10x " +
        "recall 17->37/60 (entries 2/4/8/16 = 17/21/30/37) at ZERO " +
        "graph cost and ~3 s walks — more diverse starts escape " +
        "more local minima, the multi-restart insight of the " +
        "graph-ANN literature in lake form. At the gate SF the same " +
        "lever reads 30->38/60 (k=25, entries 2->8), gated here at " +
        "(kCells=25, degree=16, beam=16, hops=3, entries=8); the " +
        "extra cost is 6 more scored rows per query at hop 0 — " +
        "corpus-size-independent like every other walk frame. " +
        "Oracle: the k=25 chain with the probes CTE widened to " +
        "rn<=8 feeding the same f0 medoid-entry construction.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServe(s, d, beam = 16, hops = 3, degree = 16,
          kCells = 25, entries = 8)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 8)},
        ${hubGraphSql(degree = 16)},
        ${beamHopsSql(beam = 16, hops = 3)},
        $RecallTailSql""")),

    Q(
      "v17d_graph_ann_refined",
      "The recall FRONTIER of the graph tier (VERDICT r13 #5): v17c " +
        "showed entry diversity is the last per-walk recall lever, " +
        "but it saturates too — the GraphAnnAb sweep at the scaled " +
        "geometry measures entries 2/8/12/16/25 = 25/32/34/35/35 of " +
        "60 at the gate SF: every axis of the greedy walk (beam, " +
        "degree, hops, entries) plateaus at the same local-minimum " +
        "set. The lever BEYOND the walk is candidate-set UNION: take " +
        "the final beam, union the query's `refine` nearest cells' " +
        "members (the IVF scan set — the dense local neighborhood " +
        "greedy descent walks past), one exact re-rank. Measured " +
        "(entries=16): refine 2/4/6/8/12 = 38/40/43/50/52 of 60 — " +
        "the knee is refine=8, +15 recall over the walk plateau for " +
        "8 x n/25 scored rows per query, gated here at (kCells=25, " +
        "degree=16, beam=16, hops=3, entries=16, refine=8) = 50/60, " +
        "the highest recall@3 in the ANN tier (vs v09b's 33/60 at a " +
        "comparable scan fraction on the k=8 cells: finer cells + " +
        "hub-escape walk beat a coarse-cell scan at equal budget). " +
        "At 100 TB the economics hold by the k~sqrt(n) rule: the " +
        "refinement scores refine x n/k = O(sqrt n) rows per query " +
        "(the IVF nprobe term) on top of the walk's O(1) — the " +
        "recall-above-plateau price, paid only by queries that opt " +
        "into the refined tier. Oracle: the k=25 chain, probes " +
        "widened to 16 for the medoid entries, the walk CTEs, then " +
        "refpr/refc (the same deterministic probe ranking at width " +
        "8) unioned with the final beam and re-ranked exactly.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServeRefined(s, d, beam = 16, hops = 3, degree = 16,
          kCells = 25, entries = 16, refine = 8)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${hubGraphSql(degree = 16)},
        ${beamHopsRefinedSql(beam = 16, hops = 3, refine = 8)},
        $RecallTailSql""")),

    Q(
      "v19_diskann_serving",
      "DiskANN-style serving (Subramanya et al. NeurIPS'19): v17's " +
        "beam walk COMPASSED BY PQ/ADC scores — candidates score " +
        "from their stored 32-bit codes against the query's lookup " +
        "table, so the walk never reads a vector byte; full vectors " +
        "are touched ONLY for the final beam's exact re-rank " +
        "(queries x beam rows, once). That is the DiskANN memory " +
        "hierarchy on a lake: codes are the RAM tier (64x smaller " +
        "than floats — billions fit where millions of vectors " +
        "would), vectors are the disk tier read once at the end, " +
        "and the graph bounds how much of either a query touches. " +
        "Every beam cut ranks on exact INTEGERS (the micro-unit LUT " +
        "convention), so the walk is bit-deterministic cross-engine " +
        "by construction — stronger than v17's double ranks. " +
        "Measured recall@3 at the gate SF (tools.GraphAnnAb adc " +
        "mode): 20/60 vs v17's 35/60 at the same (degree=16, " +
        "beam=16, hops=3) — the ADC compass is lossy (32-bit " +
        "codes), the price DiskANN pays for the memory tier — and " +
        "widening the beam buys it back with CODE reads, not " +
        "vector reads: beam=32 recovers exactly v17's 35/60, " +
        "beam=48 exceeds it at 36/60. Oracle replays the " +
        "identical chain: KMeans cells, hub graph, PQ codebook + " +
        "codes + LUTs, integer-ranked beam CTEs, exact re-rank of " +
        "the final beam.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServeAdc(s, d, beam = 16, hops = 3, degree = 16)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $TruthSql,
        ${geoCellsSql(nprobe = 2)},
        ${hubGraphSql(degree = 16)},
        ${pqChainSql("p")},
        $adcAllSql,
        ${beamHopsAdcSql(beam = 16, hops = 3)},
        $RecallTailSql""")),

    Q(
      "v20_graph_artifacts",
      "Graph-tier artifact round-trip (VERDICT r12 #1 — v15's " +
        "build->save->load->serve contract extended to the LAST " +
        "unfrozen derived state): the hub kNN edge table, the entry " +
        "medoids, and the PQ code columns are PERSISTED as versioned " +
        "FRAME artifacts (IndexArtifacts.saveFrames — parquet roots " +
        "behind the same atomic-pointer marker; these are corpus-" +
        "sized, so they stay distributed frames and never collect " +
        "the way centroids/codebooks do), LOADED back, and the " +
        "DiskANN-style ADC walk serves ENTIRELY from the loaded " +
        "copies at a distinct operating point: beam=32 — the " +
        "measured beam-doubling recovery point where the lossy ADC " +
        "compass buys back exactly v17's 35/60 recall with CODE " +
        "reads, not vector reads (BENCH_SCALE grid), now gated. " +
        "Longs and ints round-trip parquet bit-exactly, so the " +
        "served recall rows must hash-match the oracle's " +
        "from-scratch replay (KMeans chain + hub graph + PQ chain + " +
        "integer-ranked beam-32 walk + exact re-rank). At 100 TB " +
        "this is the production serving story: build once on the " +
        "training cadence, atomically publish edges+medoids+codes, " +
        "and every serving fleet query is pure point-lookup reads " +
        "against frozen artifacts — nothing quadratic ever runs at " +
        "serve time. IndexArtifactsSpec pins the frame store's " +
        "crash windows (torn v-dir invisible, marker-gated reads).",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_v20_")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(dir.toFile)
        // the JVM-cached build (itself already artifact-backed) is
        // re-persisted into the gate's OWN versioned store, then
        // everything the walk touches is loaded from disk
        val (edges, medoids) = TrainedIndex.graph(s, d, degree = 16,
          kCells = 8)
        graft.sources.IndexArtifacts.saveFrames(s, dir.toString, Seq(
          "edges" -> edges, "medoids" -> medoids,
          "codes" -> TrainedIndex.codes(s, d)), keep = 2)
        val le = graft.sources.IndexArtifacts.loadFrame(s, dir.toString, "edges")
        val lm = graft.sources.IndexArtifacts.loadFrame(s, dir.toString, "medoids")
        val lc = graft.sources.IndexArtifacts.loadFrame(s, dir.toString, "codes")
        val f0 = graphEntries(s, d, TrainedIndex.centroids(s, d, k = 8), lm)
        recallOf(bruteTruth(s, d),
          adcWalkServe(s, d, le, f0, beam = 32, hops = 3, Some(lc)))
      },
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $TruthSql,
        ${geoCellsSql(nprobe = 2)},
        ${hubGraphSql(degree = 16)},
        ${pqChainSql("p")},
        $adcAllSql,
        ${beamHopsAdcSql(beam = 32, hops = 3)},
        $RecallTailSql""")),

    Q(
      "v21_refined_adc_serving",
      "v17d's recall lever at v19's MEMORY ECONOMICS (the refined " +
        "tier completed across the DiskANN hierarchy): the ADC beam " +
        "walk's final frontier unions the query's 8 nearest cells' " +
        "members, the union is ranked on INTEGER ADC scores from the " +
        "persisted 32-bit codes — refine x n/k CODE reads per query, " +
        "no vector byte, the RAM tier — and only the surviving " +
        "shortlist of R=128 is re-ranked exactly (the one vector " +
        "touch, IVFADC+R's R knob applied to the graph tier). " +
        "Measured at the gate geometry (GraphAnnAb adc+refine, " +
        "kCells=25, degree=16, beam=16, hops=3, entries=16, " +
        "refine=8): R = 16/32/64/128/192/256 -> 16/30/36/42/43/44 of " +
        "60 — the knee is R=128 at 42/60, 84% of v17d's exact-" +
        "refined 50/60 for 128 vector reads per query vs its ~640 " +
        "(5x less vector traffic, 64x less than reading the union " +
        "as floats), and the saturating tail past R=128 is the " +
        "codes' intrinsic loss, the same 32-bit price v19 measures " +
        "against v17. Every cut ranks on exact integers (micro-unit " +
        "LUTs), so the walk, the shortlist, and the final exact " +
        "re-rank are all bit-deterministic cross-engine. Oracle: " +
        "the k=25 chain, probes at 16, hub graph, PQ chain, the ADC " +
        "walk CTEs, then refpr/refc at width 8 unioned with the " +
        "final beam, ranked by adcall, cut at 128, re-ranked " +
        "exactly.",
      (s, d) => recallOf(bruteTruth(s, d),
        graphAnnServeAdcRefined(s, d, beam = 16, hops = 3, degree = 16,
          kCells = 25, entries = 16, refine = 8, shortlist = 128)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${hubGraphSql(degree = 16)},
        ${pqChainSql("p")},
        $adcAllSql,
        ${beamHopsAdcRefinedSql(beam = 16, hops = 3, refine = 8,
          shortlist = 128)},
        $RecallTailSql""")),

    Q(
      "v21b_refined_adc_scaled",
      "v21's shortlist knob COUPLED TO THE CORPUS (the scaled twin " +
        "of the fixed-R gate, the v14/v14b convention applied to " +
        "IVFADC+R's R): BENCH_SCALE r14 measured that a fixed R=128 " +
        "keeps a shrinking FRACTION of a candidate union that grows " +
        "as refine x n/kCells — at 10x the refined-ADC recall decays " +
        "to 29/60 while widening R with the union recovers 42/60 " +
        "(R = 128/256/512/1024 -> 29/33/35/42). This gate hashes the " +
        "RULE, not a constant: R = ceil(refine*n/(5*kCells)) — the " +
        "measured 20%-of-union knee, which reproduces exactly R=128 " +
        "at the sf0.1 gate geometry — computed FROM THE DATA on both " +
        "sides (one bounded count() in the engine; the identical " +
        "integer ceil-division as a scalar subquery in the oracle), " +
        "so the same gate text serves the correct shortlist at every " +
        "SF instead of freezing one fixture's knee. Under the gated " +
        "k~sqrt(n) rule the union is O(sqrt n), so R — and the exact " +
        "vector reads it bounds — grows O(sqrt n) with the corpus: " +
        "the kept fraction is the scale-invariant knob, vector " +
        "traffic stays 5x below the exact-refined tier at every " +
        "scale. Same chain as v21 otherwise (k=25 cells, degree=16 " +
        "hub graph, entries=16, refine=8, integer ADC compass, one " +
        "exact re-rank of the shortlist).",
      (s, d) => {
        val n = Tables.embeddings(s, d).count()
        recallOf(bruteTruth(s, d),
          graphAnnServeAdcRefined(s, d, beam = 16, hops = 3,
            degree = 16, kCells = 25, entries = 16, refine = 8,
            shortlist = scaledShortlist(n, refine = 8, kCells = 25)))
      },
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${hubGraphSql(degree = 16)},
        ${pqChainSql("p")},
        $adcAllSql,
        ${beamHopsAdcRefinedSql(beam = 16, hops = 3, refine = 8,
          shortlistSql = scaledShortlistSql(refine = 8, kCells = 25))},
        $RecallTailSql""")),

    Q(
      "v22_vamana_walk_serving",
      "Alpha-pruned (Vamana RobustPrune) graph + a convergence-budget " +
        "walk — VERDICT r14 #3, the walk-only tier made recall-robust " +
        "at corpus scale WITHOUT the refined tier's O(sqrt n) union. " +
        "Two findings compose (GraphAnnAb r15 grids). (1) The r14 " +
        "'collapse' (35->18/60 at 10x) was mostly SEARCH-BUDGET " +
        "starvation, not only a graph defect: at (beam=16, hops=3) " +
        "every graph reads 12-20/60 at 10x; hops converge by 5, and " +
        "beam=64 — still corpus-INDEPENDENT work per query — lifts " +
        "the walk to 36-40/60 at 10x and 53-54/60 at sf0.1, ABOVE " +
        "the refined tier's gated 50/60. (2) At that budget the " +
        "alpha-pruned graph beats the hub-kNN graph where it " +
        "matters: 40 vs 36/60 at 10x (54 vs 54 at sf0.1) — decay " +
        "-14 vs -18 under 10x growth. Build: each node's candidate " +
        "pool is its 2 nearest cells' members (TopKPerKey-capped at " +
        "64); the one-shot occlusion test alpha^2*d2(p,c) <= " +
        "d2(src,c) marks candidates covered by a closer pool row " +
        "(the declarative form of RobustPrune's sieve — Subramanya " +
        "et al. NeurIPS'19 §2); edges = the degree-wide (occluded " +
        "ASC, dsq ASC) cut — survivors first, nearest pruned rows " +
        "fill (keepPrunedConnections). A medoid global-candidate " +
        "arm and a hybrid nearest-mesh fill were built and ablated " +
        "away as measurement-neutral (BENCH_SCALE r15). " +
        "Everything is squared-Euclidean assembled as n2a + n2b - " +
        "2*dot in identical op order on both engines, so the " +
        "occlusion booleans are bit-exact. The hop count is a " +
        "CONVERGENCE TEST, not a constant (VERDICT r15 #4): the walk " +
        "hops until the frontier set stops changing (cap " +
        "WalkMaxHops=16 — a runaway bound; measured stops are hop 6 " +
        "at sf0.1 and hop 9 at 10x, and a candidate cap of 8 was " +
        "measured BINDING at 10x, the exact silent starvation this " +
        "replaces), and the oracle derives " +
        "the SAME stop from the data — maxHops materialized hop " +
        "CTEs, per-hop new-row counts as data, dispatch of the " +
        "first unchanged hop (the dm10e recipe applied to the " +
        "walk) — so a corpus jump that needs more hops moves both " +
        "engines together instead of silently starving the serve.",
      (s, d) => recallOf(bruteTruth(s, d),
        vamanaAnnServeConverged(s, d, beam = 64, degree = 16,
          kCells = 25, entries = 16)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${vamanaGraphSql(degree = 16)},
        ${beamHopsConvergedSql(beam = 64, maxHops = WalkMaxHops)},
        $RecallTailSql""")),

    Q(
      "v22b_vamana_adc_serving",
      "v22's graph at v19's MEMORY ECONOMICS — the configuration the " +
        "DiskANN paper actually ships (alpha-pruned Vamana graph + " +
        "PQ/ADC compass): the beam-64 CONVERGED walk " +
        "over the v22 artifact ranks every cut on INTEGER ADC scores " +
        "from the persisted 32-bit codes, and full vectors are " +
        "touched only for the final beam's exact re-rank. Measured " +
        "tradeoff at the budget (GraphAnnAb r15): the code compass " +
        "costs recall vs the exact-cosine walk — 36 vs 54/60 at " +
        "sf0.1 — the same intrinsic 32-bit loss v19 measures against " +
        "v17. The graph comparison under the compass is MIXED and " +
        "recorded honestly: vamana beats hub at sf0.1 (36 vs 34) but " +
        "INVERTS at 10x (19 vs 21 converged; 18 at the old pinned " +
        "hops=5 — convergence was not the missing ingredient, code " +
        "resolution is) — integer codes misrank the " +
        "diverse edges' direction decisions exactly where diversity " +
        "was the win, so at corpus scale the ADC tier's recall rests " +
        "on the refined union rule (v21b holds 42/60 flat), not on " +
        "the graph. At 100 TB this is the tier that " +
        "stays RAM-resident: the walk reads codes (64x smaller than " +
        "vectors), and exact reads are bounded at queries x beam. " +
        "The hop count is the v22 convergence rule on the integer " +
        "compass (r16): walk to the score fixed point, cap " +
        "WalkMaxHops, oracle dispatching the data-derived stop. " +
        "Oracle: the vamana build CTEs composed with the converged " +
        "ADC walk CTEs — each piece gated separately (v22, v19), " +
        "here hashed as one composition.",
      (s, d) => recallOf(bruteTruth(s, d),
        vamanaAnnServeAdcConverged(s, d, beam = 64, degree = 16,
          kCells = 25, entries = 16)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${vamanaGraphSql(degree = 16)},
        ${pqChainSql("p")},
        $adcAllSql,
        ${beamHopsAdcConvergedSql(beam = 64, maxHops = WalkMaxHops)},
        $RecallTailSql""")),

    Q(
      "v22c_vamana_refined_serving",
      "The repo's MAX-RECALL serving point: v17d's refined-union " +
        "lever composed on v22's alpha-pruned graph at the " +
        "convergence budget — walk frontier (beam=64, data-derived " +
        "stop, entries=16 over the vamana artifact) UNION the query's 8 " +
        "nearest cells' members, one exact re-rank. Measured " +
        "(GraphAnnAb r15): 56/60 at sf0.1 and 51/60 at 10x — above " +
        "v17d (50/47) at both scales, because the alpha-pruned " +
        "frontier contributes long-range candidates the hub walk's " +
        "local-minimum basin never reaches. Cost: the walk's O(1) " +
        "term plus the refine x n/kCells union — O(sqrt n) per query " +
        "under the gated k~sqrt(n) rule, identical to v17d's " +
        "economics. One tail kernel (refinedExactTail) is shared " +
        "with v17d so the refined tails cannot desynchronize; the " +
        "walk runs at v22's data-derived convergence stop (VERDICT " +
        "r15 #4, cap WalkMaxHops=16), and the oracle composes the " +
        "vamana build CTEs with the converged-walk refined tail " +
        "(beamHopsConvergedRefinedSql) — same union/re-rank SQL as " +
        "v17d's tail over the dispatched stop-hop beam.",
      (s, d) => recallOf(bruteTruth(s, d),
        vamanaAnnServeRefinedConverged(s, d, beam = 64, degree = 16,
          kCells = 25, entries = 16, refine = 8)),
      Some(s"""
        WITH ${KmeansSql.upToCent2(25)},
        $TruthSql,
        ${geoCellsSql(nprobe = 16)},
        ${vamanaGraphSql(degree = 16)},
        ${beamHopsConvergedRefinedSql(beam = 64,
          maxHops = WalkMaxHops, refine = 8)},
        $RecallTailSql""")),

    Q(
      "v18_filtered_ann",
      "Metadata-FILTERED ANN serving, pre-filter form (the hard " +
        "production case every vector store special-cases: the query " +
        "carries an equality constraint — here its own label, " +
        "'similar items in my category' — and only satisfying " +
        "candidates count): nprobe=2 geometric cell routing exactly " +
        "as v09b, but the label predicate applies BEFORE the " +
        "per-query rank, so the top-3 budget is spent only on " +
        "eligible rows. The label rides the same map-side projection " +
        "as the cell assignment — the filter costs zero extra " +
        "exchanges, and at 100 TB the cell-partitioned lake's " +
        "z-ordered (o07) or label-subpartitioned layout turns it " +
        "into file pruning. Graded against the FILTERED brute-force " +
        "truth (same-label candidates only). Recall@3 at the gate " +
        "SF: 25/60 pre-filter vs 7/60 for v18b's post-filter at " +
        "the IDENTICAL scan budget — the pair is the measured case " +
        "for why filtered search must push predicates below the " +
        "rank, not above it.",
      (s, d) => recallOf(bruteTruthFiltered(s, d),
        filteredGeoAnn(s, d, nprobe = 2, preFilter = true)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $FilteredTruthSql,
        ${geoCellsSql(nprobe = 2)},
        sc18 AS (SELECT p.qid, g.g_cid AS cid, b.cos
                 FROM probes p
                 JOIN a3 g ON g.cell = p.cell AND g.g_cid <> p.qid
                 JOIN bff b ON b.qid = p.qid AND b.cid = g.g_cid
                 WHERE b.c_lab = b.q_lab),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM sc18)
               WHERE rn <= 3),
        $RecallTailSql""")),

    Q(
      "v18b_filtered_ann_postfilter",
      "v18's naive twin: rank the UNFILTERED cell top-3 first, then " +
        "drop non-matching rows (the plan a bolted-on WHERE clause " +
        "gives you when the predicate sits above the rank). Same " +
        "cells, same scan budget, same filtered truth — but the " +
        "rank budget is wasted on ineligible rows, so recall " +
        "collapses to 7/60 vs v18's 25/60 (with ~10 labels, most " +
        "of an unfiltered top-3 fails the filter and nothing " +
        "replaces it). Gated deliberately: the pre/post gap is the " +
        "measured justification for v18's plan shape, the way v03b " +
        "gates the fixed-width-LSH failure mode.",
      (s, d) => recallOf(bruteTruthFiltered(s, d),
        filteredGeoAnn(s, d, nprobe = 2, preFilter = false)),
      Some(s"""
        WITH ${KmeansSql.UpToCent2},
        $FilteredTruthSql,
        ${geoCellsSql(nprobe = 2)},
        sc18 AS (SELECT p.qid, g.g_cid AS cid, b.cos,
                        b.c_lab, b.q_lab
                 FROM probes p
                 JOIN a3 g ON g.cell = p.cell AND g.g_cid <> p.qid
                 JOIN bff b ON b.qid = p.qid AND b.cid = g.g_cid),
        ann AS (SELECT qid, cid FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid ASC) rn FROM sc18)
               WHERE rn <= 3 AND c_lab = q_lab),
        $RecallTailSql""")),

    Q(
      "v18c_filtered_ann_rare",
      "Filtered ANN at the RARE-selectivity extreme (VERDICT r12 #6 — " +
        "the regime where the v18 plan choice FLIPS): the query's " +
        "constraint is a composite key (label AND vec_id%16 residue — " +
        "the tenant-plus-category shape), keeping ~0.6% of the " +
        "corpus, far below 1/kCells. Cell routing now starves: the " +
        "2 probed cells hold <1 eligible row per query on average, " +
        "so v18's own pre-filter plan collapses (measured via " +
        "tools.FilteredAnnAb; the full selectivity sweep is the " +
        "BENCH_SCALE table). The correct plan INVERTS the index: " +
        "the predicate becomes the JOIN KEY — queries broadcast-" +
        "equi-join the corpus on (label, residue), and the exact " +
        "cosine rank runs over the eligible subset only, no ANN " +
        "structure consulted. At 100 TB the lake's label/tenant " +
        "partitioning turns that join into partition-pruned point " +
        "lookups reading 0.6% of the data — cheaper than any cell " +
        "probe, and EXACT. The gate grades the equi-join plan " +
        "against the all-pairs-then-filter truth: hash equality " +
        "pins that filter-as-join-key below the rank reproduces " +
        "filter-inside-the-global-rank row for row — the plan-" +
        "equivalence that makes the flip safe to serve.",
      (s, d) => recallOf(bruteTruthRare(s, d), rareFilteredExact(s, d)),
      Some(s"""
        WITH qr AS (SELECT vec_id qid, label q_lab, vec_id % 16 AS q_res,
                           embedding::DOUBLE[] qe
                    FROM embeddings WHERE vec_id < 20),
        cr AS (SELECT vec_id cid, label c_lab, vec_id % 16 AS c_res,
                      embedding::DOUBLE[] ce
               FROM embeddings),
        bfr AS (SELECT qid, cid,
                       list_dot_product(qe, ce)
                       / (sqrt(list_dot_product(qe, qe))
                          * sqrt(list_dot_product(ce, ce))) AS cos
                FROM qr, cr
                WHERE qid <> cid AND c_lab = q_lab AND c_res = q_res),
        truth AS (SELECT qid, cid
                  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, cid ASC) rn FROM bfr)
                  WHERE rn <= 3),
        ann AS (SELECT qid, cid FROM truth),
        $RecallTailSql"""))
  )

  /** Random-hyperplane LSH near-dup pairing at a given code width:
    * sign-bit signature over `bits` deterministic +/-1 planes, equal-code
    * bucket join, exact cosine on candidates. One signature shuffle;
    * the pair join is bucket-local. */
  private def neardupLsh(s: SparkSession, d: String, bits: Int) = {
    val e = Tables.embeddings(s, d)
    val long = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("v"))
    val planes = s.range(bits).select(col("id").as("j"))
      .crossJoin(s.range(64).select(col("id").as("pos")))
      .withColumn("s",
        when(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(1.0))
          .otherwise(lit(-1.0)))
    val bitsDf = long.join(broadcast(planes), Seq("pos"))
      .groupBy(col("vec_id"), col("j"))
      .agg((sum(col("v") * col("s")) > 0).as("b"))
    val code = bitsDf.groupBy(col("vec_id"))
      .agg(sum(expr("CASE WHEN b THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END")).as("code"))
    val pairs = code.as("x")
      .join(code.as("y"),
        col("x.code") === col("y.code") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.code").as("code"))
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    graft.plans.CosineSimilarity.register(s)
    pairs.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cos", expr("cosine_sim(va, vb)"))
      .filter(col("cos") >= 0.2)
      .select(col("vec_a"), col("vec_b"), col("code"),
        round(col("cos"), 4).as("cosine"))
  }

  private def neardupLshSql(bits: Int): String = s"""
        WITH long AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                             unnest(range(len(embedding))) AS pos
                      FROM embeddings),
        planes AS (SELECT j.range AS j, p.range AS pos,
                          CASE WHEN substr(md5(j.range || ':' || p.range), 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                               THEN 1.0 ELSE -1.0 END AS s
                   FROM range($bits) j, range(64) p),
        bits AS (SELECT vec_id, j, sum(v * s) > 0 AS b
                 FROM long JOIN planes USING (pos) GROUP BY 1, 2),
        code AS (SELECT vec_id, CAST(sum(CASE WHEN b THEN 1 << j ELSE 0 END) AS BIGINT) AS code
                 FROM bits GROUP BY 1),
        pairs AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.code
                  FROM code x JOIN code y ON x.code = y.code
                                         AND x.vec_id < y.vec_id),
        ev AS (SELECT vec_id, embedding::DOUBLE[] ve FROM embeddings)
        SELECT p.vec_a, p.vec_b, p.code,
               round(list_dot_product(a.ve, b.ve)
                     / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 4) AS cosine
        FROM pairs p JOIN ev a ON p.vec_a = a.vec_id
                     JOIN ev b ON p.vec_b = b.vec_id
        WHERE list_dot_product(a.ve, b.ve)
              / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))) >= 0.2"""
}
