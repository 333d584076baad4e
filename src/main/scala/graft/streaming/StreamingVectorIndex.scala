package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of an IVF (cell-partitioned) vector index —
  * the serving-side continuation of v09's geometric IVF: the coarse
  * quantizer (KMeans centroids, trained offline — the v05d build) is
  * FIXED, and newly-embedded vectors arrive as micro-batches. Each
  * batch is assigned to its nearest-centroid cell MAP-SIDE (per-cell
  * dots over centroid literals, struct-sort argmax — the v09
  * zero-shuffle assignment shape, VectorOps.nearestCells, one copy)
  * and appended to a cell-partitioned lake; a probe then reads only
  * `cell=c` directories (partition pruning — the BucketingSpec IVF
  * layout), exactly like a batch-built index.
  *
  * State layout (the IncrementalDedup convention):
  *   dir/cells/b<batchId>/cell=<c>/ — the batch's vectors, by cell
  *   dir/_current                    — atomic-pointer marker
  * A batch writes ONLY its own directory (the index is append-only;
  * history is never rewritten), so per-batch I/O is delta-sized, and
  * crash redelivery re-overwrites the same directory and republishes
  * the same marker (idempotent). Cell assignment is a pure per-row
  * function of the fixed centroids, so the final index is independent
  * of batch boundaries — which is what lets the st15 gate hash-match
  * the streamed index against an all-at-once oracle replay.
  *
  * 100-TB: assignment adds no exchange (k×dim centroid literals ride
  * the task the way a broadcast does) and the only writes are the
  * arriving delta. Compacting many small per-batch files into
  * per-cell bucketed files is an offline OPTIMIZE pass over closed
  * batches, not this hot path; centroid RETRAINING is an index
  * rebuild (new dir, atomic pointer swap), never an in-place edit.
  */
object StreamingVectorIndex {

  def start(rows: DataFrame, cent: Array[Array[Double]], idCol: String,
      vecCol: String, stateDir: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), cent, idCol, vecCol, batchId, stateDir)
      }
      .start()

  /** Fold one micro-batch into the index: map-side nearest-centroid
    * assignment, write under dir/cells/b<batchId> partitioned by
    * cell. Idempotent on redelivery.
    *
    * With `codebook` set (the v12 PQ codebook — m*k*subDim driver
    * doubles riding the task as literals), each row additionally
    * encodes to its m PQ codes MAP-SIDE at ingest (c0..c<m-1>
    * columns, VectorOps.pqCodeCol — one copy with the batch encode),
    * so the lake stores the 32-bit serving representation alongside
    * the raw vector and an ADC probe (probePq) never reads vector
    * bytes outside its shortlist. Codes are a pure per-row function
    * of the FIXED codebook, so batch-boundary independence — and the
    * st17 gate's hash-match against an all-at-once oracle replay —
    * holds exactly as it does for cell assignment; retraining the
    * codebook is an index rebuild (new dir, atomic pointer swap),
    * never an in-place re-encode. */
  def applyBatch(batch: DataFrame, cent: Array[Array[Double]],
      idCol: String, vecCol: String, batchId: Long, dir: String,
      codebook: Option[Array[Array[Array[Double]]]] = None,
      knownIsEmpty: Option[Boolean] = None): Unit = {
    if (batchId <= StateMarker.lastApplied(dir)) return // redelivery
    // schema consistency is validated at WRITE time (ADVICE r11): the
    // codebook arrives per call, and an index dir mixing code-bearing
    // and plain batches would only fail — as an AnalysisException in
    // unionByName — at read/compact time. The index's kind is recorded
    // in the marker's second field on the first batch; a mismatched
    // later batch is a caller bug (adding/retraining codes is an index
    // REBUILD into a new dir + pointer swap, never an in-place mix).
    val kind = if (codebook.isDefined) "codes" else "plain"
    val prior = StateMarker.read(dir)
    require(prior.length < 2 || prior(1) == kind,
      s"index at $dir holds ${prior(1)} batches but this batch is $kind — " +
        "changing the code layout is a rebuild (new dir), not a mixed append")
    Files.createDirectories(Paths.get(dir))
    // an empty trigger still advances the marker (so redelivery
    // no-ops) but writes no root — a data-less parquet root would
    // break schema inference for every later read. A caller that has
    // already probed emptiness passes the answer through (ADVICE r12)
    // so the uncached batch isn't re-evaluated.
    if (!knownIsEmpty.getOrElse(batch.isEmpty)) {
      val codeCols = codebook.toSeq.flatMap { cb =>
        (0 until graft.queries.VectorOps.PqM).map(i =>
          graft.queries.VectorOps.pqCodeCol(cb, i, vecCol).as(s"c$i"))
      }
      val assigned = batch.select(col(idCol) +: col(vecCol) +: codeCols: _*)
        .withColumn("cell",
          -element_at(
            graft.queries.VectorOps.nearestCells(cent, vecCol, 1), 1)
            .getField("nc"))
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/cells/b$batchId")
    }
    StateMarker.publish(dir, batchId, extras = Seq(kind))
  }

  /** The whole index: the current compacted root (if `compact` has
    * run) plus every batch applied after it; `cell` is a partition
    * column in each root, so a `filter(col("cell") === c)` probe
    * prunes to the probed cells' files. Each root gets its own
    * partition discovery (one shared root would make Spark reject the
    * `b<id>` level as a conflicting partition layer) and the union
    * lets the probe's cell filter push into every scan's
    * PartitionFilters. */
  def readIndex(spark: SparkSession, dir: String): DataFrame = {
    val upTo = compactedUpTo(dir)
    val roots =
      (if (upTo >= 0) Seq(s"$dir/compacted_v$upTo") else Nil) ++
        ((upTo + 1) to StateMarker.lastApplied(dir))
          .map(b => s"$dir/cells/b$b")
          .filter(p => new java.io.File(p).isDirectory)
    require(roots.nonEmpty, s"no index state under $dir " +
      "(no batch has been applied yet, or the directory is not an index)")
    roots.map(p => spark.read.option("basePath", p).parquet(p))
      .reduce(_ unionByName _)
  }

  /** Highest batch id folded into the live compacted root
    * (`compacted_v<id>`); -1 before the first compaction. */
  def compactedUpTo(dir: String): Long =
    StateMarker.lastApplied(dir, name = "_compacted")

  /** Serve a cosine top-k probe from the streamed index — the v09
    * probe shape over this index's layout: queries route to their
    * `nprobe` nearest centroid cells map-side (centroid-literal
    * argmax, no shuffle), the index is read with a cell filter so
    * only the probed `cell=` partitions scan (the collect behind the
    * isin is ≤ #cells rows — centroid-bounded, never corpus-sized),
    * and candidates rank per query with the (cos desc, id asc)
    * tiebreak. Spec-pinned to exact parity with the batch-built
    * geometric IVF (VectorOps.geoAnn) over the same centroids. */
  def probe(spark: SparkSession, dir: String, cent: Array[Array[Double]],
      queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qe"),
        explode(
          graft.queries.VectorOps.nearestCells(cent, vecCol, nprobe))
          .as("pc"))
      .select(col("qid"), (-col("pc.nc")).as("cell"), col("qe"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    val idx = readIndex(spark, dir)
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol).as("cid"), col(vecCol).as("ce"),
        col("cell").cast("long").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    idx.join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", graft.queries.VectorOps.cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"))
  }

  /** IVFADC+R serving from the streamed code-bearing index (the v13
    * tiers over this lake's layout), two PRUNED scans:
    *  1. SHORTLIST — read only (id, codes) of the probed `cell=`
    *     partitions (column pruning keeps the wide vector column
    *     unread) and rank candidates by the per-subspace ADC lookup
    *     score against query LUT literals; keep the top `rshort`
    *     per query on the exact integer micro-unit score (the v12
    *     fixed-point convention — no cross-engine float ties).
    *  2. RE-RANK — read (id, vector) of the probed partitions joined
    *     to the broadcast shortlist; exact cosine, top `k`.
    * This is the read pattern the stored codes buy at 100 TB: vector
    * bytes are touched for |queries| x rshort rows, never per
    * candidate. Requires the index to have been built with
    * applyBatch(codebook = Some(cb)). */
  def probePq(spark: SparkSession, dir: String,
      cent: Array[Array[Double]], cb: Array[Array[Array[Double]]],
      queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, rshort: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.queries.VectorOps
    val m = VectorOps.PqM
    val probes = queries
      .select(col(idCol).as("qid") +: col(vecCol).as("qe") +:
        explode(VectorOps.nearestCells(cent, col(vecCol), nprobe)).as("pc") +:
        (0 until m).map(i => VectorOps.pqLutCol(cb, i, vecCol).as(s"l$i")): _*)
      .select(col("qid") +: col("qe") +: (-col("pc.nc")).as("cell") +:
        (0 until m).map(i => col(s"l$i")): _*)
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)) // ≤ #cells rows: centroid-bounded
    val codesIdx = readIndex(spark, dir)
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol).as("cid") +: col("cell").cast("long").as("cell") +:
        (0 until m).map(i => col(s"c$i")): _*)
    val slW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid").asc)
    val sl = codesIdx.join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("score", VectorOps.pqScoreCol)
      .withColumn("rn", row_number().over(slW))
      .filter(col("rn") <= rshort)
      .select(col("qid"), col("cid"), col("qe"))
    val vecs = readIndex(spark, dir)
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol).as("cid"), col(vecCol).as("ce"))
    val rW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    vecs.join(broadcast(sl), Seq("cid"))
      .withColumn("cos", graft.queries.VectorOps.cosine("qe", "ce"))
      .withColumn("rank", row_number().over(rW))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"))
  }

  /** The offline OPTIMIZE pass, INCREMENTAL per cell: fold the
    * batches applied since the last compaction into a new
    * cell-partitioned root, Spark-rewriting ONLY the cells those
    * batches touched; every untouched cell's directory is carried
    * into the new root as a byte-for-byte file copy (spec-pinned
    * byte-stability — the st11 untouched-bucket convention). Work per
    * pass is proportional to (old data in touched cells + the new
    * deltas), not to index size, which is what lets a 100-TB lake run
    * the small-file merge continuously: a batch touches few cells, so
    * most of the index is never read, let alone rewritten. (A
    * same-filesystem rename of the untouched dirs would be O(1)
    * instead of a copy; the copy keeps the staging root self-
    * contained so a crash mid-stage can never have moved files OUT
    * of the live root.)
    *
    * Crash-safe by VERSIONED roots + the atomic marker (the
    * StreamingHeavyHitters convention — never an in-place swap of a
    * live directory): the new root is staged and renamed to
    * `compacted_v<upTo>`, a name no reader resolves until the
    * `_compacted` marker flips to upTo AFTER the rename; a crash
    * before the flip leaves readers on the old root + batch dirs
    * (both untouched), a crash after it leaves only unreferenced
    * garbage (stale roots / folded batch dirs), which the cleanup
    * tail — and any later compact — deletes. A redelivery of a purged
    * batch id still no-ops on the `_current` marker, which compaction
    * never touches. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val upTo = StateMarker.lastApplied(dir)
    val prev = compactedUpTo(dir)
    if (upTo < 0 || upTo == prev) return // nothing new
    val newBatchDirs = ((prev + 1) to upTo)
      .map(b => new java.io.File(s"$dir/cells/b$b")).filter(_.isDirectory)
    val oldRoot = Option(new java.io.File(s"$dir/compacted_v$prev"))
      .filter(f => prev >= 0 && f.isDirectory)
    if (newBatchDirs.isEmpty && oldRoot.isEmpty) return // only empty batches
    def cellDirs(root: java.io.File): Seq[java.io.File] =
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("cell=")).toSeq
    val touched = newBatchDirs.flatMap(cellDirs).map(_.getName).toSet
    val staged = new java.io.File(s"$dir/compacted_v${upTo}__staging")
    org.apache.commons.io.FileUtils.deleteQuietly(staged)
    if (touched.nonEmpty) {
      // touched cells: one Spark rewrite over (old root ∩ touched) +
      // the new batch deltas — the cell filter prunes both scans to
      // the touched `cell=` partitions
      val touchedVals = touched.toSeq.map(_.stripPrefix("cell=").toLong)
      val roots = oldRoot.map(_.getPath).toSeq ++ newBatchDirs.map(_.getPath)
      roots.map(p => spark.read.option("basePath", p).parquet(p))
        .reduce(_ unionByName _)
        .filter(col("cell").isin(touchedVals: _*))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(staged.getPath)
    } else Files.createDirectories(staged.toPath)
    // untouched cells: byte-for-byte carry-over from the old root
    oldRoot.foreach { or =>
      cellDirs(or).filterNot(f => touched(f.getName)).foreach { f =>
        org.apache.commons.io.FileUtils.copyDirectory(
          f, new java.io.File(staged, f.getName))
      }
    }
    VersionedRoot.goLive(staged, Paths.get(s"$dir/compacted_v$upTo"),
      dir, upTo, markerName = "_compacted")
    // cleanup: everything below is unreferenced once the marker flipped
    VersionedRoot.sweep(new java.io.File(dir)) { n =>
      n.startsWith("compacted_v") && n != s"compacted_v$upTo"
    }
    VersionedRoot.sweep(new java.io.File(s"$dir/cells")) { n =>
      VersionedRoot.versionOf(n, "b").exists(_ <= upTo)
    }
  }
}
