package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Train-once/serve-many cache for the ANN index artifacts (VERDICT
  * r11 #3): every serving gate used to re-run `KMeans.fitConverged`
  * and `pqCodebook` inside the gate, so a 5-pass bench paid the
  * training cost 5x per query while the probe itself was sub-second.
  * Production freezes artifacts; this is that shape in-process — the
  * first demand per (sfDir, k) trains, WRITES THROUGH the versioned
  * `IndexArtifacts` store, and memoizes what it LOADS BACK, so every
  * served probe in the JVM runs off persisted artifacts (the load
  * path is always exercised; doubles round-trip parquet bit-exactly,
  * so results are identical to the in-gate training they replace and
  * the DuckDB oracles that replay training still hash-match — the
  * v15 gate pins exactly this).
  *
  * The store root is a PER-JVM temp directory: artifacts never leak
  * across driver rounds (the test data regenerates at round
  * boundaries, so any cross-process reuse would serve a stale index).
  * Training-semantics gates (v05b-d, v12's codebook CTEs) do NOT go
  * through here — they gate the build itself and keep their own
  * in-gate training.
  */
object TrainedIndex {

  private lazy val root: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_index_")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(d.toFile)
    d.toString
  }

  private val centCache = TrieMap.empty[(String, Int), Array[Array[Double]]]
  private val cbCache = TrieMap.empty[String, Array[Array[Array[Double]]]]

  /** TrieMap.getOrElseUpdate may evaluate the thunk more than once
    * under a concurrent miss (Verify runs gates in parallel), and two
    * trainings racing on one artifact dir corrupt each other's
    * `_temporary` staging — fill under a lock, fast-path reads free. */
  private val fillLock = new Object

  private def store(d: String, kind: String): String =
    s"$root/${java.util.UUID.nameUUIDFromBytes(d.getBytes("UTF-8"))}/$kind"

  /** IVF coarse centroids for `d`'s embeddings at the standard recipe
    * (maxIter=25, tol=0.12 — the recipe every geometric-cell gate and
    * its KmeansSql oracle pin). */
  def centroids(s: SparkSession, d: String, k: Int): Array[Array[Double]] =
    centCache.getOrElse((d, k), fillLock.synchronized {
      centCache.getOrElseUpdate((d, k), {
        val (_, cent, _) = graft.operators.KMeans.fitConverged(
          s, Tables.embeddings(s, d), k = k, maxIter = 25, tol = 0.12)
        val dir = store(d, s"cent_k$k")
        graft.sources.IndexArtifacts.save(s, dir, Some(cent))
        graft.sources.IndexArtifacts.loadCentroids(s, dir)
      })
    })

  /** PQ codebook for `d`'s embeddings (the VectorOps.pqCodebook
    * recipe — m/k/subDim are module constants). */
  def codebook(s: SparkSession, d: String): Array[Array[Array[Double]]] =
    cbCache.getOrElse(d, fillLock.synchronized {
      cbCache.getOrElseUpdate(d, {
        val cb = VectorOps.pqCodebook(s, d)
        val dir = store(d, "pq")
        graft.sources.IndexArtifacts.save(s, dir,
          centroids = None, codebook = Some(cb))
        graft.sources.IndexArtifacts.loadCodebook(s, dir).get
      })
    })
}
