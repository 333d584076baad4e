package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance (IVM): keep
  * `view = fact LEFT JOIN latest(dim)` current under micro-batches of
  * fact APPENDS and dim UPSERTS, with per-batch work proportional to
  * the DELTAS — never to the view.
  *
  *  - The dim state is latest-per-key (key-cardinality sized; higher
  *    batch id wins), republished whole per batch through the same
  *    version-dir + atomic-pointer protocol as IncrementalAggregate —
  *    it is the small side, a full rewrite is O(|dim keys|).
  *  - The view is hash-bucketed on the join key
  *    (`pmod(hash(key), buckets)` partition column) and maintained via
  *    DYNAMIC partition overwrite: a batch rewrites ONLY the buckets
  *    its deltas touch. Untouched bucket directories are not read and
  *    not written (IncrementalJoinSpec pins their files byte-stable).
  *  - Touched-bucket rebuild: existing rows whose fact id is NOT in
  *    the fact delta survive; survivors whose key IS in the dim delta
  *    get their dim columns re-joined (this also heals fact rows that
  *    arrived BEFORE their dim key — the left-join null fills in when
  *    the dim upsert lands); delta facts left-join the fresh dim state
  *    and append. Every step is a pure function of (previous view,
  *    batch deltas), so a crash-redelivered batch rebuilds the same
  *    buckets to the same bytes — idempotent without a write-ahead
  *    log. The `_applied` marker only short-circuits no-op replays.
  *
  * At 100 TB: the view never moves through a single writer, bucket
  * count bounds rewrite granularity, and a batch's cost is
  * O(|Δfact| + |Δdim| + size of touched buckets) — the standard
  * delta-view tradeoff (more buckets → finer rewrites, more files).
  */
object IncrementalJoin {

  final case class Config(
      factId: String,    // unique fact row id (dedup anchor)
      key: String,       // join key, present in fact and dim
      buckets: Int = 8)

  private def dimDir(dir: String) = dir + "/dim"
  private def viewDir(dir: String) = dir + "/view"

  private[graft] def lastApplied(dir: String): Long =
    StateMarker.lastApplied(dir, "_applied")

  private def publishMarker(dir: String, batchId: Long): Unit =
    StateMarker.publish(dir, batchId, name = "_applied")

  /** Latest-per-key dim state as of the last applied batch (empty
    * schema-less None if no dim batch ever landed). */
  private def readDim(spark: SparkSession, dir: String): Option[DataFrame] = {
    val v = StateMarker.lastApplied(dimDir(dir))
    if (v < 0) None
    else Some(spark.read.parquet(dimDir(dir) + "/v" + v))
  }

  private def publishDim(merged: DataFrame, dir: String, batchId: Long): Unit = {
    merged.write.mode(SaveMode.Overwrite)
      .parquet(dimDir(dir) + "/v" + batchId)
    Files.createDirectories(Paths.get(dimDir(dir)))
    StateMarker.publish(dimDir(dir), batchId)
  }

  /** The maintained view (fact columns + dim columns, left-join
    * semantics; `__bucket` partition column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(viewDir(dir)).drop("__bucket")

  /** Apply one micro-batch. `factDelta` columns: factId, key, fact
    * payload. `dimDelta` columns: key, dim payload (≤1 row per key per
    * batch — pre-dedup upstream if needed). Either side may be empty. */
  def applyBatch(factDelta: DataFrame, dimDelta: DataFrame, batchId: Long,
      cfg: Config, dir: String): Unit = {
    if (batchId <= lastApplied(dir)) return // no-op replay
    val spark = factDelta.sparkSession
    Files.createDirectories(Paths.get(dir))

    // 1. merge dim state: higher batch wins per key
    val prevDim = readDim(spark, dir)
    val taggedDelta = dimDelta.withColumn("__b", lit(batchId))
    val mergedDim = prevDim match {
      case None => taggedDelta
      case Some(old) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(cfg.key)).orderBy(col("__b").desc)
        old.unionByName(taggedDelta)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }
    // dim state is key-sized; checkpoint breaks lineage onto this batch
    val dimState = mergedDim.localCheckpoint(true)
    // publish only when there is dim state to publish: a first batch with
    // an empty dimDelta would otherwise write a zero-part-file parquet dir
    // that a later readDim cannot infer a schema from
    if (prevDim.nonEmpty || !dimDelta.isEmpty) publishDim(dimState, dir, batchId)
    val dimOut = dimState.drop("__b")
    val dimCols = dimOut.columns.filterNot(_ == cfg.key).toSeq

    // 2. which buckets does this batch touch?
    def bucketOf(c: org.apache.spark.sql.Column) =
      pmod(hash(c), lit(cfg.buckets))
    val touched = factDelta.select(bucketOf(col(cfg.key)).as("b"))
      .union(dimDelta.select(bucketOf(col(cfg.key)).as("b")))
      .distinct().collect().map(_.getInt(0)).toSeq // ≤ cfg.buckets values
    if (touched.isEmpty) { publishMarker(dir, batchId); return }

    // 3. rebuild touched buckets only
    val factB = factDelta.withColumn("__bucket", bucketOf(col(cfg.key)))
    val newRows = factB.join(broadcast(dimOut), Seq(cfg.key), "left")
    val viewExists = {
      val root = Paths.get(viewDir(dir)).toFile
      root.isDirectory && root.listFiles() != null &&
        root.listFiles().exists(f => f.isDirectory && f.getName.startsWith("__bucket="))
    }
    val rebuilt = if (!viewExists) newRows else {
      val oldTouched = spark.read.parquet(viewDir(dir))
        .filter(col("__bucket").isin(touched: _*))
      val survivors = oldTouched.join(
        broadcast(factDelta.select(col(cfg.factId))), Seq(cfg.factId),
        "left_anti")
      val dimKeys = broadcast(dimDelta.select(col(cfg.key)))
      val keep = survivors.join(dimKeys, Seq(cfg.key), "left_anti")
      val refreshed = survivors.join(dimKeys, Seq(cfg.key), "left_semi")
        .drop(dimCols: _*)
        .join(broadcast(dimOut), Seq(cfg.key), "left")
      keep.unionByName(refreshed).unionByName(newRows)
    }
    // materialize BEFORE the overwrite: the plan reads the same
    // partitions it is about to replace
    val out = rebuilt.localCheckpoint(true)
    out.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // per-write, not session
      .partitionBy("__bucket").parquet(viewDir(dir))
    publishMarker(dir, batchId)
  }
}
