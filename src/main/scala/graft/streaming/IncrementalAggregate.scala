package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once incremental aggregate maintenance (SURVEY §2.10 — the
  * "gold table kept current by a stream" shape the reference approximates
  * with its rolling 7-day batch re-pull, orchestrate.py:366-379):
  * each micro-batch's per-key partials merge into a parquet running
  * table via read → union → re-aggregate → write-then-rename.
  *
  * Exactly-once: foreachBatch MAY redeliver the last batch after a
  * crash/restart, so the applied batch id is committed ATOMICALLY with
  * the data — a `_batch_id` marker written inside the temp dir before
  * the single rename that publishes it. A replayed batch sees
  * `batchId <= lastApplied` and no-ops; a crash before the rename
  * leaves the old table + old marker, and the redelivered batch
  * applies cleanly. There is no window where data and marker disagree.
  *
  * Scale: the running table is key-cardinality-sized (never
  * event-sized), each micro-batch aggregates map-side before touching
  * it, and raw events are never retained — the merge cost is
  * O(|keys|) per batch at any event volume.
  */
object IncrementalAggregate {

  /** Start maintaining `tableDir` from a streaming frame of raw rows. */
  def start(events: DataFrame, key: String, valueCol: String,
      tableDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, key, valueCol, tableDir)
      }
      .start()

  /** The maintained table: (key, n, total). */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(dataPath(tableDir))

  private def dataPath(tableDir: String) = tableDir + "/data"

  private[graft] def lastApplied(tableDir: String): Long = {
    val m = Paths.get(dataPath(tableDir), "_batch_id")
    if (Files.exists(m))
      new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      key: String, valueCol: String, tableDir: String): Unit = {
    if (batchId <= lastApplied(tableDir)) return // redelivery after restart
    val spark = batch.sparkSession
    val partial = batch.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    val data = dataPath(tableDir)
    val existing =
      try Some(spark.read.parquet(data)) catch { case _: Throwable => None }
    val merged = existing match {
      case Some(cur) => cur.unionByName(partial)
        .groupBy(col(key))
        .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      case None => partial
    }
    val tmp = data + "__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // marker joins the data inside tmp, then ONE rename publishes both
    Files.write(Paths.get(tmp, "_batch_id"),
      batchId.toString.getBytes(StandardCharsets.UTF_8))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(data)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
