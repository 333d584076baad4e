package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-ingest checkpoint store (SURVEY §2.1 S11 + §2.10;
  * reference: DynamoDB items keyed (endpoint, parameter_hash) carrying
  * last_completed_season / last_ingested_date, checkpoint.py:18-45).
  *
  * Spark shape: a tiny key-value parquet table read/written from the
  * driver — same get/put/skip-completed contract, no external service.
  * Writes replace the whole table (it is O(endpoints) rows); readers
  * see either the old or the new atomic parquet commit.
  */
final class CheckpointStore(spark: SparkSession, path: String) {

  import spark.implicits._

  final case class Entry(endpoint: String, paramHash: String,
      lastCompletedSeason: Option[Int], lastIngestedDate: Option[String])

  private def readAll(): Map[(String, String), (Option[Int], Option[String])] =
    try {
      spark.read.parquet(path).collect().map { r =>
        (r.getAs[String]("endpoint"), r.getAs[String]("paramHash")) ->
          ((Option(r.getAs[Any]("lastCompletedSeason")).map(_.asInstanceOf[Number].intValue()),
            Option(r.getAs[String]("lastIngestedDate"))))
      }.toMap
    } catch { case _: Throwable => Map.empty }

  def get(endpoint: String, paramHash: String): Option[(Option[Int], Option[String])] =
    readAll().get((endpoint, paramHash))

  def isSeasonCompleted(endpoint: String, paramHash: String, season: Int): Boolean =
    get(endpoint, paramHash).exists(_._1.exists(_ >= season))

  def put(endpoint: String, paramHash: String,
      lastCompletedSeason: Option[Int] = None,
      lastIngestedDate: Option[String] = None): Unit = {
    val updated = readAll() +
      ((endpoint, paramHash) -> ((lastCompletedSeason, lastIngestedDate)))
    val df = updated.toSeq.map { case ((e, h), (s, d)) =>
      (e, h, s.map(Integer.valueOf).orNull, d.orNull)
    }.toDF("endpoint", "paramHash", "lastCompletedSeason", "lastIngestedDate")
    // write-then-swap for atomicity on local/object-store filesystems
    val tmp = path + "__tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
