package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * Reads are plain `spark.read.parquet` so Catalyst's vectorized reader,
  * predicate pushdown, and column pruning all apply — at cluster scale the
  * same call reads a Hive-partitioned directory tree and partition pruning
  * kicks in for free (reference: gold/_io_helpers.py:20-67 does this by
  * hand with S3 prefix filters; Spark's FileSourceScanExec subsumes it).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark 4
    * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as a
    * raw long (legacy.parquet.nanosAsLong) and truncate ns → µs, which is
    * exactly what DuckDB does when it loads the same file (its TIMESTAMP
    * is µs-precision), so engine/oracle comparisons see identical values
    * and identical ordering.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    // only the driver's NANOS file needs the long→µs conversion; a
    // re-materialized copy (e.g. tools.ScaleFixture) already carries a
    // proper µs timestamp column
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // a naive timestamp[us] file infers as TIMESTAMP_NTZ under Spark 4's
      // parquet reader; normalize to the session-TZ instant type (sessions
      // pin UTC, so values are identical) — every downstream epoch/
      // watermark call site assumes the instant type, and the DuckDB
      // oracle coerces its naive read the same way under a UTC host
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
