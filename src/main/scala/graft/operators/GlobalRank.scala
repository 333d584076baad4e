package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global dense index (0-based rank) over a column of
  * UNIQUE values — the replacement for `Window.orderBy(v)` with no
  * partition key, which funnels the whole input through one reducer.
  *
  * Two-stage shape (the classic distributed rank): range-repartition on
  * the value, rank locally per partition (parallel — the window is
  * keyed by partition id), then add cumulative partition offsets. The
  * only global ordering ever materialized is over the per-partition
  * COUNTS (≤ `partitions` rows, bounded by config not data), so the
  * operator survives a near-unique key at any cardinality — exactly the
  * a11/spend case flagged in VERDICT r2.
  */
object GlobalRank {

  /** @param dv rows unique on `valueCol` (e.g. a `.distinct()` output)
    * @return (valueCol, idx) with idx = 0-based position in ascending
    *         `valueCol` order */
  def zeroBasedIndex(dv: DataFrame, valueCol: String, partitions: Int = 32): DataFrame = {
    // materialize the distinct-value input ONCE: the range partitioner's
    // sampling pass, the local-rank pass, and the offsets agg each
    // re-execute their input lineage, and `dv` is typically a distinct()
    // over an expensive upstream (measured: g03's spine join chain ran
    // ~4x per metric before this, ~7 s vs ~1 s for the query). The
    // checkpoint holds only the distinct set itself.
    val dvM = dv.select(col(valueCol)).localCheckpoint(true)
    val ranged = dvM
      .repartitionByRange(partitions, col(valueCol))
      .withColumn("__pid", spark_partition_id())
    // local rank: window keyed by __pid == sort within each partition
    val local = ranged.withColumn("__rn", row_number().over(
      Window.partitionBy(col("__pid")).orderBy(col(valueCol).asc)))
    // cumulative offsets over the tiny per-partition count table
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col(valueCol), (col("__off") + col("__rn") - 1).as("idx"))
  }
}
