package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and bucketed range joins — time-series operators Spark's
  * built-in join set lacks (the reference has no as-of machinery either;
  * these are part of the beyond-reference time-series surface, composed
  * from existing ops per the build brief's preference order (a)).
  *
  * Scale design — neither operator is an inequality nested-loop:
  *  - `leftAsOf` is the union-and-window trick: tag both inputs, union,
  *    one shuffle on the key, and a running `last(ignoreNulls)` window
  *    carries the newest right payload forward onto each left row.
  *    O(n log n) per key partition, no range probe, no broadcast of the
  *    right side.
  *  - `rangeJoin` buckets timestamps into window-width buckets and
  *    equi-joins each left bucket to right buckets {b−1, b} before the
  *    exact predicate — the classic two-bucket trick that turns an
  *    inequality join into a shuffle-hash join with a cheap residual
  *    filter.
  */
object AsOfJoin {

  /** For each left row: the latest right row with right.ts <= left.ts in
    * the same key group. Right payload columns come back renamed
    * `<prefix><name>` (null when no prior right row exists). */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType

    val l2 = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lStruct.as("__l"), lit(null).cast(pType).as("__p"), lit(1).as("__tag"))
    val r2 = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(null).cast(lType).as("__l"), pStruct.as("__p"), lit(0).as("__tag"))

    // right rows sort before left rows at equal ts => ties are inclusive
    // (right.ts == left.ts matches), mirroring ASOF ... ON l.ts >= r.ts
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = payloadCols.map(c => col(s"__m.$c").as(prefix + c))
    matched.select(leftCols ++ matchCols: _*)
  }

  /** Pairs (l, r) in the same key group with r.ts in
    * [l.ts − window, l.ts]. `tsMillis` columns are epoch millis. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsMillisCol: String, windowMs: Long, rightSuffix: String = "_r"): DataFrame = {
    val l2 = left.withColumn("__b", (col(tsMillisCol) / windowMs).cast("long"))
    val rCols = right.columns
    val r2 = right.toDF(rCols.map(c =>
        if (c == keyCol) c else c + rightSuffix): _*)
      .withColumn("__rb",
        (col(tsMillisCol + rightSuffix) / windowMs).cast("long"))
      // each right row lands in its own bucket and the next one, so any
      // left row within windowMs ahead of it shares a bucket key
      .withColumn("__b", explode(array(col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    l2.join(r2, Seq(keyCol, "__b"))
      .filter(col(tsMillisCol + rightSuffix) <= col(tsMillisCol) &&
        col(tsMillisCol + rightSuffix) >= col(tsMillisCol) - windowMs)
      .drop("__b")
  }
}
