package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{TrainedIndex, VectorOps}

/** One-off probe: the IVF cell-size histogram at a given k — the
  * denominator behind every Σ cell² pair-volume claim (v07/v14/v16).
  * A k-insensitive batch-serve wall time means the pair stream is
  * skew-bound (one giant cell), not volume-bound, and the fix is
  * cell-count AND balance, not cell count alone.
  *
  * Usage: graft.tools.CellHist <sfDir> [k ...]
  */
object CellHist {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, d)
    ks.foreach { k =>
      val cent = TrainedIndex.centroids(spark, d, k = k)
      val sizes = e.select((-element_at(
          VectorOps.nearestCells(cent, col("embedding"), 1), 1)
          .getField("nc")).as("cell"))
        .groupBy("cell").count()
        .orderBy(col("count").desc)
        .collect().map(r => r.getLong(1))
      val n = sizes.sum
      val pairs = sizes.map(s => s * s).sum
      println(s"k=$k cells=${sizes.length} n=$n largest=${sizes.take(5).mkString(",")} " +
        f"largest_frac=${sizes.head.toDouble / n}%.3f sum_sq=$pairs")
    }
    spark.stop()
  }
}
