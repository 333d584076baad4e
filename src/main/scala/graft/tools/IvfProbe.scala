package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.VectorOps

/** One-off probe for the v09 geometric-IVF gates: prints the measured
  * recall@3 (total hits over total truth) of the label-partitioned
  * (v02b/c) and KMeans-cell (v09/v09b) coarse quantizers at
  * nprobe = 1..4 on the given SF dir, so the recall tables pinned in
  * the gate doc strings are reproducible numbers, not claims. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val truth = VectorOps.bruteTruth(spark, d).cache()
    val nTruth = truth.count()
    def hits(ann: org.apache.spark.sql.DataFrame): Long =
      VectorOps.recallOf(truth, ann)
        .agg(sum(col("n_hit"))).head().getLong(0)
    val maxNp = if (args.length > 1) args(1).toInt else 4
    (1 to maxNp).foreach { np =>
      val lab = hits(VectorOps.labelAnn(spark, d, np))
      val geo = hits(VectorOps.geoAnn(spark, d, np))
      val ivfpq = hits(VectorOps.ivfPqTop3(spark, d, np))
      val rr = hits(VectorOps.ivfAdcRerank(spark, d, np, r = 25))
      println(s"nprobe=$np  label=$lab/$nTruth  kmeans=$geo/$nTruth" +
        s"  ivfpq=$ivfpq/$nTruth  ivfadc+r25=$rr/$nTruth")
    }
    spark.stop()
  }
}
