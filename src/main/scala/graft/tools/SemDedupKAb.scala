package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for SemDeDup's cluster-count prescription (v07/v07b doc:
  * "k tracks sqrt(n) at scale so per-cluster occupancy — and thus
  * per-vector compare cost — stays constant"): runs the v07
  * cluster-then-compare kernel at the given SF dir for each k and
  * prints the pair volume (Σ per-cluster m·(m−1)/2 — the quadratic
  * term the cluster is there to bound) and the median-of-3 wall time
  * of the pair-compare stage. Run at sf0.1 and a 10× ScaleFixture
  * copy: with k fixed the pair volume grows ~n²/k (≈100×/k), with
  * k ∝ sqrt(n) it grows ~n·sqrt(n)/k₀ — the measured difference is
  * the BENCH_SCALE row.
  *
  * Usage: graft.tools.SemDedupKAb <sfDir> <k1> [<k2> ...]
  */
object SemDedupKAb {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val ks = args.drop(1).map(_.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.CosineSimilarity.register(spark)

    val e = graft.sources.Tables.embeddings(spark, d)
    val n = e.count()
    println(s"n=$n  dir=$d")

    ks.foreach { k =>
      // the EXACT v07 kernel at cluster count k (shared helper — the
      // A/B must measure the gated code path, not a re-implementation)
      val asg = graft.queries.VectorOps.semDedupAsg(spark, d, k)
        .localCheckpoint(true) // time ONLY the pair stage below
      val occ = asg.groupBy(col("cluster_seed")).agg(count(lit(1)).as("m"))
      val pairVol = occ.agg(sum(col("m") * (col("m") - 1) / 2)).head().getDouble(0)
      val maxOcc = occ.agg(max(col("m"))).head().getLong(0)

      def pairStage(): Long =
        graft.queries.VectorOps.semDedupDropped(spark, asg).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val dropped = pairStage()
        ((System.nanoTime() - t0) / 1e9, dropped)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"k=$k%-4d pairVol=${pairVol}%.3e  maxOcc=$maxOcc%-8d " +
        f"dropped=${times.head._2}%-8d pairStage=${med}%.2f s (median of 3)")
    }
    spark.stop()
  }
}
