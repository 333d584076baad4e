package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.VectorOps

/** Measurement harness for v16's cell-count scaling rule (the
  * KnnGraphAb pattern applied to BATCH IVFADC+R serving): with every
  * corpus vector querying the index, the ADC join's pair volume is
  * nprobe * n^2 / k, so a FIXED cell count goes quadratic as the
  * corpus grows while k ~ sqrt(n) holds it to n^1.5 (per-query
  * candidate lists grow sqrt(n)) and k ~ n holds pairs-per-query
  * flat at the price of recall per probe. Runs the shared v16 kernel
  * (VectorOps.ivfAdcBatchServe — one copy with the gate) at both k
  * values on the given SF dir and prints wall times.
  *
  * Usage: graft.tools.BatchServeAb <sfDir> [kFixed kScaled [passes]]
  */
object BatchServeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val kFixed = if (args.length > 1) args(1).toInt else 8
    val kScaled = if (args.length > 2) args(2).toInt else 25
    val passes = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(k: Int): Double = {
      val t0 = System.nanoTime()
      VectorOps.ivfAdcBatchServe(spark, sfDir, nprobe = 2, r = 25,
          kCells = k)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(kFixed, kScaled).foreach(once) // warm (also trains artifacts)
    Seq(kFixed, kScaled).foreach { k =>
      val ts = (1 to passes).map(_ => once(k)).sorted
      val med = ts(ts.size / 2)
      println(f"batch_serve k=$k%-4d median=$med%8.3f s  samples=" +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
