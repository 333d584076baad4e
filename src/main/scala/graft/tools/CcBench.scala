package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operator-isolated A/B of the two connected-components kernels
  * (large-star/small-star `minLabel` vs the pre-r7 min-label
  * propagation) on identical synthetic edge sets:
  *
  *  - `clusters N`: N 5-node dup-cluster-shaped components (a 4-star
  *    plus one chord) — the d05 workload shape, diameter 2.
  *  - `chain N`: one N-node path — diameter N-1, the adversarial case
  *    where propagation needs N-1 rounds (and silently BAILS at
  *    maxRounds, returning unconverged labels).
  *
  * Usage: CcBench <clusters|chain> <n> [cpus]. Prints one line per
  * algorithm: wall seconds + number of distinct components found (the
  * correctness tell: a bailed propagation reports too many).
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val shape = args(0)
    val n = args(1).toLong
    val cpus = if (args.length > 2) args(2) else "32"
    val only: Option[String] = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = shape match {
      case "clusters" =>
        // component c spans ids [5c, 5c+4]: star 5c->{+1..+4} + chord
        spark.range(n).select(col("id").as("c"))
          .select(explode(expr(
            "array(struct(c*5 AS src, c*5+1 AS dst), " +
            "struct(c*5 AS src, c*5+2 AS dst), struct(c*5 AS src, c*5+3 AS dst), " +
            "struct(c*5 AS src, c*5+4 AS dst), struct(c*5+3 AS src, c*5+4 AS dst))")).as("e"))
          .select(col("e.src"), col("e.dst"))
      case "chain" =>
        spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
      case other => sys.error(s"unknown shape: $other")
    }
    val e = edges.localCheckpoint(true)

    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = f
      val comps = out.select(countDistinct(col("component"))).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-12s $secs%8.2f s  components=$comps")
      out.unpersist()
    }
    // JIT/codegen warmup on a tiny graph so the first timed run isn't cold
    val warm = spark.range(200)
      .select(col("id").as("src"), (col("id") % 100).as("dst"))
      .localCheckpoint(true)
    graft.operators.ConnectedComponents.minLabel(warm).unpersist()
    graft.operators.ConnectedComponents.minLabelStar(warm).unpersist()
    graft.operators.ConnectedComponents.minLabelPropagation(warm).unpersist()
    warm.unpersist()

    def want(name: String) = only.forall(_ == name)
    if (want("hybrid"))
      time("hybrid")(graft.operators.ConnectedComponents.minLabel(e))
    if (want("star"))
      time("star")(graft.operators.ConnectedComponents.minLabelStar(e))
    if (want("propagation"))
      time("propagation")(graft.operators.ConnectedComponents.minLabelPropagation(e))
    spark.stop()
  }
}
