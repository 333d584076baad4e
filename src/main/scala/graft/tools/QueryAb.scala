package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of registered `SparkEntry` queries — the
  * only trustworthy comparison signal on a contended host (cross-JVM
  * wall times swing several-fold; see BENCH_SCALE.md). Runs one untimed
  * warm pass per query, then `passes` timed passes interleaved
  * A,B,A,B,... so a contention window hits both sides equally, and
  * prints per-query medians plus the ratio of each query to the first.
  *
  * Results drain through the noop write (every output column evaluated,
  * nothing shipped) — `count()` would let Catalyst prune the compute.
  *
  * Usage: QueryAb <sfDir> <passes> <queryA> <queryB> [more...] [via
  * run_verify.sh's classpath + --add-opens set].
  */
object QueryAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "need at least one query name")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(once) // warm: JIT + codegen cache + page cache
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to passes; n <- names) samples(n) = samples(n) :+ once(n)

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val meds = names.map(n => n -> median(samples(n)))
    val base = meds.head._2
    meds.foreach { case (n, m) =>
      println(f"$n%-28s median=$m%8.3f s  ratio_vs_${names.head}=${m / base}%6.3f  " +
        s"samples=${samples(n).map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
