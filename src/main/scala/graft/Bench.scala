package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: per-query seconds at SPARK_GRAFT_SF_DIR.
  *
  * - Warmup pass at sf0.001 (when present) so JIT + codegen + catalog
  *   init don't land on the first timed query.
  * - PASS-MAJOR run order: the whole suite runs SPARK_GRAFT_BENCH_RUNS
  *   times (default 3) and each query's MEDIAN across passes is
  *   reported. Query-major order (3 back-to-back runs) let a transient
  *   host-contention window pollute all samples of one query — r3's
  *   in-suite j08=11 s vs 1.9 s isolated; spreading samples across
  *   passes makes the median robust to that.
  * - stdout stays ONE compact JSON line — the driver's contract. The
  *   capture window that stores it is 2000 chars (every BENCH_r*.json
  *   through r5 shows a tail-truncated line and parsed:null), so the
  *   stdout line keys each query by its unique operator-id prefix
  *   ("j01" for j01_broadcast_chain; uniqueness enforced by a require
  *   below) and omits the spread object — ~1.45k chars for 108
  *   queries, ~30 more queries of headroom. Full names, medians,
  *   spreads, and every
  *   per-pass sample go to SPARK_GRAFT_BENCH_OUT (default
  *   bench_out.json) for post-hoc analysis.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional name-prefix filter for local iteration (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val warmDir = "/root/testdata/sf0.001"
    // noop sink, NOT count(): count() lets Catalyst PRUNE unreferenced
    // output expressions — a query ending in an aggregate of expensive
    // per-row metrics (t16, t01, ...) would be timed on a plan that never
    // evaluates them (caught in round 6: t16's "0.33 s" at 100x was a
    // scan + empty group-by; the real cascade is ~85x that). The noop
    // write evaluates EVERY output column and ships nothing to the
    // driver.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      queries.foreach { case (_, fn) =>
        try run(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    }
    // contention reference (VERDICT r6 #8): a fixed simple agg timed at
    // the start of every pass. Host contention moves the reference and
    // the suite together, so per-query medians NORMALIZED by the ref
    // median (the `ratios` object in the detail file) are comparable
    // across rounds even when wall times aren't.
    def refQuery(): Unit = run {
      val l = org.apache.spark.sql.functions
      graft.sources.Tables.lineitem(spark, sfDir)
        .groupBy(l.col("l_returnflag"), l.col("l_linestatus"))
        .agg(l.sum(l.col("l_quantity")).as("q"),
          l.sum(l.col("l_extendedprice")).as("p"),
          l.count(l.lit(1)).as("n"))
    }
    try refQuery() catch { case _: Throwable => () } // warm the reference too
    val refSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val samples = scala.collection.mutable.LinkedHashMap(
      queries.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    (1 to runs).foreach { _ =>
      val r0 = System.nanoTime()
      try refQuery() catch { case _: Throwable => () }
      refSamples += (System.nanoTime() - r0) / 1e9
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir)) catch { case _: Throwable => () }
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val refMedian = { val s = refSamples.sorted; s(s.size / 2) }
    def ms(x: Double): Double = math.rint(x * 1000) / 1000
    val results = samples.toSeq.map { case (name, ts) =>
      val s = ts.sorted
      (name, s(s.size / 2), s.last - s.head, ts)
    }
    // short stdout key: the operator-id prefix, unique across queries
    def tag(name: String): String = name.takeWhile(_ != '_')
    require(results.map(t => tag(t._1)).distinct.size == results.size,
      "duplicate operator-id prefixes would silently drop a query from the stdout JSON")
    // stdout gets 10ms resolution (cs) — the line must stay under the
    // driver's ~2000-char capture window and per-query chars are the
    // binding constraint on suite growth; full ms precision is in the
    // detail file below
    def cs(x: Double): Double = math.rint(x * 100) / 100
    val qs = results.map { case (k, m, _, _) => "\"" + tag(k) + "\":" + cs(m) }
      .mkString("{", ",", "}")
    val total = ms(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"order":"pass-major","sf":"$sfDir"}"""
    val names = results.map { case (k, _, _, _) =>
      "\"" + tag(k) + "\":\"" + k + "\""
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, sp, _) => "\"" + k + "\":" + ms(sp) }
      .mkString("{", ",", "}")
    val perRun = results.map { case (k, _, _, ts) =>
      "\"" + k + "\":" + ts.map(ms).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val medians = results.map { case (k, m, _, _) => "\"" + k + "\":" + ms(m) }
      .mkString("{", ",", "}")
    // contention-normalized view: query median over reference median
    val ratios = results.map { case (k, m, _, _) =>
      "\"" + k + "\":" + (if (refMedian > 0) ms(m / refMedian) else -1)
    }.mkString("{", ",", "}")
    val refJson = refSamples.map(ms).mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$medians,"spread":$spreads,"names":$names,"samples":$perRun,"ref_samples":$refJson,"ref_median":${ms(refMedian)},"ratios":$ratios,"runs":$runs,"order":"pass-major","sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      full.getBytes("UTF-8"))
    catch { case _: Throwable => () } // bench must still print if cwd is read-only
    println(line)
    spark.stop()
  }
}
