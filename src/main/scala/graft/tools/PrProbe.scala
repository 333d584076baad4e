package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the gr02b convergence gate: prints the exact
  * integer L-infinity micro-unit rank delta after each PageRank round
  * on the gr02 co-purchase graph at the given SF dirs. The pinned
  * tolMicro must fall strictly between the round-K and round-K+1
  * deltas at the gate SF (sf0.01) — the deltas are exact BIGINTs, so
  * any value in the open interval pins K with zero drift risk (the
  * dm10d recipe, minus the float-margin worry). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { d =>
      val li = graft.sources.Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.groupBy(col("o"))
        .agg(array_sort(collect_set(col("p"))).as("ps"))
        .select(col("o"), explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"))
          .as("pr"))
        .select(col("o"), col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      val edges = pairs.groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("no"))
        .filter(col("no") >= 2)
        .select(col("pa"), col("pb"))
      val e = edges.select(col("pa").as("s"), col("pb").as("t"))
        .filter(col("s") =!= col("t")).distinct()
      val dir2 = e.unionAll(e.select(col("t").as("s"), col("s").as("t")))
        .localCheckpoint(true)
      val outdeg = dir2.groupBy(col("s")).agg(count(lit(1)).as("od"))
      val withDeg = dir2.join(outdeg, Seq("s")).localCheckpoint(true)
      var ranks = outdeg.select(col("s").as("node"), lit(1000000L).as("pm"))
        .localCheckpoint(true)
      (1 to 12).foreach { it =>
        val next = withDeg
          .join(ranks, col("s") === col("node"))
          .groupBy(col("t"))
          .agg(sum(expr("(pm * 85) div (100 * od)")).as("m"))
          .select(col("t").as("node"), (lit(150000L) + col("m")).as("pm"))
          .localCheckpoint(true)
        val row = next.join(
            ranks.select(col("node"), col("pm").as("pm0")), Seq("node"))
          .agg(max(abs(col("pm") - col("pm0"))).as("d"))
          .head()
        val delta = if (row.isNullAt(0)) 0L else row.getLong(0)
        println(s"$d round=$it linfDeltaMicro=$delta")
        ranks = next
      }
    }
    spark.stop()
  }
}
