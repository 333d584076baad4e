package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off probe for the gr03b convergence gate: prints the per-round
  * changed-label count of synchronous min-tie label propagation on the
  * gr03 co-purchase graph at the given SF dirs, and whether the walk
  * converges (zero changed) or enters a period-2 oscillation. The
  * gate's oracle unrolls the measured round count at the gate SF
  * (sf0.01); the bench SFs (sf0.001, sf0.1) must also converge or the
  * suite would throw there. Counts are exact integers — no drift risk
  * in the pinned number (the PrProbe/gr02b recipe, minus even the
  * tolerance choice). */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val selfVote = sys.env.get("LP_SELF_VOTE").contains("1")
    println(s"selfVote=$selfVote")
    dirs.foreach { d =>
      val edges = graft.queries.Relational.coPurchaseEdges(spark, d)
      val undir = edges.select(col("pa").as("s"), col("pb").as("t"))
        .union(edges.select(col("pb").as("s"), col("pa").as("t")))
      // self-vote variant: each node is its own neighbor (one self-loop)
      val dir2 = (if (selfVote)
          undir.union(undir.select(col("s")).distinct()
            .select(col("s"), col("s").as("t")))
        else undir)
        .localCheckpoint(true)
      var labels = dir2.select(col("s").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(true)
      println(s"dir=$d nodes=${labels.count()} dirEdges=${dir2.count()}")
      var prevPrev: org.apache.spark.sql.DataFrame = null
      val w = Window.partitionBy(col("node"))
        .orderBy(col("n").desc, col("label").asc)
      var round = 0
      var done = false
      while (round < 40 && !done) {
        round += 1
        val next = dir2
          .join(labels.select(col("node").as("s"), col("label")), Seq("s"))
          .groupBy(col("t").as("node"), col("label"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("node"), col("label"))
          .localCheckpoint(true)
        val changed = next
          .join(labels.withColumnRenamed("label", "__prev"), Seq("node"))
          .filter(col("label") =!= col("__prev")).count()
        val cycled = prevPrev != null && changed > 0 && {
          next.join(prevPrev.withColumnRenamed("label", "__pp"), Seq("node"))
            .filter(col("label") =!= col("__pp")).count() == 0L
        }
        println(s"  round=$round changed=$changed" +
          (if (cycled) "  <-- period-2 oscillation" else ""))
        if (changed == 0L || cycled) done = true
        prevPrev = labels
        labels = next
      }
    }
    spark.stop()
  }
}
