package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of hopEdges' two plan regimes (VERDICT r13
  * #2): the isin arm (frontier ids inlined into the stored edge scan's
  * PushedFilters) vs the plain broadcast-join arm, across frontier
  * sizes — the measurement behind the HopPushdownMaxIds cap. Frontiers
  * are synthesized from the stored edge artifact's own src ids (every
  * j-th of the sorted distinct set, so the ids spread across the
  * src-sorted artifact's row groups the way a real walk's do), one
  * untimed warm pass, then `passes` timed passes interleaved
  * isin,join,isin,join per size. Results drain through the noop write.
  *
  * Usage: HopPushAb <sfDir> <passes> [sizes] (comma list, default
  * 16,64,256,1024,4096) [via run_verify.sh's classpath].
  */
object HopPushAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val sizes = (if (args.length > 2) args(2) else "16,64,256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val (edges, _) = graft.queries.TrainedIndex
      .graph(spark, sfDir, degree = 16, kCells = 8)
    val srcAll = edges.select(col("src")).distinct()
      .orderBy(col("src")).collect().map(_.getLong(0))
    println(s"edge src universe: ${srcAll.length} distinct ids")

    def frontierOf(n: Int) = {
      val step = math.max(1, srcAll.length / n)
      val ids = srcAll.indices.by(step).take(n).map(srcAll(_))
      (ids.size,
        ids.map(id => (id % 20, id)).toDF("qid", "cid").localCheckpoint(true))
    }

    def once(frontier: org.apache.spark.sql.DataFrame, cap: Int): Double = {
      val t0 = System.nanoTime()
      graft.queries.VectorOps.hopEdges(edges, frontier, maxPushIds = cap)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    for (nReq <- sizes) {
      // label rows with the ACTUAL frontier size — a requested n above
      // the src universe would otherwise record a small-frontier timing
      // under a large-regime label
      val (n, f) = frontierOf(nReq)
      once(f, Int.MaxValue); once(f, 0) // warm both plans
      var isin = Vector.empty[Double]; var join = Vector.empty[Double]
      for (_ <- 1 to passes) {
        isin = isin :+ once(f, Int.MaxValue)
        join = join :+ once(f, 0)
      }
      val (mi, mj) = (median(isin), median(join))
      println(f"hop_push n=$n%-5d isin=$mi%7.3f s  join=$mj%7.3f s  " +
        f"isin/join=${mi / mj}%6.3f  " +
        s"isin_samples=${isin.map(x => f"$x%.3f").mkString(",")}  " +
        s"join_samples=${join.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
