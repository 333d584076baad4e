package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{TrainedIndex, VectorOps}

/** One-off stage profile for v16 batch serving: times the corpus
  * encode, the query LUT build, the ADC-join+shortlist, and the full
  * chain separately, so "where do the seconds go" is measured rather
  * than inferred from end-to-end walls (the k=8 vs k=80 insensitivity
  * finding — balanced cells, 10x pair-volume delta, equal walls —
  * says the bottleneck is NOT the pair stream).
  *
  * Usage: graft.tools.BatchProfile <sfDir> [kCells]
  */
object BatchProfile {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, d)
    val cent = TrainedIndex.centroids(spark, d, k = k)
    val cb = TrainedIndex.codebook(spark, d)
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val corpus = e.select(col("vec_id").as("cid") +:
      (-element_at(VectorOps.nearestCells(cent, col("embedding"), 1), 1)
        .getField("nc")).as("cell") +:
      (0 until VectorOps.PqM).map(i =>
        VectorOps.pqCodeCol(cb, i).as(s"c$i")): _*)
    val queries = e.select(col("vec_id").as("qid") +:
        explode(VectorOps.nearestCells(cent, col("embedding"), 2)).as("pc") +:
        (0 until VectorOps.PqM).map(i =>
          VectorOps.pqLutCol(cb, i).as(s"l$i")): _*)
      .select(col("qid") +: (-col("pc.nc")).as("cell") +:
        (0 until VectorOps.PqM).map(i => col(s"l$i")): _*)
    time("route_only")(e.select(col("vec_id"), (-element_at(
      VectorOps.nearestCells(cent, col("embedding"), 1), 1)
      .getField("nc")).as("cell")))
    time("corpus_encode")(corpus)
    time("query_lut")(queries)
    val scored = corpus.repartition(col("cell"))
      .join(queries.repartition(col("cell")), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("score", VectorOps.pqScoreCol)
      .select(col("qid"), col("cid"), col("score"))
    if (sys.env.contains("BP_EXPLAIN")) {
      println(scored.queryExecution.executedPlan.toString.take(6000))
      spark.stop(); return
    }
    time("adc_join_scored")(scored)
    val sl = graft.plans.TopKPerKey.topK(scored, Seq("qid"),
      Seq(col("score").desc, col("cid").asc), 25)
    time("shortlist_topk")(sl)
    time("full_v16")(VectorOps.ivfAdcBatchServe(spark, d,
      nprobe = 2, r = 25, kCells = k))
    spark.stop()
  }
}
