package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{LakeIO, Tables}

/** A/B probe for the bucketed decontamination layout (BucketingSpec's
  * plan assertion, measured): materialize the t28b train/eval gram-hash
  * frames once, then time the eval↔train left-semi join with the train
  * side (a) plain parquet — both sides shuffle — and (b) bucketed by
  * hash — only the eval side shuffles. Prints median-of-3 for each at
  * the given SF dir. The bucketed write itself is timed too: that is
  * the one-off ingest cost the layout amortizes across eval sets.
  *
  * Usage: graft.tools.BucketAb <sfDir>
  */
object BucketAb {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-bktab").toString

    val grams = graft.queries.TextOps.gramHashes(Tables.documents(spark, d))
    grams.filter(!col("is_eval")).select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$root/train_plain")
    grams.filter(col("is_eval")).select(col("doc_id"), col("h"))
      .write.mode("overwrite").parquet(s"$root/eval")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s $dt%.2f s"); dt
    }
    time("bucketed write (once)") {
      LakeIO.saveBucketed(spark.read.parquet(s"$root/train_plain"),
        "ab_train_bkt", "h", 32, Some(s"$root/train_bkt"))
    }
    val eval = spark.read.parquet(s"$root/eval")
    def contam(train: DataFrame): Unit =
      eval.join(train, Seq("h"), "left_semi")
        .write.mode("overwrite").format("noop").save()
    def median3(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map(_ => time(label)(f)).sorted
      println(f"$label%-22s median ${ts(1)}%.2f s")
    }
    median3("plain join")(contam(spark.read.parquet(s"$root/train_plain")))
    median3("bucketed join")(contam(spark.table("ab_train_bkt")))
    spark.sql("DROP TABLE IF EXISTS ab_train_bkt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
