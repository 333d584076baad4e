package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.VectorOps

/** Measurement harness behind the v12/v12b/v13 doc-string numbers —
  * run it to reproduce every recall claim in the PQ family:
  *
  *  1. invariant: ivfPqTop3(nprobe=8) == pqAdcTop3's top-3 set (all
  *     cells probed == all candidates scored);
  *  2. full-scan ADC-only recall@3 and the exact-IP ceiling (the
  *     embeddings are unit-norm, so exact IP == cosine == 60/60);
  *  3. the IVFADC+R (nprobe, R) sweep — v13 ships (2, 25);
  *  4. ADC recall vs per-subspace Lloyd iteration count (relational
  *     trainer, Euclidean assignment) — shows converged training
  *     still tops out far below the re-rank path on this corpus.
  */
object IvfPqDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val e = graft.sources.Tables.embeddings(spark, d)
    val truth = VectorOps.bruteTruth(spark, d).cache()
    def hitsOf(ann: org.apache.spark.sql.DataFrame): Long =
      VectorOps.recallOf(truth, ann).agg(sum(col("n_hit"))).head().getLong(0)

    // 1. all-cells fused == full-scan ADC
    val a = VectorOps.ivfPqTop3(spark, d, nprobe = 8)
      .select(col("qid"), col("cid")).cache()
    val b = VectorOps.pqAdcTop3(spark, d)
      .select(col("qid"), col("cid")).cache()
    val sym = a.except(b).count() + b.except(a).count()
    println(s"ivfpq(np=8) vs pqadc symmetric diff = $sym (must be 0)")

    // 2. full-scan recall + exact ceiling
    val q2 = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c2 = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val ipW = Window.partitionBy(col("qid"))
      .orderBy(col("ip").desc, col("cid").asc)
    val exactIp = c2.join(broadcast(q2), col("qid") =!= col("cid"))
      .withColumn("ip", aggregate(
        zip_with(col("qe"), col("ce"), (x, y) =>
          x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(ipW))
      .filter(col("rank") <= 3).select(col("qid"), col("cid"))
    println(s"recall: full-scan ADC=${hitsOf(b)}  exact-IP=${hitsOf(exactIp)}")

    // 3. IVFADC+R sweep
    for (np <- Seq(1, 2, 3); r <- Seq(10, 25, 50))
      println(s"ivfadc+r np=$np R=$r recall=" +
        hitsOf(VectorOps.ivfAdcRerank(spark, d, np, r)))

    // 4. ADC recall vs Lloyd iterations (relational trainer)
    val subDim = VectorOps.PqSubDim; val k = VectorOps.PqK
    val subv = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") / subDim).cast("int").as("sub"),
        (col("pos") % subDim).as("lpos"), col("col").cast("double").as("v"))
      .localCheckpoint(true)
    var cbF = e.select(col("vec_id").as("sid"), col("embedding").as("se"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h").asc, col("sid").asc).limit(k)
      .withColumn("code",
        row_number().over(Window.orderBy(col("sid").cast("string").asc)) - 1)
      .select(col("code"), posexplode(col("se")))
      .select(col("code"), (col("pos") / subDim).cast("int").as("sub"),
        (col("pos") % subDim).as("lpos"), col("col").cast("double").as("cv"))
      .localCheckpoint(true)
    def assign(cbX: org.apache.spark.sql.DataFrame) = {
      val hn = cbX.groupBy(col("sub"), col("code"))
        .agg((sum(col("cv") * col("cv")) / 2).as("hn"))
      val dots = subv.join(broadcast(cbX), Seq("sub", "lpos"))
        .groupBy(col("vec_id"), col("sub"), col("code"))
        .agg(sum(col("v") * col("cv")).as("dot"))
      val w = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy((col("dot") - col("hn")).desc, col("code").asc)
      dots.join(broadcast(hn), Seq("sub", "code"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("sub"), col("code"))
    }
    for (it <- 1 to 20) {
      val asg = assign(cbF)
      val su = subv.join(asg, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("code"), col("lpos"))
        .agg(sum(col("v")).as("sm"), count(lit(1)).as("n"))
      cbF = cbF.join(su, Seq("sub", "code", "lpos"), "left")
        .select(col("sub"), col("code"), col("lpos"),
          coalesce(col("sm") / col("n"), col("cv")).as("cv"))
        .localCheckpoint(true)
      if (Set(1, 2, 3, 5, 10, 20)(it)) {
        val codes = assign(cbF)
        val lut = subv.filter(col("vec_id") < 20)
          .join(broadcast(cbF), Seq("sub", "lpos"))
          .groupBy(col("vec_id"), col("sub"), col("code"))
          .agg(sum(col("v") * col("cv")).as("dot"))
          .withColumnRenamed("vec_id", "qid")
        val w2 = Window.partitionBy(col("qid"))
          .orderBy(round(col("score"), 4).desc, col("cid").asc)
        val ann = codes.withColumnRenamed("vec_id", "cid")
          .join(lut, Seq("sub", "code"))
          .filter(col("cid") =!= col("qid"))
          .groupBy(col("qid"), col("cid")).agg(sum(col("dot")).as("score"))
          .withColumn("rank", row_number().over(w2))
          .filter(col("rank") <= 3).select(col("qid"), col("cid"))
        println(s"iters=$it  recall=${hitsOf(ann)}")
      }
    }
    spark.stop()
  }
}
