package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query job-level profile (guide §1: measure before changing):
  * runs each named query once warm, once timed, with a listener that
  * records every Spark job's wall time. Splits the query's wall into
  * "executor jobs" vs "driver gap" (planning/analysis/file IO between
  * jobs) and prints the job count — the numbers that say whether a
  * multi-second sf0.1 row is data-bound or overhead-bound.
  *
  * Usage: graft.tools.JobProfile <sfDir> <name> [name ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("v22_vamana_walk_serving")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = sys.env.contains("JP_VERBOSE")
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val done = scala.collection.concurrent.TrieMap.empty[Int, (Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + " nstages=" + js.stageInfos.size).getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          jobs += 1
          val dt = System.nanoTime() - t0
          jobNanos += dt
          done(je.jobId) = (dt / 1e9, site)
        }
    })

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    println(f"${"query"}%-36s ${"wall_s"}%8s ${"jobs"}%5s ${"job_s"}%8s ${"gap_s"}%8s")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      run(fn(spark, sfDir)) // warm: JIT, codegen, artifact memos
      // settle listener events from the warm pass
      Thread.sleep(300) // let listener events drain
      jobs = 0; jobNanos = 0L; done.clear()
      val t0 = System.nanoTime()
      run(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val js = jobNanos / 1e9
      println(f"$n%-36s $wall%8.3f $jobs%5d $js%8.3f ${wall - js}%8.3f")
      if (verbose) done.toSeq.sortBy(-_._2._1).take(20).foreach {
        case (id, (sec, site)) => println(f"    job $id%4d $sec%7.3f  $site")
      }
    }
    spark.stop()
  }
}
