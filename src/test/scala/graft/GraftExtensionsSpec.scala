package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The SparkSessionExtensions wiring: a session built with the
  * GraftExtensions entry point (on a cluster:
  * `spark.sql.extensions=graft.plans.GraftExtensions`, a static conf
  * read at SparkContext creation — in-JVM specs must use
  * builder.withExtensions because the shared test context already
  * exists) silently plans
  * the textbook `row_number().over(...).filter(rn <= k).drop(rn)`
  * window idiom as the TopKPerKey heap operator — same rows, no
  * WindowExec, no full-input sort.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def windowTopK(s: SparkSession) = {
    val e = Tables.events(s, sf).select(col("user_id"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
  }

  test("extensions class rewrites the window idiom to TopKPerKey, same rows") {
    val base = SparkSpec.session // materialize the shared context first
    val expected = windowTopK(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val df = windowTopK(ext)
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)
      assert(expected.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("TopKPerKey"), plan.take(2000))
      assert(!plan.contains("Window"), plan.take(2000))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("rank() and dense_rank() idioms rewrite with tie semantics intact") {
    val base = SparkSpec.session
    def tied(s: SparkSession) = {
      import s.implicits._
      Seq((1L, 10.0, 1L), (1L, 10.0, 2L), (1L, 9.0, 3L), (1L, 8.0, 4L),
        (2L, 5.0, 5L), (2L, 5.0, 6L), (2L, 5.0, 7L))
        .toDF("k", "v", "id")
    }
    def rankTopK(s: SparkSession) = {
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      tied(s).withColumn("r", rank().over(w)).filter(col("r") <= 2).drop("r")
    }
    def denseTopK(s: SparkSession) = {
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      tied(s).withColumn("r", dense_rank().over(w)).filter(col("r") <= 2).drop("r")
    }
    val expRank = rankTopK(base).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val expDense = denseTopK(base).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // hand-checked tie semantics the operator must reproduce:
    // k=1 rank<=2 keeps the two tied 10s; rank of 9.0 is 3 (gap) -> out
    assert(expRank == Set((1L, 10.0, 1L), (1L, 10.0, 2L),
      (2L, 5.0, 5L), (2L, 5.0, 6L), (2L, 5.0, 7L)))
    // dense_rank<=2 keeps the top TWO DISTINCT values per key
    assert(expDense == Set((1L, 10.0, 1L), (1L, 10.0, 2L), (1L, 9.0, 3L),
      (2L, 5.0, 5L), (2L, 5.0, 6L), (2L, 5.0, 7L)))

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-rank")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      for ((mk, exp) <- Seq(
          (rankTopK _, expRank), (denseTopK _, expDense))) {
        val df = mk(ext)
        val got = df.collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
        assert(got == exp)
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("TopKPerKey"), plan.take(2000))
        assert(!plan.contains("Window"), plan.take(2000))
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("t14's per-source cap plans as TopKPerKey under the extensions session") {
    val base = SparkSpec.session
    val expected = SparkEntry.queries("t14_source_cap")(base, sf).collect()
      .map(_.toSeq).toSet
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-t14")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val df = SparkEntry.queries("t14_source_cap")(ext, sf)
      assert(df.collect().map(_.toSeq).toSet == expected)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("TopKPerKey"), plan.take(3000))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("rank-projecting and unpartitioned windows are left alone") {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test2")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val e = Tables.events(ext, sf).select(col("user_id"), col("event_id"), col("value"))
      // keeps rn in the output -> the operator can't serve it; must stay a window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      val keepsRank = e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      keepsRank.collect()
      val p1 = keepsRank.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p1.contains("Window"), p1.take(2000))
      assert(!p1.contains("TopKPerKey"), p1.take(2000))

      // global (unpartitioned) top-k: not this operator's shape either
      val g = Window.orderBy(col("value").desc, col("event_id").asc)
      val global = e.withColumn("rn", row_number().over(g)).filter(col("rn") <= 3).drop("rn")
      global.collect()
      val p2 = global.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p2.contains("TopKPerKey"), p2.take(2000))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
