package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerKey, TopKPerKeyNode}
import graft.sources.Tables

/** The custom whole-operator extension (TopKPerKeyNode + TopKStrategy +
  * TopKPerKeyExec): result parity with the window row_number form, and
  * the partial → exchange → final plan shape.
  */
class TopKPerKeySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("topK equals the window row_number form on events") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val got = TopKPerKey.topK(
      e, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val expect = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(got.collect().map(key).toSet == expect.collect().map(key).toSet)
    assert(got.count() > 0)
  }

  test("plans partial -> exchange -> final; both phases present, one shuffle") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val got = TopKPerKey.topK(
      e, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 2)
    got.collect()
    // AQE's toString prints the final AND initial plans; count in the final only
    val p = got.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("TopKPerKey".r.findAllIn(p).size == 2, p.take(2000))
    assert("(?<!Broadcast|Reused)Exchange".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("partial-phase key overflow degrades to passthrough, result stays exact") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val expect = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.topk.maxPartialKeys", "2") // force overflow
    try {
      val got = TopKPerKey.topK(
          e, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect)
    } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
  }

  test("rank and dense_rank modes match their window forms on tie-rich data") {
    // 10k rows, 50 keys, 8-value domain -> ~25-row tie groups per
    // (key, value): heavy GroupBuf eviction in the partial phase, and
    // boundary ties that row_number semantics would cut
    val df = spark.range(10000).select(
      (col("id") % 50).as("k"),
      pmod(col("id") * 2654435761L, lit(8)).cast("double").as("v"),
      col("id").as("rid"))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getLong(2))
    for ((mode, wfn) <- Seq(
        (TopKPerKeyNode.RankMode, rank()),
        (TopKPerKeyNode.DenseRankMode, dense_rank()))) {
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      val expect = df.withColumn("r", wfn.over(w))
        .filter(col("r") <= 3).drop("r").collect().map(keyOf).toSet
      val got = TopKPerKey.topK(df, Seq("k"), Seq(col("v").desc), 3, mode)
        .collect().map(keyOf).toSet
      assert(got == expect, s"mode $mode diverged from its window form")
      assert(got.size > 150) // ties genuinely exceeded k rows per key
      // partial-phase key overflow stays exact in the rank modes too
      spark.conf.set("spark.graft.topk.maxPartialKeys", "3")
      try {
        val got2 = TopKPerKey.topK(df, Seq("k"), Seq(col("v").desc), 3, mode)
          .collect().map(keyOf).toSet
        assert(got2 == expect, s"mode $mode overflow path diverged")
      } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
    }
  }

  test("null keys and null order values match the window form") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 5.0), (1L, 11L, null), (null, 12L, 3.0), (null, 13L, 7.0),
      (null, 14L, null), (2L, 15L, 2.0))
      .toDF("user_id", "event_id", "value")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").collect().map(key).toSet
    val got = TopKPerKey.topK(
        df, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 2)
      .collect().map(key).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("k larger than the group emits the whole group; ties break on the tiebreak") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (2L, 12L, 1.0))
      .toDF("user_id", "event_id", "value")
    val got = TopKPerKey.topK(
        df, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 12L)))
    val top1 = TopKPerKey.topK(
        df, Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 == Set((1L, 10L), (2L, 12L))) // tie at value=5.0 -> lower event_id
  }
}
