package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** The two-stage distributed rank must agree exactly with the
  * single-partition global window it replaces, across skew and
  * partition-count choices. */
class GlobalRankSpec extends SparkSpec {

  private def reference(dv: org.apache.spark.sql.DataFrame): Map[Double, Long] =
    dv.select(col("v"),
        (row_number().over(Window.orderBy(col("v").asc)) - 1).cast("long").as("idx"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap

  test("matches the global-window rank on a shuffled unique set") {
    val s = spark
    import s.implicits._
    // pseudo-shuffled order, values include negatives and gaps
    val vals = (0 until 1000).map(i => ((i * 7919) % 1000) * 0.5 - 100.0)
    val dv = vals.toDF("v").distinct()
    val want = reference(dv)
    for (parts <- Seq(1, 4, 32)) {
      val got = GlobalRank.zeroBasedIndex(dv, "v", parts)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      assert(got == want, s"partitions=$parts")
    }
  }

  test("single row gets idx 0; two rows get 0 and 1") {
    val s = spark
    import s.implicits._
    val one = GlobalRank.zeroBasedIndex(Seq(42.0).toDF("v"), "v").collect()
    assert(one.length == 1 && one(0).getLong(1) == 0L)
    val two = GlobalRank.zeroBasedIndex(Seq(7.0, -7.0).toDF("v"), "v")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(two == Map(-7.0 -> 0L, 7.0 -> 1L))
  }
}
