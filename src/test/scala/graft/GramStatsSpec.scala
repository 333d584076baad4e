package graft

import org.apache.spark.sql.functions._
import graft.plans.GramStats

/** The native 3-gram stats expression: exact parity with the composed
  * transform -> array_distinct recipe, including the short-doc guards. */
class GramStatsSpec extends SparkSpec {

  test("gram_stats equals the composed 3-gram recipe on real documents") {
    GramStats.register(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"), expr("gram_stats(text)").as("g"))
      .select(col("doc_id"), col("g.g_total"), col("g.g_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val composed = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        greatest(size(col("ws")) - 2, lit(0)).cast("long").as("g_total"),
        expr("CASE WHEN size(ws) >= 3 THEN " +
          "size(array_distinct(transform(sequence(0, size(ws) - 3), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) ELSE 0 END")
          .cast("long").as("g_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("short docs and empties: 0/1/2 tokens give (0, 0); repeats collapse") {
    GramStats.register(spark)
    val s = spark
    import s.implicits._
    val rows = Seq((1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c"),
      (5L, "x y x y x y x y"), (6L, null))
      .toDF("id", "t")
      .select(col("id"), expr("gram_stats(t)").as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))).toMap
    assert(rows(1L) == ((0L, 0L))) // "" splits to one empty token
    assert(rows(2L) == ((0L, 0L)))
    assert(rows(3L) == ((0L, 0L)))
    assert(rows(4L) == ((1L, 1L)))
    assert(rows(5L) == ((6L, 2L))) // x y x / y x y alternating
    assert(rows(6L) == null)
  }
}
