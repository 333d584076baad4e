package graft

import org.apache.spark.sql.functions._
import graft.plans.TokenFreqs

/** The native per-doc term-frequency expression: exact parity with the
  * composed explode -> groupBy form (Spark split semantics, empties
  * kept), deterministic token order, null passthrough. */
class TokenFreqsSpec extends SparkSpec {

  test("token_freqs equals explode+groupBy on real documents") {
    TokenFreqs.register(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs
      .select(col("doc_id"), explode(expr("token_freqs(text)")).as("kv"))
      .select(col("doc_id"), col("kv.tok").as("tok"), col("kv.tf").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val composed = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("empties kept like split, sorted token order, null in -> null out") {
    TokenFreqs.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1L, "b a  a b b"), (2L, ""), (3L, null))
      .toDF("id", "text")
      .select(col("id"), expr("token_freqs(text)").as("fs"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getString(0), x.getLong(1)))
    // "b a  a b b" splits to [b, a, "", a, b, b]; sorted: "" < a < b
    assert(r1 == Seq(("", 1L), ("a", 2L), ("b", 3L)))
    // empty string splits to one empty token
    val r2 = rows(2L).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r2 == Seq(("", 1L)))
    assert(rows(3L).isNullAt(1))
  }
}
