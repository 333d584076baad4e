package graft

import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarity

class CosineSimilaritySpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical -> 1
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (3L, Array(1.0f, 1.0f), Array(-1.0f, -1.0f)), // opposite -> -1
      (4L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)))   // zero vector -> 0 guard
      .toDF("id", "a", "b")
  }

  test("cosine_sim evaluates correctly through SQL after registration") {
    val s = spark
    CosineSimilarity.register(s)
    val out = df.selectExpr("id", "cosine_sim(a, b) AS c")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
    assert(out(4L) == 0.0)
  }

  test("matches the zip_with+aggregate composed form bit-for-bit on real embeddings") {
    val s = spark
    CosineSimilarity.register(s)
    val raw = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = raw.limit(50).select(col("vec_id"), col("embedding").as("a"))
    val pairs = e.crossJoin(raw.select(col("embedding").as("b")).limit(1))
    val composed = expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)" +
        " / (sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))" +
        " * sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))")
    val diff = pairs
      .select((expr("cosine_sim(a, b)") - composed).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0) // identical accumulation order -> identical bits
  }

  test("null input yields null; type mismatch fails analysis with a clear message") {
    val s = spark
    import s.implicits._
    CosineSimilarity.register(s)
    val withNull = Seq((Array(1.0f), null.asInstanceOf[Array[Float]]))
      .toDF("a", "b")
    val r = withNull.selectExpr("cosine_sim(a, b) AS c").head()
    assert(r.isNullAt(0))
    val bad = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").selectExpr("cosine_sim(a, b)").collect()
    }
    assert(bad.getMessage.contains("cosine_sim") ||
      bad.getMessage.toLowerCase.contains("array"))
  }
}
