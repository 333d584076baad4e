package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.quality.{Contracts, TableSpec}

class ContractsSpec extends SparkSpec {

  private val spec = TableSpec("fct_games", Seq("gameId"),
    StructType(Seq(
      StructField("gameId", LongType),
      StructField("homeScore", LongType))))

  test("validateSpecs flags duplicates, empty PKs, unknown PK columns") {
    val bad = Seq(
      spec,
      spec, // duplicate name
      TableSpec("t2", Seq(), StructType(Seq(StructField("a", LongType)))),
      TableSpec("t3", Seq("nope"), StructType(Seq(StructField("a", LongType)))))
    val v = Contracts.validateSpecs(bad)
    assert(v.exists(_.contains("duplicate spec: fct_games")))
    assert(v.exists(_.contains("t2: empty primary keys")))
    assert(v.exists(_.contains("t3: pk 'nope' not in schema")))
    assert(Contracts.validateSpecs(Seq(spec)).isEmpty)
  }

  test("conformance reports missing/extra columns and duplicate PKs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("gameId", "venue")
    val r = Contracts.conformance(df, spec).head()
    assert(r.getAs[String]("missing_columns") == "homeScore")
    assert(r.getAs[String]("extra_columns") == "venue")
    assert(r.getAs[Long]("dup_pk_rows") == 1L)
    assert(!r.getAs[Boolean]("ok"))
  }

  test("audit computes counts, dup PKs and null fractions in one pass") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L)),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(30L)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long]))
      .toDF("gameId", "homeScore")
    val r = Contracts.audit(df, Seq("gameId")).head()
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_distinct_pk") == 3L)
    assert(r.getAs[Long]("dup_pk_rows") == 1L)
    assert(r.getAs[Double]("null_frac_homeScore") == 0.5)
    assert(r.getAs[Double]("null_frac_gameId") == 0.0)
  }
}
