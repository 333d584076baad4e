package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-contract + audit surface (SURVEY §5 contract tests + §2.4 A14;
  * reference: tests/test_data_quality.py TABLE_SPECS invariants and
  * scripts/audit_lakehouse.py:187-245).
  *
  * `TableSpec` is the reference's table contract (normalize.py:10-14)
  * as a Spark StructType + PK list; `validateSpecs` enforces the same
  * registry invariants (non-empty PKs, PKs ⊆ schema, no duplicate
  * specs); `audit` computes per-table row counts, duplicate-PK counts
  * and per-column null fractions as ONE aggregation pass per table.
  */
final case class TableSpec(name: String, primaryKeys: Seq[String], schema: StructType)

object Contracts {

  /** Registry invariants (reference test_data_quality.py). Returns the
    * list of violations — empty means the registry is sound. */
  def validateSpecs(specs: Seq[TableSpec]): Seq[String] = {
    val dupNames = specs.groupBy(_.name).filter(_._2.size > 1).keys.map(n =>
      s"duplicate spec: $n")
    val emptyPks = specs.filter(_.primaryKeys.isEmpty).map(s =>
      s"${s.name}: empty primary keys")
    val pkNotInSchema = specs.flatMap { s =>
      val cols = s.schema.fieldNames.toSet
      s.primaryKeys.filterNot(cols.contains).map(pk =>
        s"${s.name}: pk '$pk' not in schema")
    }
    (dupNames ++ emptyPks ++ pkNotInSchema).toSeq
  }

  /** Check a concrete DataFrame against its spec: missing / extra
    * columns and duplicate-PK rows. */
  def conformance(df: DataFrame, spec: TableSpec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = spec.schema.fieldNames.toSet
    val actual = df.columns.toSet
    val missing = (expected -- actual).toSeq.sorted.mkString(",")
    val extra = (actual -- expected).toSeq.sorted.mkString(",")
    val dupPk =
      if (spec.primaryKeys.forall(actual.contains))
        df.groupBy(spec.primaryKeys.map(col): _*).count()
          .filter(col("count") > 1).count()
      else -1L
    Seq((spec.name, missing, extra, dupPk, missing.isEmpty && dupPk == 0L))
      .toDF("table", "missing_columns", "extra_columns", "dup_pk_rows", "ok")
  }

  /** Audit aggregates (A14): row count, distinct-PK count, dup-PK rows,
    * and per-column null fraction — one pass. */
  def audit(df: DataFrame, pk: Seq[String]): DataFrame = {
    val nullFracs = df.columns.map(c =>
      round(avg(when(col(c).isNull, 1.0).otherwise(0.0)), 4)
        .as(s"null_frac_$c"))
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(concat_ws("", pk.map(c => col(c).cast("string")): _*))
        .as("n_distinct_pk")) ++ nullFracs
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("dup_pk_rows", col("n_rows") - col("n_distinct_pk"))
  }
}
