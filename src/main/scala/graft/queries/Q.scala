package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query plus its DuckDB oracle.
  *
  * `oracle` is ANSI SQL the driver runs in DuckDB over the same parquet
  * tables; `None` marks a non-SQL-expressible operator (driver falls back
  * to a rows-only check). Column names/types of the Spark result and the
  * oracle result must match exactly — the compare sorts columns by name
  * and hashes values. Float aggregates are rounded in BOTH dialects so
  * summation-order differences can't flip the hash.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** All query groups, registered in SparkEntry. */
  def all: Seq[Q] =
    Relational.defs ++ Windows.defs ++ TextOps.defs ++ VectorOps.defs ++
      DomainOps.defs ++ GoldGate.defs ++ CarveOutGate.defs ++ Sketches.defs
}
