package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator from SURVEY.md §2
  * (names are prefixed with the §2 operator id, e.g. a01/j06/w03);
  * `oracleSql` gives the DuckDB-equivalent SQL for every SQL-expressible
  * query. Both are assembled from the `graft.queries.*` modules, which
  * colocate each Spark implementation with its oracle so column names
  * can't drift apart.
  */
object SparkEntry {

  private lazy val registry: Seq[Q] = Q.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A multi-join + conditional-agg rollup — the engine's bread and
    * butter (SURVEY §2.3 J1 + §2.4 A1).
    */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "j01_broadcast_chain").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
