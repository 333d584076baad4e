package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Medallion-lake I/O surface (SURVEY.md §2.1): raw gzip-NDJSON sink
  * (S4, reference s3_io.py:48-55), Hive-partitioned parquet writer with
  * idempotent overwrite (S5/S7/S13, orchestrate.py:979-998 +
  * runner.py:134-141), permissive schema-promoting union (U1,
  * _io_helpers.py:141-178), and the candidate-column fallback /
  * alias-normalization pass (P1/F13, _io_helpers.py:94-106 +
  * orchestrate.py:1010-1165).
  *
  * Scale notes: writes go through Spark's committer (safe concurrent
  * writers, atomic rename per partition); `partitionBy` yields the same
  * `season=…/date=…` layout the reference hand-builds, which is what
  * makes partition pruning free at read time. Dynamic partition
  * overwrite replaces only touched partitions — the reference's
  * purge-prefix-then-write made idempotent without the full-table
  * delete.
  */
object LakeIO {

  /** Stamp-memo write hook (ADVICE r16): lake stamps are memoized per
    * LAKE DIR; a table write lands at `<dir>/<table>.parquet`, so the
    * written path AND its parent dir both drop their memo entries. */
  private def invalidateStamps(path: String): Unit = {
    Tables.invalidateStamp(Some(path))
    Option(java.nio.file.Paths.get(path).toAbsolutePath.normalize.getParent)
      .foreach(p => Tables.invalidateStamp(Some(p.toString)))
  }

  /** Raw layer: one JSON object per line, gzip — S4. */
  def writeRawNdjson(df: DataFrame, path: String): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)
    invalidateStamps(path)
  }

  def readRawNdjson(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Bronze/silver layer: snappy parquet, Hive-partitioned — S5/S7.
    * ADVICE r16: every write path drops the dir's memoized lake stamp
    * itself — the derived-artifact caches (TrainedIndex, maintained
    * store) key on stampedKey, and a writer that forgets the hook
    * would silently serve stale artifacts in-process. */
  def writePartitioned(df: DataFrame, path: String, partitions: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitions: _*).parquet(path)
    invalidateStamps(path)
  }

  /** Permissive concat: union by name, missing columns become nulls — U1. */
  def unionPermissive(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** P1: project the first existing of N candidate column names to
    * `out`; all-missing yields a typed null column. */
  def coalesceCandidates(df: DataFrame, out: String, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    val c =
      if (present.isEmpty) lit(null).cast("string")
      else if (present.size == 1) col(present.head)
      else coalesce(present.map(col): _*)
    df.withColumn(out, c)
  }

  /** F13: per-table rename normalization (camelCase → canonical), drop
    * the alias when both spellings exist (reference drops camelCase). */
  def applyAliases(df: DataFrame, aliases: Map[String, String]): DataFrame =
    aliases.foldLeft(df) { case (acc, (from, to)) =>
      if (!acc.columns.contains(from)) acc
      else if (acc.columns.contains(to)) acc.drop(from)
      else acc.withColumnRenamed(from, to)
    }

  /** S8: register tables for the SQL surface (temp views standing in for
    * the reference's Glue catalog). */
  def registerTables(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    // events goes through its normalizing reader (the parquet stores
    // ns timestamps Spark 4 refuses raw; Tables.events truncates to
    // the same µs instants DuckDB sees)
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** S8 persistent path (reference glue_catalog.py:13-62): register an
    * EXTERNAL parquet location in the session catalog — the analog of
    * Glue's create_table over an S3 prefix. Schema and Hive-style
    * partition columns are inferred from the files; `RECOVER
    * PARTITIONS` syncs the partition list into the catalog for
    * partitioned layouts (Glue's batch_create_partition). */
  def registerExternal(spark: org.apache.spark.sql.SparkSession,
      name: String, path: String, partitioned: Boolean = false): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.catalog.createTable(name, path, "parquet")
    if (partitioned) spark.sql(s"ALTER TABLE `$name` RECOVER PARTITIONS")
  }

  /** S8 persistent path, managed flavor: saveAsTable into the session
    * warehouse (CREATE TABLE ... USING PARQUET PARTITIONED BY). */
  def saveAsManagedTable(df: DataFrame, name: String,
      partitions: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partitions.isEmpty) w else w.partitionBy(partitions: _*))
      .saveAsTable(name)
  }

  /** Bucketed catalog table — the co-located-join layout for the
    * repeated big-fact joins (J1/J3/A1 at 100 TB): two facts bucketed
    * by the same key and count sort-merge-join with ZERO exchanges,
    * because the bucket layout IS the shuffle, paid once at write time
    * and amortized over every subsequent join/aggregation on that key.
    * `path` pins the data outside the warehouse dir (external table);
    * bucket files are also sorted by the key so the join skips the
    * per-partition sort when Spark can prove per-file sortedness. */
  def saveBucketed(df: DataFrame, name: String, key: String,
      buckets: Int, path: Option[String] = None): Unit =
    saveBucketed(df, name, Seq(key), buckets, path)

  /** Composite-key form: bucket AND sort by all of `keys` — a join (or
    * self-join) whose equi-keys cover every bucket column co-locates
    * with zero exchanges. The MinHash-LSH band table is the canonical
    * user: bucketed by (band_index, band_hash), the candidate-pair
    * self-join reads both sides pre-shuffled. */
  def saveBucketed(df: DataFrame, name: String, keys: Seq[String],
      buckets: Int, path: Option[String]): Unit = {
    require(keys.nonEmpty)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w.saveAsTable(name))(p => w.option("path", p).saveAsTable(name))
  }
}
