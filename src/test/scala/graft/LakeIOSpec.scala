package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.LakeIO

/** Medallion I/O surface (SURVEY.md §2.1): raw gzip NDJSON roundtrip,
  * Hive-partitioned writes with dynamic overwrite, permissive union,
  * candidate-column fallback, alias normalization. */
class LakeIOSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-io").toString

  test("raw gzip NDJSON sink roundtrips and writes .gz parts") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val path = tmp() + "/raw"
    LakeIO.writeRawNdjson(df, path)
    val gz = new java.io.File(path).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(gz.nonEmpty)
    val back = LakeIO.readRawNdjson(s, path)
    assert(back.count() == 3)
    assert(back.select(sum(col("id"))).head().getLong(0) == 6L)
  }

  test("partitioned writer lays out hive dirs; dynamic overwrite touches only written partitions") {
    val s = spark
    import s.implicits._
    val path = tmp() + "/silver"
    val v1 = Seq((1L, 2024, 10.0), (2L, 2024, 20.0), (3L, 2025, 30.0))
      .toDF("id", "season", "x")
    LakeIO.writePartitioned(v1, path, Seq("season"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("season=2024", "season=2025"))
    // overwrite only season=2025; 2024 rows must survive
    val v2 = Seq((9L, 2025, 99.0)).toDF("id", "season", "x")
    LakeIO.writePartitioned(v2, path, Seq("season"))
    val back = s.read.parquet(path)
    assert(back.filter(col("season") === 2024).count() == 2)
    assert(back.filter(col("season") === 2025).count() == 1)
    assert(back.filter(col("season") === 2025).select(col("id")).head().getLong(0) == 9L)
  }

  test("permissive union fills missing columns with nulls") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("id", "a_only")
    val b = Seq((2L, 5.0)).toDF("id", "b_only")
    val u = LakeIO.unionPermissive(Seq(a, b))
    assert(u.columns.toSet == Set("id", "a_only", "b_only"))
    assert(u.count() == 2)
    assert(u.filter(col("id") === 2).select(col("a_only")).head().isNullAt(0))
  }

  test("coalesceCandidates picks the first existing column; all-missing -> null column") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "gp_val")).toDF("playerId", "gamesPlayed")
    val out = LakeIO.coalesceCandidates(df, "games", Seq("games", "gamesPlayed", "gp"))
    assert(out.select(col("games")).head().getString(0) == "gp_val")
    val none = LakeIO.coalesceCandidates(df, "missing", Seq("nope", "nada"))
    assert(none.select(col("missing")).head().isNullAt(0))
  }

  test("applyAliases renames camelCase and drops it when canonical exists") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("id", "athleteId", "playerId")
    val out = LakeIO.applyAliases(df,
      Map("id" -> "gameId", "athleteId" -> "playerId"))
    assert(out.columns.sorted.toSeq == Seq("gameId", "playerId"))
    // canonical playerId kept (athleteId dropped), id renamed
    assert(out.select(col("playerId")).head().getLong(0) == 3L)
    assert(out.select(col("gameId")).head().getLong(0) == 1L)
  }
}
