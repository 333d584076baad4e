package graft

import org.apache.spark.sql.functions._
import graft.silver.Normalize

/** Silver normalization over raw messy records (FIXTURES.md §A1/§A5):
  * alias healing, nested flattening, lines explode, lenient casts,
  * first-wins dedup. */
class NormalizeSpec extends SparkSpec {

  test("plays: onFloor flattened to 10 scalars, shotInfo to shot_*, python-repr healed") {
    val s = spark
    import s.implicits._
    val onFloorJson = (1 to 7).map(i => s"""{"id": $i, "name": "P$i"}""")
      .mkString("[", ",", "]") // only 7 on floor -> players 8..10 null
    val shotPy =
      """{'shooter': {'id': 42, 'name': 'Ace'}, 'made': 'true', 'range': 'three_pointer',
         |'assisted': 'False', 'assistedBy': {'id': None, 'name': None},
         |'location': {'x': 1.5, 'y': 2.5}}""".stripMargin.replace("\n", " ")
    val raw = Seq(
      (10L, null.asInstanceOf[java.lang.Long], 900L, onFloorJson, shotPy),
      (11L, java.lang.Long.valueOf(901L), null.asInstanceOf[Long], null.asInstanceOf[String], null.asInstanceOf[String]),
      (10L, null.asInstanceOf[java.lang.Long], 900L, onFloorJson, shotPy)) // dup id -> dropped
      .toDF("id", "gameId", "gameid", "onFloor", "shotInfo")
    val out = Normalize.plays(raw)
    assert(out.count() == 2) // first-wins dedup on id
    val r = out.filter(col("id") === 10L).head()
    assert(r.getAs[Long]("gameId") == 900L) // lowercase alias healed
    assert(r.getAs[Long]("onfloor_player1") == 1L)
    assert(r.getAs[Long]("onfloor_player7") == 7L)
    assert(r.isNullAt(r.fieldIndex("onfloor_player8")))
    assert(r.getAs[Long]("shot_shooter_id") == 42L)
    assert(r.getAs[Boolean]("shot_made")) // 'true' string -> bool
    assert(!r.getAs[Boolean]("shot_assisted")) // 'False' -> false
    assert(r.getAs[String]("shot_range") == "three_pointer")
    assert(r.getAs[Double]("shot_loc_y") == 2.5)
    val r2 = out.filter(col("id") === 11L).head()
    assert(r2.getAs[Long]("gameId") == 901L) // camelCase present wins
    assert(r2.isNullAt(r2.fieldIndex("shot_shooter_id"))) // null payloads -> nulls
  }

  test("lines: array explodes to one row per provider with first-wins dedup") {
    val s = spark
    import s.implicits._
    val linesJson =
      """[{"provider": "consensus", "spread": -3.5, "overUnder": 140.5,
        |  "homeMoneyline": -150, "awayMoneyline": 130},
        | {"provider": "book2", "spread": -4.0, "overUnder": 141.0,
        |  "homeMoneyline": -160, "awayMoneyline": 140}]""".stripMargin
    val raw = Seq((1L, 2025, linesJson), (1L, 2025, linesJson)) // dup game record
      .toDF("gameId", "season", "lines")
    val out = Normalize.lines(raw)
    assert(out.count() == 2) // 2 providers, dup record deduped
    val consensus = out.filter(col("provider") === "consensus").head()
    assert(consensus.getAs[Double]("spread") == -3.5)
    assert(consensus.getAs[Long]("gameId") == 1L)
    assert(out.columns.contains("season")) // passthrough columns kept
  }

  test("flatTable: alias fallback chain + pk dedup") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "Duke"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(2L), "UNC"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "Duke dup"))
      .toDF("id", "teamid", "school")
    val out = Normalize.flatTable(raw,
      Map("teamId" -> Seq("teamId", "id", "teamid")),
      pk = Seq("teamId"), ord = "school")
    assert(out.count() == 2)
    val rows = out.collect().map(r => r.getAs[Long]("teamId") -> r.getAs[String]("school")).toMap
    assert(rows(1L) == "Duke") // first wins under school asc ("Duke" < "Duke dup")
    assert(rows(2L) == "UNC")
  }

  test("rawJsonToSilver: case-variant keys survive the real NDJSON->silver path") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-silver").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/raw.json"),
      """{"id": 10, "gameid": 900, "playType": "JumpShot", "onFloor": null, "shotInfo": null}
        |{"id": 11, "gameId": 901, "playType": "Rebound", "onFloor": null, "shotInfo": null}
        |""".stripMargin)
    Normalize.rawJsonToSilver(s, s"$dir/raw.json", s"$dir/silver")(Normalize.plays)
    // read back under the DEFAULT (case-insensitive) conf
    val out = s.read.parquet(s"$dir/silver")
      .select(col("id"), col("gameId")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // BOTH spellings healed — under a naive read, id=11's gameId is null
    assert(out == Map(10L -> 900L, 11L -> 901L))
  }

  test("toBool lenient semantics") {
    val s = spark
    import s.implicits._
    val df = Seq("true", "1", "yes", "FALSE", "0", "no", "maybe", null)
      .toDF("v").select(Normalize.toBool(col("v")).as("b"))
    val vals = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(vals.toSeq == Seq(Some(true), Some(true), Some(true),
      Some(false), Some(false), Some(false), None, None))
  }
}
