package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.LakeIO

/** Silver normalization job (SURVEY §7.1 item 3; reference:
  * orchestrate.py:539-629 `_write_layers` + :1010-1165
  * `_apply_key_aliases` + normalize.py:816-894): raw JSON records →
  * typed, alias-healed, deduplicated silver rows.
  *
  * Spark shape: where the reference loops over row dicts, this is one
  * declarative pass — `coalesce` for alias fallback, `from_json` with
  * explicit schemas for the nested payloads (onFloor / shotInfo /
  * lines), `explode` for the per-provider lines fan-out, `try_cast`
  * lenient casts, and `row_number()===1` first-wins PK dedup (the
  * reference's dedupe_records). Python-repr payloads are healed by a
  * regexp normalization before from_json (the literal-eval fallback).
  */
object Normalize {

  // --- lenient scalar casts (normalize.py:816-840) --------------------------

  /** bool from "true"/"1"/"yes" (case-insensitive), else null. */
  def toBool(c: Column): Column =
    when(lower(c.cast("string")).isin("true", "1", "yes"), lit(true))
      .when(lower(c.cast("string")).isin("false", "0", "no"), lit(false))

  /** Python-repr → canonical JSON text ('{'a': None}' → '{"a": null}'). */
  def jsonish(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "'", "\""),
          "\\bNone\\b", "null"),
        "\\bTrue\\b", "true"),
      "\\bFalse\\b", "false")

  private val strictOpts = Map("allowSingleQuotes" -> "false")

  /** from_json (array payloads) accepting canonical JSON or Python-repr:
    * a failed array parse yields NULL, so coalesce discriminates. */
  def lenientFromJson(c: Column, schema: DataType): Column =
    coalesce(from_json(c, schema, strictOpts), from_json(jsonish(c), schema))

  /** from_json (struct payloads): a malformed struct parses to
    * struct-of-nulls (never NULL) in PERMISSIVE mode, so coalesce can't
    * discriminate — fall back to the Python-repr healing whenever the
    * strict parse produced no non-null top-level field. */
  def lenientFromJsonStruct(c: Column, schema: StructType): Column = {
    val strict = from_json(c, schema, strictOpts)
    val anyNonNull = schema.fieldNames
      .map(f => strict.getField(f).isNotNull).reduce(_ || _)
    when(anyNonNull, strict).otherwise(from_json(jsonish(c), schema))
  }

  /** Run a raw→silver job under case-SENSITIVE analysis. Under the
    * default case-INsensitive mode, spark.read.json folds
    * `gameId`/`gameid` into one inferred column but binds field names
    * case-SENSITIVELY at parse time — the minority spelling silently
    * reads as null — and a scan whose schema keeps both spellings fails
    * execution-time resolution. So the WHOLE job (inference, healing,
    * write) runs with caseSensitive=true; the healed output contains no
    * case duplicates, so downstream consumers read it under the default
    * conf. This is the Spark-native form of the reference's exact-key
    * dict handling (orchestrate.py:1010-1165).
    */
  def rawJsonToSilver(spark: org.apache.spark.sql.SparkSession,
      rawPath: String, outPath: String)(normalize: DataFrame => DataFrame): Unit = {
    val key = "spark.sql.caseSensitive"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try normalize(spark.read.json(rawPath))
      .write.mode("overwrite").parquet(outPath)
    finally spark.conf.set(key, prev)
  }

  /** Columns differing only by case (camelCase/lowercase API drift,
    * FIXTURES §A5) are ambiguous under Spark's case-insensitive
    * resolution — suffix later duplicates positionally so every name
    * resolves; returns the original→healed name map for alias lookups. */
  def healCaseDups(df: DataFrame): (DataFrame, Map[String, String]) = {
    val seen = scala.collection.mutable.Map[String, Int]()
    val pairs = df.columns.map { c =>
      val k = c.toLowerCase
      val n = seen.getOrElse(k, 0); seen(k) = n + 1
      c -> (if (n == 0) c else c + "__case" + n)
    }
    (df.toDF(pairs.map(_._2): _*), pairs.toMap)
  }

  /** Heal one output column from case-drifted candidates: coalesce the
    * first-present candidates into `out`, drop the drifted originals. */
  def healAlias(healed: DataFrame, rename: Map[String, String],
      out: String, candidates: Seq[String]): DataFrame = {
    val present = candidates.flatMap(rename.get)
    val tmp = LakeIO.coalesceCandidates(healed, "__" + out, present)
    present.filter(_ != out).foldLeft(tmp)((d, c) => d.drop(c))
      .drop(out).withColumnRenamed("__" + out, out)
  }

  /** First-wins dedup by PK under a deterministic order column. */
  def dedupFirst(df: DataFrame, pk: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // --- fct_plays: nested flattening (orchestrate.py:1047-1081) --------------

  val shotInfoSchema: DataType = StructType(Seq(
    StructField("shooter", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))),
    StructField("made", StringType),
    StructField("range", StringType),
    StructField("assisted", StringType),
    StructField("assistedBy", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))),
    StructField("location", StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType))))))

  val onFloorSchema: DataType =
    ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))

  /** Raw plays records → silver fct_plays: gameId alias, onFloor array →
    * onfloor_player1..10 scalars (+ convenience array), shotInfo struct →
    * shot_* columns, first-wins dedup on id. */
  def plays(raw: DataFrame): DataFrame = {
    val (healed, rn) = healCaseDups(raw)
    val aliased = healAlias(healed, rn, "gameId", Seq("gameId", "gameid"))
      .withColumn("gameId", col("gameId").cast("long"))
    val parsed = aliased
      .withColumn("__of", lenientFromJson(col("onFloor").cast("string"), onFloorSchema))
      .withColumn("__si", lenientFromJsonStruct(col("shotInfo").cast("string"),
        shotInfoSchema.asInstanceOf[StructType]))
    val withOnFloor = (1 to 10).foldLeft(
      parsed.withColumn("onfloor_ids", expr("transform(__of, p -> p.id)"))) {
      case (df, i) =>
        df.withColumn(s"onfloor_player$i",
          expr(s"try_element_at(onfloor_ids, $i)"))
    }
    val flat = withOnFloor
      .withColumn("shot_shooter_id", col("__si.shooter.id"))
      .withColumn("shot_shooter_name", col("__si.shooter.name"))
      .withColumn("shot_made", toBool(col("__si.made")))
      .withColumn("shot_range", col("__si.range"))
      .withColumn("shot_assisted", toBool(col("__si.assisted")))
      .withColumn("shot_assisted_by_id", col("__si.assistedBy.id"))
      .withColumn("shot_assisted_by_name", col("__si.assistedBy.name"))
      .withColumn("shot_loc_x", col("__si.location.x"))
      .withColumn("shot_loc_y", col("__si.location.y"))
      .drop("__of", "__si", "onFloor", "shotInfo")
    dedupFirst(flat, Seq("id"), col("gameId"))
  }

  // --- fct_lines: per-provider explode (orchestrate.py:1168-1185) -----------

  val lineSchema: DataType = ArrayType(StructType(Seq(
    StructField("provider", StringType),
    StructField("spread", DoubleType),
    StructField("overUnder", DoubleType),
    StructField("homeMoneyline", DoubleType),
    StructField("awayMoneyline", DoubleType))))

  /** Raw per-game lines records (lines: JSON array) → one silver row per
    * (gameId, provider), first-wins deduped. */
  def lines(raw: DataFrame): DataFrame = {
    val (healed, rn) = healCaseDups(raw)
    val aliased = healAlias(healed, rn, "gameId", Seq("gameId", "gameid"))
      .withColumn("gameId", col("gameId").cast("long"))
    val exploded = aliased
      .withColumn("__l", explode(lenientFromJson(col("lines").cast("string"), lineSchema)))
      .select(aliased.columns.filter(_ != "lines").map(col) :+ col("__l.*"): _*)
    dedupFirst(exploded, Seq("gameId", "provider"), col("gameId"))
  }

  /** Generic silver pass: alias healing + first-wins PK dedup for flat
    * tables (fct_games, dim_teams, …). */
  def flatTable(raw: DataFrame, aliases: Map[String, Seq[String]],
      pk: Seq[String], ord: String): DataFrame = {
    val (healed0, rn) = healCaseDups(raw)
    val healed = aliases.foldLeft(healed0) { case (df, (out, candidates)) =>
      healAlias(df, rn, out, candidates)
    }
    dedupFirst(healed, pk, col(ord))
  }
}
