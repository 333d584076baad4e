package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Input-shape tolerance shared by the gold builders (the reference's
  * _io_helpers.pydict_get: a missing input column reads as all-null
  * rather than failing the build). */
private[graft] object IoHelpers {
  def colOrNull(df: DataFrame, name: String, tpe: String): Column =
    if (df.columns.contains(name)) col(name).cast(tpe)
    else lit(null).cast(tpe)

  /** First present candidate column (the reference's pydict_get_first:
    * e.g. homeScore|homePoints, offenserating|offensiveRating). */
  def colFirst(df: DataFrame, names: Seq[String], tpe: String): Column =
    names.find(df.columns.contains).map(col(_).cast(tpe))
      .getOrElse(lit(null).cast(tpe))
}
