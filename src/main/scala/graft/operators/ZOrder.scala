package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * technique behind lakehouse OPTIMIZE ZORDER BY: interleaving the bits
  * of two columns gives a single sort key under which rows close in
  * EITHER dimension land close on disk, so min/max row-group stats
  * prune scans filtered on x, on y, or on both. A plain sort by x gives
  * perfect x-pruning and useless y-pruning; the z-curve trades a little
  * of each for locality in all dimensions at once.
  *
  * Built entirely from codegen'd builtin expressions (shiftleft /
  * bitwiseAND / bitwiseOR folds) — no UDF, no custom Expression — so
  * the key computes inside WholeStageCodegen and the write-time sort is
  * the only added cost. Usage at scale: `df.repartitionByRange(col(z))
  * .sortWithinPartitions(z)` (or LakeIO.saveBucketed sortBy z) before
  * the parquet write.
  *
  * (Reference analog: the S3 partition-layout decisions in
  * src/cbbd_etl/io_utils.py are single-dimension date paths; z-order is
  * the standard generalization when queries filter on more than one
  * column.)
  */
object ZOrder {

  /** Morton key of the low `bits` bits of `x` and `y` (both must be
    * non-negative and fit `bits` bits — mask first if unsure): x's bit
    * i lands at position 2i, y's at 2i+1. 2*bits <= 62. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits outside [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(xl.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(yl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** The matching ANSI SQL expression (DuckDB/Spark dialect-neutral
    * bitwise ops), for oracle replay of [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($x & ${1L << i}) << $i)", s"(($y & ${1L << i}) << ${i + 1})")
    }.mkString(" | ")
}
