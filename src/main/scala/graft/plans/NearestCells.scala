package graft.plans

import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd IVF cell assignment: the top-`n` nearest centroids
  * of a vector column against driver-held centroid LITERALS, as one
  * flat primitive loop — the hot-path replacement for the composed
  * `slice(reverse(array_sort(array(struct(aggregate(zip_with(cv, vec,
  * ...)), -i) for each centroid))), 1, n)` form (VectorOps.nearestCells).
  *
  * WHY (r17, guide §4 + §7.3): the composed tree holds k centroid
  * literal ARRAYS of dim doubles each — k·dim literal nodes (1,600 at
  * kCells=25/dim=64) that the analyzer/optimizer re-walk on every
  * plan that assigns cells (every IVF build, probe, hub/medoid pass,
  * maintained-lake batch — usually several instances per plan), and
  * zip_with/aggregate are CodegenFallback, so at execution every ROW
  * pays k lambda-dispatch folds plus k intermediate arrays. This
  * expression is ONE plan node holding a flat double[] reference;
  * generated code runs the k·dim multiply-adds and an O(n·k) top-n
  * selection inline.
  *
  * PARITY (bit-exact with the composed form on well-formed vectors —
  * every cell-routed hash gate rides these assignments):
  *  - per-cell dot = Σ_j cent(c)(j) · (double)vec(j), accumulated
  *    LEFT-TO-RIGHT in element order — the zip_with/aggregate fold
  *    order, with the same exact float→double widening and the same
  *    cent·vec multiplication order;
  *  - ranking = (dot DESC, cell ASC): the composed array_sort is an
  *    ascending lexicographic struct sort on (dot, -cell) reversed,
  *    and the double comparison is Spark's own
  *    SQLOrderingUtil.compareDoubles (called directly here, so ties,
  *    ±0.0 and NaN order can never diverge from array_sort's);
  *  - output = array<struct<dot double, nc bigint>> of length n with
  *    nc = -cell, exactly the composed struct shape and field names.
  * Malformed input (length ≠ centroid dim, or a null element) returns
  * NULL — the PqSubspace convention; the composed form's output on
  * such input is all-null dots feeding a struct sort, i.e. garbage.
  * NearestCellsSpec pins bit-parity on real embeddings and the NULL
  * contract on malformed input.
  */
case class NearestCellsExpr(child: Expression,
    cent: Array[Array[Double]], n: Int) extends UnaryExpression {

  private val k: Int = cent.length
  private val dim: Int = cent.head.length
  require(n >= 1 && n <= k, s"top-n $n outside [1, $k]")
  /** Flat row-major copy for O(1) generated-code access. */
  private lazy val flatCent: Array[Double] = cent.flatten

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dot", DoubleType, nullable = true),
      StructField("nc", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      j += 1
    }
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var p = 0
      while (p < dim) {
        val x = if (elemIsFloat) vec.getFloat(p).toDouble else vec.getDouble(p)
        s += flatCent(c * dim + p) * x
        p += 1
      }
      dots(c) = s
      c += 1
    }
    // top-n by (dot desc, cell asc): ascending scan replaces only on a
    // strictly-greater compare, so ties keep the smaller cell index
    val taken = new Array[Boolean](k)
    val out = new Array[Any](n)
    var r = 0
    while (r < n) {
      var best = -1
      c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 ||
            org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(dots(c), dots(best)) > 0)) best = c
        c += 1
      }
      taken(best) = true
      out(r) = new GenericInternalRow(Array[Any](dots(best), -best.toLong))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cRef = ctx.addReferenceObj("ncCent", flatCent, "double[]")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val r = ctx.freshName("r")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val dots = ctx.freshName("dots")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val getX = if (elemIsFloat) s"(double) $vec.getFloat($p)"
                 else s"$vec.getDouble($p)"
      s"""
         |boolean $bad = $vec.numElements() != $dim;
         |if (!$bad) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($vec.isNullAt($j)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $dots = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0;
         |    for (int $p = 0; $p < $dim; $p++) {
         |      $s += $cRef[$c * $dim + $p] * ($getX);
         |    }
         |    $dots[$c] = $s;
         |  }
         |  boolean[] $taken = new boolean[$k];
         |  Object[] $out = new Object[$n];
         |  for (int $r = 0; $r < $n; $r++) {
         |    int $best = -1;
         |    for (int $c = 0; $c < $k; $c++) {
         |      if (!$taken[$c] && ($best < 0 ||
         |          org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |            .compareDoubles($dots[$c], $dots[$best]) > 0)) $best = $c;
         |    }
         |    $taken[$best] = true;
         |    $out[$r] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{Double.valueOf($dots[$best]), Long.valueOf((long) -$best)});
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {
  /** Column form — constructed directly (the DotProduct bridge
    * pattern). */
  def ofCol(vec: Column, cent: Array[Array[Double]], n: Int): Column =
    GraftPlanBridge.column(
      NearestCellsExpr(GraftPlanBridge.expr(vec), cent, n))
}
