package graft.plans

import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd left-to-right double dot product over two vector
  * array columns — the hot-path replacement for the composed
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)` form
  * (VectorOps.dot). The composed tree is CodegenFallback: every
  * evaluation pays two lambda dispatches per element plus an
  * intermediate array allocation PER ROW — and the dot sits under the
  * pair joins whose row counts are the vector tier's flop budget
  * (knnGraph / StreamingKnnGraph pair streams at sum(cell²) rows, the
  * vamana occlusion self-join at n·poolCap² rows, every walk hop's
  * exact scoring). One flat primitive loop in generated code does the
  * same math (the PqSubspace precedent, guide §4).
  *
  * PARITY (bit-exact with the composed form, which the hash gates
  * pin): per element, (double)x * (double)y — float→double widening is
  * exact — accumulated LEFT-TO-RIGHT in array order, exactly the
  * aggregate fold order. NULL contract mirrors the composed form too:
  * null array → null; length mismatch → null (zip_with pads the
  * shorter side with nulls and the null product nulls the whole
  * aggregate); any null element → null (acc + null = null, and null
  * absorbs every later add). DotProductSpec pins bit-parity against
  * the composed twin on real embedding data and the null contract on
  * malformed input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null // zip_with null-pad → null sum
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // acc + null = null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val getX = if (leftIsFloat) s"(double) $x.getFloat($i)"
                 else s"$x.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $y.getFloat($i)"
                 else s"$y.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |boolean $bad = $y.numElements() != $n;
         |double $s = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $s += ($getX) * ($getY);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column form — constructed directly (no registry round-trip), the
    * TopKPerKey bridge pattern; resolves during analysis like any
    * function-built column. */
  def ofCols(a: Column, b: Column): Column =
    GraftPlanBridge.column(
      DotProduct(GraftPlanBridge.expr(a), GraftPlanBridge.expr(b)))
}
