package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word-3-gram totals in ONE hash pass —
  * `(g_total, g_dist)` over `split(text, " ")` tokens, 3-grams joined
  * with single spaces (exactly the composed
  * `transform(sequence, concat_ws) -> array_distinct` recipe).
  *
  * Why: `array_distinct` over n-gram STRINGS is the dominant cost of
  * the Gopher-style repetition metric — on ~1k-gram documents it is
  * quadratic-ish pairwise string comparison, measured at ~75% of the
  * whole quality cascade (round-6 bisect, BENCH_SCALE.md). A HashSet
  * membership pass is linear in total gram length.
  */
case class GramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_stats expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("g_total", LongType, nullable = false),
    StructField("g_dist", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GramStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {

  /** Mirrors the composed form: g_total = max(#tokens - 2, 0); g_dist =
    * |distinct 3-grams| (0 when #tokens < 3). */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val total = math.max(toks.length - 2, 0).toLong
    if (toks.length < 3) return InternalRow(total, 0L)
    // capacity hint clamped: total*2+16 overflows Int for ~1B-token docs,
    // and the set grows itself past the hint anyway
    val seen = new java.util.HashSet[String](math.min(total * 2 + 16, 1L << 26).toInt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    InternalRow(total, seen.size.toLong)
  }

  def register(spark: SparkSession): Unit =
    // idempotent: query fns re-register per invocation; skip if present
    // so repeated Verify/Bench passes don't spam 'replaced' warnings
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("gram_stats")))
      spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("gram_stats"),
      new ExpressionInfo(classOf[GramStats].getName, "gram_stats"),
      (children: Seq[Expression]) => GramStats(children(0)))
}
