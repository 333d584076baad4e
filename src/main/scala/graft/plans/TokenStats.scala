package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document token statistics in ONE
  * pass — `(n_tokens, n_stop, sum_wlen)` over `split(text, " ")`
  * tokens. Replaces the explode-per-token → groupBy(doc) stage: at
  * scale that shuffles one row per TOKEN of the corpus; this moves
  * nothing. Integer-only outputs: the mean/ratio/rounding math stays in
  * Spark SQL so float semantics are bit-identical to the composed form.
  *
  * Tokenization matches Spark's split (limit -1, empties kept);
  * `sum_wlen` counts codepoints per token like `length()`.
  */
case class TokenStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenStats.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  def compute(text: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val toks = text.toString.split(" ", -1) // Spark split: empties kept
    var nStop = 0L
    var sumLen = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length) // length() counts codepoints
      if (stop.contains(t)) nStop += 1
      i += 1
    }
    InternalRow(toks.length.toLong, nStop, sumLen)
  }

  /** Registry form: token_stats(text, 'stop1,stop2,…') — the stopword
    * list as one comma-joined string literal (none of ours contain
    * commas). */
  def register(spark: SparkSession): Unit =
    // idempotent: query fns re-register per invocation; skip if present
    // so repeated Verify/Bench passes don't spam 'replaced' warnings
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("token_stats")))
      spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (children: Seq[Expression]) => TokenStats(children(0),
        children(1).eval(null).asInstanceOf[UTF8String].toString.split(",").toSeq))
}
