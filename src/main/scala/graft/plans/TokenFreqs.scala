package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document term frequencies in ONE
  * pass — `array<struct<tok, tf>>` over `split(text, " ")` tokens,
  * sorted by token for determinism. Replaces the explode-per-token →
  * groupBy(doc_id, tok) stage that every tf-based operator (unigram LM
  * scoring, TF-IDF) starts with: at scale that shuffles one row per
  * token OCCURRENCE of the corpus; this emits one row per DISTINCT
  * (doc, token) pair and moves nothing to compute it.
  *
  * Tokenization matches Spark's split (limit -1, empties kept), so
  * `explode(token_freqs(text))` aggregates to exactly what
  * `explode(split(text,' ')) → groupBy` produces.
  */
case class TokenFreqs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_freqs expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_freqs"

  override protected def nullSafeEval(input: Any): Any =
    TokenFreqs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenFreqs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenFreqs =
    copy(child = newChild)
}

object TokenFreqs {

  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1) // Spark split: empties kept
    val m = new java.util.HashMap[String, java.lang.Long]
    var i = 0
    while (i < toks.length) {
      val prev = m.get(toks(i))
      m.put(toks(i), if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val keys = m.keySet.toArray(new Array[String](0))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val rows = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      rows(i) = InternalRow(UTF8String.fromString(keys(i)), m.get(keys(i)).longValue())
      i += 1
    }
    new GenericArrayData(rows)
  }

  def register(spark: SparkSession): Unit =
    // idempotent: query fns re-register per invocation; skip if present
    // so repeated Verify/Bench passes don't spam 'replaced' warnings
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("token_freqs")))
      spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("token_freqs"),
      new ExpressionInfo(classOf[TokenFreqs].getName, "token_freqs"),
      (children: Seq[Expression]) => TokenFreqs(children(0)))
}
