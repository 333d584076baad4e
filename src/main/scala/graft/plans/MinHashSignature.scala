package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the K-component minhash signature of a
  * document in ONE per-row pass — `array(min_j md5("j|" + shingle))`
  * over word 4-shingles. Value-identical to the composed pipeline
  * (split → explode shingles → groupBy(doc) → K min(md5) aggs) that
  * materializes ~#words rows per doc through a shuffle; this moves zero
  * rows and hashes each DISTINCT shingle once per seed.
  *
  * Tokenization matches Spark's `split(text, " ")` (limit -1, trailing
  * empties kept) and `concat_ws(" ", w[i..i+3])` exactly. Returns null
  * for docs with fewer than 4 words (the composed form's filter).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects (string, k>0), got ${child.dataType.catalogString}, k=$k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // compute() returns null for docs with fewer than 4 words even when the
  // child is non-nullable; without this override codegen treats ev.isNull
  // as a constant and the `ev.isNull = true` branch fails janino
  // compilation (silent whole-stage fallback to interpreted eval).
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("mhsig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.plans.MinHashSignature.compute($c, $k);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  def compute(text: UTF8String, k: Int): ArrayData = {
    // limit -1 == Spark's split(text, " "): trailing empties kept
    val words = text.toString.split(" ", -1)
    if (words.length < 4) return null
    val mins = new Array[String](k)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i + 4 <= words.length) {
      val sh = words(i) + " " + words(i + 1) + " " + words(i + 2) + " " + words(i + 3)
      if (seen.add(sh)) {
        var j = 0
        while (j < k) {
          val hex = toHex(md.digest(
            (j.toString + "|" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          md.reset()
          if (mins(j) == null || hex.compareTo(mins(j)) < 0) mins(j) = hex
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  private def toHex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def register(spark: SparkSession): Unit =
    // idempotent: query fns re-register per invocation; skip if present
    // so repeated Verify/Bench passes don't spam 'replaced' warnings
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("minhash_sigs")))
      spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        children(1).eval(null).asInstanceOf[Int]))
}
