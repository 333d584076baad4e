package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing-lite k-gram fingerprint in ONE
  * per-row pass — `(min md5(kgram), count distinct kgrams)` as a struct.
  * The composed form (t04: explode all k-grams → groupBy(doc) → min/
  * countDistinct) materializes ~|text| rows per document and shuffles
  * them; this computes the same result inside the scan projection with
  * ZERO shuffle — the per-document work is identical, the data movement
  * is gone. Codegen emits a static call, keeping the surrounding
  * whole-stage pipeline intact.
  *
  * Semantics match Spark's character-based `substring` (codepoint
  * windows, so multi-byte text agrees with the composed form and the
  * DuckDB oracle) and `min` over md5 hex strings (ASCII lexicographic).
  */
case class KgramFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kgram_fingerprint expects (string, k>0), got ${child.dataType.catalogString}, k=$k")

  override def dataType: DataType = StructType(Seq(
    StructField("fp", StringType),
    StructField("n_kgrams", LongType)))
  // compute() returns null for texts shorter than k even when the child
  // is non-nullable; without this override codegen treats ev.isNull as a
  // constant and the `ev.isNull = true` branch fails janino compilation
  // (silent whole-stage fallback to interpreted eval).
  override def nullable: Boolean = true
  override def prettyName: String = "kgram_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    KgramFingerprint.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("kgfp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $res =
         |  graft.plans.KgramFingerprint.compute($c, $k);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): KgramFingerprint =
    copy(child = newChild)
}

object KgramFingerprint {

  /** One pass over codepoint windows; HashSet for distinct k-grams,
    * running min of the md5 hex. Returns null for texts shorter than k
    * (mirrors the composed form's empty-group behavior). */
  def compute(text: UTF8String, k: Int): InternalRow = {
    val s = text.toString
    // codepoint offsets so windows match substring()'s character slices
    val n = s.codePointCount(0, s.length)
    if (n < k) return null
    val offsets = new Array[Int](n + 1)
    var ci = 0; var oi = 0
    while (ci < n) { offsets(ci) = oi; oi = s.offsetByCodePoints(oi, 1); ci += 1 }
    offsets(n) = s.length

    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    var min: String = null
    var i = 0
    while (i + k <= n) {
      val kg = s.substring(offsets(i), offsets(i + k))
      if (seen.add(kg)) {
        val hex = toHex(md.digest(kg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (min == null || hex.compareTo(min) < 0) min = hex
        md.reset()
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(min), seen.size.toLong)
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

  /** Register on an existing session (idempotent); k via int literal. */
  def register(spark: SparkSession): Unit =
    // idempotent: query fns re-register per invocation; skip if present
    // so repeated Verify/Bench passes don't spam 'replaced' warnings
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("kgram_fingerprint")))
      spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("kgram_fingerprint"),
      new ExpressionInfo(classOf[KgramFingerprint].getName, "kgram_fingerprint"),
      (children: Seq[Expression]) => KgramFingerprint(children(0),
        children(1).eval(null).asInstanceOf[Int]))
}
