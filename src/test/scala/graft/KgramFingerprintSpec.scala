package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.KgramFingerprint

/** The native k-gram fingerprint must be bit-identical to the composed
  * explode→groupBy form (t04), including on multi-byte text where
  * codepoint windows matter. */
class KgramFingerprintSpec extends SparkSpec {

  private def composed(df: org.apache.spark.sql.DataFrame) =
    df.filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        expr("explode(transform(sequence(1, length(text)-7), " +
          "i -> substring(text, i, 8)))").as("kg"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("kg")).as("n_kgrams"), min(md5(col("kg"))).as("fp"))

  test("native expression matches the composed form, incl. multi-byte text") {
    val s = spark
    import s.implicits._
    KgramFingerprint.register(s)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaa"), // heavy duplicate k-grams
      (3L, "日本語のテキストで八文字窓を確認する"), // multi-byte codepoints
      (4L, "exactly8"), // single window
      (5L, "short")) // below k -> dropped by the filter
      .toDF("doc_id", "text")

    val native = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"), expr("kgram_fingerprint(text, 8)").as("s"))
      .select(col("doc_id"), col("s.n_kgrams").as("n_kgrams"), col("s.fp").as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val comp = composed(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(native == comp)
    assert(native.keySet == Set(1L, 2L, 3L, 4L))
    assert(native(2L)._1 == 1L) // 5 windows, all identical
    assert(native(4L)._1 == 1L)
  }

  test("demoted t04 gate coverage: the composed explode form matches " +
      "the native gate row-for-row on the REAL documents table " +
      "(VERDICT r12 #4 — the former t04_fingerprint hash gate, now a " +
      "parity pin instead of 5.1 s of per-round bench)") {
    val sf = "/root/testdata/sf0.001"
    KgramFingerprint.register(spark)
    val native = graft.sources.Tables.documents(spark, sf)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), expr("kgram_fingerprint(text, 8)").as("s"))
      .select(col("doc_id"), col("s.n_kgrams").as("n_kgrams"),
        col("s.fp").as("fp"), substring(col("s.fp"), 1, 8).as("fp8"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    val comp = graft.queries.TextOps.fingerprintComposed(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(native == comp)
    assert(native.nonEmpty)
  }

  test("interpreted eval agrees with codegen and nulls below k") {
    val row = KgramFingerprint.compute(UTF8String.fromString("abcdefgh"), 8)
    assert(row.getLong(1) == 1L)
    assert(row.getUTF8String(0).toString.length == 32)
    assert(KgramFingerprint.compute(UTF8String.fromString("abc"), 8) == null)
    // direct Expression.eval (interpreted path)
    val e = KgramFingerprint(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("abcdefghi"), org.apache.spark.sql.types.StringType), 8)
    val out = e.eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(out.getLong(1) == 2L)
  }
}
