package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.MinHashSignature

/** The native minhash-signature expression must be bit-identical to the
  * composed explode→groupBy form it replaced in the LSH pipeline,
  * including on repeated spaces (empty tokens), duplicate shingles, and
  * multi-byte text. */
class MinHashSignatureSpec extends SparkSpec {

  test("native minhash_sigs equals the composed signature frame") {
    val s = spark
    import s.implicits._
    MinHashSignature.register(s)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b a b a b a b"), // duplicate shingles
      (3L, "x  y  z  w"), // double spaces -> empty tokens kept by split
      (4L, "日本 語 の テキスト 窓"), // multi-byte tokens
      (5L, "one two three")) // < 4 words -> filtered
      .toDF("doc_id", "text")

    val composed = TextOps.signaturesFrom(
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 4)
        .select(col("doc_id"),
          expr("explode(transform(sequence(0, size(w)-4), " +
            "i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])))").as("sh")))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

    val native = docs.filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"), expr("minhash_sigs(text, 12)").as("mh"))
      .select(col("doc_id") +:
        (0 until 12).map(j => col("mh").getItem(j).as(s"mh$j")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

    assert(native == composed)
    assert(native.keySet == Set(1L, 2L, 3L, 4L))
    // every component is a 32-hex md5
    native.values.flatten.foreach(v =>
      assert(v.asInstanceOf[String].matches("[0-9a-f]{32}")))
  }
}
