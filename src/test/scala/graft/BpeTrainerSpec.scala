package graft

import graft.operators.BpeTrainer

/** Hand-checked BPE merge-loop scenarios (the classic low/lower/lowest
  * corpus): merge order, tiebreaks, non-overlapping application, and
  * the recounted pair table after the merges. */
class BpeTrainerSpec extends SparkSpec {

  test("two merges on low/lower/lowest: (l,o) then (lo,w), recount reflects both") {
    val s = spark
    import s.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L)).toDF("w", "wc")
    val (encoded, merges) = BpeTrainer.fit(words, iterations = 2)
    // pair counts round 1: (l,o)=10 (o,w)=10 (w,e)=5 (e,r)=2 (e,s)=3 (s,t)=3
    // -> tie at 10, "l o" < "o w" ascending; round 2: (lo,w)=10 wins
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    val syms = encoded.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("low", "e", "r"))
    assert(syms("lowest") == Seq("low", "e", "s", "t"))
    val counts = BpeTrainer.pairCounts(encoded).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("low e" -> 5L, "e r" -> 2L, "e s" -> 3L, "s t" -> 3L))
  }

  test("merges apply left-to-right non-overlapping (aaaa -> aa aa, aaa -> aa a)") {
    val s = spark
    import s.implicits._
    val words = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("w", "wc")
    val (encoded, merges) = BpeTrainer.fit(words, iterations = 1)
    assert(merges == Seq(("a", "a")))
    val syms = encoded.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("aaaa") == Seq("aa", "aa"))
    assert(syms("aaa") == Seq("aa", "a"))
  }

  test("a suffix collision cannot false-match: merging (a,b) leaves (xa)(b) alone") {
    val s = spark
    import s.implicits._
    // first merge on this corpus is (x,a) [all pairs tie at 2; "a b" is
    // ascending-first]... construct directly instead: one merged symbol
    // "xa" followed by "b" must NOT be rewritten by a later (a,b) merge.
    val words = Seq(("xab", 1L)).toDF("w", "wc")
    val (encoded1, m1) = BpeTrainer.fit(words, iterations = 1)
    assert(m1 == Seq(("a", "b"))) // pairs (x,a)=1, (a,b)=1 tie -> "a b" first
    val (encoded2, m2) = BpeTrainer.fit(words, iterations = 2)
    // after (a,b): symbols (x)(ab); round 2 merges (x, ab) -> one symbol
    assert(m2 == Seq(("a", "b"), ("x", "ab")))
    val syms = encoded2.select(col("syms")).collect().head.getSeq[String](0)
    assert(syms == Seq("xab"))
    // and the bracket anchoring: a word ending in ...xa + b with "xa" a
    // single symbol does not match the (a, b) pattern
    val pre = Seq(("xa", 1L)).toDF("w", "wc") // word "xa" -> merged symbol "xa"
    val (e3, m3) = BpeTrainer.fit(pre, iterations = 1)
    assert(m3 == Seq(("x", "a")))
    assert(e3.select(col("syms")).collect().head.getSeq[String](0) == Seq("xa"))
  }

  test("applyMerges round-trips the trainer's encoding (train-then-apply)") {
    val s = spark
    import s.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L),
      ("newer", 4L), ("wider", 1L)).toDF("w", "wc")
    val (encoded, merges) = BpeTrainer.fit(words, iterations = 4)
    assert(merges.size == 4)
    // re-encoding fresh words with the returned merge list must equal
    // the trainer's own final encoding, word for word
    val reapplied = words
      .select(col("w"), BpeTrainer.applyMerges(col("w"), merges).as("enc2"))
      .join(encoded.select(col("w"), col("enc"), col("syms")), Seq("w"))
    assert(reapplied.filter(col("enc2") =!= col("enc")).count() == 0)
    // tokenCount equals the trainer's symbol-array size
    val tc = reapplied
      .select(col("w"), BpeTrainer.tokenCount(col("enc2")).as("n"),
        org.apache.spark.sql.functions.size(col("syms")).as("m"))
    assert(tc.filter(col("n") =!= col("m")).count() == 0)
  }

  test("deep merge runs cross the lineage-checkpoint boundary and exhaust cleanly") {
    val s = spark
    import s.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L)).toDF("w", "wc")
    // far more iterations than available merges AND past the 25-merge
    // checkpoint cut: the loop must no-op once pairs run out
    val (encoded, merges) = BpeTrainer.fit(words, iterations = 30)
    val syms = encoded.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms.values.forall(_.size == 1), s"all words fully merged: $syms")
    assert(syms("lowest") == Seq("lowest"))
    // merge count = total pair-merge steps to collapse the three words
    assert(merges.size < 30 && merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    assert(BpeTrainer.pairCounts(encoded).count() == 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
