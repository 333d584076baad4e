package graft

import graft.plans.BloomSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSketchSpec extends SparkSpec {

  test("no false negatives: every inserted value passes might_contain") {
    val s = spark
    import s.implicits._
    val vals = (1 to 5000).map(i => s"gram_$i")
    val df = vals.toDF("g")
    val bloom = BloomSketch.build(df, col("g"), expectedItems = 1L << 16)
    assert(bloom.nonEmpty)
    val survivors = df.filter(BloomSketch.mightContain(bloom, col("g"))).count()
    assert(survivors == 5000L, "a bloom filter can never drop an inserted value")
  }

  test("prefilter + exact verify equals the exact join (fpp kills most absent keys)") {
    val s = spark
    import s.implicits._
    val bench = (1 to 2000).map(i => s"bench_$i").toDF("g")
    val probe = ((1 to 500).map(i => s"bench_$i") ++ (1 to 20000).map(i => s"other_$i"))
      .toDF("g")
    val bloom = BloomSketch.build(bench, col("g"), expectedItems = 1L << 16)

    val prefiltered = probe.filter(BloomSketch.mightContain(bloom, col("g")))
    val verified = prefiltered.join(bench, Seq("g")).orderBy("g").collect()
    val exact = probe.join(bench, Seq("g")).orderBy("g").collect()
    assert(verified.sameElements(exact), "exact verify must erase bloom false positives")

    // the whole point of the prefilter: at 1<<16 expected items the fpp is
    // far below 1, so the shuffle-side survivor count collapses toward the
    // true-match count (500) instead of the probe count (20500)
    val n = prefiltered.count()
    assert(n >= 500 && n < 2500, s"prefilter should kill most absent keys, kept $n")
  }

  test("an empty build matches nothing") {
    val s = spark
    import s.implicits._
    val bloom = BloomSketch.build(Seq.empty[String].toDF("g"), col("g"), 1L << 10)
    val probe = Seq("a", "b").toDF("g")
    assert(probe.filter(BloomSketch.mightContain(bloom, col("g"))).count() == 0L)
  }
}
