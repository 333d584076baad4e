package graft

import scala.collection.mutable

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{HeavyHitters, ZOrder}
import graft.plans.TopKPerKey
import graft.plans.TopKPerKeyNode

/** Seeded-generator property tests for the round-8 operators (the
  * RatingsPropertiesSpec convention — direct Gen sampling, fixed
  * seeds, no scalatest/scalacheck bridge needed offline).
  */
class OperatorPropertiesSpec extends SparkSpec {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g(params, Seed(seed)).getOrElse(sys.error("gen failed"))
  private def forAllSeeds[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach(i => f(sample(g, i.toLong * 7919)))

  // token stream with a zipf-ish skew over a vocabulary larger than k
  private val genStream: Gen[List[String]] = for {
    vocab <- Gen.choose(20, 120)
    len <- Gen.choose(50, 400)
    toks <- Gen.listOfN(len, Gen.frequency(
      (8, Gen.choose(0, math.max(1, vocab / 10)).map(i => s"hot_$i")),
      (2, Gen.choose(0, vocab).map(i => s"cold_$i"))))
  } yield toks

  test("property: MG merge tree retains every item above N/(k+1), any split") {
    val k = 15
    forAllSeeds(Gen.zip(genStream, Gen.choose(1, 8))) { case (toks, parts) =>
      // split into `parts` partitions, summarize each, merge pairwise
      val groups = toks.grouped(math.max(1, toks.size / parts)).toList
      val summaries = groups.map { g =>
        val acc = mutable.Map.empty[String, Long]
        g.foreach(t => HeavyHitters.offer(acc, t, k))
        acc
      }
      val merged = summaries.reduceLeft((a, b) => HeavyHitters.merge(a, b, k))
      assert(merged.size <= k, s"summary exceeded k: ${merged.size}")
      val n = toks.size
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      counts.foreach { case (t, c) =>
        if (c > n.toDouble / (k + 1))
          assert(merged.contains(t),
            s"item $t freq=$c > N/(k+1)=${n.toDouble / (k + 1)} was evicted")
      }
      // counters never overestimate, and undercount is bounded by N/(k+1)
      merged.foreach { case (t, est) =>
        val truth = counts.getOrElse(t, 0L)
        assert(est <= truth, s"$t overestimated: $est > $truth")
        assert(truth - est <= n.toDouble / (k + 1) + 1e-9,
          s"$t undercount ${truth - est} exceeds N/(k+1)")
      }
    }
  }

  test("property: zValue interleave matches the reference bit math on random pairs") {
    val s = spark
    import s.implicits._
    def refZ(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      }
    val pairs = (1 to 300).map { i =>
      sample(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)), i.toLong * 104729)
    }
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y, 16), s"z($x,$y)=$z != ${refZ(x, y, 16)}")
    }
  }

  test("property: TopKPerKey equals its window form on random data, every mode") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { seed =>
      val (nRows, nKeys, vDomain, k) = sample(
        Gen.zip(Gen.choose(200, 2000), Gen.choose(3, 20),
          Gen.choose(2, 30), Gen.choose(1, 6)), seed.toLong * 31337)
      val df = s.range(nRows).select(
        (col("id") * 2654435761L % nKeys).as("key"),
        (col("id") * 40503L % vDomain).cast("double").as("v"),
        col("id").as("rid"))
      def setOf(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      for ((mode, wfn) <- Seq(
          (TopKPerKeyNode.RowNumberMode, row_number()),
          (TopKPerKeyNode.RankMode, rank()),
          (TopKPerKeyNode.DenseRankMode, dense_rank()))) {
        val order =
          if (mode == TopKPerKeyNode.RowNumberMode)
            Seq(col("v").desc, col("rid").asc) // unique tiebreak required
          else Seq(col("v").desc)              // ties are the point
        val w = Window.partitionBy(col("key")).orderBy(order: _*)
        val expect = setOf(df.withColumn("r", wfn.over(w))
          .filter(col("r") <= k).drop("r"))
        val got = setOf(TopKPerKey.topK(df, Seq("key"), order, k, mode))
        assert(got == expect,
          s"seed=$seed mode=$mode k=$k diverged (${got.size} vs ${expect.size})")
      }
    }
  }
}
