package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Join-based PageRank: hand-checked updates, float-vs-fixed-point
  * agreement, and mass behavior.
  */
class PageRankSpec extends SparkSpec {

  test("path graph: one update matches the hand calculation, both forms") {
    val s = spark
    import s.implicits._
    // 1 - 2 - 3: degrees 1, 2, 1; p0 = 1 everywhere
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val float1 = PageRank.run(e, "a", "b", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(float1(1L) - 0.575) < 1e-12)
    assert(math.abs(float1(2L) - 1.85) < 1e-12)
    assert(math.abs(float1(3L) - 0.575) < 1e-12)
    val micro1 = PageRank.runExactMicro(e, "a", "b", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(micro1 == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
  }

  test("fixed-point tracks the float form within truncation loss on a random graph") {
    val s = spark
    import s.implicits._
    val edges = (1 to 150).map { i =>
      ((i * 2654435761L) % 40, (i * 40503L) % 40)
    }.filter { case (a, b) => a != b }.toDF("a", "b")
    val iters = 3
    val f = PageRank.run(edges, "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = PageRank.runExactMicro(edges, "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.keySet == m.keySet)
    // truncating div loses < 1 micro-unit per in-edge per round,
    // damped-amplified across rounds — 1e-3 absolute is generous
    f.foreach { case (n, p) =>
      assert(math.abs(p - m(n) / 1e6) < 1e-3,
        s"node $n: float $p vs micro ${m(n) / 1e6}")
    }
    // unnormalized ranks: total mass stays near N (damping redistributes,
    // undirected graph has no dangling loss)
    val total = f.values.sum
    assert(math.abs(total - f.size) < f.size * 0.01,
      s"mass drifted: $total vs ${f.size}")
  }

  test("converged form stops exactly where the pinned form lands and records iters") {
    val s = spark
    import s.implicits._
    val edges = (1 to 150).map { i =>
      ((i * 2654435761L) % 40, (i * 40503L) % 40)
    }.filter { case (a, b) => a != b }.toDF("a", "b")
    val conv = PageRank.runConvergedMicro(edges, "a", "b",
      tolMicro = 5000L, maxIters = 60).collect()
    val iters = conv.map(_.getInt(2)).distinct
    assert(iters.length == 1 && iters(0) >= 1 && iters(0) <= 60)
    val k = iters(0)
    // ranks at the stop round are bit-identical to the pinned form run
    // for exactly k rounds (same exact integer update)
    val pinned = PageRank.runExactMicro(edges, "a", "b", iters = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = conv.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pinned)
    // genuine convergence stop: the k-1 -> k delta is within tol, and
    // (when k >= 2) the k-2 -> k-1 delta was still above it
    val prev = PageRank.runExactMicro(edges, "a", "b", iters = k - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dStop = pinned.map { case (n, p) => math.abs(p - prev(n)) }.max
    assert(dStop <= 5000L, s"stop delta $dStop above tol")
    if (k >= 2) {
      val prev2 = PageRank.runExactMicro(edges, "a", "b", iters = k - 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dPrev = prev.map { case (n, p) => math.abs(p - prev2(n)) }.max
      assert(dPrev > 5000L, s"pre-stop delta $dPrev already within tol")
    }
  }

  test("converged form throws on unconverged exit instead of truncating silently") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    intercept[IllegalStateException] {
      PageRank.runConvergedMicro(e, "a", "b", tolMicro = 0L, maxIters = 1)
    }
  }

  test("iters = 0 returns the uniform initial ranks") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val m = PageRank.runExactMicro(e, "a", "b", iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }
}
