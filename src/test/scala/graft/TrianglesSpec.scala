package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Triangles

/** Degree-orientation triangle kernel: known small graphs, input
  * canonicalization, and brute-force parity on random graphs.
  */
class TrianglesSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Triangles.perNode(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: four triangles, every node in three; star: none") {
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    assert(run(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star) == Map.empty)
  }

  test("dup, reversed, and self-loop edges canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("property: matches brute-force enumeration on random graphs") {
    val params = Gen.Parameters.default
    def sample[A](g: Gen[A], seed: Long): A =
      g(params, Seed(seed)).getOrElse(sys.error("gen failed"))
    (1 to 6).foreach { i =>
      val (n, m) = sample(Gen.zip(Gen.choose(5, 25), Gen.choose(10, 120)),
        i.toLong * 7919)
      val edges = (1 to m).map { j =>
        sample(Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)),
          i.toLong * 100003 + j)
      }
      val adj = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = adj.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = scala.collection.mutable.Map.empty[Long, Long]
      for {
        a <- nodes; b <- nodes if a < b && adj((a, b))
        c <- nodes if b < c && adj((b, c)) && adj((a, c))
      } Seq(a, b, c).foreach(x => brute.update(x, brute.getOrElse(x, 0L) + 1))
      assert(run(edges) == brute.toMap, s"seed $i: diverged from brute force")
    }
  }
}
