package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** d08's prefix-filter losslessness probed on ADVERSARIAL synthetic
  * sets (the gate proves it on the corpus; this proves it where the
  * corpus has no coverage): exact-at-threshold pairs, singleton sets
  * (prefix = whole set), subset pairs, identical docs, and a seeded
  * pseudo-random family — each compared against a brute-force Scala
  * computation of every Jaccard >= 0.5 pair. */
class PrefixFilterSpec extends SparkSpec {

  private def frame(sets: Map[Long, Set[String]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = for ((d, s) <- sets.toSeq; t <- s)
      yield org.apache.spark.sql.Row(d, t)
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sh",
          org.apache.spark.sql.types.StringType))))
  }

  private def brute(sets: Map[Long, Set[String]]): Set[(Long, Long)] =
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = (sets(a) & sets(b)).size
      if c * 3 >= sets(a).size + sets(b).size // J >= 0.5 in integers
      if c > 0
    } yield (a, b)).toSet

  private def engine(sets: Map[Long, Set[String]]): Set[(Long, Long)] =
    graft.queries.TextOps.setSimPrefixJoin(frame(sets))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("adversarial fixed cases: at-threshold, singleton, subset, " +
      "identical, disjoint") {
    val sets = Map[Long, Set[String]](
      1L -> Set("a", "b", "c", "d"),       // vs 2: c=3, union=5 -> J=0.6
      2L -> Set("a", "b", "c", "e"),
      3L -> Set("a", "b"),                 // vs 4: c=2, sizes 2+4: 6<=6 -> exactly J=0.5
      4L -> Set("a", "b", "x", "y"),
      5L -> Set("z"),                      // singleton; vs 6 identical singleton
      6L -> Set("z"),
      7L -> Set("p", "q", "r"),            // subset of 8 (J=3/4)
      8L -> Set("p", "q", "r", "s"),
      9L -> Set("m1", "m2", "m3"),         // disjoint from everything
      10L -> Set("a", "e"))                // shares only rare-ish tokens, J<0.5 vs all
    val b = brute(sets)
    assert(b.contains((3L, 4L)), "the exactly-at-threshold pair must be in truth")
    assert(b.contains((5L, 6L)))
    assert(b.contains((7L, 8L)))
    assert(engine(sets) == b)
  }

  test("seeded pseudo-random family matches brute force exactly") {
    // md5-free determinism: token universe of 12, membership from a
    // fixed LCG so the case replays identically everywhere
    var x = 12345L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 40 }
    val sets = (1L to 30L).map { d =>
      val s = (0 until 12).filter(_ => nxt() % 3 != 0)
        .map(i => s"t$i").toSet
      d -> (if (s.isEmpty) Set("t0") else s)
    }.toMap
    val b = brute(sets)
    assert(b.nonEmpty, "seeded family should produce some pairs")
    assert(engine(sets) == b)
  }
}
