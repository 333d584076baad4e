package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Two-pass exact heavy hitters: the MG candidate guarantee, the
  * k-bounded merge, and end-to-end equality with the naive groupBy
  * answer (which is the whole point — the sketch prunes, never alters).
  */
class HeavyHittersSpec extends SparkSpec {

  test("exact() equals the naive groupBy+having answer on a skewed stream") {
    val s = spark
    import s.implicits._
    // zipf-ish: token t_j appears ~ 3000/j times, j = 1..400 — a long
    // tail far wider than k, with a handful of true heavy hitters
    val rows = (1 to 400).flatMap(j => Seq.fill(3000 / j)(s"t_$j"))
    val df = rows.toDF("tok").repartition(8)
    val n = rows.size.toLong
    val got = HeavyHitters.exact(df, "tok", k = 63, denom = 50.0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c >= n.toDouble / 50.0 }.toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < 60, s"degenerate fixture: ${got.size}")
  }

  test("candidates() retains everything above N/(k+1) and stays k-bounded") {
    val s = spark
    import s.implicits._
    val rows = (1 to 300).flatMap(j => Seq.fill(1200 / j)(s"t_$j"))
    val df = rows.toDF("tok").repartition(16)
    val k = 31
    val (cands, n) = HeavyHitters.candidates(df, "tok", k)
    assert(n == rows.size)
    assert(cands.size <= k, s"summary exceeded k: ${cands.size}")
    val must = rows.groupBy(identity).view.mapValues(_.size)
      .collect { case (t, c) if c > n.toDouble / (k + 1) => t }.toSet
    assert(must.subsetOf(cands), s"MG guarantee violated: missing ${must -- cands}")
  }

  test("nulls are skipped and below-guarantee denom is rejected") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("tok")
    val (cands, n) = HeavyHitters.candidates(df, "tok", 8)
    assert(n == 3 && cands == Set("a", "b"))
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, "tok", k = 9, denom = 11.0)
    }
  }
}
