package graft

import org.apache.spark.sql.functions._

import graft.gold.GoldRunner
import graft.queries.GoldGate

/** Error isolation of the gold runner registry pass (reference
  * gold/runner.py:98-108: a failing build is logged and the loop
  * continues; :133-165: every successful table still publishes). */
class GoldRunnerSpec extends SparkSpec {

  test("full registry run isolates a poisoned table and publishes the rest") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val root = GoldGate.poisonedRunnerLake(s, d)
    try {
      val res = GoldRunner.run(s, root, GoldGate.Season)
      assert(res.keySet == GoldRunner.transforms.keySet)
      assert(res.size == 7)

      // the poisoned table errors...
      assert(res("player_season_impact").isLeft)
      // ...and nothing of it is published
      assert(!new java.io.File(s"$root/gold/player_season_impact").exists())

      // the other six all publish real partitioned parquet
      val ok = res - "player_season_impact"
      assert(ok.values.forall(_.isRight))
      ok.foreach { case (t, r) =>
        val dir = new java.io.File(
          s"$root/gold/$t/season=${GoldGate.Season}")
        assert(dir.isDirectory, s"$t: expected published partition dir")
        val n = s.read.parquet(s"$root/gold/$t").count()
        assert(Right(n) == r, s"$t: read-back count mismatch")
        assert(n > 0, s"$t: published table is empty")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("dry run reports counts but writes nothing") {
    val s = spark
    val root = GoldGate.poisonedRunnerLake(s, "/root/testdata/sf0.001")
    try {
      val res = GoldRunner.run(s, root, GoldGate.Season,
        only = Some("market_lines_analysis"), dryRun = true)
      assert(res("market_lines_analysis").isRight)
      assert(!new java.io.File(s"$root/gold").exists())
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
