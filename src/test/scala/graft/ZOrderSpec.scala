package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Morton-key properties: exact round-trip, quadrant ordering, and the
  * locality payoff (z-sorted chunks span bounded boxes in BOTH
  * dimensions, x-sorted chunks do not bound y at all).
  */
class ZOrderSpec extends SparkSpec {

  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until bits).foreach { i =>
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  test("zValue round-trips: de-interleaving recovers (x, y) exactly") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000)
      .map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
      .toDF("x", "y")
    val rows = df.select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y) = deinterleave(r.getLong(2), 16)
      assert((x, y) == (r.getLong(0), r.getLong(1)),
        s"z=${r.getLong(2)} decoded to ($x,$y), expected (${r.getLong(0)},${r.getLong(1)})")
    }
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }

  test("quadrant order: the top interleaved bits ARE the quadrant index") {
    val s = spark
    import s.implicits._
    // 4 points, one per quadrant of the 16-bit space
    val df = Seq((0L, 0L), (40000L, 0L), (0L, 40000L), (40000L, 40000L))
      .toDF("x", "y")
    val zs = df.select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // quadrant = (y_msb << 1) | x_msb = z's top two bits
    assert(zs.map(_ >> 30).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("parquet row-group pruning: the z layout prunes on the NON-sort dimension too") {
    val s = spark
    import s.implicits._
    // full 256x256 grid; small row groups so min/max stats have
    // skipping granularity; same data, two layouts. Row-group stats
    // are per-COLUMN (x, y — never z), so the x-sorted file prunes
    // x filters perfectly and y filters not at all, while z-sorted
    // groups are 2-D boxes with bounded x AND y ranges: the payoff
    // (and the tradeoff — on pure x filters the x sort stays ahead).
    val pts = (for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong))
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 8).as("z"))
    val dir = Files.createTempDirectory("graft_zorder_")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(dir.toFile)
    def write(sorted: org.apache.spark.sql.DataFrame, name: String): String = {
      val p = s"$dir/$name"
      sorted.coalesce(1).write
        .option("parquet.block.size", (64 * 1024).toString)
        .mode("overwrite").parquet(p)
      p
    }
    val zPath = write(df.orderBy(col("z")), "byz")
    val xPath = write(df.orderBy(col("x"), col("y")), "byx")
    def scanRows(path: String): Long = {
      val q = s.read.parquet(path)
        .filter(col("y").between(100, 107)) // the dimension x-sort can't prune
      // execute THIS frame so the metrics below are the executed scan's
      val n = q.collect().length
      assert(n == 8 * 256, s"slice should hold 2048 rows, got $n")
      val leaves = q.queryExecution.executedPlan.collectLeaves()
      leaves.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    val zRead = scanRows(zPath)
    val xRead = scanRows(xPath)
    assert(xRead >= 65536L * 99 / 100, // a tiny tail group may still prune
      s"x-sorted groups span all of y, the y filter reads ~everything (got $xRead)")
    assert(zRead * 2 < xRead,
      s"z layout should skip most row groups on a y filter: z=$zRead vs x=$xRead")
  }

  test("locality: fixed-size z-sorted chunks bound BOTH dims; x-sorted chunks don't bound y") {
    val s = spark
    import s.implicits._
    val pts = for (x <- 0 until 256; y <- 0 until 256 if (x * 31 + y * 17) % 16 == 0)
      yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 8).as("z"))
    def maxChunkSpread(sorted: Array[(Long, Long)], chunk: Int): (Long, Long) = {
      val spans = sorted.grouped(chunk).map { g =>
        (g.map(_._1).max - g.map(_._1).min, g.map(_._2).max - g.map(_._2).min)
      }.toSeq
      (spans.map(_._1).max, spans.map(_._2).max)
    }
    val byZ = df.orderBy(col("z")).select(col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byX = df.orderBy(col("x"), col("y")).select(col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (zx, zy) = maxChunkSpread(byZ, 256)
    val (_, xy) = maxChunkSpread(byX, 256)
    // z-sorted 256-row chunks live in small boxes in BOTH dims; the
    // x-sorted layout leaves y completely unbounded per chunk
    assert(zx <= 64 && zy <= 64, s"z chunks span ($zx, $zy), expected <=64 boxes")
    assert(xy >= 200, s"x-sorted chunks should NOT bound y (got $xy)")
  }
}
