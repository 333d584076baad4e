package graft

import org.apache.spark.sql.functions._
import graft.sources.LakeIO

/** The persistent-catalog path (S8, reference glue_catalog.py:13-62):
  * external registration over parquet locations and managed
  * saveAsTable, with the SQL surface running against catalog-backed
  * names instead of temp views. */
class CatalogSpec extends SparkSpec {

  test("registerExternal: SQL runs against a catalog-backed parquet location") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v").write.mode("overwrite").parquet(s"$root/t1")
    Seq((1L, "x"), (9L, "y")).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$root/t2")

    LakeIO.registerExternal(s, "cat_t1", s"$root/t1")
    LakeIO.registerExternal(s, "cat_t2", s"$root/t2")
    assert(s.catalog.tableExists("cat_t1"))

    // sql01-style UNION ALL validation against catalog-backed names
    val out = s.sql("""
      SELECT 'cat_t1' AS tbl, count(*) AS n FROM cat_t1
      UNION ALL
      SELECT 'cat_t2', count(*) FROM cat_t2
      UNION ALL
      SELECT 'joined', count(*) FROM cat_t1 JOIN cat_t2 USING (id)
      ORDER BY tbl""").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("cat_t1" -> 3L, "cat_t2" -> 2L, "joined" -> 1L))

    s.sql("DROP TABLE cat_t1"); s.sql("DROP TABLE cat_t2")
  }

  test("registerExternal: partitioned layout recovers partitions and prunes") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-p").toString
    val df = (1 to 100).map(i => (i.toLong, 2020 + i % 3, i * 1.5))
      .toDF("id", "season", "x")
    LakeIO.writePartitioned(df, s"$root/t", Seq("season"))

    LakeIO.registerExternal(s, "cat_part", s"$root/t", partitioned = true)
    val got = s.sql("SELECT count(*) AS n FROM cat_part WHERE season = 2021")
    // partition filter must prune to the one season=2021 directory
    val scan = got.queryExecution.executedPlan.toString()
    assert(s.table("cat_part").count() == 100)
    assert(got.head().getLong(0) == df.filter(col("season") === 2021).count())
    assert(!scan.contains("season=2020") || scan.contains("season=2021"))
    s.sql("DROP TABLE cat_part")
  }

  test("saveAsManagedTable: partitioned managed table round-trips") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "2025-01-01", 5.0), (2L, "2025-01-02", 7.0))
      .toDF("id", "d", "v")
    LakeIO.saveAsManagedTable(df, "cat_managed", Seq("d"))
    assert(s.catalog.tableExists("cat_managed"))
    val back = s.table("cat_managed").orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("v")))
    assert(back.toSeq == Seq((1L, 5.0), (2L, 7.0)))
    // overwrite is idempotent
    LakeIO.saveAsManagedTable(df, "cat_managed", Seq("d"))
    assert(s.table("cat_managed").count() == 2)
    s.sql("DROP TABLE cat_managed")
  }
}
