package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("leftAsOf: ties at equal ts match (inclusive); no prior row -> nulls") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "ts", "lname")
    val right = Seq((1L, 100L, "r_at_100"), (1L, 60L, "r_at_60"), (1L, 40L, "r_at_40"))
      .toDF("k", "ts", "rname")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("rname", "ts"))
      .collect().map(r => r.getAs[String]("lname") -> r).toMap
    // equal ts matches (inclusive, like ASOF ... >=)
    assert(out("p1").getAs[String]("asof_rname") == "r_at_100")
    assert(out("p0").getAs[String]("asof_rname") == "r_at_40") // latest <= 50
    assert(out("p2").isNullAt(out("p2").fieldIndex("asof_rname"))) // key 2: none
    assert(out.size == 3) // left join: every left row survives
  }

  test("rangeJoin: inclusive boundaries, cross-bucket matches, no duplicates") {
    val s = spark
    import s.implicits._
    // window 100ms; left at 250 -> bucket 2; rights at 150 (bucket 1,
    // exactly windowMs before), 250 (equal), 149 (outside), 251 (after)
    val left = Seq((1L, 250L, 10L)).toDF("k", "ms", "lid")
    val right = Seq((1L, 150L, 20L), (1L, 250L, 21L), (1L, 149L, 22L),
      (1L, 251L, 23L), (2L, 250L, 24L)).toDF("k", "ms", "rid")
    val out = AsOfJoin.rangeJoin(left, right, "k", "ms", 100L)
      .select(col("rid_r")).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(20L, 21L)) // 149 outside, 251 in future, key 2 excluded
  }
}
