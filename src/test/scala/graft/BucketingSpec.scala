package graft

import org.apache.spark.sql.functions._
import graft.sources.{LakeIO, Tables}

/** Co-located bucketed joins — the 100 TB layout decision the brief
  * calls out: when two facts are repeatedly joined on a key, bucket
  * both by that key at write time and every subsequent join (and
  * groupBy on the key) runs with ZERO exchanges. The shuffle is paid
  * once, at ingest.
  */
class BucketingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // DROP TABLE removes only the catalog entry for these external
  // tables; the parquet trees under the temp root must go too
  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }

  test("same-key bucketed facts sort-merge-join with zero exchanges") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val orders = Tables.orders(s, sf)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val lineitem = Tables.lineitem(s, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

    LakeIO.saveBucketed(orders, "bkt_orders", "o_orderkey", 8,
      Some(s"$root/orders"))
    LakeIO.saveBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bkt_lineitem", "o_orderkey", 8, Some(s"$root/lineitem"))

    // force the SMJ path (broadcast would hide the exchange question)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("bkt_lineitem")
        .join(s.table("bkt_orders"), "o_orderkey")
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), first(col("o_totalprice")))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"),
        s"bucketed join+agg must not shuffle:\n${p.take(3000)}")

      // same result as the plain parquet join
      val expect = lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy(lineitem("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS bkt_orders")
      s.sql("DROP TABLE IF EXISTS bkt_lineitem")
      deleteRecursively(root)
    }
  }

  test("bucketed train grams: the t28b decontamination semi-join " +
      "shuffles only the eval side") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-bkt3").toString
    // t28b's two sides, from the SAME gram-hash frame the gate runs
    val grams = graft.queries.TextOps.gramHashes(Tables.documents(s, sf))
    val train = grams.filter(!col("is_eval")).select(col("h")).distinct()
    val evalG = grams.filter(col("is_eval")).select(col("doc_id"), col("h"))

    // the 100-TB layout: train grams bucketed by hash ONCE at write
    // time (the corpus side is huge and reused across eval sets);
    // each decontamination run then shuffles only its eval side
    LakeIO.saveBucketed(train, "bkt_train_grams", "h", 8,
      Some(s"$root/train_grams"))
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val semi = evalG.join(s.table("bkt_train_grams"), Seq("h"), "left_semi")
      semi.collect()
      // AQE's toString appends the pre-adaptive "Initial Plan" — count
      // exchanges in the FINAL plan section only
      val p = semi.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"),
        p.take(2000))
      assert("Exchange".r.findAllIn(p).size == 1,
        s"only the eval side may shuffle:\n${p.take(3000)}")
      assert(p.contains("Bucketed: true"),
        s"train side must read pre-bucketed:\n${p.take(3000)}")

      // contamination counts match the plain (both-sides-shuffled) form
      val expect = evalG.join(train, Seq("h"), "left_semi")
        .groupBy(col("doc_id")).agg(countDistinct(col("h")).as("nc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = semi.groupBy(col("doc_id"))
        .agg(countDistinct(col("h")).as("nc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
      assert(got.nonEmpty, "degenerate fixture: no contaminated eval docs")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS bkt_train_grams")
      deleteRecursively(root)
    }
  }

  test("bucketed LSH band table: the d02 candidate self-join runs " +
      "with zero exchanges") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-bkt4").toString
    // d02's band table shape: (doc_id, band index, band hash) — the
    // candidate pair join is an equi-self-join on (b, h)
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 4)
    val bands = docs.select(col("doc_id"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS b, " +
          "md5(concat_ws('|', b, slice(w, 1, 3))) AS h))")).as("m"))
      .select(col("doc_id"), col("m.b").as("b"), col("m.h").as("h"))
    // composite-key bucketing: bucket AND sort by (b, h) — the write
    // IS the shuffle the self-join would otherwise pay on both sides
    LakeIO.saveBucketed(bands, "bkt_bands", Seq("b", "h"), 8,
      Some(s"$root/bands"))
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = s.table("bkt_bands")
      val pairs = t.as("x").join(t.as("y"),
          col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      pairs.collect()
      val p = pairs.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"),
        s"bucketed band self-join must not shuffle:\n${p.take(3000)}")
      // parity with the plain (shuffled) self-join
      val expect = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expect)
      assert(got.nonEmpty, "degenerate fixture: no candidate pairs")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS bkt_bands")
      deleteRecursively(root)
    }
  }

  test("IVF cell layout: a probe scan prunes to the probed cells' partitions") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    // v09's index-build output: every vector assigned to its max-dot
    // converged-KMeans cell (k=8)
    val e = Tables.embeddings(s, sf)
    val (_, cent, _) = graft.operators.KMeans.fitConverged(
      s, e, k = 8, maxIter = 25, tol = 0.12)
    import s.implicits._
    val centDf = cent.zipWithIndex
      .map { case (v, ci) => (ci.toLong, v.toSeq) }.toSeq.toDF("cell", "cv")
    val asg = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(centDf), lit(true))
      .withColumn("dot", expr(
        "aggregate(zip_with(cv, embedding, (x, y) -> x * CAST(y AS DOUBLE)), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cell"), struct(col("dot"), (-col("cell")).as("nc")))
          .as("cell"),
        first(col("embedding")).as("embedding"))
    // the 100-TB layout v09's doc names: corpus written partitioned by
    // cell, so an nprobe-cell probe READS only those partitions
    LakeIO.writePartitioned(asg, s"$root/ivf", Seq("cell"))
    try {
      val probed = Seq(3L, 5L)
      val probe = s.read.parquet(s"$root/ivf")
        .filter(col("cell").isin(probed: _*))
      val plan = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("PartitionFilters"), plan.take(2000))
      probe.collect()
      val scan = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      val np = scan.metrics.get("numPartitions").map(_.value)
      assert(np.contains(2L),
        s"probe must read exactly the 2 probed cell partitions, got $np")
      // and the probe returns exactly those cells' vectors
      val expect = asg.filter(col("cell").isin(probed: _*))
        .agg(count(lit(1)), sum(col("vec_id"))).head()
      val got = probe.agg(count(lit(1)), sum(col("vec_id"))).head()
      assert(got == expect)
      assert(got.getLong(0) > 0, "degenerate fixture: probed cells empty")
    } finally deleteRecursively(root)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-bkt2").toString
    val lineitem = Tables.lineitem(s, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    LakeIO.saveBucketed(lineitem, "bkt_li2", "l_orderkey", 8,
      Some(s"$root/li"))
    try {
      val agg = s.table("bkt_li2").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed groupBy must not shuffle:\n${p.take(3000)}")
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_li2")
      deleteRecursively(root)
    }
  }
}
