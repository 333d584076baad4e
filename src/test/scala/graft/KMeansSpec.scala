package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends SparkSpec {

  test("k-means separates two obvious clusters and is deterministic") {
    val s = spark
    import s.implicits._
    // two tight blobs on opposite axes
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array(1.0f + i * 0.01f, 0.0f, 0.0f, 0.0f))) ++
      (10 until 20).map(i =>
        (i.toLong, Array(0.0f, 0.0f, 1.0f + i * 0.01f, 0.0f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val (assign, cents) = KMeans.fit(s, emb, k = 2, iterations = 3)
    val byCluster = assign.collect()
      .groupBy(_.getAs[Int]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    // the two blobs land in different clusters, each intact
    assert(byCluster.values.toSet ==
      Set((0L until 10L).toSet, (10L until 20L).toSet))
    // centroids point along the blob axes
    val c = cents.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(c == Set(0, 2))
    // deterministic across runs
    val (assign2, cents2) = KMeans.fit(s, emb, k = 2, iterations = 3)
    assert(assign2.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      assign.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
  }

  test("fitConverged stops on the max-|delta| test, runs to maxIter when disabled") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array(1.0f + i * 0.01f, 0.0f, 0.0f, 0.0f))) ++
      (10 until 20).map(i =>
        (i.toLong, Array(0.0f, 0.0f, 1.0f + i * 0.01f, 0.0f)))
    val emb = vecs.toDF("vec_id", "embedding")
    // a huge tolerance converges after the very first update
    val (_, _, one) = KMeans.fitConverged(s, emb, k = 2, maxIter = 10, tol = 1e9)
    assert(one == 1)
    // tol < 0 disables the test: exactly maxIter iterations (fit() path)
    val (_, _, all) = KMeans.fitConverged(s, emb, k = 2, maxIter = 3, tol = -1.0)
    assert(all == 3)
    // a sane tolerance on the separable fixture stops before maxIter and
    // matches the fixed-iteration centroids at the stop count
    val (_, cConv, it) = KMeans.fitConverged(s, emb, k = 2, maxIter = 10, tol = 1e-9)
    assert(it < 10)
    val (_, cFixed) = KMeans.fit(s, emb, k = 2, iterations = it)
    assert(cConv.map(_.toSeq).toSeq == cFixed.map(_.toSeq).toSeq)
  }

  test("k-means on real embeddings: full coverage, k clusters, cluster sizes reasonable") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val (assign, cents) = KMeans.fit(s, emb, k = 8, iterations = 2)
    assert(assign.count() == n) // every vector assigned
    val sizes = assign.groupBy(col("cluster")).count().collect()
      .map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("count")).toMap
    assert(cents.length == 8)
    assert(sizes.values.sum == n)
    assert(sizes.size > 1) // random-ish vectors still split across clusters
  }
}
