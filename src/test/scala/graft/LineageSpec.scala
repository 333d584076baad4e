package graft

import graft.operators.Lineage

/** Pins the ADVICE-r11 storage-hygiene fix: Dataset.unpersist() does
  * NOT free an eager local checkpoint's blocks, Lineage.free does. */
class LineageSpec extends SparkSpec {

  private def persistedIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist is a no-op for a local checkpoint; Lineage.free drops it") {
    val s = spark
    import s.implicits._
    val before = persistedIds()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v").localCheckpoint(true)
    val mine = persistedIds() -- before
    assert(mine.nonEmpty, "eager localCheckpoint should persist its RDD")
    df.unpersist(blocking = true)
    assert((persistedIds() -- before) == mine,
      "the documented no-op: Dataset.unpersist left the blocks alone")
    Lineage.free(df)
    // unpersist(blocking=false) is async on the block side but the
    // persistentRDDs registry drops synchronously
    assert((persistedIds() -- before).isEmpty,
      "Lineage.free must unregister the checkpoint's backing RDD")
  }

  test("iterating label propagation leaves no per-round blocks behind") {
    val s = spark
    import s.implicits._
    val before = persistedIds()
    // a 21-node path graph needs many label-propagation rounds, so
    // pre-fix this leaked ~one checkpoint RDD per round
    val edges = (1L to 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = graft.operators.LabelPropagation.runConverged(
      edges, "src", "dst", maxRounds = 40)
    out.count()
    val leaked = persistedIds() -- before
    // live by design: the edge frame, the returned round's frame, and
    // the two trailing prev frames the loop exits holding — everything
    // older must have been freed round by round
    assert(leaked.size <= 4, s"leaked checkpoint RDDs: $leaked")
  }
}
