package graft

import java.nio.file.Files

import graft.sources.IndexArtifacts

/** Pins the versioned artifact store's contract (VERDICT r11 #3):
  * bit-exact round-trip of the trained arrays, monotone version
  * advance under the atomic marker, and crash-mid-save invisibility
  * (a version directory without a flipped marker is never served). */
class IndexArtifactsSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_artifacts_spec_")
    org.apache.commons.io.FileUtils.forceDeleteOnExit(d.toFile)
    d.toString
  }

  private val cent: Array[Array[Double]] = Array(
    Array(1.5, -2.25, 1.0 / 3.0), // 1/3 is not dyadic — exactness must
    Array(0.1 + 0.2, 1e-300, 0.0)) // survive parquet, not rounding luck
  private val cb: Array[Array[Array[Double]]] = Array(
    Array(Array(0.5, -0.5), Array(math.Pi, math.E)),
    Array(Array(1e-17, 2.0), Array(-3.5, 7.0)))

  test("centroids + codebook round-trip bit-exactly") {
    val dir = tmp()
    val v = IndexArtifacts.save(spark, dir, Some(cent), Some(cb))
    assert(v === 0L)
    val lc = IndexArtifacts.loadCentroids(spark, dir)
    val lb = IndexArtifacts.loadCodebook(spark, dir).get
    assert(lc.length === cent.length)
    for (i <- cent.indices; j <- cent(i).indices)
      assert(java.lang.Double.doubleToRawLongBits(lc(i)(j)) ===
        java.lang.Double.doubleToRawLongBits(cent(i)(j)))
    for (s <- cb.indices; c <- cb(s).indices; p <- cb(s)(c).indices)
      assert(java.lang.Double.doubleToRawLongBits(lb(s)(c)(p)) ===
        java.lang.Double.doubleToRawLongBits(cb(s)(c)(p)))
  }

  test("a retrain publishes the next version and load serves it") {
    val dir = tmp()
    IndexArtifacts.save(spark, dir, Some(cent))
    val cent2 = cent.map(_.map(_ * 2.0))
    val v = IndexArtifacts.save(spark, dir, Some(cent2))
    assert(v === 1L)
    assert(IndexArtifacts.currentVersion(dir) === 1L)
    assert(IndexArtifacts.loadCentroids(spark, dir)(0)(0) === 3.0)
  }

  test("a crash mid-save (version dir on disk, marker not flipped) is invisible") {
    val dir = tmp()
    IndexArtifacts.save(spark, dir, Some(cent))
    // simulate the crash: the v1 parquet landed but the marker never
    // flipped — exactly the window between the writes in save()
    import spark.implicits._
    Seq((0, 0, 99.0)).toDF("cluster", "pos", "v")
      .write.parquet(s"$dir/v1/centroids")
    assert(IndexArtifacts.currentVersion(dir) === 0L)
    assert(IndexArtifacts.loadCentroids(spark, dir)(0)(0) === cent(0)(0))
    // the next save supersedes the torn directory rather than serving it
    val v = IndexArtifacts.save(spark, dir, Some(cent))
    assert(v === 1L)
    assert(IndexArtifacts.loadCentroids(spark, dir)(0)(0) === cent(0)(0))
  }

  test("codebook-only versions exist (the TrainedIndex pq store) and " +
    "loadCentroids refuses them") {
    val dir = tmp()
    IndexArtifacts.save(spark, dir, None, Some(cb))
    assert(IndexArtifacts.loadCodebook(spark, dir).isDefined)
    assertThrows[IllegalArgumentException](
      IndexArtifacts.loadCentroids(spark, dir))
  }

  test("loading from an empty store fails fast") {
    assertThrows[IllegalArgumentException](
      IndexArtifacts.loadCentroids(spark, tmp()))
  }

  // ---- frame artifacts (the graph tier, VERDICT r12 #1) ------------------

  test("frame artifacts round-trip exactly and version together") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val medoids = Seq((0L, 7L), (1L, 3L)).toDF("cell", "mid")
    val v = IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> edges, "medoids" -> medoids))
    assert(v === 0L)
    val le = IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(le === Set((1L, 2L), (2L, 1L), (3L, 1L)))
    val lm = IndexArtifacts.loadFrame(spark, dir, "medoids")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lm === Set((0L, 7L), (1L, 3L)))
    // a rebuild publishes the next version; readers follow the marker
    val v2 = IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((9L, 9L)).toDF("src", "dst")))
    assert(v2 === 1L)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges").count() === 1L)
  }

  test("a crash mid-saveFrames (torn v-dir, marker not flipped) is " +
      "invisible and the re-save supersedes it — the " +
      "StreamingVectorIndexSpec crash-window contract for frames") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((1L, 2L)).toDF("src", "dst")))
    // crash window: the v1 parquet landed (possibly torn — here a
    // sentinel row) but the marker never flipped
    Seq((99L, 99L)).toDF("src", "dst").write.parquet(s"$dir/v1/edges")
    assert(IndexArtifacts.currentVersion(dir) === 0L)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // the next save supersedes the torn directory rather than serving it
    val v = IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((5L, 6L)).toDF("src", "dst")))
    assert(v === 1L)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  // ---- version GC (VERDICT r13 #3) ---------------------------------------

  test("reap deletes superseded versions, keeps the retained window, " +
      "and the store keeps serving + publishing") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    (0 to 3).foreach { i =>
      IndexArtifacts.saveFrames(spark, dir,
        Seq("edges" -> Seq((i.toLong, i.toLong)).toDF("src", "dst")))
    }
    assert(IndexArtifacts.currentVersion(dir) === 3L)
    val reaped = IndexArtifacts.reap(dir, keep = 2)
    assert(reaped === Seq(0L, 1L)) // floor = 3 - (2-1) = 2
    assert(!new java.io.File(s"$dir/v0").exists())
    assert(!new java.io.File(s"$dir/v1").exists())
    assert(new java.io.File(s"$dir/v2").isDirectory) // reader grace window
    // the marker is untouched and the current version still serves
    assert(IndexArtifacts.currentVersion(dir) === 3L)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // version numbering continues monotonically after a reap
    val v = IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((9L, 9L)).toDF("src", "dst")))
    assert(v === 4L)
    // idempotent: nothing below the new floor but v2/v3
    assert(IndexArtifacts.reap(dir, keep = 2) === Seq(2L))
  }

  test("reap never deletes a torn-but-newer v-dir (the crash window " +
      "between a save's parquet landing and its marker flip) — that " +
      "dir belongs to the next save, which supersedes it") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((1L, 2L)).toDF("src", "dst")))
    // crash window: v1 parquet landed, marker still points at v0
    Seq((99L, 99L)).toDF("src", "dst").write.parquet(s"$dir/v1/edges")
    assert(IndexArtifacts.reap(dir, keep = 1) === Nil) // floor = 0
    assert(new java.io.File(s"$dir/v1").isDirectory,
      "torn-but-newer dir must survive reap")
    assert(IndexArtifacts.currentVersion(dir) === 0L)
    // the interrupted publish retries: same contract as before reap
    val v = IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((5L, 6L)).toDF("src", "dst")))
    assert(v === 1L)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
    // torn garbage BELOW the floor is collected with its cohort
    assert(IndexArtifacts.reap(dir, keep = 1) === Seq(0L))
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("reap on an empty or foreign dir is a no-op and ignores " +
      "non-version names (including overflow-length digits)") {
    val dir = tmp()
    assert(IndexArtifacts.reap(dir) === Nil)
    new java.io.File(s"$dir/v99999999999999999999").mkdirs() // 20 digits
    new java.io.File(s"$dir/vnot_a_version").mkdirs()
    assert(IndexArtifacts.reap(dir) === Nil) // no marker -> nothing known
    assert(new java.io.File(s"$dir/v99999999999999999999").isDirectory)
  }

  test("loadFrame fails fast on a missing frame name") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    IndexArtifacts.saveFrames(spark, dir,
      Seq("edges" -> Seq((1L, 2L)).toDF("src", "dst")))
    assertThrows[IllegalArgumentException](
      IndexArtifacts.loadFrame(spark, dir, "medoids"))
  }

  test("lakeStamp moves with the embeddings content (the stamped " +
      "cache-key discipline: an in-place fixture regen must miss " +
      "every per-JVM derived-state cache)") {
    val dir = tmp()
    val f = new java.io.File(s"$dir/embeddings.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    f.setLastModified(1000000L)
    val s1 = graft.sources.Tables.lakeStamp(dir)
    assert(s1 === graft.sources.Tables.lakeStamp(dir),
      "stamp must be stable while content is unchanged")
    // same size, newer mtime (a regenerated file always moves mtime)
    f.setLastModified(2000000L)
    val s2 = graft.sources.Tables.lakeStamp(dir)
    assert(s2 !== s1)
    // same mtime, different size (the same-mtime swap case)
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    f.setLastModified(2000000L)
    assert(graft.sources.Tables.lakeStamp(dir) !== s2)
    // directory-shaped parquet (multi-part) stamps recursively
    val d2 = tmp()
    val part = new java.io.File(s"$d2/embeddings.parquet/part-0")
    part.getParentFile.mkdirs()
    java.nio.file.Files.write(part.toPath, Array[Byte](9))
    val s3 = graft.sources.Tables.lakeStamp(d2)
    java.nio.file.Files.write(part.toPath, Array[Byte](9, 9))
    assert(graft.sources.Tables.lakeStamp(d2) !== s3)
    // ADVICE r14: a regen that preserves TOTAL size and NEWEST mtime
    // (sizes swapped between parts, mtimes unchanged — the coarse-
    // mtime filesystem case) must still move the stamp, because the
    // stamp hashes per-file (path, size, mtime) tuples
    val p0 = new java.io.File(s"$d2/embeddings.parquet/part-0")
    val p1 = new java.io.File(s"$d2/embeddings.parquet/part-1")
    java.nio.file.Files.write(p0.toPath, Array[Byte](1))
    java.nio.file.Files.write(p1.toPath, Array[Byte](2, 2))
    p0.setLastModified(5000000L); p1.setLastModified(5000000L)
    val s4 = graft.sources.Tables.lakeStamp(d2)
    java.nio.file.Files.write(p0.toPath, Array[Byte](1, 1))
    java.nio.file.Files.write(p1.toPath, Array[Byte](2))
    p0.setLastModified(5000000L); p1.setLastModified(5000000L)
    assert(graft.sources.Tables.lakeStamp(d2) !== s4,
      "size-swap at identical (total, max-mtime) must move the stamp")
    // a missing fixture must FAIL, never stamp to a constant
    assertThrows[IllegalArgumentException](
      graft.sources.Tables.lakeStamp(tmp()))
  }

  test("stampedKey memoizes the walk (VERDICT r15: no per-lookup " +
      "filesystem tax) and moves only on explicit invalidation") {
    val dir = tmp()
    val f = new java.io.File(s"$dir/embeddings.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    f.setLastModified(1000000L)
    val k1 = graft.sources.Tables.stampedKey(dir)
    assert(k1 === s"$dir@${graft.sources.Tables.lakeStamp(dir)}")
    // a content change WITHOUT the write hook must NOT move the key —
    // that is the memo holding (repeat lookups cost zero walks)
    f.setLastModified(2000000L)
    assert(graft.sources.Tables.stampedKey(dir) === k1,
      "memoized key re-walked the fixture on a plain lookup")
    // the write hook drops the memo; the next lookup re-stamps
    graft.sources.Tables.invalidateStamp(Some(dir))
    val k2 = graft.sources.Tables.stampedKey(dir)
    assert(k2 !== k1, "invalidateStamp must surface the new content")
    assert(k2 === s"$dir@${graft.sources.Tables.lakeStamp(dir)}")
  }

  test("a publish with keep carries its own GC: the training-cadence " +
      "republish leaves exactly the retained window on disk") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // three training cadences at keep=2: after the third publish only
    // v1/v2 remain — the save itself reaped v0, no explicit reap call
    (1L to 3L).foreach { i =>
      IndexArtifacts.saveFrames(spark, dir,
        Seq("edges" -> Seq((i, i + 1)).toDF("src", "dst")), keep = 2)
    }
    assert(IndexArtifacts.currentVersion(dir) === 2L)
    assert(!new java.io.File(s"$dir/v0").exists(),
      "keep=2 republish must have reaped v0")
    assert(new java.io.File(s"$dir/v1").isDirectory)
    assert(IndexArtifacts.loadFrame(spark, dir, "edges")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // the scalar-artifact path carries the same discipline
    val dir2 = tmp()
    (0 until 3).foreach { _ =>
      IndexArtifacts.save(spark, dir2,
        Some(Array(Array(1.0, 2.0))), keep = 1)
    }
    assert(IndexArtifacts.currentVersion(dir2) === 2L)
    assert(!new java.io.File(s"$dir2/v0").exists())
    assert(!new java.io.File(s"$dir2/v1").exists())
    assert(IndexArtifacts.loadCentroids(spark, dir2).head.toSeq
      === Seq(1.0, 2.0))
  }
}
