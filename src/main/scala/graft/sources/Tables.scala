package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * Reads are plain `spark.read.parquet` so Catalyst's vectorized reader,
  * predicate pushdown, and column pruning all apply — at cluster scale the
  * same call reads a Hive-partitioned directory tree and partition pruning
  * kicks in for free (reference: gold/_io_helpers.py:20-67 does this by
  * hand with S3 prefix filters; Spark's FileSourceScanExec subsumes it).
  */
object Tables {
  /** Per-session relation memo (r17, guide §6 "file listing"): every
    * `spark.read.parquet` call re-lists the path and re-reads the
    * footer schema on the DRIVER — at 213 queries x 5 bench passes x
    * several tables each, that synchronous per-call tax is pure
    * overhead (at 100 TB it is an object-store LIST per query). The
    * memo returns the SAME immutable DataFrame (a logical relation —
    * no data, no results; every action still computes from parquet),
    * keyed on (session, stamped dir, table) so a session restart or a
    * stamped in-process fixture regen (the invalidateStamp write-hook
    * discipline, VERDICT r15/ADVICE r16) misses and re-lists. Dirs
    * without an embeddings stamp (lakeStamp's subject) fall back to
    * the unmemoized read. */
  private val relMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String), (SparkSession, DataFrame)]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val stamped =
      try stampedKey(dir)
      catch { case _: Throwable => null } // no embeddings stamp: no memo
    if (stamped == null) return spark.read.parquet(s"$dir/$name.parquet")
    val key = (System.identityHashCode(spark), stamped, name)
    relMemo.get(key) match {
      // the identity check guards the (rare) hash reuse after a
      // session is collected: a memoized relation must never cross
      // session boundaries
      case Some((sess, df)) if sess eq spark => df
      case _ =>
        val df = spark.read.parquet(s"$dir/$name.parquet")
        relMemo.put(key, (spark, df))
        df
    }
  }

  /** Content stamp of `dir`'s embeddings parquet: folded into every
    * per-JVM derived-state cache key (TrainedIndex artifacts, the
    * st19c maintained store) so an IN-PLACE fixture regeneration
    * inside one JVM lifetime misses the cache and rebuilds instead of
    * serving stale state. Cross-process regen was already safe
    * (per-JVM temp roots); this closes the in-process window without
    * any content hashing. ADVICE r14: the stamp is an MD5 over the
    * SORTED per-file (path, size, mtime) tuples — summing sizes and
    * maxing mtimes could collide on coarse-mtime filesystems when a
    * regen lands in the same timestamp unit at the same total bytes,
    * and a missing path must FAIL (a silent '0:0' stamp would key a
    * cache entry to a fixture that does not exist). */
  def lakeStamp(dir: String): String = {
    val root = new java.io.File(s"$dir/embeddings.parquet")
    require(root.exists(), s"lakeStamp: missing $root")
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(s"${f.getPath}:${f.length()}:${f.lastModified()}")
    val md = java.security.MessageDigest.getInstance("MD5")
    walk(root).sorted.foreach(t => md.update(t.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** MEMOIZED stamped cache key `"<dir>@<lakeStamp(dir)>"` — the form
    * every per-JVM derived-state cache actually keys on (TrainedIndex's
    * five artifact caches, the st19 maintained-store memo). VERDICT
    * r15 / ADVICE: [[lakeStamp]] walks the fixture directory
    * recursively, and keying EVERY cache access on a fresh walk made
    * the walk a per-lookup filesystem tax — at 100 TB the analogue is
    * an object-store LIST per serve, which is exactly backwards: a
    * production fleet stamps a lake version once and invalidates on
    * WRITE. So the stamp computes once per dir per JVM and writers
    * invalidate explicitly:
    *   - cross-process regen (the driver's round boundary) was always
    *     safe — artifact roots are per-JVM temp dirs;
    *   - in-process regen must call [[invalidateStamp]] after the
    *     write (ScaleFixture-style rewriters; no current in-repo path
    *     regenerates a fixture and re-serves it in one JVM, which
    *     IndexArtifactsSpec pins as the memo contract).
    * [[lakeStamp]] itself stays pure (its spec pins per-call reads). */
  private val stampMemo =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** ADVICE r16: memoize by the NORMALIZED path, not the raw string —
    * two spellings of one dir (trailing slash, relative vs absolute)
    * must share one memo entry, or invalidateStamp on one spelling
    * would leave a stale stamp live under the other. */
  private def normDir(dir: String): String =
    try java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    catch { case _: Throwable => dir } // non-local URIs pass through raw
  def stampedKey(dir: String): String = {
    val nd = normDir(dir)
    stampMemo.getOrElseUpdate(nd, s"$nd@${lakeStamp(dir)}")
  }

  /** Drop `dir`'s memoized stamp (all dirs when None) — the write hook
    * for any in-process fixture regeneration. */
  def invalidateStamp(dir: Option[String] = None): Unit = dir match {
    case Some(d) => stampMemo.remove(normDir(d))
    case None => stampMemo.clear()
  }

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark 4
    * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as a
    * raw long (legacy.parquet.nanosAsLong) and truncate ns → µs, which is
    * exactly what DuckDB does when it loads the same file (its TIMESTAMP
    * is µs-precision), so engine/oracle comparisons see identical values
    * and identical ordering.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    // only the driver's NANOS file needs the long→µs conversion; a
    // re-materialized copy (e.g. tools.ScaleFixture) already carries a
    // proper µs timestamp column
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // a naive timestamp[us] file infers as TIMESTAMP_NTZ under Spark 4's
      // parquet reader; normalize to the session-TZ instant type (sessions
      // pin UTC, so values are identical) — every downstream epoch/
      // watermark call site assumes the instant type, and the DuckDB
      // oracle coerces its naive read the same way under a UTC host
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
