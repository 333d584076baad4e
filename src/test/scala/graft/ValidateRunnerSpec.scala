package graft

import graft.quality.ValidateRunner

/** The `validate` command (orchestrate.py:194-238): pass and fail
  * paths over a temp lake root. */
class ValidateRunnerSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-validate").toString

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

  test("healthy lake validates ok and reports the checked count") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.parquet(s"$root/t1")
      Seq((10L, 1.5), (11L, 2.5), (12L, 3.5)).toDF("id", "x")
        .write.parquet(s"$root/t2")
      val logs = collection.mutable.Buffer[String]()
      val sum = ValidateRunner.validate(s, root,
        specs = Map("t1" -> Seq("id"), "t2" -> Seq("id"), "t3" -> Seq("id")),
        out = logs += _)
      assert(sum.ok)
      assert(sum.checked == 2) // t3 absent -> skipped, like the reference
      assert(logs.exists(_.contains("\"event\": \"validate_ok\"")))
      assert(logs.exists(_.contains("\"tables_checked\": 2")))
    } finally cleanup(root)
  }

  test("a zero-row table raises validate_failed (the rows<=0 gate)") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/t1")
      Seq((1L, "a")).toDF("id", "v").filter("id < 0")
        .repartition(1).write.parquet(s"$root/t2")
      val logs = collection.mutable.Buffer[String]()
      val ex = intercept[RuntimeException] {
        ValidateRunner.validate(s, root,
          specs = Map("t1" -> Seq("id"), "t2" -> Seq("id")), out = logs += _)
      }
      assert(ex.getMessage.contains("t2"))
      assert(logs.exists(l => l.contains("validate_failed") && l.contains("\"t2\"")))
    } finally cleanup(root)
  }

  test("missing PK column reports schema failure; raises only under strict") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      Seq((1L, "a")).toDF("other", "v").write.parquet(s"$root/t1")
      val logs = collection.mutable.Buffer[String]()
      val sum = ValidateRunner.validate(s, root,
        specs = Map("t1" -> Seq("id")), out = logs += _)
      assert(!sum.ok)
      assert(logs.exists(l =>
        l.contains("validate_schema_failed") && l.contains("missing_pk:id")))
      intercept[RuntimeException] {
        ValidateRunner.validate(s, root, specs = Map("t1" -> Seq("id")),
          strictSchema = true, out = _ => ())
      }
    } finally cleanup(root)
  }

  test("composite keys that concat alike are NOT duplicates") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      // ("ab","c") vs ("a","bc") concatenate identically under any
      // in-data separator; the PK grouping must keep them distinct.
      // The null PK row is its own group, not a "" collision.
      Seq(("ab", "c"), ("a", "bc"), (null, "abc"))
        .toDF("k1", "k2").write.parquet(s"$root/t1")
      val sum = ValidateRunner.validate(s, root,
        specs = Map("t1" -> Seq("k1", "k2")), out = _ => ())
      assert(sum.ok, s"phantom dup-PK rows: ${sum.results}")
      assert(sum.results.head.dupPkRows == 0)
    } finally cleanup(root)
  }

  test("unreadable table is a schema_read_error; raises only under strict") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/ok")
      // corrupt-but-present: a parquet dir whose file is garbage bytes
      val bad = new java.io.File(s"$root/bad"); bad.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/bad/part-00000.parquet"),
        "not parquet at all".getBytes("UTF-8"))
      val logs = collection.mutable.Buffer[String]()
      // non-strict: reports schema_read_error, does NOT raise (the
      // reference's rows<=0 gate never sees the unreadable table)
      val sum = ValidateRunner.validate(s, root,
        specs = Map("ok" -> Seq("id"), "bad" -> Seq("id")), out = logs += _)
      assert(!sum.ok)
      assert(logs.exists(l => l.contains("validate_schema_failed") &&
        l.contains("schema_read_error:")))
      assert(!logs.exists(_.contains("validate_failed")))
      // strict: the same condition raises
      intercept[RuntimeException] {
        ValidateRunner.validate(s, root,
          specs = Map("ok" -> Seq("id"), "bad" -> Seq("id")),
          strictSchema = true, out = _ => ())
      }
    } finally cleanup(root)
  }

  test("duplicate PK rows are a schema-level failure") {
    val s = spark
    import s.implicits._
    val root = tmpRoot()
    try {
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
        .write.parquet(s"$root/t1")
      val logs = collection.mutable.Buffer[String]()
      val sum = ValidateRunner.validate(s, root,
        specs = Map("t1" -> Seq("id")), out = logs += _)
      assert(!sum.ok)
      assert(sum.results.head.dupPkRows == 1)
      assert(logs.exists(_.contains("dup_pk_rows:1")))
    } finally cleanup(root)
  }
}
