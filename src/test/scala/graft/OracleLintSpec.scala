package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-lint over the DuckDB oracle corpus (VERDICT r11 #1): DuckDB's
  * `sum()` over integers returns HUGEINT (int128), which the driver
  * harness materializes as a different pandas dtype than Spark's BIGINT
  * — so any oracle whose OUTPUT includes an uncast integer `sum(...)`
  * hash-mismatches even when every value is identical. This cost two
  * rounds on t31_bigram_perplexity (the aggregate lived in a CTE and
  * passed through the final SELECT bare). The lint makes the class
  * impossible: every `sum(...)` that is directly aliased AND whose alias
  * escapes to the final SELECT must be CAST-wrapped
  * (`CAST(sum(...) AS BIGINT)` per the repo convention, or AS DOUBLE for
  * float sums where the cast documents intent).
  *
  * `count(...)` is deliberately NOT linted: DuckDB count returns BIGINT,
  * which already matches Spark's LongType.
  */
class OracleLintSpec extends AnyFunSuite {

  /** (alias, position) of every `sum( ... ) AS alias` whose result is
    * directly aliased without a wrapping CAST. A sum inside
    * `CAST(sum(..) AS BIGINT)` textually reads `AS BIGINT` — type
    * keywords are recognized and skipped, which IS the cast-wrap test. */
  private val typeWords = Set("bigint", "int", "integer", "hugeint",
    "smallint", "tinyint", "double", "float", "real", "decimal", "varchar")

  private[graft] def bareSumAliases(sql: String): Seq[(String, Int)] = {
    val out = Seq.newBuilder[(String, Int)]
    val lower = sql.toLowerCase
    var i = lower.indexOf("sum")
    while (i >= 0) {
      val preOk = i == 0 || !Character.isLetterOrDigit(lower(i - 1)) &&
        lower(i - 1) != '_'
      var j = i + 3
      while (j < sql.length && sql(j).isWhitespace) j += 1
      if (preOk && j < sql.length && sql(j) == '(') {
        // matching close paren
        var depth = 0; var k = j
        while (k < sql.length && (depth > 0 || k == j)) {
          if (sql(k) == '(') depth += 1
          else if (sql(k) == ')') depth -= 1
          k += 1
        }
        // what follows the closed sum( ... ) ?
        val m = "^\\s+as\\s+([A-Za-z_][A-Za-z_0-9]*)".r
          .findFirstMatchIn(lower.substring(k))
        m.foreach { mm =>
          val alias = mm.group(1)
          if (!typeWords.contains(alias)) out += ((alias, i))
        }
      }
      i = lower.indexOf("sum", i + 3)
    }
    out.result()
  }

  /** [start, end) span of the final SELECT's output list: the last
    * `select` at paren depth 0 up to the next depth-0 `from`. */
  private[graft] def finalSelectSpan(sql: String): (Int, Int) = {
    val lower = sql.toLowerCase
    val depth = new Array[Int](sql.length + 1)
    var d = 0
    sql.indices.foreach { i =>
      if (sql(i) == '(') d += 1 else if (sql(i) == ')') d -= 1
      depth(i + 1) = d
    }
    def word(w: String, i: Int): Boolean =
      lower.startsWith(w, i) &&
        (i == 0 || !Character.isLetterOrDigit(lower(i - 1))) &&
        (i + w.length >= sql.length ||
          !Character.isLetterOrDigit(lower(i + w.length)))
    val sel = sql.indices.filter(i => depth(i) == 0 && word("select", i)).last
    val from = sql.indices
      .find(i => i > sel && depth(i) == 0 && word("from", i))
      .getOrElse(sql.length)
    (sel + "select".length, from)
  }

  /** Split a select list on top-level commas. */
  private[graft] def selectItems(list: String): Seq[String] = {
    val items = Seq.newBuilder[String]
    var depth = 0; var start = 0
    list.indices.foreach { i =>
      list(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          items += list.substring(start, i).trim; start = i + 1
        case _ => ()
      }
    }
    items += list.substring(start).trim
    items.result().filter(_.nonEmpty)
  }

  /** Offending aliases for one oracle: a bare-aliased sum whose alias
    * escapes to the final SELECT — either defined inside it, or passed
    * through as a bare (possibly qualified/re-aliased) column ref. */
  private[graft] def offenders(sql: String): Seq[String] = {
    val sums = bareSumAliases(sql)
    if (sums.isEmpty) return Nil
    val (s, e) = finalSelectSpan(sql)
    val items = selectItems(sql.substring(s, e))
    sums.collect {
      case (alias, pos)
          if (pos >= s && pos < e) ||
            items.exists(it =>
              it.toLowerCase
                .matches(s"(distinct\\s+)?(\\w+\\.)?$alias(\\s+as\\s+\\w+)?")) =>
        alias
    }.distinct
  }

  // --- semantics pinned on fixtures --------------------------------
  test("direct uncast sum in the final select is flagged") {
    assert(offenders("SELECT doc_id, sum(tf) AS n FROM t GROUP BY 1")
      === Seq("n"))
  }
  test("CAST-wrapped sum is clean (AS BIGINT is a cast target, not an alias)") {
    assert(offenders(
      "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM t GROUP BY 1").isEmpty)
  }
  test("the t31 shape — CTE-defined bare sum passing through — is flagged") {
    val t31ish = """WITH doc AS (SELECT doc_id, sum(tf) AS n_bigrams
                    FROM f GROUP BY 1)
                    SELECT d.doc_id, d.n_bigrams FROM doc d"""
    assert(offenders(t31ish) === Seq("n_bigrams"))
  }
  test("a CTE sum consumed downstream (never an output column) is clean") {
    val consumed = """WITH x AS (SELECT k, sum(v) AS sv FROM t GROUP BY 1)
                      SELECT k, round(sv / 7.0, 4) AS ratio FROM x"""
    assert(offenders(consumed).isEmpty)
  }
  test("a pass-through that is recast in the final select is clean") {
    val recast = """WITH x AS (SELECT k, sum(v) AS sv FROM t GROUP BY 1)
                    SELECT k, CAST(sv AS BIGINT) AS sv FROM x"""
    assert(offenders(recast).isEmpty)
  }
  test("subquery SELECTs do not shadow the final select span") {
    val sub = """SELECT a, b FROM (SELECT a, sum(v) AS b FROM t GROUP BY 1) q"""
    assert(offenders(sub) === Seq("b"))
  }

  // --- the corpus walk ---------------------------------------------
  test("no oracle emits an uncast sum() output column (DuckDB HUGEINT trap)") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => offenders(sql).map(a => s"$name: $a")
    }
    assert(bad.isEmpty,
      s"""uncast sum() reaches the gated output in: ${bad.mkString("; ")} —
         |wrap with CAST(sum(...) AS BIGINT) (integer sums; DuckDB would
         |emit HUGEINT and hash-mismatch Spark's BIGINT) or
         |CAST(... AS DOUBLE) (float sums, documents intent).""".stripMargin)
  }
}
