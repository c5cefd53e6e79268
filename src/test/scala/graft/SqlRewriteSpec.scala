package graft

import graft.sqlcompat.SqlRewrite
import org.scalatest.funsuite.AnyFunSuite

class SqlRewriteSpec extends AnyFunSuite {

  test("postfix cast on identifier") {
    assert(SqlRewrite.rewrite("SELECT a::INT FROM t") ==
      "SELECT CAST(a AS INT) FROM t")
  }

  test("postfix cast on qualified identifier and number") {
    assert(SqlRewrite.rewrite("SELECT t.a::BIGINT, 1::DOUBLE FROM t") ==
      "SELECT CAST(t.a AS BIGINT), CAST(1 AS DOUBLE) FROM t")
  }

  test("postfix cast with parameterized type") {
    assert(SqlRewrite.rewrite("SELECT a::DECIMAL(10,2) FROM t") ==
      "SELECT CAST(a AS DECIMAL(10,2)) FROM t")
  }

  test("postfix cast does not swallow a following alias") {
    assert(SqlRewrite.rewrite("SELECT a::STRING AS b FROM t") ==
      "SELECT CAST(a AS STRING) AS b FROM t")
  }

  test("postfix cast on string literal") {
    assert(SqlRewrite.rewrite("SELECT '2024-01-01'::DATE") ==
      "SELECT CAST('2024-01-01' AS DATE)")
  }

  test("parenthesized expression cast") {
    assert(SqlRewrite.rewrite("SELECT (a + b)::DOUBLE FROM t") ==
      "SELECT CAST((a + b) AS DOUBLE) FROM t")
  }

  test("function call cast") {
    assert(SqlRewrite.rewrite("SELECT sum(x)::DECIMAL(10,2) AS s FROM t") ==
      "SELECT CAST(sum(x) AS DECIMAL(10,2)) AS s FROM t")
  }

  test("nested paren cast") {
    assert(SqlRewrite.rewrite("SELECT f(g(a), h(b))::INT FROM t") ==
      "SELECT CAST(f(g(a), h(b)) AS INT) FROM t")
  }

  test(":: inside a string literal is untouched") {
    assert(SqlRewrite.rewrite("SELECT 'a::b' FROM t") == "SELECT 'a::b' FROM t")
  }

  test(":: inside comments untouched") {
    val sql = "SELECT a FROM t -- cast x::INT here\n WHERE b = 1"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("DISTINCT ON rewrites to row_number window") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC")
    assert(out.contains("ROW_NUMBER() OVER (PARTITION BY k ORDER BY k, v DESC)"))
    assert(out.contains("__graft_rn = 1"))
    assert(out.endsWith("ORDER BY __graft_o0, __graft_o1 DESC"), out)
  }

  test("DISTINCT ON order columns outside the select list still resolve") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (user_id) url FROM hits ORDER BY user_id, ts DESC")
    // ts is projected under a hidden alias inside the subquery
    assert(out.contains("ts AS __graft_o1"), out)
    assert(out.endsWith("ORDER BY __graft_o0, __graft_o1 DESC"), out)
  }

  test("DISTINCT ON with function-call keys (nested parens)") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (date_trunc('day', ts)) v FROM t")
    assert(out.contains("PARTITION BY date_trunc('day', ts)"), out)
  }

  test("identifier containing 'limit' is not split") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (k) k, v FROM t WHERE tier = rate_limit")
    assert(out.contains("WHERE tier = rate_limit)"), out)
    assert(!out.contains("rate_ "), out)
  }

  test("array subscript cast wraps the element, not the index") {
    assert(SqlRewrite.rewrite("SELECT a[1]::DOUBLE FROM t") ==
      "SELECT CAST(a[1] AS DOUBLE) FROM t")
  }

  test("DISTINCT ON without ORDER BY orders by keys") {
    val out = SqlRewrite.rewrite("SELECT DISTINCT ON (k) k, v FROM t")
    assert(out.contains("PARTITION BY k ORDER BY k"))
  }

  test("DISTINCT ON leaves a subquery's inner ORDER BY intact") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (k) k, v FROM (SELECT k, v FROM t ORDER BY v) x ORDER BY k, v")
    assert(out.contains("FROM (SELECT k, v FROM t ORDER BY v) x)"), out)
    assert(out.endsWith("ORDER BY __graft_o0, __graft_o1"), out)
  }

  test("DISTINCT ON with only LIMIT (no outer ORDER BY)") {
    val out = SqlRewrite.rewrite("SELECT DISTINCT ON (k) k, v FROM t LIMIT 3")
    assert(out.contains("PARTITION BY k ORDER BY k"), out)
    assert(out.endsWith("ORDER BY __graft_o0 LIMIT 3"), out)
  }

  test("table@namespace gets mangled to a registrable identifier") {
    assert(SqlRewrite.rewrite("SELECT * FROM users@pg WHERE x = 1") ==
      "SELECT * FROM users__at__pg WHERE x = 1")
  }

  test("email-like text inside string literal not federated") {
    val sql = "SELECT * FROM t WHERE email = 'bob@example'"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("plain SQL passes through untouched") {
    val sql = "SELECT a, sum(b) FROM t GROUP BY a HAVING sum(b) > 10 ORDER BY a"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("GROUPS frame in an inline OVER becomes dense_rank + RANGE") {
    val out = SqlRewrite.rewrite(
      """SELECT k, sum(v) OVER (PARTITION BY k ORDER BY o
         GROUPS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS s FROM t WHERE v > 0""")
    assert(out.contains("DENSE_RANK() OVER (PARTITION BY k ORDER BY o) AS __graft_dr0"), out)
    assert(out.contains("ORDER BY __graft_dr0 RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING"), out)
    assert(out.contains("FROM t WHERE v > 0) __graft_gw"), out)
    assert(!out.toUpperCase.contains("GROUPS"), out)
  }

  test("GROUPS shorthand bound maps to BETWEEN n PRECEDING AND CURRENT ROW") {
    val out = SqlRewrite.rewrite(
      "SELECT sum(v) OVER (ORDER BY o GROUPS 2 PRECEDING) AS s FROM t")
    assert(out.contains("RANGE BETWEEN 2 PRECEDING AND CURRENT ROW"), out)
  }

  test("GROUPS in a named WINDOW clause is rewritten; shared specs reuse one helper") {
    val out = SqlRewrite.rewrite(
      """SELECT count(*) OVER w AS a, sum(v) OVER w AS b FROM t
         WINDOW w AS (PARTITION BY k ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         ORDER BY a""")
    assert(out.contains("WINDOW w AS (PARTITION BY k ORDER BY __graft_dr0 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)"), out)
    assert(out.endsWith("ORDER BY a"), out)
    assert("__graft_dr\\d".r.findAllIn(out).toSet.size >= 1)
    assert(!out.contains("__graft_dr1"), "same (partition, order) must share one helper: " + out)
  }

  test("a bare star does not leak the dense_rank helper column") {
    val out = SqlRewrite.rewrite(
      "SELECT *, sum(v) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) s FROM t")
    assert(out.contains("* EXCEPT (__graft_dr0)"), out)
  }

  test("GROUPS over an aggregated SELECT is left for Spark to reject") {
    val sql = """SELECT k, sum(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
      FROM t GROUP BY k"""
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("the word GROUPS inside a string literal is untouched") {
    val sql = "SELECT 'GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING' AS s FROM t"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("GROUPS rewrite keeps a following UNION branch outside the subquery") {
    val out = SqlRewrite.rewrite(
      """SELECT k, sum(v) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM t
         UNION ALL SELECT k, v FROM u""")
    assert(out.contains("FROM t) __graft_gw"), out)
    assert("""__graft_gw\s+UNION ALL SELECT k, v FROM u""".r.findFirstIn(out).isDefined,
      "set-op branch must stay outside AND keep a separator: " + out)
    assert(!out.contains("FROM u) __graft_gw"), "union branch leaked into subquery: " + out)
  }

  test("GROUPS rewrite keeps a trailing semicolon outside the subquery") {
    val out = SqlRewrite.rewrite(
      "SELECT sum(v) OVER (ORDER BY o GROUPS 2 PRECEDING) AS s FROM t;")
    assert(out.endsWith(";"), out)
    assert(out.contains("FROM t) __graft_gw"), out)
  }

  test("an identifier starting with 'select' is not mistaken for the keyword") {
    val out = SqlRewrite.rewrite(
      "SELECT selection, sum(v) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM t")
    assert(out.contains("SELECT selection,"), out)
    assert(out.contains("RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"), out)
  }

  test("a qualified star with GROUPS bails to Spark's original error") {
    val sql = "SELECT a.*, sum(v) OVER (ORDER BY o GROUPS 1 PRECEDING) s FROM a JOIN b USING (k)"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("QUALIFY with a window alias becomes a post-window filter") {
    val out = SqlRewrite.rewrite(
      "SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn FROM t QUALIFY rn <= 2 ORDER BY k")
    assert(!out.toUpperCase.contains("QUALIFY"), out)
    assert(out.contains("WHERE __graft_q"), out)
    // the alias is substituted by its window expression inside the predicate
    assert(out.contains("((ROW_NUMBER() OVER (PARTITION BY k ORDER BY v)) <= 2) AS __graft_q"), out)
    // ORDER BY rides a hidden helper column
    assert(out.contains("k AS __graft_qo0"), out)
    assert(out.contains("ORDER BY __graft_qo0"), out)
  }

  test("QUALIFY with an inline window expression and no projection of it") {
    val out = SqlRewrite.rewrite(
      "SELECT name FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY name) = 1")
    assert(out.contains("(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY name) = 1) AS __graft_q"), out)
    assert(out.startsWith("SELECT name FROM (SELECT name,"), out)
  }

  test("QUALIFY keeps WHERE / GROUP BY inside the subquery") {
    val out = SqlRewrite.rewrite(
      "SELECT g, COUNT(*) AS n FROM t WHERE v > 0 GROUP BY g QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC) <= 3")
    assert(out.contains("FROM t WHERE v > 0 GROUP BY g) __graft_qf"), out)
    // the aggregate alias in the OVER clause is substituted too
    assert(out.contains("ORDER BY (COUNT(*)) DESC"), out)
  }

  test("QUALIFY with a bare star hides the helper columns") {
    val out = SqlRewrite.rewrite(
      "SELECT * FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY v) = 1")
    assert(out.startsWith("SELECT * EXCEPT (__graft_q) FROM"), out)
  }

  test("QUALIFY with LIMIT keeps the limit on the outer select") {
    val out = SqlRewrite.rewrite(
      "SELECT k FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1 ORDER BY k LIMIT 10")
    assert(out.endsWith("LIMIT 10"), out)
    assert(out.contains("WHERE __graft_q ORDER BY __graft_qo0 LIMIT 10"), out)
  }

  test("an identifier named qualify is not mistaken for the clause") {
    val sql = "SELECT k FROM t WHERE qualify = 1"
    assert(SqlRewrite.rewrite(sql) == sql)
    val sql2 = "SELECT qualify FROM t"
    assert(SqlRewrite.rewrite(sql2) == sql2)
  }

  test("QUALIFY inside a string literal is untouched") {
    val sql = "SELECT 'QUALIFY rn = 1' AS s FROM t"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("QUALIFY in a subquery rewrites only that block") {
    val out = SqlRewrite.rewrite(
      "SELECT * FROM (SELECT k, v FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY v) <= 5) x WHERE k > 0")
    assert(!out.toUpperCase.contains("QUALIFY"), out)
    assert(out.startsWith("SELECT * FROM (SELECT k, v FROM (SELECT k, v,"), out)
    assert(out.endsWith("x WHERE k > 0"), out)
  }

  test("QUALIFY with DISTINCT lifts DISTINCT to the outer select") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT k FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1")
    assert(out.startsWith("SELECT DISTINCT k FROM (SELECT k,"), out)
  }

  test("* EXCLUDE (cols) becomes * EXCEPT (cols)") {
    assert(SqlRewrite.rewrite("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(SqlRewrite.rewrite("SELECT t.* EXCLUDE (a) FROM t") ==
      "SELECT t.* EXCEPT (a) FROM t")
  }

  test("* EXCLUDE without parens wraps the single column") {
    assert(SqlRewrite.rewrite("SELECT * EXCLUDE secret FROM t") ==
      "SELECT * EXCEPT (secret) FROM t")
  }

  test("an identifier named exclude is untouched outside the wildcard position") {
    val sql = "SELECT exclude FROM t WHERE exclude = 1"
    assert(SqlRewrite.rewrite(sql) == sql)
  }

  test("QUALIFY with positional ORDER BY keeps the position, not a constant") {
    val out = SqlRewrite.rewrite(
      "SELECT k, v FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1 ORDER BY 2 DESC, k")
    // `2` must survive as a position on the outer select (a helper
    // `2 AS __graft_qo0` would order by a literal — no order at all)
    assert(out.contains("ORDER BY 2 DESC, __graft_qo1"), out)
    assert(!out.contains("2 AS __graft_qo"), out)
  }

  test("QUALIFY composes with a GROUPS frame in the predicate") {
    // pipeline order: QUALIFY first (the predicate lands in a select
    // list), then the GROUPS pass rewrites the spec it now contains
    val out = SqlRewrite.rewrite(
      "SELECT k, v FROM t QUALIFY sum(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) > 10")
    assert(!out.toUpperCase.contains("QUALIFY"), out)
    assert(!out.toUpperCase.contains("GROUPS"), out)
    assert(out.contains("DENSE_RANK() OVER (ORDER BY k) AS __graft_dr0"), out)
    assert(out.contains("ORDER BY __graft_dr0 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"), out)
    assert(out.contains("WHERE __graft_q"), out)
  }
}
