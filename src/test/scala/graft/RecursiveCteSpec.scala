package graft

import graft.sqlcompat.RecursiveCte
import org.scalatest.funsuite.AnyFunSuite

class RecursiveCteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("UNION ALL numbers recursion") {
    val df = RecursiveCte.execute(spark,
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10) SELECT n FROM t ORDER BY n")
    assert(df.collect().map(_.getInt(0)).toSeq == (1 to 10))
  }

  test("step may widen the base's column types (int base, bigint step)") {
    val df = RecursiveCte.execute(spark,
      """WITH RECURSIVE t(n) AS (
           SELECT CAST(1 AS INT)
           UNION ALL SELECT n + CAST(1 AS BIGINT) FROM t WHERE n < 5
         ) SELECT n FROM t ORDER BY n""")
    assert(df.collect().map(_.getLong(0)).toSeq == (1L to 5L))
  }

  test("UNION (distinct) terminates on a cyclic step") {
    // step keeps producing 1..3 forever; distinct semantics reach the
    // fixpoint after one round instead of looping
    val df = RecursiveCte.execute(spark,
      """WITH RECURSIVE t(n) AS (
           SELECT 1 UNION SELECT (n % 3) + 1 FROM t
         ) SELECT n FROM t ORDER BY n""")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("column list renames and tail CTE composes") {
    val df = RecursiveCte.execute(spark,
      """WITH RECURSIVE seq(i) AS (
           SELECT 1 UNION ALL SELECT i + 1 FROM seq WHERE i < 5
         ), doubled AS (SELECT i * 2 AS d FROM seq)
         SELECT d FROM doubled ORDER BY d""")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 4, 6, 8, 10))
  }

  test("multi-branch seed splits at the LAST top-level UNION") {
    val df = RecursiveCte.execute(spark,
      """WITH RECURSIVE t(n) AS (
           SELECT 1 UNION SELECT 5 UNION ALL SELECT n + 1 FROM t WHERE n < 3
         ) SELECT n FROM t ORDER BY n""")
    // seeds {1, 5}; recursion extends 1 → 2 → 3 (5 fails n < 3)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 5))
  }

  test("UNION inside a subquery does not confuse the splitter") {
    val df = RecursiveCte.execute(spark,
      """WITH RECURSIVE t(n) AS (
           SELECT maxv FROM (SELECT 1 AS maxv UNION ALL SELECT 2) z WHERE maxv = 2
           UNION ALL SELECT n + 1 FROM t WHERE n < 4
         ) SELECT n FROM t ORDER BY n""")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 3, 4))
  }

  test("runaway recursion hits the iteration guard") {
    val e = intercept[IllegalStateException] {
      RecursiveCte.execute(spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t) SELECT * FROM t",
        maxIterations = 5)
    }
    assert(e.getMessage.contains("exceeded"))
  }

  test("a CTE shadowing an existing table restores it afterwards") {
    import spark.implicits._
    Seq((100L, "keep")).toDF("n", "tag").createOrReplaceTempView("shadowed")
    val out = RecursiveCte.execute(spark,
      "WITH RECURSIVE shadowed(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM shadowed WHERE n < 3) SELECT n FROM shadowed ORDER BY n")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // the user's table is back, not deleted
    val restored = spark.sql("SELECT n, tag FROM shadowed").collect()
    assert(restored.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((100L, "keep")))
    spark.catalog.dropTempView("shadowed")
  }

  test("information_schema stays idempotent across queries") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("infoidem"))
      def names() = mgr.sql(h,
        "SELECT table_name FROM information_schema.tables ORDER BY table_name")
        .collect().map(_.getString(0)).toSeq
      val first = names()
      val second = names()
      assert(first == second, s"$first vs $second")
      assert(!second.exists(_.startsWith("__info_")), second.toString)
    } finally mgr.shutdown()
  }

  test("the CTE view does not outlive the statement") {
    RecursiveCte.execute(spark,
      "WITH RECURSIVE tmpcte(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM tmpcte WHERE n < 2) SELECT * FROM tmpcte").collect()
    assert(!spark.catalog.tableExists("tmpcte"))
  }

  test("SessionManager routes WITH RECURSIVE through the fixpoint loop") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("rcte"))
      val rows = mgr.sql(h,
        "WITH RECURSIVE f(a, b) AS (SELECT 0, 1 UNION ALL SELECT b, a + b FROM f WHERE b < 50) SELECT a FROM f ORDER BY a")
        .collect().map(_.getInt(0)).toSeq
      assert(rows == Seq(0, 1, 1, 2, 3, 5, 8, 13, 21, 34))
    } finally mgr.shutdown()
  }

  test("recursion joined against data (q51 shape) runs end-to-end") {
    val lineitem = Tables.load(spark, SparkFixture.sfDir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem")
    val df = SparkEntry.queries("q51_recursive_cte")(spark, SparkFixture.sfDir)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 4))
    assert(rows.map(_.getLong(2)).sum > 0, "bands must count real lineitems")
  }
}
