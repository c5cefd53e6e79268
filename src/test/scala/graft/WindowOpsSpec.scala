package graft

import graft.ops.WindowOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("GROUPS frame emulation aggregates whole peer groups") {
    import spark.implicits._
    // peer groups by g: {10,20}, {30}, {40,50}
    val df = Seq((1, 1, 10), (2, 1, 20), (3, 2, 30), (4, 3, 40), (5, 3, 50))
      .toDF("v", "g", "x")
    val out = WindowOps.groupsBetween(df,
        partitionBy = Seq(), orderBy = Seq(col("g")),
        agg = sum(col("x")), precede = 1, follow = 1, outCol = "s")
      .orderBy("v").collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    // GROUPS ±1: rows in groups dr-1..dr+1
    assert(out == Map(1 -> 60L, 2 -> 60L, 3 -> 150L, 4 -> 120L, 5 -> 120L))
  }

  test("GROUPS 0 PRECEDING/FOLLOWING is exactly the peer group") {
    import spark.implicits._
    val df = Seq((1, 1), (2, 1), (3, 2)).toDF("v", "g")
    val out = WindowOps.groupsBetween(df,
        Seq(), Seq(col("g")), count(lit(1)), 0, 0, "n")
      .orderBy("v").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(2L, 2L, 1L))
  }

  test("GROUPS SQL text via the session query door equals the DataFrame emulation") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create()
      import h.spark.implicits._
      val df = Seq((1, 1, 10), (2, 1, 20), (3, 2, 30), (4, 3, 40), (5, 3, 50),
        (6, 4, 60), (7, 4, 70)).toDF("v", "g", "x")
      mgr.registerTable(h, df,
        graft.engine.DataSourceDef("gtab", "memory", None, None))
      val viaSql = mgr.sql(h,
        """SELECT v, CAST(SUM(x) OVER (ORDER BY g
             GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s
           FROM gtab ORDER BY v""")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val viaOps = WindowOps.groupsBetween(df,
          Seq(), Seq(col("g")), sum(col("x")), 1, 1, "s")
        .select(col("v"), col("s")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(viaSql == viaOps)
    } finally mgr.shutdown()
  }

  test("GROUPS in the first branch of a UNION ALL parses and runs") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create()
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1, 10), (1, 20), (2, 30)).toDF("g", "x"),
        graft.engine.DataSourceDef("gu", "memory", None, None))
      val rows = mgr.sql(h,
        """SELECT g, CAST(SUM(x) OVER (ORDER BY g GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s FROM gu
           UNION ALL SELECT g, CAST(x AS BIGINT) AS s FROM gu""")
        .collect()
      assert(rows.length == 6, rows.mkString(";"))
    } finally mgr.shutdown()
  }

  test("helper column does not leak and partitioning is respected") {
    import spark.implicits._
    val df = Seq(("a", 1, 5), ("a", 2, 6), ("b", 1, 7)).toDF("p", "g", "x")
    val out = WindowOps.groupsBetween(df,
      Seq(col("p")), Seq(col("g")), sum(col("x")), 1, 1, "s")
    assert(out.columns.toSeq == Seq("p", "g", "x", "s"))
    val m = out.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(m(("b", 1)) == 7L, "partitions must not mix")
    assert(m(("a", 1)) == 11L)
  }
}
