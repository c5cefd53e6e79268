package graft

import org.scalatest.funsuite.AnyFunSuite

class MemDdlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("CTAS materializes a mem table usable by later queries") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ddl1"))
      val r = mgr.sql(h, "CREATE TABLE squares AS SELECT id, id * id AS sq FROM range(5)")
      assert(r.collect().head.getLong(0) == 5L)
      assert(mgr.sql(h, "SELECT sum(sq) AS s FROM squares").collect().head.getLong(0) == 30L)
      // no OR REPLACE → second create fails
      intercept[IllegalArgumentException] {
        mgr.sql(h, "CREATE TABLE squares AS SELECT 1")
      }
      // OR REPLACE swaps the state
      mgr.sql(h, "CREATE OR REPLACE TABLE squares AS SELECT 7 AS sq")
      assert(mgr.sql(h, "SELECT sq FROM squares").collect().head.getInt(0) == 7)
    } finally mgr.shutdown()
  }

  test("CTAS + INSERT INTO + DROP TABLE compose") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ddl2"))
      mgr.sql(h, "CREATE TABLE t AS SELECT 1 AS a")
      mgr.sql(h, "INSERT INTO t VALUES (2), (3)")
      assert(mgr.sql(h, "SELECT count(*) AS n FROM t").collect().head.getLong(0) == 3L)
      mgr.sql(h, "DROP TABLE t")
      assert(!h.spark.catalog.tableExists("t"))
      // IF EXISTS tolerates absence; a bare drop of an absent name
      // falls through to spark.sql, which raises its own error
      mgr.sql(h, "DROP TABLE IF EXISTS t")
      intercept[org.apache.spark.sql.AnalysisException] { mgr.sql(h, "DROP TABLE t") }
    } finally mgr.shutdown()
  }
}
