package graft

import org.scalatest.funsuite.AnyFunSuite

class InsertIntoSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("INSERT INTO appends VALUES to a session mem table, reports count") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ins1"))
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
        graft.engine.DataSourceDef("t", "mem", None, None))
      val r = mgr.sql(h, "INSERT INTO t VALUES (3, 'c'), (4, 'd')")
      assert(r.collect().map(_.getLong(0)).toSeq == Seq(2L))
      val rows = mgr.sql(h, "SELECT id, name FROM t ORDER BY id").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // second insert composes on the new state
      mgr.sql(h, "INSERT INTO t SELECT id + 10, upper(name) FROM t WHERE id <= 2")
      assert(mgr.sql(h, "SELECT count(*) AS n FROM t").collect().head.getLong(0) == 6L)
    } finally mgr.shutdown()
  }

  test("positional insert coerces types like DataFusion") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ins2"))
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1L, 1.5)).toDF("id", "v"),
        graft.engine.DataSourceDef("t2", "mem", None, None))
      mgr.sql(h, "INSERT INTO t2 VALUES (2, 3)") // int → long, int → double
      val rows = mgr.sql(h, "SELECT id, v FROM t2 ORDER BY id").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        Seq((1L, 1.5), (2L, 3.0)))
    } finally mgr.shutdown()
  }

  test("column-list insert fills unlisted columns with NULL") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ins3"))
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1L, "a", 10)).toDF("id", "name", "score"),
        graft.engine.DataSourceDef("t3", "mem", None, None))
      mgr.sql(h, "INSERT INTO t3 (score, id) VALUES (99, 7)")
      val r = mgr.sql(h, "SELECT id, name, score FROM t3 WHERE id = 7").collect().head
      assert(r.getLong(0) == 7L && r.isNullAt(1) && r.getInt(2) == 99)
    } finally mgr.shutdown()
  }

  test("insert into unknown table or wrong arity fails cleanly") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ins4"))
      // unknown table is NOT intercepted: it falls through to
      // spark.sql, which raises its own analysis error
      intercept[org.apache.spark.sql.AnalysisException] {
        mgr.sql(h, "INSERT INTO nope VALUES (1)")
      }
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1L, "a")).toDF("id", "name"),
        graft.engine.DataSourceDef("t4", "mem", None, None))
      intercept[IllegalArgumentException] {
        mgr.sql(h, "INSERT INTO t4 VALUES (1, 'x', 99)")
      }
    } finally mgr.shutdown()
  }
}
