package graft

import graft.engine.{Federation, SessionManager}
import org.scalatest.funsuite.AnyFunSuite

class FederationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("findRefs extracts table@ns outside quotes/comments") {
    val refs = Federation.findRefs(
      """SELECT * FROM users@pg u JOIN orders@pg o ON u.id = o.uid
         WHERE note = 'mail: x@y' -- comment t@c""")
    assert(refs.toSet == Set(("users", "pg"), ("orders", "pg")))
  }

  test("federated query end-to-end with a directory namespace") {
    val mgr = new SessionManager(spark)
    try {
      mgr.resolver = Some(new Federation.DirectoryResolver(
        Map("tpch" -> SparkFixture.sfDir)))
      val h = mgr.create()
      val r = mgr.sql(h,
        """SELECT r_name, count(*) AS n
           FROM nation@tpch JOIN region@tpch ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name""").collect()
      assert(r.length == 5)
      assert(r.map(_.getLong(1)).sum == 25)
      // second query reuses the registered view (schema cache analogue)
      assert(mgr.sql(h, "SELECT count(*) AS n FROM nation@tpch")
        .collect().head.getLong(0) == 25)
      // recorded as a data source
      assert(h.dataSources.containsKey("nation@tpch"))
    } finally mgr.shutdown()
  }

  test("federated query against a real JDBC database pushes filters to the remote") {
    // embedded DuckDB over JDBC — a real external DB engine with its
    // own SQL dialect, standing in for Postgres/MySQL (test-scoped
    // driver; the JdbcResolver itself is driver-agnostic)
    val dbPath = java.nio.file.Files.createTempDirectory("graft-jdbc")
      .resolve("remote.db").toString
    val conn = java.sql.DriverManager.getConnection(s"jdbc:duckdb:$dbPath")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INTEGER, name VARCHAR, age INTEGER)")
      st.execute("INSERT INTO users VALUES (1,'ada',36),(2,'bob',17),(3,'eve',54)")
      st.close()
    } finally conn.close()
    val mgr = new SessionManager(spark)
    try {
      mgr.resolver = Some(new Federation.JdbcResolver(
        Map("remotedb" -> s"jdbc:duckdb:$dbPath")))
      val h = mgr.create()
      val df = mgr.sql(h,
        "SELECT name FROM users@remotedb WHERE age >= 18 ORDER BY name")
      assert(df.collect().map(_.getString(0)).toSeq == Seq("ada", "eve"))
      // projection + filter pushdown must reach the remote scan: the
      // JDBC relation advertises the pushed predicate and prunes to
      // the single selected column (+ filter column)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") &&
        scan.contains("GreaterThanOrEqual(age,18)"), s"no pushdown in:\n$scan")
      assert(h.dataSources.containsKey("users@remotedb"))
    } finally mgr.shutdown()
  }

  test("unknown namespace raises") {
    val mgr = new SessionManager(spark)
    try {
      mgr.resolver = Some(new Federation.DirectoryResolver(Map.empty))
      val h = mgr.create()
      intercept[IllegalArgumentException](mgr.sql(h, "SELECT * FROM t@nope"))
    } finally mgr.shutdown()
  }
}
