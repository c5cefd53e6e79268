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

  test("unknown namespace raises") {
    val mgr = new SessionManager(spark)
    try {
      mgr.resolver = Some(new Federation.DirectoryResolver(Map.empty))
      val h = mgr.create()
      intercept[IllegalArgumentException](mgr.sql(h, "SELECT * FROM t@nope"))
    } finally mgr.shutdown()
  }
}
