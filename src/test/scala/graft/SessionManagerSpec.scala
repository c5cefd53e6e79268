package graft

import graft.engine.{DataSourceDef, SessionManager}
import org.scalatest.funsuite.AnyFunSuite

class SessionManagerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("create, get, list, remove") {
    val mgr = new SessionManager(spark)
    try {
      val h = mgr.create(Some("s1"))
      assert(mgr.get("s1").exists(_.id == "s1"))
      assert(mgr.list.map(_.id).contains("s1"))
      assert(mgr.remove("s1"))
      assert(mgr.get("s1").isEmpty)
    } finally mgr.shutdown()
  }

  test("duplicate id rejected; uuid generated when unnamed") {
    val mgr = new SessionManager(spark)
    try {
      mgr.create(Some("dup"))
      intercept[IllegalArgumentException](mgr.create(Some("dup")))
      val anon = mgr.create()
      assert(anon.id.length == 36)
    } finally mgr.shutdown()
  }

  test("temp views are isolated between sessions") {
    val mgr = new SessionManager(spark)
    try {
      val a = mgr.create(Some("a"))
      val b = mgr.create(Some("b"))
      import a.spark.implicits._
      mgr.registerTable(a, Seq(1, 2, 3).toDF("x"), DataSourceDef("t", "json", None, None))
      assert(mgr.sql(a, "SELECT count(*) c FROM t").collect().head.getLong(0) == 3)
      intercept[Exception](mgr.sql(b, "SELECT * FROM t").collect())
    } finally mgr.shutdown()
  }

  test("ttl expires and reaper removes; access refreshes ttl") {
    val mgr = new SessionManager(spark, reaperPeriodMs = 50)
    try {
      val h = mgr.create(Some("short"), keepAliveSecs = 1)
      assert(mgr.get("short").isDefined)
      Thread.sleep(1500)
      assert(mgr.get("short").isEmpty, "expired session must be gone")
      // keepAlive=0 is immortal
      mgr.create(Some("immortal"), keepAliveSecs = 0)
      Thread.sleep(300)
      assert(mgr.get("immortal").isDefined)
      assert(mgr.get("immortal").get.ttlSecs == Long.MaxValue)
    } finally mgr.shutdown()
  }

  test("sql goes through the compat rewrite") {
    val mgr = new SessionManager(spark)
    try {
      val h = mgr.create()
      import h.spark.implicits._
      mgr.registerTable(h, Seq((1, "a")).toDF("k", "v"), DataSourceDef("t2", "json", None, None))
      // DataFusion-style postfix cast
      val r = mgr.sql(h, "SELECT k::STRING AS ks FROM t2").collect()
      assert(r.head.getString(0) == "1")
      // QUALIFY + * EXCLUDE reach the session route through the same
      // rewrite pipeline
      mgr.registerTable(h, Seq((1, "a", 10), (2, "a", 20), (3, "b", 30)).toDF("id", "g", "v"),
        DataSourceDef("t3", "json", None, None))
      val q = mgr.sql(h,
        "SELECT * EXCLUDE (v) FROM t3 QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1 ORDER BY id")
        .collect()
      assert(q.map(r2 => (r2.getInt(0), r2.getString(1))).toSeq == Seq((2, "a"), (3, "b")))
      assert(q.head.length == 2, "v and helper columns must not leak")
      // QUALIFY composing with a GROUPS frame in the predicate, run
      // end-to-end: windows 1-prec..1-foll over v = {30, 60, 50}
      val g2 = mgr.sql(h,
        "SELECT id FROM t3 QUALIFY sum(v) OVER (ORDER BY id GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) >= 50 ORDER BY id")
        .collect()
      assert(g2.map(_.getInt(0)).toSeq == Seq(2, 3))
    } finally mgr.shutdown()
  }

  test("API sessions resolve the compat shims and SQL kernels") {
    // newSession() builds a fresh function registry: without the
    // per-session registerAll, every shim fails UNRESOLVED_ROUTINE on
    // the session route even though the root session has it
    val mgr = new graft.engine.SessionManager(SparkFixture.spark)
    try {
      val h = mgr.create(Some("fnreg"))
      assert(mgr.sql(h, "SELECT sha256('x') AS h").collect()
        .head.getString(0).nonEmpty)
      assert(mgr.sql(h,
        "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect().head.getDouble(0) == 1.0)
      // compare the instant, not toString (which renders in the JVM
      // default zone and would fail on a non-UTC machine)
      assert(mgr.sql(h,
        "SELECT date_bin(60, TIMESTAMP '1970-01-01 00:02:30') AS b")
        .collect().head.getTimestamp(0).getTime == 120000L)
    } finally mgr.shutdown()
  }
}
