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

  test("information_schema.tables and .columns resolve via synthetic views") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("info1"))
      mgr.sql(h, "CREATE TABLE widgets AS SELECT 1 AS id, 'a' AS name")
      val tables = mgr.sql(h,
        "SELECT table_name, table_type FROM information_schema.tables ORDER BY table_name")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(tables.exists(_._1 == "widgets"), tables.mkString(","))
      assert(tables.filter(_._1 == "widgets").head._2 == "VIEW")
      val cols = mgr.sql(h,
        "SELECT column_name, data_type, ordinal_position FROM information_schema.columns " +
          "WHERE table_name = 'widgets' ORDER BY ordinal_position")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      assert(cols.map(_._1).toSeq == Seq("id", "name"), cols.mkString(","))
      assert(cols.head._2 == "int")
      // DDL is reflected on the next query
      mgr.sql(h, "DROP TABLE widgets")
      val after = mgr.sql(h,
        "SELECT table_name FROM information_schema.tables WHERE table_name = 'widgets'")
        .collect()
      assert(after.isEmpty)
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

  test("CREATE EXTERNAL TABLE registers a lazy scan queryable by SQL") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ext1"))
      val ddl = "CREATE EXTERNAL TABLE ext_orders STORED AS PARQUET " +
        s"LOCATION '${SparkFixture.sfDir}/orders.parquet'"
      assert(mgr.sql(h, ddl).collect().isEmpty) // DDL → empty relation
      val n = mgr.sql(h, "SELECT COUNT(*) AS n FROM ext_orders")
        .collect().head.getLong(0)
      assert(n > 0)
      // registered as a data-source record (REST list/detail parity)
      val ds = h.dataSources.get("ext_orders")
      assert(ds != null && ds.format == "parquet" &&
        ds.location.exists(_.endsWith("orders.parquet")))
      // existing name: plain create fails, IF NOT EXISTS is a no-op
      intercept[IllegalArgumentException] { mgr.sql(h, ddl) }
      assert(mgr.sql(h,
        "CREATE EXTERNAL TABLE IF NOT EXISTS ext_orders STORED AS PARQUET " +
          s"LOCATION '${SparkFixture.sfDir}/orders.parquet'").collect().isEmpty)
      // unsupported format is a clean client error
      val e = intercept[IllegalArgumentException] {
        mgr.sql(h, "CREATE EXTERNAL TABLE x STORED AS ORC LOCATION '/tmp/x'")
      }
      assert(e.getMessage.contains("unsupported STORED AS"))
      // DROP TABLE releases it like any session table
      mgr.sql(h, "DROP TABLE ext_orders")
      assert(h.dataSources.get("ext_orders") == null)
    } finally mgr.shutdown()
  }

  test("CREATE EXTERNAL TABLE CSV honors format options") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ext2"))
      mgr.sql(h, "CREATE EXTERNAL TABLE store STORED AS CSV " +
        "OPTIONS ('format.has_header' 'true') " +
        "LOCATION '/root/reference/bin/data/superstore.csv'")
      val df = mgr.sql(h, "SELECT COUNT(*) AS n FROM store")
      assert(df.collect().head.getLong(0) > 0)
      assert(mgr.sql(h, "SELECT * FROM store LIMIT 1").columns.contains("Category"))
    } finally mgr.shutdown()
  }

  test("CREATE EXTERNAL TABLE parse edges") {
    import graft.sqlcompat.ExternalTable
    // case-insensitive keywords, trailing semicolon, AVRO format
    val p = ExternalTable.parse(
      "create external table Names stored as avro location '/root/reference/bin/data/popular-names.avro';").get
    assert(p.table == "Names" && p.format == "AVRO" && !p.ifNotExists)
    // multiple OPTIONS pairs, with comma separators
    val p2 = ExternalTable.parse(
      "CREATE EXTERNAL TABLE t STORED AS CSV OPTIONS ('format.has_header' 'false', 'format.delimiter' '|') LOCATION '/x.csv'").get
    assert(p2.options == Map("format.has_header" -> "false", "format.delimiter" -> "|"))
    // forms outside the subset do NOT match (fall through to Spark):
    // column-def list, PARTITIONED BY, missing LOCATION
    assert(ExternalTable.parse(
      "CREATE EXTERNAL TABLE t (a INT) STORED AS CSV LOCATION '/x'").isEmpty)
    assert(ExternalTable.parse(
      "CREATE EXTERNAL TABLE t STORED AS PARQUET PARTITIONED BY (a) LOCATION '/x'").isEmpty)
    assert(ExternalTable.parse("CREATE EXTERNAL TABLE t STORED AS PARQUET").isEmpty)
    // plain CTAS is not an external table
    assert(ExternalTable.parse("CREATE TABLE t AS SELECT 1").isEmpty)
  }

  test("CREATE EXTERNAL TABLE avro end-to-end over the reference fixture") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ext4"))
      mgr.sql(h, "CREATE EXTERNAL TABLE names STORED AS AVRO " +
        "LOCATION '/root/reference/bin/data/popular-names.avro'")
      assert(mgr.sql(h, "SELECT COUNT(*) AS n FROM names")
        .collect().head.getLong(0) > 0)
    } finally mgr.shutdown()
  }

  test("CREATE EXTERNAL TABLE is lazy: pushdown reaches the files") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("ext3"))
      mgr.sql(h, "CREATE EXTERNAL TABLE ext_li STORED AS PARQUET " +
        s"LOCATION '${SparkFixture.sfDir}/lineitem.parquet'")
      val plan = mgr.sql(h,
        "SELECT l_orderkey FROM ext_li WHERE l_orderkey = 42")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("EqualTo(l_orderkey,42)"), plan)
    } finally mgr.shutdown()
  }
}
