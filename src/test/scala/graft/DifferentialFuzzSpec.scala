package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-engine differential: a seeded generator produces
  * ANSI-subset queries that run VERBATIM on both Spark and embedded
  * DuckDB (the same JDBC driver FederationSpec uses), and results
  * must match as multisets. This extends the driver's fixed oracle
  * set with generated coverage of the filter/aggregate/join/set-op
  * space — the TPC-H-ish tables and the seed are fixed, so failures
  * reproduce exactly.
  *
  * The grammar deliberately stays in exact-typed territory (integers
  * and strings; every aggregate wrapped in CAST(... AS BIGINT)):
  * cross-engine double formatting/accumulation differences are a
  * known non-goal here — the fixed oracles cover them with rounding
  * contracts.
  */
class DifferentialFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sfDir

  private val tables = Seq("nation", "region", "customer", "orders",
    "lineitem", "supplier", "part")

  // (table, integer columns, string columns)
  private val cols: Map[String, (Seq[String], Seq[String])] = Map(
    "nation" -> (Seq("n_nationkey", "n_regionkey"), Seq("n_name")),
    "region" -> (Seq("r_regionkey"), Seq("r_name")),
    "customer" -> (Seq("c_custkey", "c_nationkey"), Seq("c_name", "c_mktsegment")),
    "orders" -> (Seq("o_orderkey", "o_custkey"), Seq("o_orderstatus", "o_orderpriority")),
    "lineitem" -> (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus")),
    "supplier" -> (Seq("s_suppkey", "s_nationkey"), Seq("s_name")),
    "part" -> (Seq("p_partkey", "p_size"), Seq("p_brand", "p_type")))

  private val joins = Seq(
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("nation", "region", "n_regionkey = r_regionkey"))

  private lazy val duck: java.sql.Connection = {
    val c = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    tables.foreach { t =>
      c.createStatement().execute(
        s"CREATE VIEW $t AS SELECT * FROM read_parquet('$sf/$t.parquet')")
    }
    c
  }

  private def sparkViews(): Unit = tables.foreach { t =>
    spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
  }

  private def runSpark(sql: String): Seq[Seq[String]] =
    spark.sql(sql).collect().toSeq.map(r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))))

  private def runDuck(sql: String): Seq[Seq[String]] = {
    val rs = duck.createStatement().executeQuery(sql)
    val n = rs.getMetaData.getColumnCount
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    while (rs.next()) out += (1 to n).map(i => String.valueOf(rs.getObject(i)))
    out.toSeq
  }

  private def intPred(rnd: scala.util.Random, ic: String): String =
    rnd.nextInt(4) match {
      case 0 => s"$ic % ${2 + rnd.nextInt(9)} = ${rnd.nextInt(2)}"
      case 1 => s"$ic < ${Seq(10, 100, 1000)(rnd.nextInt(3))}"
      case 2 => s"$ic >= ${Seq(5, 50, 500)(rnd.nextInt(3))}"
      case 3 => s"$ic BETWEEN ${rnd.nextInt(100)} AND ${100 + rnd.nextInt(900)}"
    }

  private def strPred(rnd: scala.util.Random, sc: String): String =
    rnd.nextInt(3) match {
      case 0 => s"$sc >= '${('A' + rnd.nextInt(26)).toChar}'"
      case 1 => s"$sc < '${('N' + rnd.nextInt(13)).toChar}'"
      case 2 => s"length($sc) % ${2 + rnd.nextInt(3)} = ${rnd.nextInt(2)}"
    }

  private def pred(rnd: scala.util.Random, t: String,
      prefix: String = ""): String = {
    val (ics, scs) = cols(t)
    val p1 = intPred(rnd, prefix + ics(rnd.nextInt(ics.size)))
    val p2 = strPred(rnd, prefix + scs(rnd.nextInt(scs.size)))
    rnd.nextInt(3) match {
      case 0 => p1
      case 1 => s"($p1 AND $p2)"
      case 2 => s"($p1 OR $p2)"
    }
  }

  private def gen(rnd: scala.util.Random): String = rnd.nextInt(9) match {
    case 0 => // filtered projection
      val t = tables(rnd.nextInt(tables.size))
      val (ics, scs) = cols(t)
      val sel = (rnd.shuffle(ics).take(1 + rnd.nextInt(2)) ++
        rnd.shuffle(scs).take(1)).mkString(", ")
      s"SELECT $sel FROM $t WHERE ${pred(rnd, t)}"
    case 1 => // grouped aggregation (+ optional HAVING)
      val t = tables(rnd.nextInt(tables.size))
      val (ics, scs) = cols(t)
      val g = scs(rnd.nextInt(scs.size))
      val ic = ics(rnd.nextInt(ics.size))
      val ic2 = ics(rnd.nextInt(ics.size))
      val having = if (rnd.nextBoolean()) s" HAVING COUNT(*) > ${rnd.nextInt(3)}" else ""
      s"""SELECT $g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM($ic) AS BIGINT) AS s, CAST(MIN($ic) AS BIGINT) AS mn,
          CAST(MAX($ic) AS BIGINT) AS mx,
          CAST(COUNT(DISTINCT $ic2) AS BIGINT) AS nd
          FROM $t WHERE ${pred(rnd, t)} GROUP BY $g$having"""
    case 2 => // join + aggregation
      val (a, b, on) = joins(rnd.nextInt(joins.size))
      val g = cols(b)._2.head
      val ic = cols(a)._1(rnd.nextInt(cols(a)._1.size))
      s"""SELECT $g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM($ic) AS BIGINT) AS s
          FROM $a JOIN $b ON $on WHERE ${pred(rnd, a)} GROUP BY $g"""
    case 3 => // set operation on one int column
      val t = tables(rnd.nextInt(tables.size))
      val ic = cols(t)._1(rnd.nextInt(cols(t)._1.size))
      val op = Seq("UNION", "INTERSECT", "EXCEPT")(rnd.nextInt(3))
      s"""SELECT $ic FROM $t WHERE ${intPred(rnd, ic)}
          $op SELECT $ic FROM $t WHERE ${intPred(rnd, ic)}"""
    case 4 => // IN-subquery
      val (a, b, on) = joins(rnd.nextInt(joins.size))
      val Array(l, r) = on.split(" = ")
      val sel = cols(a)._1.head
      s"""SELECT $sel FROM $a WHERE $l IN
          (SELECT $r FROM $b WHERE ${pred(rnd, b)}) AND ${pred(rnd, a)}"""
    case 5 => // total-order top-k (binary collation on both engines)
      val t = tables(rnd.nextInt(tables.size))
      val (ics, scs) = cols(t)
      val ic = ics(rnd.nextInt(ics.size))
      val sc = scs(rnd.nextInt(scs.size))
      val dir = if (rnd.nextBoolean()) "DESC" else "ASC"
      s"""SELECT $ic, $sc FROM $t WHERE ${pred(rnd, t)}
          ORDER BY $ic $dir, $sc LIMIT ${1 + rnd.nextInt(20)}"""
    case 6 => // window functions over a deterministic total order
      val t = tables(rnd.nextInt(tables.size))
      val (ics, scs) = cols(t)
      val ic = ics(rnd.nextInt(ics.size))
      val key = ics.head // unique-ish tiebreak keeps ranks total
      val sc = scs(rnd.nextInt(scs.size))
      val fn = Seq("ROW_NUMBER()", "RANK()", "DENSE_RANK()")(rnd.nextInt(3))
      s"""SELECT $key, CAST($fn OVER (PARTITION BY $sc ORDER BY $ic, $key)
            AS BIGINT) AS rnk,
          CAST(SUM($ic) OVER (PARTITION BY $sc ORDER BY $ic, $key
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runsum
          FROM $t WHERE ${pred(rnd, t)}"""
    case 7 => // LEFT JOIN + aggregation (null-group semantics)
      val (a, b, on) = joins(rnd.nextInt(joins.size))
      val g = cols(a)._2.head
      val ic = cols(b)._1.head
      s"""SELECT $g, CAST(COUNT($ic) AS BIGINT) AS n_matched,
          CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM $a LEFT JOIN $b ON $on AND ${pred(rnd, b)} GROUP BY $g"""
    case 8 => // scalar-subquery bound
      val t = tables(rnd.nextInt(tables.size))
      val ic = cols(t)._1(rnd.nextInt(cols(t)._1.size))
      val agg = Seq("MIN", "MAX")(rnd.nextInt(2))
      s"""SELECT $ic FROM $t WHERE $ic > 
          (SELECT $agg($ic) FROM $t WHERE ${intPred(rnd, ic)}) / 2
          AND ${pred(rnd, t)}"""
  }

  test("200 seeded random queries agree between Spark and DuckDB") {
    sparkViews()
    val rnd = new scala.util.Random(42)
    var checked = 0
    (1 to 200).foreach { i =>
      val sql = gen(rnd)
      val s = runSpark(sql).sortBy(_.mkString(""))
      val d = runDuck(sql).sortBy(_.mkString(""))
      assert(s == d,
        s"query #$i diverged (${s.size} vs ${d.size} rows):\n$sql\n" +
          s"spark: ${s.take(5)}\nduck:  ${d.take(5)}")
      checked += 1
    }
    info(s"$checked generated queries matched exactly")
    assert(checked == 200)
  }

  test("the compat rewrite path is transparent on 50 generated ANSI queries") {
    // SessionManager.sql runs every query through the tokenizer-based
    // SqlRewrite (:: casts, DISTINCT ON, GROUPS frames, table@ns ...);
    // on plain ANSI text the rewrite must be a no-op — generated
    // queries through the SESSION route must match DuckDB exactly,
    // guarding the rewriter against mangling clean SQL
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("fuzz-rewrite"))
      tables.foreach { t =>
        h.spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
      }
      val rnd = new scala.util.Random(7)
      (1 to 50).foreach { i =>
        val sql = gen(rnd)
        val ordered = sql.contains("LIMIT")
        def canon(rows: Seq[Seq[String]]) =
          if (ordered) rows else rows.sortBy(_.mkString(" "))
        val viaSession = canon(mgr.sql(h, sql).collect().toSeq.map(r =>
          (0 until r.length).map(j => String.valueOf(r.get(j)))))
        val d = canon(runDuck(sql))
        assert(viaSession == d,
          s"rewrite path diverged on #$i:\n$sql\n" +
            s"session: ${viaSession.take(3)}\nduck: ${d.take(3)}")
      }
    } finally mgr.shutdown()
  }
}
