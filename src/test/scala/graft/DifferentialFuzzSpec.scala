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
@org.scalatest.tags.Slow
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

  private def gen(rnd: scala.util.Random): String = rnd.nextInt(11) match {
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
    case 9 => // EXISTS / NOT EXISTS correlated subquery
      val (a, b, on) = joins(rnd.nextInt(joins.size))
      val Array(lc, rc) = on.split(" = ")
      val not = if (rnd.nextBoolean()) "NOT " else ""
      val sel = cols(a)._1.head
      s"""SELECT $sel FROM $a WHERE ${not}EXISTS
          (SELECT 1 FROM $b WHERE $rc = $lc AND ${pred(rnd, b)})
          AND ${pred(rnd, a)}"""
    case 10 => // join + HAVING over grouped aggregates
      val (a, b, on) = joins(rnd.nextInt(joins.size))
      val g = cols(b)._2.head
      val ic = cols(a)._1(rnd.nextInt(cols(a)._1.size))
      s"""SELECT $g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(MAX($ic) AS BIGINT) AS mx
          FROM $a JOIN $b ON $on GROUP BY $g
          HAVING COUNT(*) >= ${1 + rnd.nextInt(4)}
             AND MIN($ic) < ${Seq(100, 1000, 10000)(rnd.nextInt(3))}"""
  }

  /** Paired GROUPS-frame spellings: Spark gets the raw SQL:2011
    * `GROUPS` text through the compat-rewrite door (the q55 path —
    * Spark ≤4.1 has no native GROUPS), DuckDB gets the hand-written
    * dense_rank + RANGE equivalence (it refuses GROUPS outright).
    * Whole peer groups make the aggregates order-insensitive, so
    * results must match exactly.
    */
  private def genGroups(rnd: scala.util.Random): (String, String) = {
    val t = tables(rnd.nextInt(tables.size))
    val (ics, scs) = cols(t)
    val ic = ics(rnd.nextInt(ics.size))
    val sc = scs(rnd.nextInt(scs.size))
    val frame = rnd.nextInt(3) match {
      case 0 => s"BETWEEN ${1 + rnd.nextInt(3)} PRECEDING AND CURRENT ROW"
      case 1 => s"BETWEEN CURRENT ROW AND ${rnd.nextInt(3)} FOLLOWING"
      case 2 => s"BETWEEN ${1 + rnd.nextInt(3)} PRECEDING AND ${rnd.nextInt(3)} FOLLOWING"
    }
    val p = pred(rnd, t)
    val agg = Seq(s"SUM($ic)", "COUNT(*)")(rnd.nextInt(2))
    // sometimes a SECOND GROUPS window over the same spec — the
    // rewrite loops per frame, so multi-GROUPS queries must survive
    val second =
      if (rnd.nextBoolean())
        s""", CAST(COUNT(*) OVER (PARTITION BY $sc ORDER BY $ic
            GROUPS $frame) AS BIGINT) AS gval2"""
      else ""
    val secondDuck =
      if (second.nonEmpty)
        s""", CAST(COUNT(*) OVER (PARTITION BY $sc ORDER BY dr
            RANGE $frame) AS BIGINT) AS gval2"""
      else ""
    val sparkSql =
      s"""SELECT ${ics.head} AS k0, $ic AS k1,
          CAST($agg OVER (PARTITION BY $sc ORDER BY $ic
            GROUPS $frame) AS BIGINT) AS gval$second
          FROM $t WHERE $p"""
    val duckSql =
      s"""WITH b AS (SELECT *,
            DENSE_RANK() OVER (PARTITION BY $sc ORDER BY $ic) AS dr
          FROM $t WHERE $p)
          SELECT ${ics.head} AS k0, $ic AS k1,
          CAST($agg OVER (PARTITION BY $sc ORDER BY dr
            RANGE $frame) AS BIGINT) AS gval$secondDuck
          FROM b"""
    (sparkSql, duckSql)
  }

  test("300 seeded random queries agree between Spark and DuckDB") {
    sparkViews()
    val rnd = new scala.util.Random(42)
    var checked = 0
    (1 to 300).foreach { i =>
      val sql = gen(rnd)
      val s = runSpark(sql).sortBy(_.mkString(""))
      val d = runDuck(sql).sortBy(_.mkString(""))
      assert(s == d,
        s"query #$i diverged (${s.size} vs ${d.size} rows):\n$sql\n" +
          s"spark: ${s.take(5)}\nduck:  ${d.take(5)}")
      checked += 1
    }
    info(s"$checked generated queries matched exactly")
    assert(checked == 300)
  }

  test("as-of join fuzz: flat AND bucketed operators match DuckDB ASOF JOIN") {
    // operator-level differential (Spark has no ASOF syntax): random
    // key/ts frames — right side unique per (k, ts) so the DuckDB pick
    // is total — across both directions, inner/left, and the skewed
    // variant at random bucket widths. No null left ts here: DuckDB's
    // ASOF gives a null-ts probe the LARGEST right row (its sort puts
    // nulls high) where SQL comparison semantics — ours, and the
    // operator's documented contract — make null match nothing;
    // TemporalJoinsSpec pins our null behavior explicitly.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { ds =>
      def uniqTs(n: Int): Seq[Long] = {
        val s = scala.collection.mutable.LinkedHashSet.empty[Long]
        while (s.size < n) s += rnd.nextInt(100000).toLong
        s.toSeq
      }
      val rights = (0L to 6L).flatMap { k =>
        uniqTs(40).zipWithIndex.map { case (t, i) =>
          (k * 1000 + i, k, t, rnd.nextInt(1000).toDouble)
        }
      }
      val lefts = (1L to 300L).map { i =>
        (i, rnd.nextInt(8).toLong, rnd.nextInt(100000).toLong)
      }
      val left = lefts.toDF("lid", "k", "ts")
      val right = rights.toDF("rid", "k", "ts", "v")
      val st = duck.createStatement()
      st.execute("CREATE OR REPLACE TABLE fz_l(lid BIGINT, k BIGINT, ts BIGINT)")
      st.execute("INSERT INTO fz_l VALUES " + lefts.map { case (a, b, c) =>
        s"($a,$b,$c)" }.mkString(","))
      st.execute("CREATE OR REPLACE TABLE fz_r(rid BIGINT, k BIGINT, ts BIGINT, v DOUBLE)")
      st.execute("INSERT INTO fz_r VALUES " + rights.map { case (a, b, c, d) =>
        s"($a,$b,$c,$d)" }.mkString(","))
      for (forward <- Seq(false, true); inner <- Seq(false, true)) {
        val cmp = if (forward) "l.ts <= r.ts" else "l.ts >= r.ts"
        val jt = if (inner) "ASOF JOIN" else "ASOF LEFT JOIN"
        val want = runDuck(
          s"SELECT l.lid, r.rid FROM fz_l l $jt fz_r r ON l.k = r.k AND $cmp")
          .map(r => (r(0), r(1))).toSet
        val flat = graft.ops.TemporalJoins.asofJoin(
            left, right, "k", "ts", "ts", Seq("rid"),
            inner = inner, forward = forward)
          .collect()
          .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(3)))).toSet
        assert(flat == want, s"ds=$ds forward=$forward inner=$inner flat: " +
          s"missing=${(want -- flat).take(3)} extra=${(flat -- want).take(3)}")
        val width = Seq(100L, 3000L, 250000L)(rnd.nextInt(3))
        val skewed = graft.ops.TemporalJoins.asofJoinSkewed(
            left, right, "k", "ts", "ts", Seq("rid"), bucketWidth = width,
            inner = inner, forward = forward)
          .collect()
          .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(3)))).toSet
        assert(skewed == want,
          s"ds=$ds forward=$forward inner=$inner width=$width skewed diverged")
      }
    }
  }

  test("seeded ANN twins fuzz: randomized parameters match the SQL reconstruction") {
    // generalizes the fixed s17/s18 oracle pairs from ONE hand-picked
    // parameterization to randomized (nPlanes | numCells, nprobe),
    // queryId and k — the operator and the SQL template must agree on
    // raw doubles at every setting, or the fixed hash-match was luck
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    duck.createStatement().execute(
      s"""CREATE OR REPLACE VIEW embeddings AS
          SELECT * FROM read_parquet('$sf/embeddings.parquet')""")
    def lshSql(nPlanes: Int, qid: Int, k: Int) = s"""
      WITH planes AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $nPlanes)),
      dots AS (
        SELECT e.vec_id, pl.i,
          list_sum(list_transform(generate_series(1, len(e.embedding)),
            j -> CAST(e.embedding[j] AS DOUBLE) * pl.p[j])) AS d
        FROM embeddings e CROSS JOIN planes pl),
      buckets AS (
        SELECT vec_id,
          CAST(SUM(CASE WHEN d >= 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id),
      q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = $qid),
      qb AS (SELECT bucket FROM buckets WHERE vec_id = $qid),
      cand AS (
        SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN buckets b USING (vec_id), qb
        WHERE b.bucket = qb.bucket AND e.vec_id <> $qid),
      scored AS (
        SELECT c.vec_id,
          list_sum(list_transform(generate_series(1, len(c.embedding)),
            j -> CAST(c.embedding[j] AS DOUBLE) * q.qv[j]))
          / (sqrt(list_sum(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
        FROM cand c, q)
      SELECT vec_id, cos_sim FROM scored
      ORDER BY cos_sim DESC, vec_id LIMIT $k"""
    def ivfSql(numCells: Int, nprobe: Int, qid: Int, k: Int) = s"""
      WITH cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $numCells)),
      sims AS (
        SELECT e.vec_id, c.cell,
          list_sum(list_transform(generate_series(1, len(e.embedding)),
            j -> CAST(e.embedding[j] AS DOUBLE) * c.cv[j]))
          / (sqrt(list_sum(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) AS sim
        FROM embeddings e CROSS JOIN cents c),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
          FROM sims) WHERE rn = 1),
      q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = $qid),
      probes AS (
        SELECT c.cell FROM cents c, q
        ORDER BY list_sum(list_transform(generate_series(1, len(q.qv)),
            j -> q.qv[j] * c.cv[j]))
          / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
             * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC, c.cell
        LIMIT $nprobe),
      cand AS (
        SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN assigned a USING (vec_id)
        WHERE a.cell IN (SELECT cell FROM probes) AND e.vec_id <> $qid),
      scored AS (
        SELECT c.vec_id,
          list_sum(list_transform(generate_series(1, len(c.embedding)),
            j -> CAST(c.embedding[j] AS DOUBLE) * q.qv[j]))
          / (sqrt(list_sum(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
        FROM cand c, q)
      SELECT vec_id, cos_sim FROM scored
      ORDER BY cos_sim DESC, vec_id LIMIT $k"""
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.collect().toSeq.map(r =>
        (0 until r.length).map(i => String.valueOf(r.get(i))))
    val rnd = new scala.util.Random(37)
    (1 to 8).foreach { i =>
      val (nPlanes, qid, k) = (2 + rnd.nextInt(4), rnd.nextInt(500),
        3 + rnd.nextInt(8))
      val s = rows(graft.pipeline.Similarity.lshTopKSeeded(
        emb, "embedding", "vec_id", qid, k, nPlanes))
      val d = runDuck(lshSql(nPlanes, qid, k))
      assert(s == d, s"LSH trial #$i nPlanes=$nPlanes qid=$qid k=$k " +
        s"diverged (${s.size} vs ${d.size}):\n${s.take(3)}\n${d.take(3)}")
    }
    (1 to 8).foreach { i =>
      val numCells = 4 + rnd.nextInt(9)
      val (nprobe, qid, k) = (1 + rnd.nextInt(numCells), rnd.nextInt(500),
        3 + rnd.nextInt(8))
      val s = rows(graft.pipeline.Ivf.searchTopKSeeded(
        emb, "embedding", "vec_id", qid, k, numCells, nprobe))
      val d = runDuck(ivfSql(numCells, nprobe, qid, k))
      assert(s == d, s"IVF trial #$i cells=$numCells nprobe=$nprobe " +
        s"qid=$qid k=$k diverged (${s.size} vs ${d.size}):\n" +
        s"${s.take(3)}\n${d.take(3)}")
    }
    // PQ: random subspace count and codebook size (dim 64 → sub = 64/m);
    // the 6-dp rounding contract must hold at every (m, ksub), not just
    // the fixed s16 setting
    def pqSql(m: Int, ksub: Int, qid: Int, k: Int) = {
      val sub = 64 / m
      s"""
      WITH js AS (SELECT unnest(range($m)) AS j),
      seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $ksub)),
      cb AS (
        SELECT js.j, seeds.code,
               list_transform(generate_series(1, $sub), i -> v[js.j*$sub + i]) AS cent
        FROM seeds, js),
      dists AS (
        SELECT e.vec_id, c.j, c.code,
          list_sum(list_transform(generate_series(1, $sub),
            i -> (CAST(e.embedding[c.j*$sub+i] AS DOUBLE) - c.cent[i])
               * (CAST(e.embedding[c.j*$sub+i] AS DOUBLE) - c.cent[i]))) AS d
        FROM embeddings e CROSS JOIN cb c),
      codes AS (
        SELECT vec_id, j, code FROM (
          SELECT vec_id, j, code,
            ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
          FROM dists) WHERE rn = 1),
      q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
            FROM embeddings WHERE vec_id = $qid),
      qn AS (SELECT sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
      tabs AS (
        SELECT c.j, c.code,
          list_sum(list_transform(generate_series(1, $sub),
            i -> q.qv[c.j*$sub+i] * c.cent[i])) AS dot,
          list_sum(list_transform(c.cent, x -> x*x)) AS nrm2
        FROM cb c, q),
      parts AS (
        SELECT cd.vec_id, cd.j, t.dot, t.nrm2
        FROM codes cd JOIN tabs t ON cd.j = t.j AND cd.code = t.code),
      scored AS (
        SELECT vec_id,
          list_sum(list(dot ORDER BY j)) AS dsum,
          list_sum(list(nrm2 ORDER BY j)) AS nsum
        FROM parts GROUP BY vec_id)
      SELECT vec_id, ROUND(dsum / (qn.qnorm * sqrt(nsum)), 6) AS adc_sim
      FROM scored, qn WHERE vec_id <> $qid
      ORDER BY adc_sim DESC, vec_id LIMIT $k"""
    }
    (1 to 8).foreach { i =>
      val m = Seq(4, 8, 16)(rnd.nextInt(3))
      val (ksub, qid, k) = (Seq(8, 16)(rnd.nextInt(2)), rnd.nextInt(500),
        3 + rnd.nextInt(8))
      val s = rows(graft.pipeline.Pq.searchTopKSeeded(
        emb, "embedding", "vec_id", qid, k, m, ksub))
      val d = runDuck(pqSql(m, ksub, qid, k))
      assert(s == d, s"PQ trial #$i m=$m ksub=$ksub qid=$qid k=$k " +
        s"diverged (${s.size} vs ${d.size}):\n${s.take(3)}\n${d.take(3)}")
    }
  }

  test("GROUPS-frame fuzz: the rewrite door matches DuckDB's dense_rank+RANGE twin") {
    sparkViews()
    val rnd = new scala.util.Random(31)
    (1 to 40).foreach { i =>
      val (sparkSql, duckSql) = genGroups(rnd)
      val rewritten = graft.sqlcompat.SqlRewrite.rewrite(sparkSql)
      assert(!rewritten.toUpperCase.contains("GROUPS BETWEEN"),
        s"rewrite must eliminate the GROUPS frame:\n$sparkSql")
      val s = runSpark(rewritten).sortBy(_.mkString(""))
      val d = runDuck(duckSql).sortBy(_.mkString(""))
      assert(s == d,
        s"GROUPS query #$i diverged (${s.size} vs ${d.size} rows):\n" +
          s"$sparkSql\nspark: ${s.take(5)}\nduck:  ${d.take(5)}")
    }
  }

  test("range join fuzz: bucketed operator matches DuckDB's inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { ds =>
      val pts = (1L to 250L).map(i => (i, rnd.nextInt(10000).toLong))
      val ivs = (1L to 60L).map { i =>
        val lo = rnd.nextInt(9500).toLong
        (i, lo, lo + 1 + rnd.nextInt(800).toLong)
      }
      val st = duck.createStatement()
      st.execute("CREATE OR REPLACE TABLE fz_p(pid BIGINT, pt BIGINT)")
      st.execute("INSERT INTO fz_p VALUES " +
        pts.map { case (a, b) => s"($a,$b)" }.mkString(","))
      st.execute("CREATE OR REPLACE TABLE fz_i(iid BIGINT, lo BIGINT, hi BIGINT)")
      st.execute("INSERT INTO fz_i VALUES " +
        ivs.map { case (a, b, c) => s"($a,$b,$c)" }.mkString(","))
      val want = runDuck(
        "SELECT p.pid, i.iid FROM fz_p p JOIN fz_i i ON p.pt >= i.lo AND p.pt < i.hi")
        .map(r => (r(0), r(1))).toSet
      Seq(64L, 777L, 5000L).foreach { width =>
        val got = graft.ops.TemporalJoins.rangeJoin(
            pts.toDF("pid", "pt"), ivs.toDF("iid", "lo", "hi"),
            "pt", "lo", "hi", bucketWidth = width)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0).toString, r.getLong(1).toString))
        assert(got.length == got.toSet.size,
          s"ds=$ds width=$width emitted a pair twice")
        assert(got.toSet == want, s"ds=$ds width=$width: " +
          s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
      }
    }
  }

  test("QUALIFY rewrite matches DuckDB's native QUALIFY on directed forms") {
    // DuckDB implements QUALIFY natively (post-window filter, same
    // semantics as DataFusion's `select.rs` planning); the Spark side
    // runs the SAME text through SqlRewrite — grading the rewrite
    // against a native engine implementation across the clause forms:
    // window alias, inline window over unprojected columns, window
    // over an aggregated select, DISTINCT, and LIMIT.
    sparkViews()
    val qs = Seq(
      "SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rn " +
        "FROM orders WHERE o_orderkey <= 2000 QUALIFY rn <= 2 ORDER BY o_custkey, o_orderkey",
      "SELECT n_name FROM nation QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1 ORDER BY n_name",
      "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus " +
        "QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_orderstatus) <= 2 ORDER BY n DESC, o_orderstatus",
      "SELECT DISTINCT o_orderstatus FROM orders QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) = 1 ORDER BY o_orderstatus",
      "SELECT o_custkey, o_orderkey FROM orders WHERE o_orderkey <= 500 " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1 ORDER BY o_custkey LIMIT 10",
      "SELECT * FROM nation QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) = 1 ORDER BY n_nationkey",
      // * EXCLUDE wildcard option (rewritten to Spark's * EXCEPT;
      // DuckDB runs EXCLUDE natively)
      "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey",
      // positional ORDER BY after QUALIFY
      "SELECT n_regionkey, n_name FROM nation QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1 ORDER BY 1 DESC, 2",
      "SELECT * EXCLUDE n_regionkey FROM nation QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) <= 2 ORDER BY n_nationkey")
    qs.foreach { q =>
      val sp = runSpark(graft.sqlcompat.SqlRewrite.rewrite(q))
      val du = runDuck(q)
      assert(sp == du, s"QUALIFY diverged on:\n$q\nspark: ${sp.take(3)}\nduck: ${du.take(3)}")
    }
  }

  test("QUALIFY fuzz: 60 generated clause forms match DuckDB's native QUALIFY") {
    // random table / partition column / rank function / predicate
    // shape (projected alias, inline window, * EXCLUDE), window
    // ordered by the table's unique key so ROW_NUMBER stays
    // deterministic under ties
    sparkViews()
    val rnd = new scala.util.Random(77)
    val uniq = Seq("nation" -> "n_nationkey", "region" -> "r_regionkey",
      "customer" -> "c_custkey", "orders" -> "o_orderkey",
      "supplier" -> "s_suppkey", "part" -> "p_partkey")
    (1 to 60).foreach { i =>
      val (t, key) = uniq(rnd.nextInt(uniq.size))
      val (ics, scs) = cols(t)
      val rest = (ics ++ scs).filter(_ != key)
      val pcol = rest(rnd.nextInt(rest.size))
      val fn = Seq("ROW_NUMBER()", "RANK()", "DENSE_RANK()")(rnd.nextInt(3))
      val dir = if (rnd.nextBoolean()) "" else " DESC"
      val k = 1 + rnd.nextInt(3)
      val over = s"$fn OVER (PARTITION BY $pcol ORDER BY $key$dir)"
      val where = if (rnd.nextBoolean()) s" WHERE ${intPred(rnd, ics.head)}" else ""
      val sql = rnd.nextInt(3) match {
        case 0 => s"SELECT $pcol, $key, $over AS rn FROM $t$where QUALIFY rn <= $k ORDER BY $key"
        case 1 => s"SELECT $pcol, $key FROM $t$where QUALIFY $over <= $k ORDER BY $key"
        case 2 => s"SELECT * EXCLUDE ($pcol) FROM $t$where QUALIFY $over = 1 ORDER BY $key"
      }
      // a bare star drags timestamp columns along, rendered
      // LocalDateTime-style by Spark and Timestamp-style by JDBC —
      // canonicalize both to "yyyy-MM-dd HH:mm:ss"
      val Ts = """^(\d{4}-\d{2}-\d{2})[T ](\d{2}:\d{2})(?::(\d{2}))?(?:\.\d+)?$""".r
      def norm(rows: Seq[Seq[String]]) = rows.map(_.map {
        case Ts(day, hm, sec) => s"$day $hm:${Option(sec).getOrElse("00")}"
        case v => v
      })
      val s = norm(runSpark(graft.sqlcompat.SqlRewrite.rewrite(sql)))
      val d = norm(runDuck(sql))
      assert(s == d,
        s"QUALIFY fuzz #$i diverged (${s.size} vs ${d.size} rows):\n$sql\n" +
          s"spark: ${s.take(3)}\nduck: ${d.take(3)}")
    }
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

  test("cms fuzz: randomized (depth, width, k) match the SQL reconstruction") {
    // generalizes t24's fixed 4x1024 sketch: the md5-bucket hashing,
    // cell aggregation, and min-estimate must agree with the SQL
    // template at every parameterization, or the fixed hash-match was
    // luck. Integer arithmetic end to end — exact string equality.
    duck.createStatement().execute(
      s"""CREATE OR REPLACE VIEW documents AS
          SELECT * FROM read_parquet('$sf/documents.parquet')""")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def cmsSql(depth: Int, width: Int, k: Int) = {
      def bucket = s"""
        ((strpos('0123456789abcdef', substr(md5(j || ':' || tok), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 4, 1)) - 1)) % $width"""
      s"""
      WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
      counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
      buckets AS (SELECT tok, cnt, j, $bucket AS b
        FROM counts, UNNEST(generate_series(0, ${depth - 1})) AS g(j)),
      cells AS (SELECT j, b, SUM(cnt) AS cell FROM buckets GROUP BY j, b),
      top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT $k)
      SELECT t.tok, t.cnt, CAST(MIN(c.cell) AS BIGINT) AS cms_est
      FROM top t JOIN buckets bu USING (tok) JOIN cells c ON c.j = bu.j AND c.b = bu.b
      GROUP BY t.tok, t.cnt"""
    }
    val rnd = new scala.util.Random(0xc35f00dL)
    for (_ <- 0 until 6) {
      val depth = 1 + rnd.nextInt(6)
      val width = 1 << (rnd.nextInt(10) + 1) // 2..1024
      val k = 3 + rnd.nextInt(25)
      val got = graft.pipeline.TextAnalysis
        .heavyHittersCms(docs, "text", k, depth, width)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val rs = duck.createStatement().executeQuery(cmsSql(depth, width, k))
      val want = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"cms diverged at depth=$depth width=$width k=$k")
      assert(got.nonEmpty && got.forall { case (_, cnt, est) => est >= cnt },
        s"cms invariant broken at depth=$depth width=$width k=$k")
    }
  }

  test("rebuild fuzz: randomized chunk/span removal params match the SQL template") {
    // generalizes d18's fixed (w=8, maxDf=2) and d20's fixed
    // (k=6, minOccurs=2): the chunking arithmetic, df/occurrence
    // thresholds, and ordered reassembly must agree with the SQL
    // template at every parameterization — rebuilt TEXT compared
    // exactly, not just counts.
    duck.createStatement().execute(
      s"""CREATE OR REPLACE VIEW documents AS
          SELECT * FROM read_parquet('$sf/documents.parquet')""")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def chunkSql(w: Int, maxDf: Int) = s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      ch AS (SELECT doc_id, c, array_to_string(ts[c*$w+1 : c*$w+$w], ' ') AS chunk
             FROM toks, UNNEST(generate_series(0, (len(ts)-1)//$w)) AS u(c)),
      df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
      keep AS (SELECT doc_id, c, chunk FROM ch JOIN df USING (chunk) WHERE df <= $maxDf)
      SELECT t.doc_id AS id,
        COALESCE(string_agg(k.chunk, ' ' ORDER BY k.c), '') AS text_kept,
        CAST(COUNT(k.c) AS BIGINT) AS n_kept
      FROM toks t LEFT JOIN keep k USING (doc_id)
      GROUP BY t.doc_id"""
    def spanSql(k: Int, minOccurs: Int) = s"""
      WITH toks AS (SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
             FROM documents),
      wins AS (SELECT doc_id, i, md5(array_to_string(ts[i:i+${k - 1}], ' ')) AS w
             FROM toks, UNNEST(generate_series(1, len(ts) - ${k - 1})) AS u(i)
             WHERE len(ts) >= $k),
      dup AS (SELECT doc_id, i FROM (
             SELECT doc_id, i, COUNT(*) OVER (PARTITION BY w) AS cnt FROM wins)
             WHERE cnt >= $minOccurs),
      cov AS (SELECT DISTINCT doc_id, i + j AS p
             FROM dup, UNNEST(generate_series(0, ${k - 1})) AS g(j)),
      pos AS (SELECT doc_id, p, ts[p] AS tok
             FROM toks, UNNEST(generate_series(1, len(ts))) AS u(p)),
      kept AS (SELECT pos.doc_id, pos.p, pos.tok
             FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
             WHERE cov.p IS NULL)
      SELECT t.doc_id AS id,
        COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '') AS text_kept,
        CAST(COUNT(k.p) AS BIGINT) AS n_kept
      FROM toks t LEFT JOIN kept k USING (doc_id)
      GROUP BY t.doc_id"""
    def run(sql: String): Map[Long, (String, Long)] = {
      val rs = duck.createStatement().executeQuery(sql)
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3)))).toMap
    }
    val rnd = new scala.util.Random(0xd18d20L)
    for (trial <- 0 until 4) {
      val w = 2 + rnd.nextInt(12)
      val maxDf = 1 + rnd.nextInt(4)
      val gotC = graft.pipeline.Dedup
        .dropCommonChunks(docs, "text", "doc_id", w, maxDf.toLong)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
      assert(gotC == run(chunkSql(w, maxDf)),
        s"trial $trial: chunk removal diverged at w=$w maxDf=$maxDf")
      val k = 2 + rnd.nextInt(8)
      val minOccurs = 2 + rnd.nextInt(3)
      val gotS = graft.pipeline.Dedup
        .dropDuplicatedSpans(docs, "text", "doc_id", k, minOccurs,
          keyer = org.apache.spark.sql.functions.md5(_))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
      assert(gotS == run(spanSql(k, minOccurs)),
        s"trial $trial: span removal diverged at k=$k minOccurs=$minOccurs")
    }
  }
}
