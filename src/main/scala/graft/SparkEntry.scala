package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sqlcompat.{CompatFunctions, RecursiveCte, SqlRewrite}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry demonstrates one operator class from SURVEY.md §2 (the
  * DataFusion-45 SQL surface reached through the reference's single
  * delegation point, `lib/src/context/session.rs:658-673`) or one of
  * the north-star LLM-pipeline operators. Each SQL-expressible entry
  * carries a DuckDB oracle with IDENTICAL column names and ordering.
  *
  * Numeric policy for hash-exact oracle matches:
  *  - additive aggregates go through exact DECIMAL arithmetic and are
  *    cast to DOUBLE only at the end (order-independent, bit-exact in
  *    both engines);
  *  - pass-through doubles are untouched;
  *  - genuinely floating aggregations (stddev/corr) are rounded;
  *  - array folds use sequential `aggregate` (deterministic order).
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // exact-decimal casts sized to the data (FIXTURES.md §B ranges)
  private def dQty(c: Column) = c.cast(DecimalType(4, 1))   // 1.0..50.0
  private def dPrice(c: Column) = c.cast(DecimalType(9, 2)) // < 1e7
  private def dRate(c: Column) = c.cast(DecimalType(3, 2))  // 0.00..0.10
  private val one = lit(1).cast(DecimalType(3, 2))

  private case class Q(name: String, oracle: Option[String],
      fn: (SparkSession, String) => DataFrame)

  // Combining marks for the t41 NFC fixture, kept as escapes in ONE
  // place so the engine input and the oracle SQL are built from the
  // same codepoints (raw combining chars in source invite editor
  // normalization corrupting exactly the thing under test).
  private val CombAcute = "\u0301"
  private val CombRing = "\u030A"
  private val CombCedilla = "\u0327"
  private val CombCirc = "\u0302"

  // ================================================================
  // Core SQL surface (SURVEY §2.B)
  // ================================================================

  private val q01 = Q("q01_pricing_summary", Some("""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) => T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-06-30 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dQty(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dPrice(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dPrice(col("l_extendedprice")) * (one - dRate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dPrice(col("l_extendedprice")) * (one - dRate(col("l_discount"))) *
          (one + dRate(col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")))

  private val q02 = Q("q02_filter_project", Some("""
    SELECT o_orderkey, o_totalprice, UPPER(o_orderpriority) AS prio
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 150000
      AND o_orderstatus IN ('F','O') AND o_orderpriority LIKE '%URGENT%'
    ORDER BY o_orderkey"""),
    (s, dir) => T(s, dir, "orders")
      .filter(col("o_totalprice").between(100000, 150000) &&
        col("o_orderstatus").isin("F", "O") &&
        col("o_orderpriority").like("%URGENT%"))
      .select(col("o_orderkey"), col("o_totalprice"),
        upper(col("o_orderpriority")).as("prio"))
      .orderBy(col("o_orderkey")))

  private val q03 = Q("q03_join_revenue_by_nation", Some("""
    SELECT r_name, n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""),
    (s, dir) => {
      val c = T(s, dir, "customer"); val o = T(s, dir, "orders")
      val n = T(s, dir, "nation"); val r = T(s, dir, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dPrice(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    })

  private val q04 = Q("q04_left_join_agg", Some("""
    SELECT n_name, COUNT(c_custkey) AS n_customers,
      CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(9,2))), 0) AS DOUBLE) AS total_bal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name ORDER BY n_name"""),
    (s, dir) => {
      val n = T(s, dir, "nation"); val c = T(s, dir, "customer")
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"),
          coalesce(sum(dPrice(col("c_acctbal"))), lit(0).cast(DecimalType(9, 2)))
            .cast("double").as("total_bal"))
        .orderBy(col("n_name"))
    })

  private val q05 = Q("q05_anti_join", Some("""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""),
    (s, dir) => T(s, dir, "customer")
      .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")))

  private val q06 = Q("q06_window_topn", Some("""
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey)
    WHERE rn <= 3 ORDER BY c_mktsegment, rn"""),
    (s, dir) => {
      val c = T(s, dir, "customer"); val o = T(s, dir, "orders")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy(col("c_mktsegment"), col("rn"))
    })

  private val q07 = Q("q07_window_running", Some("""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      CAST(SUM(CAST(l_quantity AS DECIMAL(4,1))) OVER (
        PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty,
      LAG(l_quantity) OVER (
        PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty
    FROM lineitem WHERE l_suppkey < 5
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""),
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      T(s, dir, "lineitem").filter(col("l_suppkey") < 5)
        .withColumn("run_qty", sum(dQty(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
        .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("run_qty"), col("prev_qty"))
    })

  private val q08 = Q("q08_topk", Some("""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""),
    (s, dir) => T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100))

  private val q09 = Q("q09_set_ops", Some("""
    SELECT o_custkey, 'both' AS op FROM
      (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
       INTERSECT
       SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1999)
    UNION ALL
    SELECT o_custkey, 'only_1998' AS op FROM
      (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
       EXCEPT
       SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1999)
    ORDER BY op, o_custkey"""),
    (s, dir) => {
      val o = T(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey")).distinct()
      val b = o.filter(year(col("o_orderdate")) === 1999).select(col("o_custkey")).distinct()
      a.intersect(b).withColumn("op", lit("both"))
        .union(a.except(b).withColumn("op", lit("only_1998")))
        .orderBy(col("op"), col("o_custkey"))
    })

  private val q10 = Q("q10_distinct", Some("""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) => T(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")))

  private val q11 = Q("q11_rollup", Some("""
    SELECT COALESCE(r_name, 'ALL') AS r_grp, COALESCE(n_name, 'ALL') AS n_grp,
      COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY r_grp, n_grp"""),
    (s, dir) => {
      val c = T(s, dir, "customer"); val n = T(s, dir, "nation"); val r = T(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_grp"),
          coalesce(col("n_name"), lit("ALL")).as("n_grp"),
          col("n_customers"))
        .orderBy(col("r_grp"), col("n_grp"))
    })

  private val q12 = Q("q12_having", Some("""
    SELECT p_brand, COUNT(*) AS n_parts,
      MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price
    FROM part GROUP BY p_brand HAVING COUNT(*) > 75
    ORDER BY p_brand"""),
    (s, dir) => T(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"))
      .filter(col("n_parts") > 75)
      .orderBy(col("p_brand")))

  private val q13 = Q("q13_scalar_subquery", Some("""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.95
    ORDER BY o_orderkey"""),
    (s, dir) => {
      val o = T(s, dir, "orders")
      val m = o.agg(max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(m))
        .filter(col("o_totalprice") > col("mx") * 0.95)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    })

  private val q14 = Q("q14_semi_join", Some("""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity >= 49.5)
    ORDER BY s_suppkey"""),
    (s, dir) => T(s, dir, "supplier")
      .join(T(s, dir, "lineitem").filter(col("l_quantity") >= 49.5),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey")))

  private val q15 = Q("q15_cte_top_supplier", Some("""
    WITH rev AS (
      SELECT l_suppkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey"""),
    (s, dir) => {
      val rev = T(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(dPrice(col("l_extendedprice")) * (one - dRate(col("l_discount"))))
          .cast("double").as("total_rev"))
      // Spark inlines CTEs, so `rev` referenced twice (join + MAX
      // subquery) would aggregate lineitem twice — cache the
      // per-supplier frame instead. The MAX reduces it to one row
      // broadcast back (an empty-partition window would funnel every
      // supplier through a single task at scale). Query-scoped cache
      // (the server contract — released after the one execution).
      val revC = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(rev)
      val mx = revC.agg(max(col("total_rev")).as("mx"))
      T(s, dir, "supplier")
        .join(revC, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    })

  private val q16 = Q("q16_case_conditional", Some("""
    SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'debt'
           WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
      GREATEST(c_acctbal, 0.0) AS pos_bal,
      LEAST(c_acctbal, 0.0) AS neg_bal
    FROM customer ORDER BY c_custkey"""),
    (s, dir) => T(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("bal_bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
        least(col("c_acctbal"), lit(0.0)).as("neg_bal"))
      .orderBy(col("c_custkey")))

  private val q17 = Q("q17_string_funcs", Some("""
    SELECT p_partkey,
      UPPER(p_name) AS uname,
      SUBSTRING(p_name, 1, 5) AS pfx,
      CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      REPLACE(p_name, ' ', '_') AS snake,
      LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded,
      CONCAT_WS('|', p_brand, p_type) AS tag,
      SPLIT_PART(p_name, ' ', 1) AS first_word,
      CAST(STRPOS(p_name, 'e') AS BIGINT) AS e_pos,
      STARTS_WITH(p_name, 'red') AS is_red
    FROM part ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        replace(col("p_name"), lit(" "), lit("_")).as("snake"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        instr(col("p_name"), "e").cast("long").as("e_pos"),
        col("p_name").startsWith("red").as("is_red"))
      .orderBy(col("p_partkey")))

  private val q18 = Q("q18_regex", Some("""
    SELECT doc_id,
      CAST(REGEXP_EXTRACT(source, '([a-z]+)([0-9]+)', 2) AS BIGINT) AS src_num,
      CAST(LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS BIGINT) AS devoweled_len
    FROM documents
    WHERE REGEXP_MATCHES(text, ' spark ')
    ORDER BY doc_id"""),
    (s, dir) => T(s, dir, "documents")
      .filter(col("text").rlike(" spark "))
      .select(col("doc_id"),
        regexp_extract(col("source"), "([a-z]+)([0-9]+)", 2).cast("long").as("src_num"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("devoweled_len"))
      .orderBy(col("doc_id")))

  private val q19 = Q("q19_math_funcs", Some("""
    SELECT p_partkey,
      ABS(p_retailprice - 1000) AS abs_diff,
      CAST(CEIL(p_retailprice) AS DOUBLE) AS ceil_price,
      CAST(FLOOR(p_retailprice) AS DOUBLE) AS floor_price,
      SQRT(p_retailprice) AS sqrt_price,
      ROUND(LN(p_retailprice), 6) AS ln_price,
      CAST(p_size % 7 AS BIGINT) AS size_mod,
      CAST(SIGN(p_retailprice - 1000) AS BIGINT) AS price_sign,
      POWER(p_size, 2) AS size_sq
    FROM part ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .select(col("p_partkey"),
        abs(col("p_retailprice") - 1000).as("abs_diff"),
        ceil(col("p_retailprice")).cast("double").as("ceil_price"),
        floor(col("p_retailprice")).cast("double").as("floor_price"),
        sqrt(col("p_retailprice")).as("sqrt_price"),
        round(log(col("p_retailprice")), 6).as("ln_price"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        signum(col("p_retailprice") - 1000).cast("long").as("price_sign"),
        pow(col("p_size"), 2).as("size_sq"))
      .orderBy(col("p_partkey")))

  private val q20 = Q("q20_datetime", Some("""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mth,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY month_start, yr, mth
    ORDER BY month_start"""),
    (s, dir) => T(s, dir, "orders")
      .groupBy(
        // timestamp_ntz: match the oracle's naive TIMESTAMP rendering
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dPrice(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("month_start")))

  private val q21 = Q("q21_date_bin", Some("""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bin,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY bin ORDER BY bin"""),
    (s, dir) => Tables.events(s, dir)
      .groupBy(CompatFunctions.dateBin(900, col("ts")).cast("timestamp_ntz").as("bin"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(8, 2))).cast("double").as("sum_value"))
      .orderBy(col("bin")))

  private val q22 = Q("q22_interval_arith", Some("""
    SELECT o_orderkey, o_orderdate,
      o_orderdate + INTERVAL 30 DAY AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
    ORDER BY o_orderkey"""),
    (s, dir) => T(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-06-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"))
      .orderBy(col("o_orderkey")))

  private val q23 = Q("q23_array_funcs", Some("""
    SELECT vec_id,
      CAST(len(embedding) AS BIGINT) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_elem,
      CAST(list_min(embedding) AS DOUBLE) AS min_elem,
      CAST(list_max(embedding) AS DOUBLE) AS max_elem,
      CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head_sum,
      list_contains(list_transform(embedding, x -> x > 0.25), true) AS has_big
    FROM embeddings ORDER BY vec_id"""),
    (s, dir) => T(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        array_min(col("embedding")).cast("double").as("min_elem"),
        array_max(col("embedding")).cast("double").as("max_elem"),
        (element_at(col("embedding"), 1).cast("double") +
          element_at(col("embedding"), 2).cast("double") +
          element_at(col("embedding"), 3).cast("double") +
          element_at(col("embedding"), 4).cast("double")).as("head_sum"),
        exists(col("embedding"), x => x > 0.25f).as("has_big"))
      .orderBy(col("vec_id")))

  private val q24 = Q("q24_explode_tokens", Some("""
    SELECT tok, COUNT(*) AS n FROM
      (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""),
    (s, dir) => T(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20))

  private val q25 = Q("q25_json_funcs", Some("""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k ORDER BY k"""),
    (s, dir) => Tables.events(s, dir)
      .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(8, 2))).cast("double").as("sum_value"))
      .orderBy(col("k")))

  private val q26 = Q("q26_pivot", Some("""
    SELECT o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (s, dir) => T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority")))

  // UNPIVOT/melt (the inverse of q26's pivot): wide int metrics to
  // (id, metric, value) long form via Spark's native unpivot
  // operator. The oracle spells the identical relation as UNION ALL
  // (portable ANSI; DuckDB's UNPIVOT keyword reorders rows, and the
  // semantics are exactly this union).
  private val q67 = Q("q67_unpivot", Some("""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_partkey' AS metric,
             CAST(l_partkey AS BIGINT) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_suppkey', CAST(l_suppkey AS BIGINT)
      FROM lineitem)
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber, metric"""),
    (s, dir) => T(s, dir, "lineitem")
      .where(col("l_orderkey") <= 100)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_partkey").cast("long").as("l_partkey"),
          col("l_suppkey").cast("long").as("l_suppkey")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")))

  private val q27 = Q("q27_stats_aggs", Some("""
    SELECT l_returnflag,
      ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
      ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
      ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) => T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
      .orderBy(col("l_returnflag")))

  private val groupingSetsSql = """
    SELECT COALESCE(r_name, 'ALL') AS r_grp, COALESCE(n_name, 'ALL') AS n_grp,
      COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())
    ORDER BY r_grp, n_grp"""

  private val q28 = Q("q28_grouping_sets", Some(groupingSetsSql),
    (s, dir) => {
      registerViews(s, dir, "customer", "nation", "region")
      s.sql(groupingSetsSql)
    })

  private val q29 = Q("q29_merge_column", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey"""),
    (s, dir) => {
      import graft.ops.MergeProcessor
      val base = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val tgt = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      MergeProcessor.mergeColumns(base,
        Seq(MergeProcessor.ColumnTarget("customer", tgt,
          baseKeys = Seq("o_custkey"), targetKeys = Seq("c_custkey"))))
        .orderBy(col("o_orderkey"))
    })

  private val q30 = Q("q30_merge_row", Some("""
    SELECT * FROM (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000)
    ORDER BY o_orderkey, o_totalprice"""),
    (s, dir) => {
      import graft.ops.MergeProcessor
      val o = T(s, dir, "orders")
      MergeProcessor.mergeRows(
        o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"), col("o_totalprice")),
        Seq(o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"), col("o_totalprice"))),
        distinct = false)
        .orderBy(col("o_orderkey"), col("o_totalprice"))
    })

  private val q31 = Q("q31_distinct_on", Some("""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey"""),
    (s, dir) => {
      registerViews(s, dir, "orders")
      // DataFusion-dialect DISTINCT ON → our compat rewrite → spark.sql
      val sql = """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
        FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey"""
      s.sql(SqlRewrite.rewrite(sql)).orderBy(col("o_custkey"))
    })

  private val aggFilterSql = """
    SELECT l_returnflag,
      COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
      CAST(SUM(CAST(l_quantity AS DECIMAL(4,1))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  private val q32 = Q("q32_agg_filter", Some(aggFilterSql),
    (s, dir) => {
      registerViews(s, dir, "lineitem")
      s.sql(aggFilterSql)
    })

  private val q33 = Q("q33_approx_aggs", None, // HLL/KLL sketches differ per engine
    (s, dir) => T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median_price"))
      .orderBy(col("l_returnflag")))

  private val q34 = Q("q34_sqlcompat_dialect", Some("""
    SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str,
      CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos,
      time_bucket(INTERVAL '1 day', o_orderdate) AS day_bin,
      sha256(o_orderpriority) AS prio_sha
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"""),
    (s, dir) => {
      registerViews(s, dir, "orders")
      CompatFunctions.registerAll(s)
      // DataFusion dialect: `::` postfix cast, strpos, date_bin, sha256
      val sql = """SELECT o_orderkey, o_orderkey::STRING AS key_str,
        CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos,
        CAST(date_bin(86400, o_orderdate) AS TIMESTAMP_NTZ) AS day_bin,
        sha256(o_orderpriority) AS prio_sha
        FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"""
      s.sql(SqlRewrite.rewrite(sql))
    })

  private val q35 = Q("q35_list_aggs", Some("""
    SELECT l_returnflag,
      array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS status_agg
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) => T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        array_join(array_sort(collect_set(col("l_linestatus"))), "|").as("status_agg"))
      .orderBy(col("l_returnflag")))

  private val q36 = Q("q36_unnest_rewrite", Some("""
    SELECT w AS word, count(*) AS n FROM (
      SELECT UNNEST(string_split(p_type, ' ')) AS w FROM part)
    GROUP BY w ORDER BY n DESC, w LIMIT 5"""),
    (s, dir) => {
      registerViews(s, dir, "part")
      // DataFusion select-list UNNEST → rewritten to explode
      s.sql(SqlRewrite.rewrite("""
        SELECT w AS word, count(*) AS n FROM (
          SELECT UNNEST(split(p_type, ' ')) AS w FROM part)
        GROUP BY w ORDER BY n DESC, w LIMIT 5"""))
    })

  private val q37 = Q("q37_values_inline", Some("""
    SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(id, name)
    ORDER BY id"""),
    (s, dir) => s.sql(
      "SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(id, name) ORDER BY id"))

  private val q38 = Q("q38_string_funcs2", Some("""
    SELECT p_partkey,
      CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
      translate(p_type, 'aeiou', 'AEIOU') AS caps_vowels,
      repeat(p_brand, 2) AS brand2,
      reverse(p_name) AS rname,
      CAST(ascii(p_name) AS BIGINT) AS first_code,
      chr(65 + p_size % 26) AS size_chr,
      left(p_name, 3) AS l3, right(p_name, 3) AS r3,
      upper(left(p_name, 1)) || substring(p_name, 2) AS ucfirst_name
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
        translate(col("p_type"), "aeiou", "AEIOU").as("caps_vowels"),
        repeat(col("p_brand"), 2).as("brand2"),
        reverse(col("p_name")).as("rname"),
        ascii(col("p_name")).cast("long").as("first_code"),
        chr(lit(65) + col("p_size") % 26).as("size_chr"),
        substring(col("p_name"), 1, 3).as("l3"),
        col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("r3"),
        concat(upper(substring(col("p_name"), 1, 1)),
          expr("substring(p_name, 2)")).as("ucfirst_name"))
      .orderBy(col("p_partkey")))

  private val q39 = Q("q39_datetime_funcs2", Some("""
    SELECT o_orderkey,
      CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      o_orderdate + INTERVAL 1 MONTH AS next_month,
      make_date(2000, CAST(o_orderkey % 12 + 1 AS INT), 15) AS synth_date,
      CAST(to_timestamp(o_orderkey * 1000) AS TIMESTAMP) AS from_epoch
    FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey"""),
    (s, dir) => T(s, dir, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
        (col("o_orderdate") + expr("INTERVAL 1 MONTH")).as("next_month"),
        make_date(lit(2000), (col("o_orderkey") % 12 + 1).cast("int"), lit(15)).as("synth_date"),
        timestamp_seconds(col("o_orderkey") * 1000).cast("timestamp_ntz").as("from_epoch"))
      .orderBy(col("o_orderkey")))

  private val q41 = Q("q41_bit_bool_aggs", Some("""
    SELECT l_returnflag,
      CAST(bit_and(l_partkey) AS BIGINT) AS band,
      CAST(bit_or(l_partkey) AS BIGINT) AS bor,
      CAST(bit_xor(l_partkey) AS BIGINT) AS bxor,
      bool_and(l_quantity > 0) AS all_pos,
      bool_or(l_quantity > 49) AS any_big
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) => T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_partkey")).cast("long").as("band"),
        bit_or(col("l_partkey")).cast("long").as("bor"),
        bit_xor(col("l_partkey")).cast("long").as("bxor"),
        bool_and(col("l_quantity") > 0).as("all_pos"),
        bool_or(col("l_quantity") > 49).as("any_big"))
      .orderBy(col("l_returnflag")))

  private val q40 = Q("q40_struct_funcs", Some("""
    SELECT p_partkey,
      struct_pack(sz := p_size, brand := p_brand).sz AS s_size,
      struct_pack(sz := p_size, brand := p_brand).brand AS s_brand,
      CAST(struct_pack(a := p_size).a + 1 AS BIGINT) AS nested_calc
    FROM part WHERE p_partkey <= 400 ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .filter(col("p_partkey") <= 400)
      .select(col("p_partkey"),
        struct(col("p_size").as("sz"), col("p_brand").as("brand")).getField("sz").as("s_size"),
        struct(col("p_size").as("sz"), col("p_brand").as("brand")).getField("brand").as("s_brand"),
        (struct(col("p_size").as("a")).getField("a") + 1).cast("long").as("nested_calc"))
      .orderBy(col("p_partkey")))

  private val q42 = Q("q42_map_funcs", Some("""
    SELECT p_partkey,
      map(['brand'], [p_brand])['brand'][1] AS m_brand,
      CAST(cardinality(map(['a','b'], [p_size, p_size*2])) AS BIGINT) AS n_keys,
      map(['a','b'], [p_size, p_size*2])['b'][1] AS twice
    FROM part WHERE p_partkey <= 300 ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .filter(col("p_partkey") <= 300)
      .select(col("p_partkey"),
        element_at(map(lit("brand"), col("p_brand")), "brand").as("m_brand"),
        size(map(lit("a"), col("p_size"), lit("b"), col("p_size") * 2))
          .cast("long").as("n_keys"),
        element_at(map(lit("a"), col("p_size"), lit("b"), col("p_size") * 2), "b").as("twice"))
      .orderBy(col("p_partkey")))

  private val q43 = Q("q43_window_frames_ranks", Some("""
    SELECT l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(4,1))) OVER (
        PARTITION BY l_returnflag ORDER BY l_extendedprice
        RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS DOUBLE) AS range_qty,
      ROUND(PERCENT_RANK() OVER w, 6) AS pr,
      ROUND(CUME_DIST() OVER w, 6) AS cd,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
    FROM lineitem WHERE l_suppkey < 3
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => {
      val base = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val range = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice")).rangeBetween(-100, 100)
      T(s, dir, "lineitem").filter(col("l_suppkey") < 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(dQty(col("l_quantity"))).over(range).cast("double").as("range_qty"),
          round(percent_rank().over(base), 6).as("pr"),
          round(cume_dist().over(base), 6).as("cd"),
          ntile(4).over(base).cast("long").as("quartile"),
          dense_rank().over(base).cast("long").as("drank"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })

  private val q44 = Q("q44_correlated_subquery", Some("""
    SELECT c_custkey,
      (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders WHERE o_custkey = c_custkey) AS max_price
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""),
    (s, dir) => {
      registerViews(s, dir, "customer", "orders")
      s.sql("""
        SELECT c_custkey,
          (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""")
    })

  private val q45 = Q("q45_set_ops_all", Some("""
    SELECT v, 'intersect_all' AS op FROM (
      SELECT l_suppkey AS v FROM lineitem WHERE l_quantity > 45
      INTERSECT ALL
      SELECT l_suppkey AS v FROM lineitem WHERE l_discount = 0)
    UNION ALL
    SELECT v, 'except_all' AS op FROM (
      SELECT l_suppkey AS v FROM lineitem WHERE l_quantity > 48
      EXCEPT ALL
      SELECT l_suppkey AS v FROM lineitem WHERE l_discount = 0 AND l_quantity > 48)
    ORDER BY op, v"""),
    (s, dir) => {
      val l = T(s, dir, "lineitem")
      val a = l.filter(col("l_quantity") > 45).select(col("l_suppkey").as("v"))
      val b = l.filter(col("l_discount") === 0).select(col("l_suppkey").as("v"))
      val c = l.filter(col("l_quantity") > 48).select(col("l_suppkey").as("v"))
      val d = l.filter(col("l_discount") === 0 && col("l_quantity") > 48)
        .select(col("l_suppkey").as("v"))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .union(c.exceptAll(d).withColumn("op", lit("except_all")))
        .orderBy(col("op"), col("v"))
    })

  private val q46 = Q("q46_lateral_join", Some("""
    SELECT n_name, top_bal FROM nation,
      LATERAL (SELECT MAX(c_acctbal) AS top_bal FROM customer
               WHERE c_nationkey = n_nationkey) t
    ORDER BY n_name"""),
    (s, dir) => {
      registerViews(s, dir, "nation", "customer")
      s.sql("""
        SELECT n_name, top_bal FROM nation,
          LATERAL (SELECT MAX(c_acctbal) AS top_bal FROM customer
                   WHERE c_nationkey = n_nationkey) t
        ORDER BY n_name""")
    })

  private val inSubquerySql = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49)
      AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity <= 1.5)
    ORDER BY s_suppkey"""

  private val q49 = Q("q49_in_subqueries", Some(inSubquerySql),
    (s, dir) => {
      registerViews(s, dir, "supplier", "lineitem")
      s.sql(inSubquerySql)
    })

  private val usingJoinSql = """
    SELECT n_name, r_name FROM
      (SELECT n_name, n_regionkey AS r_regionkey FROM nation) n
      JOIN region USING (r_regionkey)
    ORDER BY n_name"""

  private val q50 = Q("q50_using_join", Some(usingJoinSql),
    (s, dir) => {
      registerViews(s, dir, "nation", "region")
      s.sql(usingJoinSql)
    })

  // WITH RECURSIVE (DataFusion supports it, Spark ≤4.1 does not):
  // executed by the driver-side fixpoint loop in RecursiveCte; the
  // oracle runs DuckDB's native recursive CTE. The band boundaries
  // accumulate 0.02 steps in double — the identical IEEE sequence in
  // both engines, so the non-equi band join is bit-deterministic.
  private val recursiveSql = """
    WITH RECURSIVE bands(band, lo) AS (
      SELECT 0, CAST(0.0 AS DOUBLE)
      UNION ALL
      SELECT band + 1, lo + 0.02 FROM bands WHERE band < 4
    )
    SELECT band, lo, COUNT(l_orderkey) AS n_items
    FROM bands LEFT JOIN lineitem
      ON l_discount >= lo AND l_discount < lo + 0.02
    GROUP BY band, lo ORDER BY band"""

  private val q51 = Q("q51_recursive_cte", Some(recursiveSql),
    (s, dir) => {
      registerViews(s, dir, "lineitem")
      RecursiveCte.execute(s, recursiveSql)
    })

  private val q52 = Q("q52_hash_encode", Some("""
    SELECT c_custkey,
      md5(c_name) AS name_md5,
      sha256(c_name) AS name_sha256,
      lower(to_hex(c_custkey)) AS key_hex,
      to_base64(CAST(c_name AS BLOB)) AS name_b64,
      CAST(bit_length(c_name) AS BIGINT) AS bits,
      CAST(octet_length(CAST(c_name AS BLOB)) AS BIGINT) AS octets
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""),
    (s, dir) => T(s, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256"),
        lower(hex(col("c_custkey"))).as("key_hex"),
        base64(col("c_name").cast("binary")).as("name_b64"),
        bit_length(col("c_name")).cast("long").as("bits"),
        octet_length(col("c_name")).cast("long").as("octets"))
      .orderBy(col("c_custkey")))

  private val q53 = Q("q53_math_funcs2", Some("""
    SELECT p_partkey,
      ROUND(SIN(p_retailprice), 6) AS sin_p,
      ROUND(COS(p_retailprice), 6) AS cos_p,
      ROUND(ATAN2(p_size, 7), 6) AS at2,
      ROUND(DEGREES(p_retailprice / 1000), 6) AS deg,
      ROUND(RADIANS(p_size), 6) AS rad,
      CAST(FACTORIAL(p_size % 10) AS BIGINT) AS fact,
      ROUND(CBRT(p_retailprice), 6) AS cbrt_p,
      ROUND(LOG10(p_retailprice), 6) AS lg10,
      ROUND(LOG2(p_retailprice), 6) AS lg2,
      GREATEST(p_size, 25) AS gmax,
      LEAST(p_size, 25) AS lmin
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey"""),
    (s, dir) => T(s, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        round(sin(col("p_retailprice")), 6).as("sin_p"),
        round(cos(col("p_retailprice")), 6).as("cos_p"),
        round(atan2(col("p_size"), lit(7)), 6).as("at2"),
        round(degrees(col("p_retailprice") / 1000), 6).as("deg"),
        round(radians(col("p_size")), 6).as("rad"),
        factorial(col("p_size") % 10).cast("long").as("fact"),
        round(cbrt(col("p_retailprice")), 6).as("cbrt_p"),
        round(log10(col("p_retailprice")), 6).as("lg10"),
        round(log2(col("p_retailprice")), 6).as("lg2"),
        greatest(col("p_size"), lit(25)).as("gmax"),
        least(col("p_size"), lit(25)).as("lmin"))
      .orderBy(col("p_partkey")))

  // GROUPS window frame (SQL:2011; in DataFusion, not in Spark ≤4.1
  // or DuckDB): emulated on BOTH sides via the dense_rank/RANGE
  // equivalence — peer groups of l_quantity within each return flag,
  // frame = current group ±1 group (ops/WindowOps.groupsBetween).
  private val q55 = Q("q55_groups_frames", Some("""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
      FROM lineitem WHERE l_orderkey <= 400),
    g AS (
      SELECT l_returnflag, dr, COUNT(*) AS cnt,
        SUM(CAST(l_quantity AS DECIMAL(4,1))) AS qsum
      FROM base GROUP BY l_returnflag, dr),
    f AS (
      SELECT l_returnflag, dr,
        CAST(SUM(cnt) OVER w AS BIGINT) AS frame_n,
        CAST(SUM(qsum) OVER w AS DOUBLE) AS frame_qty
      FROM g
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY dr
        RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING))
    SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag, b.l_quantity,
      f.frame_n, f.frame_qty
    FROM base b JOIN f USING (l_returnflag, dr)
    ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => {
      // submitted THROUGH the SQL-text door in DataFusion's GROUPS
      // spelling: SqlRewrite.rewriteGroupsFrames restructures it into
      // the dense_rank/RANGE equivalence (WindowOps.groupsBetween is
      // the DataFrame-level twin, spec-tested equal in WindowOpsSpec)
      registerViews(s, dir, "lineitem")
      s.sql(SqlRewrite.rewrite("""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
          CAST(COUNT(*) OVER w AS BIGINT) AS frame_n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(4,1))) OVER w AS DOUBLE) AS frame_qty
        FROM lineitem WHERE l_orderkey <= 400
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
          GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        ORDER BY l_orderkey, l_linenumber"""))
    })

  // AT TIME ZONE (DataFusion datetime surface): UTC instants rendered
  // as Tokyo / New York wall clock. Spark: from_utc_timestamp; DuckDB
  // oracle: naive AT TIME ZONE 'UTC' (attach) AT TIME ZONE tz (shift).
  private val q56 = Q("q56_at_time_zone", Some("""
    SELECT event_id,
      CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP) AS tokyo_ts,
      CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS ny_ts
    FROM events WHERE event_id <= 300 ORDER BY event_id"""),
    (s, dir) => Tables.events(s, dir)
      .filter(col("event_id") <= 300)
      .select(col("event_id"),
        from_utc_timestamp(col("ts"), "Asia/Tokyo").cast("timestamp_ntz").as("tokyo_ts"),
        from_utc_timestamp(col("ts"), "America/New_York").cast("timestamp_ntz").as("ny_ts"))
      .orderBy(col("event_id")))

  private val q54 = Q("q54_generate_series", Some("""
    SELECT p_partkey, CAST(unnest(generate_series(1, p_size % 5 + 1)) AS BIGINT) AS i
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey, i"""),
    (s, dir) => T(s, dir, "part")
      .filter(col("p_partkey") <= 100)
      .select(col("p_partkey"),
        explode(sequence(lit(1), col("p_size") % 5 + 1)).as("i"))
      .select(col("p_partkey"), col("i").cast("long").as("i"))
      .orderBy(col("p_partkey"), col("i")))

  private val cubeSql = """
    SELECT COALESCE(l_returnflag, '*') AS rf, COALESCE(l_linestatus, '*') AS ls,
      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY rf, ls"""

  private val q47 = Q("q47_cube_grouping", Some(cubeSql),
    (s, dir) => { registerViews(s, dir, "lineitem"); s.sql(cubeSql) })

  private val q48 = Q("q48_window_value_fns", Some("""
    SELECT l_orderkey, l_linenumber,
      FIRST_VALUE(l_quantity) OVER w AS first_qty,
      LAST_VALUE(l_quantity) OVER (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty,
      NTH_VALUE(l_quantity, 2) OVER w AS second_qty,
      LEAD(l_quantity, 1) OVER w AS next_qty
    FROM lineitem WHERE l_suppkey < 3
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "lineitem").filter(col("l_suppkey") < 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("l_quantity")).over(w).as("first_qty"),
          last(col("l_quantity")).over(full).as("last_qty"),
          nth_value(col("l_quantity"), 2).over(w).as("second_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })

  // ================================================================
  // LLM-pipeline operators (north star): dedup / similarity / text /
  // multimodal
  // ================================================================

  private val d01 = Q("d01_dedup_exact", Some("""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      COUNT(*) AS group_size, MIN(doc_id) AS keep_id
    FROM documents GROUP BY fp ORDER BY keep_id"""),
    (s, dir) => Dedup.exactGroups(T(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("keep_id")))

  // 3-gram shingles + 0.3 threshold: ~25 pairs at sf0.01, ~256 at
  // sf0.1 — the inverted-index join stays near-linear (shared 3-grams
  // are rare outside true near-dups), where 2-grams would generate
  // ~10M candidate pairs at sf0.1.
  private val d02 = Q("d02_dedup_ngram_jaccard", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
        CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b)
    WHERE jaccard >= 0.3 ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.ngramJaccardPairs(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_a"), col("id_b")))

  // Incremental dedup: the "new batch" (doc_id % 10 = 0) against the
  // existing corpus (the rest) — cross pairs only. Same shingle
  // semantics as d02; the corpus side never shuffles text and is
  // scanned once (broadcast new-batch shingles, plan-pinned).
  private val d10 = Q("d10_incremental_neardup", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id, COUNT(*) AS n_inter
              FROM sh n JOIN sh c USING (shingle)
              WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
              GROUP BY 1, 2)
    SELECT new_id, corpus_id, jaccard FROM (
      SELECT new_id, corpus_id,
        CAST(n_inter AS DOUBLE) / CAST(sn.n_sh + sc.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM inter
        JOIN sizes sn ON sn.doc_id = new_id
        JOIN sizes sc ON sc.doc_id = corpus_id)
    WHERE jaccard >= 0.3 ORDER BY new_id, corpus_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.incrementalNearDupPairs(
          docs.where(col("doc_id") % 10 === 0),
          docs.where(col("doc_id") % 10 =!= 0),
          "text", "doc_id", n = 3, threshold = 0.3,
          maxCorpusPostings = None) // exact: oracle-comparable
        .orderBy(col("new_id"), col("corpus_id"))
    })

  private val d03 = Q("d03_dedup_minhash_lsh", None, // xxhash seeds differ per engine
    (s, dir) => Dedup.minHashLsh(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.3)
      .orderBy(col("id_a"), col("id_b")))

  private val d04 = Q("d04_dedup_simhash", None, // xxhash-based signature
    (s, dir) => Dedup.simHash(T(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("id")))

  // Cell-BLOCKED near-dup pairs (the 100 TB path): pair generation
  // routed through k=8 seed-centroid cells, so the oracle
  // reconstructs the identical blocking (d14's assignment CTE) and
  // the all-pairs brute force survives only as the differential
  // ground truth in Round9Spec. τ=0.4: the synthetic 64-dim
  // embeddings are near-orthogonal (max pairwise cosine ≈0.51 at
  // sf0.01) — 0.9 would be vacuously empty.
  private val d05 = Q("d05_embedding_neardup", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_sum(list_transform(generate_series(1, len(ea.embedding)),
          i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
      FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.4
    ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.embeddingNearDupsBlocked(T(s, dir, "embeddings"),
        "embedding", "vec_id", threshold = 0.4, k = 8)
      .orderBy(col("id_a"), col("id_b")))

  // Cluster-level dedup: transitive closure over the exact-Jaccard
  // pair graph (d02's edges), so A~B~C collapses to ONE cluster with
  // one representative. Spark side: hash-min label propagation (one
  // join + one groupBy per round); oracle: DuckDB recursive CTE
  // transitive closure — the distributed iteration must agree with
  // the declarative fixpoint exactly.
  private val d06 = Q("d06_dedup_clusters", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u)
    SELECT doc_id, cluster_rep,
      CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
    FROM comp ORDER BY doc_id"""),
    (s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None) // exact: oracle-comparable
      Dedup.connectedComponents(pairs)
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("component"))).cast("long"))
        .select(col("id").as("doc_id"), col("component").as("cluster_rep"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
    })

  // Dedup APPLIED: the corpus with each near-dup cluster collapsed to
  // its min-id representative (pairs → transitive closure → anti-join)
  // — the frame a training run actually consumes. Oracle = d06's
  // recursive-CTE closure with the non-representatives removed.
  private val d11 = Q("d11_deduped_corpus", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u)
    SELECT d.doc_id, d.source, d.lang FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_rep)
    ORDER BY d.doc_id"""),
    (s, dir) => Dedup.dedupedCorpus(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None) // exact: oracle-comparable
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id")))

  // Directed containment (near-subset) pairs: catches a small doc
  // embedded in a larger one, which Jaccard's union denominator
  // drowns. Both directions of every intersecting pair are scored.
  private val d07 = Q("d07_dedup_containment", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    dir AS (
      SELECT id_a AS id_sub, id_b AS id_super,
        CAST(n_inter AS DOUBLE) / CAST(na.n_sh AS DOUBLE) AS containment
      FROM inter JOIN sizes na ON na.doc_id = id_a
      UNION ALL
      SELECT id_b, id_a,
        CAST(n_inter AS DOUBLE) / CAST(nb.n_sh AS DOUBLE)
      FROM inter JOIN sizes nb ON nb.doc_id = id_b)
    SELECT id_sub, id_super, containment FROM dir
    WHERE containment >= 0.9 ORDER BY id_sub, id_super"""),
    (s, dir) => Dedup.containmentPairs(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.9, maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_sub"), col("id_super")))

  // PREFIX-FILTERED exact containment join — d40's discipline applied
  // to d07's directed semantics: only the SUB side is prefix-indexed
  // (rarity order, pigeonhole-lossless for containment >= tau); the
  // super side keeps full postings. The oracle is the PLAIN exact
  // containment-pair SQL — the hash match IS the losslessness proof.
  private val d41 = Q("d41_prefix_filter_containment", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    dir AS (
      SELECT id_a AS id_sub, id_b AS id_super,
        CAST(n_inter AS DOUBLE) / CAST(na.n_sh AS DOUBLE) AS containment
      FROM inter JOIN sizes na ON na.doc_id = id_a
      UNION ALL
      SELECT id_b, id_a,
        CAST(n_inter AS DOUBLE) / CAST(nb.n_sh AS DOUBLE)
      FROM inter JOIN sizes nb ON nb.doc_id = id_b)
    SELECT id_sub, id_super, containment FROM dir
    WHERE containment >= 0.8 ORDER BY id_sub, id_super"""),
    (s, dir) => Dedup.prefixFilterContainment(T(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.8,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_sub"), col("id_super")))

  // Hybrid dedup: lexical (3-gram Jaccard) OR semantic (embedding
  // cosine) evidence, full-outer joined on the pair key so both
  // scores sit side by side; doc_id and vec_id align by construction.
  // The semantic leg is cell-BLOCKED (d05's k=8 seed-cell blocking —
  // the scale path); the oracle reconstructs the same blocking.
  private val d08 = Q("d08_hybrid_neardup", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    jac AS (
      SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 8),
    csims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM csims) WHERE rn = 1),
    cosp AS (
      SELECT id_a, id_b, cos_sim FROM (
        SELECT aa.vec_id AS id_a, bb.vec_id AS id_b,
          list_sum(list_transform(generate_series(1, len(ea.embedding)),
            i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
        FROM assigned aa JOIN assigned bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
          JOIN embeddings ea ON ea.vec_id = aa.vec_id
          JOIN embeddings eb ON eb.vec_id = bb.vec_id)
      WHERE cos_sim >= 0.5)
    SELECT COALESCE(j.id_a, c.id_a) AS id_a, COALESCE(j.id_b, c.id_b) AS id_b,
      j.jaccard, c.cos_sim,
      CASE WHEN j.id_a IS NOT NULL AND c.id_a IS NOT NULL THEN 'both'
           WHEN j.id_a IS NOT NULL THEN 'lexical' ELSE 'semantic' END AS method
    FROM jac j FULL JOIN cosp c ON j.id_a = c.id_a AND j.id_b = c.id_b
    ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.hybridNearDups(
        T(s, dir, "documents"), T(s, dir, "embeddings"),
        "text", "doc_id", "embedding", "vec_id",
        n = 3, jaccardThreshold = 0.3, cosineThreshold = 0.5,
        maxPostings = None, // exact: oracle-comparable
        semanticBlockCells = Some(8)) // cell-blocked semantic leg (d05 blocking)
      .orderBy(col("id_a"), col("id_b")))

  // Sub-document (paragraph-level) dedup: non-overlapping 20-token
  // chunks appearing more than once corpus-wide — boilerplate that
  // whole-document hashing (d01) misses.
  private val d09 = Q("d09_chunk_dedup", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    idx AS (SELECT doc_id, tk,
      unnest(generate_series(0, CAST(FLOOR((len(tk) - 1) / 20.0) AS BIGINT))) AS i
      FROM toks),
    ch AS (SELECT doc_id,
      md5(array_to_string(list_slice(tk, i * 20 + 1, i * 20 + 20), ' ')) AS chunk_md5
      FROM idx),
    per_doc AS (SELECT chunk_md5, doc_id, COUNT(*) AS c FROM ch GROUP BY 1, 2)
    SELECT chunk_md5,
      CAST(SUM(c) AS BIGINT) AS n_occurrences,
      COUNT(*) AS n_docs,
      MIN(doc_id) AS first_doc
    FROM per_doc GROUP BY chunk_md5 HAVING CAST(SUM(c) AS BIGINT) > 1
    ORDER BY chunk_md5"""),
    (s, dir) => Dedup.duplicatedChunks(T(s, dir, "documents"),
        "text", "doc_id", windowTokens = 20, strideTokens = 20)
      .orderBy(col("chunk_md5")))

  private val s01 = Q("s01_knn_bruteforce", Some("""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
      list_sum(list_transform(generate_series(1, len(embedding)),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
    FROM embeddings, q WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => Similarity.bruteForceTopK(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10))

  private val s02 = Q("s02_knn_lsh", None, // bucket assignment is engine-side pseudo-random
    (s, dir) => Similarity.lshTopK(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, nPlanes = 4))

  // Batch ANN (rows-only like s02: the sign-LSH planes are engine-side
  // pseudo-random). Multi-probe on; AnnRecallSpec pins the semantics
  // (batch == single-query per query id) and the recall lift.
  private val s11 = Q("s11_knn_lsh_batch", None,
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.lshTopKBatch(emb, emb.filter(col("vec_id") < 3),
        "embedding", "vec_id", "vec_id", k = 5, nPlanes = 4, multiProbe = true)
        .orderBy(col("query_id"), col("rank"))
    })

  private val s04 = Q("s04_knn_batch", Some("""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
      FROM embeddings e, q),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.bruteForceTopKBatch(emb,
        emb.filter(col("vec_id") < 3), "embedding", "vec_id", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })

  private val s03 = Q("s03_knn_ivf", None, // kmeans cells engine-specific
    (s, dir) => graft.pipeline.Ivf.searchTopK(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, numCells = 8, nprobe = 3))

  // Product-quantization ANN with exact re-rank (rows-only like
  // s03: the Lloyd codebooks are engine-side). PqSpec pins the
  // mechanics (code ranges, ADC-vs-exact error bound) and the recall
  // floor vs brute force.
  private val s12 = Q("s12_knn_pq", None,
    (s, dir) => graft.pipeline.Pq.searchTopK(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, m = 16, ksub = 16,
      rerank = 30))

  // IVF-PQ (rows-only like s03/s12): coarse cells prune the scan, PQ
  // codes replace vectors in the probed cells, bounded exact re-rank.
  private val s13 = Q("s13_knn_ivfpq", None,
    (s, dir) => graft.pipeline.Pq.searchTopKIvf(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, numCells = 8,
      nprobe = 4, m = 16, ksub = 16, rerank = 30))

  // Batch PQ ADC (rows-only): every query scored in ONE pass over the
  // codes; corpus vectors never read. PqSpec pins batch == single.
  private val s14 = Q("s14_knn_pq_batch", None,
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Pq.searchTopKBatch(emb,
          emb.filter(col("vec_id") < 3), "embedding", "vec_id", "vec_id",
          k = 5, m = 16, ksub = 16)
        .orderBy(col("query_id"), col("rank"))
    })

  // 128-bit corpus fingerprint for persisted-index cache keys (r21
  // advice): MD5 over absolute path + per-file (name, size, mtime,
  // head/tail sample) + the caller's param tag. Wide enough that a
  // collision is not a practical event (the previous 32-bit
  // MurmurHash key had a real birthday exposure across driver
  // rounds), and content-bearing: each file folds in its first,
  // middle, and last 4 KiB (up to 8 files), so even a same-size
  // same-millisecond in-place regeneration changes the key — parquet
  // footers carry row-group stats that differ whenever the data
  // does. The sample read is bounded (≤ 96 KiB total) and runs once
  // per registry key.
  private[graft] def corpusFileKey(dir: String, table: String,
      extra: String): String = {
    def sample(f: java.io.File): String = {
      val len = f.length()
      val chunk = 4096
      val raf = new java.io.RandomAccessFile(f, "r")
      try {
        val md = java.security.MessageDigest.getInstance("MD5")
        Seq(0L, math.max(0L, len / 2 - chunk / 2),
          math.max(0L, len - chunk)).foreach { off =>
          val buf = new Array[Byte](math.min(chunk.toLong, len).toInt)
          raf.seek(off)
          raf.readFully(buf)
          md.update(buf)
        }
        md.digest().map(b => f"$b%02x").mkString
      } finally raf.close()
    }
    def part(f: java.io.File, sampled: Boolean): String =
      s"${f.getName}|${f.length()}|${f.lastModified()}" +
        (if (sampled) s"|${sample(f)}" else "")
    val src = new java.io.File(s"$dir/$table.parquet")
    val files =
      if (src.isDirectory)
        Option(src.listFiles()).map(_.filter(_.isFile).sortBy(_.getName)
          .zipWithIndex
          .map { case (f, i) => part(f, sampled = i < 8) }
          .mkString(",")).getOrElse("")
      else part(src, sampled = src.isFile)
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}|$files|$extra"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  // Fingerprint-keyed tmpdir layout for the persisted-index handles:
  // `graft-<family>-<corpusKey32>-<paramKey12>` — the corpus part
  // PREFIXES the name so the orphan sweep can retire every param
  // variant of a STALE corpus (the driver regenerates testdata in
  // place each round, stranding the previous round's dirs — r14
  // verdict "what's wrong" #2) without touching any variant of the
  // live one (e.g. the graph family's full/c80 tags share a corpus).
  private[graft] def idxKeys(dir: String, extra: String): (String, String) = {
    val corpusPart = corpusFileKey(dir, "embeddings", "")
    (corpusPart,
      s"$corpusPart-${corpusFileKey(dir, "embeddings", extra).take(12)}")
  }

  // Condemn (deferred-delete under the shared DirGuard — never under
  // an in-flight reader) every tmpdir index dir of `family` whose
  // corpus part is not `liveCorpusKey`. The strict hex-shape match is
  // the safety rail: test fixtures create `graft-gidx-<tag><random>`
  // temp dirs that share the prefix but never the shape, so a
  // concurrent spec JVM's live fixtures are unreachable by the sweep.
  private[graft] def pruneOrphanIndexDirs(family: String,
      liveCorpusKey: String): Unit = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(family) + "[0-9a-f]{32}-[0-9a-f]{12}")
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (f.isDirectory && pat.matcher(f.getName).matches() &&
        !f.getName.startsWith(s"$family$liveCorpusKey-"))
        graft.pipeline.IndexLifecycle.DirGuard.condemn(f.getAbsolutePath)
    }
  }

  // Indexed IVF-PQ: the build-once/persist/query-many lifecycle.
  // The first invocation per (corpus, params) builds the index (cell-
  // partitioned codes + codebook/cell/meta side tables under the JVM
  // tmpdir) and registers the handle; every later invocation — and
  // every query in a serving session — is a registry lookup + a
  // partition-pruned probe with NO training job (AnnIndexSpec pins
  // both the pruning and the indexed==retrained equivalence, which is
  // why the same rows-only justification as s13 applies).
  private val s15 = Q("s15_knn_pq_indexed", None,
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      // cache key = 128-bit corpus FINGERPRINT (per-file size+mtime),
      // not the path alone: the test corpus is regenerated in place
      // between rounds, and a path-keyed cache would serve codes
      // encoded from the previous data against queries resolved from
      // the new one; the miss path sweeps the previous corpus's
      // stranded dirs
      val (cpart, key) = idxKeys(dir, "ivf")
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-ann-$key"
      if (graft.pipeline.AnnIndex.get(s"emb-$key").isEmpty)
        pruneOrphanIndexDirs("graft-ann-", cpart)
      val h = graft.pipeline.AnnIndex.openOrBuildCached(
        s"emb-$key", emb, "embedding", "vec_id", idxDir,
        numCells = 8, m = 16, ksub = 16)
      graft.pipeline.AnnIndex.searchTopK(emb, h, queryId = 0L, k = 10,
        nprobe = 4, rerank = 30)
    })

  // PQ with a SEEDED codebook (the first 16 vectors by id, sliced, no
  // Lloyd) — deliberately oracle-reconstructable, so the entire PQ
  // pipeline (codebook → encode argmin → ADC tables → top-k) gets a
  // full hash-matched check, upgrading the s12/s13/s14 family from
  // rows-only trusted to oracle-proven kernels. Every arithmetic step
  // accumulates in the same order on both engines; the final score is
  // 6-dp-rounded (t15 discipline) against group-sum order only.
  private val s16 = Q("s16_knn_pq_oracle", Some("""
    WITH js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    codes AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    qn AS (SELECT sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
    tabs AS (
      SELECT c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> q.qv[c.j*8+i] * c.cent[i])) AS dot,
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
    FROM scored, qn WHERE vec_id <> 0
    ORDER BY adc_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => graft.pipeline.Pq.searchTopKSeeded(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, m = 8, ksub = 16))

  // Sign-LSH with DATA-DERIVED planes (the first 4 corpus vectors) —
  // the s16 move for the LSH family: the bucket construction (sign
  // bits of bit-identical ascending dot products), the bucket-local
  // candidate set, and the exact-cosine top-k all reconstruct in SQL,
  // so the LSH mechanics get a full hash-matched check (s02/s11 keep
  // the RNG planes as the quality path).
  private val s17 = Q("s17_knn_lsh_oracle", Some("""
    WITH planes AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 4)),
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
          FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN buckets b USING (vec_id), qb
      WHERE b.bucket = qb.bucket AND e.vec_id <> 0),
    scored AS (
      SELECT c.vec_id,
        list_sum(list_transform(generate_series(1, len(c.embedding)),
          j -> CAST(c.embedding[j] AS DOUBLE) * q.qv[j]))
        / (sqrt(list_sum(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
      FROM cand c, q)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => Similarity.lshTopKSeeded(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, nPlanes = 4))

  // IVF with SEEDED centroids (first 8 corpus vectors, no Lloyd) —
  // the s16 move for the IVF family: argmax-cosine cell assignment
  // (ties to the lower cell), driver-side probe ranking, and in-cell
  // exact re-rank all reconstruct in SQL → full hash-match (s03
  // keeps the trained path).
  private val s18 = Q("s18_knn_ivf_oracle", Some("""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
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
          FROM embeddings WHERE vec_id = 0),
    probes AS (
      SELECT c.cell FROM cents c, q
      ORDER BY list_sum(list_transform(generate_series(1, len(q.qv)),
          j -> q.qv[j] * c.cv[j]))
        / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
           * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC, c.cell
      LIMIT 3),
    cand AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN assigned a USING (vec_id)
      WHERE a.cell IN (SELECT cell FROM probes) AND e.vec_id <> 0),
    scored AS (
      SELECT c.vec_id,
        list_sum(list_transform(generate_series(1, len(c.embedding)),
          j -> CAST(c.embedding[j] AS DOUBLE) * q.qv[j]))
        / (sqrt(list_sum(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
      FROM cand c, q)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => graft.pipeline.Ivf.searchTopKSeeded(T(s, dir, "embeddings"),
      "embedding", "vec_id", queryId = 0L, k = 10, numCells = 8, nprobe = 3))

  // Batch seeded-LSH — the oracle twin for the BATCH ANN mechanics
  // (broadcast query buckets, bucket-local join, per-query rank
  // window): one corpus pass, all arithmetic bit-identical, so the
  // s11/s14 batch shape gets a hash-matched representative too.
  private val s19 = Q("s19_knn_lsh_batch_oracle", Some("""
    WITH planes AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 4)),
    dots AS (
      SELECT e.vec_id, pl.i,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          j -> CAST(e.embedding[j] AS DOUBLE) * pl.p[j])) AS d
      FROM embeddings e CROSS JOIN planes pl),
    buckets AS (
      SELECT vec_id,
        CAST(SUM(CASE WHEN d >= 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id),
    qs AS (
      SELECT e.vec_id AS query_id, b.bucket AS q_bucket,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings e JOIN buckets b USING (vec_id) WHERE e.vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          j -> CAST(e.embedding[j] AS DOUBLE) * q.qv[j]))
        / (sqrt(list_sum(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
      FROM embeddings e JOIN buckets b USING (vec_id)
      JOIN qs q ON b.bucket = q.q_bucket AND e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.lshTopKSeededBatch(emb, emb.filter(col("vec_id") < 3),
          "embedding", "vec_id", "vec_id", k = 5, nPlanes = 4)
        .orderBy(col("query_id"), col("rank"))
    })

  // INDEXED IVF-PQ with seeded quantizers — the oracle twin for the
  // build-once/persist/query-many lifecycle itself (s15 keeps the
  // trained path): centroids = first-8 vectors, codebooks = first-16
  // sliced subvectors, both persisted with the cell-partitioned codes
  // table; the search OPENS the index (no training job) and scores
  // only the probed cell partitions. DuckDB reconstructs build +
  // probe + ADC end to end, so the persisted-index round trip —
  // encode at build time, partition-pruned read at query time — is
  // hash-matched, not just spec-trusted.
  private val s20 = Q("s20_knn_ivfpq_indexed_oracle", Some("""
    WITH js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    codes AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
    csims AS (
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
        FROM csims) WHERE rn = 1),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    qn AS (SELECT sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
    probes AS (
      SELECT c.cell FROM cents c, q
      ORDER BY list_sum(list_transform(generate_series(1, len(q.qv)),
          j -> q.qv[j] * c.cv[j]))
        / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
           * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC, c.cell
      LIMIT 3),
    tabs AS (
      SELECT c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> q.qv[c.j*8+i] * c.cent[i])) AS dot,
        list_sum(list_transform(c.cent, x -> x*x)) AS nrm2
      FROM cb c, q),
    parts AS (
      SELECT cd.vec_id, cd.j, t.dot, t.nrm2
      FROM codes cd
      JOIN assigned a ON cd.vec_id = a.vec_id
      JOIN tabs t ON cd.j = t.j AND cd.code = t.code
      WHERE a.cell IN (SELECT cell FROM probes) AND cd.vec_id <> 0),
    scored AS (
      SELECT vec_id,
        list_sum(list(dot ORDER BY j)) AS dsum,
        list_sum(list(nrm2 ORDER BY j)) AS nsum
      FROM parts GROUP BY vec_id)
    SELECT vec_id, ROUND(dsum / (qn.qnorm * sqrt(nsum)), 6) AS adc_sim
    FROM scored, qn
    ORDER BY adc_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      // corpus fingerprint in the cache key, as in s15 — plus the
      // build flavor, so seeded and trained indexes never share a dir
      val (cpart, key) = idxKeys(dir, "seeded")
      val idxDir =
        s"${System.getProperty("java.io.tmpdir")}/graft-ann-seeded-$key"
      if (graft.pipeline.AnnIndex.get(s"emb-seeded-$key").isEmpty)
        pruneOrphanIndexDirs("graft-ann-seeded-", cpart)
      val h = graft.pipeline.AnnIndex.openOrBuildCachedSeeded(
        s"emb-seeded-$key", emb, "embedding", "vec_id", idxDir,
        numCells = 8, m = 8, ksub = 16)
      graft.pipeline.AnnIndex.searchTopK(emb, h, queryId = 0L, k = 10,
        nprobe = 3, rerank = 0, roundAdc = true)
    })

  // MinHash-LSH with md5 slot-string minima — the s16 move for the
  // MinHash family: signatures are MIN(md5(i || ':' || shingle))
  // strings, band keys concatenate two slots, pairs share a band
  // bucket. Fully SQL-reconstructable → hash-matched (d03 keeps the
  // xxhash64 kernel as the scale path).
  private val d12 = Q("d12_minhash_md5_oracle", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b"""),
    (s, dir) => graft.pipeline.Dedup.minHashLshMd5(T(s, dir, "documents"),
        "text", "doc_id", shingleN = 3, numHashes = 8, bands = 4)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b")))

  // SimHash over md5-derived bits — the d12 move for the SimHash
  // family: pure integer arithmetic end-to-end (hex-digit position,
  // shift, mask, strict majority), so the 32-bit signature
  // hash-matches with no rounding (d04's xxhash64 kernel stays the
  // scale path).
  private val d13 = Q("d13_simhash_md5_oracle", Some("""
    WITH toks AS (SELECT DISTINCT doc_id, tok FROM
           (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)),
    h AS (SELECT doc_id, md5(tok) AS h FROM toks),
    bits AS (
      SELECT doc_id, j,
        ((strpos('0123456789abcdef', substr(h, (j // 4) + 1, 1)) - 1)
          >> (j % 4)) & 1 AS bit
      FROM h, UNNEST(generate_series(0, 31)) AS g(j)),
    agg AS (SELECT doc_id, j, SUM(bit) AS s, COUNT(*) AS n
            FROM bits GROUP BY doc_id, j)
    SELECT doc_id,
      CAST(SUM(CASE WHEN 2*s > n THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
        AS simhash32
    FROM agg GROUP BY doc_id ORDER BY doc_id"""),
    (s, dir) => graft.pipeline.Dedup.simHashMd5(T(s, dir, "documents"),
        "text", "doc_id")
      .select(col("id").as("doc_id"), col("simhash32"))
      .orderBy(col("doc_id")))

  // Semantic dedup, the SemDeDup recipe: near-dup search scoped to
  // seed-centroid clusters (s07's deterministic assignment), greedy
  // smallest-id keep. τ=0.4 drops 19/500 at sf0.01 — non-vacuous on
  // the near-orthogonal synthetic embeddings (d05 note). The oracle
  // replays assignment + within-cell pairs declaratively; the engine
  // must agree bit-for-bit on every cosine on BOTH sides of τ.
  private val d14 = Q("d14_semantic_dedup", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    drops AS (SELECT DISTINCT b.vec_id FROM assigned a
        JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(ea.embedding)),
          i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4)
    SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
    FROM assigned a LEFT JOIN drops d ON d.vec_id = a.vec_id
    ORDER BY a.vec_id"""),
    (s, dir) => graft.pipeline.Clustering.semDedup(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8, threshold = 0.4)
      .orderBy(col("vec_id")))

  // Incremental semantic dedup: a NEW batch (vec_id % 5 = 0) deduped
  // against the existing corpus and itself — the nightly-crawl path.
  // Seeds come from the corpus only (stable cells across batches);
  // τ=0.4 drops 10/100 batch members at sf0.01. The batch side is
  // broadcast against the corpus (the d10 move).
  private val d15 = Q("d15_semantic_dedup_incr", Some("""
    WITH corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0),
    batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
    cents AS (SELECT vec_id AS cell, embedding AS cvec FROM corpus ORDER BY vec_id LIMIT 8),
    casg AS (SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
            list_sum(list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
            c.cell) AS rn
        FROM corpus e, cents c) WHERE rn = 1),
    basg AS (SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
            list_sum(list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
            c.cell) AS rn
        FROM batch e, cents c) WHERE rn = 1),
    drops AS (
      SELECT DISTINCT b.vec_id FROM basg b
        JOIN casg c ON b.cell = c.cell
        JOIN batch eb ON eb.vec_id = b.vec_id
        JOIN corpus ec ON ec.vec_id = c.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(eb.embedding)),
          i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ec.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4
      UNION
      SELECT DISTINCT b.vec_id FROM basg a
        JOIN basg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN batch ea ON ea.vec_id = a.vec_id
        JOIN batch eb ON eb.vec_id = b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(ea.embedding)),
          i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4)
    SELECT b.vec_id, b.cell, (d.vec_id IS NULL) AS keep
    FROM basg b LEFT JOIN drops d ON d.vec_id = b.vec_id
    ORDER BY b.vec_id"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.semDedupIncremental(
          emb.where(col("vec_id") % 5 =!= 0),
          emb.where(col("vec_id") % 5 === 0),
          "embedding", "vec_id", k = 8, threshold = 0.4)
        .orderBy(col("vec_id"))
    })

  // Duplicated-span coverage (substring-dedup adapted to token
  // windows): 6-token windows occurring >= 2 times corpus-wide,
  // per-doc covered-token union. md5 window keys so the interval-union
  // kernel is oracle-exact (xxhash64 stays the scale-path default).
  private val d16 = Q("d16_span_coverage", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    wins AS (SELECT doc_id, i, md5(array_to_string(ts[i:i+5], ' ')) AS w
           FROM toks, UNNEST(generate_series(1, len(ts) - 5)) AS u(i)
           WHERE len(ts) >= 6),
    dup AS (SELECT doc_id, i FROM (
           SELECT doc_id, i, COUNT(*) OVER (PARTITION BY w) AS cnt FROM wins)
           WHERE cnt >= 2),
    per AS (SELECT doc_id,
           LEAST(6, COALESCE(i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 6)) AS cov
           FROM dup),
    agg AS (SELECT doc_id, SUM(cov) AS dup_tokens FROM per GROUP BY doc_id)
    SELECT t.doc_id AS id, CAST(len(ts) AS BIGINT) AS n_tokens,
      CAST(COALESCE(agg.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      ROUND(CAST(COALESCE(agg.dup_tokens, 0) AS DOUBLE) / CAST(len(ts) AS DOUBLE), 6)
        AS dup_fraction
    FROM toks t LEFT JOIN agg USING (doc_id)
    ORDER BY id"""),
    (s, dir) => Dedup.spanCoverage(T(s, dir, "documents"), "text", "doc_id",
        k = 6, minOccurs = 2, keyer = md5(_))
      .orderBy(col("id")))

  // Crawl snapshot diff: snapshot A (doc_id % 5 <> 4) vs snapshot B
  // (doc_id % 5 <> 0, with doc_id % 10 = 3 docs edited) — the status
  // classification incremental pipelines gate on. Digests only; one
  // id-keyed full-outer join.
  private val d17 = Q("d17_snapshot_diff", Some("""
    WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents WHERE doc_id % 5 <> 4),
    b AS (SELECT doc_id,
            md5(CASE WHEN doc_id % 10 = 3 THEN reverse(text) ELSE text END) AS hb
          FROM documents WHERE doc_id % 5 <> 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS id,
      CASE WHEN a.doc_id IS NULL THEN 'added'
           WHEN b.doc_id IS NULL THEN 'removed'
           WHEN ha = hb THEN 'unchanged' ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ORDER BY id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.snapshotDiff(
          docs.where(col("doc_id") % 5 =!= 4),
          docs.where(col("doc_id") % 5 =!= 0)
            .withColumn("text",
              when(col("doc_id") % 10 === 3, reverse(col("text")))
                .otherwise(col("text"))),
          "text", "doc_id")
        .orderBy(col("id"))
    })

  private val t01 = Q("t01_lang_id", Some("""
    WITH sc AS (
      SELECT doc_id,
        CAST(LENGTH(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS BIGINT) AS cjk,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0) AS s_en,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' der ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' und ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' nicht ', ' '))) / 6.0) AS s_de,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' le ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' et ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' les ', ' '))) / 4.0) AS s_fr,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' el ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' y ', ' '))) / 2.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' los ', ' '))) / 4.0) AS s_es
      FROM documents)
    SELECT doc_id,
      CASE WHEN cjk > 0 THEN 'zh'
           WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'unknown'
           WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
           WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
           WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
           WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
           ELSE 'unknown' END AS lang_pred
    FROM sc ORDER BY doc_id"""),
    (s, dir) => TextAnalysis.withLanguageId(T(s, dir, "documents"), "text")
      .select(col("doc_id"), col("lang_pred"))
      .orderBy(col("doc_id")))

  private val t02 = Q("t02_quality_score", Some("""
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS approx_bpe,
      CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
      0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * LEAST(
            ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
            / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
        + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
            / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)) AS quality
    FROM documents ORDER BY doc_id"""),
    (s, dir) => T(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.approxBpeTokens(col("text")).as("approx_bpe"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_token_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id")))

  private val t03 = Q("t03_token_stats", Some("""
    WITH base AS (
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    dt AS (
      SELECT source, COUNT(DISTINCT tok) AS distinct_tokens
      FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY source)
    SELECT base.source, n_docs, total_tokens, distinct_tokens
    FROM base JOIN dt USING (source) ORDER BY source"""),
    (s, dir) => {
      val d = T(s, dir, "documents")
      val base = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"))
      // distinct over the 64-bit token hash: the distinct-shuffle
      // carries (source, long) pairs, not strings; the count is
      // hash-invariant absent collisions (~v²/2⁶⁵ per source)
      val dt = d.select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"))
        .agg(countDistinct(xxhash64(col("tok"))).as("distinct_tokens"))
      base.join(dt, Seq("source"))
        .select(col("source"), col("n_docs"), col("total_tokens"), col("distinct_tokens"))
        .orderBy(col("source"))
    })

  private val t04 = Q("t04_fingerprint", Some("""
    SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      SUBSTRING(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_prefix
    FROM documents ORDER BY doc_id"""),
    // fp staged in its own projection so the md5+regex canonicalization
    // runs once, not once per referencing column
    (s, dir) => T(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp"), substring(col("fp"), 1, 8).as("fp_prefix"))
      .orderBy(col("doc_id")))

  private val m01 = Q("m01_multimodal_meta", Some("""
    SELECT doc_id AS sample_id, 'image' AS media_type,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      md5(text) AS payload_md5
    FROM documents ORDER BY sample_id"""),
    (s, dir) => Multimodal.metadata(
        Multimodal.textAsMedia(T(s, dir, "documents"), "doc_id", "text"))
      .orderBy(col("sample_id")))

  private val m02 = Q("m02_multimodal_decode", Some("""
    SELECT doc_id AS sample_id, 'image' AS media_type,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      sha256(text) AS sha256_hex,
      CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c))) AS DOUBLE)
        / octet_length(CAST(text AS BLOB)) AS mean_intensity
    FROM documents ORDER BY sample_id"""),
    (s, dir) => Multimodal.extractFeatures(
        Multimodal.textAsMedia(T(s, dir, "documents"), "doc_id", "text"))
      .toDF()
      .select(col("sample_id"), col("media_type"), col("n_bytes"),
        col("sha256_hex"), col("mean_intensity"))
      .orderBy(col("sample_id")))

  // Int8 scalar quantization of the embedding store (FAISS-SQ8
  // shape): codes + worst-dimension reconstruction error, both pure
  // per-element arithmetic — bit-identical in DuckDB. The code vector
  // is emitted as a CSV string (`qvec_csv`) so every output column is
  // a sortable scalar for the harness's pandas comparison (raw array
  // columns are unhashable there).
  private val s06 = Q("s06_scalar_quantize", Some("""
    SELECT vec_id,
      array_to_string(list_transform(embedding, x ->
        CAST(GREATEST(-128, LEAST(127,
          ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * 255.0) - 128)) AS TINYINT)), ',') AS qvec_csv,
      list_max(list_transform(embedding, x ->
        ABS(CAST(x AS DOUBLE) -
          ((CAST(GREATEST(-128, LEAST(127,
              ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * 255.0) - 128)) AS DOUBLE)
            + 128.0) / 255.0 * 4.0 + (-2.0))))) AS max_err
    FROM embeddings ORDER BY vec_id"""),
    (s, dir) => {
      val q = graft.pipeline.Quantize.scalarQuantize(
        T(s, dir, "embeddings"), "embedding", lo = -2.0, hi = 2.0)
      q.select(col("vec_id"),
          array_join(col("qvec").cast("array<string>"), ",").as("qvec_csv"),
          graft.pipeline.Quantize.maxReconstructionError(
            col("embedding"), col("qvec"), -2.0, 2.0).as("max_err"))
        .orderBy(col("vec_id"))
    })

  // Search over the quantized store (FAISS-SQ8 shape): corpus holds
  // int8 codes, reconstruction happens on the fly in the scan stage,
  // exact cosine over dequantized vectors. Deterministic affine
  // round-trip -> fully oracle-comparable, unlike trained indexes.
  private val s09 = Q("s09_knn_sq8", Some("""
    WITH coded AS (
      SELECT vec_id, list_transform(embedding, x ->
        (CAST(GREATEST(-128, LEAST(127,
           ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * 255.0) - 128)) AS DOUBLE)
         + 128.0) / 255.0 * 4.0 + (-2.0)) AS rvec
      FROM embeddings),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
      list_sum(list_transform(generate_series(1, len(rvec)), i -> rvec[i] * qv[i]))
      / (sqrt(list_sum(list_transform(rvec, x -> x * x)))
         * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cos_sim
    FROM coded, q WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10"""),
    (s, dir) => graft.pipeline.Quantize.quantizedTopK(
      T(s, dir, "embeddings"), "embedding", "vec_id",
      queryId = 0L, k = 10, lo = -2.0, hi = 2.0))

  // Data-dependent (trained) quantization range: the clip range is
  // the corpus's exact global element min/max — deterministic and
  // order-independent, so unlike learned quantizers it's fully
  // oracle-comparable: DuckDB re-trains the same range in a CTE and
  // both engines quantize with literal-identical doubles.
  private val s10 = Q("s10_quantize_trained", Some("""
    WITH rng AS (SELECT
        MIN(list_min(list_transform(embedding, e -> CAST(e AS DOUBLE)))) AS lo,
        MAX(list_max(list_transform(embedding, e -> CAST(e AS DOUBLE)))) AS hi
      FROM embeddings)
    SELECT vec_id, rng.lo AS lo, rng.hi AS hi,
      array_to_string(list_transform(embedding, x ->
        CAST(GREATEST(-128, LEAST(127,
          ROUND((CAST(x AS DOUBLE) - rng.lo) / (rng.hi - rng.lo) * 255.0) - 128))
          AS TINYINT)), ',') AS qvec_csv
    FROM embeddings, rng ORDER BY vec_id"""),
    (s, dir) => {
      val (coded, lo, hi) = graft.pipeline.Quantize.scalarQuantizeTrained(
        T(s, dir, "embeddings"), "embedding")
      coded.select(col("vec_id"), lit(lo).as("lo"), lit(hi).as("hi"),
          array_join(col("qvec").cast("array<string>"), ",").as("qvec_csv"))
        .orderBy(col("vec_id"))
    })

  // Mean-pool embeddings per label (the "class centroid" shape):
  // posexplode → (label, pos) average. Floating aggregation order
  // differs per engine, so the means are rounded like q27's stats.
  private val s05 = Q("s05_embedding_pool", Some("""
    SELECT label, CAST(i - 1 AS INT) AS pos,
      ROUND(AVG(CAST(e AS DOUBLE)), 6) AS mean_val
    FROM (SELECT label, unnest(embedding) AS e,
            unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
    GROUP BY label, i ORDER BY label, pos"""),
    (s, dir) => T(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("mean_val"))
      .orderBy(col("label"), col("pos")))

  // Semantic clustering around deterministic seed centroids
  // (vec_id < 8): per-cluster summary. Assignment is a map-only
  // projection (seeds inlined as literals — no join, no shuffle);
  // see Clustering.assignToSeeds.
  private val s07 = Q("s07_cluster_report", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell, sim FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1)
    SELECT cell, n_members, min_sim, top_id, top_sim FROM (
      SELECT cell, vec_id AS top_id, sim AS top_sim,
        COUNT(*) OVER (PARTITION BY cell) AS n_members,
        MIN(sim) OVER (PARTITION BY cell) AS min_sim,
        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY sim DESC, vec_id) AS rn
      FROM assigned) WHERE rn = 1 ORDER BY cell"""),
    (s, dir) => graft.pipeline.Clustering.clusterReport(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8)
      .orderBy(col("cell")))

  // Cluster-balanced sampling (SemDeDup shape): the 3 most-central
  // members of every cluster — semantic coverage preserved under
  // downsampling.
  private val s08 = Q("s08_cluster_sample", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell, sim FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1)
    SELECT cell, vec_id, sim, CAST(rn AS BIGINT) AS rank FROM (
      SELECT cell, vec_id, sim,
        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY sim DESC, vec_id) AS rn
      FROM assigned) WHERE rn <= 3 ORDER BY cell, rank"""),
    (s, dir) => graft.pipeline.Clustering.balancedSample(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8, perCluster = 3)
      .orderBy(col("cell"), col("rank")))

  // Diversity-aware retrieval: MMR top-10 around the vec_id=0 query.
  // The greedy trajectory is hash-proven end to end — the oracle's
  // recursive CTE re-runs the same argmax per step, with the λ mix
  // computed as (1::DOUBLE - 0.7::DOUBLE) because DuckDB parses bare
  // 0.7 as DECIMAL and exact-decimal 0.3 is one ulp off Scala's
  // 1.0 - 0.7 — and the result provably differs from s01's pure
  // top-k ordering (diversity is non-vacuous on this corpus).
  private val s21 = Q("s21_knn_mmr", Some("""
    WITH RECURSIVE
    rel AS (SELECT vec_id,
        list_sum(list_transform(generate_series(1, len(embedding)),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS qsim
      FROM embeddings, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
      WHERE vec_id <> 0),
    sel(step, ids, picked, qsim, mmr) AS (
      SELECT 1, [p.vec_id], p.vec_id, p.qsim, CAST(0.7 AS DOUBLE) * p.qsim - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * CAST(0.0 AS DOUBLE)
      FROM (SELECT vec_id, qsim FROM rel
            ORDER BY CAST(0.7 AS DOUBLE) * qsim - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * CAST(0.0 AS DOUBLE) DESC, vec_id LIMIT 1) p
      UNION ALL
      SELECT s.step + 1, list_append(s.ids, p.vec_id), p.vec_id, p.qsim, p.score
      FROM sel s, LATERAL (
        SELECT r.vec_id, r.qsim,
          CAST(0.7 AS DOUBLE) * r.qsim - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
            SELECT MAX(
              list_sum(list_transform(generate_series(1, len(e1.embedding)),
                i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(e1.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * sqrt(list_sum(list_transform(e2.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
            FROM embeddings e1, embeddings e2
            WHERE e1.vec_id = r.vec_id AND list_contains(s.ids, e2.vec_id)) AS score
        FROM rel r WHERE NOT list_contains(s.ids, r.vec_id)
        ORDER BY score DESC, r.vec_id LIMIT 1) p
      WHERE s.step < 10)
    SELECT CAST(step AS BIGINT) AS rank, picked AS vec_id, qsim, mmr
    FROM sel ORDER BY rank"""),
    (s, dir) => Similarity.mmrTopK(T(s, dir, "embeddings"), "embedding", "vec_id",
        queryId = 0L, k = 10, lambda = 0.7)
      .orderBy(col("rank")))

  // Token-window chunking with overlap (window 50, stride 40) — the
  // LLM context-window preparation operator (TextChunker).
  private val t05 = Q("t05_chunking", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    idx AS (SELECT doc_id, tk,
      unnest(generate_series(0, CAST(FLOOR((len(tk) - 1) / 40.0) AS BIGINT))) AS i
      FROM toks)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
      array_to_string(list_slice(tk, i * 40 + 1, i * 40 + 50), ' ') AS chunk_text,
      CAST(len(list_slice(tk, i * 40 + 1, i * 40 + 50)) AS BIGINT) AS n_tokens
    FROM idx ORDER BY doc_id, chunk_id"""),
    (s, dir) => graft.pipeline.TextChunker.chunk(
        T(s, dir, "documents"), "text", "doc_id", windowTokens = 50, strideTokens = 40)
      .orderBy(col("doc_id"), col("chunk_id")))

  // Deterministic stratified sampling: 5 docs per source, ranked by
  // md5(doc_id) — reproducible across runs AND engines (rand() is
  // neither), which is what makes a curation pipeline re-runnable.
  private val t06 = Q("t06_stratified_sample", Some("""
    SELECT source, doc_id, sample_rank FROM (
      SELECT source, doc_id,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      FROM documents)
    WHERE sample_rank <= 5 ORDER BY source, sample_rank"""),
    (s, dir) => graft.pipeline.Sampling.stratifiedSample(
        T(s, dir, "documents"), "source", "doc_id", k = 5)
      .select(col("source"), col("doc_id"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank")))

  // End-to-end curation composite — the flagship LLM-data shape:
  // language-ID -> quality score -> exact dedup (keep min doc_id per
  // fingerprint) -> filter -> per-source corpus stats. Every stage is
  // the same operator the standalone queries (t01/t02/t04/d01) pin,
  // so the DuckDB oracle replays the identical formulas.
  private val t07 = Q("t07_curation_pipeline", Some("""
    WITH sc AS (
      SELECT doc_id, source, text,
        CAST(LENGTH(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS BIGINT) AS cjk,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0) AS s_en,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' der ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' und ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' nicht ', ' '))) / 6.0) AS s_de,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' le ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' et ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' les ', ' '))) / 4.0) AS s_fr,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' el ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' y ', ' '))) / 2.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' los ', ' '))) / 4.0) AS s_es
      FROM documents),
    langed AS (
      SELECT doc_id, source, text, s_en,
        CASE WHEN cjk > 0 THEN 'zh'
             WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'unknown'
             WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
             WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
             WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
             WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
             ELSE 'unknown' END AS lang_pred
      FROM sc),
    scored AS (
      SELECT doc_id, source, text, lang_pred,
        0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(s_en / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)) AS quality,
        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM langed),
    deduped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM scored)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
      ROUND(AVG(quality), 6) AS avg_quality
    FROM deduped
    WHERE rn = 1 AND lang_pred = 'en' AND quality >= 0.4
    GROUP BY source ORDER BY source"""),
    (s, dir) => {
      val scored = TextAnalysis.withLanguageId(T(s, dir, "documents"), "text")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val deduped = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .where(col("rn") === 1 && col("lang_pred") === "en" && col("quality") >= 0.4)
      deduped.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
          round(avg(col("quality")), 6).as("avg_quality"))
        .orderBy(col("source"))
    })

  // Second dialect-shim battery through the SQL door: DataFusion
  // names (to_hex, arrow_cast, array_has/_all, array_length,
  // array_element) resolved by CompatFunctions' registry; the oracle
  // speaks native DuckDB (to_hex, CAST, list_contains, len, [i]).
  private val q57 = Q("q57_dialect_shims2", Some("""
    SELECT p_partkey,
      lower(to_hex(p_partkey)) AS hx,
      CAST(p_size AS DOUBLE) AS fsize,
      list_contains([1, 2, 3], p_size % 3 + 1) AS has1,
      CAST(len(generate_series(1, p_size % 4 + 1)) AS INT) AS alen,
      CAST((generate_series(1, 5))[p_size % 5 + 1] AS BIGINT) AS elem,
      list_has_all([10, 20, 30, 40], [10, p_size % 3 * 10 + 10]) AS hasall
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey"""),
    (s, dir) => {
      registerViews(s, dir, "part")
      CompatFunctions.registerAll(s)
      s.sql(SqlRewrite.rewrite("""
        SELECT p_partkey,
          to_hex(p_partkey) AS hx,
          arrow_cast(p_size, 'Float64') AS fsize,
          array_has(array(1, 2, 3), p_size % 3 + 1) AS has1,
          array_length(generate_series(1, p_size % 4 + 1)) AS alen,
          arrow_cast(array_element(generate_series(1, 5), p_size % 5 + 1), 'Int64') AS elem,
          array_has_all(array(10, 20, 30, 40), array(10, p_size % 3 * 10 + 10)) AS hasall
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey"""))
    })

  // As-of join (clicks ← most recent error per user): an operator
  // neither Spark nor the reference's engine ships; implemented as
  // tagged-union + running last-non-null window (one exchange + sort,
  // sort-merge-join cost, no range explosion) and oracle-checked
  // against DuckDB's NATIVE ASOF LEFT JOIN — a true cross-engine
  // differential of non-trivial semantics. err_event_id breaks ties
  // deterministically (no (user, ts) collisions exist in the data —
  // verified — so both engines agree).
  private val q58 = Q("q58_asof_join", Some("""
    WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'click'),
    errors AS (SELECT event_id AS err_event_id, user_id, ts,
           value AS err_value FROM events WHERE event_type = 'error')
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts, c.value,
           e.err_value, e.err_event_id
    FROM clicks c ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    ORDER BY c.event_id"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("value"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("value").as("err_value"))
      graft.ops.TemporalJoins.asofJoin(clicks, errors,
          keyCol = "user_id", leftTsCol = "ts", rightTsCol = "ts",
          rightPayload = Seq("err_value", "err_event_id"), suffix = "",
          rightOrd = Some("err_event_id"))
        .orderBy(col("event_id"))
    })

  // Forward as-of: each click's NEXT purchase by the same user (the
  // attribution shape). Same merge as q58 traversed in descending ts
  // order; oracle = DuckDB ASOF LEFT JOIN with the flipped bound.
  private val q60 = Q("q60_asof_forward", Some("""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
    purchases AS (SELECT event_id AS p_event_id, user_id, ts,
           value AS p_value FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
           p.p_value, p.p_event_id
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("value").as("p_value"))
      graft.ops.TemporalJoins.asofJoin(clicks, purchases,
          keyCol = "user_id", leftTsCol = "ts", rightTsCol = "ts",
          rightPayload = Seq("p_value", "p_event_id"), suffix = "",
          rightOrd = Some("p_event_id"), forward = true)
        .orderBy(col("event_id"))
    })

  // Pure range join (clicks within 10 minutes after ANY error — no
  // equi key, the shape Catalyst can only nested-loop): executed as
  // bucket-quantized equi-join + exact containment filter. DuckDB
  // executes the same inequality join natively (IEJoin) for the
  // oracle.
  private val q59 = Q("q59_range_join", Some("""
    WITH clicks AS (SELECT event_id, ts FROM events WHERE event_type = 'click'),
    errors AS (SELECT ts FROM events WHERE event_type = 'error')
    SELECT c.event_id, CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM clicks c JOIN errors e
      ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY c.event_id ORDER BY c.event_id"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val tenMinMicros = 600000000L
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), unix_micros(col("ts")).as("pt"))
      val errors = ev.where(col("event_type") === "error")
        .select(unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + lit(tenMinMicros)).as("hi"))
      graft.ops.TemporalJoins.rangeJoin(clicks, errors,
          "pt", "lo", "hi", bucketWidth = tenMinMicros)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_windows"))
        .orderBy(col("event_id"))
    })

  // Batch sessionization (the oracle-checked twin of the streaming
  // sessionizer): a session breaks when a user is idle > 30 min;
  // session index = running count of breaks. Both windows share one
  // (user_id, ts) exchange+sort; per-session rollup is one more
  // partial-aggregated exchange.
  private val q62 = Q("q62_sessionize_batch", Some("""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      CAST(MIN(ts) AS TIMESTAMP) AS session_start,
      CAST(MAX(ts) AS TIMESTAMP) AS session_end,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx"""),
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, dir)
        // gap compared in MICROSECONDS: the oracle's `ts - lag(ts) >
        // INTERVAL 30 MINUTE` is µs-exact; a seconds cast would
        // truncate and flip boundary gaps
        .withColumn("brk",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
            > 30L * 60L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          min(col("ts")).cast("timestamp_ntz").as("session_start"),
          max(col("ts")).cast("timestamp_ntz").as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(8, 2))).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_idx"))
    })

  // Funnel analysis as CHAINED forward as-of joins: first signup →
  // next click → next purchase per user. The second hop's left ts
  // (c_ts) is null for non-converting users; the operator's SQL null
  // semantics keep the row with no match, exactly like the oracle's
  // ASOF LEFT JOIN on a null bound.
  private val q63 = Q("q63_funnel", Some("""
    WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT user_id, ts AS c_ts, event_id AS c_id FROM events
           WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
           WHERE event_type = 'purchase'),
    sc AS (SELECT s.user_id, s.s_ts, c.c_ts, c.c_id
           FROM s ASOF LEFT JOIN c
             ON s.user_id = c.user_id AND s.s_ts <= c.c_ts),
    scp AS (SELECT sc.user_id, sc.s_ts, sc.c_ts, sc.c_id, p.p_ts, p.p_id
           FROM sc ASOF LEFT JOIN p
             ON sc.user_id = p.user_id AND sc.c_ts <= p.p_ts)
    SELECT user_id, CAST(s_ts AS TIMESTAMP) AS s_ts,
           CAST(c_ts AS TIMESTAMP) AS c_ts, c_id,
           CAST(p_ts AS TIMESTAMP) AS p_ts, p_id
    FROM scp ORDER BY user_id"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val signups = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).cast("timestamp_ntz").as("s_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("c_ts"),
          col("event_id").as("c_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("p_ts"),
          col("event_id").as("p_id"))
      val sc = graft.ops.TemporalJoins.asofJoin(signups, clicks,
        keyCol = "user_id", leftTsCol = "s_ts", rightTsCol = "c_ts",
        rightPayload = Seq("c_ts", "c_id"), suffix = "",
        rightOrd = Some("c_id"), forward = true)
      graft.ops.TemporalJoins.asofJoin(sc, purchases,
          keyCol = "user_id", leftTsCol = "c_ts", rightTsCol = "p_ts",
          rightPayload = Seq("p_ts", "p_id"), suffix = "",
          rightOrd = Some("p_id"), forward = true)
        .orderBy(col("user_id"))
    })

  // Interval-overlap join with no equi key (error 10-min windows ×
  // purchase 10-min windows): bucket-exploded equi-join where only
  // the bucket holding the intersection start may emit a pair —
  // exactly-once without a dedup pass. Oracle = DuckDB's native
  // inequality (IEJoin) overlap join.
  private val q61 = Q("q61_interval_join", Some("""
    WITH err AS (SELECT event_id AS err_id, ts AS elo,
           ts + INTERVAL 10 MINUTE AS ehi FROM events WHERE event_type = 'error'),
    pur AS (SELECT event_id AS pur_id, ts AS plo,
           ts + INTERVAL 10 MINUTE AS phi FROM events WHERE event_type = 'purchase')
    SELECT e.err_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM err e JOIN pur p ON e.elo < p.phi AND p.plo < e.ehi
    GROUP BY e.err_id ORDER BY e.err_id"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val tenMin = 600000000L
      val err = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"),
          unix_micros(col("ts")).as("elo"),
          (unix_micros(col("ts")) + lit(tenMin)).as("ehi"))
      val pur = ev.where(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("plo"),
          (unix_micros(col("ts")) + lit(tenMin)).as("phi"))
      graft.ops.TemporalJoins.intervalJoin(err, pur,
          "elo", "ehi", "plo", "phi", bucketWidth = tenMin)
        .groupBy(col("err_id")).agg(count(lit(1)).as("n_overlaps"))
        .orderBy(col("err_id"))
    })

  // Cohort retention triangle: users bucketed by first-event week;
  // each (cohort, offset) cell counts distinct users active that many
  // weeks later. Both engines truncate to Monday week starts, so the
  // day difference is an exact multiple of 7 and the division is
  // exact.
  private val q64 = Q("q64_cohort_retention", Some("""
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_start
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_start
      FROM events),
    j AS (
      SELECT c.cohort_start,
        CAST(datediff('day', c.cohort_start, a.active_start) / 7 AS BIGINT)
          AS week_offset,
        a.user_id
      FROM activity a JOIN cohorts c USING (user_id))
    SELECT CAST(cohort_start AS TIMESTAMP) AS cohort_start, week_offset,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY cohort_start, week_offset
    ORDER BY cohort_start, week_offset"""),
    (s, dir) => graft.ops.EventAnalytics.cohortRetention(
        Tables.events(s, dir), "user_id", "ts", "week")
      .select(col("cohort_start").cast("timestamp_ntz").as("cohort_start"),
        col("offset").as("week_offset"), col("n_users"))
      .orderBy(col("cohort_start"), col("week_offset")))

  // Trailing-7-day rolling stats per user — the RANGE BETWEEN
  // INTERVAL window frame. The rolling sum accumulates DECIMAL (a
  // sliding double sum is accumulation-order-specific per engine);
  // the avg is one double division, bit-identical everywhere.
  private val q65 = Q("q65_time_range_window", Some("""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                  value FROM events)
    SELECT event_id, user_id, ts,
      CAST(win_n AS BIGINT) AS win_n,
      CAST(win_sum AS DOUBLE) AS win_sum,
      CAST(win_sum AS DOUBLE) / win_n AS win_avg
    FROM (
      SELECT event_id, user_id, ts,
        COUNT(*) OVER w AS win_n,
        SUM(CAST(value AS DECIMAL(8,2))) OVER w AS win_sum
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW))
    ORDER BY event_id"""),
    (s, dir) => graft.ops.EventAnalytics.trailingWindowStats(
        Tables.events(s, dir), "user_id", "ts", "value",
        windowMicros = 7L * 24 * 3600 * 1000000L)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("win_n"), col("win_sum"), col("win_avg"))
      .orderBy(col("event_id")))

  // Skew-safe sessionization: same session semantics as q62, computed
  // per (user, time-bucket) with directory stitching
  // (EventAnalytics.sessionizeSkewed) — the variant for a corpus where
  // one hot user would serialize the q62 window's reducer. The oracle
  // is the plain per-user window SQL with a deterministic event_id
  // tie-break, so the hash-match pins that bucketing + stitching
  // reproduce the unbucketed semantics bit for bit.
  private val q68 = Q("q68_sessionize_skewed", Some("""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      CAST(MIN(ts) AS TIMESTAMP) AS session_start,
      CAST(MAX(ts) AS TIMESTAMP) AS session_end,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx"""),
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("tus", unix_micros(col("ts")))
      graft.ops.EventAnalytics.sessionizeSkewed(ev, "user_id", "tus",
          gapMicros = 30L * 60 * 1000000L,
          bucketWidth = 6L * 3600 * 1000000L, // 6 h buckets
          ordCol = Some("event_id"))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          min(col("ts")).cast("timestamp_ntz").as("session_start"),
          max(col("ts")).cast("timestamp_ntz").as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(8, 2))).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_idx"))
    })

  // Skew-safe trailing time-range window: q65's exact output through
  // the home+ghost bucketing (EventAnalytics.trailingWindowStatsSkewed)
  // — 2× exchanged rows buying |buckets|× hot-key parallelism. Same
  // oracle as q65: the decimal-exact sum makes the regrouped
  // accumulation bit-identical.
  private val q69 = Q("q69_trailing_window_skewed", Some("""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                  value FROM events)
    SELECT event_id, user_id, ts,
      CAST(win_n AS BIGINT) AS win_n,
      CAST(win_sum AS DOUBLE) AS win_sum,
      CAST(win_sum AS DOUBLE) / win_n AS win_avg
    FROM (
      SELECT event_id, user_id, ts,
        COUNT(*) OVER w AS win_n,
        SUM(CAST(value AS DECIMAL(8,2))) OVER w AS win_sum
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW))
    ORDER BY event_id"""),
    (s, dir) => graft.ops.EventAnalytics.trailingWindowStatsSkewed(
        Tables.events(s, dir), "user_id", "ts", "value",
        windowMicros = 7L * 24 * 3600 * 1000000L,
        bucketWidth = 7L * 24 * 3600 * 1000000L)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("win_n"), col("win_sum"), col("win_avg"))
      .orderBy(col("event_id")))

  // PIVOT (the q67-UNPIVOT complement): Spark's relational
  // .pivot(col, values) with EXPLICIT values — at scale the implicit
  // form runs a distinct-scan job first; pinning the value list keeps
  // pivot a pure single-agg plan (one exchange, map-side partials).
  // Oracle = ANSI conditional aggregation, the portable spelling.
  private val q70 = Q("q70_pivot", Some("""
    SELECT lang,
      CAST(COALESCE(COUNT(CASE WHEN CAST(substr(source, 4) AS INT) < 1 THEN 1 END), 0) AS BIGINT) AS rare,
      CAST(COALESCE(COUNT(CASE WHEN CAST(substr(source, 4) AS INT) >= 1
                               AND CAST(substr(source, 4) AS INT) < 5 THEN 1 END), 0) AS BIGINT) AS mid,
      CAST(COALESCE(COUNT(CASE WHEN CAST(substr(source, 4) AS INT) >= 5 THEN 1 END), 0) AS BIGINT) AS common,
      CAST(SUM(CASE WHEN CAST(substr(source, 4) AS INT) < 1 THEN n_chars ELSE 0 END) AS BIGINT) AS rare_chars
    FROM documents GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val tierNum = substring(col("source"), 4, 10).cast("int")
      val tier = when(tierNum < 1, "rare").when(tierNum < 5, "mid").otherwise("common")
      val pivoted = T(s, dir, "documents")
        .withColumn("tier", tier)
        .groupBy(col("lang"))
        .pivot("tier", Seq("rare", "mid", "common"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      pivoted
        .select(col("lang"),
          coalesce(col("rare_n"), lit(0L)).as("rare"),
          coalesce(col("mid_n"), lit(0L)).as("mid"),
          coalesce(col("common_n"), lit(0L)).as("common"),
          coalesce(col("rare_chars"), lit(0L)).as("rare_chars"))
        .orderBy(col("lang"))
    })

  // QUALIFY — DataFusion's post-window filter clause (planned since
  // DF 31, `datafusion/sql/src/select.rs`; the reference accepts it
  // verbatim through `lib/src/context/session.rs:664`). Spark has no
  // QUALIFY: SqlRewrite.rewriteQualify restructures the block into a
  // subquery computing the predicate beside the select list, filtered
  // outside. Submitted THROUGH the SQL door; DuckDB runs the
  // identical QUALIFY text natively, so the rewrite is graded against
  // a native implementation. One shuffle (the window partition), no
  // extra exchange: the helper predicate rides the same Window
  // operator as the projected rank.
  private val q71 = Q("q71_qualify", Some(qualifySql),
    (s, dir) => {
      registerViews(s, dir, "orders")
      s.sql(SqlRewrite.rewrite(qualifySql))
    })

  private lazy val qualifySql = """
    SELECT o_custkey, o_orderkey,
      CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rn
    FROM orders WHERE o_orderkey <= 2000
    QUALIFY rn <= 2
    ORDER BY o_custkey, o_orderkey"""

  // EXACT percentiles per group (Spark `percentile` vs DuckDB
  // `quantile_cont` — same linear interpolation, verified
  // bit-identical). Exact percentile buffers each group's values at
  // the reducer: right for bounded group cardinality like this;
  // q33's approx_percentile sketch is the unbounded-cardinality
  // 100 TB path.
  private val q66 = Q("q66_exact_percentiles", Some("""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      MIN(value) AS min_v,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.95) AS p95,
      quantile_cont(value, 0.99) AS p99,
      MAX(value) AS max_v
    FROM events GROUP BY event_type ORDER BY event_type"""),
    (s, dir) => Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"),
        max(col("value")).as("max_v"))
      .orderBy(col("event_type")))

  // Gopher-style repetition signal: fraction of a doc's 2-grams taken
  // by its most frequent one (degenerate generated text → ~1).
  private val t08 = Q("t08_repetition", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') AS gram
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)),
    counts AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram)
    SELECT doc_id AS id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      CAST(MAX(cnt) AS BIGINT) AS top_gram_count,
      CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS repetition_ratio
    FROM counts GROUP BY doc_id ORDER BY id"""),
    (s, dir) => TextAnalysis.repetitionStats(T(s, dir, "documents"), "text", "doc_id", n = 2)
      .orderBy(col("id")))

  // Benchmark decontamination: training docs (doc_id % 50 <> 0)
  // sharing any 3-gram shingle with the "benchmark" slice
  // (doc_id % 50 = 0) are flagged with their distinct-shared-shingle
  // count. Spark joins 64-bit shingle HASHES; the oracle joins the
  // shingle STRINGS — equal counts (collision odds ~1e-7, the d02
  // argument), pinned by the hash-match.
  private val t09 = Q("t09_decontamination", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
    SELECT s.doc_id, COUNT(*) AS n_hits
    FROM sh s JOIN bench USING (shingle)
    WHERE s.doc_id % 50 <> 0
    GROUP BY s.doc_id ORDER BY doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.contaminationCounts(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3)
        .select(col("id").as("doc_id"), col("n_hits"))
        .orderBy(col("doc_id"))
    })

  // The actionable decontamination form: the training split with
  // every document sharing >= 2 distinct shingles with the benchmark
  // split removed (anti-join on flagged ids).
  private val t13 = Q("t13_decontaminate_filter", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    hits AS (SELECT s.doc_id, COUNT(*) AS n_hits
             FROM sh s JOIN bench USING (shingle)
             WHERE s.doc_id % 50 <> 0 GROUP BY 1)
    SELECT d.doc_id, d.source, d.lang FROM documents d
    WHERE d.doc_id % 50 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hits WHERE n_hits >= 2)
    ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.removeContaminated(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3, minHits = 2)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    })

  // Overlap-FRACTION decontamination: the share of each training
  // doc's own distinct shingles that appear in the benchmark split —
  // the threshold real pipelines use (absolute counts condemn tweets
  // and excuse books). Docs with frac >= 0.05 reported. The division
  // is exact-integer IEEE double division on both engines, so the
  // hash-match holds bit-for-bit.
  private val t14 = Q("t14_decontaminate_fraction", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    stats AS (SELECT s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(COUNT(b.shingle) AS BIGINT) AS n_hits
             FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
             WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id),
    frs AS (SELECT doc_id, n_hits, n_shingles,
             CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS frac
            FROM stats WHERE n_hits > 0)
    SELECT doc_id, n_hits, n_shingles, frac FROM frs
    WHERE frac >= 0.05 ORDER BY doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.contaminationFractions(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3)
        .where(col("frac") >= 0.05)
        .select(col("id").as("doc_id"), col("n_hits"), col("n_shingles"), col("frac"))
        .orderBy(col("doc_id"))
    })

  // Token-distribution Shannon entropy per document (the
  // lexical-diversity quality signal): H = ln N − (Σ c·ln c)/N.
  // Spark counts over 64-bit token hashes (the shuffle never carries
  // strings), the oracle over the strings themselves — identical
  // counts absent collisions; entropy rounded to 6 dp because the
  // Σ c·ln c accumulation order is engine-specific.
  private val t15 = Q("t15_token_entropy", Some("""
    WITH counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM
        (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok),
    agg AS (SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
      FROM counts GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
      ROUND(ln(CAST(n_tokens AS DOUBLE)) - clogc / CAST(n_tokens AS DOUBLE), 6)
        AS entropy
    FROM agg ORDER BY doc_id"""),
    (s, dir) => graft.pipeline.TextAnalysis.tokenEntropy(
        T(s, dir, "documents"), "text", "doc_id")
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy"))
      .orderBy(col("doc_id")))

  // Sequence packing: docs → fixed-token-budget training packs
  // (streaming first-fit by id order within each source; a straddling
  // doc overflows its pack). Deterministic running-sum window on both
  // engines.
  private val t16 = Q("t16_sequence_pack", Some("""
    SELECT source, doc_id, n_tokens, cum_tokens,
      CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / 512.0) AS BIGINT)
        AS pack_id
    FROM (SELECT source, doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            CAST(SUM(len(string_split(text, ' '))) OVER
              (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM documents)
    ORDER BY source, doc_id"""),
    (s, dir) => graft.pipeline.Sampling.packSequences(
        T(s, dir, "documents"), "text", "doc_id", "source",
        budgetTokens = 512L)
      .orderBy(col("source"), col("doc_id")))

  // Deterministic 80/10/10 train/val/test split by md5-of-id: the
  // boundaries 0xcccc/0xe666 are exactly floor(0.8·65536) and
  // floor(0.9·65536); the md5-prefix CASE is mirrored verbatim by
  // the oracle, so assignment is pinned cross-engine and adding docs
  // never reassigns existing ones.
  private val t17 = Q("t17_hash_split", Some("""
    SELECT doc_id, source,
      CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
             THEN 'train'
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
             THEN 'val'
           ELSE 'test' END AS split
    FROM documents ORDER BY doc_id"""),
    (s, dir) => graft.pipeline.Sampling.hashSplit(
        T(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id")))

  // Gopher-style multi-signal quality gate: the composed filter a
  // curation pipeline actually ships — minimum length, mean-token-
  // length band, top-2-gram repetition cap, token-entropy floor. Each
  // signal is an operator with its own hash-matched query (t02, t08,
  // t15); the gate derives ALL of them from one tagged token+gram
  // stream (TextAnalysis.qualityGateSignals): one Generate, two keyed
  // exchanges — not one tokenization pass per signal. Thresholds
  // chosen so every signal bites on this corpus. The entropy
  // comparison is on the 6-dp-rounded value (both engines, per t15).
  private val t18 = Q("t18_quality_gate", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') AS gram
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)),
    gcounts AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram),
    rep AS (SELECT doc_id,
        CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS repetition_ratio
        FROM gcounts GROUP BY doc_id),
    tcounts AS (SELECT doc_id, tok, COUNT(*) AS c FROM
        (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok),
    ent AS (SELECT doc_id,
        ROUND(ln(CAST(SUM(c) AS DOUBLE))
          - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE),
          6) AS entropy
        FROM tcounts GROUP BY doc_id),
    base AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
        FROM documents)
    SELECT doc_id, n_tokens, mean_token_len, repetition_ratio, entropy
    FROM base JOIN rep USING (doc_id) JOIN ent USING (doc_id)
    WHERE n_tokens >= 20 AND mean_token_len BETWEEN 3 AND 10
      AND repetition_ratio < 0.08 AND entropy >= 3.0
    ORDER BY doc_id"""),
    (s, dir) =>
      // fused: all four signals from ONE tokenization (one Generate,
      // two keyed exchanges) — the 3-branch join re-scanned the corpus
      // per signal (round-5 verdict finding)
      TextAnalysis.qualityGateSignals(T(s, dir, "documents"), "text",
          "doc_id", n = 2)
        .where(col("n_tokens") >= 20 &&
          col("mean_token_len").between(3.0, 10.0) &&
          col("repetition_ratio") < 0.08 && col("entropy") >= 3.0)
        .select(col("id").as("doc_id"), col("n_tokens").cast("long"),
          col("mean_token_len"), col("repetition_ratio"), col("entropy"))
        .orderBy(col("doc_id")))

  // Unigram-LM log-prob (the perplexity-proxy quality filter): mean
  // ln(count(tok)/N) per doc with the model fit on the corpus itself.
  // Spark joins hashed tokens (strings never shuffle); the oracle
  // joins strings — identical counts absent 64-bit collisions, and
  // the 6-dp round absorbs ln accumulation order (t15 treatment).
  private val t19 = Q("t19_unigram_logprob", Some("""
    WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                  FROM documents),
    dc AS (SELECT doc_id, tok, COUNT(*) AS c_doc FROM toks GROUP BY doc_id, tok),
    freq AS (SELECT tok, SUM(c_doc) AS c FROM dc GROUP BY tok),
    n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM freq)
    SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
      ROUND(SUM(CAST(c_doc AS DOUBLE) * ln(CAST(c AS DOUBLE) / n_total))
        / CAST(SUM(c_doc) AS DOUBLE), 6) AS mean_logp
    FROM dc JOIN freq USING (tok), n
    GROUP BY doc_id ORDER BY doc_id"""),
    (s, dir) => TextAnalysis.unigramLogProb(T(s, dir, "documents"), "text", "doc_id")
      .select(col("id").as("doc_id"), col("n_tokens"), col("mean_logp"))
      .orderBy(col("doc_id")))

  // Multi-benchmark decontamination: per-suite hit counts, the triage
  // report a pipeline screens against many eval suites at once.
  // Suites carved deterministically from doc_id (%50 -> suiteA,
  // %49 -> suiteB — a doc divisible by both contributes to both).
  private val t21 = Q("t21_decontaminate_by_suite", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    bench AS (
      SELECT DISTINCT suite, shingle FROM (
        SELECT 'suiteA' AS suite, shingle FROM sh WHERE doc_id % 50 = 0
        UNION ALL
        SELECT 'suiteB' AS suite, shingle FROM sh WHERE doc_id % 49 = 0)),
    hits AS (SELECT s.doc_id, b.suite, CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM sh s JOIN bench b USING (shingle)
             WHERE s.doc_id % 50 <> 0 AND s.doc_id % 49 <> 0
             GROUP BY s.doc_id, b.suite)
    SELECT doc_id, suite, n_hits FROM hits ORDER BY doc_id, suite"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val bench = docs
        .where(col("doc_id") % 50 === 0 || col("doc_id") % 49 === 0)
        .withColumn("suite", explode(concat(
          when(col("doc_id") % 50 === 0, array(lit("suiteA")))
            .otherwise(array().cast("array<string>")),
          when(col("doc_id") % 49 === 0, array(lit("suiteB")))
            .otherwise(array().cast("array<string>")))))
      graft.pipeline.Decontaminate.contaminationBySuite(
          docs.where(col("doc_id") % 50 =!= 0 && col("doc_id") % 49 =!= 0),
          bench, "text", "doc_id", "suite", n = 3)
        .select(col("id").as("doc_id"), col("suite"), col("n_hits"))
        .orderBy(col("doc_id"), col("suite"))
    })

  // Bigram LM log-probability: one model order up from t19 — MLE
  // P(w2|w1) fit on the corpus, mean per doc. The context count is
  // bigram-first-token occurrences (NOT unigram counts): that is what
  // normalizes the conditional. Exact integer counts; one ROUND(6) on
  // the ln-sum (t15/t19 treatment).
  private val t22 = Q("t22_bigram_logprob", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    bg AS (SELECT doc_id, ts[i] AS w1, ts[i] || ' ' || ts[i+1] AS b
           FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
           WHERE len(ts) >= 2),
    dc AS (SELECT doc_id, w1, b, COUNT(*) AS c_doc FROM bg GROUP BY doc_id, w1, b),
    cb AS (SELECT b, SUM(c_doc) AS c12 FROM dc GROUP BY b),
    cw AS (SELECT w1, SUM(c_doc) AS c1 FROM dc GROUP BY w1)
    SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_bigrams,
      ROUND(SUM(CAST(c_doc AS DOUBLE) * ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)))
        / CAST(SUM(c_doc) AS DOUBLE), 6) AS mean_logp
    FROM dc JOIN cb USING (b) JOIN cw USING (w1)
    GROUP BY doc_id ORDER BY doc_id"""),
    (s, dir) => TextAnalysis.bigramLogProb(T(s, dir, "documents"), "text", "doc_id")
      .select(col("id").as("doc_id"), col("n_bigrams"), col("mean_logp"))
      .orderBy(col("doc_id")))

  // N-gram novelty: fraction of each doc's distinct trigram shingles
  // first seen in THIS doc under ascending doc_id — the corpus
  // freshness curve (recycled content scores ~0 even when no single
  // earlier doc is a pairwise near-dup). Shares d02/d06's shingle
  // normalization (lower, \s+ collapse).
  private val t23 = Q("t23_ngram_novelty", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    fs AS (SELECT shingle, MIN(doc_id) AS first_id FROM sh GROUP BY shingle)
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      CAST(SUM(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      ROUND(CAST(SUM(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM sh s JOIN fs f USING (shingle)
    GROUP BY s.doc_id ORDER BY s.doc_id"""),
    (s, dir) => TextAnalysis.ngramNovelty(T(s, dir, "documents"), "text", "doc_id",
        n = 3)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_novel"),
        col("novelty"))
      .orderBy(col("doc_id")))

  // PII redaction with the RE2-subset rule chain: the fixture corpus
  // carries no PII, so BOTH engines first augment each doc with the
  // same synthetic identifiers (email/IP/SSN derived from doc_id) —
  // the regex parity check is then non-vacuous: every rule fires on
  // every row, ordering matters (IP before PHONE, EMAIL before SSN),
  // and n_redactions counts only placeholders ADDED by the pass.
  private val t25 = Q("t25_pii_redaction", Some("""
    WITH aug AS (SELECT doc_id,
        text || ' contact doc' || doc_id || '@example.com or 10.0.' ||
          (doc_id % 256) || '.1 ssn 123-45-6789' AS t
      FROM documents),
    s AS (SELECT doc_id, t,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
          '\b(?:\d[ -]?){13,16}\b', '<CARD>', 'g'),
          '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
          '\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}', '<PHONE>', 'g')
        AS scrubbed
      FROM aug)
    SELECT doc_id, scrubbed, CAST(
        (length(scrubbed) - length(replace(scrubbed, '<EMAIL>', ''))) / 7.0
      - (length(t) - length(replace(t, '<EMAIL>', ''))) / 7.0
      + (length(scrubbed) - length(replace(scrubbed, '<SSN>', ''))) / 5.0
      - (length(t) - length(replace(t, '<SSN>', ''))) / 5.0
      + (length(scrubbed) - length(replace(scrubbed, '<CARD>', ''))) / 6.0
      - (length(t) - length(replace(t, '<CARD>', ''))) / 6.0
      + (length(scrubbed) - length(replace(scrubbed, '<IP>', ''))) / 4.0
      - (length(t) - length(replace(t, '<IP>', ''))) / 4.0
      + (length(scrubbed) - length(replace(scrubbed, '<PHONE>', ''))) / 7.0
      - (length(t) - length(replace(t, '<PHONE>', ''))) / 7.0
      AS BIGINT) AS n_redactions
    FROM s ORDER BY doc_id"""),
    (s, dir) => {
      val aug = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact doc"), col("doc_id").cast("string"),
          lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".1 ssn 123-45-6789")).as("t"))
      graft.pipeline.TextRedaction.scrub(aug, "t")
        .select(col("doc_id"), col("scrubbed"), col("n_redactions"))
        .orderBy(col("doc_id"))
    })

  // Count-min-sketch token frequencies: deterministic md5-derived row
  // hashes make the whole 4×1024 sketch oracle-reproducible — the
  // mergeable heavy-hitter structure, hash-proven like d12/d13, with
  // the exact count alongside the (always >=) estimate.
  private val t24 = Q("t24_heavy_hitters_cms", Some("""
    WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
    counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
    buckets AS (SELECT tok, cnt, j,
        ((strpos('0123456789abcdef', substr(md5(j || ':' || tok), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(j || ':' || tok), 4, 1)) - 1)) % 1024 AS b
      FROM counts, UNNEST(generate_series(0, 3)) AS g(j)),
    cells AS (SELECT j, b, SUM(cnt) AS cell FROM buckets GROUP BY j, b),
    top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 20)
    SELECT t.tok, t.cnt, CAST(MIN(c.cell) AS BIGINT) AS cms_est
    FROM top t JOIN buckets bu USING (tok) JOIN cells c ON c.j = bu.j AND c.b = bu.b
    GROUP BY t.tok, t.cnt ORDER BY t.cnt DESC, t.tok"""),
    (s, dir) => TextAnalysis.heavyHittersCms(T(s, dir, "documents"), "text",
        k = 20, depth = 4, width = 1024)
      .orderBy(col("cnt").desc, col("tok")))

  // Temperature-scaled source mixing (α-sampling, mT5/XLM-R recipe):
  // w_s ∝ n_s^α with α=0.5 — sqrt is IEEE-exact cross-engine, so only
  // the tiny Σ over strata rows needs the ROUND(6) contract. The
  // fixture's 20 sources are uniform (vacuously flat weights), so the
  // query derives a SKEWED tier from the source suffix (1:4:15-ish) —
  // the up-weighting of the rare tier is then the visible, checkable
  // effect.
  private val t28 = Q("t28_temperature_mix", Some("""
    WITH tiers AS (SELECT CASE
          WHEN CAST(substr(source, 4) AS INT) < 1 THEN 'rare'
          WHEN CAST(substr(source, 4) AS INT) < 5 THEN 'mid'
          ELSE 'common' END AS source
        FROM documents),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM tiers GROUP BY source),
    t AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS p FROM s)
    SELECT source, n_docs,
      ROUND(CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE)) OVER (), 6)
        AS natural_frac,
      ROUND(p / SUM(p) OVER (), 6) AS temp_weight
    FROM t ORDER BY source"""),
    (s, dir) => {
      val sfx = substring(col("source"), 4, 10).cast("int")
      val tiered = T(s, dir, "documents").withColumn("source",
        when(sfx < 1, "rare").when(sfx < 5, "mid").otherwise("common"))
      graft.pipeline.Sampling.temperatureWeights(tiered, "source", alpha = 0.5)
        .orderBy(col("source"))
    })

  // Jelinek-Mercer interpolated LM: λ·P(w2|w1) + (1−λ)·P(w2), λ=0.5
  // (exactly representable, so 1−λ carries no ulp hazard — the s21
  // lesson applied by construction). One hash join beyond t22; the
  // oracle rebuilds all three count tables declaratively.
  private val t27 = Q("t27_interpolated_logprob", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM
            (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok),
    n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM u),
    bg AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, ts[i] || ' ' || ts[i+1] AS b
           FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
           WHERE len(ts) >= 2),
    dc AS (SELECT doc_id, w1, w2, b, COUNT(*) AS c_doc FROM bg GROUP BY doc_id, w1, w2, b),
    cb AS (SELECT b, SUM(c_doc) AS c12 FROM dc GROUP BY b),
    cw AS (SELECT w1, SUM(c_doc) AS c1 FROM dc GROUP BY w1)
    SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_bigrams,
      ROUND(SUM(CAST(c_doc AS DOUBLE) * ln(
          CAST(0.5 AS DOUBLE) * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
          + (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) * (CAST(cu AS DOUBLE) / n_total)))
        / CAST(SUM(c_doc) AS DOUBLE), 6) AS mean_logp
    FROM dc JOIN cb USING (b) JOIN cw USING (w1) JOIN u ON u.tok = dc.w2, n
    GROUP BY doc_id ORDER BY doc_id"""),
    (s, dir) => TextAnalysis.interpolatedLogProb(T(s, dir, "documents"), "text",
        "doc_id", lambda = 0.5)
      .select(col("id").as("doc_id"), col("n_bigrams"), col("mean_logp"))
      .orderBy(col("doc_id")))

  // Zipf rank-frequency fit: OLS on (ln rank, ln count) of the top-100
  // token types — the one-glance corpus-health check (slope ≈ −1 is
  // healthy). Both engines derive the same integer counts and rank
  // order; the three ln-sum statistics carry the t15 ROUND(6)
  // contract.
  private val t26 = Q("t26_zipf_fit", Some("""
    WITH counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100),
    ranked AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS r FROM counts),
    xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM ranked),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
            SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy FROM xy)
    SELECT CAST(n AS BIGINT) AS n_ranks,
      ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0), 6) AS slope,
      ROUND((sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0)) * sx)
        / NULLIF(n, 0.0), 6) AS intercept,
      ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0), 6) AS r2
    FROM s"""),
    (s, dir) => TextAnalysis.zipfFit(T(s, dir, "documents"), "text", topN = 100))

  // Vocabulary coverage: the tokenizer-prep rollup — top-k token
  // types with exact cumulative corpus coverage. Integer counts, one
  // IEEE division per row: no rounding contract needed.
  private val t20 = Q("t20_vocab_coverage", Some("""
    WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
    counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM counts),
    top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 100)
    SELECT tok, cnt,
      CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank,
      CAST(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / tot AS coverage
    FROM top, total ORDER BY rank"""),
    (s, dir) => graft.pipeline.TextAnalysis.vocabCoverage(
        T(s, dir, "documents"), "text", k = 100)
      .orderBy(col("rank")))

  // Data-mixing resampler: per-source quotas (top-k by the stable md5
  // rank) plus epoch upsampling — 8×1 epoch for src0-4, 4×2 for
  // src5-9, 2×3 for src10-19.
  private val sourceMixCfg: Map[String, (Int, Int)] = (0 until 20).map { i =>
    s"src$i" -> (if (i < 5) (8, 1) else if (i < 10) (4, 2) else (2, 3))
  }.toMap

  private val t10 = Q("t10_source_mix", Some("""
    SELECT source, doc_id, sample_rank, CAST(epoch AS BIGINT) AS epoch FROM (
      SELECT source, doc_id,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      FROM documents) r,
      UNNEST(generate_series(1, CASE
        WHEN source IN ('src0','src1','src2','src3','src4') THEN 1
        WHEN source IN ('src5','src6','src7','src8','src9') THEN 2
        ELSE 3 END)) AS e(epoch)
    WHERE sample_rank <= CASE
        WHEN source IN ('src0','src1','src2','src3','src4') THEN 8
        WHEN source IN ('src5','src6','src7','src8','src9') THEN 4
        ELSE 2 END
    ORDER BY source, sample_rank, epoch"""),
    (s, dir) => graft.pipeline.Sampling.sourceMix(
        T(s, dir, "documents"), "source", "doc_id", sourceMixCfg)
      .select(col("source"), col("doc_id"), col("sample_rank"), col("epoch"))
      .orderBy(col("source"), col("sample_rank"), col("epoch")))

  // Characteristic keywords by tf-idf with a RAW N/df inverse
  // frequency (ln is not bit-identical across libms; one IEEE
  // division and multiply are — the score stays oracle-exact).
  private val t11 = Q("t11_tfidf_keywords", Some("""
    WITH toks AS (SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
           FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tok, tf, df,
        ROUND(tf * (n_docs / df), 6) AS score
      FROM tf JOIN dfreq USING (tok), n),
    ranked AS (
      SELECT doc_id, tok, tf, df, score,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk
      FROM scored)
    SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""),
    (s, dir) => TextAnalysis.tfidfKeywords(T(s, dir, "documents"), "text", "doc_id", k = 3)
      .orderBy(col("doc_id"), col("rnk")))

  // Corpus report (the curation dashboard shape): per (source, lang)
  // doc/char/token rollups. All sums are exact integers, so the one
  // avg division is bit-identical cross-engine — no rounding needed.
  private val t12 = Q("t12_corpus_report", Some("""
    SELECT source, lang, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
      AVG(CAST(len(string_split(text, ' ')) AS BIGINT)) AS avg_tokens,
      CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source, lang ORDER BY source, lang"""),
    (s, dir) => T(s, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
        avg(TextAnalysis.tokenCount(col("text"))).as("avg_tokens"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("lang")))

  // Frame sampling (video keyframe shape): every 2nd 256-byte frame
  // of each payload, digested. The oracle slices the hex rendering
  // (2 chars/byte) since DuckDB cannot substring blobs — both engines
  // hash the identical uppercase-hex frame text.
  private val m03 = Q("m03_frame_sample", Some("""
    WITH m AS (SELECT doc_id AS sample_id, hex(CAST(text AS BLOB)) AS hx,
                 octet_length(CAST(text AS BLOB)) AS nb FROM documents),
    f AS (SELECT sample_id, hx, nb,
            unnest(generate_series(0, CAST(FLOOR((nb - 1) / 256.0) AS BIGINT))) AS fi
          FROM m)
    SELECT sample_id, CAST(fi AS INT) AS frame_idx,
      md5(substring(hx, CAST(fi * 512 + 1 AS BIGINT), 512)) AS frame_md5,
      CAST(LEAST(nb - fi * 256, 256) AS BIGINT) AS frame_bytes
    FROM f WHERE fi % 2 = 0 ORDER BY sample_id, frame_idx"""),
    (s, dir) => Multimodal.sampleFrames(
        Multimodal.textAsMedia(T(s, dir, "documents"), "doc_id", "text"),
        frameBytes = 256, every = 2)
      .select(col("sample_id"), col("frame_idx"), col("frame_md5"), col("frame_bytes"))
      .orderBy(col("sample_id"), col("frame_idx")))

  // REAL codec roundtrip (not FakeDecoder): each doc's bytes become a
  // 16-bit mono PCM signal inside an actual RIFF/WAVE container
  // (Multimodal.textAsWav), and Multimodal.decodeWav parses the
  // container back — magic, chunk walk, little-endian samples. The
  // oracle never sees the container: it derives every decoded field
  // (header values, sample count, duration, mean|s|, RMS) from the
  // ground-truth text directly, so a parser that misreads any header
  // byte or sample hash-mismatches. All sums are of exactly-
  // representable integers (|s| <= 32640, squares < 2^31, docs <
  // 2^21 bytes), so double accumulation is bit-stable across engines.
  // Both sides pin to ASCII-only docs (octet_length = char length):
  // the engine samples UTF-8 BYTES while the oracle iterates CODE
  // POINTS, and the two only agree when every char is one byte — the
  // explicit filter keeps the hash-match corpus-proof instead of
  // silently depending on the current corpus being pure ASCII.
  private val m04 = Q("m04_wav_decode", Some("""
    SELECT doc_id AS sample_id,
      CAST(44 + 2 * octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      CAST(16000 AS BIGINT) AS sample_rate,
      CAST(1 AS BIGINT) AS n_channels,
      CAST(16 AS BIGINT) AS bits_per_sample,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_samples,
      CAST(octet_length(CAST(text AS BLOB)) * 1000 // 16000 AS BIGINT) AS duration_ms,
      CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c) * 128.0)) AS DOUBLE)
        / octet_length(CAST(text AS BLOB)) AS mean_abs,
      sqrt(CAST(list_sum(list_transform(string_split(text, ''), c -> pow(ord(c) * 128.0, 2))) AS DOUBLE)
        / octet_length(CAST(text AS BLOB))) AS rms
    FROM documents
    WHERE octet_length(CAST(text AS BLOB)) > 0
      AND octet_length(CAST(text AS BLOB)) = length(text)
    ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodeWav(Multimodal.textAsWav(docs, "doc_id", "text"))
        .toDF()
        .select(col("sample_id"), col("n_bytes"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_channels").cast("long").as("n_channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_samples"), col("duration_ms"), col("mean_abs"), col("rms"))
        .orderBy(col("sample_id"))
    })

  // Second REAL codec roundtrip: each doc's bytes become pixels of an
  // actual 24bpp bottom-up BMP (width 10 → stored row stride 32, i.e.
  // REAL 4-byte row padding), channels (B=byte, G=255−byte,
  // R=2·byte mod 256) so a BGR-order mixup is visible. The oracle
  // derives every decoded field from the ground-truth text: header
  // fields from the container math, channel means over all pixels
  // (zero pads included), and the top-left pixel — which bottom-up
  // storage puts in the LAST stored row, so a decoder that walks
  // top-down fails exactly there. ASCII pin as in m04 (code point =
  // byte); integer sums → exact doubles, no rounding needed.
  private val m05 = Q("m05_bmp_decode", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs,
        substr(text, 1, 1) AS c1
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text))
    SELECT doc_id AS sample_id,
      CAST(54 + 32 * h AS BIGINT) AS n_bytes,
      CAST(10 AS BIGINT) AS width,
      CAST(h AS BIGINT) AS height,
      CAST(24 AS BIGINT) AS bits_per_pixel,
      CAST(10 * h AS BIGINT) AS n_pixels,
      CAST(list_sum(list_transform(cs, c -> ord(c))) AS DOUBLE)
        / (10 * h) AS mean_b,
      CAST(list_sum(list_transform(cs, c -> 255 - ord(c))) AS DOUBLE)
        / (10 * h) AS mean_g,
      CAST(list_sum(list_transform(cs, c -> (2 * ord(c)) % 256)) AS DOUBLE)
        / (10 * h) AS mean_r,
      CAST(ord(c1) AS BIGINT) AS top_left_b
    FROM d ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodeBmp(Multimodal.textAsBmp(docs, "doc_id", "text", width = 10))
        .toDF()
        .select(col("sample_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("bits_per_pixel").cast("long").as("bits_per_pixel"),
          col("n_pixels"), col("mean_b"), col("mean_g"), col("mean_r"),
          col("top_left_b").cast("long").as("top_left_b"))
        .orderBy(col("sample_id"))
    })

  // REAL resize roundtrip: text → BMP (10-wide) → nearest-neighbor
  // resample to 4×6 → re-encode → decode. The oracle recomputes every
  // output pixel from the ground-truth text via the same integer
  // coordinate map (src = (⌊r·h/6⌋, ⌊c·10/4⌋)), so a resampler that
  // rounds instead of floors, swaps axes, or misreads the re-encoded
  // container hash-mismatches. Constant output geometry (stride 12,
  // 126 bytes); ASCII pin as in m04/m05.
  private val m06 = Q("m06_bmp_resize", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs,
        substr(text, 1, 1) AS c1
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    v AS (SELECT doc_id, c1, idx,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE NULL END AS b
      FROM (SELECT doc_id, nb, cs, c1,
              ((r * h) // 6) * 10 + (c * 10) // 4 AS idx
            FROM d, UNNEST(generate_series(0, 5)) AS gr(r),
                   UNNEST(generate_series(0, 3)) AS gc(c)))
    SELECT doc_id AS sample_id,
      CAST(126 AS BIGINT) AS n_bytes,
      CAST(4 AS BIGINT) AS width,
      CAST(6 AS BIGINT) AS height,
      CAST(24 AS BIGINT) AS bits_per_pixel,
      CAST(24 AS BIGINT) AS n_pixels,
      CAST(SUM(COALESCE(b, 0)) AS DOUBLE) / 24 AS mean_b,
      CAST(SUM(CASE WHEN b IS NULL THEN 0 ELSE 255 - b END) AS DOUBLE) / 24 AS mean_g,
      CAST(SUM(COALESCE((2 * b) % 256, 0)) AS DOUBLE) / 24 AS mean_r,
      CAST(ord(c1) AS BIGINT) AS top_left_b
    FROM v GROUP BY doc_id, c1 ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodeBmp(Multimodal.resizeBmp(
          Multimodal.textAsBmp(docs, "doc_id", "text", width = 10), 4, 6))
        .toDF()
        .select(col("sample_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("bits_per_pixel").cast("long").as("bits_per_pixel"),
          col("n_pixels"), col("mean_b"), col("mean_g"), col("mean_r"),
          col("top_left_b").cast("long").as("top_left_b"))
        .orderBy(col("sample_id"))
    })

  // REAL audio resample roundtrip: 16 kHz text-signal → 4 kHz (keep
  // every 4th sample under the integer map src=⌊i·16000/4000⌋=4i) →
  // re-encode → decode. The oracle derives the surviving samples
  // (bytes 1, 5, 9, … of the text) and their stats directly, so an
  // off-by-one in the resample map or a header misread at the new
  // rate hash-mismatches. Docs shorter than 4 bytes resample to zero
  // samples — filtered on BOTH sides (0/0 means vs empty-signal 0.0
  // would diverge); ASCII pin as in m04.
  private val m07 = Q("m07_wav_resample", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        octet_length(CAST(text AS BLOB)) // 4 AS n_out,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) >= 4
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    v AS (SELECT doc_id, n_out, ord(cs[CAST(4 * i + 1 AS BIGINT)]) * 128.0 AS s
          FROM d, UNNEST(generate_series(0, n_out - 1)) AS g(i))
    SELECT doc_id AS sample_id,
      CAST(44 + 2 * n_out AS BIGINT) AS n_bytes,
      CAST(4000 AS BIGINT) AS sample_rate,
      CAST(1 AS BIGINT) AS n_channels,
      CAST(16 AS BIGINT) AS bits_per_sample,
      CAST(n_out AS BIGINT) AS n_samples,
      CAST(n_out * 1000 // 4000 AS BIGINT) AS duration_ms,
      CAST(SUM(s) AS DOUBLE) / n_out AS mean_abs,
      sqrt(CAST(SUM(s * s) AS DOUBLE) / n_out) AS rms
    FROM v GROUP BY doc_id, n_out ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) >= 4 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodeWav(Multimodal.resampleWav(
          Multimodal.textAsWav(docs, "doc_id", "text", sampleRate = 16000), 4000))
        .toDF()
        .select(col("sample_id"), col("n_bytes"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_channels").cast("long").as("n_channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_samples"), col("duration_ms"), col("mean_abs"), col("rms"))
        .orderBy(col("sample_id"))
    })

  // Naive-Bayes quality-classifier score: the fastText/CCNet-style
  // quality filter's counts-only core — mean token log-likelihood
  // ratio vs a deterministic trusted class (lang='en' here), add-one
  // smoothed. Every quantity is integer counts + IEEE ln, so DuckDB
  // reconstructs the classifier end to end; 6 dp round on the final
  // mean (ln accumulation order).
  private val t29 = Q("t29_nb_quality_score", Some("""
    WITH toks AS (SELECT doc_id,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab,
        UNNEST(string_split(text, ' ')) AS tok FROM documents),
    dc AS (SELECT doc_id, lab, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2, 3),
    cls AS (SELECT tok, CAST(SUM(lab * c) AS BIGINT) AS cpos,
            CAST(SUM((1 - lab) * c) AS BIGINT) AS cneg
            FROM dc GROUP BY tok),
    tot AS (SELECT CAST(SUM(cpos) AS DOUBLE) AS npos,
            CAST(SUM(cneg) AS DOUBLE) AS nneg,
            CAST(COUNT(*) AS DOUBLE) AS v FROM cls)
    SELECT dc.doc_id AS id, CAST(dc.lab AS BIGINT) AS label,
      CAST(SUM(dc.c) AS BIGINT) AS n_tokens,
      ROUND(SUM(CAST(dc.c AS DOUBLE) *
        (ln((CAST(cls.cpos AS DOUBLE) + 1.0) / (tot.npos + tot.v)) -
         ln((CAST(cls.cneg AS DOUBLE) + 1.0) / (tot.nneg + tot.v)))) /
        CAST(SUM(dc.c) AS DOUBLE), 6) AS mean_llr
    FROM dc JOIN cls USING (tok), tot
    GROUP BY dc.doc_id, dc.lab ORDER BY id"""),
    (s, dir) => TextAnalysis.nbQualityScore(T(s, dir, "documents"),
        "text", "doc_id", positive = col("lang") === "en")
      .orderBy(col("id")))

  // DSIR-style importance weight: log ratio of a doc's bigram
  // features under the target-domain distribution (source='src0')
  // vs the raw corpus, add-one smoothed — resample ∝ exp(log_weight)
  // to shift the corpus toward the target domain. Counts + IEEE ln
  // end to end; 6 dp round on the feature-sum.
  private val t30 = Q("t30_importance_weights", Some("""
    WITH toks AS (SELECT doc_id, source = 'src0' AS tgt,
        string_split(text, ' ') AS ts FROM documents),
    bg AS (SELECT doc_id, tgt, ts[i] || ' ' || ts[i+1] AS b
           FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
           WHERE len(ts) >= 2),
    dc AS (SELECT doc_id, tgt, b, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2, 3),
    fr AS (SELECT b, CAST(SUM(c) AS BIGINT) AS craw,
           CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ctgt
           FROM dc GROUP BY b),
    tot AS (SELECT CAST(SUM(craw) AS DOUBLE) AS nraw,
            CAST(SUM(ctgt) AS DOUBLE) AS ntgt,
            CAST(COUNT(*) AS DOUBLE) AS v FROM fr)
    SELECT dc.doc_id AS id, dc.tgt AS is_target,
      CAST(SUM(dc.c) AS BIGINT) AS n_bigrams,
      ROUND(SUM(CAST(dc.c AS DOUBLE) *
        (ln((CAST(fr.ctgt AS DOUBLE) + 1.0) / (tot.ntgt + tot.v)) -
         ln((CAST(fr.craw AS DOUBLE) + 1.0) / (tot.nraw + tot.v)))), 6) AS log_weight
    FROM dc JOIN fr USING (b), tot
    GROUP BY dc.doc_id, dc.tgt ORDER BY id"""),
    (s, dir) => TextAnalysis.importanceWeights(T(s, dir, "documents"),
        "text", "doc_id", target = col("source") === "src0")
      .orderBy(col("id")))

  // Interpolated Kneser-Ney bigram LM: continuation-probability
  // smoothing (the KenLM default) — everything derives from the one
  // distinct-bigram table, no separate unigram pass; exact integer
  // counts + IEEE ln under the t15 ROUND(6) contract.
  private val t31 = Q("t31_kneser_ney_logprob", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    bi AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
           FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
           WHERE len(ts) >= 2),
    per AS (SELECT doc_id, w1, w2, COUNT(*) AS cd FROM bi GROUP BY 1, 2, 3),
    bt AS (SELECT w1, w2, CAST(SUM(cd) AS BIGINT) AS c12 FROM per GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS nf
            FROM bt GROUP BY 1),
    bwd AS (SELECT w2, COUNT(*) AS nb FROM bt GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS bb FROM bt)
    SELECT doc_id AS id, CAST(SUM(cd) AS BIGINT) AS n_bigrams,
      ROUND(SUM(CAST(cd AS DOUBLE) * ln(
        (GREATEST(CAST(c12 AS DOUBLE) - 0.75, 0.0) +
          0.75 * CAST(nf AS DOUBLE) * (CAST(nb AS DOUBLE) / bb)) /
        CAST(c1 AS DOUBLE))) / CAST(SUM(cd) AS DOUBLE), 6) AS mean_logp
    FROM per JOIN bt USING (w1, w2) JOIN ctx USING (w1) JOIN bwd USING (w2), tot
    GROUP BY doc_id ORDER BY id"""),
    (s, dir) => TextAnalysis.kneserNeyLogProb(T(s, dir, "documents"), "text",
        "doc_id", discount = 0.75)
      .orderBy(col("id")))

  // Bloom-filter decontamination probe: benchmark (doc_id % 50 = 0)
  // compressed to a 4096-bit / 3-hash Bloom filter with md5-derived
  // positions (the t24 cmsBucket move), candidates probe map-side;
  // exact hits reported beside the bloom hits so the false-positive
  // gap is itself oracle-checked (bloom >= exact pinned in spec).
  private val t32 = Q("t32_bloom_decontaminate", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    bits AS (SELECT DISTINCT (
          (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 4, 1)) - 1)) % 4096 AS p
      FROM bench, UNNEST(generate_series(0, 2)) AS g(j)),
    cand AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
    pr AS (SELECT doc_id, shingle, (
          (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(j || ':' || shingle), 4, 1)) - 1)) % 4096 AS p
      FROM cand, UNNEST(generate_series(0, 2)) AS g(j)),
    hit AS (SELECT doc_id, shingle, MIN(CASE WHEN b.p IS NULL THEN 0 ELSE 1 END) AS bh
            FROM pr LEFT JOIN bits b USING (p) GROUP BY doc_id, shingle),
    ex AS (SELECT c.doc_id, c.shingle, CASE WHEN be.shingle IS NULL THEN 0 ELSE 1 END AS eh
           FROM cand c LEFT JOIN bench be USING (shingle))
    SELECT h.doc_id AS id, COUNT(*) AS n_shingles,
      CAST(SUM(h.bh) AS BIGINT) AS bloom_hits,
      CAST(SUM(e.eh) AS BIGINT) AS exact_hits
    FROM hit h JOIN ex e ON e.doc_id = h.doc_id AND e.shingle = h.shingle
    GROUP BY h.doc_id ORDER BY id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.bloomContamination(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3, mBits = 4096, kHash = 3)
        .orderBy(col("id"))
    })

  // Weighted reservoir sample (Efraimidis-Spirakis A-ES keys with
  // md5-deterministic uniforms): top-5 per source proportional to
  // n_chars. The deterministic u makes the exact draw
  // oracle-reconstructible; priority ROUND(6) is the only float in
  // the output.
  private val t33 = Q("t33_weighted_sample", Some("""
    WITH pr AS (SELECT source, doc_id, n_chars,
        ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE) + 1.0)
           / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS p
      FROM documents WHERE n_chars > 0),
    rk AS (SELECT source, doc_id, n_chars, p,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY p DESC, doc_id) AS sample_rank
      FROM pr)
    SELECT source, doc_id, n_chars, ROUND(p, 6) AS priority,
      CAST(sample_rank AS BIGINT) AS sample_rank
    FROM rk WHERE sample_rank <= 5 ORDER BY source, sample_rank"""),
    (s, dir) => graft.pipeline.Sampling.weightedSample(
        T(s, dir, "documents"), "source", "doc_id", "n_chars", k = 5)
      .orderBy(col("source"), col("sample_rank")))

  // Exact grouped ROC-AUC (Mann-Whitney on score-aggregated counts,
  // mid-rank ties): does token entropy (the t15 score, ROUND(6) so
  // tie structure is cross-engine exact) rank lang='en' docs above
  // the rest, per source? Integer pair counts until one final
  // division.
  private val t34 = Q("t34_classifier_auc", Some("""
    WITH counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM
        (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok),
    ent AS (SELECT doc_id,
        ROUND(ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6) AS s
      FROM counts GROUP BY doc_id),
    sc AS (SELECT d.source AS grp, e.s, (d.lang = 'en') AS pos
           FROM ent e JOIN documents d USING (doc_id)),
    g AS (SELECT grp, s, CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
            CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
          FROM sc GROUP BY grp, s),
    cum AS (SELECT grp, s, np, nn,
        COALESCE(SUM(nn) OVER (PARTITION BY grp ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn FROM g),
    agg AS (SELECT grp, CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
        CAST(SUM(np * cum_nn * 2 + np * nn) AS BIGINT) AS wins2 FROM cum GROUP BY grp)
    SELECT grp AS source, n_pos, n_neg,
      ROUND(CAST(wins2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0 ORDER BY source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = TextAnalysis.tokenEntropy(docs, "text", "doc_id")
        .select(col("id").as("doc_id"), col("entropy"))
        .join(docs.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
      TextAnalysis.classifierAuc(scored, "source", "entropy",
          col("lang") === "en")
        .orderBy(col("source"))
    })

  // THIRD real codec roundtrip, video: text → uncompressed RIFF-AVI
  // (5×2 DIB frames, 10 text bytes each, stored row stride 16 = real
  // padding) → container parse → per-FRAME pixel stats. The oracle
  // rebuilds every frame from the ground-truth text via the same
  // byte map (frame f pixel i ← byte f·10+i, zero-padded tail), so a
  // decoder that miswalks the chunk tree, reads rows top-down, or
  // mixes channels hash-mismatches. n_bytes pins the whole container
  // layout (232 + 56·n_frames); ASCII pin as in m04/m05.
  private val m08 = Q("m08_avi_frame_stats", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    v AS (SELECT doc_id, nb, nf, f, i,
        CASE WHEN f * 10 + i < nb THEN ord(cs[CAST(f * 10 + i + 1 AS BIGINT)])
             ELSE NULL END AS b
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f),
             UNNEST(generate_series(0, 9)) AS gi(i))
    SELECT doc_id AS sample_id,
      CAST(232 + 56 * nf AS BIGINT) AS n_bytes,
      CAST(5 AS BIGINT) AS width,
      CAST(2 AS BIGINT) AS height,
      CAST(10 AS BIGINT) AS fps,
      CAST(nf AS BIGINT) AS n_frames,
      CAST(f AS BIGINT) AS frame_idx,
      CAST(SUM(COALESCE(b, 0)) AS DOUBLE) / 10 AS mean_b,
      CAST(SUM(CASE WHEN b IS NULL THEN 0 ELSE 255 - b END) AS DOUBLE) / 10 AS mean_g,
      CAST(SUM(COALESCE((2 * b) % 256, 0)) AS DOUBLE) / 10 AS mean_r,
      CAST(MAX(CASE WHEN i = 0 THEN b END) AS BIGINT) AS top_left_b
    FROM v GROUP BY doc_id, nf, f ORDER BY sample_id, frame_idx"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodeAviFrames(Multimodal.textAsAvi(docs, "doc_id", "text",
          width = 5, height = 2, usPerFrame = 100000))
        .toDF()
        .select(col("sample_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("fps").cast("long").as("fps"),
          col("n_frames"), col("frame_idx"),
          col("mean_b"), col("mean_g"), col("mean_r"),
          col("top_left_b").cast("long").as("top_left_b"))
        .orderBy(col("sample_id"), col("frame_idx"))
    })

  // Corpus-level PMI collocations: top-30 adjacent pairs by pointwise
  // mutual information with a min-count floor. Counts are exact
  // integers off one bigram stream; PMI is one IEEE division + ln,
  // ranked pre-round with (w1,w2) tie-breaks so the top-k cut is
  // cross-engine identical.
  private val t35 = Q("t35_pmi_collocations", Some("""
    WITH bg AS (
      SELECT ts[i] AS w1, ts[i+1] AS w2, COUNT(*) AS c12 FROM
        (SELECT string_split(text, ' ') AS ts FROM documents),
        UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
      GROUP BY 1, 2),
    l AS (SELECT w1, SUM(c12) AS c1 FROM bg GROUP BY w1),
    r AS (SELECT w2, SUM(c12) AS c2 FROM bg GROUP BY w2),
    n AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n_total FROM bg),
    sc AS (SELECT bg.w1, bg.w2, bg.c12,
        ln((CAST(bg.c12 AS DOUBLE) * n.n_total) /
           (CAST(l.c1 AS DOUBLE) * CAST(r.c2 AS DOUBLE))) AS pmi_raw
      FROM bg JOIN l USING (w1) JOIN r USING (w2), n
      WHERE bg.c12 >= 5)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, ROUND(pmi_raw, 6) AS pmi
    FROM sc ORDER BY pmi_raw DESC, w1, w2 LIMIT 30"""),
    (s, dir) => TextAnalysis.pmiCollocations(T(s, dir, "documents"), "text",
      k = 30, minCount = 5L))

  // Pairwise source-vocabulary overlap (Jaccard + both containments)
  // over all 190 source pairs — the corpus-level near-dup fingerprint
  // document-pair dedup can't see. Engine intersects xxhash64 token
  // hashes; the oracle intersects the token strings (t23 treatment).
  private val t36 = Q("t36_vocab_overlap", Some("""
    WITH v AS (SELECT DISTINCT source AS g, tok FROM
        (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents)),
    s AS (SELECT g, COUNT(*) AS vs FROM v GROUP BY g),
    i AS (SELECT a.g AS ga, b.g AS gb, COUNT(*) AS inter
          FROM v a JOIN v b ON a.tok = b.tok AND a.g < b.g GROUP BY 1, 2),
    grid AS (SELECT sa.g AS ga, sa.vs AS va, sb.g AS gb, sb.vs AS vb
             FROM s sa, s sb WHERE sa.g < sb.g)
    SELECT grid.ga AS group_a, grid.gb AS group_b,
      CAST(grid.va AS BIGINT) AS vocab_a, CAST(grid.vb AS BIGINT) AS vocab_b,
      CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
      ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE) /
        CAST(grid.va + grid.vb - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jaccard,
      ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE) / CAST(grid.va AS DOUBLE), 6)
        AS containment_a,
      ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE) / CAST(grid.vb AS DOUBLE), 6)
        AS containment_b
    FROM grid LEFT JOIN i ON i.ga = grid.ga AND i.gb = grid.gb
    ORDER BY group_a, group_b"""),
    (s, dir) => TextAnalysis.vocabOverlap(T(s, dir, "documents"), "text", "source")
      .orderBy(col("group_a"), col("group_b")))

  // Boilerplate chunk REMOVAL (CCNet paragraph dedup over fixed-width
  // chunks): rebuild each doc keeping only 8-token chunks present in
  // <= 2 documents. The oracle reassembles from chunk STRINGS via
  // ordered string_agg; the engine moves only hashes until the one
  // id-keyed rebuild join — a mis-ordered or off-by-one rebuild
  // hash-mismatches on text_kept.
  private val d18 = Q("d18_chunk_removal", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    ch AS (SELECT doc_id, c, array_to_string(ts[c*8+1 : c*8+8], ' ') AS chunk
           FROM toks, UNNEST(generate_series(0, (len(ts)-1)//8)) AS u(c)),
    df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
    keep AS (SELECT doc_id, c, chunk FROM ch JOIN df USING (chunk) WHERE df <= 2)
    SELECT t.doc_id AS id,
      COALESCE(string_agg(k.chunk, ' ' ORDER BY k.c), '') AS text_kept,
      CAST((len(t.ts)-1)//8 + 1 AS BIGINT) AS n_chunks,
      CAST(COUNT(k.c) AS BIGINT) AS n_kept,
      CAST((len(t.ts)-1)//8 + 1 - COUNT(k.c) AS BIGINT) AS n_dropped
    FROM toks t LEFT JOIN keep k USING (doc_id)
    GROUP BY t.doc_id, len(t.ts)
    ORDER BY id"""),
    (s, dir) => Dedup.dropCommonChunks(T(s, dir, "documents"), "text", "doc_id",
      chunkTokens = 8, maxDf = 2L).orderBy(col("id")))

  // Hard-negative mining: top-5 most-similar DIFFERENT-label corpus
  // vectors per anchor (vec_id < 5). The s04 exact-cosine kernel plus
  // a label-exclusion predicate evaluated before the kernel.
  private val s22 = Q("s22_hard_negatives", Some("""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id, e.label,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
      FROM embeddings e, q WHERE e.label <> q.ql),
    ranked AS (
      SELECT query_id, vec_id, label, cos_sim,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, label, cos_sim, rank FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", "label", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })

  // Johnson-Lindenstrauss random projection 64-d float -> 16-d
  // double via a driver-precomputed md5-parity Rademacher sign
  // matrix riding inside the codegen'd MatVecProject kernel. The
  // oracle recomputes every sign and fold sequentially in SQL — a
  // kernel that hashes differently, folds out of order, or scales
  // per-element instead of once hash-mismatches. Final schema is
  // exploded to scalar (vec_id, j, value) rows: the driver's
  // comparator sorts/hashes via pandas, which cannot hash an ARRAY
  // cell (the one r9 comparator crash), and exploding loses nothing
  // — every component is still graded.
  private val s23 = Q("s23_random_projection", Some("""
    SELECT vec_id, j,
      ROUND(list_sum(list_transform(generate_series(1, len(embedding)), i ->
        CAST(embedding[i] AS DOUBLE) *
        (CASE WHEN (strpos('0123456789abcdef',
            substr(md5(j || ':' || (i - 1)), 1, 1)) - 1) % 2 = 0
          THEN 1.0 ELSE -1.0 END)))
       / sqrt(CAST(16 AS DOUBLE)), 6) AS value
    FROM embeddings, UNNEST(generate_series(0, 15)) AS g(j)
    ORDER BY vec_id, j"""),
    (s, dir) => Similarity.randomProject(T(s, dir, "embeddings"),
      "embedding", "vec_id", dim = 64, outDim = 16)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "value")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("value"))
      .orderBy(col("vec_id"), col("j")))

  // LSH recall S-curve: ground-truth exact-Jaccard pairs (>= 0.05)
  // binned by decile, each bin reporting the fraction the banded
  // md5-MinHash candidate set recovered — the d02 exact leg and the
  // d12 LSH leg joined into the evaluation every dedup deployment
  // should run before trusting the approximation.
  private val d19 = Q("d19_lsh_recall", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    ex AS (SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.05),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    j AS (SELECT e.jaccard, CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS hit
          FROM ex e LEFT JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b)
    SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS bin,
      COUNT(*) AS n_true, CAST(SUM(hit) AS BIGINT) AS n_hit,
      ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS recall
    FROM j GROUP BY 1 ORDER BY bin"""),
    (s, dir) => Dedup.lshRecallReport(T(s, dir, "documents"), "text", "doc_id",
      shingleN = 3, numHashes = 8, bands = 4, floor = 0.05).orderBy(col("bin")))

  // Duplicated-span REMOVAL (Lee et al. 2022 exact-substring dedup):
  // every token covered by a corpus-duplicated 6-token window drops
  // and the doc reassembles from survivors in order. The oracle
  // rebuilds from the ground-truth token stream via ordered
  // string_agg — an engine that miscounts window starts, drops the
  // wrong positions, or reassembles out of order hash-mismatches on
  // text_kept.
  private val d20 = Q("d20_span_removal", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    wins AS (SELECT doc_id, i, md5(array_to_string(ts[i:i+5], ' ')) AS w
           FROM toks, UNNEST(generate_series(1, len(ts) - 5)) AS u(i)
           WHERE len(ts) >= 6),
    dup AS (SELECT doc_id, i FROM (
           SELECT doc_id, i, COUNT(*) OVER (PARTITION BY w) AS cnt FROM wins)
           WHERE cnt >= 2),
    cov AS (SELECT DISTINCT doc_id, i + j AS p
           FROM dup, UNNEST(generate_series(0, 5)) AS g(j)),
    pos AS (SELECT doc_id, p, ts[p] AS tok
           FROM toks, UNNEST(generate_series(1, len(ts))) AS u(p)),
    kept AS (SELECT pos.doc_id, pos.p, pos.tok
           FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
           WHERE cov.p IS NULL)
    SELECT t.doc_id AS id,
      COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '') AS text_kept,
      CAST(len(t.ts) AS BIGINT) AS n_tokens,
      CAST(COUNT(k.p) AS BIGINT) AS n_kept,
      CAST(len(t.ts) - COUNT(k.p) AS BIGINT) AS n_dropped
    FROM toks t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, len(t.ts)
    ORDER BY id"""),
    (s, dir) => Dedup.dropDuplicatedSpans(T(s, dir, "documents"), "text", "doc_id",
      k = 6, minOccurs = 2, keyer = md5(_)).orderBy(col("id")))

  // Per-source robust normalization of the t15 entropy score: robust
  // z vs the source median/IQR (exact interpolated quantiles - the
  // q66 percentile==quantile_cont pin) and the exact percent rank
  // with id tie-breaks. The step that stops a global quality
  // threshold from just measuring source membership.
  private val t37 = Q("t37_source_normalize", Some("""
    WITH counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM
        (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok),
    ent AS (SELECT doc_id,
        ROUND(ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6) AS entropy
      FROM counts GROUP BY doc_id),
    sc AS (SELECT e.doc_id, d.source, e.entropy
           FROM ent e JOIN documents d USING (doc_id)),
    st AS (SELECT source,
        quantile_cont(entropy, 0.25) AS q1,
        quantile_cont(entropy, 0.5) AS med,
        quantile_cont(entropy, 0.75) AS q3
      FROM sc GROUP BY source)
    SELECT sc.doc_id, sc.source, sc.entropy,
      ROUND((sc.entropy - st.med) / nullif(st.q3 - st.q1, 0), 6) AS robust_score,
      ROUND(PERCENT_RANK() OVER (PARTITION BY sc.source ORDER BY sc.entropy, sc.doc_id), 6) AS pct_rank
    FROM sc JOIN st USING (source)
    ORDER BY doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = TextAnalysis.tokenEntropy(docs, "text", "doc_id")
        .select(col("id").as("doc_id"), col("entropy"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextAnalysis.normalizeScores(scored, "source", "entropy", "doc_id")
        .orderBy(col("doc_id"))
    })

  // Exact dedup with provenance: collapsed duplicate groups keep the
  // sorted distinct sources of their members - the attribution trail
  // dropping rows would otherwise destroy.
  private val d21 = Q("d21_dedup_provenance", Some("""
    WITH g AS (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           COUNT(*) AS group_size, MIN(doc_id) AS keep_id
         FROM documents GROUP BY 1),
    s AS (SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           source FROM documents),
    sl AS (SELECT fp, string_agg(source, ',' ORDER BY source) AS provenance
           FROM s GROUP BY fp)
    SELECT g.fp, g.group_size, g.keep_id, sl.provenance
    FROM g JOIN sl USING (fp) WHERE g.group_size >= 2
    ORDER BY keep_id"""),
    (s, dir) => Dedup.exactGroupsWithProvenance(T(s, dir, "documents"),
      "text", "doc_id", "source").orderBy(col("keep_id")))

  // Projection-recall audit: overlap@10 of top-k in the 16-d
  // projected space vs the exact 64-d top-k, per anchor - the
  // before-you-commit measurement for using the JL sketch as the
  // blocking/shortlist space. Fully deterministic on both engines
  // (same signs, same folds, same tie-breaks).
  private val s24 = Q("s24_projection_recall", Some("""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
    scoredE AS (
      SELECT q.qid, e.vec_id,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
      FROM embeddings e, q),
    exact AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rk
        FROM scoredE) WHERE rk <= 10),
    proj AS (SELECT vec_id, list_transform(generate_series(0, 15), j ->
        ROUND(list_sum(list_transform(generate_series(1, len(embedding)), i ->
          CAST(embedding[i] AS DOUBLE) *
          (CASE WHEN (strpos('0123456789abcdef',
              substr(md5(j || ':' || (i - 1)), 1, 1)) - 1) % 2 = 0
            THEN 1.0 ELSE -1.0 END)))
         / sqrt(CAST(16 AS DOUBLE)), 6)) AS pv
      FROM embeddings),
    pq AS (SELECT vec_id AS qid, pv AS qpv FROM proj WHERE vec_id < 8),
    scoredP AS (
      SELECT pq.qid, p.vec_id,
        list_sum(list_transform(generate_series(1, len(p.pv)), i -> p.pv[i] * pq.qpv[i]))
        / (sqrt(list_sum(list_transform(p.pv, x -> x * x)))
           * sqrt(list_sum(list_transform(pq.qpv, x -> x * x)))) AS cs
      FROM proj p, pq),
    approx AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rk
        FROM scoredP) WHERE rk <= 10),
    ov AS (SELECT e.qid, COUNT(*) AS n FROM exact e
           JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id GROUP BY e.qid)
    SELECT q.qid AS query_id,
      CAST(COALESCE(ov.n, 0) AS BIGINT) AS n_overlap,
      ROUND(CAST(COALESCE(ov.n, 0) AS DOUBLE) / 10, 6) AS recall_at_k
    FROM q LEFT JOIN ov ON ov.qid = q.qid
    ORDER BY query_id"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.projectionRecall(emb, emb.filter(col("vec_id") < 8),
          "embedding", "vec_id", dim = 64, outDim = 16, k = 10)
        .orderBy(col("query_id"))
    })

  // The GENERIC feature path over a real container: extractFeatures
  // now dispatches on magic bytes, so a WAV payload's mean/segment
  // features come from the actual decoded PCM samples - the oracle
  // reconstructs them from the ground-truth text byte map (sample i
  // = byte i * 128, segment s = mean over [s*n/8, (s+1)*n/8)), with
  // the engine's one-per-segment float narrowing mirrored by a
  // FLOAT->DOUBLE cast. A dispatch that falls into the fake decoder
  // (or a segment-boundary off-by-one) hash-mismatches.
  private val m09 = Q("m09_media_features_real", Some("""
    WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    seg AS (SELECT doc_id, n, cs, s, (s * n) // 8 AS lo, ((s + 1) * n) // 8 AS hi
      FROM d, UNNEST(generate_series(0, 7)) AS g(s))
    SELECT doc_id AS sample_id,
      CAST(44 + 2 * n AS BIGINT) AS n_bytes,
      ROUND(CAST(list_sum(list_transform(cs, c -> ord(c) * 128.0)) AS DOUBLE) / n, 6)
        AS mean_signal,
      CAST(s AS BIGINT) AS seg,
      CASE WHEN hi > lo THEN CAST(CAST(
          CAST(list_sum(list_transform(cs[lo+1:hi], c -> ord(c) * 128.0)) AS DOUBLE)
          / (hi - lo) AS FLOAT) AS DOUBLE)
        ELSE 0.0 END AS seg_mean
    FROM seg ORDER BY sample_id, seg"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val media = Multimodal.textAsWav(docs, "doc_id", "text")
        .withColumn("media_type", lit("audio"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("sample_id"), col("n_bytes"),
          round(col("mean_intensity"), 6).as("mean_signal"),
          posexplode(col("feature_vec")).as(Seq("seg", "f")))
        .select(col("sample_id"), col("n_bytes"), col("mean_signal"),
          col("seg").cast("long").as("seg"),
          col("f").cast("double").as("seg_mean"))
        .orderBy(col("sample_id"), col("seg"))
    })

  // Deterministic epoch-3 shuffle: position = rank of md5("3:id") -
  // the reproducible data-loading permutation (different per epoch,
  // identical across engines/partitionings/restarts).
  private val t38 = Q("t38_epoch_shuffle", Some("""
    SELECT doc_id,
      CAST(ROW_NUMBER() OVER (ORDER BY md5('3:' || doc_id), doc_id) AS BIGINT)
        AS position
    FROM documents ORDER BY doc_id"""),
    (s, dir) => graft.pipeline.Sampling.epochShuffle(
      T(s, dir, "documents"), "doc_id", epoch = 3).orderBy(col("doc_id")))

  // Length-bucket padding audit over edges 1/16/64/128: per bucket,
  // the fraction of pad tokens batching-to-the-bucket-max burns.
  private val t39 = Q("t39_length_buckets", Some("""
    WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
    b AS (SELECT n, CASE WHEN n >= 128 THEN 128 WHEN n >= 64 THEN 64
                         WHEN n >= 16 THEN 16 WHEN n >= 1 THEN 1 END AS bucket_lo
          FROM t)
    SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo, COUNT(*) AS n_docs,
      CAST(MAX(n) AS BIGINT) AS max_len, CAST(SUM(n) AS BIGINT) AS sum_tokens,
      ROUND(1.0 - CAST(SUM(n) AS DOUBLE) / (COUNT(*) * MAX(n)), 6) AS padding_frac
    FROM b WHERE bucket_lo IS NOT NULL
    GROUP BY bucket_lo ORDER BY bucket_lo"""),
    (s, dir) => graft.pipeline.Sampling.lengthBuckets(
        T(s, dir, "documents"), "text", "doc_id", Seq(1, 16, 64, 128))
      .orderBy(col("bucket_lo")))

  // Soft dedup: every doc keeps weight 1/|near-dup cluster| (1.0 for
  // singletons) so distinct content contributes one unit of loss
  // mass however many times it was crawled - the downweight-not-drop
  // alternative to d11's collapse. Oracle = the d06 closure with a
  // weight column.
  private val d22 = Q("d22_soft_dedup_weights", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u),
    cs AS (SELECT doc_id,
        CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
      FROM comp)
    SELECT d.doc_id AS id,
      CAST(COALESCE(cs.cluster_size, 1) AS BIGINT) AS cluster_size,
      ROUND(1.0 / COALESCE(cs.cluster_size, 1), 6) AS weight
    FROM documents d LEFT JOIN cs ON cs.doc_id = d.doc_id
    ORDER BY id"""),
    (s, dir) => Dedup.softDedupWeights(T(s, dir, "documents"), "text", "doc_id",
      n = 3, threshold = 0.3, maxPostings = None).orderBy(col("id")))

  // Leakage-safe split: the t17 md5 assignment keyed by the near-dup
  // CLUSTER representative, so a near-duplicate pair can never
  // straddle train and test. Oracle = the d06 closure feeding the
  // t17 CASE on the representative.
  private val t40 = Q("t40_leakage_safe_split", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    keyed AS (SELECT d.doc_id AS id, COALESCE(c.rep, d.doc_id) AS rep
              FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
    SELECT id, rep,
      CASE WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
           WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
           ELSE 'test' END AS split
    FROM keyed ORDER BY id"""),
    (s, dir) => graft.pipeline.Sampling.leakageSafeSplit(
        T(s, dir, "documents"), "text", "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        n = 3, threshold = 0.3, maxPostings = None)
      .orderBy(col("id")))

  // Unicode NFC canonicalization through the native codegen'd
  // expression (functions/TextNormalizeExpressions). Every doc gets a
  // deterministic DECOMPOSED suffix cycled by doc_id — e+U+0301,
  // A+U+030A, c+U+0327, o+U+0302+U+0301 (double mark: composes
  // iteratively to U+1ED1) — so normalization provably fires on every
  // row; the oracle runs DuckDB's utf8proc `nfc_normalize` on the
  // identically-built input and the Unicode stability policy makes
  // the two implementations byte-identical (md5-pinned).
  private val t41 = Q("t41_nfc_normalize", Some(s"""
    WITH d AS (SELECT doc_id, text || CASE doc_id % 4
        WHEN 0 THEN 'e$CombAcute' WHEN 1 THEN 'A$CombRing'
        WHEN 2 THEN 'c$CombCedilla' ELSE 'o$CombCirc$CombAcute' END AS input
      FROM documents),
    n AS (SELECT doc_id, input, nfc_normalize(input) AS norm FROM d)
    SELECT doc_id, CAST(length(input) AS BIGINT) AS n_in,
      CAST(length(norm) AS BIGINT) AS n_out,
      input <> norm AS changed, md5(norm) AS norm_md5
    FROM n ORDER BY doc_id"""),
    (s, dir) => {
      val suffix = when(pmod(col("doc_id"), lit(4)) === 0, lit("e" + CombAcute))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit("A" + CombRing))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit("c" + CombCedilla))
        .otherwise(lit("o" + CombCirc + CombAcute))
      val docs = T(s, dir, "documents")
        .withColumn("input", concat(col("text"), suffix))
      TextAnalysis.nfcReport(docs, "input", "doc_id").orderBy(col("doc_id"))
    })

  // Flesch–Kincaid readability over a deterministically sentence-ified
  // corpus (the synthetic docs carry no terminal punctuation, so both
  // sides inject '. ' after 'e '-words with plain substring replace —
  // no regex dialect in the input construction). Word counting spells
  // the whitespace class out (Java \s includes U+000B, RE2's does
  // not); the grade arithmetic is one fixed IEEE order on both sides.
  private val t42 = Q("t42_readability", Some("""
    WITH c AS (SELECT doc_id,
        length(regexp_extract_all(replace(text, 'e ', 'e. '), '[^ \t\n\x0B\f\r]+')) AS n_words,
        length(regexp_extract_all(replace(text, 'e ', 'e. '), '[.!?]+')) AS n_sents,
        length(regexp_extract_all(lower(replace(text, 'e ', 'e. ')), '[aeiouy]+')) AS n_syll
      FROM documents)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      CAST(n_sents AS BIGINT) AS n_sents, CAST(n_syll AS BIGINT) AS n_syll,
      0.39 * (CAST(n_words AS DOUBLE) / CAST(GREATEST(n_sents, 1) AS DOUBLE)) +
      11.8 * (CAST(n_syll AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)) -
      15.59 AS fk_grade
    FROM c ORDER BY doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").withColumn("sentenced",
        call_function("replace", col("text"), lit("e "), lit("e. ")))
      TextAnalysis.readability(docs, "sentenced", "doc_id").orderBy(col("doc_id"))
    })

  // Threshold (radius) similarity search: everything within cosine
  // ≥ 0.25 of each of 8 query vectors — queries broadcast, one corpus
  // scan, zero shuffles (no rank window; the threshold is a scan-side
  // predicate on the codegen'd cosine kernel).
  private val s25 = Q("s25_range_search", Some("""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, vec_id, cos_sim FROM scored WHERE cos_sim >= 0.25
    ORDER BY query_id, vec_id"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.rangeSearch(emb, emb.filter(col("vec_id") < 8),
          "embedding", "vec_id", "vec_id", minCos = 0.25)
        .orderBy(col("query_id"), col("vec_id"))
    })

  // Cell-pruned radius search — the 100 TB path for s25: seeded
  // centroids (first 8 rows by id, the s18 construction), probe the 3
  // nearest cells, exact threshold inside them. The oracle rebuilds
  // the identical assignment/probe/filter pipeline, so the pruning
  // trade (qualifying vectors in unprobed cells are skipped) is
  // pinned, not approximated away.
  private val s26 = Q("s26_range_search_ivf", Some("""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
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
          FROM embeddings WHERE vec_id = 0),
    probes AS (
      SELECT c.cell FROM cents c, q
      ORDER BY list_sum(list_transform(generate_series(1, len(q.qv)),
          j -> q.qv[j] * c.cv[j]))
        / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
           * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC, c.cell
      LIMIT 3),
    cand AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN assigned a USING (vec_id)
      WHERE a.cell IN (SELECT cell FROM probes) AND e.vec_id <> 0),
    scored AS (
      SELECT c.vec_id,
        list_sum(list_transform(generate_series(1, len(c.embedding)),
          j -> CAST(c.embedding[j] AS DOUBLE) * q.qv[j]))
        / (sqrt(list_sum(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
      FROM cand c, q)
    SELECT vec_id, cos_sim FROM scored WHERE cos_sim >= 0.15
    ORDER BY vec_id"""),
    (s, dir) => graft.pipeline.Ivf.rangeSearchSeeded(T(s, dir, "embeddings"),
        "embedding", "vec_id", queryId = 0L, minCos = 0.15,
        numCells = 8, nprobe = 3)
      .orderBy(col("vec_id")))

  // Perceptual average-hash over REAL decoded BMP pixels: blue
  // channel sampled onto an 8×8 lattice with the m06 integer
  // coordinate map, thresholded against the lattice mean, packed
  // row-major into two sign-safe 32-bit halves. The oracle rebuilds
  // every bit from the ground-truth text bytes — a decoder that walks
  // rows top-down, misses the 4-byte stride, or rounds the lattice
  // map flips bits and hash-mismatches. ASCII pin as in m05.
  private val m10 = Q("m10_perceptual_hash", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    g AS (SELECT doc_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, h, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY doc_id)
    SELECT v.doc_id AS sample_id,
      CAST(10 AS BIGINT) AS width,
      CAST(MAX(v.h) AS BIGINT) AS height,
      CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS ahash_hi,
      CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS ahash_lo,
      CAST(SUM(CASE WHEN v.val > m.mean THEN 1 ELSE 0 END) AS BIGINT) AS n_set,
      MAX(m.mean) AS sample_mean
    FROM v JOIN m USING (doc_id)
    GROUP BY v.doc_id ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.perceptualHash(Multimodal.textAsBmp(docs, "doc_id", "text", width = 10))
        .toDF()
        .select(col("sample_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("ahash_hi"), col("ahash_lo"), col("n_set"), col("sample_mean"))
        .orderBy(col("sample_id"))
    })

  // Image near-dup pairs by perceptual-hash Hamming distance: the
  // corpus plus a one-char-perturbed copy of itself (both sides build
  // the SAME union), pairs found through lossless band blocking
  // (maxHamming+1 bands; pigeonhole: Hamming ≤ 3 ⇒ one clean 16-bit
  // band) — so the engine's banded join must EQUAL the oracle's full
  // quadratic join, including the genuine cross-document collisions
  // and the perturbed copies that crossed an image-height boundary
  // and dropped out.
  private val m11 = Q("m11_phash_dup_pairs", Some("""
    WITH base AS (SELECT doc_id, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id + 100000, text || 'x' FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs
      FROM un),
    g AS (SELECT doc_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY doc_id),
    ah AS (SELECT v.doc_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m USING (doc_id) GROUP BY v.doc_id)
    SELECT id_a, id_b, hamming FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM ah a JOIN ah b ON a.doc_id < b.doc_id)
    WHERE hamming <= 3 ORDER BY id_a, id_b"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text"))
      val perturbed = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit("x")).as("text"))
      val hashes = Multimodal.perceptualHash(
        Multimodal.textAsBmp(base.unionByName(perturbed), "doc_id", "text", width = 10))
      Multimodal.phashDupPairs(hashes.toDF(), maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    })

  // Reliability-diagram calibration bins over the t15/t34 entropy
  // score: equal-count score deciles (deterministic NTILE order:
  // score then id) each reporting observed positive rate vs mean
  // score — whether the score's LEVEL is meaningful, not just its
  // ranking (t34's AUC). Scores sum as DECIMAL so mean_score is
  // order-independent and bit-stable.
  private val t43 = Q("t43_calibration_bins", Some("""
    WITH counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM
        (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok),
    ent AS (SELECT doc_id,
        ROUND(ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6) AS s
      FROM counts GROUP BY doc_id),
    b AS (SELECT e.doc_id, e.s, (d.lang = 'en') AS pos,
        NTILE(10) OVER (ORDER BY e.s, e.doc_id) AS bin
      FROM ent e JOIN documents d USING (doc_id))
    SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pos_rate,
      CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_score
    FROM b GROUP BY bin ORDER BY bin"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = TextAnalysis.tokenEntropy(docs, "text", "doc_id")
        .select(col("id").as("doc_id"), col("entropy"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      TextAnalysis.calibrationBins(scored, "entropy", "doc_id",
        col("lang") === "en", bins = 10)
    })

  /** t44's oracle: the SAME k BPE rounds unrolled as chained
    * MATERIALIZED CTEs (materialization is semantically a no-op but
    * stops DuckDB re-inlining the round chain per reference, which
    * goes exponential in k). Generated by loop so engine k and oracle
    * k can never drift.
    */
  /** Shared induction CTE prefix for the t44/t45 oracles: replays the
    * k-round merge trajectory in SQL, binding the round-i winner as
    * CTE `b$i`.
    */
  private def bpeInductionCtes(k: Int): String = {
    val sb = new StringBuilder(
      """
    WITH w AS (
      SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents),
    c0 AS MATERIALIZED (
      SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS s, COUNT(*) AS f
      FROM w GROUP BY 1)""")
    (0 until k).foreach { i =>
      sb.append(s""",
    p$i AS MATERIALIZED (
      SELECT ts[j] AS l, ts[j+1] AS r, CAST(SUM(f) AS BIGINT) AS c
      FROM (SELECT string_split(s, ' ') AS ts, f FROM c$i),
           UNNEST(generate_series(1, len(ts) - 1)) AS u(j)
      GROUP BY 1, 2),
    b$i AS MATERIALIZED (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
    c${i + 1} AS MATERIALIZED (
      SELECT trim(regexp_replace(replace(
          ' ' || replace(s, ' ', '  ') || ' ',
          ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
          ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' '),
        ' +', ' ', 'g')) AS s, f
      FROM c$i)""")
    }
    sb.toString
  }

  private def bpeOracleSql(k: Int): String = {
    val selects = (0 until k).map { i =>
      s"SELECT ${i + 1} AS round, l AS left_sym, r AS right_sym, l || r AS merged, c FROM b$i"
    }
    bpeInductionCtes(k) +
      "\n" + selects.mkString("\n    UNION ALL\n") + "\n    ORDER BY round"
  }

  /** t45 oracle: induce the k merges (shared CTEs), then ENCODE every
    * document by replaying the same leftmost non-overlapping rewrite
    * per rule over the `|`-bounded character stream.
    */
  private def bpeEncodeOracleSql(k: Int): String = {
    val sb = new StringBuilder(bpeInductionCtes(k))
    sb.append(""",
    e0 AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(
        COALESCE(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), '|'), ''),
        '(.)', '\1 ', 'g')) AS s
      FROM documents)""")
    (0 until k).foreach { i =>
      sb.append(s""",
    e${i + 1} AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(replace(
          ' ' || replace(s, ' ', '  ') || ' ',
          ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
          ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' '),
        ' +', ' ', 'g')) AS s
      FROM e$i)""")
    }
    sb.append(s"""
    SELECT doc_id,
      CAST(len(list_filter(string_split(s, ' '), t -> t <> '|' AND t <> '')) AS BIGINT) AS n_tokens,
      CAST(length(replace(replace(s, ' ', ''), '|', '')) AS BIGINT) AS n_az_chars,
      CASE WHEN len(list_filter(string_split(s, ' '), t -> t <> '|' AND t <> '')) = 0 THEN NULL
        ELSE ROUND(CAST(length(replace(replace(s, ' ', ''), '|', '')) AS DOUBLE) /
          CAST(len(list_filter(string_split(s, ' '), t -> t <> '|' AND t <> '')) AS DOUBLE), 6) END AS fertility,
      md5(s) AS enc_md5
    FROM e$k ORDER BY doc_id""")
    sb.toString
  }

  /** t62 oracle: induce + encode (t44/t45's shared CTEs), predict the
    * language per doc (t01's CTE verbatim), and roll up
    * chars-per-token per LANGUAGE.
    */
  private def tokenizerFertilityOracleSql(k: Int): String = {
    val sb = new StringBuilder(bpeInductionCtes(k))
    sb.append(""",
    e0 AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(
        COALESCE(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), '|'), ''),
        '(.)', '\1 ', 'g')) AS s
      FROM documents)""")
    (0 until k).foreach { i =>
      sb.append(s""",
    e${i + 1} AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(replace(
          ' ' || replace(s, ' ', '  ') || ' ',
          ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
          ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' '),
        ' +', ' ', 'g')) AS s
      FROM e$i)""")
    }
    sb.append(s""",
    sc AS (
      SELECT doc_id,
        CAST(LENGTH(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS cjk,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0) AS s_en,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' der ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' und ', ' '))) / 4.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' nicht ', ' '))) / 6.0) AS s_de,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' le ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' et ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' les ', ' '))) / 4.0) AS s_fr,
        ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' el ', ' '))) / 3.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' y ', ' '))) / 2.0
         + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' los ', ' '))) / 4.0) AS s_es
      FROM documents),
    lang AS (SELECT doc_id,
      CASE WHEN cjk > 0 THEN 'zh'
           WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'unknown'
           WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
           WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
           WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
           WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
           ELSE 'unknown' END AS lang_pred
      FROM sc),
    per AS (SELECT l.lang_pred,
        CAST(len(list_filter(string_split(e.s, ' '), t -> t <> '|' AND t <> '')) AS BIGINT) AS n_tok,
        CAST(length(replace(replace(e.s, ' ', ''), '|', '')) AS BIGINT) AS n_ch
      FROM e$k e JOIN lang l USING (doc_id))
    SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      CAST(SUM(n_ch) AS BIGINT) AS n_chars,
      CASE WHEN SUM(n_tok) = 0 THEN NULL
        ELSE ROUND(CAST(SUM(n_ch) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6)
        END AS fertility
    FROM per GROUP BY lang_pred ORDER BY lang_pred""")
    sb.toString
  }

  /** t54 oracle: induce + encode (shared CTEs), then DECODE every
    * document (token concatenation), prove round-trip identity vs the
    * normalized source stream, vocab-check every token against the
    * k merge products, and roll up chars-per-token per source.
    */
  private def bpeRoundTripOracleSql(k: Int): String = {
    val sb = new StringBuilder(bpeInductionCtes(k))
    sb.append(""",
    e0 AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(
        COALESCE(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), '|'), ''),
        '(.)', '\1 ', 'g')) AS s
      FROM documents)""")
    (0 until k).foreach { i =>
      sb.append(s""",
    e${i + 1} AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(replace(
          ' ' || replace(s, ' ', '  ') || ' ',
          ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
          ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' '),
        ' +', ' ', 'g')) AS s
      FROM e$i)""")
    }
    val mg = (0 until k).map(i => s"SELECT l || r AS m FROM b$i")
      .mkString("\n    UNION ALL\n    ")
    sb.append(s""",
    mg AS ($mg),
    lm AS (SELECT list(m) AS ms FROM mg),
    per AS (
      SELECT d.source,
        CASE WHEN replace(e.s, ' ', '') =
          COALESCE(array_to_string(regexp_extract_all(lower(d.text), '[a-z]+'), '|'), '')
          THEN 1 ELSE 0 END AS rt_ok,
        CAST(len(list_filter(string_split(e.s, ' '), t -> t <> '' AND t <> '|'
          AND NOT regexp_matches(t, '^[a-z]${"$"}')
          AND NOT list_contains(lm.ms, t))) AS BIGINT) AS n_viol,
        CAST(len(list_filter(string_split(e.s, ' '), t -> t <> '|' AND t <> '')) AS BIGINT) AS n_tok,
        CAST(length(replace(replace(e.s, ' ', ''), '|', '')) AS BIGINT) AS n_ch
      FROM e$k e JOIN documents d USING (doc_id), lm)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(rt_ok) AS BIGINT) AS n_roundtrip_ok,
      CAST(SUM(n_viol) AS BIGINT) AS n_vocab_violations,
      CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      CAST(SUM(n_ch) AS BIGINT) AS n_chars,
      CASE WHEN SUM(n_tok) = 0 THEN NULL ELSE
        ROUND(CAST(SUM(n_ch) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6) END AS chars_per_token
    FROM per GROUP BY source ORDER BY source""")
    sb.toString
  }

  // BPE round-trip + vocabulary audit — the inverse pass closing the
  // t44/t45 loop: decode = token concatenation must reproduce the
  // normalized source stream exactly, every emitted token must be in
  // the decoder's vocabulary (single char, boundary, or a merge
  // product), and chars-per-token compression reported per source —
  // the number a data-mixing decision consumes. The oracle replays
  // induction + encode (shared CTEs) AND the decode/vocab legs, so a
  // lossy rewrite or an invented symbol breaks counted rows.
  private val t54 = Q("t54_bpe_roundtrip", Some(bpeRoundTripOracleSql(8)),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = TextAnalysis.bpeMerges(docs, "text", k = 8)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeRoundTripAudit(docs, "text", "source", merges)
        .orderBy(col("source"))
    })

  // Distributed BPE merge induction (Sennrich et al. 2016): k rounds
  // of argmax-pair-merge over the word vocabulary; only the initial
  // word-frequency aggregation touches the corpus — the tokenizer-
  // training operator beside t20/t38/t39. The oracle replays the
  // identical k-round trajectory in SQL, so a wrong tie-break, a
  // delimiter-sharing replace, or a round that reads stale symbols
  // breaks EVERY subsequent row, not just one.
  private val t44 = Q("t44_bpe_merges", Some(bpeOracleSql(8)),
    (s, dir) => TextAnalysis.bpeMerges(T(s, dir, "documents"), "text", k = 8))

  // BPE tokenizer APPLICATION — induce 8 merges (t44's trajectory),
  // then encode EVERY document with them in one map-only codegen'd
  // projection: token counts, fertility (chars/token), and an md5
  // fingerprint of the full encoded symbol stream. The oracle replays
  // induction AND the per-rule leftmost non-overlapping rewrite, so a
  // merge applied out of order, across a word boundary, or with a
  // delimiter-sharing replace flips enc_md5 on every affected doc.
  // (Oracle cross-checked against an independent Python BPE encoder:
  // 0/500 mismatches at sf0.001.)
  private val t45 = Q("t45_bpe_encode", Some(bpeEncodeOracleSql(8)),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = TextAnalysis.bpeMerges(docs, "text", k = 8)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncode(docs, "text", "doc_id", merges)
        .orderBy(col("doc_id"))
    })

  // Frame-level perceptual hash + static-scene flags over REAL
  // decoded AVI frames: the temporal dedup signal for video — frames
  // whose hash sits within 3 bits of the previous frame are skippable
  // near-statics. The oracle rebuilds every frame's hash from the
  // text byte map (frame f owns bytes [10f, 10f+10) as a 5×2 grid)
  // and re-derives the lag flag, so a codec that misorders frames,
  // misreads the movi chunk walk, or flips the lattice map breaks the
  // dup_prev runs, not just one row. ASCII pin as in m05/m08.
  private val m12 = Q("m12_frame_phash_dedup", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    fr AS (SELECT doc_id, nb, cs, f
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f)),
    g AS (SELECT doc_id, f, nb, cs, r * 8 + c AS i,
        f * 10 + ((r * 2) // 8) * 5 + (c * 5) // 8 AS idx
      FROM fr, UNNEST(generate_series(0, 7)) AS gr(r),
              UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, f, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, f, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean
          FROM v GROUP BY doc_id, f),
    ah AS (SELECT v.doc_id, v.f,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS ahash_hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS ahash_lo,
        CAST(SUM(CASE WHEN v.val > m.mean THEN 1 ELSE 0 END) AS BIGINT) AS n_set
      FROM v JOIN m ON v.doc_id = m.doc_id AND v.f = m.f
      GROUP BY v.doc_id, v.f)
    SELECT doc_id AS sample_id, f AS frame_idx, ahash_hi, ahash_lo, n_set,
      COALESCE(bit_count(xor(ahash_hi, LAG(ahash_hi) OVER w)) +
               bit_count(xor(ahash_lo, LAG(ahash_lo) OVER w)) <= 3, FALSE) AS dup_prev
    FROM ah WINDOW w AS (PARTITION BY doc_id ORDER BY f)
    ORDER BY sample_id, frame_idx"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val hashes = Multimodal.framePerceptualHash(
        Multimodal.textAsAvi(docs, "doc_id", "text"))
      Multimodal.staticFrameFlags(hashes.toDF(), maxHamming = 3)
        .select(col("sample_id"), col("frame_idx"),
          col("ahash_hi"), col("ahash_lo"), col("n_set"), col("dup_prev"))
        .orderBy(col("sample_id"), col("frame_idx"))
    })

  // The full production LSH dedup pipeline hash-matched END TO END:
  // md5-banded MinHash candidates (d12's mechanism) verified by exact
  // Jaccard computed ONLY on the candidate sliver, threshold 0.3.
  // d12 proves the candidate set and d02 exact Jaccard; this is their
  // deployed composition — a band that over-merges, a verification
  // joined to the wrong doc, or a threshold flip shows up as a
  // whole-row diff.
  private val d24 = Q("d24_lsh_verified_pairs", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT id_a, id_b,
      CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.3
    ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.lshVerifiedPairsMd5(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4, threshold = 0.3)
      .orderBy(col("id_a"), col("id_b")))

  // Single-bin DFT energy over REAL decoded WAV PCM (bins 1 and 5):
  // the frequency-content primitive (Goertzel) the audio family was
  // missing. C/S are the weighted cos/sin sums folded i-ascending on
  // both engines (the s23 fold contract; ROUND(6) absorbs last-ulp
  // transcendental disagreement); power is exact integer math. ASCII
  // pin as in m04.
  private val m14 = Q("m14_wav_dft_energy", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    b AS (SELECT doc_id, n, cs, k FROM d, UNNEST([1, 5]) AS g(k))
    SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      CAST(n AS BIGINT) AS n_samples,
      CAST(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS BIGINT) * CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS BIGINT))) AS BIGINT) AS power,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
    FROM b ORDER BY sample_id, bin"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.wavDftEnergy(
          Multimodal.textAsWav(docs, "doc_id", "text"), dftBins = Seq(1, 5))
        .orderBy(col("sample_id"), col("bin"))
    })

  // Cross-source duplication matrix over d09's 20-token chunks: per
  // unordered source pair, the number of duplicated-chunk pairs
  // spanning it — the crawl-overlap diagnostic (is crawl B a
  // re-crawl of A?). Pair counts are pure digest-count arithmetic
  // (c_a*c_b, C(c,2) within a source) — no occurrence pair ever
  // materializes, so a wrong combinatorial identity or double count
  // breaks n_pairs directly.
  private val d23 = Q("d23_cross_source_dups", Some("""
    WITH toks AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
    idx AS (SELECT source, tk,
      unnest(generate_series(0, CAST(FLOOR((len(tk) - 1) / 20.0) AS BIGINT))) AS i
      FROM toks),
    ch AS (SELECT source,
      md5(array_to_string(list_slice(tk, i * 20 + 1, i * 20 + 20), ' ')) AS fp
      FROM idx),
    fs AS (SELECT fp, source, COUNT(*) AS c FROM ch GROUP BY 1, 2),
    px AS (SELECT a.fp, a.source AS src_a, b.source AS src_b,
             CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2 ELSE a.c * b.c END AS n
           FROM fs a JOIN fs b ON a.fp = b.fp AND a.source <= b.source)
    SELECT src_a, src_b, CAST(SUM(n) AS BIGINT) AS n_pairs,
      CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_digests
    FROM px WHERE n > 0 GROUP BY 1, 2 ORDER BY src_a, src_b"""),
    (s, dir) => Dedup.crossSourceDups(T(s, dir, "documents"), "text", "source",
      chunkTokens = Some(20)))

  // Two-stage retrieval: SQ8 shortlist (50) -> exact re-rank (10) —
  // the production ANN memory/quality trade (quantized scan is the
  // only corpus-sized read; full-precision vectors touched only for
  // the shortlist). The oracle replays BOTH stages, so a shortlist
  // that misses a true neighbor, a wrong dequantization, or a rank
  // flip in either stage hash-mismatches.
  private val s27 = Q("s27_knn_sq8_rerank", Some("""
    WITH coded AS (
      SELECT vec_id, list_transform(embedding, x ->
        (CAST(GREATEST(-128, LEAST(127,
           ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * 255.0) - 128)) AS DOUBLE)
         + 128.0) / 255.0 * 4.0 + (-2.0)) AS rvec
      FROM embeddings),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    short AS (
      SELECT vec_id,
        list_sum(list_transform(generate_series(1, len(rvec)), i -> rvec[i] * qv[i]))
        / (sqrt(list_sum(list_transform(rvec, x -> x * x)))
           * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS adc
      FROM coded, q WHERE vec_id <> 0
      ORDER BY adc DESC, vec_id LIMIT 50)
    SELECT e.vec_id,
      list_sum(list_transform(generate_series(1, len(e.embedding)), i ->
        CAST(e.embedding[i] AS DOUBLE) * qv[i]))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cos_sim
    FROM embeddings e JOIN short ON e.vec_id = short.vec_id, q
    ORDER BY cos_sim DESC, e.vec_id LIMIT 10"""),
    (s, dir) => graft.pipeline.Quantize.rerankedTopK(
      T(s, dir, "embeddings"), "embedding", "vec_id",
      queryId = 0L, k = 10, shortlist = 50, lo = -2.0, hi = 2.0))

  // Deterministic MLM masking: every mask decision is md5 hash math
  // on (doc_id, position) — reproducible corruption for masked-LM
  // sample prep (rate 3/16 via hex digits {0,1,2}). The oracle
  // replays every decision and fingerprints BOTH the corrupted
  // sequence and the ordered target stream, so an off-by-one
  // position, a wrong hash input, or out-of-order targets flips the
  // md5s corpus-wide.
  private val t46 = Q("t46_mlm_mask", Some("""
    WITH toks AS (SELECT doc_id,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      FROM documents),
    m AS (SELECT doc_id, ts,
        list_transform(generate_series(1, len(ts)),
          i -> substr(md5(doc_id || ':' || i), 1, 1) IN ('0','1','2')) AS mk
      FROM toks)
    SELECT doc_id,
      CAST(len(ts) AS BIGINT) AS n_tokens,
      CAST(len(list_filter(mk, x -> x)) AS BIGINT) AS n_masked,
      ROUND(CAST(len(list_filter(mk, x -> x)) AS DOUBLE) / CAST(len(ts) AS DOUBLE), 6) AS mask_rate,
      md5(array_to_string(list_transform(generate_series(1, len(ts)),
        i -> CASE WHEN mk[i] THEN '[MASK]' ELSE ts[i] END), ' ')) AS masked_md5,
      md5(COALESCE(array_to_string(list_transform(
        list_filter(generate_series(1, len(ts)), i -> mk[i]), i -> ts[i]), '|'), '')) AS targets_md5
    FROM m ORDER BY doc_id"""),
    (s, dir) => TextAnalysis.mlmMask(T(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id")))

  // Per-source unigram KL divergence from the corpus blend — the
  // source-mix diagnostic DoReMi-style reweighting starts from. One
  // corpus-scale (source, token) partial agg; everything after is
  // vocabulary-sized. The ln-sum rounds 6 dp (t19 discipline).
  private val t47 = Q("t47_source_kl", Some("""
    WITH toks AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    sc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sc GROUP BY 1),
    g AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cg FROM sc GROUP BY 1),
    n AS (SELECT CAST(SUM(cg) AS DOUBLE) AS nt FROM g)
    SELECT sc.source,
      CAST(st.ns AS BIGINT) AS n_tokens,
      CAST(COUNT(*) AS BIGINT) AS n_vocab,
      ROUND(SUM((CAST(sc.c AS DOUBLE) / CAST(st.ns AS DOUBLE)) *
        ln((CAST(sc.c AS DOUBLE) / CAST(st.ns AS DOUBLE)) / (CAST(g.cg AS DOUBLE) / nt))), 6) AS kl_corpus
    FROM sc JOIN st USING (source) JOIN g USING (tok), n
    GROUP BY sc.source, st.ns ORDER BY sc.source"""),
    (s, dir) => TextAnalysis.sourceKlReport(T(s, dir, "documents"), "text", "source")
      .orderBy(col("source")))

  // REAL compressed-image round-trip: text → RGB pixel map → genuine
  // DEFLATE-compressed PNG (JDK imageio encoder) → real inflate +
  // unfilter decode → per-channel stats. The only m-series payload
  // whose BYTES are not oracle-derivable (DEFLATE output is encoder-
  // dependent) — so the oracle pins LOSSLESSNESS instead: decoded
  // stats must equal what SQL derives from the source text, and any
  // loss, channel swap (the RGB map differs from BMP's BGR map on
  // purpose), or row-order error in the compression path breaks it.
  // ASCII pin as in m05.
  private val m13 = Q("m13_png_roundtrip", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs,
        substr(text, 1, 1) AS c1
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text))
    SELECT doc_id AS sample_id,
      CAST(10 AS BIGINT) AS width,
      CAST(h AS BIGINT) AS height,
      CAST(10 * h AS BIGINT) AS n_pixels,
      CAST(list_sum(list_transform(cs, c -> ord(c))) AS DOUBLE)
        / (10 * h) AS mean_r,
      CAST(list_sum(list_transform(cs, c -> 255 - ord(c))) AS DOUBLE)
        / (10 * h) AS mean_g,
      CAST(list_sum(list_transform(cs, c -> (3 * ord(c)) % 256)) AS DOUBLE)
        / (10 * h) AS mean_b,
      CAST(ord(c1) AS BIGINT) AS top_left_r
    FROM d ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.decodePng(Multimodal.textAsPng(docs, "doc_id", "text", width = 10))
        .toDF()
        .select(col("sample_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"),
          col("top_left_r").cast("long").as("top_left_r"))
        .orderBy(col("sample_id"))
    })

  // LSH candidates verified by EDIT DISTANCE (the character-level
  // sibling of d24): md5-banded MinHash finds the sliver, Levenshtein
  // similarity over the normalized text confirms at 0.95 — the
  // verification that counts reorderings and character corruption as
  // differences where Jaccard cannot. The O(len²) DP runs only on
  // candidate pairs. Both engines agree on unit-cost Levenshtein and
  // the spelled-out whitespace class; the similarity is a fixed-tree
  // division of exact integers — no rounding needed.
  private val d25 = Q("d25_lsh_edit_verified", Some("""
    WITH toks AS (SELECT doc_id,
           trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    ver AS (SELECT c.id_a, c.id_b,
        CAST(levenshtein(ta.norm, tb.norm) AS BIGINT) AS edit_dist,
        CAST(length(ta.norm) AS BIGINT) AS len_a,
        CAST(length(tb.norm) AS BIGINT) AS len_b
      FROM cand c
        JOIN toks ta ON ta.doc_id = c.id_a
        JOIN toks tb ON tb.doc_id = c.id_b)
    SELECT id_a, id_b, edit_dist, len_a, len_b,
      1.0 - CAST(edit_dist AS DOUBLE) / CAST(GREATEST(len_a, len_b) AS DOUBLE) AS edit_sim
    FROM ver
    WHERE 1.0 - CAST(edit_dist AS DOUBLE) / CAST(GREATEST(len_a, len_b) AS DOUBLE) >= 0.95
    ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.lshEditVerifiedPairs(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4, threshold = 0.95)
      .orderBy(col("id_a"), col("id_b")))

  // Closed-form DISTRIBUTED model training: ridge regression over two
  // integer text features and a 0/1 weak-supervision label (lang='en'),
  // solved exactly via Cramer's rule — training is ONE map-side
  // partial agg (9 sums), the 3×3 solve is a constant-size expression,
  // scoring is a broadcast map-only projection. The oracle repeats the
  // identical determinant expression trees, so the doubles are
  // bit-identical; sums are exact integers end to end.
  private val t48 = Q("t48_ridge_quality", Some("""
    WITH feat AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f2,
        CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM documents),
    sums AS (SELECT
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(f1) AS DOUBLE) AS s1, CAST(SUM(f2) AS DOUBLE) AS s2,
        CAST(SUM(f1 * f1) AS DOUBLE) AS s11, CAST(SUM(f1 * f2) AS DOUBLE) AS s12,
        CAST(SUM(f2 * f2) AS DOUBLE) AS s22,
        CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(f1 * y) AS DOUBLE) AS s1y, CAST(SUM(f2 * y) AS DOUBLE) AS s2y
      FROM feat),
    solve AS (SELECT
        n * ((s11 + 10.0) * (s22 + 10.0) - s12 * s12)
          - s1 * (s1 * (s22 + 10.0) - s12 * s2)
          + s2 * (s1 * s12 - (s11 + 10.0) * s2) AS det,
        sy * ((s11 + 10.0) * (s22 + 10.0) - s12 * s12)
          - s1 * (s1y * (s22 + 10.0) - s12 * s2y)
          + s2 * (s1y * s12 - (s11 + 10.0) * s2y) AS det0,
        n * (s1y * (s22 + 10.0) - s12 * s2y)
          - sy * (s1 * (s22 + 10.0) - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2) AS det1,
        n * ((s11 + 10.0) * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - (s11 + 10.0) * s2) AS det2
      FROM sums)
    SELECT doc_id AS id, f1 AS n_tokens, f2 AS n_types, y AS label,
      ROUND(det0 / det, 8) + 0.0 AS beta0,
      ROUND(det1 / det, 8) + 0.0 AS beta1,
      ROUND(det2 / det, 8) + 0.0 AS beta2,
      ROUND(det0 / det + (det1 / det) * CAST(f1 AS DOUBLE)
            + (det2 / det) * CAST(f2 AS DOUBLE), 6) + 0.0 AS score
    FROM feat, solve ORDER BY id"""),
    (s, dir) => TextAnalysis.ridgeQualityScore(T(s, dir, "documents"),
        "text", "doc_id", positive = col("lang") === "en", lambda = 10.0)
      .orderBy(col("id")))

  // Voice-activity segments over REAL decoded PCM: 64-sample frames,
  // a frame is active when its mean-square exceeds the clip's mean
  // square (integer cross-multiply — exact on any engine), runs of
  // ≥2 active frames become segments (gaps-and-islands). Frame
  // energies are computed inside the decode mapPartitions; threshold
  // + islands share one sample_id exchange. ASCII pin as in m04.
  private val m15 = Q("m15_vad_segments", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    fr AS (SELECT doc_id, n, CAST(f AS BIGINT) AS f,
        CAST(LEAST((f + 1) * 64, n) - f * 64 AS BIGINT) AS flen,
        CAST(list_sum(list_transform(list_slice(cs, f * 64 + 1, LEAST((f + 1) * 64, n)),
          c -> CAST(ord(c) * 128 AS BIGINT) * CAST(ord(c) * 128 AS BIGINT))) AS BIGINT) AS energy
      FROM d, UNNEST(generate_series(0, (n + 63) // 64 - 1)) AS g(f)),
    tot AS (SELECT doc_id, CAST(SUM(flen) AS BIGINT) AS ns,
        CAST(SUM(energy) AS BIGINT) AS te FROM fr GROUP BY doc_id),
    act AS (SELECT fr.doc_id, fr.f, fr.energy,
        fr.f - ROW_NUMBER() OVER (PARTITION BY fr.doc_id ORDER BY fr.f) AS grp
      FROM fr JOIN tot ON fr.doc_id = tot.doc_id
      WHERE CAST(fr.energy AS HUGEINT) * tot.ns > CAST(tot.te AS HUGEINT) * fr.flen)
    SELECT doc_id AS sample_id, CAST(MIN(f) AS BIGINT) AS start_frame,
      CAST(MAX(f) AS BIGINT) AS end_frame,
      CAST(COUNT(*) AS BIGINT) AS n_frames,
      CAST(SUM(energy) AS BIGINT) AS seg_energy
    FROM act GROUP BY doc_id, grp
    HAVING COUNT(*) >= 2
    ORDER BY sample_id, start_frame"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.vadSegments(
          Multimodal.textAsWav(docs, "doc_id", "text"),
          frameLen = 64, minFrames = 2)
        .orderBy(col("sample_id"), col("start_frame"))
    })

  // Batch maximum-inner-product top-k: raw DOT ranking for
  // un-normalized embeddings (recommendation / reward-model
  // retrieval) — cosine's magnitude-aware sibling. Queries broadcast,
  // one corpus scan, per-query WindowGroupLimit; the dot is the same
  // i-ascending fold on both engines, so the scores hash-match
  // unrounded (the s04 contract minus the normalization).
  private val s28 = Q("s28_mips_topk", Some("""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS dot
      FROM embeddings e, q),
    ranked AS (
      SELECT query_id, vec_id, dot,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, dot, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.mipsTopKBatch(emb,
        emb.filter(col("vec_id") < 3), "embedding", "vec_id", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })

  // Content-defined chunking dedup: boundaries from a rolling window
  // hash (Σ ord·31^j mod 2^31, boundary ≡ 0 mod 16) — the
  // insertion-robust chunking that re-syncs within one window where
  // d09's fixed chunks misalign forever. Exact integer math, so both
  // engines reproduce every boundary; digests + lengths are the only
  // thing that shuffles.
  private val d26 = Q("d26_cdc_chunk_dedup", Some("""
    WITH d AS (SELECT doc_id, text,
        length(text) AS n,
        string_split(text, '') AS cs
      FROM documents WHERE length(text) >= 16),
    bp AS (SELECT doc_id, n, i
      FROM d, UNNEST(generate_series(16, n)) AS g(i)
      WHERE list_sum(list_transform(generate_series(0, 15),
              j -> CAST(ord(cs[CAST(i - j AS BIGINT)]) AS BIGINT) *
                ([1, 31, 961, 29791, 923521, 28629151, 887503681, 1742810335,
                  340029185, 1950970143, 350532289, 129082719, 1854080641,
                  1641925023, 1507551809, 1636949471])[CAST(j + 1 AS BIGINT)]))
            % 2147483648 % 16 = 0),
    ends AS (SELECT DISTINCT doc_id, i FROM
      (SELECT doc_id, i FROM bp UNION ALL SELECT doc_id, n FROM d)),
    ch AS (SELECT doc_id, i AS e,
        COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s
      FROM ends),
    chunks AS (SELECT d.doc_id,
        md5(substr(d.text, CAST(ch.s + 1 AS BIGINT), CAST(ch.e - ch.s AS BIGINT))) AS fp,
        ch.e - ch.s AS clen
      FROM ch JOIN d ON d.doc_id = ch.doc_id),
    df AS (SELECT fp, COUNT(*) AS c FROM chunks GROUP BY fp)
    SELECT chunks.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      CAST(SUM(CASE WHEN df.c >= 2 THEN clen ELSE 0 END) AS DOUBLE)
        / CAST(SUM(clen) AS DOUBLE) AS dup_char_ratio
    FROM chunks JOIN df USING (fp)
    GROUP BY chunks.doc_id ORDER BY doc_id"""),
    (s, dir) => Dedup.cdcChunkDedup(T(s, dir, "documents"), "text", "doc_id",
        window = 16, modulus = 16)
      .orderBy(col("doc_id")))

  // Token-budget selection: greedy highest-priority-first corpus
  // assembly under a token budget — deterministic order
  // (priority DESC, id), keep while the PRECEDING cumulative count is
  // under budget. Integers end to end.
  private val t49 = Q("t49_token_budget_select", Some("""
    WITH feat AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS priority
      FROM documents),
    ranked AS (SELECT doc_id, priority, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY priority DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM feat)
    SELECT doc_id, priority, n_tokens, CAST(cum_before AS BIGINT) AS cum_before
    FROM ranked WHERE cum_before < 5000
    ORDER BY priority DESC, doc_id"""),
    (s, dir) => graft.pipeline.Sampling.tokenBudgetSelect(
        T(s, dir, "documents"), "text", "doc_id", budget = 5000L)
      .orderBy(col("priority").desc, col("doc_id")))

  // Audio quality gate over REAL decoded PCM: clipping / DC offset /
  // silence / dynamic range / peak — every field exact integer math
  // or one integer division, decode + stats in one mapPartitions.
  // ASCII pin as in m04 (sample = ord·128, so clip ⟺ ord ≥ 250,
  // silence ⟺ ord ≤ 32 — spaces are the quiet samples).
  private val m16 = Q("m16_audio_quality", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text))
    SELECT doc_id AS sample_id, CAST(n AS BIGINT) AS n_samples,
      CAST(len(list_filter(cs, c -> ord(c) >= 250)) AS DOUBLE) / n AS clip_ratio,
      CAST(list_sum(list_transform(cs, c -> CAST(ord(c) * 128 AS BIGINT))) AS DOUBLE) / n AS dc_offset,
      CAST(len(list_filter(cs, c -> ord(c) <= 32)) AS DOUBLE) / n AS silence_ratio,
      CAST((list_max(list_transform(cs, c -> ord(c))) -
            list_min(list_transform(cs, c -> ord(c)))) * 128 AS BIGINT) AS dyn_range,
      CAST(list_max(list_transform(cs, c -> ord(c))) * 128 AS BIGINT) AS peak
    FROM d ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.audioQualityReport(
          Multimodal.textAsWav(docs, "doc_id", "text"),
          clipAt = 32000, silentAt = 4096)
        .orderBy(col("sample_id"))
    })

  // ViT-style 5×5 patch grid over REAL decoded BMP pixels: per-tile
  // channel means (the patch-embedding prep + blank-tile signal).
  // The oracle recomputes every tile from the ground-truth text via
  // the m05 channel maps and the integer coordinate map; zero-byte
  // padding past the text end contributes 0 to every channel.
  private val m17 = Q("m17_image_patches", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    g AS (SELECT doc_id, nb, h, cs, pr, pc,
        LEAST((pr + 1) * 5, h) - pr * 5 AS prows
      FROM d,
        UNNEST(generate_series(0, (h + 4) // 5 - 1)) AS a(pr),
        UNNEST([0, 1]) AS b(pc))
    SELECT doc_id AS sample_id, CAST(pr AS BIGINT) AS patch_row,
      CAST(pc AS BIGINT) AS patch_col,
      CAST(prows * 5 AS BIGINT) AS n_px,
      CAST(list_sum(list_transform(generate_series(0, prows * 5 - 1), k ->
        CASE WHEN (pr * 5 + k // 5) * 10 + pc * 5 + k % 5 < nb
          THEN (2 * ord(cs[CAST((pr * 5 + k // 5) * 10 + pc * 5 + k % 5 + 1 AS BIGINT)])) % 256
          ELSE 0 END)) AS DOUBLE) / (prows * 5) AS mean_r,
      CAST(list_sum(list_transform(generate_series(0, prows * 5 - 1), k ->
        CASE WHEN (pr * 5 + k // 5) * 10 + pc * 5 + k % 5 < nb
          THEN 255 - ord(cs[CAST((pr * 5 + k // 5) * 10 + pc * 5 + k % 5 + 1 AS BIGINT)])
          ELSE 0 END)) AS DOUBLE) / (prows * 5) AS mean_g,
      CAST(list_sum(list_transform(generate_series(0, prows * 5 - 1), k ->
        CASE WHEN (pr * 5 + k // 5) * 10 + pc * 5 + k % 5 < nb
          THEN ord(cs[CAST((pr * 5 + k // 5) * 10 + pc * 5 + k % 5 + 1 AS BIGINT)])
          ELSE 0 END)) AS DOUBLE) / (prows * 5) AS mean_b
    FROM g ORDER BY sample_id, patch_row, patch_col"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.imagePatches(
          Multimodal.textAsBmp(docs, "doc_id", "text", width = 10),
          patchW = 5, patchH = 5)
        .orderBy(col("sample_id"), col("patch_row"), col("patch_col"))
    })

  // Dedup IMPACT report: the cluster-size histogram + removable-doc
  // accounting read before committing a dedup (n_docs sums to the
  // corpus; n_removable is exactly d11's deletion). One rollup over
  // the d06 closure; the singleton row is corpus−clustered.
  private val d27 = Q("d27_dedup_impact", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u),
    cl AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1),
    hist AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM cl GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM documents),
    ncl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM comp)
    SELECT cluster_size, n_clusters,
      CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
      CAST((cluster_size - 1) * n_clusters AS BIGINT) AS n_removable
    FROM hist
    UNION ALL
    SELECT CAST(1 AS BIGINT), tot.ntot - ncl.n, tot.ntot - ncl.n, CAST(0 AS BIGINT)
    FROM tot, ncl WHERE tot.ntot - ncl.n > 0
    ORDER BY cluster_size"""),
    (s, dir) => Dedup.dedupImpactReport(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None) // exact: oracle-comparable
      .orderBy(col("cluster_size")))

  // The COMPOSED dedup pipeline run: candidates (d12's banding) →
  // exact-Jaccard verify at τ (d24) → closure (d06) → keep-min-id
  // (d11), emitting the deduped corpus AND the per-stage audit counts
  // in one result — the config chosen from the d29–d33 curves,
  // actually RUN. The oracle replays every stage, so a wrong count in
  // any leg or a mis-kept doc breaks the hash.
  private val d34 = Q("d34_dedup_pipeline_run", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    ver AS (SELECT id_a, id_b
      FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM ver UNION SELECT id_b, id_a FROM ver),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    kept AS (SELECT 'kept' AS stage, d.doc_id, CAST(NULL AS BIGINT) AS n
      FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)),
    counts AS (
      SELECT 'candidates' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        CAST(COUNT(*) AS BIGINT) AS n FROM cand
      UNION ALL SELECT 'verified', NULL, CAST(COUNT(*) AS BIGINT) FROM ver
      UNION ALL SELECT 'clusters', NULL, CAST(COUNT(DISTINCT rep) AS BIGINT) FROM comp
      UNION ALL SELECT 'dropped', NULL, CAST(COUNT(*) AS BIGINT) FROM dropped)
    SELECT stage, doc_id, n FROM kept
    UNION ALL SELECT stage, doc_id, n FROM counts
    ORDER BY stage, doc_id"""),
    (s, dir) => Dedup.dedupPipelineRun(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4, tau = 0.3)
      .orderBy(col("stage"), col("doc_id").asc_nulls_last))

  // Trained NB language-ID confusion matrix: add-one multinomial NB
  // (trained on the corpus's own labels) predicts every doc, confusion
  // vs labels comes back — the audit deciding whether the cheap
  // classifier can replace labels. t29's ln-count discipline; argmax
  // orders by the ROUNDED score with the class as tie-break.
  private val t50 = Q("t50_langid_confusion", Some("""
    WITH toks AS (SELECT doc_id, lang AS lab, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    dc AS (SELECT doc_id, lab, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2, 3),
    cls AS (SELECT tok, lab AS cand, CAST(SUM(c) AS BIGINT) AS ctl FROM dc GROUP BY 1, 2),
    nl AS (SELECT cand, CAST(SUM(ctl) AS BIGINT) AS nlang FROM cls GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM cls),
    langs AS (SELECT DISTINCT lang AS cand FROM documents),
    priors AS (SELECT lang AS cand, CAST(COUNT(*) AS BIGINT) AS ndl FROM documents GROUP BY 1),
    ntot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM documents),
    sc AS (SELECT dc.doc_id, dc.lab, l.cand,
        SUM(CAST(dc.c AS DOUBLE) * ln((CAST(COALESCE(cls.ctl, 0) AS DOUBLE) + 1.0)
          / (CAST(nl.nlang AS DOUBLE) + v.v))) AS s
      FROM dc CROSS JOIN langs l
        LEFT JOIN cls ON cls.tok = dc.tok AND cls.cand = l.cand
        JOIN nl ON nl.cand = l.cand, v
      GROUP BY 1, 2, 3),
    scored AS (SELECT sc.doc_id, sc.lab, sc.cand,
        ROUND(sc.s + ln(CAST(p.ndl AS DOUBLE) / ntot.nt), 6) + 0.0 AS score
      FROM sc JOIN priors p ON p.cand = sc.cand, ntot),
    pred AS (SELECT doc_id, lab, cand FROM (
        SELECT doc_id, lab, cand,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        FROM scored) WHERE rn = 1)
    SELECT lab AS true_lang, cand AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY true_lang, pred_lang"""),
    (s, dir) => TextAnalysis.nbLangConfusion(T(s, dir, "documents"),
        "text", "doc_id", "lang")
      .orderBy(col("true_lang"), col("pred_lang")))

  // Retrieval-quality audit: nDCG@10 of the SQ8 ranking vs the exact
  // ranking per query — recall counts hits, nDCG also charges
  // order errors. Both legs replay in SQL (s27's quantizer + the s04
  // rank window); IDCG folds i-ascending on both engines.
  private val s29 = Q("s29_retrieval_ndcg", Some("""
    WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 5),
    coded AS (SELECT vec_id, list_transform(embedding, x ->
        (CAST(GREATEST(-128, LEAST(127,
           ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * 255.0) - 128)) AS DOUBLE)
         + 128.0) / 255.0 * 4.0 + (-2.0)) AS rvec
      FROM embeddings),
    aleg AS (SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, c.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
            list_sum(list_transform(generate_series(1, len(c.rvec)), i -> c.rvec[i] * q.qv[i]))
            / (sqrt(list_sum(list_transform(c.rvec, x -> x * x)))
               * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) DESC, c.vec_id) AS rank
        FROM coded c, q WHERE c.vec_id <> q.query_id) WHERE rank <= 10),
    eleg AS (SELECT query_id, vec_id, 1 AS hit FROM (
        SELECT q.query_id, e.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
            list_sum(list_transform(generate_series(1, len(e.embedding)), i ->
              CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
            / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) DESC, e.vec_id) AS rank
        FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rank <= 10),
    idcg AS (SELECT list_sum(list_transform(generate_series(1, 10),
        i -> 1.0 / log2(CAST(i + 1 AS DOUBLE)))) AS idcg)
    SELECT a.query_id,
      CAST(SUM(COALESCE(e.hit, 0)) AS BIGINT) AS n_hits,
      ROUND(SUM(CASE WHEN e.hit = 1 THEN 1.0 / log2(CAST(a.rank + 1 AS DOUBLE)) ELSE 0.0 END)
        / idcg.idcg, 6) + 0.0 AS ndcg
    FROM aleg a LEFT JOIN eleg e USING (query_id, vec_id), idcg
    GROUP BY a.query_id, idcg.idcg ORDER BY query_id"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Quantize.retrievalNdcg(emb, "embedding", "vec_id",
          emb.filter(col("vec_id") < 5), "vec_id", k = 10, lo = -2.0, hi = 2.0)
        .orderBy(col("query_id"))
    })

  // Scene segmentation over REAL decoded AVI frames: cuts where the
  // frame hash moves > 3 bits from its predecessor (m12's flag
  // inverted), runs become scenes via a running cut count — the shot
  // detector video sampling starts from. One sample-keyed exchange
  // (m15's shape); the oracle rebuilds hashes, cuts, and scene spans
  // from the text byte map.
  private val m18 = Q("m18_scene_segments", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    fr AS (SELECT doc_id, nb, cs, f
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f)),
    g AS (SELECT doc_id, f, nb, cs, r * 8 + c AS i,
        f * 10 + ((r * 2) // 8) * 5 + (c * 5) // 8 AS idx
      FROM fr, UNNEST(generate_series(0, 7)) AS gr(r),
              UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, f, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, f, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean
          FROM v GROUP BY doc_id, f),
    ah AS (SELECT v.doc_id, v.f,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS ahash_hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM v JOIN m ON v.doc_id = m.doc_id AND v.f = m.f
      GROUP BY v.doc_id, v.f),
    cuts AS (SELECT doc_id, f,
        CASE WHEN LAG(ahash_hi) OVER w IS NULL THEN 1
             WHEN bit_count(xor(ahash_hi, LAG(ahash_hi) OVER w)) +
                  bit_count(xor(ahash_lo, LAG(ahash_lo) OVER w)) > 3 THEN 1
             ELSE 0 END AS cut
      FROM ah WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
    scenes AS (SELECT doc_id, f,
        SUM(cut) OVER (PARTITION BY doc_id ORDER BY f
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_idx
      FROM cuts)
    SELECT doc_id AS sample_id, CAST(scene_idx AS BIGINT) AS scene_idx,
      CAST(MIN(f) AS BIGINT) AS start_frame, CAST(MAX(f) AS BIGINT) AS end_frame,
      CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM scenes GROUP BY doc_id, scene_idx
    ORDER BY sample_id, scene_idx"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.sceneSegments(
          Multimodal.framePerceptualHash(
            Multimodal.textAsAvi(docs, "doc_id", "text")).toDF(),
          maxHamming = 3)
        .orderBy(col("sample_id"), col("scene_idx"))
    })

  // MinHash signature-accuracy audit: slot-match estimate vs exact
  // Jaccard on every banded candidate (d19 audits the banding's
  // recall; this audits the ESTIMATOR — the two halves of "can I
  // trust k hashes"). Pure integers + exact divisions.
  private val d28 = Q("d28_minhash_accuracy", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    est AS (SELECT c.id_a, c.id_b,
        CAST((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END) +
             (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      FROM cand c JOIN sig a ON a.doc_id = c.id_a JOIN sig b ON b.doc_id = c.id_b),
    inter AS (SELECT c.id_a AS ia, c.id_b AS ib, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT e.id_a, e.id_b, e.n_match,
      CAST(e.n_match AS DOUBLE) / 8.0 AS est_jaccard,
      CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS exact_jaccard,
      ABS(CAST(e.n_match AS DOUBLE) / 8.0 -
          CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE)) AS abs_err
    FROM est e
      JOIN inter i ON i.ia = e.id_a AND i.ib = e.id_b
      JOIN sizes na ON na.doc_id = e.id_a
      JOIN sizes nb ON nb.doc_id = e.id_b
    ORDER BY e.id_a, e.id_b"""),
    (s, dir) => Dedup.minHashAccuracyAudit(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4)
      .orderBy(col("id_a"), col("id_b")))

  // Contamination sensitivity curve: flagged fraction across shingle
  // sizes {2,4,8} — the calibration run before committing to a
  // decontamination n (n=2 flags everything, n=8 only verbatim
  // spans). One t09 leg per n; |ns| output rows.
  private val t51 = Q("t51_contamination_curve", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    ns AS (SELECT UNNEST([2, 4, 8]) AS n),
    sh AS (SELECT ns.n, doc_id,
        array_to_string(list_slice(ts, i, i + ns.n - 1), ' ') AS shingle
      FROM toks, ns, UNNEST(generate_series(1, len(ts) - ns.n + 1)) AS u(i)
      WHERE len(ts) >= ns.n),
    dsh AS (SELECT DISTINCT n, doc_id, shingle FROM sh),
    bench AS (SELECT DISTINCT n, shingle FROM dsh WHERE doc_id % 50 = 0),
    flagged AS (SELECT d.n, d.doc_id
      FROM dsh d JOIN bench b ON b.n = d.n AND b.shingle = d.shingle
      WHERE d.doc_id % 50 <> 0
      GROUP BY d.n, d.doc_id),
    fcounts AS (SELECT n, COUNT(*) AS nf FROM flagged GROUP BY n),
    train AS (SELECT COUNT(*) AS nt FROM documents WHERE doc_id % 50 <> 0)
    -- drive from the ns list so a size that flags NOTHING still
    -- reports its zero row (the curve's whole point)
    SELECT CAST(ns.n AS BIGINT) AS shingle_n,
      CAST(COALESCE(fcounts.nf, 0) AS BIGINT) AS n_flagged,
      CAST(COALESCE(fcounts.nf, 0) AS DOUBLE) / train.nt AS frac_flagged
    FROM ns LEFT JOIN fcounts ON fcounts.n = ns.n, train
    ORDER BY shingle_n"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.contaminationCurve(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", ns = Seq(2, 4, 8))
        .orderBy(col("shingle_n"))
    })

  // IVF cell-balance audit over the seeded cells: member histogram +
  // imbalance factor — the index-health check behind every nprobe
  // cost estimate. Integers + exact divisions.
  private val s30 = Q("s30_ivf_cell_balance", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    hist AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members FROM assigned GROUP BY cell),
    tot AS (SELECT CAST(SUM(n_members) AS BIGINT) AS nt,
            CAST(MAX(n_members) AS BIGINT) AS mx FROM hist)
    SELECT h.cell, h.n_members,
      CAST(h.n_members AS DOUBLE) / tot.nt AS frac,
      CAST(tot.mx AS DOUBLE) * 8.0 / tot.nt AS imbalance
    FROM hist h, tot ORDER BY cell"""),
    (s, dir) => graft.pipeline.Clustering.cellBalanceReport(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8)
      .orderBy(col("cell")))

  // IVF recall-vs-nprobe tuning curve: recall@10 at nprobe {1,2,4,8}
  // from ONE corpus scan (every vector carries its cell's probe rank;
  // "visible at n" = rank <= n). The tuning run before fixing the
  // probe budget — pairs with s30's balance audit.
  private val s31 = Q("s31_recall_vs_nprobe", Some("""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
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
    cellrank AS (
      SELECT c.cell,
        ROW_NUMBER() OVER (ORDER BY
          list_sum(list_transform(generate_series(1, len(q.qv)),
            j -> q.qv[j] * c.cv[j]))
          / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
             * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC, c.cell) AS cr
      FROM cents c, q),
    scored AS (
      SELECT e.vec_id, cr.cr AS cell_rank,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          j -> CAST(e.embedding[j] AS DOUBLE) * q.qv[j]))
        / (sqrt(list_sum(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_sim
      FROM embeddings e
        JOIN assigned a USING (vec_id)
        JOIN cellrank cr ON cr.cell = a.cell, q
      WHERE e.vec_id <> 0),
    ns AS (SELECT CAST(UNNEST([1, 2, 4, 8]) AS BIGINT) AS nprobe),
    approx AS (SELECT nprobe, vec_id FROM (
        SELECT ns.nprobe, s.vec_id,
          ROW_NUMBER() OVER (PARTITION BY ns.nprobe
            ORDER BY s.cos_sim DESC, s.vec_id) AS rank
        FROM scored s JOIN ns ON s.cell_rank <= ns.nprobe) WHERE rank <= 10),
    exact AS (SELECT vec_id, 1 AS hit FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= 10),
    counts AS (SELECT a.nprobe, SUM(COALESCE(e.hit, 0)) AS nh
      FROM approx a LEFT JOIN exact e USING (vec_id) GROUP BY a.nprobe)
    SELECT ns.nprobe, CAST(COALESCE(counts.nh, 0) AS BIGINT) AS n_hits,
      CAST(COALESCE(counts.nh, 0) AS DOUBLE) / 10.0 AS recall
    FROM ns LEFT JOIN counts USING (nprobe) ORDER BY nprobe"""),
    (s, dir) => graft.pipeline.Ivf.recallVsNprobe(T(s, dir, "embeddings"),
        "embedding", "vec_id", queryId = 0L, k = 10, numCells = 8,
        nprobes = Seq(1, 2, 4, 8))
      .orderBy(col("nprobe")))

  // SemDeDup threshold sweep: corpus fraction each cosine threshold
  // would drop, from ONE within-cell pair pass (per-doc max cosine to
  // a smaller-id neighbor = its survival threshold; the sweep is a
  // histogram). The tuning curve behind d14's threshold choice —
  // completes the round-12 calibration trio (t51, s31, d29).
  private val d29 = Q("d29_semdedup_threshold_curve", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    pairs AS (SELECT b.vec_id AS id_b,
        list_sum(list_transform(generate_series(1, len(eb.embedding)),
          i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id),
    mx AS (SELECT id_b, MAX(cos) AS m FROM pairs GROUP BY id_b),
    ts AS (SELECT CAST(UNNEST([0.2, 0.25, 0.3, 0.35, 0.4]) AS DOUBLE) AS threshold),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM embeddings),
    counts AS (SELECT ts.threshold, COUNT(*) AS nc
      FROM mx JOIN ts ON mx.m >= ts.threshold GROUP BY ts.threshold)
    SELECT ts.threshold, CAST(COALESCE(counts.nc, 0) AS BIGINT) AS n_dropped,
      CAST(COALESCE(counts.nc, 0) AS DOUBLE) / tot.nd AS drop_frac
    FROM ts LEFT JOIN counts USING (threshold), tot ORDER BY ts.threshold"""),
    (s, dir) => graft.pipeline.Clustering.semDedupThresholdCurve(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
        thresholds = Seq(0.2, 0.25, 0.3, 0.35, 0.4))
      .orderBy(col("threshold")))

  // LSH band-shape planner: expected FP/FN/recall of every candidate
  // (bands, rows) signature split at the target Jaccard threshold,
  // from the d28 audit's measured pair population — collision
  // probability 1-(1-s^r)^b spelled as multiplication chains on both
  // engines (no libm pow). One measurement pass; the sweep is
  // arithmetic over a 4-row config broadcast.
  private val d30 = Q("d30_lsh_band_planner", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    inter AS (SELECT c.id_a AS ia, c.id_b AS ib, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    pairs AS (SELECT
        CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS s
      FROM inter i
        JOIN sizes na ON na.doc_id = i.ia
        JOIN sizes nb ON nb.doc_id = i.ib),
    pw AS (SELECT s, s * s AS s2, (s * s) * (s * s) AS s4,
        ((s * s) * (s * s)) * ((s * s) * (s * s)) AS s8 FROM pairs),
    cfg AS (SELECT * FROM (VALUES (1, 8), (2, 4), (4, 2), (8, 1)) AS t(bands, rows_per_band)),
    pp AS (SELECT c.bands, c.rows_per_band, p.s,
        CASE c.bands
          WHEN 1 THEN p.s8
          WHEN 2 THEN 1 - (1 - p.s4) * (1 - p.s4)
          WHEN 4 THEN 1 - ((1 - p.s2) * (1 - p.s2)) * ((1 - p.s2) * (1 - p.s2))
          ELSE 1 - (((1 - p.s) * (1 - p.s)) * ((1 - p.s) * (1 - p.s)))
                 * (((1 - p.s) * (1 - p.s)) * ((1 - p.s) * (1 - p.s)))
        END AS p
      FROM pw p CROSS JOIN cfg c),
    agg AS (SELECT bands, rows_per_band,
        CAST(COUNT(*) FILTER (WHERE s < 0.5) AS BIGINT) AS n_below,
        CAST(COUNT(*) FILTER (WHERE s >= 0.5) AS BIGINT) AS n_above,
        ROUND(COALESCE(SUM(p) FILTER (WHERE s < 0.5), 0.0), 6) AS exp_fp,
        ROUND(COALESCE(SUM(1 - p) FILTER (WHERE s >= 0.5), 0.0), 6) AS exp_fn,
        CASE WHEN COUNT(*) FILTER (WHERE s >= 0.5) > 0
          THEN ROUND(SUM(p) FILTER (WHERE s >= 0.5)
               / CAST(COUNT(*) FILTER (WHERE s >= 0.5) AS DOUBLE), 6) END AS recall_at_tau
      FROM pp GROUP BY bands, rows_per_band)
    SELECT CAST(c.bands AS BIGINT) AS bands,
      CAST(c.rows_per_band AS BIGINT) AS rows_per_band,
      COALESCE(a.n_below, 0) AS n_below, COALESCE(a.n_above, 0) AS n_above,
      COALESCE(a.exp_fp, 0.0) AS exp_fp, COALESCE(a.exp_fn, 0.0) AS exp_fn,
      a.recall_at_tau
    FROM cfg c LEFT JOIN agg a USING (bands, rows_per_band)
    ORDER BY bands"""),
    (s, dir) => Dedup.lshBandPlanner(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, numHashes = 8, auditBands = 4,
        configs = Seq((1, 8), (2, 4), (4, 2), (8, 1)), tau = 0.5)
      .orderBy(col("bands")))

  // CCNet-style perplexity bucketing: equal-count deciles by t27's
  // interpolated-LM score (bucket 1 = lowest-perplexity head, bucket
  // 10 = the tail a perplexity filter drops). DECIMAL-exact avg over
  // the contract-rounded per-doc scores; only ppl_of_avg (exp of a
  // bit-equal input) carries its own ROUND(6).
  private val t52 = Q("t52_perplexity_buckets", Some("""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM
            (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok),
    n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM u),
    bg AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, ts[i] || ' ' || ts[i+1] AS b
           FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
           WHERE len(ts) >= 2),
    dc AS (SELECT doc_id, w1, w2, b, COUNT(*) AS c_doc FROM bg GROUP BY doc_id, w1, w2, b),
    cb AS (SELECT b, SUM(c_doc) AS c12 FROM dc GROUP BY b),
    cw AS (SELECT w1, SUM(c_doc) AS c1 FROM dc GROUP BY w1),
    base AS (
      SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_bigrams,
        ROUND(SUM(CAST(c_doc AS DOUBLE) * ln(
            CAST(0.5 AS DOUBLE) * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
            + (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) * (CAST(cu AS DOUBLE) / n_total)))
          / CAST(SUM(c_doc) AS DOUBLE), 6) AS mean_logp
      FROM dc JOIN cb USING (b) JOIN cw USING (w1) JOIN u ON u.tok = dc.w2, n
      GROUP BY doc_id),
    bk AS (SELECT doc_id, n_bigrams, mean_logp,
        NTILE(10) OVER (ORDER BY mean_logp DESC, doc_id) AS bucket FROM base)
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
      CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
      MIN(mean_logp) AS min_logp, MAX(mean_logp) AS max_logp,
      CAST(SUM(CAST(mean_logp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_logp,
      ROUND(exp(-(CAST(SUM(CAST(mean_logp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))), 6) AS ppl_of_avg
    FROM bk GROUP BY bucket ORDER BY bucket"""),
    (s, dir) => TextAnalysis.perplexityBuckets(T(s, dir, "documents"), "text",
        "doc_id", lambda = 0.5, buckets = 10)
      .orderBy(col("bucket")))

  // PQ distortion audit: per-subspace mean/worst quantization error
  // of the seeded codebook (s16's) — the resolution check run before
  // trusting ADC scores. The PqSubErrors kernel computes all m
  // errors in one codegen scan; the oracle replays the argmin
  // distance per (vec, j) with the same i-ascending fold.
  private val s32 = Q("s32_pq_distortion", Some("""
    WITH js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    best AS (
      SELECT vec_id, j, d FROM (
        SELECT vec_id, j, d,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1)
    SELECT CAST(j AS BIGINT) AS j, COUNT(*) AS n_vecs,
      ROUND(AVG(d), 6) AS mse, MAX(d) AS max_err
    FROM best GROUP BY j ORDER BY j"""),
    (s, dir) => graft.pipeline.Pq.distortionReport(T(s, dir, "embeddings"),
        "embedding", "vec_id", m = 8, ksub = 16)
      .orderBy(col("j")))

  // Spectral shape features (centroid / bandwidth / flatness) from
  // the m14 DFT fold over bins 1..8 — the numbers audio quality
  // gating thresholds on. Every feature is an O(1) ratio of per-doc
  // sums over 8 bit-exact bin energies, so ROUND(6) closes it.
  private val m19 = Q("m19_spectral_features", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    b AS (SELECT doc_id, n, cs, k FROM d, UNNEST(generate_series(1, 8)) AS g(k)),
    co AS (SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
      FROM b),
    e AS (SELECT sample_id, bin, c * c + s * s AS e FROM co),
    agg AS (SELECT sample_id, COUNT(*) AS nb, SUM(e) AS se,
        SUM(bin * e) AS ske, SUM(bin * bin * e) AS sk2e,
        SUM(ln(e + 1)) AS sl, SUM(e + 1) AS sa
      FROM e GROUP BY sample_id)
    SELECT sample_id,
      CASE WHEN se > 0 THEN ROUND(ske / se, 6) END AS centroid,
      CASE WHEN se > 0 THEN ROUND(sqrt(GREATEST(sk2e / se - (ske / se) * (ske / se), 0.0)), 6) END AS bandwidth,
      ROUND(exp(sl / CAST(nb AS DOUBLE)) / (sa / CAST(nb AS DOUBLE)), 6) AS flatness
    FROM agg ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.spectralFeatures(
          Multimodal.textAsWav(docs, "doc_id", "text"), nBins = 8)
        .orderBy(col("sample_id"))
    })

  // MinHash signature-size sweep: estimator error vs k from ONE
  // 16-slot signature pass (a k-slot estimate is a prefix match
  // count) — "how many hashes" beside d30's "how to band them".
  private val d31 = Q("d31_minhash_size_sweep", Some(s"""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
        ${(0 until 16).map(i => s"MIN(md5('$i:' || shingle)) AS m$i")
          .mkString(",\n        ")}
      FROM sh GROUP BY doc_id),
    bnd AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    pref AS (SELECT c.id_a, c.id_b,
        ${Seq(4, 8, 16).map(k => (0 until k).map(i =>
            s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
          .mkString(" + ") + s" AS n$k").mkString(",\n        ")}
      FROM cand c JOIN sig a ON a.doc_id = c.id_a JOIN sig b ON b.doc_id = c.id_b),
    inter AS (SELECT c.id_a AS ia, c.id_b AS ib, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    errs AS (SELECT ts.k,
        ABS(CASE ts.k WHEN 4 THEN CAST(p.n4 AS DOUBLE) / 4.0
                      WHEN 8 THEN CAST(p.n8 AS DOUBLE) / 8.0
                      ELSE CAST(p.n16 AS DOUBLE) / 16.0 END
          - CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE)) AS err
      FROM pref p
        JOIN inter i ON i.ia = p.id_a AND i.ib = p.id_b
        JOIN sizes na ON na.doc_id = p.id_a
        JOIN sizes nb ON nb.doc_id = p.id_b
        CROSS JOIN (SELECT UNNEST([4, 8, 16]) AS k) ts),
    agg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        ROUND(AVG(err), 6) AS mean_abs_err,
        ROUND(sqrt(AVG(err * err)), 6) AS rmse,
        MAX(err) AS max_abs_err
      FROM errs GROUP BY k)
    SELECT CAST(ks.k AS BIGINT) AS k, COALESCE(a.n_pairs, 0) AS n_pairs,
      a.mean_abs_err, a.rmse, a.max_abs_err
    FROM (SELECT UNNEST([4, 8, 16]) AS k) ks LEFT JOIN agg a USING (k)
    ORDER BY ks.k"""),
    (s, dir) => Dedup.minHashSizeSweep(T(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, ks = Seq(4, 8, 16), candidateHashes = 8, auditBands = 4)
      .orderBy(col("k")))

  // Packing-waste curve: per candidate context length, packs /
  // padding / straddled docs from the ONE running-sum window t16
  // already runs — the sweep is integer floor-division arithmetic.
  private val t53 = Q("t53_packing_waste_curve", Some("""
    WITH d AS (SELECT source, doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(SUM(len(string_split(text, ' '))) OVER
          (PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM documents),
    ls AS (SELECT CAST(UNNEST([128, 256, 512, 1024]) AS BIGINT) AS budget),
    straddle AS (SELECT l.budget,
        CAST(SUM(CASE WHEN (d.cum - d.n_tokens) // l.budget
                       <> (d.cum - 1) // l.budget THEN 1 ELSE 0 END) AS BIGINT)
          AS n_straddled
      FROM d CROSS JOIN ls l GROUP BY l.budget),
    st AS (SELECT source, MAX(cum) AS t FROM d GROUP BY source),
    packs AS (SELECT l.budget,
        CAST(SUM((s.t + l.budget - 1) // l.budget) AS BIGINT) AS n_packs,
        CAST(SUM(s.t) AS BIGINT) AS n_tokens,
        CAST(SUM(((s.t + l.budget - 1) // l.budget) * l.budget - s.t) AS BIGINT)
          AS n_padding
      FROM st s CROSS JOIN ls l GROUP BY l.budget)
    SELECT p.budget, p.n_packs, p.n_tokens, p.n_padding,
      CAST(p.n_padding AS DOUBLE) / CAST(p.n_packs * p.budget AS DOUBLE)
        AS padding_frac,
      s.n_straddled
    FROM packs p JOIN straddle s USING (budget)
    ORDER BY p.budget"""),
    (s, dir) => graft.pipeline.Sampling.packingWasteCurve(
        T(s, dir, "documents"), "text", "doc_id", "source",
        budgets = Seq(128L, 256L, 512L, 1024L))
      .orderBy(col("budget")))

  // Scalar-quantization bit-width sweep: reconstruction MSE and
  // worst-case error per candidate width from ONE corpus scan — each
  // width is a different level count in the same affine round-trip.
  // The memory-vs-fidelity curve beside s32's PQ resolution check.
  private val s33 = Q("s33_sq_bits_sweep", Some("""
    WITH ls AS (SELECT * FROM (VALUES (2, 3.0), (4, 15.0), (6, 63.0), (8, 255.0))
        AS t(bits, lev)),
    per AS (SELECT l.bits, l.lev,
        list_sum(list_transform(e.embedding, x ->
          (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))
          * (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))))
          AS sq_sum,
        list_max(list_transform(e.embedding, x ->
          ABS(CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))))
          AS mx,
        CAST(len(e.embedding) AS BIGINT) AS n
      FROM embeddings e CROSS JOIN ls l)
    SELECT CAST(bits AS BIGINT) AS bits, CAST(SUM(n) AS BIGINT) AS n_values,
      ROUND(SUM(sq_sum) / CAST(SUM(n) AS DOUBLE), 6) AS mse,
      MAX(mx) AS max_abs_err
    FROM per GROUP BY bits ORDER BY bits"""),
    (s, dir) => graft.pipeline.Quantize.bitsSweep(T(s, dir, "embeddings"),
        "embedding", lo = -2.0, hi = 2.0, bitsList = Seq(2, 4, 6, 8))
      .orderBy(col("bits")))

  // Containment-threshold curve: directed pair count + distinct docs
  // a containment dedup would drop per candidate tau, from ONE
  // inverted-index pair pass at tau_min — the curve behind d07's 0.9.
  private val d32 = Q("d32_containment_curve", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    dir AS (
      SELECT id_a AS id_sub, CAST(n_inter AS DOUBLE) / CAST(na.n_sh AS DOUBLE) AS containment
      FROM inter JOIN sizes na ON na.doc_id = id_a
      UNION ALL
      SELECT id_b, CAST(n_inter AS DOUBLE) / CAST(nb.n_sh AS DOUBLE)
      FROM inter JOIN sizes nb ON nb.doc_id = id_b),
    base AS (SELECT id_sub, containment FROM dir WHERE containment >= 0.5),
    tsl AS (SELECT CAST(UNNEST([0.5, 0.7, 0.8, 0.9, 0.95]) AS DOUBLE) AS threshold),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    agg AS (SELECT t.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT b.id_sub) AS BIGINT) AS n_docs_dropped
      FROM base b JOIN tsl t ON b.containment >= t.threshold
      GROUP BY t.threshold)
    SELECT t.threshold, COALESCE(a.n_pairs, 0) AS n_pairs,
      COALESCE(a.n_docs_dropped, 0) AS n_docs_dropped,
      CAST(COALESCE(a.n_docs_dropped, 0) AS DOUBLE) / tot.nd AS drop_frac
    FROM tsl t LEFT JOIN agg a USING (threshold), tot
    ORDER BY t.threshold"""),
    (s, dir) => Dedup.containmentCurve(T(s, dir, "documents"), "text", "doc_id",
        n = 3, thresholds = Seq(0.5, 0.7, 0.8, 0.9, 0.95), maxPostings = None)
      .orderBy(col("threshold")))

  // Jaccard-threshold curve for the core n-gram dedup: qualifying
  // pairs + docs the keep-min-id convention would drop per candidate
  // tau — one inverted-index pass, the curve behind d02/d06/d11's 0.3.
  private val d33 = Q("d33_jaccard_threshold_curve", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b,
        CAST(n_inter AS DOUBLE) /
          CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b),
    base AS (SELECT id_b, jaccard FROM pairs WHERE jaccard >= 0.2),
    mx AS (SELECT id_b, MAX(jaccard) AS m FROM base GROUP BY id_b),
    tsl AS (SELECT CAST(UNNEST([0.2, 0.3, 0.5, 0.7, 0.9]) AS DOUBLE) AS threshold),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    pagg AS (SELECT t.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM base b JOIN tsl t ON b.jaccard >= t.threshold GROUP BY t.threshold),
    dagg AS (SELECT t.threshold, CAST(COUNT(*) AS BIGINT) AS n_docs_dropped
      FROM mx JOIN tsl t ON mx.m >= t.threshold GROUP BY t.threshold)
    SELECT t.threshold, COALESCE(p.n_pairs, 0) AS n_pairs,
      COALESCE(d.n_docs_dropped, 0) AS n_docs_dropped,
      CAST(COALESCE(d.n_docs_dropped, 0) AS DOUBLE) / tot.nd AS drop_frac
    FROM tsl t LEFT JOIN pagg p USING (threshold)
      LEFT JOIN dagg d USING (threshold), tot
    ORDER BY t.threshold"""),
    (s, dir) => Dedup.jaccardThresholdCurve(T(s, dir, "documents"), "text",
        "doc_id", n = 3, thresholds = Seq(0.2, 0.3, 0.5, 0.7, 0.9),
        maxPostings = None)
      .orderBy(col("threshold")))

  // Octave-band log energies (bins 1 | 2-3 | 4-7 | 8-15 of the real
  // DFT fold) — the constant-Q banding audio fingerprints use. Band
  // sums of bit-exact bin energies, ROUND(6) on the O(30) log.
  private val m20 = Q("m20_octave_band_energies", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    b AS (SELECT doc_id, n, cs, k FROM d, UNNEST(generate_series(1, 15)) AS g(k)),
    co AS (SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
      FROM b),
    e AS (SELECT sample_id, bin, c * c + s * s AS e FROM co),
    bands AS (SELECT sample_id,
        CAST(CASE WHEN bin = 1 THEN 1 WHEN bin <= 3 THEN 2
                  WHEN bin <= 7 THEN 3 ELSE 4 END AS BIGINT) AS band, e
      FROM e)
    SELECT sample_id, band, ROUND(ln(1 + SUM(e)), 6) AS log_energy
    FROM bands GROUP BY sample_id, band ORDER BY sample_id, band"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.octaveBandEnergies(
          Multimodal.textAsWav(docs, "doc_id", "text"))
        .orderBy(col("sample_id"), col("band"))
    })

  // Audio near-dup pairs by lossless energy-grid blocking — the audio
  // sibling of m11's image pairs: 4 octave-band log-energies per clip,
  // per-band cells of width 2τ at offsets {0, τ} (two values within τ
  // share a cell in ≥1 grid — the pigeonhole for continuous features),
  // composite keys across all 4 bands in 16 offset combos, exact
  // all-band |Δe| ≤ τ verification on bucket-mates only. τ = 0.125
  // (exact binary) keeps the floor arithmetic bit-identical.
  private val m21 = Q("m21_audio_fingerprint_pairs", Some("""
    WITH d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    b AS (SELECT doc_id, n, cs, k FROM d, UNNEST(generate_series(1, 15)) AS g(k)),
    co AS (SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
      FROM b),
    e AS (SELECT sample_id, bin, c * c + s * s AS e FROM co),
    bnd AS (SELECT sample_id,
        CAST(CASE WHEN bin = 1 THEN 1 WHEN bin <= 3 THEN 2
                  WHEN bin <= 7 THEN 3 ELSE 4 END AS BIGINT) AS band, e
      FROM e),
    be AS (SELECT sample_id, band, ROUND(ln(1 + SUM(e)), 6) AS le
      FROM bnd GROUP BY sample_id, band),
    vec AS (SELECT sample_id,
        MAX(CASE WHEN band = 1 THEN le END) AS e1,
        MAX(CASE WHEN band = 2 THEN le END) AS e2,
        MAX(CASE WHEN band = 3 THEN le END) AS e3,
        MAX(CASE WHEN band = 4 THEN le END) AS e4
      FROM be GROUP BY sample_id),
    combos AS (SELECT g AS cid FROM UNNEST(generate_series(0, 15)) t(g)),
    keys AS (SELECT v.sample_id, v.e1, v.e2, v.e3, v.e4, c.cid,
        CAST(floor((e1 + ((cid >> 0) & 1) * 0.125) / 0.25) AS BIGINT) AS k1,
        CAST(floor((e2 + ((cid >> 1) & 1) * 0.125) / 0.25) AS BIGINT) AS k2,
        CAST(floor((e3 + ((cid >> 2) & 1) * 0.125) / 0.25) AS BIGINT) AS k3,
        CAST(floor((e4 + ((cid >> 3) & 1) * 0.125) / 0.25) AS BIGINT) AS k4
      FROM vec v, combos c)
    SELECT DISTINCT a.sample_id AS id_a, b.sample_id AS id_b,
      GREATEST(abs(a.e1 - b.e1), abs(a.e2 - b.e2),
               abs(a.e3 - b.e3), abs(a.e4 - b.e4)) AS max_band_diff
    FROM keys a JOIN keys b
      ON a.cid = b.cid AND a.k1 = b.k1 AND a.k2 = b.k2
        AND a.k3 = b.k3 AND a.k4 = b.k4 AND a.sample_id < b.sample_id
    WHERE abs(a.e1 - b.e1) <= 0.125 AND abs(a.e2 - b.e2) <= 0.125
      AND abs(a.e3 - b.e3) <= 0.125 AND abs(a.e4 - b.e4) <= 0.125
    ORDER BY id_a, id_b"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.audioFingerprintDupPairs(
          Multimodal.textAsWav(docs, "doc_id", "text"), tau = 0.125)
        .orderBy(col("id_a"), col("id_b"))
    })

  // The INCREMENTAL composed dedup run: admit a daily batch
  // (doc_id % 10 = 0, d10's split) against the standing corpus —
  // corpus near-dups drop first (corpus wins), the remainder dedups
  // within the batch via closure + keep-min-id; per-doc dispositions
  // and the two pair counts in one result. Oracle replays every stage.
  private val d35 = Q("d35_incremental_dedup_run", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    cinter AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id, COUNT(*) AS n_inter
              FROM sh n JOIN sh c USING (shingle)
              WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
              GROUP BY 1, 2),
    cp AS (SELECT new_id, corpus_id FROM (
        SELECT new_id, corpus_id,
          CAST(n_inter AS DOUBLE) / CAST(sn.n_sh + sc.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM cinter
          JOIN sizes sn ON sn.doc_id = new_id
          JOIN sizes sc ON sc.doc_id = corpus_id)
      WHERE jaccard >= 0.3),
    cdup AS (SELECT DISTINCT new_id AS id FROM cp),
    newdocs AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
    clean AS (SELECT doc_id FROM newdocs
      WHERE doc_id NOT IN (SELECT id FROM cdup)),
    binter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id
                AND a.doc_id IN (SELECT doc_id FROM clean)
                AND b.doc_id IN (SELECT doc_id FROM clean)
              GROUP BY 1, 2),
    bp AS (SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM binter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM bp UNION SELECT id_b, id_a FROM bp),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    bdrop AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    disp AS (
      SELECT 'dropped_corpus' AS stage, id AS doc_id, CAST(NULL AS BIGINT) AS n FROM cdup
      UNION ALL SELECT 'dropped_batch', doc_id, NULL FROM bdrop
      UNION ALL SELECT 'admitted', doc_id, NULL FROM clean
        WHERE doc_id NOT IN (SELECT doc_id FROM bdrop)),
    counts AS (
      SELECT 'corpus_pairs' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        CAST(COUNT(*) AS BIGINT) AS n FROM cp
      UNION ALL SELECT 'batch_pairs', NULL, CAST(COUNT(*) AS BIGINT) FROM bp)
    SELECT stage, doc_id, n FROM disp
    UNION ALL SELECT stage, doc_id, n FROM counts
    ORDER BY stage, doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.incrementalDedupRun(
          docs.where(col("doc_id") % 10 === 0),
          docs.where(col("doc_id") % 10 =!= 0),
          "text", "doc_id", n = 3, threshold = 0.3,
          maxPostings = None, maxCorpusPostings = None) // exact: oracle
        .orderBy(col("stage"), col("doc_id").asc_nulls_last)
    })

  // IVF APPEND cell-drift report: the existing index's centroids
  // (k smallest-id vectors of the OLD corpus — the s18/s30 seeding)
  // assign a new batch; per cell old/new counts, growth, and the
  // post-append imbalance — the audit before deciding a re-train.
  private val s34 = Q("s34_ivf_cell_drift", Some("""
    WITH oldv AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
    newv AS (SELECT * FROM embeddings WHERE vec_id % 10 = 0),
    cents AS (SELECT vec_id AS cell, embedding AS cvec FROM oldv ORDER BY vec_id LIMIT 8),
    simso AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM oldv e, cents c),
    ao AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM simso) WHERE rn = 1),
    ho AS (SELECT cell, COUNT(*) AS n_old_raw FROM ao GROUP BY 1),
    simsn AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM newv e, cents c),
    an AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM simsn) WHERE rn = 1),
    hn AS (SELECT cell, COUNT(*) AS n_new_raw FROM an GROUP BY 1),
    j AS (SELECT c.cell, COALESCE(ho.n_old_raw, 0) AS n_old,
        COALESCE(hn.n_new_raw, 0) AS n_new
      FROM cents c LEFT JOIN ho ON ho.cell = c.cell
        LEFT JOIN hn ON hn.cell = c.cell),
    tot AS (SELECT CAST(SUM(n_old + n_new) AS DOUBLE) AS nt,
        CAST(MAX(n_old + n_new) AS DOUBLE) AS mx FROM j)
    SELECT cell, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
      CASE WHEN n_old = 0 THEN NULL
        ELSE CAST(n_new AS DOUBLE) / CAST(n_old AS DOUBLE) END AS growth,
      CAST(n_old AS DOUBLE) / nt AS frac_old,
      CAST(n_new AS DOUBLE) / nt AS frac_new,
      CAST(mx AS DOUBLE) * 8 / nt AS imbalance_after
    FROM j, tot ORDER BY cell"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.cellDriftReport(
          emb.where(col("vec_id") % 10 =!= 0),
          emb.where(col("vec_id") % 10 === 0),
          "embedding", "vec_id", k = 8)
        .orderBy(col("cell"))
    })

  // Post-dedup TOKEN budget per source: how many of each source's
  // tokens survive keep-min-id dedup at tau — the d27 impact numbers
  // re-denominated in the unit budgets are written in (t03 tokens),
  // feeding t49/t10 with post-dedup counts. Oracle replays the d11
  // closure + the per-source accounting.
  private val t55 = Q("t55_dedup_token_budget", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    losers AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    per AS (SELECT source, doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        CASE WHEN doc_id IN (SELECT doc_id FROM losers) THEN 0 ELSE 1 END AS kept
      FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(kept) AS BIGINT) AS n_docs_kept,
      CAST(SUM(ntok) AS BIGINT) AS n_tokens,
      CAST(SUM(kept * ntok) AS BIGINT) AS n_tokens_kept,
      CASE WHEN SUM(ntok) = 0 THEN NULL ELSE
        ROUND(CAST(SUM(kept * ntok) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE), 6) END
        AS token_keep_frac
    FROM per GROUP BY source ORDER BY source"""),
    (s, dir) => Dedup.dedupTokenBudgetReport(T(s, dir, "documents"),
        "text", "doc_id", "source", n = 3, threshold = 0.3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("source")))

  // Audio dup CLUSTERS: m21's pairs closed transitively (the d06 move
  // for the audio family) — cluster representative + size per clip in
  // >=1 qualifying pair, the frame an audio dedup consumes directly.
  private val m22 = Q("m22_audio_dup_clusters", Some("""
    WITH RECURSIVE d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    b AS (SELECT doc_id, n, cs, k FROM d, UNNEST(generate_series(1, 15)) AS g(k)),
    co AS (SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
      FROM b),
    e AS (SELECT sample_id, bin, c * c + s * s AS e FROM co),
    bnd AS (SELECT sample_id,
        CAST(CASE WHEN bin = 1 THEN 1 WHEN bin <= 3 THEN 2
                  WHEN bin <= 7 THEN 3 ELSE 4 END AS BIGINT) AS band, e
      FROM e),
    be AS (SELECT sample_id, band, ROUND(ln(1 + SUM(e)), 6) AS le
      FROM bnd GROUP BY sample_id, band),
    vec AS (SELECT sample_id,
        MAX(CASE WHEN band = 1 THEN le END) AS e1,
        MAX(CASE WHEN band = 2 THEN le END) AS e2,
        MAX(CASE WHEN band = 3 THEN le END) AS e3,
        MAX(CASE WHEN band = 4 THEN le END) AS e4
      FROM be GROUP BY sample_id),
    combos AS (SELECT g AS cid FROM UNNEST(generate_series(0, 15)) t(g)),
    keys AS (SELECT v.sample_id, v.e1, v.e2, v.e3, v.e4, c.cid,
        CAST(floor((e1 + ((cid >> 0) & 1) * 0.125) / 0.25) AS BIGINT) AS k1,
        CAST(floor((e2 + ((cid >> 1) & 1) * 0.125) / 0.25) AS BIGINT) AS k2,
        CAST(floor((e3 + ((cid >> 2) & 1) * 0.125) / 0.25) AS BIGINT) AS k3,
        CAST(floor((e4 + ((cid >> 3) & 1) * 0.125) / 0.25) AS BIGINT) AS k4
      FROM vec v, combos c),
    prs AS (SELECT DISTINCT a.sample_id AS id_a, b.sample_id AS id_b
      FROM keys a JOIN keys b
        ON a.cid = b.cid AND a.k1 = b.k1 AND a.k2 = b.k2
          AND a.k3 = b.k3 AND a.k4 = b.k4 AND a.sample_id < b.sample_id
      WHERE abs(a.e1 - b.e1) <= 0.125 AND abs(a.e2 - b.e2) <= 0.125
        AND abs(a.e3 - b.e3) <= 0.125 AND abs(a.e4 - b.e4) <= 0.125),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u)
    SELECT sample_id, cluster_rep,
      CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
    FROM comp ORDER BY sample_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.audioDupClusters(
          Multimodal.textAsWav(docs, "doc_id", "text"), tau = 0.125)
        .orderBy(col("sample_id"))
    })

  // Post-dedup temperature mixture: the α-sampling weights (t28's
  // math, α=0.5 IEEE-sqrt-exact) computed over the DEDUPED corpus —
  // raw source counts overweight duplicate-heavy sources, so the
  // mixture a run deploys reads post-dedup counts (pairs with t55's
  // token budget). Pure composition: d11's closure feeds t28's
  // weights; the oracle replays both.
  private val t56 = Q("t56_dedup_temperature_mix", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    kept AS (SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> rep)),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM kept GROUP BY source),
    t AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS p FROM s)
    SELECT source, n_docs,
      ROUND(CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE)) OVER (), 6)
        AS natural_frac,
      ROUND(p / SUM(p) OVER (), 6) AS temp_weight
    FROM t ORDER BY source"""),
    (s, dir) => graft.pipeline.Sampling.temperatureWeights(
        Dedup.dedupedCorpus(T(s, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.3, maxPostings = None), // exact: oracle
        "source", alpha = 0.5)
      .orderBy(col("source")))

  // Image dup CLUSTERS: m11's banded phash pairs closed transitively
  // (the d06 move for the image family, m22's sibling) — cluster
  // representative + size per image in >=1 qualifying pair. Same
  // perturbed-union corpus as m11 so real near-dup clusters exist.
  private val m23 = Q("m23_phash_dup_clusters", Some("""
    WITH RECURSIVE base AS (SELECT doc_id, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id + 100000, text || 'x' FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs
      FROM un),
    g AS (SELECT doc_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY doc_id),
    ah AS (SELECT v.doc_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m USING (doc_id) GROUP BY v.doc_id),
    prs AS (SELECT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM ah a JOIN ah b ON a.doc_id < b.doc_id)
      WHERE hamming <= 3),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u)
    SELECT sample_id, cluster_rep,
      CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
    FROM comp ORDER BY sample_id"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text"))
      val perturbed = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit("x")).as("text"))
      val hashes = Multimodal.perceptualHash(
        Multimodal.textAsBmp(base.unionByName(perturbed), "doc_id", "text", width = 10))
      Multimodal.phashDupClusters(hashes.toDF(), maxHamming = 3)
        .orderBy(col("sample_id"))
    })

  // The COMPOSED audio curation run — the m-family's d34, the
  // operator a multimodal training-data pipeline schedules nightly:
  // m16's decode-stage quality gates (silence ratio, dynamic range)
  // drop unusable clips, m21/m22's fingerprint pair pass + closure
  // cluster the survivors, min-id representatives are kept, and the
  // result carries the curated clip list (with source) + per-stage
  // audit counts + the per-source kept rollup. The oracle replays
  // every stage (gate scalars, energies, banding, verify, recursive
  // closure, rollups) so a wrong count in any leg, a mis-gated clip,
  // or a mis-kept representative breaks the hash.
  private val m24 = Q("m24_audio_curation_run", Some("""
    WITH RECURSIVE d AS (SELECT doc_id, source,
        octet_length(CAST(text AS BLOB)) AS n,
        string_split(text, '') AS cs
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    q AS (SELECT doc_id,
        CAST(len(list_filter(cs, c -> ord(c) <= 32)) AS DOUBLE) / n AS silence_ratio,
        (list_max(list_transform(cs, c -> ord(c))) -
         list_min(list_transform(cs, c -> ord(c)))) * 128 AS dyn_range
      FROM d),
    pass AS (SELECT doc_id FROM q WHERE silence_ratio <= 0.19 AND dyn_range >= 3000),
    dp AS (SELECT d.doc_id, d.n, d.cs FROM d JOIN pass ON pass.doc_id = d.doc_id),
    b AS (SELECT doc_id, n, cs, k FROM dp, UNNEST(generate_series(1, 15)) AS g(k)),
    co AS (SELECT doc_id AS sample_id, CAST(k AS BIGINT) AS bin,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * cos(2 * pi() * k * i / n))), 6) + 0.0 AS c,
      ROUND(list_sum(list_transform(generate_series(0, n - 1), i ->
        CAST(ord(cs[CAST(i + 1 AS BIGINT)]) * 128 AS DOUBLE) * sin(2 * pi() * k * i / n))), 6) + 0.0 AS s
      FROM b),
    e AS (SELECT sample_id, bin, c * c + s * s AS e FROM co),
    bnd AS (SELECT sample_id,
        CAST(CASE WHEN bin = 1 THEN 1 WHEN bin <= 3 THEN 2
                  WHEN bin <= 7 THEN 3 ELSE 4 END AS BIGINT) AS band, e
      FROM e),
    be AS (SELECT sample_id, band, ROUND(ln(1 + SUM(e)), 6) AS le
      FROM bnd GROUP BY sample_id, band),
    vec AS (SELECT sample_id,
        MAX(CASE WHEN band = 1 THEN le END) AS e1,
        MAX(CASE WHEN band = 2 THEN le END) AS e2,
        MAX(CASE WHEN band = 3 THEN le END) AS e3,
        MAX(CASE WHEN band = 4 THEN le END) AS e4
      FROM be GROUP BY sample_id),
    combos AS (SELECT g AS cid FROM UNNEST(generate_series(0, 15)) t(g)),
    keys AS (SELECT v.sample_id, v.e1, v.e2, v.e3, v.e4, c.cid,
        CAST(floor((e1 + ((cid >> 0) & 1) * 0.125) / 0.25) AS BIGINT) AS k1,
        CAST(floor((e2 + ((cid >> 1) & 1) * 0.125) / 0.25) AS BIGINT) AS k2,
        CAST(floor((e3 + ((cid >> 2) & 1) * 0.125) / 0.25) AS BIGINT) AS k3,
        CAST(floor((e4 + ((cid >> 3) & 1) * 0.125) / 0.25) AS BIGINT) AS k4
      FROM vec v, combos c),
    prs AS (SELECT DISTINCT a.sample_id AS id_a, b.sample_id AS id_b
      FROM keys a JOIN keys b
        ON a.cid = b.cid AND a.k1 = b.k1 AND a.k2 = b.k2
          AND a.k3 = b.k3 AND a.k4 = b.k4 AND a.sample_id < b.sample_id
      WHERE abs(a.e1 - b.e1) <= 0.125 AND abs(a.e2 - b.e2) <= 0.125
        AND abs(a.e3 - b.e3) <= 0.125 AND abs(a.e4 - b.e4) <= 0.125),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u),
    dropped AS (SELECT sample_id FROM comp WHERE sample_id <> cluster_rep),
    keptids AS (SELECT doc_id FROM pass WHERE doc_id NOT IN (SELECT sample_id FROM dropped)),
    kept AS (SELECT 'kept' AS stage, k.doc_id AS sample_id, d.source,
        CAST(NULL AS BIGINT) AS n
      FROM keptids k JOIN d ON d.doc_id = k.doc_id),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM d
      UNION ALL SELECT 'quality_fail', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(*) FROM d) - (SELECT COUNT(*) FROM pass) AS BIGINT)
      UNION ALL SELECT 'pairs', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM prs
      UNION ALL SELECT 'clusters', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(DISTINCT cluster_rep) AS BIGINT) FROM comp
      UNION ALL SELECT 'dup_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM dropped),
    bysrc AS (SELECT 'kept_source' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        d.source, CAST(COUNT(*) AS BIGINT) AS n
      FROM keptids k JOIN d ON d.doc_id = k.doc_id GROUP BY d.source)
    SELECT stage, sample_id, source, n FROM kept
    UNION ALL SELECT stage, sample_id, source, n FROM counts
    UNION ALL SELECT stage, sample_id, source, n FROM bysrc
    ORDER BY stage, sample_id, source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      Multimodal.audioCurationRun(
          Multimodal.textAsWav(docs, "doc_id", "text"),
          docs.select(col("doc_id").as("sample_id"), col("source")),
          tau = 0.125, maxSilenceRatio = 0.19, minDynRange = 3000L)
        .orderBy(col("stage"), col("sample_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // The COMPOSED image curation run — m24's image sibling, closing
  // the m-family's composed-run pair: perceptual quality gates
  // (contrast n_set, brightness sample_mean — both replayed from the
  // ground-truth text by the oracle) drop unusable images, m11/m23's
  // banded pair pass + closure cluster the survivors, min-id reps
  // kept, per-stage counts + per-source rollup ride one result. Same
  // perturbed-union corpus as m11/m23 so real near-dup clusters
  // exist; ONE decode pass feeds gate and pairs (the gate is a plain
  // filter on the scalar hash frame — no id join at all).
  private val m25 = Q("m25_image_curation_run", Some("""
    WITH RECURSIVE base AS (SELECT doc_id, text, source FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id + 100000, text || 'x' FROM base),
    src AS (SELECT doc_id, source FROM base
            UNION ALL SELECT doc_id + 100000, source FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS h,
        string_split(text, '') AS cs
      FROM un),
    g AS (SELECT doc_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY doc_id),
    ah AS (SELECT v.doc_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo,
        CAST(SUM(CASE WHEN v.val > m.mean THEN 1 ELSE 0 END) AS BIGINT) AS n_set,
        ANY_VALUE(m.mean) AS mean
      FROM v JOIN m USING (doc_id) GROUP BY v.doc_id),
    pass AS (SELECT doc_id, hi, lo FROM ah WHERE n_set >= 16 AND mean >= 90.0),
    prs AS (SELECT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM pass a JOIN pass b ON a.doc_id < b.doc_id)
      WHERE hamming <= 3),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS cluster_rep FROM reach GROUP BY u),
    dropped AS (SELECT sample_id FROM comp WHERE sample_id <> cluster_rep),
    keptids AS (SELECT doc_id FROM pass WHERE doc_id NOT IN (SELECT sample_id FROM dropped)),
    kept AS (SELECT 'kept' AS stage, k.doc_id AS sample_id, s.source,
        CAST(NULL AS BIGINT) AS n
      FROM keptids k JOIN src s ON s.doc_id = k.doc_id),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM ah
      UNION ALL SELECT 'quality_fail', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(*) FROM ah) - (SELECT COUNT(*) FROM pass) AS BIGINT)
      UNION ALL SELECT 'pairs', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM prs
      UNION ALL SELECT 'clusters', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(DISTINCT cluster_rep) AS BIGINT) FROM comp
      UNION ALL SELECT 'dup_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM dropped),
    bysrc AS (SELECT 'kept_source' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        s.source, CAST(COUNT(*) AS BIGINT) AS n
      FROM keptids k JOIN src s ON s.doc_id = k.doc_id GROUP BY s.source)
    SELECT stage, sample_id, source, n FROM kept
    UNION ALL SELECT stage, sample_id, source, n FROM counts
    UNION ALL SELECT stage, sample_id, source, n FROM bysrc
    ORDER BY stage, sample_id, source"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val un = base.select(col("doc_id"), col("text")).unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit("x")).as("text")))
      val meta = base.select(col("doc_id").as("sample_id"), col("source"))
        .unionByName(base.select((col("doc_id") + 100000).as("sample_id"),
          col("source")))
      Multimodal.imageCurationRun(
          Multimodal.textAsBmp(un, "doc_id", "text", width = 10), meta,
          maxHamming = 3, minSetBits = 16L, minMean = 90.0)
        .orderBy(col("stage"), col("sample_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // Dup-rate by quality decile: the curation cross-tab read before
  // choosing between quality filtering and dedup (spam is both
  // low-quality and heavily duplicated — if the bottom decile carries
  // most dup mass a quality gate gets the dedup nearly free). t02's
  // quality heuristic bucketed by NTILE (the t43 exact-cut contract),
  // d11's keep-min-id drops counted per bucket, DECIMAL-exact means.
  // The oracle replays score, closure, buckets, and accounting.
  private val t57 = Q("t57_quality_dedup_report", Some("""
    WITH RECURSIVE q AS (SELECT doc_id,
        ROUND(
          0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS q
      FROM documents),
    toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    losers AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    b AS (SELECT q.doc_id, q.q,
        NTILE(10) OVER (ORDER BY q.q, q.doc_id) AS bin,
        CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dropped
      FROM q LEFT JOIN losers l ON l.doc_id = q.doc_id)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(dropped) AS BIGINT) AS n_dropped,
      CAST(SUM(dropped) AS DOUBLE) / COUNT(*) AS drop_frac,
      CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_quality
    FROM b GROUP BY bin ORDER BY bin"""),
    (s, dir) => Dedup.qualityDedupReport(T(s, dir, "documents"),
        "text", "doc_id", bins = 10, n = 3, threshold = 0.3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("bin")))

  // IVF REBUILD decision: s34's drift audit turned into the one-row
  // verdict an index-maintenance job acts on — re-train when the
  // post-append imbalance breaks the cost model or the appended mass
  // outgrows the trained centroids. The %3 split appends a third of
  // the corpus, so the declared run exercises the rebuild=1 branch.
  private val s35 = Q("s35_ivf_rebuild_decision", Some("""
    WITH oldv AS (SELECT * FROM embeddings WHERE vec_id % 3 <> 0),
    newv AS (SELECT * FROM embeddings WHERE vec_id % 3 = 0),
    cents AS (SELECT vec_id AS cell, embedding AS cvec FROM oldv ORDER BY vec_id LIMIT 8),
    simso AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM oldv e, cents c),
    ao AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM simso) WHERE rn = 1),
    ho AS (SELECT cell, COUNT(*) AS n_old_raw FROM ao GROUP BY 1),
    simsn AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM newv e, cents c),
    an AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM simsn) WHERE rn = 1),
    hn AS (SELECT cell, COUNT(*) AS n_new_raw FROM an GROUP BY 1),
    j AS (SELECT c.cell, COALESCE(ho.n_old_raw, 0) AS n_old,
        COALESCE(hn.n_new_raw, 0) AS n_new
      FROM cents c LEFT JOIN ho ON ho.cell = c.cell
        LEFT JOIN hn ON hn.cell = c.cell),
    tot AS (SELECT CAST(SUM(n_old + n_new) AS BIGINT) AS n_total,
        CAST(SUM(n_new) AS BIGINT) AS nn,
        CAST(MAX(n_old + n_new) AS DOUBLE) * 8 / CAST(SUM(n_old + n_new) AS DOUBLE) AS imbalance_after,
        MAX(CASE WHEN n_old = 0 THEN NULL
          ELSE CAST(n_new AS DOUBLE) / CAST(n_old AS DOUBLE) END) AS max_growth,
        CAST(SUM(CASE WHEN n_old = 0 AND n_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseeded_cells
      FROM j)
    SELECT n_total,
      CAST(nn AS DOUBLE) / CAST(n_total AS DOUBLE) AS new_frac,
      imbalance_after, max_growth, n_unseeded_cells,
      CAST(CASE WHEN imbalance_after > 1.5
        OR CAST(nn AS DOUBLE) / CAST(n_total AS DOUBLE) > 0.3
        THEN 1 ELSE 0 END AS BIGINT) AS rebuild
    FROM tot"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.rebuildDecision(
        emb.where(col("vec_id") % 3 =!= 0),
        emb.where(col("vec_id") % 3 === 0),
        "embedding", "vec_id", k = 8,
        maxImbalance = 1.5, maxNewFrac = 0.3)
    })

  // The COMPOSED corpus release run — the text family's d34/m24, the
  // nightly job that turns a crawl into a releasable corpus with its
  // manifest: near-dup dedup (d11) -> benchmark decontamination (t13)
  // -> quality gate (t02), drop counts attributed in that order (they
  // sum exactly to the input), kept docs with source + the per-source
  // rollup. The oracle replays every stage: the recursive closure,
  // the shared-shingle hit rule, and the quality formula.
  private val t58 = Q("t58_corpus_release_run", Some("""
    WITH RECURSIVE train AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
    toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    tsh AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tsh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM tsh a JOIN tsh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    dups AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    bshingle AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    hits AS (SELECT s.doc_id, COUNT(*) AS n_hits
             FROM tsh s JOIN bshingle USING (shingle) GROUP BY 1),
    contam AS (SELECT doc_id FROM hits WHERE n_hits >= 2),
    flags AS (SELECT t.doc_id, t.source,
        ROUND(
          0.5 * LEAST(CAST(len(string_split(t.text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(t.text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(t.text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(t.text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS q,
        t.doc_id IN (SELECT doc_id FROM dups) AS dup,
        t.doc_id IN (SELECT doc_id FROM contam) AS contam
      FROM train t),
    kept AS (SELECT 'kept' AS stage, doc_id, source, CAST(NULL AS BIGINT) AS n
      FROM flags WHERE NOT dup AND NOT contam AND q >= 0.4),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM flags
      UNION ALL SELECT 'dedup_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      UNION ALL SELECT 'contam_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN NOT dup AND contam THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      UNION ALL SELECT 'quality_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN NOT dup AND NOT contam AND q < 0.4 THEN 1 ELSE 0 END) AS BIGINT) FROM flags),
    bysrc AS (SELECT 'kept_source' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        source, CAST(COUNT(*) AS BIGINT) AS n
      FROM flags WHERE NOT dup AND NOT contam AND q >= 0.4 GROUP BY source)
    SELECT stage, doc_id, source, n FROM kept
    UNION ALL SELECT stage, doc_id, source, n FROM counts
    UNION ALL SELECT stage, doc_id, source, n FROM bysrc
    ORDER BY stage, doc_id, source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.CorpusRelease.corpusReleaseRun(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.3, minHits = 2L,
          minQuality = 0.4, maxPostings = None) // exact: oracle
        .orderBy(col("stage"), col("doc_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // Cluster FIDELITY audit: per dup cluster, how tight the evidence
  // that formed it is — pair count vs possible pairs (density) and the
  // min/max/DECIMAL-mean Jaccard of the qualifying pairs. The read
  // before trusting transitive closure at a τ: chains of barely-τ
  // pairs over-merge, and this is where that shows. Oracle replays
  // pairs (with their Jaccards), the recursive closure, and both
  // rollups.
  private val d36 = Q("d36_cluster_fidelity", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairsj AS (
      SELECT id_a, id_b, ROUND(jaccard, 6) AS j FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairsj UNION SELECT id_b, id_a FROM pairsj),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    csize AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY rep),
    pc AS (SELECT c.rep, p.j FROM pairsj p JOIN comp c ON c.doc_id = p.id_a),
    pagg AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        MIN(j) AS min_jaccard, MAX(j) AS max_jaccard,
        CAST(SUM(CAST(j AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_jaccard
      FROM pc GROUP BY rep)
    SELECT s.rep AS cluster_rep, s.cluster_size, p.n_pairs,
      p.min_jaccard, p.max_jaccard, p.mean_jaccard,
      CAST(s.cluster_size * (s.cluster_size - 1) / 2 AS BIGINT) AS n_possible,
      CAST(p.n_pairs AS DOUBLE) / CAST(s.cluster_size * (s.cluster_size - 1) / 2 AS DOUBLE) AS density
    FROM csize s JOIN pagg p ON p.rep = s.rep
    ORDER BY cluster_rep"""),
    (s, dir) => Dedup.clusterFidelityReport(T(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("cluster_rep")))

  // Contamination ATTRIBUTION: for every flagged training doc (t13's
  // >=2-shared-shingle rule), WHICH benchmark doc it shares the most
  // shingles with (ties to the smallest bench id) — the forensics
  // step deciding "fix the crawler or retire the benchmark". Oracle
  // replays hits, per-pair shares, and the argmax.
  private val t59 = Q("t59_contamination_attribution", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    tsh AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    bsh AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
    hits AS (SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
             FROM tsh t JOIN (SELECT DISTINCT shingle FROM bsh) b USING (shingle)
             GROUP BY 1),
    pairshare AS (SELECT t.doc_id, b.doc_id AS bench_doc_id, COUNT(*) AS n_shared
                  FROM tsh t JOIN bsh b USING (shingle)
                  GROUP BY 1, 2),
    attributed AS (SELECT doc_id, bench_doc_id, n_shared FROM (
        SELECT doc_id, bench_doc_id, n_shared,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY n_shared DESC, bench_doc_id) AS rn
        FROM pairshare) WHERE rn = 1)
    SELECT a.doc_id, CAST(a.bench_doc_id AS BIGINT) AS bench_doc_id,
      CAST(a.n_shared AS BIGINT) AS n_shared_top,
      CAST(h.n_hits AS BIGINT) AS n_hits_total
    FROM attributed a JOIN hits h USING (doc_id)
    WHERE h.n_hits >= 2
    ORDER BY a.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.contaminationAttribution(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3, minHits = 2L)
        .select(col("id").as("doc_id"), col("bench_id").as("bench_doc_id"),
          col("n_shared_top"), col("n_hits_total"))
        .orderBy(col("doc_id"))
    })

  // Split LEAKAGE audit: per source, how many VAL docs have a
  // near-dup in TRAIN — the eval-hygiene check on any split not built
  // leakage-safe (random/hash splits cut straight through near-dup
  // clusters, the failure t40 prevents); nonzero leak_frac means val
  // scores are partly memorization. Oracle replays the cross-split
  // pair pass and the per-source rollup.
  private val t60 = Q("t60_split_leakage_audit", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    vsh AS (SELECT * FROM sh WHERE doc_id % 7 = 0),
    tsh AS (SELECT * FROM sh WHERE doc_id % 7 <> 0),
    vsz AS (SELECT doc_id, COUNT(*) AS n_v FROM vsh GROUP BY 1),
    tsz AS (SELECT doc_id, COUNT(*) AS n_t FROM tsh GROUP BY 1),
    inter AS (SELECT v.doc_id AS vid, t.doc_id AS tid, COUNT(*) AS n_inter
              FROM vsh v JOIN tsh t USING (shingle) GROUP BY 1, 2),
    leaked AS (SELECT DISTINCT vid AS doc_id FROM inter
      JOIN vsz ON vsz.doc_id = vid
      JOIN tsz ON tsz.doc_id = tid
      WHERE CAST(n_inter AS DOUBLE) / CAST(n_v + n_t - n_inter AS DOUBLE) >= 0.3)
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_val,
      CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
      CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS leak_frac
    FROM documents d LEFT JOIN leaked l ON l.doc_id = d.doc_id
    WHERE d.doc_id % 7 = 0
    GROUP BY d.source ORDER BY d.source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.splitLeakageBySource(
          docs.where(col("doc_id") % 7 =!= 0),
          docs.where(col("doc_id") % 7 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.3,
          maxCorpusPostings = None) // exact: oracle
        .orderBy(col("source"))
    })

  // Cross-video COPY detection by frame-hash containment — the d07
  // containment move at frame granularity over m12's decoded frame
  // hashes: clipped/extended copies keep high containment where
  // Jaccard dilutes. Same perturbed-union corpus as m11/m23/m25 so
  // real video copies exist (the appended byte changes only the last
  // frame). The boilerplate cap is COUNT-based and deterministic, so
  // the declared query runs the CAPPED scale path and the oracle
  // replays the cap itself (HAVING COUNT(*) <= 100) — the one capped
  // path in the suite that is hash-proven rather than subset-pinned;
  // uncapped, the boilerplate-class hashes fan the self-join out to
  // 186M rows at sf0.1 (measured 48.6 s — the suite's slowest row by
  // 16x — against ~1 s capped). Oracle rebuilds every frame hash from
  // the text byte map and replays cap, participation, and join.
  private val m26 = Q("m26_video_dup_pairs", Some("""
    WITH base AS (SELECT doc_id, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id + 100000, text || 'x' FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM un),
    fr AS (SELECT doc_id, nb, cs, f
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f)),
    g AS (SELECT doc_id, f, nb, cs, r * 8 + c AS i,
        f * 10 + ((r * 2) // 8) * 5 + (c * 5) // 8 AS idx
      FROM fr, UNNEST(generate_series(0, 7)) AS gr(r),
              UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, f, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, f, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean
          FROM v GROUP BY doc_id, f),
    ah AS (SELECT v.doc_id, v.f,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m ON v.doc_id = m.doc_id AND v.f = m.f
      GROUP BY v.doc_id, v.f),
    fh AS (SELECT DISTINCT doc_id, hi, lo FROM ah),
    keep AS (SELECT hi, lo FROM fh GROUP BY hi, lo HAVING COUNT(*) <= 100),
    fhk AS (SELECT fh.* FROM fh JOIN keep USING (hi, lo)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fhk GROUP BY 1 HAVING COUNT(*) >= 3),
    shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fhk a JOIN fhk b ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared,
      CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.nf, sb.nf) AS DOUBLE) AS containment
    FROM shared
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.nf, sb.nf) AS DOUBLE) >= 0.8
    ORDER BY id_a, id_b"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val un = base.select(col("doc_id"), col("text")).unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit("x")).as("text")))
      Multimodal.videoDupPairs(
          Multimodal.framePerceptualHash(
            Multimodal.textAsAvi(un, "doc_id", "text")).toDF(),
          minContainment = 0.8, minFrames = 3,
          maxPostings = Some(100)) // the oracle replays this cap
        .orderBy(col("id_a"), col("id_b"))
    })

  // WATER-FILLING token-budget allocation across the t28 tiers: the
  // step between "what mixture do we want" (t28's temperature
  // weights) and "which docs fill a source's share" (t49's budget
  // select) — allocate B tokens ∝ n_docs^0.5, except no source can
  // give more tokens than it has; the surplus of saturated sources
  // redistributes among the rest. Sort-based closed form: by supply
  // per weight ascending, the saturated set is the prefix before the
  // first failing cross-multiplied flag (the water level R/W is
  // non-decreasing while flags hold). B = 15000 saturates the rare
  // tier at the correctness SF, so both branches execute under the
  // oracle. The oracle replays the prefix math window for window.
  private val t61 = Q("t61_budget_allocation", Some("""
    WITH tiers AS (SELECT CASE
          WHEN CAST(substr(source, 4) AS INT) < 1 THEN 'rare'
          WHEN CAST(substr(source, 4) AS INT) < 5 THEN 'mid'
          ELSE 'common' END AS source, text
        FROM documents),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        FROM tiers GROUP BY source),
    w AS (SELECT *, sqrt(CAST(n_docs AS DOUBLE)) AS w,
          CAST(avail_tokens AS DOUBLE) / sqrt(CAST(n_docs AS DOUBLE)) AS ratio
        FROM s),
    p AS (SELECT *,
        COALESCE(SUM(CAST(avail_tokens AS DOUBLE)) OVER (ORDER BY ratio, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pa,
        COALESCE(SUM(w) OVER (ORDER BY ratio, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pw,
        SUM(w) OVER () AS tw
      FROM w),
    f AS (SELECT *, CASE WHEN CAST(avail_tokens AS DOUBLE) * (tw - pw)
          <= w * (15000.0 - pa) THEN 1 ELSE 0 END AS flag FROM p),
    c AS (SELECT *, MIN(flag) OVER (ORDER BY ratio, source
        ROWS UNBOUNDED PRECEDING) AS sat FROM f),
    lvl AS (SELECT (15000.0 - COALESCE(SUM(CASE WHEN sat = 1
            THEN CAST(avail_tokens AS DOUBLE) END), 0.0)) /
          (MAX(tw) - COALESCE(SUM(CASE WHEN sat = 1 THEN w END), 0.0)) AS level
        FROM c)
    SELECT source, n_docs, avail_tokens, ROUND(w, 6) AS weight,
      CAST(sat AS BIGINT) AS saturated,
      ROUND(CASE WHEN sat = 1 THEN CAST(avail_tokens AS DOUBLE)
        ELSE w * level END, 6) AS alloc_tokens,
      ROUND(CASE WHEN sat = 1 THEN CAST(avail_tokens AS DOUBLE)
        ELSE w * level END / CAST(avail_tokens AS DOUBLE), 6) AS fill_frac
    FROM c, lvl ORDER BY source"""),
    (s, dir) => {
      val sfx = substring(col("source"), 4, 10).cast("int")
      val tiered = T(s, dir, "documents").withColumn("source",
        when(sfx < 1, "rare").when(sfx < 5, "mid").otherwise("common"))
      graft.pipeline.Sampling.budgetAllocation(tiered, "source", "text",
          budget = 15000L, alpha = 0.5)
        .orderBy(col("source"))
    })

  // Tokenizer FERTILITY by language: chars-per-token per predicted
  // language (t01's langid contract) under the t44-induced merge
  // list — the per-language tokenizer cost a multilingual data
  // budget is written around (a language the BPE compresses poorly
  // burns more budget per byte). t54 keys the same compression by
  // source; languages cut across sources. Oracle = t44 induction +
  // t45 encode + t01 langid + the rollup.
  private val t62 = Q("t62_tokenizer_fertility", Some(tokenizerFertilityOracleSql(8)),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = TextAnalysis.bpeMerges(docs, "text", k = 8)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.tokenizerFertilityByLang(docs, "text", merges)
        .orderBy(col("lang_pred"))
    })

  // KEEP-BEST dedup: d11's corpus with each near-dup cluster
  // collapsed to its highest-QUALITY member (t02's score, ties to the
  // smallest id) instead of the min id unconditionally — what a
  // production dedup actually keeps when a cluster mixes a clean
  // original with boilerplate-injected mirrors. Oracle replays the
  // pair pass, the recursive closure, the quality formula, and the
  // per-cluster argmax.
  private val d37 = Q("d37_dedup_keep_best", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    q AS (SELECT doc_id,
        ROUND(
          0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS q
      FROM documents),
    best AS (SELECT doc_id FROM (
        SELECT c.doc_id,
          ROW_NUMBER() OVER (PARTITION BY c.rep ORDER BY q.q DESC, c.doc_id) AS rn
        FROM comp c JOIN q ON q.doc_id = c.doc_id) WHERE rn = 1),
    csz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY rep)
    SELECT d.doc_id, d.source, q.q AS quality,
      CAST(COALESCE(cs.cluster_size, 1) AS BIGINT) AS cluster_size
    FROM documents d
      JOIN q ON q.doc_id = d.doc_id
      LEFT JOIN comp c ON c.doc_id = d.doc_id
      LEFT JOIN csz cs ON cs.rep = c.rep
    WHERE c.doc_id IS NULL OR d.doc_id IN (SELECT doc_id FROM best)
    ORDER BY d.doc_id"""),
    (s, dir) => Dedup.dedupedCorpusKeepBest(T(s, dir, "documents"),
        "text", "doc_id", "source", n = 3, threshold = 0.3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("doc_id")))

  // One LLOYD refinement step — the re-train s35's rebuild verdict
  // triggers: assign all vectors to the seeded centroids, recompute
  // each cell's centroid as the per-dim DECIMAL-exact mean of its
  // members, report per-cell movement — the convergence signal an
  // index-maintenance job watches across refresh cycles. Oracle
  // replays the s07 assignment, the per-dim means, and the
  // order-independent DECIMAL distance sum.
  private val s36 = Q("s36_centroid_refresh", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    dims AS (SELECT a.cell, i - 1 AS dim, ROUND(CAST(e.embedding[i] AS DOUBLE), 6) AS v
      FROM assigned a JOIN embeddings e USING (vec_id),
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)),
    mu AS (SELECT cell, dim,
        CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m,
        COUNT(*) AS n
      FROM dims GROUP BY 1, 2),
    oldc AS (SELECT cell, i - 1 AS dim, ROUND(CAST(cvec[i] AS DOUBLE), 6) AS o
      FROM cents, UNNEST(generate_series(1, len(cvec))) AS g(i)),
    t AS (SELECT mu.cell, mu.n,
        CAST(ROUND((m - o) * (m - o), 12) AS DECIMAL(28,12)) AS tt
      FROM mu JOIN oldc USING (cell, dim))
    SELECT cell, CAST(MAX(n) AS BIGINT) AS n_members,
      ROUND(sqrt(CAST(SUM(tt) AS DOUBLE)), 6) AS movement
    FROM t GROUP BY cell ORDER BY cell"""),
    (s, dir) => graft.pipeline.Clustering.centroidRefresh(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 8)
      .orderBy(col("cell")))

  // The COMPOSED video curation run — the m24/m25 trilogy's closing
  // member: m26's boilerplate cap indexes distinctive frames, videos
  // with < 3 of them drop as under-indexed (the video-native quality
  // gate), the containment pair pass + transitive closure clusters
  // the survivors, min-id reps kept; the result carries the curated
  // list, the per-stage audit counts, and the per-source rollup.
  // Same perturbed-union corpus as m26 so real video copies exist.
  // The oracle rebuilds every frame hash, replays the cap, the
  // containment join, and the recursive closure.
  private val m27 = Q("m27_video_curation_run", Some("""
    WITH RECURSIVE base AS (SELECT doc_id, source, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, source, text FROM base
           UNION ALL SELECT doc_id + 100000, source, text || 'x' FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM un),
    fr AS (SELECT doc_id, nb, cs, f
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f)),
    g AS (SELECT doc_id, f, nb, cs, r * 8 + c AS i,
        f * 10 + ((r * 2) // 8) * 5 + (c * 5) // 8 AS idx
      FROM fr, UNNEST(generate_series(0, 7)) AS gr(r),
              UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, f, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, f, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean
          FROM v GROUP BY doc_id, f),
    ah AS (SELECT v.doc_id, v.f,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m ON v.doc_id = m.doc_id AND v.f = m.f
      GROUP BY v.doc_id, v.f),
    fh AS (SELECT DISTINCT doc_id, hi, lo FROM ah),
    keep AS (SELECT hi, lo FROM fh GROUP BY hi, lo HAVING COUNT(*) <= 100),
    fhk AS (SELECT fh.* FROM fh JOIN keep USING (hi, lo)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fhk GROUP BY 1 HAVING COUNT(*) >= 3),
    shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fhk a JOIN fhk b ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pv AS (SELECT id_a, id_b FROM shared
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.nf, sb.nf) AS DOUBLE) >= 0.8),
    sym AS (SELECT id_a AS u, id_b AS v FROM pv UNION SELECT id_b, id_a FROM pv),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    compc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    dropped AS (SELECT doc_id FROM compc WHERE doc_id <> rep),
    srcm AS (SELECT DISTINCT doc_id, source FROM un),
    kept AS (SELECT 'kept' AS stage, s.doc_id AS sample_id, u.source,
        CAST(NULL AS BIGINT) AS n
      FROM sz s JOIN srcm u USING (doc_id)
      WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM un
      UNION ALL SELECT 'underindexed_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(*) FROM un) - (SELECT COUNT(*) FROM sz) AS BIGINT)
      UNION ALL SELECT 'pairs', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(*) FROM pv) AS BIGINT)
      UNION ALL SELECT 'clusters', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(DISTINCT rep) FROM compc) AS BIGINT)
      UNION ALL SELECT 'dup_dropped', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST((SELECT COUNT(*) FROM dropped) AS BIGINT)),
    bysrc AS (SELECT 'kept_source' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        source, CAST(COUNT(*) AS BIGINT) AS n
      FROM kept GROUP BY source)
    SELECT stage, sample_id, source, n FROM kept
    UNION ALL SELECT stage, sample_id, source, n FROM counts
    UNION ALL SELECT stage, sample_id, source, n FROM bysrc
    ORDER BY stage, sample_id, source"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val un = base.select(col("doc_id"), col("source"), col("text"))
        .unionByName(base.select((col("doc_id") + 100000).as("doc_id"),
          col("source"), concat(col("text"), lit("x")).as("text")))
      Multimodal.videoCurationRun(
          Multimodal.framePerceptualHash(
            Multimodal.textAsAvi(un, "doc_id", "text")).toDF(),
          un.select(col("doc_id"), col("source")),
          minContainment = 0.8, minFrames = 3,
          maxPostings = Some(100), // the oracle replays this cap
          metaIdCol = "doc_id")
        .orderBy(col("stage"), col("sample_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // REPAIR the split t60 audits: leaked val docs (near-dup in train
  // at τ) move to train — the cheap post-hoc fix that preserves the
  // rest of the assignment where a full leakage-safe re-split would
  // reshuffle everything. Oracle replays t60's cross-split pair pass
  // and the CASE.
  private val t63 = Q("t63_split_leakage_repair", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    vsh AS (SELECT * FROM sh WHERE doc_id % 7 = 0),
    tsh AS (SELECT * FROM sh WHERE doc_id % 7 <> 0),
    vsz AS (SELECT doc_id, COUNT(*) AS n_v FROM vsh GROUP BY 1),
    tsz AS (SELECT doc_id, COUNT(*) AS n_t FROM tsh GROUP BY 1),
    inter AS (SELECT v.doc_id AS vid, t.doc_id AS tid, COUNT(*) AS n_inter
              FROM vsh v JOIN tsh t USING (shingle) GROUP BY 1, 2),
    leaked AS (SELECT DISTINCT vid AS doc_id FROM inter
      JOIN vsz ON vsz.doc_id = vid
      JOIN tsz ON tsz.doc_id = tid
      WHERE CAST(n_inter AS DOUBLE) / CAST(n_v + n_t - n_inter AS DOUBLE) >= 0.3)
    SELECT d.doc_id, d.source,
      CASE WHEN d.doc_id % 7 <> 0 THEN 'train'
           WHEN l.doc_id IS NOT NULL THEN 'train' ELSE 'val' END AS split,
      CAST(CASE WHEN d.doc_id % 7 = 0 AND l.doc_id IS NOT NULL
        THEN 1 ELSE 0 END AS BIGINT) AS moved
    FROM documents d LEFT JOIN leaked l ON l.doc_id = d.doc_id
    ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.repairLeakedSplit(
          docs.where(col("doc_id") % 7 =!= 0),
          docs.where(col("doc_id") % 7 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.3,
          maxCorpusPostings = None) // exact: oracle
        .orderBy(col("doc_id"))
    })

  // PQ distortion per IVF cell: s32's global codebook MSE localized
  // to s07's cell partitioning — "WHERE is the codebook bad", the
  // read that turns a rebuild verdict into a targeted re-train.
  // Oracle replays the s07 assignment, the s32 sub-distances, the
  // ordered per-vector fold, and the DECIMAL per-cell mean.
  private val s37 = Q("s37_pq_cell_distortion", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    best AS (
      SELECT vec_id, j, d FROM (
        SELECT vec_id, j, d,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1),
    pv AS (SELECT vec_id, ROUND(list_sum(list(d ORDER BY j)), 6) AS terr
           FROM best GROUP BY vec_id)
    SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      CAST(SUM(CAST(terr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mse,
      MAX(terr) AS max_err
    FROM pv JOIN assigned a USING (vec_id)
    GROUP BY a.cell ORDER BY cell"""),
    (s, dir) => graft.pipeline.Pq.cellDistortionReport(
        T(s, dir, "embeddings"), "embedding", "vec_id",
        k = 8, m = 8, ksub = 16)
      .orderBy(col("cell")))

  // Copy-SPAN localization for m26's pairs: per qualifying pair, the
  // consecutive runs of id_a's indexed frames whose hash occurs in
  // id_b — WHICH part was copied. Oracle = m26's frame-hash replay +
  // the matched-frame join + one gaps-and-islands window.
  private val m28 = Q("m28_video_copy_spans", Some("""
    WITH base AS (SELECT doc_id, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id + 100000, text || 'x' FROM base),
    d AS (SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS nb,
        (octet_length(CAST(text AS BLOB)) + 9) // 10 AS nf,
        string_split(text, '') AS cs
      FROM un),
    fr AS (SELECT doc_id, nb, cs, f
      FROM d, UNNEST(generate_series(0, nf - 1)) AS gf(f)),
    g AS (SELECT doc_id, f, nb, cs, r * 8 + c AS i,
        f * 10 + ((r * 2) // 8) * 5 + (c * 5) // 8 AS idx
      FROM fr, UNNEST(generate_series(0, 7)) AS gr(r),
              UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT doc_id, f, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT doc_id, f, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean
          FROM v GROUP BY doc_id, f),
    ah AS (SELECT v.doc_id, v.f,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m ON v.doc_id = m.doc_id AND v.f = m.f
      GROUP BY v.doc_id, v.f),
    fh AS (SELECT DISTINCT doc_id, hi, lo FROM ah),
    keep AS (SELECT hi, lo FROM fh GROUP BY hi, lo HAVING COUNT(*) <= 100),
    fhk AS (SELECT fh.* FROM fh JOIN keep USING (hi, lo)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fhk GROUP BY 1 HAVING COUNT(*) >= 3),
    shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fhk a JOIN fhk b ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pv AS (SELECT id_a, id_b FROM shared
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.nf, sb.nf) AS DOUBLE) >= 0.8),
    af AS (SELECT ah.doc_id, ah.f, ah.hi, ah.lo FROM ah JOIN keep USING (hi, lo)),
    mt AS (SELECT p.id_a, p.id_b, a.f
           FROM pv p JOIN af a ON a.doc_id = p.id_a
           JOIN fhk b ON b.doc_id = p.id_b AND b.hi = a.hi AND b.lo = a.lo),
    isl AS (SELECT id_a, id_b, f,
        f - ROW_NUMBER() OVER (PARTITION BY id_a, id_b ORDER BY f) AS grp
      FROM mt)
    SELECT id_a, id_b, CAST(MIN(f) AS BIGINT) AS start_frame,
      CAST(MAX(f) AS BIGINT) AS end_frame, CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM isl GROUP BY id_a, id_b, grp
    ORDER BY id_a, id_b, start_frame"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      val un = base.select(col("doc_id"), col("text")).unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit("x")).as("text")))
      Multimodal.videoCopySpans(
          Multimodal.framePerceptualHash(
            Multimodal.textAsAvi(un, "doc_id", "text")).toDF(),
          minContainment = 0.8, minFrames = 3,
          maxPostings = Some(100)) // the oracle replays this cap
        .orderBy(col("id_a"), col("id_b"), col("start_frame"))
    })

  // IDF-WEIGHTED Jaccard pairs: d02 with each shingle weighted by
  // round-6 ln(N/df) — shared boilerplate (high df) contributes ~0 to
  // either side of the ratio, so only rare-shingle overlap pairs
  // docs. Weighted min-hash approximates this measure; the inverted
  // index computes it exactly. Oracle replays weights and both
  // DECIMAL sums.
  private val d38 = Q("d38_weighted_jaccard", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM sh),
    dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    w AS (SELECT shingle,
        CAST(ROUND(ln(nn.n / CAST(df AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
      FROM dfq, nn),
    sws AS (SELECT doc_id, SUM(w) AS sw
            FROM sh JOIN w USING (shingle) GROUP BY 1),
    iw AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(w.w) AS swi
      FROM sh a JOIN sh b USING (shingle) JOIN w USING (shingle)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
      ROUND(CAST(swi AS DOUBLE) / CAST(sa.sw + sb.sw - swi AS DOUBLE), 6) AS w_jaccard
    FROM iw JOIN sws sa ON sa.doc_id = id_a JOIN sws sb ON sb.doc_id = id_b
    WHERE CAST(swi AS DOUBLE) / CAST(sa.sw + sb.sw - swi AS DOUBLE) >= 0.3
    ORDER BY id_a, id_b"""),
    (s, dir) => Dedup.weightedJaccardPairs(T(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_a"), col("id_b")))

  // Residual-vs-raw PQ distortion: the measurement behind IVF-PQ's
  // residual layout — on clustered data r = v − centroid fits the
  // same codebook budget with lower error; res_mse AT OR ABOVE
  // raw_mse (as on these structureless synthetic embeddings) is the
  // signal the residual layout won't pay. Oracle replays assignment,
  // both codebooks, both argmins, and the DECIMAL means.
  private val s38 = Q("s38_residual_pq_distortion", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    assigned AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    best AS (
      SELECT vec_id, j, d FROM (
        SELECT vec_id, j, d,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1),
    resv AS (SELECT e.vec_id,
        list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) AS r
      FROM embeddings e JOIN assigned a USING (vec_id)
        JOIN cents c ON c.cell = a.cell),
    rseeds AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, r AS v
      FROM (SELECT vec_id, r FROM resv ORDER BY vec_id LIMIT 16)),
    rcb AS (SELECT js.j, rseeds.code,
        list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM rseeds, js),
    rdists AS (SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (e.r[c.j*8+i] - c.cent[i]) * (e.r[c.j*8+i] - c.cent[i]))) AS d
      FROM resv e CROSS JOIN rcb c),
    rbest AS (SELECT vec_id, j, d FROM (
        SELECT vec_id, j, d,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM rdists) WHERE rn = 1),
    pj AS (SELECT b.vec_id, b.j, ROUND(b.d, 6) AS rawe, ROUND(rb.d, 6) AS rese
      FROM best b JOIN rbest rb ON rb.vec_id = b.vec_id AND rb.j = b.j)
    SELECT CAST(j AS BIGINT) AS j, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      CAST(SUM(CAST(rawe AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS raw_mse,
      CAST(SUM(CAST(rese AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS res_mse
    FROM pj GROUP BY j ORDER BY j"""),
    (s, dir) => graft.pipeline.Pq.residualDistortionReport(
        T(s, dir, "embeddings"), "embedding", "vec_id",
        k = 8, m = 8, ksub = 16)
      .orderBy(col("j")))

  // The DROP-OVERLAP matrix: t58 attributes drops in production
  // order, which HIDES how much the three filters overlap — this is
  // the ordering-invariant 2×2×2 contingency (dup × contam × lowq)
  // with per-cell mean quality, the data that settles filter-ordering
  // debates. Oracle replays the t58 flag frame and groups it.
  private val t64 = Q("t64_drop_overlap_matrix", Some("""
    WITH RECURSIVE train AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
    toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    tsh AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tsh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM tsh a JOIN tsh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    dups AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    bshingle AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    hits AS (SELECT s.doc_id, COUNT(*) AS n_hits
             FROM tsh s JOIN bshingle USING (shingle) GROUP BY 1),
    contam AS (SELECT doc_id FROM hits WHERE n_hits >= 2),
    flags AS (SELECT t.doc_id,
        ROUND(
          0.5 * LEAST(CAST(len(string_split(t.text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(t.text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(t.text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(t.text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS q,
        CASE WHEN t.doc_id IN (SELECT doc_id FROM dups) THEN 1 ELSE 0 END AS dup,
        CASE WHEN t.doc_id IN (SELECT doc_id FROM contam) THEN 1 ELSE 0 END AS contam
      FROM train t),
    agg AS (SELECT dup, contam,
        CASE WHEN q < 0.4 THEN 1 ELSE 0 END AS lowq,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_quality
      FROM flags GROUP BY 1, 2, 3),
    cells AS (SELECT d.c AS dup, c.c AS contam, q.c AS lowq
      FROM (VALUES (0), (1)) d(c), (VALUES (0), (1)) c(c), (VALUES (0), (1)) q(c))
    SELECT CAST(cells.dup AS BIGINT) AS dup,
      CAST(cells.contam AS BIGINT) AS contam,
      CAST(cells.lowq AS BIGINT) AS lowq,
      COALESCE(a.n_docs, 0) AS n_docs, a.mean_quality
    FROM cells LEFT JOIN agg a
      ON a.dup = cells.dup AND a.contam = cells.contam AND a.lowq = cells.lowq
    ORDER BY dup, contam, lowq"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.CorpusRelease.dropOverlapMatrix(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.3, minHits = 2L,
          minQuality = 0.4, maxPostings = None) // exact: oracle
        .orderBy(col("dup"), col("contam"), col("lowq"))
    })

  // PAIR EVIDENCE: for each d02 pair, the 3 rarest shared shingles
  // (df ascending, ties by text) — what a reviewer reads before
  // trusting a dedup drop; rare shared content vs boilerplate glue.
  // Oracle replays pairs, the df rollup, and the per-pair top-k.
  private val d39 = Q("d39_pair_evidence", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    shared AS (SELECT p.id_a, p.id_b, s.shingle, d.df
      FROM pairs p
      JOIN sh s ON s.doc_id = p.id_a
      JOIN sh s2 ON s2.doc_id = p.id_b AND s2.shingle = s.shingle
      JOIN dfq d ON d.shingle = s.shingle),
    rk AS (SELECT id_a, id_b, shingle, df,
        ROW_NUMBER() OVER (PARTITION BY id_a, id_b ORDER BY df, shingle) AS rn
      FROM shared)
    SELECT id_a, id_b, CAST(rn AS BIGINT) AS rank, shingle,
      CAST(df AS BIGINT) AS df
    FROM rk WHERE rn <= 3
    ORDER BY id_a, id_b, rank"""),
    (s, dir) => Dedup.pairEvidence(T(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.3, k = 3,
        maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_a"), col("id_b"), col("rank")))

  // Bit-width DECISION: s33's sweep turned into the one-row verdict a
  // quantized-index build acts on — the smallest width whose MSE
  // meets the target (storage minimized, error the constraint),
  // largest-candidate fallback flagged unmet. Oracle replays the
  // sweep and the sort-limit selection.
  private val s39 = Q("s39_sq_bits_decision", Some("""
    WITH ls AS (SELECT * FROM (VALUES (2, 3.0), (4, 15.0), (6, 63.0), (8, 255.0))
        AS t(bits, lev)),
    per AS (SELECT l.bits, l.lev,
        list_sum(list_transform(e.embedding, x ->
          (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))
          * (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))))
          AS sq_sum,
        list_max(list_transform(e.embedding, x ->
          ABS(CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))))
          AS mx,
        CAST(len(e.embedding) AS BIGINT) AS n
      FROM embeddings e CROSS JOIN ls l),
    agg AS (SELECT CAST(bits AS BIGINT) AS bits, CAST(SUM(n) AS BIGINT) AS n_values,
        ROUND(SUM(sq_sum) / CAST(SUM(n) AS DOUBLE), 6) AS mse,
        MAX(mx) AS max_abs_err
      FROM per GROUP BY bits),
    d AS (SELECT *, CAST(CASE WHEN mse <= 0.001 THEN 1 ELSE 0 END AS BIGINT) AS met
      FROM agg)
    SELECT bits, n_values, mse, max_abs_err,
      CAST(0.001 AS DOUBLE) AS target_mse, met
    FROM d
    ORDER BY met DESC, CASE WHEN met = 1 THEN bits ELSE -bits END
    LIMIT 1"""),
    (s, dir) => graft.pipeline.Quantize.bitsDecision(
        T(s, dir, "embeddings"), "embedding", lo = -2.0, hi = 2.0,
        targetMse = 0.001, bitsList = Seq(2, 4, 6, 8)))

  // INCREMENTAL release run: t58's daily-ingest sibling (the d35 move
  // for the full release pipeline) — admit a batch against a standing
  // released corpus: corpus near-dups drop first (the corpus already
  // shipped), the remainder dedups within the batch, then benchmark
  // decontamination and the quality gate; drop counts attributed in
  // that order sum exactly to the batch. Oracle replays every stage
  // including the remainder-restricted closure.
  private val t65 = Q("t65_incremental_release_run", Some("""
    WITH RECURSIVE toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    nsh AS (SELECT * FROM sh WHERE doc_id % 7 = 0 AND doc_id % 50 <> 0),
    csh AS (SELECT * FROM sh WHERE doc_id % 7 <> 0 AND doc_id % 50 <> 0),
    bshingle AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    nsz AS (SELECT doc_id, COUNT(*) AS n_n FROM nsh GROUP BY 1),
    csz AS (SELECT doc_id, COUNT(*) AS n_c FROM csh GROUP BY 1),
    xinter AS (SELECT n.doc_id AS nid, c.doc_id AS cid, COUNT(*) AS n_inter
               FROM nsh n JOIN csh c USING (shingle) GROUP BY 1, 2),
    corpusdup AS (SELECT DISTINCT nid AS doc_id FROM xinter
      JOIN nsz ON nsz.doc_id = nid
      JOIN csz ON csz.doc_id = cid
      WHERE CAST(n_inter AS DOUBLE) / CAST(n_n + n_c - n_inter AS DOUBLE) >= 0.3),
    rsh AS (SELECT * FROM nsh
            WHERE doc_id NOT IN (SELECT doc_id FROM corpusdup)),
    rsz AS (SELECT doc_id, COUNT(*) AS n_sh FROM rsh GROUP BY 1),
    rinter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
               FROM rsh a JOIN rsh b USING (shingle)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    rpairs AS (SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM rinter
          JOIN rsz na ON na.doc_id = id_a
          JOIN rsz nb ON nb.doc_id = id_b)
      WHERE jaccard >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM rpairs UNION SELECT id_b, id_a FROM rpairs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    batchdup AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    hits AS (SELECT n.doc_id, COUNT(*) AS n_hits
             FROM nsh n JOIN bshingle USING (shingle) GROUP BY 1),
    contam AS (SELECT doc_id FROM hits WHERE n_hits >= 2),
    flags AS (SELECT t.doc_id, t.source,
        ROUND(
          0.5 * LEAST(CAST(len(string_split(t.text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(t.text) || ' ') - LENGTH(replace(' ' || lower(t.text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(t.text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(t.text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(t.text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS q,
        t.doc_id IN (SELECT doc_id FROM corpusdup) AS cdup,
        t.doc_id IN (SELECT doc_id FROM batchdup) AS bdup,
        t.doc_id IN (SELECT doc_id FROM contam) AS contam
      FROM documents t WHERE t.doc_id % 7 = 0 AND t.doc_id % 50 <> 0),
    admitted AS (SELECT 'admitted' AS stage, doc_id, source,
        CAST(NULL AS BIGINT) AS n
      FROM flags WHERE NOT cdup AND NOT bdup AND NOT contam AND q >= 0.4),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM flags
      UNION ALL SELECT 'dropped_corpus', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN cdup THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      UNION ALL SELECT 'dropped_batch', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN NOT cdup AND bdup THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      UNION ALL SELECT 'dropped_contam', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN NOT cdup AND NOT bdup AND contam THEN 1 ELSE 0 END) AS BIGINT) FROM flags
      UNION ALL SELECT 'dropped_quality', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(SUM(CASE WHEN NOT cdup AND NOT bdup AND NOT contam AND q < 0.4 THEN 1 ELSE 0 END) AS BIGINT) FROM flags),
    bysrc AS (SELECT 'admitted_source' AS stage, CAST(NULL AS BIGINT) AS doc_id,
        source, CAST(COUNT(*) AS BIGINT) AS n
      FROM flags WHERE NOT cdup AND NOT bdup AND NOT contam AND q >= 0.4
      GROUP BY source)
    SELECT stage, doc_id, source, n FROM admitted
    UNION ALL SELECT stage, doc_id, source, n FROM counts
    UNION ALL SELECT stage, doc_id, source, n FROM bysrc
    ORDER BY stage, doc_id, source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.CorpusRelease.incrementalReleaseRun(
          docs.where(col("doc_id") % 7 === 0 && col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 7 =!= 0 && col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.3, minHits = 2L,
          minQuality = 0.4, maxPostings = None) // exact: oracle
        .orderBy(col("stage"), col("doc_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // PREFIX-FILTERED exact similarity join (Bayardo/Chaudhuri all-pairs
  // prefix filtering): the oracle is the plain exact-Jaccard pair set
  // at τ — the HASH MATCH is the losslessness proof (every qualifying
  // pair must survive the prefix candidate cut), while Round18Spec
  // pins the candidate REDUCTION the prefix index buys on a
  // boilerplate-heavy corpus.
  private val d40 = Q("d40_prefix_filter_pairs", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
        CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b)
    WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""),
    // τ = 0.8, the near-dup operating point: the prefix length is
    // |d|−⌈τ·|d|⌉+1, so the index (and the candidate set) SHRINKS as
    // τ rises — the plain inverted index pays the same fan-out at any
    // τ. At low τ the prefix keeps most of each doc and buys little.
    (s, dir) => Dedup.prefixFilterPairs(T(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.8, maxPostings = None) // exact: oracle-comparable
      .orderBy(col("id_a"), col("id_b")))

  // TOMBSTONE/COMPACTION audit: the deletion-side index-maintenance
  // decision (s34 watches appends, s35 decides rebuilds — this
  // decides per-cell compaction after tombstoned deletes). Oracle
  // replays the seeded assignment, the deletion rollup, and both the
  // live-fraction arithmetic and the action CASE.
  private val s40 = Q("s40_tombstone_compaction", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    a AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    st AS (SELECT cell, COUNT(*) AS n_total_raw,
        SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS n_dead_raw
      FROM a GROUP BY cell),
    j AS (SELECT c.cell, COALESCE(st.n_total_raw, 0) AS n_total,
        COALESCE(st.n_dead_raw, 0) AS n_dead
      FROM cents c LEFT JOIN st USING (cell))
    SELECT cell, CAST(n_total AS BIGINT) AS n_total,
      CAST(n_total - n_dead AS BIGINT) AS n_live,
      CAST(n_dead AS BIGINT) AS n_dead,
      CASE WHEN n_total = 0 THEN NULL
        ELSE ROUND(CAST(n_total - n_dead AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        END AS live_frac,
      CASE WHEN n_total = 0 THEN 'empty'
        WHEN CAST(n_total - n_dead AS DOUBLE) / CAST(n_total AS DOUBLE) < 0.8
          THEN 'compact'
        ELSE 'keep' END AS action
    FROM j ORDER BY cell"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.tombstoneCompactionReport(emb, "embedding",
          "vec_id", k = 8,
          deletedIds = emb.where(col("vec_id") % 5 === 0).select(col("vec_id")),
          delIdCol = "vec_id", minLiveFrac = 0.8)
        .orderBy(col("cell"))
    })

  // PER-SOURCE percentile gate vs the raw global threshold — the
  // calibration decision behind cross-source quality filtering: the
  // raw cutoff's admission rate skews with each source's score
  // distribution, the percentile gate admits the same top fraction
  // everywhere. Oracle replays the t02 score, the windowed
  // percent_rank (total order, id tie-break), and both rollups.
  private val t66 = Q("t66_percentile_gate", Some("""
    WITH q AS (SELECT source, doc_id,
      0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * LEAST(
            ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
            / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
        + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
            / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)) AS quality
      FROM documents),
    pr AS (SELECT source, quality,
        PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS pr
      FROM q)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN quality >= 0.55 THEN 1 ELSE 0 END) AS BIGINT) AS n_admit_raw,
      CAST(SUM(CASE WHEN pr <= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_admit_pct,
      ROUND(CAST(SUM(CASE WHEN quality >= 0.55 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS raw_rate,
      ROUND(CAST(SUM(CASE WHEN pr <= 0.4 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS pct_rate
    FROM pr GROUP BY source ORDER BY source"""),
    (s, dir) => TextAnalysis.percentileGateBySource(T(s, dir, "documents"),
        "text", "doc_id", "source", topFrac = 0.4, rawThreshold = 0.55)
      .orderBy(col("source")))

  // GRAPH-ANN: one NN-descent refinement round over an IVF-seeded kNN
  // graph, recall-audited against the exact leg at both stages — the
  // graph index family beside LSH/IVF/PQ. Oracle replays seeding,
  // cell-mate top-k, the 2-hop expansion, the exact leg, and both
  // recall rollups.
  private val s41 = Q("s41_nn_descent", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
    nrm AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (e.nm
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM nrm e, cents c),
    asn AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    cm AS (SELECT a.vec_id AS src, b.vec_id AS dst
      FROM asn a JOIN asn b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
    c0 AS (SELECT cm.src, cm.dst,
        list_sum(list_transform(generate_series(1, len(e1.embedding)),
          i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))
        / (e1.nm * e2.nm) AS cs
      FROM cm JOIN nrm e1 ON e1.vec_id = cm.src
              JOIN nrm e2 ON e2.vec_id = cm.dst),
    n0 AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM c0) WHERE rn <= 5),
    cand AS (SELECT src, dst FROM n0
      UNION
      SELECT a.src, b.dst FROM n0 a JOIN n0 b ON a.dst = b.src
      WHERE b.dst <> a.src),
    c1 AS (SELECT cand.src, cand.dst,
        list_sum(list_transform(generate_series(1, len(e1.embedding)),
          i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))
        / (e1.nm * e2.nm) AS cs
      FROM cand JOIN nrm e1 ON e1.vec_id = cand.src
                JOIN nrm e2 ON e2.vec_id = cand.dst),
    n1 AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM c1) WHERE rn <= 5),
    ce AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id),
    ex AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 5),
    tot AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex),
    li AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM n0 LEFT JOIN ex ON ex.src = n0.src AND ex.dst = n0.dst),
    lr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM n1 LEFT JOIN ex ON ex.src = n1.src AND ex.dst = n1.dst)
    SELECT 'init' AS stage, n_queries, n_edges, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) AS recall
    FROM li, tot
    UNION ALL
    SELECT 'round1', n_queries, n_edges, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6)
    FROM lr, tot
    ORDER BY stage"""),
    (s, dir) => graft.pipeline.GraphAnn.nnDescentRecallAudit(
        T(s, dir, "embeddings"), "embedding", "vec_id", kCells = 8, k = 5,
        auditMod = 1L) // full audit: oracle-comparable
      .orderBy(col("stage")))

  // The m29/m30/m31 batch legs encode their split in the ID SPACE
  // (+100000/+200000/+300000; the SQL oracles split on
  // sample_id >= 100000), which assumes corpus doc_ids in
  // [0, 100000) — a fixture convention (testdata tops out ~5k, the
  // generated replay corpora at 300). Guarded IN-PLAN (raise_error:
  // zero extra driver round-trips, fails at execution): if the
  // corpus ever outgrew the band the legs would collide IDENTICALLY
  // in both engines, so the hash match could never catch it (r13
  // advice) — the query must fail loudly instead.
  private def offsetLegId(c: Column, off: Long): Column =
    when(c >= 0L && c < 100000L, c + lit(off)).otherwise(raise_error(
      concat(lit("id-offset fixture convention violated: doc_id "),
        c.cast("string"),
        lit(s" outside [0, 100000) — the +$off id-band leg would collide"))))

  // CROSS-MODAL dup disagreement audit: image-dup pairs (phash) vs
  // caption-dup pairs (exact) classified both/image_only/caption_only
  // — the disagreements are what single-modality dedup misses. The
  // three-leg corpus plants all three classes: +100000 re-captions a
  // near-dup image, +200000 re-renders the same caption. Oracle
  // replays the m23 phash lattice on the image leg, exact caption
  // equality, and the full-outer classification.
  private val m29 = Q("m29_crossmodal_dup_audit", Some("""
    WITH base AS (SELECT doc_id, text FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id AS sample_id, text AS img, text AS cap FROM base
      UNION ALL SELECT doc_id + 100000, text || 'x', text || 'x' FROM base
      UNION ALL SELECT doc_id + 200000, reverse(text), text FROM base),
    d AS (SELECT sample_id,
        octet_length(CAST(img AS BLOB)) AS nb,
        (octet_length(CAST(img AS BLOB)) + 9) // 10 AS h,
        string_split(img, '') AS cs
      FROM un),
    g AS (SELECT sample_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT sample_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT sample_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY sample_id),
    ah AS (SELECT v.sample_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m USING (sample_id) GROUP BY v.sample_id),
    iprs AS (SELECT id_a, id_b FROM (
      SELECT a.sample_id AS id_a, b.sample_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM ah a JOIN ah b ON a.sample_id < b.sample_id)
      WHERE hamming <= 3),
    cprs AS (SELECT a.sample_id AS id_a, b.sample_id AS id_b
      FROM un a JOIN un b ON a.cap = b.cap AND a.sample_id < b.sample_id),
    allp AS (SELECT id_a, id_b FROM iprs UNION SELECT id_a, id_b FROM cprs)
    SELECT p.id_a, p.id_b,
      CAST(CASE WHEN i.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS image_dup,
      CAST(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS caption_dup,
      CASE WHEN i.id_a IS NOT NULL AND c.id_a IS NOT NULL THEN 'both'
        WHEN i.id_a IS NOT NULL THEN 'image_only'
        ELSE 'caption_only' END AS kind
    FROM allp p
      LEFT JOIN iprs i ON i.id_a = p.id_a AND i.id_b = p.id_b
      LEFT JOIN cprs c ON c.id_a = p.id_a AND c.id_b = p.id_b
    ORDER BY p.id_a, p.id_b"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text"))
      val samples = base.select(col("doc_id").as("sample_id"),
          col("text").as("img_text"), col("text").as("caption"))
        .unionByName(base.select(offsetLegId(col("doc_id"), 100000L)
            .as("sample_id"),
          concat(col("text"), lit("x")).as("img_text"),
          concat(col("text"), lit("x")).as("caption")))
        .unionByName(base.select(offsetLegId(col("doc_id"), 200000L)
            .as("sample_id"),
          reverse(col("text")).as("img_text"), col("text").as("caption")))
      Multimodal.crossModalDupAudit(samples, "sample_id", "img_text",
          "caption", maxHamming = 3, width = 10,
          maxCaptionGroup = None) // exact: oracle-comparable
        .orderBy(col("id_a"), col("id_b"))
    })

  // FUZZY decontamination: max-Jaccard vs the benchmark (%50 docs) at
  // τ=0.5 with the argmax benchmark doc as evidence — the near-match
  // class exact n-gram hit counts (t09/t13) dilute away under edits.
  // Oracle replays the cross-split pairs, the threshold, and the
  // per-doc argmax (ties to the smaller benchmark id).
  private val t67 = Q("t67_fuzzy_decontamination", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT b.doc_id AS bench_id, c.doc_id AS did, COUNT(*) AS n_inter
              FROM sh b JOIN sh c USING (shingle)
              WHERE b.doc_id % 50 = 0 AND c.doc_id % 50 <> 0
              GROUP BY 1, 2),
    jac AS (SELECT bench_id, did, jaccard FROM (
        SELECT bench_id, did,
          CAST(n_inter AS DOUBLE) / CAST(sb.n_sh + sc.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
          JOIN sizes sb ON sb.doc_id = bench_id
          JOIN sizes sc ON sc.doc_id = did)
      WHERE jaccard >= 0.5),
    mx AS (SELECT did, bench_id, jaccard FROM (
        SELECT did, bench_id, jaccard,
          ROW_NUMBER() OVER (PARTITION BY did ORDER BY jaccard DESC, bench_id) AS rn
        FROM jac) WHERE rn = 1)
    SELECT d.doc_id, d.source, mx.bench_id,
      ROUND(mx.jaccard, 6) AS max_jaccard
    FROM mx JOIN documents d ON d.doc_id = mx.did
    ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.fuzzyContamination(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.5,
          maxCorpusPostings = None) // exact: oracle-comparable
        .orderBy(col("doc_id"))
    })

  // FUZZY DECONTAMINATION AT LSH SCALE — t67's banded sibling for
  // benchmark unions too large to broadcast: md5 slot-string MinHash
  // (the d12 kernel) bands BOTH sides, bucket equi-join, exact
  // Jaccard verify on the collisions. Oracle replays the signatures,
  // the banding, the cross bucket join, the exact verify, and the
  // argmax — including any banding false negatives (the recall curve
  // is part of the contract, and both engines must miss the SAME
  // pairs).
  private val t70 = Q("t70_fuzzy_decontamination_lsh", Some("""
    WITH toks AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
           FROM documents),
    sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
           WHERE len(ts) >= 3),
    sig AS (SELECT doc_id,
        MIN(md5('0:' || shingle)) AS m0, MIN(md5('1:' || shingle)) AS m1,
        MIN(md5('2:' || shingle)) AS m2, MIN(md5('3:' || shingle)) AS m3,
        MIN(md5('4:' || shingle)) AS m4, MIN(md5('5:' || shingle)) AS m5,
        MIN(md5('6:' || shingle)) AS m6, MIN(md5('7:' || shingle)) AS m7
      FROM sh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
      UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
      UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig),
    prs AS (SELECT DISTINCT c.doc_id AS cand_id, b.doc_id AS bench_id
      FROM bands c JOIN bands b ON c.band = b.band AND c.key = b.key
      WHERE c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    xin AS (SELECT p.cand_id, p.bench_id, COUNT(*) AS n_inter
      FROM prs p
      JOIN sh a ON a.doc_id = p.cand_id
      JOIN sh b ON b.doc_id = p.bench_id AND b.shingle = a.shingle
      GROUP BY 1, 2),
    jac AS (SELECT cand_id, bench_id, jaccard FROM (
        SELECT x.cand_id, x.bench_id,
          CAST(n_inter AS DOUBLE) / CAST(sc.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM xin x
          JOIN sizes sc ON sc.doc_id = x.cand_id
          JOIN sizes sb ON sb.doc_id = x.bench_id)
      WHERE jaccard >= 0.5),
    mx AS (SELECT cand_id, bench_id, jaccard FROM (
        SELECT cand_id, bench_id, jaccard,
          ROW_NUMBER() OVER (PARTITION BY cand_id ORDER BY jaccard DESC, bench_id) AS rn
        FROM jac) WHERE rn = 1)
    SELECT d.doc_id, d.source, mx.bench_id,
      ROUND(mx.jaccard, 6) AS max_jaccard
    FROM mx JOIN documents d ON d.doc_id = mx.cand_id
    ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.pipeline.Decontaminate.fuzzyContaminationLsh(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "text", "doc_id", "source", n = 3, tau = 0.5,
          numHashes = 8, bands = 4,
          maxBucket = None) // exact: oracle-comparable
        .orderBy(col("doc_id"))
    })

  // ADC vs SDC: the PQ scoring-mode decision measured — recall@10 of
  // both modes against the exact leg for 3 queries on the seeded
  // (oracle-reconstructable) codebook. Oracle replays the encode,
  // both table constructions, both rank windows, the exact leg, and
  // the rollups.
  private val s42 = Q("s42_adc_sdc_compare", Some("""
    WITH js AS (SELECT unnest(range(8)) AS j),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    cb AS (
      SELECT js.j, seeds.code,
             list_transform(generate_series(1, 8), i -> v[js.j*8 + i]) AS cent
      FROM seeds, js),
    cbn AS (SELECT j, code, cent,
        list_sum(list_transform(cent, x -> x*x)) AS nrm2 FROM cb),
    dists AS (
      SELECT e.vec_id, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8),
          i -> (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i])
             * (CAST(e.embedding[c.j*8+i] AS DOUBLE) - c.cent[i]))) AS d
      FROM embeddings e CROSS JOIN cb c),
    codes AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, j, code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
        FROM dists) WHERE rn = 1),
    qv AS (SELECT vec_id AS src, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 3),
    qn AS (SELECT src, sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM qv),
    atabs AS (SELECT q.src, c.j, c.code,
        list_sum(list_transform(generate_series(1, 8), i -> q.qv[c.j*8+i] * c.cent[i])) AS dot,
        c.nrm2
      FROM cbn c, qv q),
    aparts AS (SELECT t.src, cd.vec_id, cd.j, t.dot, t.nrm2
      FROM codes cd JOIN atabs t ON cd.j = t.j AND cd.code = t.code),
    ascored AS (SELECT src, vec_id,
        list_sum(list(dot ORDER BY j)) AS dsum,
        list_sum(list(nrm2 ORDER BY j)) AS nsum
      FROM aparts GROUP BY src, vec_id),
    atop AS (SELECT src, dst FROM (
        SELECT a.src, a.vec_id AS dst,
          ROW_NUMBER() OVER (PARTITION BY a.src
            ORDER BY ROUND(a.dsum / (qn.qnorm * sqrt(a.nsum)), 6) DESC, a.vec_id) AS rn
        FROM ascored a JOIN qn ON qn.src = a.src
        WHERE a.vec_id <> a.src) WHERE rn <= 10),
    qcodes AS (SELECT vec_id AS src, j, code FROM codes WHERE vec_id < 3),
    sdctabs AS (SELECT qc.src, c2.j, c2.code,
        list_sum(list_transform(generate_series(1, 8), i -> cq.cent[i] * c2.cent[i])) AS dot,
        c2.nrm2
      FROM qcodes qc
        JOIN cbn cq ON cq.j = qc.j AND cq.code = qc.code
        JOIN cbn c2 ON c2.j = qc.j),
    qhat AS (SELECT qc.src,
        sqrt(list_sum(list(cq.nrm2 ORDER BY qc.j))) AS qn2
      FROM qcodes qc JOIN cbn cq ON cq.j = qc.j AND cq.code = qc.code
      GROUP BY qc.src),
    sparts AS (SELECT t.src, cd.vec_id, cd.j, t.dot, t.nrm2
      FROM codes cd JOIN sdctabs t ON cd.j = t.j AND cd.code = t.code),
    sscored AS (SELECT src, vec_id,
        list_sum(list(dot ORDER BY j)) AS dsum,
        list_sum(list(nrm2 ORDER BY j)) AS nsum
      FROM sparts GROUP BY src, vec_id),
    stop AS (SELECT src, dst FROM (
        SELECT s.src, s.vec_id AS dst,
          ROW_NUMBER() OVER (PARTITION BY s.src
            ORDER BY ROUND(s.dsum / (q.qn2 * sqrt(s.nsum)), 6) DESC, s.vec_id) AS rn
        FROM sscored s JOIN qhat q ON q.src = s.src
        WHERE s.vec_id <> s.src) WHERE rn <= 10),
    ce AS (SELECT q.src, e.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cs
      FROM qv q, embeddings e WHERE e.vec_id <> q.src),
    ex AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 10),
    tot AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex),
    la AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM atop LEFT JOIN ex ON ex.src = atop.src AND ex.dst = atop.dst),
    ls AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM stop LEFT JOIN ex ON ex.src = stop.src AND ex.dst = stop.dst)
    SELECT 'adc' AS method, n_queries, n_returned, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) AS recall
    FROM la, tot
    UNION ALL
    SELECT 'sdc', n_queries, n_returned, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6)
    FROM ls, tot
    ORDER BY method"""),
    (s, dir) => graft.pipeline.Pq.adcSdcRecallCompare(
        T(s, dir, "embeddings"), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L), k = 10, m = 8, ksub = 16)
      .orderBy(col("method")))

  // The COMPOSED paired-corpus release run (the m-family t58 over
  // m29's corpus): image clusters drop first, exact-caption groups
  // over the remainder drop second, min-id reps kept — admitted rows
  // + stage counts + per-source rollup in one result. Oracle replays
  // the phash lattice, the recursive closure, the caption window, and
  // every rollup.
  private val m30 = Q("m30_paired_release_run", Some("""
    WITH RECURSIVE base AS (SELECT doc_id, text, source FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    un AS (SELECT doc_id AS sample_id, text AS img, text AS cap, source FROM base
      UNION ALL SELECT doc_id + 100000, text || 'x', text || 'x', source FROM base
      UNION ALL SELECT doc_id + 200000, reverse(text), text, source FROM base),
    d AS (SELECT sample_id,
        octet_length(CAST(img AS BLOB)) AS nb,
        (octet_length(CAST(img AS BLOB)) + 9) // 10 AS h,
        string_split(img, '') AS cs
      FROM un),
    g AS (SELECT sample_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT sample_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT sample_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY sample_id),
    ah AS (SELECT v.sample_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m USING (sample_id) GROUP BY v.sample_id),
    prs AS (SELECT id_a, id_b FROM (
      SELECT a.sample_id AS id_a, b.sample_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM ah a JOIN ah b ON a.sample_id < b.sample_id)
      WHERE hamming <= 3),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    imgdrop AS (SELECT sample_id FROM comp WHERE sample_id <> rep),
    rem AS (SELECT sample_id, cap, source FROM un
      WHERE sample_id NOT IN (SELECT sample_id FROM imgdrop)),
    wk AS (SELECT sample_id, source,
        MIN(sample_id) OVER (PARTITION BY cap) AS keep FROM rem),
    adm AS (SELECT 'admitted' AS stage, sample_id, source,
        CAST(NULL AS BIGINT) AS n FROM wk WHERE sample_id = keep),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM un
      UNION ALL SELECT 'image_pairs', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM prs
      UNION ALL SELECT 'image_clusters', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(DISTINCT rep) AS BIGINT) FROM comp
      UNION ALL SELECT 'dropped_image', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM imgdrop
      UNION ALL SELECT 'dropped_caption', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM wk WHERE sample_id <> keep),
    bysrc AS (SELECT 'admitted_source' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        source, CAST(COUNT(*) AS BIGINT) AS n
      FROM wk WHERE sample_id = keep GROUP BY source)
    SELECT stage, sample_id, source, n FROM adm
    UNION ALL SELECT stage, sample_id, source, n FROM counts
    UNION ALL SELECT stage, sample_id, source, n FROM bysrc
    ORDER BY stage, sample_id, source"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text"), col("source"))
      val samples = base.select(col("doc_id").as("sample_id"),
          col("text").as("img_text"), col("text").as("caption"), col("source"))
        .unionByName(base.select(offsetLegId(col("doc_id"), 100000L)
            .as("sample_id"),
          concat(col("text"), lit("x")).as("img_text"),
          concat(col("text"), lit("x")).as("caption"), col("source")))
        .unionByName(base.select(offsetLegId(col("doc_id"), 200000L)
            .as("sample_id"),
          reverse(col("text")).as("img_text"), col("text").as("caption"),
          col("source")))
      Multimodal.pairedReleaseRun(samples, "sample_id", "img_text",
          "caption", "source", maxHamming = 3, width = 10)
        .orderBy(col("stage"), col("sample_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // INCREMENTAL paired-corpus release — the d35/t65 move for m30: a
  // NOTE the declared split's id-space encoding (batch = doc_id +
  // 100000/+200000/+300000, SQL splits on sample_id >= 100000)
  // assumes corpus doc_ids < 100000 — the same fixture convention
  // m30's declared three-leg union uses; testdata tops out ~5k and
  // the generated replay corpora at 300.
  // new image-text batch (the re-captioned and re-rendered legs of
  // every third doc) admits against the standing released corpus (the
  // base leg): corpus image near-dups drop first, corpus caption dups
  // second, then the within-batch m30 stages. Corpus scans once per
  // modality with the batch sides broadcast; stage counts sum to the
  // batch. Oracle replays the phash lattice over corpus ∪ batch, both
  // cross legs, the batch-restricted closure, and every rollup.
  private val m31 = Q("m31_incremental_paired_release", Some("""
    WITH RECURSIVE base AS (SELECT doc_id, text, source FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0
        AND octet_length(CAST(text AS BLOB)) = length(text)),
    corp AS (SELECT doc_id AS sample_id, text AS img, text AS cap, source
      FROM base WHERE doc_id % 2 = 0),
    bat AS (SELECT doc_id + 100000 AS sample_id, text || 'x' AS img,
        text || 'x' AS cap, source FROM base WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id + 200000, reverse(text), text, source
        FROM base WHERE doc_id % 3 = 0
      UNION ALL SELECT doc_id + 300000, upper(reverse(text)), text, source
        FROM base WHERE doc_id % 3 = 0),
    rel AS (SELECT * FROM corp UNION ALL SELECT * FROM bat),
    d AS (SELECT sample_id,
        octet_length(CAST(img AS BLOB)) AS nb,
        (octet_length(CAST(img AS BLOB)) + 9) // 10 AS h,
        string_split(img, '') AS cs
      FROM rel),
    g AS (SELECT sample_id, h, nb, cs, r * 8 + c AS i,
        ((r * h) // 8) * 10 + (c * 10) // 8 AS idx
      FROM d, UNNEST(generate_series(0, 7)) AS gr(r),
             UNNEST(generate_series(0, 7)) AS gc(c)),
    v AS (SELECT sample_id, i,
        CASE WHEN idx < nb THEN ord(cs[CAST(idx + 1 AS BIGINT)]) ELSE 0 END AS val
      FROM g),
    m AS (SELECT sample_id, CAST(SUM(val) AS DOUBLE) / 64.0 AS mean FROM v GROUP BY sample_id),
    ah AS (SELECT v.sample_id,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i < 32 THEN (CAST(1 AS BIGINT) << v.i) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN v.val > m.mean AND v.i >= 32 THEN (CAST(1 AS BIGINT) << (v.i - 32)) ELSE 0 END) AS BIGINT) AS lo
      FROM v JOIN m USING (sample_id) GROUP BY v.sample_id),
    bah AS (SELECT * FROM ah WHERE sample_id >= 100000),
    cah AS (SELECT * FROM ah WHERE sample_id < 100000),
    imghit AS (SELECT DISTINCT b.sample_id FROM bah b JOIN cah c
      ON bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) <= 3),
    s1 AS (SELECT * FROM bat
      WHERE sample_id NOT IN (SELECT sample_id FROM imghit)),
    caphit AS (SELECT DISTINCT s.sample_id FROM s1 s
      JOIN corp c ON c.cap = s.cap),
    s2 AS (SELECT * FROM s1
      WHERE sample_id NOT IN (SELECT sample_id FROM caphit)),
    bah2 AS (SELECT a.* FROM bah a JOIN s2 ON s2.sample_id = a.sample_id),
    prs AS (SELECT id_a, id_b FROM (
      SELECT a.sample_id AS id_a, b.sample_id AS id_b,
        CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
      FROM bah2 a JOIN bah2 b ON a.sample_id < b.sample_id)
      WHERE hamming <= 3),
    sym AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u AS sample_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    imgdrop AS (SELECT sample_id FROM comp WHERE sample_id <> rep),
    rem AS (SELECT sample_id, cap, source FROM s2
      WHERE sample_id NOT IN (SELECT sample_id FROM imgdrop)),
    wk AS (SELECT sample_id, source,
        MIN(sample_id) OVER (PARTITION BY cap) AS keep FROM rem),
    adm AS (SELECT 'admitted' AS stage, sample_id, source,
        CAST(NULL AS BIGINT) AS n FROM wk WHERE sample_id = keep),
    counts AS (
      SELECT 'input' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        CAST(NULL AS VARCHAR) AS source, CAST(COUNT(*) AS BIGINT) AS n FROM bat
      UNION ALL SELECT 'corpus_image_dup', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM imghit
      UNION ALL SELECT 'corpus_caption_dup', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM caphit
      UNION ALL SELECT 'batch_image_pairs', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM prs
      UNION ALL SELECT 'batch_image_clusters', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(DISTINCT rep) AS BIGINT) FROM comp
      UNION ALL SELECT 'dropped_image', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM imgdrop
      UNION ALL SELECT 'dropped_caption', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        CAST(COUNT(*) AS BIGINT) FROM wk WHERE sample_id <> keep),
    bysrc AS (SELECT 'admitted_source' AS stage, CAST(NULL AS BIGINT) AS sample_id,
        source, CAST(COUNT(*) AS BIGINT) AS n
      FROM wk WHERE sample_id = keep GROUP BY source)
    SELECT stage, sample_id, source, n FROM adm
    UNION ALL SELECT stage, sample_id, source, n FROM counts
    UNION ALL SELECT stage, sample_id, source, n FROM bysrc
    ORDER BY stage, sample_id, source"""),
    (s, dir) => {
      val base = T(s, dir, "documents").where(octet_length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id"), col("text"), col("source"))
      // the corpus leg rides the SAME id-band guard (off = 0) as the
      // batch legs (r21 advice): a doc_id >= 100000 not divisible by
      // 3 would otherwise flow through unguarded while the oracle's
      // sample_id >= 100000 split misclassified it as a batch row —
      // an identical-in-both-engines divergence the hash can't catch
      val corpus = base.where(col("doc_id") % 2 === 0)
        .select(offsetLegId(col("doc_id"), 0L).as("sample_id"),
          col("text").as("img_text"), col("text").as("caption"), col("source"))
      val third = base.where(col("doc_id") % 3 === 0)
      val batch = third.select(offsetLegId(col("doc_id"), 100000L)
          .as("sample_id"),
          concat(col("text"), lit("x")).as("img_text"),
          concat(col("text"), lit("x")).as("caption"), col("source"))
        .unionByName(third.select(offsetLegId(col("doc_id"), 200000L)
            .as("sample_id"),
          reverse(col("text")).as("img_text"), col("text").as("caption"),
          col("source")))
        .unionByName(third.select(offsetLegId(col("doc_id"), 300000L)
            .as("sample_id"),
          upper(reverse(col("text"))).as("img_text"), col("text").as("caption"),
          col("source")))
      Multimodal.incrementalPairedRelease(corpus, batch, "sample_id",
          "img_text", "caption", "source", maxHamming = 3, width = 10)
        .orderBy(col("stage"), col("sample_id").asc_nulls_last,
          col("source").asc_nulls_last)
    })

  // OVER-FETCH under tombstones: the s40 serving-side companion — a
  // tombstoning index filters deleted ids AFTER retrieval, so plain
  // fetch-k silently loses recall; over-fetch (2k, filter, truncate)
  // is the mitigation, measured here against exact-over-live. Oracle
  // replays the scored scan, the dead flag, all three rank windows,
  // and both rollups.
  private val s43 = Q("s43_overfetch_deletes", Some("""
    WITH qv AS (SELECT vec_id AS src, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 3),
    sc AS (SELECT q.src, e.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cs,
        CASE WHEN e.vec_id % 5 = 0 THEN 1 ELSE 0 END AS is_dead
      FROM qv q, embeddings e WHERE e.vec_id <> q.src),
    f AS (SELECT src, dst, is_dead,
        ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
      FROM sc),
    fk AS (SELECT src, dst FROM f WHERE rn <= 10 AND is_dead = 0),
    ofq AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY rn) AS rn2
        FROM f WHERE rn <= 20 AND is_dead = 0) WHERE rn2 <= 10),
    ex AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM sc WHERE is_dead = 0) WHERE rn <= 10),
    tot AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex),
    lfk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM fk LEFT JOIN ex ON ex.src = fk.src AND ex.dst = fk.dst),
    lof AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_returned,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM ofq LEFT JOIN ex ON ex.src = ofq.src AND ex.dst = ofq.dst)
    SELECT 'fetch_k' AS strategy, n_queries, n_returned, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) AS recall
    FROM lfk, tot
    UNION ALL
    SELECT 'overfetch', n_queries, n_returned, n_hits, n_possible,
      ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6)
    FROM lof, tot
    ORDER BY strategy"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.overfetchUnderDeletes(emb, "embedding",
          "vec_id", queryIds = Seq(0L, 1L, 2L),
          deletedIds = emb.where(col("vec_id") % 5 === 0).select(col("vec_id")),
          delIdCol = "vec_id", k = 10, fetchFactor = 2)
        .orderBy(col("strategy"))
    })

  // PER-SOURCE quality drift between snapshots (old = %10≠0, new =
  // %10=0): counts, exact-decimal means, and the exact two-sample KS
  // statistic over the round-6 score — the ingest-monitoring read.
  // Oracle replays the score, the (source, score) rollup, the
  // cumulative windows, and the verdict.
  private val t68 = Q("t68_quality_drift", Some("""
    WITH sc AS (SELECT source,
      CAST(ROUND(
      0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * LEAST(
            ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
             + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
            / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
        + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
            / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS DECIMAL(18,6)) AS s,
      CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS is_new
      FROM documents),
    per AS (SELECT source, s,
        SUM(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS co,
        SUM(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS cn
      FROM sc GROUP BY source, s),
    cum AS (SELECT source, s, co, cn,
        SUM(co) OVER (PARTITION BY source ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_o,
        SUM(cn) OVER (PARTITION BY source ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        SUM(co) OVER (PARTITION BY source) AS n_old,
        SUM(cn) OVER (PARTITION BY source) AS n_new
      FROM per),
    agg AS (SELECT source, MAX(n_old) AS n_old, MAX(n_new) AS n_new,
        SUM(s * co) AS sum_o, SUM(s * cn) AS sum_n,
        MAX(CASE WHEN n_old > 0 AND n_new > 0 THEN
          ABS(CAST(cum_o AS DOUBLE) / CAST(n_old AS DOUBLE)
            - CAST(cum_n AS DOUBLE) / CAST(n_new AS DOUBLE)) END) AS ks_raw
      FROM cum GROUP BY source)
    SELECT source, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
      CASE WHEN n_old = 0 THEN NULL
        ELSE ROUND(CAST(sum_o AS DOUBLE) / CAST(n_old AS DOUBLE), 6) END AS mean_old,
      CASE WHEN n_new = 0 THEN NULL
        ELSE ROUND(CAST(sum_n AS DOUBLE) / CAST(n_new AS DOUBLE), 6) END AS mean_new,
      ROUND(ks_raw, 6) AS ks,
      CASE WHEN ks_raw IS NULL THEN NULL
        WHEN ks_raw > 0.2 THEN CAST(1 AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS drifted
    FROM agg ORDER BY source"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      TextAnalysis.qualityDriftBySource(
          docs.where(col("doc_id") % 10 =!= 0),
          docs.where(col("doc_id") % 10 === 0),
          "text", "source", ksThreshold = 0.2)
        .orderBy(col("source"))
    })

  // ADAPTIVE nprobe: cells probed in query-similarity order until the
  // cumulative member count reaches the candidate budget — per-query
  // cost control where fixed nprobe (s31) probes blind to cell skew.
  // Oracle replays seeding, assignment, the cell ranking + cumulative
  // cut, candidate scoring, the exact leg, and the per-query rollup.
  private val s44 = Q("s44_adaptive_nprobe", Some("""
    WITH cents AS (SELECT vec_id AS cell, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM embeddings e, cents c),
    asn AS (SELECT vec_id, cell FROM (
        SELECT vec_id, cell, sim,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    cs AS (SELECT cell, COUNT(*) AS n_members FROM asn GROUP BY cell),
    qv AS (SELECT vec_id AS src, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 3),
    qr AS (SELECT q.src, c.cell, COALESCE(cs.n_members, 0) AS nm,
        list_sum(list_transform(generate_series(1, len(c.cvec)), i -> q.qv[i] * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS csim
      FROM qv q CROSS JOIN cents c LEFT JOIN cs ON cs.cell = c.cell),
    rk AS (SELECT src, cell, nm,
        ROW_NUMBER() OVER (PARTITION BY src ORDER BY csim DESC, cell) AS rk
      FROM qr),
    probed AS (SELECT src, cell FROM (
        SELECT src, cell, nm,
          SUM(nm) OVER (PARTITION BY src ORDER BY rk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM rk) WHERE cum - nm < 150),
    cand AS (SELECT p.src, a.vec_id AS did
      FROM probed p JOIN asn a ON a.cell = p.cell
      WHERE a.vec_id <> p.src),
    scored AS (SELECT c.src, c.did,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cs2
      FROM cand c JOIN embeddings e ON e.vec_id = c.did
                  JOIN qv q ON q.src = c.src),
    approx AS (SELECT src, did AS dst FROM (
        SELECT src, did, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs2 DESC, did) AS rn
        FROM scored) WHERE rn <= 10),
    ce AS (SELECT q.src, e.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cs3
      FROM qv q, embeddings e WHERE e.vec_id <> q.src),
    ex AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs3 DESC, dst) AS rn
        FROM ce) WHERE rn <= 10),
    ncl AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_cells_probed FROM probed GROUP BY src),
    ncd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand GROUP BY src),
    lg AS (SELECT a.src, CAST(COUNT(*) AS BIGINT) AS n_returned,
        CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM approx a LEFT JOIN ex ON ex.src = a.src AND ex.dst = a.dst
      GROUP BY a.src),
    ps AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex GROUP BY src)
    SELECT ncl.src AS query_id, n_cells_probed,
      COALESCE(n_candidates, 0) AS n_candidates,
      COALESCE(n_returned, 0) AS n_returned,
      COALESCE(n_hits, 0) AS n_hits,
      COALESCE(n_possible, 0) AS n_possible,
      CASE WHEN COALESCE(n_possible, 0) = 0 THEN 0.0
        ELSE ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE)
          / CAST(n_possible AS DOUBLE), 6) END AS recall
    FROM ncl LEFT JOIN ncd ON ncd.src = ncl.src
      LEFT JOIN lg ON lg.src = ncl.src
      LEFT JOIN ps ON ps.src = ncl.src
    ORDER BY query_id"""),
    (s, dir) => graft.pipeline.Clustering.adaptiveProbeRecall(
        T(s, dir, "embeddings"), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L), k = 10, numCells = 8,
        targetCandidates = 150L)
      .orderBy(col("query_id")))

  // NN-DESCENT TO CONVERGENCE under the SAMPLED audit contract — the
  // serving-shape declaration of the graph-ANN family (the d19
  // precedent: declare the audited slice): ring init (geometry-blind,
  // the deterministic stand-in for Dong's random init — the
  // IVF-cellmate seed of s41 is a PROVABLE fixed point, see
  // GraphAnn's closure note), undirected 2-hop refinement, iterate
  // until the round-6 recall gain drops below eps or maxRounds. The
  // exact leg audits ids = 0 (mod 4) while the graph builds on
  // everything. Oracle replays the ring, every undirected expansion,
  // the sampled exact leg, the per-stage recalls, the LAG gain, and
  // the stop rule.
  private def s45RoundSql(r: Int, gk: Int = 5): String = {
    val p = r - 1
    s"""
    u$p AS MATERIALIZED (SELECT src, dst FROM n$p UNION SELECT dst, src FROM n$p),
    cd$r AS MATERIALIZED (SELECT src, dst FROM n$p
      UNION
      SELECT a.src, b.dst FROM u$p a JOIN u$p b ON a.dst = b.src
      WHERE b.dst <> a.src),
    c$r AS MATERIALIZED (SELECT cd$r.src, cd$r.dst,
        list_sum(list_transform(generate_series(1, len(e1.embedding)),
          i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))
        / (e1.nm * e2.nm) AS cs
      FROM cd$r JOIN nrm e1 ON e1.vec_id = cd$r.src
                JOIN nrm e2 ON e2.vec_id = cd$r.dst),
    n$r AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM c$r) WHERE rn <= $gk),"""
  }
  private def s45LegSql(r: Int): String = s"""
    l$r AS MATERIALIZED (SELECT CAST($r AS BIGINT) AS round_no, CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
      FROM (SELECT * FROM n$r WHERE src % 4 = 0) s
      LEFT JOIN ex ON ex.src = s.src AND ex.dst = s.dst),"""
  private val s45MaxRounds = 8
  private val s45 = Q("s45_nn_descent_converge", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 5) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to s45MaxRounds).map(r => s45RoundSql(r)).mkString("")}
    ce AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
      WHERE a.vec_id % 4 = 0),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 5),
    tot AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex),
    ${(0 to s45MaxRounds).map(s45LegSql).mkString("")}
    st AS MATERIALIZED (${(0 to s45MaxRounds).map(r => s"SELECT * FROM l$r").mkString("\n      UNION ALL ")}),
    rc AS MATERIALIZED (SELECT round_no, n_queries, n_edges, n_hits, n_possible,
        ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) AS recall
      FROM st, tot),
    g AS MATERIALIZED (SELECT round_no, n_queries, n_edges, n_hits, n_possible, recall,
        ROUND(recall - COALESCE(LAG(recall) OVER (ORDER BY round_no), 0.0), 6) AS gain
      FROM rc),
    cut AS MATERIALIZED (SELECT COALESCE(MIN(round_no), $s45MaxRounds) AS stop FROM g
      WHERE round_no >= 1 AND gain < 0.02)
    SELECT round_no, n_queries, n_edges, n_hits, n_possible, recall, gain,
      CAST(CASE WHEN round_no >= 1 AND gain < 0.02 THEN 1 ELSE 0 END AS BIGINT) AS converged
    FROM g, cut WHERE round_no <= stop ORDER BY round_no"""),
    (s, dir) => graft.pipeline.GraphAnn.nnDescentConverge(
        T(s, dir, "embeddings"), "embedding", "vec_id", k = 5,
        auditMod = 4L, epsilon = 0.02, maxRounds = s45MaxRounds)
      .orderBy(col("round_no")))

  // GRAPH BEAM SEARCH family — the graph-ANN SERVING reads (the
  // HNSW-class best-first loop), all running against the PERSISTED
  // GraphIndex (the s15 lifecycle: first invocation per (corpus
  // fingerprint, params) builds and persists the NN-descent edge
  // table to the JVM tmpdir; every later invocation — and every
  // query in a serving session — loads it, so s47/s49/s50 share ONE
  // standing index and s45 remains the declared build measurement).
  // The loaded trajectory is bit-identical to an in-query build
  // (Round20Spec), so the oracles still replay the build CTEs: the
  // graph's content is part of each result's definition, regardless
  // of which side of the persist boundary computed it.
  private def graphIdxHandle(s: SparkSession, dir: String,
      corpus: DataFrame, graphK: Int, buildRounds: Int,
      tag: String): graft.pipeline.GraphIndex.Handle = {
    // cache key = 128-bit corpus FINGERPRINT (per-file size+mtime +
    // params), the s15 discipline widened per the r21 advice: the
    // test corpus is regenerated in place between rounds, and a
    // path-keyed (or collision-prone 32-bit) index key would serve
    // stale edges; requireHandleMatches (n, mn, cols) cannot catch a
    // same-size content change on its own. The miss path sweeps the
    // previous corpus's stranded dirs (every tag at once — the
    // corpus part prefixes the dir name).
    val (cpart, key) = idxKeys(dir, s"$tag|gk$graphK|r$buildRounds")
    if (graft.pipeline.GraphIndex.get(s"graph-$key").isEmpty)
      pruneOrphanIndexDirs("graft-gidx-", cpart)
    graft.pipeline.GraphIndex.openOrBuildCached(s"graph-$key", corpus,
      "embedding", "vec_id",
      s"${System.getProperty("java.io.tmpdir")}/graft-gidx-$key",
      graphK, buildRounds)
  }

  // one audited hop of the oracle's beam walk: frontier expansion
  // over the undirected edges, exact rescoring, beam cut, and the
  // two per-(query, hop) counters
  private def beamHopSql(h: Int, beam: Int, k: Int): String = {
    val bmPrev = if (h == 1) "bm0" else s"bm${h - 1}"
    s"""
    hcd$h AS MATERIALIZED (SELECT qid, dst FROM (
        SELECT b.qid, b.dst FROM $bmPrev b
        UNION
        SELECT b.qid, u.dst FROM $bmPrev b JOIN und u ON u.src = b.dst)
      WHERE dst <> qid),
    hsc$h AS MATERIALIZED (SELECT c.qid, c.dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
        / (e.nm * q.nm) AS cs
      FROM hcd$h c JOIN nrm e ON e.vec_id = c.dst
                   JOIN nrm q ON q.vec_id = c.qid),
    bm$h AS MATERIALIZED (SELECT qid, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM hsc$h) WHERE rn <= $beam),
    ns$h AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scored
      FROM hsc$h GROUP BY qid),
    hh$h AS (SELECT t.qid,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
      FROM (SELECT qid, dst FROM (
          SELECT qid, dst, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
          FROM bm$h) WHERE rn <= $k) t
      LEFT JOIN ex ON ex.src = t.qid AND ex.dst = t.dst
      GROUP BY t.qid),
    row$h AS (SELECT ns$h.qid AS query_id, CAST($h AS BIGINT) AS hop,
        n_scored, n_hits, ps.n_possible,
        ROUND(CAST(n_hits AS DOUBLE) / CAST(ps.n_possible AS DOUBLE), 6) AS recall
      FROM ns$h JOIN hh$h ON hh$h.qid = ns$h.qid
        JOIN ps ON ps.src = ns$h.qid),"""
  }

  // full beam-search oracle: NN-descent build CTEs (ring at degree
  // gk + rounds undirected refinements), exact leg over the query
  // batch, entry selection (min-id, or argmax over the first
  // coarseK ids with a hop-0 audit row), then the audited hops
  private def beamSearchOracleSql(qids: Seq[Long], k: Int, beam: Int,
      gk: Int, rounds: Int, hops: Int,
      coarseK: Option[Int] = None): String = {
    val inList = qids.mkString(", ")
    val entrySql = coarseK match {
      case None => s"""
    bm0 AS MATERIALIZED (SELECT q.qid,
        CASE WHEN q.qid = m.mn THEN m.mn + 1 ELSE m.mn END AS dst
      FROM qv q, meta m),"""
      case Some(ck) => s"""
    sc0 AS MATERIALIZED (SELECT q.vec_id AS qid, e.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
        / (e.nm * q.nm) AS cs
      FROM nrm q, meta m, nrm e
      WHERE q.vec_id IN ($inList)
        AND e.vec_id < m.mn + $ck AND e.vec_id <> q.vec_id),
    bm0 AS MATERIALIZED (SELECT qid, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM sc0) WHERE rn = 1),
    ns0 AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scored
      FROM sc0 GROUP BY qid),
    hh0 AS (SELECT t.qid,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
      FROM (SELECT qid, dst FROM (
          SELECT qid, dst, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
          FROM bm0) WHERE rn <= $k) t
      LEFT JOIN ex ON ex.src = t.qid AND ex.dst = t.dst
      GROUP BY t.qid),
    row0 AS (SELECT ns0.qid AS query_id, CAST(0 AS BIGINT) AS hop,
        n_scored, n_hits, ps.n_possible,
        ROUND(CAST(n_hits AS DOUBLE) / CAST(ps.n_possible AS DOUBLE), 6) AS recall
      FROM ns0 JOIN hh0 ON hh0.qid = ns0.qid
        JOIN ps ON ps.src = ns0.qid),"""
    }
    val firstRow = if (coarseK.isDefined) 0 else 1
    s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, $gk) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to rounds).map(r => s45RoundSql(r, gk = gk)).mkString("")}
    und AS MATERIALIZED (SELECT src, dst FROM n$rounds UNION SELECT dst, src FROM n$rounds),
    qv AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id IN ($inList)),
    ce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id <> q.vec_id
      WHERE q.vec_id IN ($inList)),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= $k),
    ps AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex GROUP BY src),
    $entrySql
    ${(1 to hops).map(h => beamHopSql(h, beam, k)).mkString("")}
    final_rows AS (${(firstRow to hops).map(h => s"SELECT * FROM row$h")
      .mkString("\n      UNION ALL ")})
    SELECT query_id, hop, n_scored, n_hits, n_possible, recall
    FROM final_rows ORDER BY query_id, hop"""
  }

  private val s47Hops = 5
  // s47: the one-index-many-reads family's first read — min-id entry,
  // beam 20, 5 fixed hops, recall@5 audited per hop against the exact
  // leg; the per-hop rows show the trajectory a latency budget buys.
  private val s47 = Q("s47_graph_beam_search",
    Some(beamSearchOracleSql(Seq(1L, 2L, 3L), k = 5, beam = 20, gk = 10,
      rounds = 3, hops = s47Hops)),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphBeamSearchLoaded(emb, "embedding",
          "vec_id", h, queryIds = Seq(1L, 2L, 3L), k = 5, beamWidth = 20,
          hops = s47Hops)
        .orderBy(col("query_id"), col("hop"))
    })

  // GRAPH INDEX SEARCH (s49) — the persist/load lifecycle read: a
  // DIFFERENT query batch served from the SAME standing index as s47
  // (registry hit — zero build work in this query), at a tighter
  // serving budget (beam 16, 4 hops). This is the production profile:
  // one nightly build, many reads with their own parameters. The
  // oracle replays the identical build CTEs — the persist boundary is
  // invisible to the result's definition (Round20Spec pins
  // loaded == fresh bit-identity).
  private val s49 = Q("s49_graph_index_search",
    Some(beamSearchOracleSql(Seq(5L, 8L, 13L), k = 5, beam = 16, gk = 10,
      rounds = 3, hops = 4)),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphBeamSearchLoaded(emb, "embedding",
          "vec_id", h, queryIds = Seq(5L, 8L, 13L), k = 5, beamWidth = 16,
          hops = 4)
        .orderBy(col("query_id"), col("hop"))
    })

  // GRAPH COARSE-ENTRY SEARCH (s50) — hierarchical entry selection
  // over the same standing index (the one-layer version of HNSW's
  // upper-layer descent): each query enters at its best match among
  // the first 16 vectors by id (the seed discipline) instead of the
  // fixed min-id vector; the selection is audited as hop 0
  // (n_scored = coarse candidates, the entry's own hits vs exact),
  // and the hop-for-hop rows against s47 MEASURE what the coarse
  // layer buys. Round-20 finding (the __gentry_ab A/B, documented in
  // PLANS.md): on this near-orthogonal synthetic corpus the benefit
  // is nil — strategies reach parity by the 5-hop budget on unbiased
  // mid-corpus queries, and the s47-vs-s50 gap on the declared
  // low-id queries is an EVALUATION artifact the audit itself
  // exposed (ids 1-3 are ring-adjacent to the min-id entry, so the
  // fixed entry is flattered by construction). Entry cost is
  // |queries| x 16 scores — flat in corpus size; the dominance pin
  // in Round20Spec is scoped to its low-dim short-budget fixture,
  // where entry proximity genuinely pays.
  private val s50 = Q("s50_graph_coarse_entry",
    Some(beamSearchOracleSql(Seq(1L, 2L, 3L), k = 5, beam = 20, gk = 10,
      rounds = 3, hops = s47Hops, coarseK = Some(16))),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphBeamSearchLoaded(emb, "embedding",
          "vec_id", h, queryIds = Seq(1L, 2L, 3L), k = 5, beamWidth = 20,
          hops = s47Hops, coarseEntryK = Some(16))
        .orderBy(col("query_id"), col("hop"))
    })

  // GRAPH TOMBSTONE SEARCH (s52) — the s43 over-fetch discipline on
  // the graph index: tombstones (vec_id %9 = 5, the s46 convention)
  // still ROUTE the walk (HNSW practice — deleted nodes keep their
  // edges until the repair job) but are filtered from results; plain
  // top-k loses recall silently, over-fetch (2k, filter, truncate)
  // recovers it — both graded from ONE walk against exact-over-LIVE.
  // Oracle replays the build, the hop walk, both strategy cuts, and
  // the live exact leg.
  private val s52 = Q("s52_graph_tombstone_search", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 10) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 3).map(r => s45RoundSql(r, gk = 10)).mkString("")}
    und AS MATERIALIZED (SELECT src, dst FROM n3 UNION SELECT dst, src FROM n3),
    del AS MATERIALIZED (SELECT vec_id AS id FROM embeddings WHERE vec_id % 9 = 5),
    qv AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id IN (1, 2, 3)),
    ce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id <> q.vec_id
      WHERE q.vec_id IN (1, 2, 3)
        AND b.vec_id NOT IN (SELECT id FROM del)),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 5),
    ps AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS p FROM ex GROUP BY src),
    bm0 AS MATERIALIZED (SELECT q.qid,
        CASE WHEN q.qid = m.mn THEN m.mn + 1 ELSE m.mn END AS dst
      FROM qv q, meta m),
    ${(1 to 5).map(h => beamHopSql(h, beam = 20, k = 5)).mkString("")}
    fb AS MATERIALIZED (SELECT qid, dst, cs,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
      FROM bm5),
    pl AS (SELECT qid, dst FROM fb
      WHERE rn <= 5 AND dst NOT IN (SELECT id FROM del)),
    ov AS (SELECT qid, dst FROM (
        SELECT qid, dst,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS lr
        FROM fb WHERE rn <= 10 AND dst NOT IN (SELECT id FROM del))
      WHERE lr <= 5),
    plc AS (SELECT ql.qid, CAST(COUNT(p.dst) AS BIGINT) AS n_returned,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
      FROM qv ql LEFT JOIN pl p ON p.qid = ql.qid
        LEFT JOIN ex ON ex.src = p.qid AND ex.dst = p.dst
      GROUP BY ql.qid),
    ovc AS (SELECT ql.qid, CAST(COUNT(p.dst) AS BIGINT) AS n_returned,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
      FROM qv ql LEFT JOIN ov p ON p.qid = ql.qid
        LEFT JOIN ex ON ex.src = p.qid AND ex.dst = p.dst
      GROUP BY ql.qid)
    SELECT qid AS query_id, 'plain' AS strategy, n_returned, n_hits,
      CAST(COALESCE(ps.p, 0) AS BIGINT) AS n_possible,
      CASE WHEN COALESCE(ps.p, 0) = 0 THEN 0.0
        ELSE ROUND(CAST(n_hits AS DOUBLE) / CAST(ps.p AS DOUBLE), 6) END AS recall
    FROM plc LEFT JOIN ps ON ps.src = plc.qid
    UNION ALL
    SELECT qid, 'overfetch', n_returned, n_hits,
      CAST(COALESCE(ps.p, 0) AS BIGINT),
      CASE WHEN COALESCE(ps.p, 0) = 0 THEN 0.0
        ELSE ROUND(CAST(n_hits AS DOUBLE) / CAST(ps.p AS DOUBLE), 6) END
    FROM ovc LEFT JOIN ps ON ps.src = ovc.qid
    ORDER BY query_id, strategy"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphSearchWithTombstones(emb, "embedding",
          "vec_id", h, emb.where(col("vec_id") % 9 === 5)
            .select(col("vec_id")), "vec_id",
          queryIds = Seq(1L, 2L, 3L), k = 5, beamWidth = 20, hops = 5)
        .orderBy(col("query_id"), col("strategy"))
    })

  // GRAPH DELETE + REPAIR (s51) — the maintenance job behind s52's
  // serve-time mitigation (the s40 compaction analogue for the graph
  // family): drop the tombstoned nodes from the standing index and
  // repair each node that lost an edge by promoting candidates
  // THROUGH its deleted neighbors (the published HNSW-repair move),
  // rescoring exactly, keeping top graphK. Recall of the repaired
  // lists vs exact-over-live is the verdict that the tombstones can
  // be dropped; the exact leg samples affected ids %4 (the d19
  // protocol). Oracle replays the build, the drop/lost/promotion
  // sets, the repair rank, and the sampled live exact leg.
  private val s51 = Q("s51_graph_delete_repair", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 10) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 3).map(r => s45RoundSql(r, gk = 10)).mkString("")}
    del AS MATERIALIZED (SELECT vec_id AS id FROM embeddings WHERE vec_id % 9 = 5),
    ge AS MATERIALIZED (SELECT src, dst FROM n3),
    gl AS MATERIALIZED (SELECT src, dst FROM ge
      WHERE src NOT IN (SELECT id FROM del) AND dst NOT IN (SELECT id FROM del)),
    lost AS MATERIALIZED (SELECT src, dst AS d FROM ge
      WHERE dst IN (SELECT id FROM del) AND src NOT IN (SELECT id FROM del)),
    aff AS MATERIALIZED (SELECT DISTINCT src FROM lost),
    promo AS MATERIALIZED (SELECT DISTINCT l.src, g2.dst
      FROM lost l JOIN ge g2 ON g2.src = l.d
      WHERE g2.dst NOT IN (SELECT id FROM del) AND g2.dst <> l.src),
    cand AS (SELECT gl.src, gl.dst FROM gl JOIN aff ON aff.src = gl.src
      UNION SELECT src, dst FROM promo),
    rc AS MATERIALIZED (SELECT c.src, c.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM cand c JOIN nrm a ON a.vec_id = c.src
                  JOIN nrm b ON b.vec_id = c.dst),
    rep AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM rc) WHERE rn <= 10),
    samp AS MATERIALIZED (SELECT src FROM aff WHERE src % 4 = 0),
    ce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT src FROM samp)
        AND b.vec_id NOT IN (SELECT id FROM del)),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 10),
    hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM rep
      JOIN samp ON samp.src = rep.src
      JOIN ex ON ex.src = rep.src AND ex.dst = rep.dst),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM ex)
    SELECT 'deleted_nodes' AS metric,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM del) AS n,
      CAST(NULL AS DOUBLE) AS x
    UNION ALL SELECT 'edges_dropped',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ge) - (SELECT CAST(COUNT(*) AS BIGINT) FROM gl),
      CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'affected_nodes',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM aff), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'promoted_candidates',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM promo), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repaired_edges',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM rep), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair_recall', hit.h,
      CASE WHEN tot.p = 0 THEN 0.0
        ELSE ROUND(CAST(hit.h AS DOUBLE) / CAST(tot.p AS DOUBLE), 6) END
    FROM hit, tot
    ORDER BY metric"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphDeleteRepairLoaded(emb, "embedding",
          "vec_id", h, emb.where(col("vec_id") % 9 === 5)
            .select(col("vec_id")), "vec_id", auditMod = 4L)
        .orderBy(col("metric"))
    })

  // GRAPH INDEX APPEND — the graph family's daily-ingest move (the
  // HNSW insert): the last 20% of the id range arrives as a batch
  // against the graph built over the first 80%; each new vector is
  // found by the s47 beam kernel, connected to its best 5, and the
  // touched nodes run the reverse-adoption re-rank. Oracle replays
  // the corpus build, every search hop, the connect cut, the exact
  // batch-vs-corpus leg, and the adoption rank.
  private def s48HopSql(h: Int): String = {
    val bmPrev = if (h == 1) "abm0" else s"abm${h - 1}"
    s"""
    acd$h AS MATERIALIZED (SELECT b.qid, b.dst FROM $bmPrev b
      UNION
      SELECT b.qid, u.dst FROM $bmPrev b JOIN und u ON u.src = b.dst),
    asc$h AS MATERIALIZED (SELECT c.qid, c.dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
        / (e.nm * q.nm) AS cs
      FROM acd$h c JOIN nrm e ON e.vec_id = c.dst
                   JOIN nrm q ON q.vec_id = c.qid),
    abm$h AS MATERIALIZED (SELECT qid, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM asc$h) WHERE rn <= 10),"""
  }
  private val s48 = Q("s48_graph_append", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    thr AS (SELECT 4 * (MAX(vec_id) + 1) // 5 AS t FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn
      FROM embeddings WHERE vec_id < (SELECT t FROM thr)),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 5) AS t(j)
      WHERE e.vec_id < (SELECT t FROM thr)
        AND j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 2).map(r => s45RoundSql(r)).mkString("")}
    und AS MATERIALIZED (SELECT src, dst FROM n2 UNION SELECT dst, src FROM n2),
    abm0 AS MATERIALIZED (SELECT e.vec_id AS qid, m.mn AS dst
      FROM embeddings e, meta m WHERE e.vec_id >= (SELECT t FROM thr)),
    ${(1 to 3).map(s48HopSql).mkString("")}
    ne AS MATERIALIZED (SELECT qid AS src, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM abm3) WHERE rn <= 5),
    ce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id < (SELECT t FROM thr)
      WHERE q.vec_id >= (SELECT t FROM thr)),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM ce) WHERE rn <= 5),
    rr AS (SELECT CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS h,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS p
      FROM ne LEFT JOIN ex ON ex.src = ne.src AND ex.dst = ne.dst),
    rev AS (SELECT dst AS src, src AS dst, cs, 1 AS isnew FROM ne),
    aff AS MATERIALIZED (SELECT DISTINCT src FROM rev),
    fe AS (SELECT g.src, g.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs, 0 AS isnew
      FROM n2 g JOIN aff ON aff.src = g.src
        JOIN nrm a ON a.vec_id = g.src JOIN nrm b ON b.vec_id = g.dst),
    ad AS (SELECT src FROM (
        SELECT src, isnew,
          ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM (SELECT * FROM fe UNION ALL SELECT * FROM rev))
      WHERE rn <= 5 AND isnew = 1)
    SELECT 'batch' AS metric,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
        WHERE vec_id >= (SELECT t FROM thr)) AS n,
      CAST(NULL AS DOUBLE) AS x
    UNION ALL SELECT 'new_edges', (SELECT CAST(COUNT(*) AS BIGINT) FROM ne),
      CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'new_edge_recall', h,
      CASE WHEN p = 0 THEN 0.0
        ELSE ROUND(CAST(h AS DOUBLE) / CAST(p AS DOUBLE), 6) END FROM rr
    UNION ALL SELECT 'affected_nodes', (SELECT CAST(COUNT(*) AS BIGINT) FROM aff),
      CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'adopted_nodes', CAST(COUNT(DISTINCT src) AS BIGINT),
      CASE WHEN (SELECT COUNT(*) FROM aff) = 0 THEN 0.0
        ELSE ROUND(CAST(COUNT(DISTINCT src) AS DOUBLE)
          / (SELECT CAST(COUNT(*) AS DOUBLE) FROM aff), 6) END FROM ad
    UNION ALL SELECT 'adopted_edges', CAST(COUNT(*) AS BIGINT),
      CAST(NULL AS DOUBLE) FROM ad
    ORDER BY metric"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val thr = 4L * (emb.agg(max(col("vec_id"))).head().getLong(0) + 1L) / 5L
      // the standing 80%-corpus graph is a PERSISTED index (its own
      // fingerprint-keyed dir — the corpus differs from s47's), so
      // the declared append pays only search + connect + adoption
      val h = graphIdxHandle(s, dir, emb.where(col("vec_id") < thr),
        graphK = 5, buildRounds = 2, tag = "c80")
      graft.pipeline.GraphAnn.graphAppendAuditLoaded(
          emb.where(col("vec_id") < thr), emb.where(col("vec_id") >= thr),
          "embedding", "vec_id", h, beamWidth = 10, hops = 3)
        .orderBy(col("metric"))
    })

  // COMPOSED GRAPH-INDEX MAINTENANCE RUN (s53) — the s46 move for
  // the graph family: append (s48) + delete/repair (s51) + the
  // tombstone-aware serve audit (s52, strategy totals) in ONE
  // manifest against ONE standing persisted graph (the s48 c80
  // index — registry hit) and one shared corpus scan; every leg
  // audits the same standing snapshot. Oracle replays the 80% build
  // once and all three legs off it.
  private val s53 = Q("s53_graph_maintenance_run", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    thr AS (SELECT 4 * (MAX(vec_id) + 1) // 5 AS t FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn
      FROM embeddings WHERE vec_id < (SELECT t FROM thr)),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 5) AS t(j)
      WHERE e.vec_id < (SELECT t FROM thr)
        AND j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 2).map(r => s45RoundSql(r)).mkString("")}
    und AS MATERIALIZED (SELECT src, dst FROM n2 UNION SELECT dst, src FROM n2),
    del AS MATERIALIZED (SELECT vec_id AS id FROM embeddings
      WHERE vec_id % 9 = 5 AND vec_id < (SELECT t FROM thr)),
    abm0 AS MATERIALIZED (SELECT e.vec_id AS qid, m.mn AS dst
      FROM embeddings e, meta m WHERE e.vec_id >= (SELECT t FROM thr)),
    ${(1 to 3).map(s48HopSql).mkString("")}
    ne AS MATERIALIZED (SELECT qid AS src, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM abm3) WHERE rn <= 5),
    bce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id < (SELECT t FROM thr)
      WHERE q.vec_id >= (SELECT t FROM thr)),
    bex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM bce) WHERE rn <= 5),
    brr AS (SELECT CAST(COALESCE(SUM(CASE WHEN bex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS h,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM bex) AS p
      FROM ne LEFT JOIN bex ON bex.src = ne.src AND bex.dst = ne.dst),
    arev AS (SELECT dst AS src, src AS dst, cs, 1 AS isnew FROM ne),
    aaff AS MATERIALIZED (SELECT DISTINCT src FROM arev),
    afe AS (SELECT g.src, g.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs, 0 AS isnew
      FROM n2 g JOIN aaff ON aaff.src = g.src
        JOIN nrm a ON a.vec_id = g.src JOIN nrm b ON b.vec_id = g.dst),
    aad AS (SELECT src FROM (
        SELECT src, isnew,
          ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM (SELECT * FROM afe UNION ALL SELECT * FROM arev))
      WHERE rn <= 5 AND isnew = 1),
    ge AS MATERIALIZED (SELECT src, dst FROM n2),
    gl AS MATERIALIZED (SELECT src, dst FROM ge
      WHERE src NOT IN (SELECT id FROM del) AND dst NOT IN (SELECT id FROM del)),
    lost AS MATERIALIZED (SELECT src, dst AS d FROM ge
      WHERE dst IN (SELECT id FROM del) AND src NOT IN (SELECT id FROM del)),
    aff AS MATERIALIZED (SELECT DISTINCT src FROM lost),
    promo AS MATERIALIZED (SELECT DISTINCT l.src, g2.dst
      FROM lost l JOIN ge g2 ON g2.src = l.d
      WHERE g2.dst NOT IN (SELECT id FROM del) AND g2.dst <> l.src),
    cand AS (SELECT gl.src, gl.dst FROM gl JOIN aff ON aff.src = gl.src
      UNION SELECT src, dst FROM promo),
    rc AS MATERIALIZED (SELECT c.src, c.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM cand c JOIN nrm a ON a.vec_id = c.src
                  JOIN nrm b ON b.vec_id = c.dst),
    rep AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM rc) WHERE rn <= 5),
    samp AS MATERIALIZED (SELECT src FROM aff WHERE src % 2 = 0),
    rce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT src FROM samp)
        AND b.vec_id < (SELECT t FROM thr)
        AND b.vec_id NOT IN (SELECT id FROM del)),
    rex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM rce) WHERE rn <= 5),
    rhit AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM rep
      JOIN samp ON samp.src = rep.src
      JOIN rex ON rex.src = rep.src AND rex.dst = rep.dst),
    rtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM rex),
    qv AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id IN (1, 2, 3)),
    sce AS (SELECT q.vec_id AS src, b.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(q.embedding)),
          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (q.nm * b.nm) AS cs
      FROM nrm q JOIN nrm b ON b.vec_id <> q.vec_id
      WHERE q.vec_id IN (1, 2, 3)
        AND b.vec_id < (SELECT t FROM thr)
        AND b.vec_id NOT IN (SELECT id FROM del)),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM sce) WHERE rn <= 5),
    ps AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS p FROM ex GROUP BY src),
    bm0 AS MATERIALIZED (SELECT q.qid,
        CASE WHEN q.qid = m.mn THEN m.mn + 1 ELSE m.mn END AS dst
      FROM qv q, meta m),
    ${(1 to 3).map(h => beamHopSql(h, beam = 10, k = 5)).mkString("")}
    fb AS MATERIALIZED (SELECT qid, dst, cs,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
      FROM bm3),
    pl AS (SELECT qid, dst FROM fb
      WHERE rn <= 5 AND dst NOT IN (SELECT id FROM del)),
    ov AS (SELECT qid, dst FROM (
        SELECT qid, dst,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS lr
        FROM fb WHERE rn <= 10 AND dst NOT IN (SELECT id FROM del))
      WHERE lr <= 5),
    plt AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS h
      FROM pl LEFT JOIN ex ON ex.src = pl.qid AND ex.dst = pl.dst),
    ovt AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
        CAST(COALESCE(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS h
      FROM ov LEFT JOIN ex ON ex.src = ov.qid AND ex.dst = ov.dst),
    stot AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM ex)
    SELECT 'append' AS stage, 'batch' AS metric,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
        WHERE vec_id >= (SELECT t FROM thr)) AS n,
      CAST(NULL AS DOUBLE) AS x
    UNION ALL SELECT 'append', 'new_edges',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ne), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'append', 'new_edge_recall', brr.h,
      CASE WHEN brr.p = 0 THEN 0.0
        ELSE ROUND(CAST(brr.h AS DOUBLE) / CAST(brr.p AS DOUBLE), 6) END
      FROM brr
    UNION ALL SELECT 'append', 'affected_nodes',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM aaff), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'append', 'adopted_nodes',
      CAST(COUNT(DISTINCT src) AS BIGINT),
      CASE WHEN (SELECT COUNT(*) FROM aaff) = 0 THEN 0.0
        ELSE ROUND(CAST(COUNT(DISTINCT src) AS DOUBLE)
          / (SELECT CAST(COUNT(*) AS DOUBLE) FROM aaff), 6) END FROM aad
    UNION ALL SELECT 'append', 'adopted_edges',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM aad), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'deleted_nodes',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM del), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'edges_dropped',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ge) - (SELECT CAST(COUNT(*) AS BIGINT) FROM gl),
      CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'affected_nodes',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM aff), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'promoted_candidates',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM promo), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'repaired_edges',
      (SELECT CAST(COUNT(*) AS BIGINT) FROM rep), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'repair', 'repair_recall', rhit.h,
      CASE WHEN rtot.p = 0 THEN 0.0
        ELSE ROUND(CAST(rhit.h AS DOUBLE) / CAST(rtot.p AS DOUBLE), 6) END
      FROM rhit, rtot
    UNION ALL SELECT 'serve', 'plain', plt.h,
      CASE WHEN stot.p = 0 THEN 0.0
        ELSE ROUND(CAST(plt.h AS DOUBLE) / CAST(stot.p AS DOUBLE), 6) END
      FROM plt, stot
    UNION ALL SELECT 'serve', 'plain_returned',
      (SELECT r FROM plt), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'serve', 'overfetch', ovt.h,
      CASE WHEN stot.p = 0 THEN 0.0
        ELSE ROUND(CAST(ovt.h AS DOUBLE) / CAST(stot.p AS DOUBLE), 6) END
      FROM ovt, stot
    UNION ALL SELECT 'serve', 'overfetch_returned',
      (SELECT r FROM ovt), CAST(NULL AS DOUBLE)
    UNION ALL SELECT 'serve', 'possible',
      (SELECT p FROM stot), CAST(NULL AS DOUBLE)
    ORDER BY stage, metric"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val thr = 4L * (emb.agg(max(col("vec_id"))).head().getLong(0) + 1L) / 5L
      val corpus = emb.where(col("vec_id") < thr)
      val h = graphIdxHandle(s, dir, corpus, graphK = 5, buildRounds = 2,
        tag = "c80")
      graft.pipeline.GraphAnn.graphMaintenanceRun(corpus,
          emb.where(col("vec_id") >= thr), "embedding", "vec_id", h,
          emb.where(col("vec_id") % 9 === 5).select(col("vec_id")),
          "vec_id", queryIds = Seq(1L, 2L, 3L), k = 5, beamWidth = 10,
          hops = 3, appendBeamWidth = 10, appendHops = 3, auditMod = 2L)
        .orderBy(col("stage"), col("metric"))
    })

  // one LEAN hop of the serve walk (no audit CTEs — the s56 kernel):
  // frontier expansion over `und`, exact rescoring, beam cut. The
  // walked adjacency is a parameter because the write-back queries
  // walk the MUTATED graph while the build CTEs still bind `und` to
  // the pre-mutation one.
  private def leanHopSql(h: Int, beam: Int, und: String): String = {
    val bmPrev = if (h == 1) "bm0" else s"bm${h - 1}"
    s"""
    hcd$h AS MATERIALIZED (SELECT qid, dst FROM (
        SELECT b.qid, b.dst FROM $bmPrev b
        UNION
        SELECT b.qid, u.dst FROM $bmPrev b JOIN $und u ON u.src = b.dst)
      WHERE dst <> qid),
    hsc$h AS MATERIALIZED (SELECT c.qid, c.dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
        / (e.nm * q.nm) AS cs
      FROM hcd$h c JOIN nrm e ON e.vec_id = c.dst
                   JOIN nrm q ON q.vec_id = c.qid),
    bm$h AS MATERIALIZED (SELECT qid, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM hsc$h) WHERE rn <= $beam),"""
  }

  // the lean top-k cut shared by the s54/s55/s56 oracles: rank on
  // the RAW cosine (the walk's own total order), display round-6.
  // Opens with a CTE to consume the hop builder's trailing comma.
  private def leanCutSql(lastBeam: String, k: Int): String = s"""
    fcut AS (SELECT qid, dst, cs,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
      FROM $lastBeam)
    SELECT qid AS query_id, dst AS neighbor_id, ROUND(cs, 6) AS cosine,
      CAST(rn AS BIGINT) AS rank
    FROM fcut WHERE rn <= $k ORDER BY query_id, rank"""

  // WRITE-BACK handles (s54/s55): registry- and write-once-cached
  // like graphIdxHandle — the dest dir is keyed by the corpus
  // fingerprint + the full mutation parameters, and
  // graphAppend/RepairWriteBack themselves reuse a COMPLETE matching
  // dest, so repeated invocations (verify, bench reps, a serving
  // session) pay the mutation once and the persist boundary stays
  // invisible to the result's definition.
  private def graphWbAppendHandle(s: SparkSession, dir: String,
      emb: DataFrame, thr: Long): graft.pipeline.GraphIndex.Handle = {
    val corpus = emb.where(col("vec_id") < thr)
    val src = graphIdxHandle(s, dir, corpus, graphK = 5, buildRounds = 2,
      tag = "c80")
    val (cpart, key) = idxKeys(dir, "c80wb|gk5|r2|bw10|h3")
    graft.pipeline.GraphIndex.get(s"graph-$key").getOrElse {
      pruneOrphanIndexDirs("graft-gwbq-", cpart)
      val h = graft.pipeline.GraphAnn.graphAppendWriteBack(corpus,
        emb.where(col("vec_id") >= thr), "embedding", "vec_id", src,
        beamWidth = 10, hops = 3,
        destDir = s"${System.getProperty("java.io.tmpdir")}/graft-gwbq-$key")
      graft.pipeline.GraphIndex.register(s"graph-$key", h)
      h
    }
  }

  private def graphWbRepairHandle(s: SparkSession, dir: String,
      emb: DataFrame): graft.pipeline.GraphIndex.Handle = {
    val src = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
      tag = "full")
    val (cpart, key) = idxKeys(dir, "fullrw|gk10|r3|d9m5")
    graft.pipeline.GraphIndex.get(s"graph-$key").getOrElse {
      pruneOrphanIndexDirs("graft-gwbq-", cpart)
      val h = graft.pipeline.GraphAnn.graphRepairWriteBack(emb,
        "embedding", "vec_id", src,
        emb.where(col("vec_id") % 9 === 5).select(col("vec_id")),
        "vec_id",
        destDir = s"${System.getProperty("java.io.tmpdir")}/graft-gwbq-$key")
      graft.pipeline.GraphIndex.register(s"graph-$key", h)
      h
    }
  }

  // GRAPH APPEND WRITE-BACK (s54) — the r14 verdict's top item: the
  // mutation s48 audits is PERSISTED as a new immutable index
  // version (new dir, meta last — a crash leaves the source
  // serving), and the declared read serves corpus ∪ batch FROM that
  // written-back version with the lean top-k walk. The oracle
  // replays the c80 build, the append search hops, the connect cut,
  // the adoption KEEP lists, the untouched rows, and the serve walk
  // over the mutated adjacency — the persist boundary is invisible
  // to the result's definition. Queries: two corpus members + the
  // first batch id (a new vector must be SERVABLE post-append).
  private val s54 = Q("s54_graph_append_writeback", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    thr AS (SELECT 4 * (MAX(vec_id) + 1) // 5 AS t FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn
      FROM embeddings WHERE vec_id < (SELECT t FROM thr)),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 5) AS t(j)
      WHERE e.vec_id < (SELECT t FROM thr)
        AND j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 2).map(r => s45RoundSql(r)).mkString("")}
    und AS MATERIALIZED (SELECT src, dst FROM n2 UNION SELECT dst, src FROM n2),
    abm0 AS MATERIALIZED (SELECT e.vec_id AS qid, m.mn AS dst
      FROM embeddings e, meta m WHERE e.vec_id >= (SELECT t FROM thr)),
    ${(1 to 3).map(s48HopSql).mkString("")}
    ne AS MATERIALIZED (SELECT qid AS src, dst, cs FROM (
        SELECT qid, dst, cs,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, dst) AS rn
        FROM abm3) WHERE rn <= 5),
    arev AS (SELECT dst AS src, src AS dst, cs FROM ne),
    aaff AS MATERIALIZED (SELECT DISTINCT src FROM arev),
    afe AS (SELECT g.src, g.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM n2 g JOIN aaff ON aaff.src = g.src
        JOIN nrm a ON a.vec_id = g.src JOIN nrm b ON b.vec_id = g.dst),
    akept AS (SELECT src, dst FROM (
        SELECT src, dst,
          ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM (SELECT * FROM afe UNION ALL SELECT * FROM arev))
      WHERE rn <= 5),
    newadj AS MATERIALIZED (
      SELECT src, dst FROM n2 WHERE src NOT IN (SELECT src FROM aaff)
      UNION ALL SELECT src, dst FROM akept
      UNION ALL SELECT src, dst FROM ne),
    wund AS MATERIALIZED (SELECT src, dst FROM newadj
      UNION SELECT dst, src FROM newadj),
    qv AS (SELECT vec_id AS qid FROM embeddings
      WHERE vec_id IN (1, 2) OR vec_id = (SELECT t FROM thr)),
    bm0 AS MATERIALIZED (SELECT q.qid, m.mn AS dst FROM qv q, meta m),
    ${(1 to 3).map(h => leanHopSql(h, beam = 10, und = "wund")).mkString("")}
    ${leanCutSql("bm3", 5)}"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val thr = 4L * (emb.agg(max(col("vec_id"))).head().getLong(0) + 1L) / 5L
      val wb = graphWbAppendHandle(s, dir, emb, thr)
      graft.pipeline.GraphAnn.graphSearchTopK(emb, "embedding", "vec_id",
          wb, queryIds = Seq(1L, 2L, thr), k = 5, beamWidth = 10, hops = 3)
        .orderBy(col("query_id"), col("rank"))
    })

  // GRAPH REPAIR WRITE-BACK (s55) — s51's repaired adjacency
  // PERSISTED over the LIVE corpus (tombstones actually dropped),
  // then served tombstone-free from the new version: the walk runs
  // on the compacted (non-dense) id space with no over-fetch
  // mitigation, the state s52's serve-time workaround exists to
  // reach. Oracle replays the full gk10/r3 build, the drop/lost/
  // promotion sets, the repaired KEEP lists, and the serve walk over
  // the repaired adjacency.
  private val s55 = Q("s55_graph_repair_writeback", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 10) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 3).map(r => s45RoundSql(r, gk = 10)).mkString("")}
    del AS MATERIALIZED (SELECT vec_id AS id FROM embeddings WHERE vec_id % 9 = 5),
    ge AS MATERIALIZED (SELECT src, dst FROM n3),
    gl AS MATERIALIZED (SELECT src, dst FROM ge
      WHERE src NOT IN (SELECT id FROM del) AND dst NOT IN (SELECT id FROM del)),
    lost AS MATERIALIZED (SELECT src, dst AS d FROM ge
      WHERE dst IN (SELECT id FROM del) AND src NOT IN (SELECT id FROM del)),
    aff AS MATERIALIZED (SELECT DISTINCT src FROM lost),
    promo AS MATERIALIZED (SELECT DISTINCT l.src, g2.dst
      FROM lost l JOIN ge g2 ON g2.src = l.d
      WHERE g2.dst NOT IN (SELECT id FROM del) AND g2.dst <> l.src),
    cand AS (SELECT gl.src, gl.dst FROM gl JOIN aff ON aff.src = gl.src
      UNION SELECT src, dst FROM promo),
    rc AS MATERIALIZED (SELECT c.src, c.dst,
        list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nm * b.nm) AS cs
      FROM cand c JOIN nrm a ON a.vec_id = c.src
                  JOIN nrm b ON b.vec_id = c.dst),
    rep AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM rc) WHERE rn <= 10),
    newadj AS MATERIALIZED (
      SELECT src, dst FROM gl WHERE src NOT IN (SELECT src FROM aff)
      UNION ALL SELECT src, dst FROM rep),
    wund AS MATERIALIZED (SELECT src, dst FROM newadj
      UNION SELECT dst, src FROM newadj),
    lmeta AS (SELECT MIN(vec_id) AS mn FROM embeddings WHERE vec_id % 9 <> 5),
    qv AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id IN (1, 2, 3)),
    bm0 AS MATERIALIZED (SELECT q.qid, m.mn AS dst FROM qv q, lmeta m),
    ${(1 to 3).map(h => leanHopSql(h, beam = 16, und = "wund")).mkString("")}
    ${leanCutSql("bm3", 5)}"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val wb = graphWbRepairHandle(s, dir, emb)
      graft.pipeline.GraphAnn.graphSearchTopK(
          emb.where(col("vec_id") % 9 =!= 5), "embedding", "vec_id",
          wb, queryIds = Seq(1L, 2L, 3L), k = 5, beamWidth = 16, hops = 3)
        .orderBy(col("query_id"), col("rank"))
    })

  // GRAPH SEARCH TOP-K (s56) — the LEAN serving read (what the REST
  // index door answers with): the fixed-hop walk against the
  // standing full index, cut to top-k, NO audit legs — the exact leg
  // is the diagnostic reads' cost, not the production read's.
  // Oracle replays the build and the walk; (query_id, neighbor_id,
  // round-6 cosine, rank) is the full answer contract.
  private val s56 = Q("s56_graph_search_topk", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 10) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 3).map(r => s45RoundSql(r, gk = 10)).mkString("")}
    wund AS MATERIALIZED (SELECT src, dst FROM n3 UNION SELECT dst, src FROM n3),
    qv AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id IN (21, 34, 55)),
    bm0 AS MATERIALIZED (SELECT q.qid, m.mn AS dst FROM qv q, meta m),
    ${(1 to 4).map(h => leanHopSql(h, beam = 16, und = "wund")).mkString("")}
    ${leanCutSql("bm4", 5)}"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphSearchTopK(emb, "embedding", "vec_id",
          h, queryIds = Seq(21L, 34L, 55L), k = 5, beamWidth = 16, hops = 4)
        .orderBy(col("query_id"), col("rank"))
    })

  // INDEX-ACCELERATED SEMANTIC DEDUP (d42) — the kNN graph as the
  // near-dup candidate generator: rescore the standing full index's
  // edges (N·graphK pairs — LINEAR; the pair stage that replaces
  // semDedup's per-cell quadratic at scale, since the index already
  // paid for neighbor discovery in its nightly), τ-filter, close,
  // keep = component min id. Oracle replays the gk10/r3 build, the
  // τ-pair cut, and the recursive closure (the d06/m23 reach CTE).
  // NOTE the closure's WITH RECURSIVE is SCOPED to a subquery: a
  // top-level RECURSIVE keyword changes DuckDB's UNION handling
  // inside the (otherwise plain) build CTEs — n3 came back with 5000
  // rows but 724 DISTINCT pairs, duplicates crowding true neighbors
  // out of the top-k cut — so the build runs under a plain WITH and
  // only the reach iteration is recursive.
  private val d42 = Q("d42_graph_semdedup", Some(s"""
    WITH nrm AS MATERIALIZED (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      FROM embeddings),
    meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(vec_id) AS mn FROM embeddings),
    n0 AS MATERIALIZED (SELECT DISTINCT e.vec_id AS src,
        ((e.vec_id - mn + j) % n) + mn AS dst
      FROM embeddings e, meta, generate_series(1, 10) AS t(j)
      WHERE j <= n - 1 AND ((e.vec_id - mn + j) % n) + mn <> e.vec_id),
    ${(1 to 3).map(r => s45RoundSql(r, gk = 10)).mkString("")}
    prs AS MATERIALIZED (SELECT DISTINCT LEAST(g.src, g.dst) AS a,
        GREATEST(g.src, g.dst) AS b
      FROM n3 g JOIN nrm x ON x.vec_id = g.src
                JOIN nrm y ON y.vec_id = g.dst
      WHERE g.src <> g.dst
        AND list_sum(list_transform(generate_series(1, len(x.embedding)),
          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
        / (x.nm * y.nm) >= 0.4),
    comp AS (SELECT u AS vec_id, LEAST(u, MIN(v)) AS rep
      FROM (WITH RECURSIVE
          sym AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
          reach(u, v) AS (SELECT u, v FROM sym
                          UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
        SELECT u, v FROM reach)
      GROUP BY u)
    SELECT e.vec_id, COALESCE(c.rep, e.vec_id) AS rep,
      (COALESCE(c.rep, e.vec_id) = e.vec_id) AS keep
    FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id
    ORDER BY e.vec_id"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      val h = graphIdxHandle(s, dir, emb, graphK = 10, buildRounds = 3,
        tag = "full")
      graft.pipeline.GraphAnn.graphSemDedup(emb, "embedding", "vec_id",
          h, tau = 0.4)
        .orderBy(col("vec_id"))
    })

  // INDEX-MAINTENANCE RUN — the s-family's composed nightly (the t58
  // move): the s35 rebuild verdict, the s40 compaction actions, the
  // s39 bits decision, and the s43 over-fetch audit in ONE manifest
  // from ONE shared assignment scan (old ∪ new under the OLD seeds,
  // origin + dead flags riding). Old = vec_id%7≠6, batch = %7=6,
  // tombstones = %9=5. Oracle replays the seeding, the shared
  // assignment, every rollup, the bits sweep over the live corpus,
  // and the over-fetch legs with the chosen-strategy tie rule.
  private val s46 = Q("s46_index_maintenance_run", Some("""
    WITH cents AS MATERIALIZED (SELECT vec_id AS cell, embedding AS cvec
        FROM embeddings WHERE vec_id % 7 <> 6 ORDER BY vec_id LIMIT 8),
    fullc AS MATERIALIZED (SELECT vec_id, embedding,
        CASE WHEN vec_id % 7 = 6 THEN 1 ELSE 0 END AS isnew,
        CASE WHEN vec_id % 9 = 5 THEN 1 ELSE 0 END AS isdead
      FROM embeddings),
    sims AS (SELECT e.vec_id, c.cell,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM fullc e, cents c),
    asn AS MATERIALIZED (SELECT s.vec_id, s.cell, f.isnew, f.isdead FROM (
        SELECT vec_id, cell,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) s JOIN fullc f ON f.vec_id = s.vec_id WHERE s.rn = 1),
    percell AS MATERIALIZED (SELECT c.cell,
        CAST(COUNT(a.vec_id) AS BIGINT) AS n_total,
        CAST(COALESCE(SUM(a.isnew), 0) AS BIGINT) AS n_new,
        CAST(COALESCE(SUM(a.isdead), 0) AS BIGINT) AS n_dead
      FROM cents c LEFT JOIN asn a ON a.cell = c.cell GROUP BY c.cell),
    reb AS (SELECT CAST(SUM(n_total) AS BIGINT) AS nt,
        CAST(SUM(n_new) AS BIGINT) AS nn,
        CAST(MAX(n_total) AS BIGINT) AS mx,
        MAX(CASE WHEN n_total - n_new > 0
          THEN CAST(n_new AS DOUBLE) / (n_total - n_new) END) AS mg,
        CAST(SUM(CASE WHEN n_total - n_new = 0 AND n_new > 0
          THEN 1 ELSE 0 END) AS BIGINT) AS nu
      FROM percell),
    lv AS (SELECT embedding FROM fullc WHERE isdead = 0),
    ls AS (SELECT * FROM (VALUES (2, 3.0), (4, 15.0), (6, 63.0), (8, 255.0))
        AS t(bits, lev)),
    per AS (SELECT l.bits,
        list_sum(list_transform(e.embedding, x ->
          (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))
          * (CAST(x AS DOUBLE)
            - (GREATEST(0.0, LEAST(l.lev,
                ROUND((CAST(x AS DOUBLE) - (-2.0)) / 4.0 * l.lev))) / l.lev * 4.0 + (-2.0)))))
          AS sq_sum,
        CAST(len(e.embedding) AS BIGINT) AS n
      FROM lv e CROSS JOIN ls l),
    bagg AS (SELECT CAST(bits AS BIGINT) AS bits,
        ROUND(SUM(sq_sum) / CAST(SUM(n) AS DOUBLE), 6) AS mse
      FROM per GROUP BY bits),
    bd AS MATERIALIZED (SELECT bits, mse,
        CAST(CASE WHEN mse <= 0.001 THEN 1 ELSE 0 END AS BIGINT) AS met
      FROM bagg
      ORDER BY met DESC, CASE WHEN mse <= 0.001 THEN bits ELSE -bits END
      LIMIT 1),
    qv AS (SELECT vec_id AS src, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id IN (1, 2, 3)),
    sc AS MATERIALIZED (SELECT q.src, e.vec_id AS dst,
        list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cs,
        e.isdead AS is_dead
      FROM qv q, fullc e WHERE e.vec_id <> q.src),
    f AS MATERIALIZED (SELECT src, dst, is_dead,
        ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
      FROM sc),
    fk AS (SELECT src, dst FROM f WHERE rn <= 10 AND is_dead = 0),
    ofq AS (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY rn) AS rn2
        FROM f WHERE rn <= 20 AND is_dead = 0) WHERE rn2 <= 10),
    ex AS MATERIALIZED (SELECT src, dst FROM (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY cs DESC, dst) AS rn
        FROM sc WHERE is_dead = 0) WHERE rn <= 10),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_possible FROM ex),
    lfk AS (SELECT CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM fk LEFT JOIN ex ON ex.src = fk.src AND ex.dst = fk.dst),
    lof AS (SELECT CAST(SUM(CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM ofq LEFT JOIN ex ON ex.src = ofq.src AND ex.dst = ofq.dst),
    ofl AS MATERIALIZED (
      SELECT 'fetch_k' AS item, n_hits,
        ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6) AS recall
      FROM lfk, tot
      UNION ALL
      SELECT 'overfetch', n_hits,
        ROUND(CAST(n_hits AS DOUBLE) / CAST(n_possible AS DOUBLE), 6)
      FROM lof, tot),
    ofm AS (SELECT MAX(recall) AS best,
        MAX(CASE WHEN item = 'fetch_k' THEN recall END) AS fr FROM ofl)
    SELECT 'rebuild' AS section, 'decision' AS item, nt AS n,
      ROUND(mx * 8.0 / nt, 6) AS x,
      CASE WHEN mx * 8.0 / nt > 1.5 OR CAST(nn AS DOUBLE) / nt > 0.3
        THEN 'rebuild' ELSE 'keep' END AS verdict
    FROM reb
    UNION ALL SELECT 'rebuild', 'new_frac', nn,
      ROUND(CAST(nn AS DOUBLE) / nt, 6), '' FROM reb
    UNION ALL SELECT 'rebuild', 'max_growth', nu, ROUND(mg, 6), '' FROM reb
    UNION ALL SELECT 'compaction', CAST(cell AS VARCHAR), n_total - n_dead,
      CASE WHEN n_total = 0 THEN NULL
        ELSE ROUND(CAST(n_total - n_dead AS DOUBLE) / n_total, 6) END,
      CASE WHEN n_total = 0 THEN 'empty'
        WHEN CAST(n_total - n_dead AS DOUBLE) / n_total < 0.89 THEN 'compact'
        ELSE 'keep' END
    FROM percell
    UNION ALL SELECT 'sq_bits', 'decision', bits, mse,
      CASE WHEN met = 1 THEN 'met' ELSE 'unmet' END FROM bd
    UNION ALL SELECT 'overfetch', item, n_hits, recall,
      CASE WHEN recall = best AND (item = 'fetch_k' OR fr < best)
        THEN 'chosen' ELSE '' END
    FROM ofl, ofm
    ORDER BY section, item"""),
    (s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.pipeline.Clustering.indexMaintenanceRun(
          oldEmb = emb.where(col("vec_id") % 7 =!= 6),
          newEmb = emb.where(col("vec_id") % 7 === 6),
          vecCol = "embedding", idCol = "vec_id", k = 8,
          deletedIds = emb.where(col("vec_id") % 9 === 5)
            .select(col("vec_id")),
          delIdCol = "vec_id", minLiveFrac = 0.89,
          maxImbalance = 1.5, maxNewFrac = 0.3,
          queryIds = Seq(1L, 2L, 3L), kq = 10, fetchFactor = 2,
          lo = -2.0, hi = 2.0, targetMse = 0.001,
          bitsList = Seq(2, 4, 6, 8))
        .orderBy(col("section"), col("item"))
    })

  // REPEAT-EPOCH budget plan (data-constrained scaling): epochs valued
  // at w·0.5^(r−1), the greedy spend is one global sort of candidate
  // epochs + a cumulative-cost cut with an exact-integer partial
  // epoch. Oracle replays the quality means, the candidate ordering,
  // the cut, and the closed-form effective-token arithmetic.
  private val t69 = Q("t69_repeat_epoch_plan", Some("""
    WITH base AS (SELECT source,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS unique_tokens,
        COUNT(*) AS n_docs,
        SUM(CAST(ROUND(
        0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
          + 0.3 * LEAST(
              ((LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' the ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' and ', ' '))) / 4.0
               + (LENGTH(' ' || lower(text) || ' ') - LENGTH(replace(' ' || lower(text) || ' ', ' of ', ' '))) / 3.0)
              / GREATEST(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 10.0, 1.0)
          + 0.2 * (1.0 - LEAST(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) * 10.0, 1.0)), 6) AS DECIMAL(18,6))) AS qsum
      FROM documents GROUP BY source),
    b2 AS (SELECT source, unique_tokens,
        ROUND(CAST(qsum AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS quality_w
      FROM base),
    cands AS (SELECT source, unique_tokens, quality_w, r,
        quality_w * (CASE r WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
          WHEN 3 THEN 0.25 WHEN 4 THEN 0.125 END) AS v
      FROM b2, UNNEST(generate_series(1, 4)) AS g(r)),
    walked AS (SELECT source, unique_tokens, quality_w, r,
        SUM(unique_tokens) OVER (ORDER BY v DESC, source, r
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
      FROM cands),
    w2 AS (SELECT source, unique_tokens, quality_w,
        CASE WHEN cumc <= 40000 THEN 1 ELSE 0 END AS is_full,
        CASE WHEN cumc - unique_tokens < 40000 AND cumc > 40000
          THEN 40000 - (cumc - unique_tokens) ELSE 0 END AS ptoks
      FROM walked),
    per AS (SELECT source, MAX(unique_tokens) AS unique_tokens,
        MAX(quality_w) AS quality_w,
        CAST(SUM(is_full) AS BIGINT) AS epochs_full,
        CAST(SUM(ptoks) AS BIGINT) AS partial_tokens
      FROM w2 GROUP BY source)
    SELECT source, unique_tokens, quality_w, epochs_full, partial_tokens,
      CAST(epochs_full * unique_tokens + partial_tokens AS BIGINT) AS raw_alloc,
      ROUND(CAST(unique_tokens AS DOUBLE) * 2.0
          * (1.0 - (CASE epochs_full WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
              WHEN 2 THEN 0.25 WHEN 3 THEN 0.125 WHEN 4 THEN 0.0625 END))
        + CAST(partial_tokens AS DOUBLE)
          * (CASE epochs_full WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
              WHEN 2 THEN 0.25 WHEN 3 THEN 0.125 WHEN 4 THEN 0.0625 END), 6)
        AS effective_tokens
    FROM per ORDER BY source"""),
    (s, dir) => graft.pipeline.Sampling.repeatEpochPlan(
        T(s, dir, "documents"), "source", "text",
        budget = 40000L, maxEpochs = 4)
      .orderBy(col("source")))

  // ================================================================

  private val defs: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41,
    q42, q43, q44, q45, q46, q47, q48, q49, q50, q51,
    q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65,
    q66, q67, q68, q69, q70, q71,
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14, d15, d16,
    d17, d18, d19, d20, d21, d22, d23, d24, d25, d26, d27, d28, d29, d30, d31, d32, d33, d34, d35, d36, d37, d38, d39, d40, d41, d42,
    s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13, s14, s15,
    s16, s17, s18, s19, s20, s21, s22, s23, s24, s25, s26, s27, s28, s29, s30, s31, s32, s33, s34, s35, s36, s37, s38, s39, s40, s41, s42, s43, s44, s45, s46, s47, s48, s49, s50, s51, s52, s53, s54, s55, s56,
    t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13, t14,
    t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28, t29, t30,
    t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41, t42, t43, t44, t45,
    t46, t47, t48, t49, t50, t51, t52, t53, t54, t55, t56, t57, t58, t59, t60, t61, t62, t63, t64, t65, t66, t67, t68, t69, t70,
    m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12, m13, m14,
    m15, m16, m17, m18, m19, m20, m21, m22, m23, m24, m25, m26, m27, m28, m29, m30, m31)

  private def registerViews(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
