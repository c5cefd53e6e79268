package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `WITH RECURSIVE` support — the one DataFusion-45 SQL construct with
  * no Spark (≤ 4.1) counterpart (SURVEY §2.B "Subqueries & CTE").
  *
  * Executed as a driver-side fixpoint loop over fully distributed
  * iterations, the standard strategy engines without a native
  * RecursionExec use:
  *
  *  - `base UNION ALL step`: seed with base; each iteration binds the
  *    CTE name to the PREVIOUS iteration's rows only (SQL-standard
  *    working-table semantics), appends the step's output, and stops
  *    when an iteration produces no rows.
  *  - `base UNION step`: same, but each iteration's rows are
  *    de-duplicated against everything already produced (`EXCEPT`),
  *    so cyclic graphs terminate (semi-naive evaluation).
  *
  * Each iteration is one Spark job over cached working/accumulator
  * frames; the recursion depth is bounded by `maxIterations` (the
  * reference engine's guard is its own recursion limit). The working
  * table is re-registered per iteration as a session temp view under
  * the CTE's name, shadowing like a real CTE would.
  *
  * Grammar handled (same shape DataFusion/DuckDB accept):
  * {{{
  *   WITH RECURSIVE name [(col, …)] AS ( base UNION [ALL] step )
  *   [, more_ctes…] SELECT …
  * }}}
  * Additional non-recursive CTEs after the recursive one are passed
  * through to Spark as a plain WITH over the materialized result.
  */
object RecursiveCte {

  private val Start = """(?is)^\s*WITH\s+RECURSIVE\s+""".r

  def isRecursive(sql: String): Boolean = Start.findFirstIn(sql).isDefined

  /** Number of iterations after which execution aborts (runaway
    * recursion guard).
    */
  val defaultMaxIterations = 1000

  /** Working sets at or under this row count iterate as driver-local
    * LocalRelations instead of cached cluster frames (see the hybrid
    * strategy note in [[execute]]).
    */
  val localRowThreshold = 10000

  /** Execute, reporting the internally cached accumulator frame to
    * `onCached` so the caller can release it from the shared
    * CacheManager when its session ends (the returned tail frame is
    * NOT the cached one whenever the statement has a final SELECT).
    */
  def execute(spark: SparkSession, sql: String,
      maxIterations: Int = defaultMaxIterations,
      onCached: DataFrame => Unit = _ => ()): DataFrame = {
    val m = Start.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException("not a WITH RECURSIVE statement"))
    var rest = sql.substring(m.end)
    // name [(cols)]
    val NameCols = """(?s)^([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*""".r
    val nm = NameCols.findFirstMatchIn(rest).getOrElse(
      throw new IllegalArgumentException("WITH RECURSIVE: expected cte name"))
    val name = nm.group(1)
    val cols: Option[Seq[String]] =
      Option(nm.group(3)).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    rest = rest.substring(nm.end)
    val AsOpen = """(?is)^AS\s*\(""".r
    val as = AsOpen.findFirstMatchIn(rest).getOrElse(
      throw new IllegalArgumentException("WITH RECURSIVE: expected AS ("))
    val bodyStart = as.end - 1
    val bodyEnd = SqlRewrite.findBalancedClose(rest, bodyStart)
    if (bodyEnd < 0)
      throw new IllegalArgumentException("WITH RECURSIVE: unbalanced body")
    val body = rest.substring(bodyStart + 1, bodyEnd)
    val tail0 = rest.substring(bodyEnd + 1).trim
    // remaining CTEs (", other AS (…)") become a plain WITH
    val tail =
      if (tail0.startsWith(",")) "WITH " + tail0.substring(1).trim
      else tail0
    // split the body on the FIRST top-level UNION [ALL]
    val (base, step, unionAll) = splitUnion(body).getOrElse(
      throw new IllegalArgumentException(
        "WITH RECURSIVE: body must be 'base UNION [ALL] step'"))

    def named(df: DataFrame): DataFrame =
      cols.map(cs => df.toDF(cs: _*)).getOrElse(df)

    val run: String => DataFrame = s => spark.sql(SqlRewrite.rewrite(s))

    // a CTE shadows same-named tables only WITHIN its statement: if
    // the session already has a temp view under this name, capture it
    // for restoration afterwards (dropping it outright would delete
    // the user's table)
    val priorView: Option[DataFrame] =
      if (spark.catalog.tableExists(name) &&
          (try spark.catalog.getTable(name).isTemporary catch { case _: Throwable => false }))
        Some(spark.table(name))
      else None

    // Hybrid working-set strategy. Most real recursions (hierarchies,
    // series, path expansion) carry a SMALL working table — for those,
    // a fully distributed iteration pays ~0.5-1 s of cache/count job
    // overhead PER STEP for a handful of rows. When an iteration's
    // result fits under `localRowThreshold`, it is collected and
    // re-registered as a LocalRelation: Catalyst's
    // ConvertToLocalRelation then folds pure project/filter steps at
    // optimization time (zero jobs), and steps that join big tables
    // still distribute — the big side streams against a local
    // broadcast-sized working set, which is exactly the plan a native
    // RecursionExec would pick. Iterations above the threshold fall
    // back to the cached distributed path unchanged, so genuinely
    // large recursions keep cluster semantics.
    // Each piece keeps ITS OWN schema (the step may legitimately
    // widen types vs the base — int + bigint, growing decimals — and
    // the union's analyzer coercion reconciles them exactly as the
    // all-distributed path did).
    // ≤ threshold → Left(all rows): the limit(n+1) probe returning
    // ≤ n rows proves completeness. Otherwise Right(cached, count) —
    // the probe's partial scan is the price of not knowing sizes in
    // advance, paid only by large iterations. `localBudget` bounds
    // TOTAL driver-resident rows across the recursion: once spent,
    // later iterations go distributed even when individually small,
    // so a long recursion cannot accumulate unbounded collected rows
    // on the driver.
    var localBudget = localRowThreshold.toLong * 10
    def materialize(df: DataFrame)
        : Either[Array[org.apache.spark.sql.Row], (DataFrame, Long)] =
      if (localBudget <= 0) { val c = df.cache(); Right((c, c.count())) }
      else {
        val probe = df.limit(localRowThreshold + 1).collect()
        if (probe.length <= localRowThreshold) {
          localBudget -= probe.length
          Left(probe)
        } else { val c = df.cache(); Right((c, c.count())) }
      }
    var pieces = Vector.empty[DataFrame]       // accumulator (local + cached)
    var cachedPieces = Vector.empty[DataFrame] // the subset to unpersist
    var sawDistributed = false
    def accumulated: DataFrame = pieces.reduce(_ unionAll _)
    var workingRows = 0L
    var workingDF: DataFrame = null
    def bindIteration(df: DataFrame): Unit = materialize(df) match {
      case Left(rows) =>
        workingRows = rows.length
        workingDF = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), df.schema)
      case Right((c, n)) =>
        workingRows = n
        workingDF = c
        cachedPieces :+= c
        sawDistributed = true
    }
    bindIteration {
      var b = named(run(base))
      if (!unionAll) b = b.distinct()
      b
    }
    pieces :+= workingDF // keep the base even when empty (schema carrier)
    var iters = 0
    while (workingRows > 0 && iters < maxIterations) {
      workingDF.createOrReplaceTempView(name)
      var next = named(run(step))
      if (!unionAll) next = next.distinct().exceptAll(accumulated)
      bindIteration(next)
      if (workingRows > 0) pieces :+= workingDF
      iters += 1
    }
    if (iters >= maxIterations && workingRows > 0) {
      // release every piece before aborting — a cyclic recursion must
      // not strand up to maxIterations cached frames in the shared
      // CacheManager (onCached never runs on this path)
      cachedPieces.foreach(p => try p.unpersist() catch { case _: Throwable => () })
      throw new IllegalStateException(
        s"WITH RECURSIVE $name exceeded $maxIterations iterations")
    }
    // fold the pieces into ONE result frame. All-local recursions stay
    // a driver-resident LocalRelation union — nothing cached, nothing
    // to release. Any distributed piece → one cached materialization.
    val result =
      if (pieces.size == 1) pieces.head
      else if (!sawDistributed) accumulated
      else {
        val acc = accumulated.cache()
        acc.count()
        cachedPieces.foreach(_.unpersist())
        cachedPieces = Vector.empty
        acc
      }
    // all-local results are driver-resident, nothing for the caller
    // to release
    if (sawDistributed) onCached(result)
    result.createOrReplaceTempView(name)
    // spark.sql analyzes eagerly, so the binding can be undone right
    // after the tail resolves — a CTE must not outlive its statement:
    // restore the shadowed view, or drop ours if none existed
    val out = if (tail.isEmpty) result else run(tail)
    priorView match {
      case Some(df0) => df0.createOrReplaceTempView(name)
      case None => spark.catalog.dropTempView(name): Unit
    }
    out
  }

  /** Split on the LAST top-level UNION [ALL] (quote/paren aware):
    * the SQL grammar is `<non-recursive term> UNION [ALL]
    * <recursive term>` where the non-recursive term may itself be a
    * union of several seed branches. Returns (base, step, isUnionAll).
    */
  private def splitUnion(body: String): Option[(String, String, Boolean)] = {
    var at = -1
    var from = 0
    var found = SqlRewrite.findTopLevelKeyword(body, "UNION")
    while (found >= 0) {
      at = from + found
      from = at + "UNION".length
      found = SqlRewrite.findTopLevelKeyword(body.substring(from), "UNION")
    }
    if (at < 0) return None
    val base = body.substring(0, at)
    var after = body.substring(at + "UNION".length)
    val All = """(?is)^\s*ALL\b""".r
    val isAll = All.findFirstMatchIn(after) match {
      case Some(a) => after = after.substring(a.end); true
      case None => false
    }
    Some((base, after, isAll))
  }
}
