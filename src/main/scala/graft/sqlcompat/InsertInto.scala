package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** `INSERT INTO <mem table>` support.
  *
  * DataFusion executes INSERT against registered memory tables
  * (SURVEY §2.B "Other statements"); Spark temp views are read-only,
  * so the session layer implements the append: evaluate the source
  * (VALUES or SELECT), align it to the target schema, union, cache
  * the new table state, and re-register the view — the same
  * materialize-and-rebind move the merge processors use. Returns the
  * inserted row count as a one-row frame (`count`), like the
  * reference engine.
  *
  * Alignment follows DataFusion:
  *  - no column list → positional, arity must match, values are cast
  *    to the target column types;
  *  - with a column list → named; unlisted target columns get NULL.
  */
object InsertInto {

  private val Pattern =
    """(?is)^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*(VALUES\b.*|SELECT\b.*|\(\s*SELECT\b.*)$""".r

  def isInsert(sql: String): Boolean =
    """(?is)^\s*INSERT\s+INTO\s""".r.findFirstIn(sql).isDefined

  /** True only when this layer should handle the statement: the
    * simple-identifier form AND the target is a session temp view (a
    * "mem table"). Qualified/backticked names, `INSERT INTO TABLE`,
    * and catalog tables fall through to `spark.sql`, which either
    * performs a real catalog insert or raises its own error —
    * intercepting those would shadow a warehouse table with a
    * session-local view.
    */
  def appliesTo(spark: SparkSession, sql: String): Boolean =
    Pattern.findFirstMatchIn(sql) match {
      case Some(m) => isTempView(spark, m.group(1))
      case None => false
    }

  private[sqlcompat] def isTempView(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name) &&
      (try spark.catalog.getTable(name).isTemporary catch { case _: Throwable => false })

  /** Execute; `onNewState(table, cachedFrame)` reports the cached
    * post-insert table state so the caller can release the previous
    * state's cache and track this one.
    */
  def execute(spark: SparkSession, sql: String,
      onNewState: (String, DataFrame) => Unit = (_, _) => ()): DataFrame = {
    val m = Pattern.findFirstMatchIn(sql).getOrElse(throw new IllegalArgumentException(
      "INSERT INTO: expected `INSERT INTO table [(cols)] VALUES ... | SELECT ...`"))
    val table = m.group(1)
    val colList = Option(m.group(3))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val sourceSql = m.group(4)
    require(spark.catalog.tableExists(table), s"INSERT INTO: no such table: $table")
    val target = spark.table(table)
    val src = spark.sql(SqlRewrite.rewrite(sourceSql)).cache()
    try {
      val n = src.count()
      val aligned: DataFrame = colList match {
        case None =>
          require(src.columns.length == target.columns.length,
            s"INSERT INTO $table: ${src.columns.length} values for " +
              s"${target.columns.length} columns")
          // positional with coercion to the target types
          val casted = target.schema.fields.zip(src.columns).map { case (f, c) =>
            col(c).cast(f.dataType).as(f.name)
          }
          src.select(casted.toIndexedSeq: _*)
        case Some(cols) =>
          require(src.columns.length == cols.length,
            s"INSERT INTO $table: ${src.columns.length} values for ${cols.length} columns")
          val bad = cols.filterNot(c => target.columns.exists(_.equalsIgnoreCase(c)))
          require(bad.isEmpty, s"INSERT INTO $table: unknown columns ${bad.mkString(", ")}")
          require(cols.map(_.toLowerCase).distinct.length == cols.length,
            s"INSERT INTO $table: duplicate columns in insert list")
          val byName = cols.map(_.toLowerCase).zip(src.columns).toMap
          val full = target.schema.fields.map { f =>
            byName.get(f.name.toLowerCase) match {
              case Some(srcCol) => col(srcCol).cast(f.dataType).as(f.name)
              case None => lit(null).cast(f.dataType).as(f.name)
            }
          }
          src.select(full.toIndexedSeq: _*)
      }
      val appended = target.unionAll(aligned).cache()
      appended.count() // materialize BEFORE dropping the src cache
      appended.createOrReplaceTempView(table)
      onNewState(table, appended)
      countFrame(spark, n)
    } finally src.unpersist(): Unit
  }

  /** One-row {count: n} result, the reference engine's DML reply. */
  private[sqlcompat] def countFrame(spark: SparkSession, n: Long): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(n)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("count",
          org.apache.spark.sql.types.LongType, nullable = false))))
}
