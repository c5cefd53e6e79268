package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mem-table DDL: `CREATE [OR REPLACE] TABLE name AS SELECT …` and
  * `DROP TABLE [IF EXISTS] name` executed against the session's
  * in-memory catalog — DataFusion's CTAS/DROP create and drop
  * registered memory tables (SURVEY §2.B "Other statements"); Spark's
  * own CTAS would write warehouse files instead, so the session layer
  * materializes the query and binds a temp view, symmetric with
  * [[InsertInto]].
  *
  * Plain `CREATE TABLE (schema)` DDL and catalog-backed statements
  * fall through to `spark.sql` untouched.
  */
object MemDdl {

  private val Ctas =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(SELECT\b.*|VALUES\b.*|WITH\b.*|\(.*)$""".r
  private val Drop =
    """(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r

  def isCtas(sql: String): Boolean = Ctas.findFirstMatchIn(sql).isDefined
  def isDrop(sql: String): Boolean = Drop.findFirstMatchIn(sql).isDefined

  /** Handle a DROP only for temp views (or IF EXISTS on an absent
    * name); a catalog table's DROP falls through to `spark.sql`.
    */
  def appliesToDrop(spark: SparkSession, sql: String): Boolean =
    Drop.findFirstMatchIn(sql) match {
      case Some(m) =>
        val table = m.group(2)
        InsertInto.isTempView(spark, table) ||
          (m.group(1) != null && !spark.catalog.tableExists(table))
      case None => false
    }

  /** CTAS: evaluate, materialize, bind the view. Reports the cached
    * state via `onNewState` (cache-lifecycle tracking, like
    * InsertInto). Returns the created row count as a one-row frame.
    */
  def createTableAs(spark: SparkSession, sql: String,
      onNewState: (String, DataFrame) => Unit = (_, _) => ()): DataFrame = {
    val m = Ctas.findFirstMatchIn(sql).get
    val orReplace = m.group(1) != null
    val table = m.group(2)
    val select = m.group(3)
    if (!orReplace && spark.catalog.tableExists(table))
      throw new IllegalArgumentException(s"CREATE TABLE: table exists: $table")
    val df = spark.sql(SqlRewrite.rewrite(select)).cache()
    val n = df.count()
    df.createOrReplaceTempView(table)
    onNewState(table, df)
    InsertInto.countFrame(spark, n)
  }

  /** DROP TABLE against the temp-view catalog. Returns an empty
    * status frame; `onDropped` lets the caller release tracked
    * caches and data-source records.
    */
  def dropTable(spark: SparkSession, sql: String,
      onDropped: String => Unit = _ => ()): DataFrame = {
    val m = Drop.findFirstMatchIn(sql).get
    val ifExists = m.group(1) != null
    val table = m.group(2)
    val existed = spark.catalog.dropTempView(table)
    if (!existed && !ifExists)
      throw new IllegalArgumentException(s"DROP TABLE: no such table: $table")
    if (existed) onDropped(table)
    spark.emptyDataFrame
  }
}
