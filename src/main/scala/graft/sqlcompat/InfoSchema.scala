package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** `information_schema` compatibility (SURVEY §2.B "Scans": DataFusion
  * exposes information_schema.{tables,columns}).
  *
  * Spark has no information_schema catalog; queries referencing it
  * are rewritten to session temp views (`__info_tables`,
  * `__info_columns`) materialized from `spark.catalog` at query time
  * — driver-side metadata, a few rows, rebuilt per query so DDL
  * (CTAS/DROP/registration) is always reflected.
  */
object InfoSchema {

  private val TablesRef = """(?i)\binformation_schema\s*\.\s*tables\b""".r
  private val ColumnsRef = """(?i)\binformation_schema\s*\.\s*columns\b""".r

  def references(sql: String): Boolean =
    TablesRef.findFirstIn(sql).isDefined || ColumnsRef.findFirstIn(sql).isDefined

  /** Register the synthetic views and return the rewritten SQL. */
  def prepare(spark: SparkSession, sql: String): String = {
    import scala.jdk.CollectionConverters._
    // the helper views themselves must not appear in the catalog they
    // present (a second query would otherwise list __info_* rows)
    val tables = spark.catalog.listTables().collect()
      .filterNot(_.name.startsWith("__info_"))
    val tRows: java.util.List[Row] = tables.toSeq.map { t =>
      Row("spark_catalog", Option(t.database).getOrElse("session"), t.name,
        if (t.isTemporary) "VIEW" else t.tableType)
    }.asJava
    val tSchema = StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType)))
    spark.createDataFrame(tRows, tSchema).createOrReplaceTempView("__info_tables")

    if (ColumnsRef.findFirstIn(sql).isDefined) {
      val cRows: java.util.List[Row] = tables.toSeq.flatMap { t =>
        try spark.catalog.listColumns(t.name).collect().toSeq.zipWithIndex.map {
          case (c, i) =>
            Row(t.name, c.name, i + 1, c.dataType,
              if (c.nullable) "YES" else "NO")
        } catch { case _: Throwable => Seq.empty[Row] }
      }.asJava
      val cSchema = StructType(Seq(
        StructField("table_name", StringType),
        StructField("column_name", StringType),
        StructField("ordinal_position", IntegerType),
        StructField("data_type", StringType),
        StructField("is_nullable", StringType)))
      spark.createDataFrame(cRows, cSchema).createOrReplaceTempView("__info_columns")
    }
    ColumnsRef.replaceAllIn(
      TablesRef.replaceAllIn(sql, "__info_tables"), "__info_columns")
  }
}
