package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sqlcompat.SqlRewrite

/** `table@namespace` federation (SURVEY §2.A10-A11).
  *
  * The reference pre-parses SQL, finds `FROM table@namespace` factors
  * and lazily registers an external-DB provider for each
  * (`lib/src/data_source/database/table_register.rs:19-75`, split on
  * `@` at :49-54), with per-namespace schema caching
  * (`table_resolver.rs:39-66`).
  *
  * Spark mapping: a [[NamespaceResolver]] turns (table, namespace)
  * into a DataFrame — JDBC-backed in production (Spark's JDBC source
  * already pushes projection/filter/limit, strictly safer than the
  * reference's stringified-expression pushdown, SURVEY §4.1) — which
  * is registered as a temp view under the mangled name
  * `table__at__ns` (Spark validates temp-view identifiers, so the
  * raw `t@ns` is not registrable). The SQL is rewritten by
  * [[SqlRewrite.rewriteFederatedNames]] to the same mangled name, so
  * `SELECT * FROM users@pg JOIN local ...` works verbatim.
  */
object Federation {

  trait NamespaceResolver {
    /** Produce the remote table as a (lazy) DataFrame. */
    def resolve(spark: SparkSession, table: String, namespace: String): DataFrame
  }

  /** JDBC-backed resolver — the production analogue of the
    * reference's Postgres/MySQL `TableProvider`
    * (`database/table_provider.rs:67-170`). Projection/filter/limit
    * pushdown come from Spark's JDBC source.
    */
  final class JdbcResolver(urls: Map[String, String],
      props: Map[String, java.util.Properties] = Map.empty) extends NamespaceResolver {
    def resolve(spark: SparkSession, table: String, namespace: String): DataFrame = {
      val url = urls.getOrElse(namespace,
        throw new IllegalArgumentException(s"unknown namespace: $namespace"))
      spark.read.jdbc(url, table, props.getOrElse(namespace, new java.util.Properties()))
    }
  }

  /** Directory-backed resolver (namespace → directory of
    * parquet/csv files). Used for tests and file-based "databases".
    */
  final class DirectoryResolver(dirs: Map[String, String]) extends NamespaceResolver {
    def resolve(spark: SparkSession, table: String, namespace: String): DataFrame = {
      val dir = dirs.getOrElse(namespace,
        throw new IllegalArgumentException(s"unknown namespace: $namespace"))
      val pq = new java.io.File(s"$dir/$table.parquet")
      val csv = new java.io.File(s"$dir/$table.csv")
      if (pq.exists()) spark.read.parquet(pq.getPath)
      else if (csv.exists()) spark.read.option("header", true)
        .option("inferSchema", true).csv(csv.getPath)
      else throw new IllegalArgumentException(s"no such table $table in namespace $namespace")
    }
  }

  /** Identifier pattern: reuse the rewrite's notion of a federated
    * name (word@word outside quotes/comments).
    */
  private val Ref = """([A-Za-z_][A-Za-z0-9_]*)@([A-Za-z_][A-Za-z0-9_]*)""".r

  /** Find `table@ns` references in code runs of the SQL. */
  def findRefs(sql: String): Seq[(String, String)] =
    SqlRewrite.runs(sql).collect { case (t, true) => t }
      .flatMap(t => Ref.findAllMatchIn(t).map(m => (m.group(1), m.group(2))))
      .distinct

  /** The pre-pass: register every referenced remote table (schema
    * cached per session by the temp-view itself — second reference
    * reuses the registered view) and return the rewritten SQL.
    */
  def prepare(h: SessionHandle, sql: String, resolver: NamespaceResolver): String = {
    findRefs(sql).foreach { case (table, ns) =>
      val viewName = SqlRewrite.mangledName(table, ns)
      if (!h.spark.catalog.tableExists(viewName)) {
        resolver.resolve(h.spark, table, ns).createOrReplaceTempView(viewName)
        h.dataSources.put(s"$table@$ns",
          DataSourceDef(s"$table@$ns", "federated", Some(s"$ns:$table"), None))
      }
    }
    SqlRewrite.rewrite(sql)
  }
}
