package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Delta Lake scan with time travel, via direct `_delta_log` replay
  * (SURVEY §2.A8; reference `lib/src/data_source/deltalake.rs:29-96`,
  * time travel by `options.version` at :73).
  *
  * delta-spark jars are not on this classpath, but the Delta
  * transaction-log format is an open spec (one JSON action per line:
  * protocol / metaData / add / remove / commitInfo), so replay is:
  * start from the newest checkpoint parquet at or below the target
  * version (if any), then apply later JSON commits in order, folding
  * add/remove paths; read the surviving parquet files with the
  * metaData schema. Single-part `NNN.checkpoint.parquet` checkpoints
  * are supported; multi-part checkpoints are not (rejected clearly).
  *
  * Scale note: the log replay is driver-side (tiny JSON files); data
  * files are read by Spark's vectorized parquet scan with full
  * pushdown — partitionValues become literal columns, so partition
  * pruning happens naturally through Catalyst filters.
  */
object DeltaReader {

  private val mapper = new ObjectMapper()

  final case class DeltaState(
      version: Long,
      schema: Option[StructType],
      partitionColumns: Seq[String],
      files: Map[String, Map[String, String]]) // path -> partitionValues

  /** Replay the log at `tablePath` up to `versionAsOf` (inclusive;
    * None = latest). `spark` reads checkpoint parquet when present.
    */
  def replay(spark: SparkSession, tablePath: String, versionAsOf: Option[Long]): DeltaState = {
    val logDir = Paths.get(stripScheme(tablePath), "_delta_log")
    require(Files.isDirectory(logDir), s"not a delta table (no _delta_log): $tablePath")
    val logNames = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    val commits = logNames
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(n => n.stripSuffix(".json").toLong -> n)
      .sortBy(_._1)
    require(logNames.forall(!_.matches("""\d+\.checkpoint\.\d+\.\d+\.parquet""")),
      s"multi-part delta checkpoints not supported: $tablePath")
    val checkpoints = logNames
      .filter(_.matches("""\d+\.checkpoint\.parquet"""))
      .map(n => n.split('.').head.toLong -> n)
      .sortBy(_._1)
    require(commits.nonEmpty || checkpoints.nonEmpty, s"empty delta log: $tablePath")
    val latest = (commits.map(_._1) ++ checkpoints.map(_._1)).max
    val upTo = versionAsOf.getOrElse(latest)
    require(commits.exists(_._1 == upTo) || checkpoints.exists(_._1 == upTo),
      s"version $upTo not in log (have ${(commits.map(_._1) ++ checkpoints.map(_._1)).distinct.sorted})")

    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    var files = Map.empty[String, Map[String, String]]
    // seed from the newest checkpoint ≤ upTo, then apply later commits
    val cp = checkpoints.filter(_._1 <= upTo).lastOption
    cp.foreach { case (_, name) =>
      val rows = spark.read.parquet(logDir.resolve(name).toString)
      val cols = rows.columns.toSet
      if (cols.contains("metaData"))
        rows.select("metaData.schemaString", "metaData.partitionColumns")
          .collect().filter(r => !r.isNullAt(0)).foreach { r =>
            schema = Some(DataType.fromJson(r.getString(0)).asInstanceOf[StructType])
            partCols = Option(r.getSeq[String](1)).getOrElse(Nil)
          }
      if (cols.contains("add"))
        rows.select("add.path", "add.partitionValues")
          .collect().filter(r => !r.isNullAt(0)).foreach { r =>
            val pv = Option(r.getMap[String, String](1)).map(_.toMap)
              .getOrElse(Map.empty[String, String])
            files += r.getString(0) -> pv
          }
      if (cols.contains("remove"))
        rows.select("remove.path").collect().filter(r => !r.isNullAt(0))
          .foreach(r => files -= r.getString(0))
    }
    val fromVersion = cp.map(_._1).getOrElse(-1L)
    commits.filter(c => c._1 > fromVersion && c._1 <= upTo).foreach { case (_, name) =>
      Files.readAllLines(logDir.resolve(name)).asScala.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) {
          val md = n.get("metaData")
          schema = Some(DataType.fromJson(md.get("schemaString").asText()).asInstanceOf[StructType])
          partCols = Option(md.get("partitionColumns"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        }
        if (n.has("add")) {
          val a = n.get("add")
          val pv = Option(a.get("partitionValues"))
            .map(_.properties().asScala.map { e =>
              // NullNode.asText() is the string "null" — preserve SQL NULL
              e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
            }.toMap)
            .getOrElse(Map.empty[String, String])
          files += a.get("path").asText() -> pv
        }
        if (n.has("remove"))
          files -= n.get("remove").get("path").asText()
      }
    }
    DeltaState(upTo, schema, partCols, files)
  }

  /** Read the table as a DataFrame, optionally at a past version. */
  def read(spark: SparkSession, tablePath: String, versionAsOf: Option[Long] = None): DataFrame = {
    val st = replay(spark, tablePath, versionAsOf)
    val base = stripScheme(tablePath)
    val schema = st.schema.getOrElse(
      throw new IllegalStateException(s"delta log has no metaData: $tablePath"))
    val dataSchema = StructType(schema.filterNot(f => st.partitionColumns.contains(f.name)))
    if (st.files.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // group files by partition values so each group can carry its
    // partition columns as literals (pruned by Catalyst as constants)
    val groups = st.files.groupBy(_._2).toSeq
    val dfs = groups.map { case (pv, fs) =>
      val paths = fs.keys.map(p => s"$base/$p").toSeq
      val df = spark.read.schema(dataSchema).parquet(paths: _*)
      st.partitionColumns.foldLeft(df) { (d, pc) =>
        val f = schema(pc)
        d.withColumn(pc, lit(pv.get(pc).orNull).cast(f.dataType))
      }
    }
    dfs.reduce(_ unionByName _).select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file://")) p.substring("file://".length) else p
}
