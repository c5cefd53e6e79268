package graft.ingest

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileStream}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import scala.jdk.CollectionConverters._

/** Avro container-file scan (SURVEY §2.A7; reference registers Avro
  * listing tables at `object_store/reader.rs:115-134`).
  *
  * The distribution module `spark-avro` is not on this classpath, so
  * this reader is built directly on Avro core (which is): the schema
  * comes from one file's header on the driver; decoding runs
  * executor-side over `sc.binaryFiles`, one task per file — the same
  * per-file parallelism `spark-avro` has for non-splittable reads.
  * (Avro blocks are further splittable; at 100 TB you'd add block
  * offsets to the task spec — out of scope for a fixture-sized path.)
  */
object AvroReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = stripScheme(path)
    val first = firstAvroFile(p)
    val avroSchema = {
      val r = new DataFileReader[GenericRecord](new File(first),
        new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val sparkSchema = toStructType(avroSchema)
    val schemaJson = avroSchema.toString // Schema isn't serializable-friendly; ship JSON
    val scanPath = if (new File(p).isDirectory) s"$p/*.avro" else p
    val rows = spark.sparkContext.binaryFiles(scanPath).flatMap { case (_, pds) =>
      val sch = new Schema.Parser().parse(schemaJson)
      val in = pds.open()
      val reader = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord](sch))
      val it = reader.iterator().asScala.map(rec => toRow(rec, sch))
      // materialize per-file (files are block-bounded); closes the stream
      val out = it.toVector
      reader.close()
      out
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  private def firstAvroFile(p: String): String = {
    val f = new File(p)
    if (f.isFile) p
    else f.listFiles().filter(_.getName.endsWith(".avro")).map(_.getPath).sorted.headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $p"))
  }

  /** Avro schema → Spark schema (nullable via union-with-null). */
  def toStructType(s: Schema): StructType = StructType(
    s.getFields.asScala.map { f =>
      val (dt, nullable) = toDataType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)

  private def toDataType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = toDataType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toDataType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD => (toStructType(s), false)
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      val hadNull = nonNull.size < s.getTypes.size()
      nonNull.toSeq match {
        case Seq(one) => val (dt, _) = toDataType(one); (dt, hadNull)
        case _ => (StringType, true) // mixed unions: stringify (divergence doc'd)
      }
    case Schema.Type.NULL => (NullType, true)
  }

  private def toRow(rec: GenericRecord, s: Schema): Row =
    Row.fromSeq(s.getFields.asScala.map(f => convert(rec.get(f.pos()), f.schema())).toSeq)

  private[graft] def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (nonNull.size == 1) convert(v, nonNull.head) else String.valueOf(v)
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        // copy only [position, limit) — Avro reuses/over-allocates the
        // backing array, so array().clone() could include stale tail bytes
        val b = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](b.remaining())
        b.duplicate().get(out)
        out
      case Schema.Type.FIXED => v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> convert(mv, s.getValueType)
        }.toMap
      case Schema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case _ => v
    }
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file://")) p.substring("file://".length) else p
}
