package org.apache.spark.sql.graftbridge

import java.io.OutputStream

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils

/** Access point into Spark's `private[sql]` Arrow machinery — lives
  * under `org.apache.spark.sql` so `ArrowWriter` / `ArrowUtils` are
  * visible. This is the Spark analogue of the reference's Arrow IPC
  * response encoder (`lib/src/response/format/arrow_stream.rs:7-19`):
  * identical wire format (Arrow IPC stream: schema message + batch
  * messages), produced by Spark's own row→vector writers rather than
  * a hand-rolled converter.
  */
object ArrowBridge {

  /** Write `df`'s result as an Arrow IPC stream. Incremental: pulls
    * the plan's InternalRow iterator batch-at-a-time (the
    * `execute_stream` analogue, `session_manager.rs:717-726`), so
    * memory is bounded by `batchRows`, not the result size.
    *
    * Returns the row count.
    */
  def writeIpcStream(df: DataFrame, out: OutputStream, batchRows: Int = 1024,
      buffered: Boolean = false): Long = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val schema = ds.schema
    val tz = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator(s"graft-ipc-${System.nanoTime()}", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    var n = 0L
    try {
      val arrowWriter = ArrowWriter.create(root)
      val streamWriter = new ArrowStreamWriter(root, null, out)
      streamWriter.start()
      val rows: Iterator[InternalRow] =
        if (buffered) ds.queryExecution.executedPlan.executeCollect().iterator
        else ds.queryExecution.executedPlan.executeToIterator()
      var inBatch = 0
      rows.foreach { r =>
        arrowWriter.write(r)
        inBatch += 1
        n += 1
        if (inBatch >= batchRows) {
          arrowWriter.finish()
          streamWriter.writeBatch()
          arrowWriter.reset()
          inBatch = 0
        }
      }
      if (inBatch > 0 || n == 0) { // always emit ≥1 batch (schema-only ok)
        arrowWriter.finish()
        streamWriter.writeBatch()
        arrowWriter.reset()
      }
      streamWriter.end()
      n
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Streaming InternalRow iterator (driver-incremental). */
  def rowIterator(df: DataFrame): Iterator[InternalRow] =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.executeToIterator()
}

/** Column ⇄ Expression bridge (`ExpressionUtils` is private[sql]). */
object ExprBridge {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
