package graft.flight

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.arrow.flight._
import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ArrowBridge

import graft.engine.{DataSourceDef, SessionManager}

/** Arrow Flight gRPC endpoint (SURVEY §2.A22) + client scan (A9) —
  * behavioral parity with the reference's Flight service
  * (`/root/reference/lib/src/server/flight.rs:46-395`) re-expressed
  * over the session manager and the graftbridge Arrow machinery.
  *
  * COMPILED OUT BY DEFAULT: `org.apache.arrow:flight-core` (and its
  * gRPC/protobuf closure) is not in the Spark distribution and cannot
  * be resolved in this zero-egress build — see FLIGHT_BLOCKER.md for
  * the reproducible resolution failure. Activate with
  * `sbt -Dgraft.flight=true` once the jars are present; everything
  * this file depends on from the rest of the codebase
  * (`ArrowBridge.foreachArrowBatch` / `readIpcBytes` /
  * `toArrowSchema`, `SessionManager.sql`) compiles and is spec-tested
  * in the default build.
  *
  * Protocol (identical to the reference):
  *  - descriptor/ticket values are `"{session_id}/{value}"`; a value
  *    containing whitespace is a SQL statement, otherwise it is a
  *    table name queried as `SELECT * FROM <value>`
  *    (`flight.rs:224-231`).
  *  - `get_flight_info` answers the plan schema plus one endpoint
  *    whose ticket re-encodes `"{session_id}/{sql}"`
  *    (`flight.rs:169-190`).
  *  - `get_schema` answers the IPC-encoded plan schema — plan-only,
  *    nothing executes (`flight.rs:199-213`).
  *  - `do_get` executes and streams record batches
  *    (`flight.rs:216-258`).
  *  - `do_put` ingests a record-batch stream as a session table named
  *    by a path-type descriptor; cmd-type descriptors are rejected,
  *    and batches append to an existing table of the same name
  *    (`flight.rs:264-310`, `session_manager.rs` append semantics).
  *  - handshake / list_flights / list_actions / do_action /
  *    do_exchange: UNIMPLEMENTED, as in the reference
  *    (`flight.rs:153-167, 311-346`).
  */
final class GraftFlightProducer(sessions: SessionManager)
    extends NoOpFlightProducer {

  /** `"{session_id}/{value}"` → (session, value); mirrors
    * `split_descriptor_value` (`flight.rs:348-360`).
    */
  private def split(v: String): (String, String) = {
    val i = v.indexOf('/')
    if (i <= 0 || i == v.length - 1)
      throw CallStatus.INVALID_ARGUMENT
        .withDescription(s"invalid descriptor/ticket: $v").toRuntimeException
    (v.substring(0, i), v.substring(i + 1))
  }

  private def toSql(value: String): String =
    if (value.exists(_.isWhitespace)) value else s"SELECT * FROM $value"

  private def resolveDescriptor(d: FlightDescriptor): (String, String) =
    if (d.isCommand) split(new String(d.getCommand, UTF_8))
    else {
      val path = d.getPath
      if (path == null || path.isEmpty)
        throw CallStatus.INVALID_ARGUMENT
          .withDescription("descriptor has no path").toRuntimeException
      split(path.get(0))
    }

  private def frame(sessionId: String, value: String): DataFrame = {
    val h = sessions.get(sessionId).getOrElse(
      throw CallStatus.NOT_FOUND
        .withDescription(s"no such session: $sessionId").toRuntimeException)
    sessions.sql(h, toSql(value))
  }

  override def getStream(ctx: FlightProducer.CallContext, ticket: Ticket,
      listener: FlightProducer.ServerStreamListener): Unit =
    try {
      val (sid, value) = split(new String(ticket.getBytes, UTF_8))
      val df = frame(sid, value)
      // driver-incremental with flow control: one Arrow batch is
      // produced at a time (the execute_sql_stream analogue,
      // flight.rs:237-247), and the producer waits for the transport
      // to drain before the next putNext so a slow client cannot grow
      // the outbound queue unboundedly
      // a cancelled stream aborts the row iteration (the exception
      // unwinds foreachArrowBatch, so no further rows are computed);
      // readiness waits sleep rather than busy-spin
      object Cancelled extends RuntimeException
      try {
        ArrowBridge.foreachArrowBatch(df, batchRows = 1024) { root =>
          listener.start(root)
        } { () =>
          while (!listener.isReady && !listener.isCancelled) Thread.sleep(1)
          if (listener.isCancelled) throw Cancelled
          listener.putNext()
        }
        listener.completed()
      } catch {
        case Cancelled => () // client went away: nothing to send
        case _: InterruptedException =>
          // server shutdown while waiting on a slow client: restore
          // the interrupt flag for the gRPC worker and end quietly
          Thread.currentThread().interrupt()
      }
    } catch {
      case e: FlightRuntimeException => listener.error(e); throw e
      case e: Throwable =>
        val fe = CallStatus.INTERNAL.withDescription(
          String.valueOf(e.getMessage)).withCause(e).toRuntimeException
        listener.error(fe)
        throw fe
    }

  override def getFlightInfo(ctx: FlightProducer.CallContext,
      descriptor: FlightDescriptor): FlightInfo = {
    val (sid, value) = resolveDescriptor(descriptor)
    val sql = toSql(value)
    val schema = ArrowBridge.toArrowSchema(frame(sid, value))
    val endpoint = new FlightEndpoint(new Ticket(s"$sid/$sql".getBytes(UTF_8)))
    new FlightInfo(schema, descriptor,
      java.util.Collections.singletonList(endpoint), -1L, -1L)
  }

  override def getSchema(ctx: FlightProducer.CallContext,
      descriptor: FlightDescriptor): SchemaResult = {
    val (sid, value) = resolveDescriptor(descriptor)
    new SchemaResult(ArrowBridge.toArrowSchema(frame(sid, value)))
  }

  override def acceptPut(ctx: FlightProducer.CallContext,
      stream: FlightStream,
      ack: FlightProducer.StreamListener[PutResult]): Runnable = () =>
    try {
      val descriptor = stream.getDescriptor
      if (descriptor == null)
        throw CallStatus.INVALID_ARGUMENT
          .withDescription("No descriptor found in FlightData").toRuntimeException
      if (descriptor.isCommand) // reference rejects cmd for put (flight.rs:282)
        throw CallStatus.INVALID_ARGUMENT
          .withDescription("Invalid descriptor type 'cmd'").toRuntimeException
      val (sid, table) = resolveDescriptor(descriptor)
      val h = sessions.get(sid).getOrElse(
        throw CallStatus.NOT_FOUND
          .withDescription(s"no such session: $sid").toRuntimeException)
      // drain the gRPC stream into IPC bytes, then decode with the
      // same (spec-tested) path the HTTP arrow ingest uses. Buffering
      // the full upload driver-side mirrors the reference, whose
      // to_record_batches also collects every batch before
      // registration (flight_stream.rs:58-78); a spill-to-disk
      // variant would reuse Readers' session spool.
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(stream.getRoot,
        stream.getDictionaryProvider, out)
      writer.start()
      while (stream.next()) writer.writeBatch()
      writer.end()
      val incoming = ArrowBridge.readIpcBytes(h.spark, out.toByteArray)
      val df = // append_record_batch semantics: union onto an existing table
        if (h.spark.catalog.tableExists(table))
          h.spark.table(table).unionByName(incoming)
        else incoming
      sessions.registerTable(h, df, DataSourceDef(table, "flight", None, None))
      ack.onNext(PutResult.empty())
      ack.onCompleted()
    } catch {
      case e: FlightRuntimeException => ack.onError(e)
      case e: Throwable => ack.onError(CallStatus.INTERNAL
        .withDescription(String.valueOf(e.getMessage)).withCause(e).toRuntimeException)
    }
}

/** Server bootstrap — the `flight_server:50051` analogue
  * (`bin/src/main.rs` flight feature wiring).
  */
object GraftFlightServer {
  def start(sessions: SessionManager, port: Int = 50051,
      allocator: BufferAllocator = new RootAllocator()): FlightServer = {
    val server = FlightServer.builder(allocator,
      Location.forGrpcInsecure("0.0.0.0", port),
      new GraftFlightProducer(sessions)).build()
    server.start()
    server
  }
}

/** Flight *client* scan (SURVEY §2.A9) — ingest a remote Flight
  * endpoint as a DataFrame, the
  * `lib/src/data_source/flight_stream.rs:17-78` analogue. URI shape
  * matches the reference's `flight://host:port/{session}/{value}`
  * data-source location.
  */
object FlightScan {
  def read(spark: SparkSession, uri: String): DataFrame = {
    val u = java.net.URI.create(uri)
    val ticketValue = Option(u.getPath).map(_.stripPrefix("/")).getOrElse("")
    if (ticketValue.isEmpty)
      throw new IllegalArgumentException(s"Not found ticket in location URI: $uri")
    val allocator = new RootAllocator()
    val client = FlightClient.builder(allocator,
      Location.forGrpcInsecure(u.getHost, u.getPort)).build()
    try {
      val stream = client.getStream(new Ticket(ticketValue.getBytes(UTF_8)))
      try {
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(stream.getRoot,
          stream.getDictionaryProvider, out)
        writer.start()
        while (stream.next()) writer.writeBatch()
        writer.end()
        ArrowBridge.readIpcBytes(spark, out.toByteArray)
      } finally stream.close()
    } finally {
      client.close()
      allocator.close()
    }
  }
}
