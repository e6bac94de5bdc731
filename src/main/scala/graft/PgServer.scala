package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** PostgreSQL wire-protocol entry point — the reference's second front door
  * (reference: src/lib/server/server.hpp:32 listener; per-connection handler
  * src/lib/server/postgres_protocol_handler.hpp:28; message catalogue
  * postgres_message_type.hpp; row serialization result_serializer.cpp). One
  * session per connection, every statement dispatched through the SAME
  * [[Pipeline]] as the programmatic and line-JSON entry points.
  *
  * Implements protocol 3.0's SIMPLE QUERY flow — the flow the reference's
  * QueryHandler serves (query_handler.cpp): Startup/SSLRequest negotiation,
  * AuthenticationOk (trust), ParameterStatus, BackendKeyData, then
  * Query → RowDescription + DataRow* + CommandComplete + ReadyForQuery, with
  * per-statement ErrorResponse and transaction status ('I' idle / 'T' in
  * transaction) reported from the pipeline's BEGIN/COMMIT/ROLLBACK state.
  * Extended-protocol messages (Parse/Bind/...) get a clean ErrorResponse
  * rather than a hang, mirroring how the reference rejects what it can't do.
  *
  * All values travel in text format (format code 0). Result fetches are
  * BOUNDED like [[Server]]: `limit(maxRows + 1)` caps driver materialization;
  * oversized results close with a NOTICE-equivalent suffix in the command tag
  * (the client still gets well-formed frames).
  */
final class PgServer(makePipeline: () => Pipeline, port: Int = 0, maxRows: Int = 10000) {

  private val running = new AtomicBoolean(false)
  @volatile private var socket: ServerSocket = _

  def start(): Int = {
    socket = new ServerSocket(port)
    running.set(true)
    val acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val client = socket.accept()
          val t = new Thread(() => try serve(client) catch { case _: Throwable => () }
            finally client.close(), "graft-pg-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: SocketException => () }
      }
    }, "graft-pg-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    socket.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (socket != null) socket.close()
  }

  // ------------------------------------------------------------ frame output

  private def msg(out: DataOutputStream, tpe: Char)(body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new DataOutputStream(buf))
    out.writeByte(tpe)
    out.writeInt(4 + buf.size())
    buf.writeTo(out)
  }

  private def cstr(o: DataOutputStream, s: String): Unit = { o.write(s.getBytes(UTF_8)); o.writeByte(0) }

  /** PostgreSQL type OIDs for the text-format row description (pg_type.dat). */
  private def typeOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case DateType => 1082
    case TimestampType => 1114
    case _ => 25 // text
  }

  private def sendError(out: DataOutputStream, message: String): Unit =
    msg(out, 'E') { o =>
      o.writeByte('S'); cstr(o, "ERROR")
      o.writeByte('C'); cstr(o, "XX000")
      o.writeByte('M'); cstr(o, message.replaceAll("\\R", " ").take(500))
      o.writeByte(0)
    }

  private def sendReady(out: DataOutputStream, p: Pipeline): Unit = {
    msg(out, 'Z')(_.writeByte(if (p.inTransaction) 'T' else 'I'))
    out.flush()
  }

  private def sendRowDescription(out: DataOutputStream, schema: StructType): Unit =
    msg(out, 'T') { o =>
      o.writeShort(schema.length)
      schema.fields.foreach { f =>
        cstr(o, f.name)
        o.writeInt(0)               // table oid
        o.writeShort(0)             // attribute number
        o.writeInt(typeOid(f.dataType))
        o.writeShort(-1)            // typlen (variable)
        o.writeInt(-1)              // typmod
        o.writeShort(0)             // text format
      }
    }

  private def sendDataRow(out: DataOutputStream, row: org.apache.spark.sql.Row): Unit =
    msg(out, 'D') { o =>
      o.writeShort(row.length)
      (0 until row.length).foreach { i =>
        if (row.isNullAt(i)) o.writeInt(-1)
        else {
          val bytes = String.valueOf(row.get(i)).getBytes(UTF_8)
          o.writeInt(bytes.length)
          o.write(bytes)
        }
      }
    }

  private def sendComplete(out: DataOutputStream, tag: String): Unit =
    msg(out, 'C')(cstr(_, tag))

  // --------------------------------------------------------------- sessions

  private def serve(client: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(client.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(client.getOutputStream))

    // startup negotiation: answer SSL/GSS probes with 'N' until StartupMessage
    var started = false
    while (!started) {
      val len = in.readInt()
      val code = in.readInt()
      code match {
        case 80877103 | 80877104 => out.writeByte('N'); out.flush() // no SSL / no GSS
        case 80877102 => return // CancelRequest: no async queries to cancel
        case 196608 => // protocol 3.0: key/value parameters (user/database) ignored
          val rest = new Array[Byte](len - 8); in.readFully(rest); started = true
        case other => sendError(out, s"unsupported protocol code $other"); out.flush(); return
      }
    }

    val pipeline = makePipeline()
    msg(out, 'R')(_.writeInt(0)) // AuthenticationOk (trust)
    msg(out, 'S') { o => cstr(o, "server_version"); cstr(o, "15.0 (graft)") }
    msg(out, 'S') { o => cstr(o, "client_encoding"); cstr(o, "UTF8") }
    msg(out, 'K') { o => o.writeInt(0); o.writeInt(0) } // BackendKeyData (cancel unsupported)
    sendReady(out, pipeline)

    while (running.get()) {
      val tpe = in.read()
      if (tpe < 0) return
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      tpe.toChar match {
        case 'Q' =>
          val sql = new String(body, 0, math.max(0, body.length - 1), UTF_8)
          runScript(pipeline, sql, out)
          sendReady(out, pipeline)
        case 'X' => return // Terminate
        case other =>
          sendError(out, s"'$other' message not supported: simple query protocol only " +
            "(reference scope: postgres_protocol_handler.hpp simple query flow)")
          sendReady(out, pipeline)
      }
    }
  }

  private def commandTag(sql: String, rows: Long): String = {
    val head = sql.trim.split("\\s+").headOption.getOrElse("").toUpperCase
    head match {
      case "SELECT" | "WITH" | "EXECUTE" => s"SELECT $rows"
      case "INSERT" => "INSERT 0 0"
      case "" => "EMPTY"
      case other => other
    }
  }

  private def runScript(pipeline: Pipeline, sql: String, out: DataOutputStream): Unit = {
    val results =
      try pipeline.run(sql)
      catch { case e: Throwable => sendError(out, String.valueOf(e.getMessage)); return }
    if (results.isEmpty) msg(out, 'I')(_ => ()) // EmptyQueryResponse
    results.foreach { r =>
      r.status match {
        case pipeline.Ok =>
          r.df.filter(_.columns.nonEmpty) match {
            case Some(df) =>
              try {
                val rows = df.limit(maxRows + 1).collect()
                val sent = if (rows.length > maxRows) rows.take(maxRows) else rows
                sendRowDescription(out, df.schema)
                sent.foreach(sendDataRow(out, _))
                sendComplete(out, commandTag(r.sql, sent.length.toLong))
              } catch { case e: Throwable => sendError(out, String.valueOf(e.getMessage)) }
            case None => sendComplete(out, commandTag(r.sql, 0L))
          }
        case pipeline.Failed(err) => sendError(out, err)
      }
    }
  }
}
