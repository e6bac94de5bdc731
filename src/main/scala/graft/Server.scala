package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicBoolean

/** Network entry point — the counterpart of the reference's wire-protocol
  * server (reference: src/lib/server/server.hpp:32, a PostgreSQL-protocol
  * listener dispatching to SQLPipeline). Speaking full pgwire buys nothing
  * here (Spark's own remote surface is Spark Connect); what this preserves is
  * the reference's ARCHITECTURE: a TCP listener, one session per connection,
  * each line of SQL dispatched through the same [[Pipeline]] every other entry
  * point uses, results streamed back.
  *
  * Protocol (newline-delimited, one statement per line):
  *   → `SELECT ...`
  *   ← `ok <n>`            then n JSON-object rows, then a blank line
  *   ← `ok <n> truncated`  result exceeded `maxRows`; first n rows follow
  *   ← `error <message>`   then a blank line
  *
  * Row payloads use `df.toJSON` — per-partition JSON encoding on executors.
  * The driver-side materialization is BOUNDED: `limit(maxRows + 1)` caps the
  * fetch (the +1 row only signals truncation and is never sent), so a client
  * sending `SELECT * FROM lineitem` at 100 TB costs one CollectLimit, not an
  * unbounded driver OOM. `maxRows = 0` disables row payloads entirely
  * (status-only mode for write-heavy clients).
  */
final class Server(makePipeline: () => Pipeline, port: Int = 0, maxRows: Int = 10000) {

  private val running = new AtomicBoolean(false)
  @volatile private var socket: ServerSocket = _
  @volatile private var threads: List[Thread] = Nil

  /** Start accepting; returns the bound port. */
  def start(): Int = {
    socket = new ServerSocket(port)
    running.set(true)
    val acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val client = socket.accept()
          val t = new Thread(() => serve(client), s"graft-server-conn")
          t.setDaemon(true)
          threads = t :: threads
          t.start()
        } catch {
          case _: SocketException => () // closed during stop()
        }
      }
    }, "graft-server-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    socket.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (socket != null) socket.close()
  }

  private val connGen = new java.util.concurrent.atomic.AtomicInteger(1)
  // shared daemon scheduler for the statement governor (no Timer-per-statement)
  private val governor = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => { val t = new Thread(r, "graft-json-governor"); t.setDaemon(true); t })

  /** One connection = one session pipeline (like one pgwire session). */
  private def serve(client: Socket): Unit = {
    val pipeline = makePipeline()
    val in = new BufferedReader(new InputStreamReader(client.getInputStream, "UTF-8"))
    val out = new PrintWriter(client.getOutputStream, false)
    // same statement governor as PgServer: spark.graft.statementTimeoutMs
    // (set via UPDATE meta_settings) cancels this connection's job group
    val sc = pipeline.catalog.spark.sparkContext
    val jobGroup = s"graft-json-${connGen.getAndIncrement()}"
    sc.setJobGroup(jobGroup, "graft line-json backend", interruptOnCancel = true)
    def governed[A](f: => A): A =
      pipeline.catalog.spark.conf.getOption("spark.graft.statementTimeoutMs")
        .map(_.toLong).filter(_ > 0) match {
        case None => f
        case Some(ms) =>
          val task = governor.schedule(new Runnable {
            def run(): Unit = sc.cancelJobGroup(jobGroup)
          }, ms, java.util.concurrent.TimeUnit.MILLISECONDS)
          try f finally task.cancel(false)
      }
    try {
      var line = in.readLine()
      while (line != null && running.get()) {
        val stmt = line.trim
        if (stmt.nonEmpty) {
          try governed {
            val df = pipeline.sql(stmt)
            val rows =
              if (df.columns.isEmpty) Array.empty[String] // DML/DDL: no result set
              else df.limit(maxRows + 1).toJSON.collect()
            val truncated = rows.length > maxRows
            val sent = if (truncated) rows.take(maxRows) else rows
            out.println(s"ok ${sent.length}" + (if (truncated) " truncated" else ""))
            sent.foreach(out.println)
          } catch {
            case e: Throwable =>
              out.println(s"error ${String.valueOf(e.getMessage).replaceAll("\\R", " ").take(500)}")
          }
          out.println()
          out.flush()
        }
        line = in.readLine()
      }
    } finally {
      out.close()
      client.close()
    }
  }
}
