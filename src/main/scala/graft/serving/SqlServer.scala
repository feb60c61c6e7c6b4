package graft.serving

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Minimal network SQL serving endpoint — the role the reference fills
  * with a serverless SQL warehouse in front of Power BI
  * (finalize_databricks_deployment.py:330-361, README.md:143-161): remote
  * clients submit SQL text over TCP and get result sets back, each client
  * in its own session against the shared catalog.
  *
  * The environment ships no Hive thriftserver jars, so the wire protocol
  * is deliberately simple and dependency-free: newline-delimited UTF-8.
  * The client sends one SQL statement per line; the server answers with
  * exactly one JSON line — `{"columns":[…],"rows":[[…],…],"rowCount":n,
  * "truncated":bool}` on success, `{"error":"…"}` on failure — and keeps
  * the connection open for the next statement.
  *
  * Session semantics match a warehouse endpoint: every connection gets
  * `spark.newSession()` — isolated temp views, isolated SQL conf, SHARED
  * catalog and shared cached data — so two clients see each other's
  * saved tables but never each other's temp state. Statement execution is
  * fully concurrent (Spark's scheduler multiplexes jobs from all
  * sessions); the server adds no global lock.
  *
  * Scale notes: the result set is capped at `maxRows` (row 10_001 sets
  * `truncated` — a serving endpoint must never buffer an unbounded query
  * result in driver memory; clients page with LIMIT/OFFSET like they do
  * against any warehouse). Values cross the wire as strings (exact
  * `CAST(x AS STRING)` of each column) — a BI client's display layer, not
  * an exchange format.
  */
final class SqlServer(spark: SparkSession, port: Int = 0, maxRows: Int = 10000) {

  private val server = new ServerSocket(port)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-sql-server")
    t.setDaemon(true)
    t
  }
  private val running = new AtomicBoolean(false)

  /** The bound port (useful with port=0 for an ephemeral choice). */
  def boundPort: Int = server.getLocalPort

  def start(): this.type = {
    running.set(true)
    pool.submit(new Runnable {
      def run(): Unit =
        while (running.get()) {
          try {
            val sock = server.accept()
            pool.submit(new Runnable { def run(): Unit = serve(sock) })
          } catch {
            case _: SocketException => () // closed during stop()
          }
        }
    })
    this
  }

  def stop(): Unit = {
    running.set(false)
    server.close()
    pool.shutdownNow()
  }

  private def serve(sock: Socket): Unit = {
    val session = spark.newSession()
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
    try {
      var line = in.readLine()
      while (line != null) {
        val sql = line.trim
        if (sql.nonEmpty) out.println(execute(session, sql))
        line = in.readLine()
      }
    } catch {
      case _: SocketException => () // client went away mid-statement
    } finally sock.close()
  }

  private def execute(session: SparkSession, sql: String): String =
    try {
      val df = session.sql(sql)
      val cols = df.columns.toSeq
      // cast every column to string so the wire format is type-agnostic;
      // take maxRows + 1 to detect truncation without a count() job
      val strung = df.selectExpr(
        cols.map(c => s"CAST(`${c.replace("`", "``")}` AS STRING)"): _*)
      val rows = strung.take(maxRows + 1)
      val truncated = rows.length > maxRows
      val kept = if (truncated) rows.take(maxRows) else rows
      val sb = new StringBuilder("{\"columns\":[")
      sb.append(cols.map(jstr).mkString(","))
      sb.append("],\"rows\":[")
      var first = true
      kept.foreach { r =>
        if (!first) sb.append(',')
        first = false
        sb.append('[')
        var i = 0
        while (i < r.length) {
          if (i > 0) sb.append(',')
          if (r.isNullAt(i)) sb.append("null") else sb.append(jstr(r.getString(i)))
          i += 1
        }
        sb.append(']')
      }
      sb.append("],\"rowCount\":").append(kept.length)
      sb.append(",\"truncated\":").append(truncated).append('}')
      sb.toString
    } catch {
      case e: Throwable =>
        s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))}}"""
    }

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
