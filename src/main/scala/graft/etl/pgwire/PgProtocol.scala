package graft.etl.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.SQLException

import scala.collection.mutable.ArrayBuffer

/** One column of a wire-level result: name + type OID + type modifier
  * (enough to reconstruct JDBC metadata — precision/scale for numerics
  * ride in the typmod). */
private[pgwire] final case class PgCol(name: String, typeOid: Int, typmod: Int)

/** One statement's result: column descriptors (empty for DDL/DML), rows
  * in TEXT format (null = SQL NULL), and the CommandComplete tag
  * ("SELECT 5", "INSERT 0 3", "MERGE 2", "CREATE TABLE", ...). */
private[pgwire] final case class PgResult(cols: IndexedSeq[PgCol],
    rows: IndexedSeq[Array[String]], tag: String) {
  /** Affected-row count parsed from the tag (0 for DDL). */
  def updateCount: Int = {
    val parts = tag.split(' ')
    if (parts.length >= 2 && parts.last.forall(_.isDigit)) parts.last.toInt
    else 0
  }
}

/** Minimal PostgreSQL v3 frontend/backend protocol client — SIMPLE query
  * mode only, text result format, trust ("no password") authentication.
  *
  * Built from the public protocol specification (PostgreSQL docs,
  * "Frontend/Backend Protocol"). This is NOT a general-purpose driver:
  * it exists so the [[graft.etl.JdbcUpsert]] sink can be executed against
  * a real Postgres server in environments where no vendor JDBC driver is
  * available. Unsupported: MD5/SCRAM auth, extended query protocol,
  * binary format, COPY, notifications.
  *
  * Thread safety: one protocol instance per connection; callers
  * (the JDBC wrapper) synchronize on the instance.
  */
private[pgwire] final class PgProtocol(host: String, port: Int,
    user: String, database: String) {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), 10000)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 1 << 16))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream, 1 << 16))
  @volatile private var closed = false

  startup()

  def isClosed: Boolean = closed

  /** Send the StartupMessage and consume handshake messages through the
    * first ReadyForQuery. Only AuthenticationOk (trust) is accepted. */
  private def startup(): Unit = {
    val params = Seq("user" -> user, "database" -> database,
      "client_encoding" -> "UTF8", "application_name" -> "graft-pgwire")
    val body = new ArrayBuffer[Byte]()
    def putInt(v: Int): Unit = {
      body += ((v >>> 24) & 0xff).toByte; body += ((v >>> 16) & 0xff).toByte
      body += ((v >>> 8) & 0xff).toByte; body += (v & 0xff).toByte
    }
    putInt(196608) // protocol 3.0
    params.foreach { case (k, v) =>
      body ++= k.getBytes(UTF_8); body += 0
      body ++= v.getBytes(UTF_8); body += 0
    }
    body += 0
    out.writeInt(body.length + 4)
    out.write(body.toArray)
    out.flush()

    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' =>
          val code = readInt32(payload, 0)
          if (code != 0)
            throw new SQLException(
              s"pgwire supports only trust authentication (server requested code $code)",
              "28000")
        case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => throw parseError(payload)
        case other =>
          throw new SQLException(s"pgwire: unexpected startup message '$other'")
      }
    }
  }

  /** Execute one simple Query message (which may carry multiple
    * ';'-separated statements) and collect every statement's result.
    * On ErrorResponse the stream is drained to ReadyForQuery before the
    * SQLException is thrown, so the connection stays usable. */
  def query(sql: String): IndexedSeq[PgResult] = synchronized {
    require(!closed, "pgwire connection is closed")
    val sqlBytes = sql.getBytes(UTF_8)
    out.writeByte('Q')
    out.writeInt(4 + sqlBytes.length + 1)
    out.write(sqlBytes)
    out.writeByte(0)
    out.flush()

    val results = new ArrayBuffer[PgResult]()
    var cols: IndexedSeq[PgCol] = Vector.empty
    var rows = new ArrayBuffer[Array[String]]()
    var err: SQLException = null
    var done = false
    while (!done) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' =>
          cols = parseRowDescription(payload)
          rows = new ArrayBuffer[Array[String]]()
        case 'D' =>
          rows += parseDataRow(payload)
        case 'C' =>
          val tag = cstring(payload, 0)._1
          results += PgResult(cols, rows.toIndexedSeq, tag)
          cols = Vector.empty
          rows = new ArrayBuffer[Array[String]]()
        case 'I' => // EmptyQueryResponse
          results += PgResult(Vector.empty, Vector.empty, "")
        case 'E' =>
          if (err == null) err = parseError(payload)
        case 'N' | 'S' => () // notices / parameter changes: ignore
        case 'Z' => done = true
        case other =>
          throw new SQLException(s"pgwire: unexpected message '$other' during query")
      }
    }
    if (err != null) throw err
    results.toIndexedSeq
  }

  def close(): Unit = synchronized {
    if (!closed) {
      closed = true
      try {
        out.writeByte('X'); out.writeInt(4); out.flush()
      } catch { case _: Throwable => () }
      try socket.close() catch { case _: Throwable => () }
    }
  }

  // ---- wire helpers -------------------------------------------------

  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.read()
    if (tpe < 0) { closed = true; throw new EOFException("pgwire: server closed connection") }
    val len = in.readInt()
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (tpe.toChar, payload)
  }

  private def readInt32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readInt16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** (string, index-after-NUL) */
  private def cstring(b: Array[Byte], off: Int): (String, Int) = {
    var end = off
    while (b(end) != 0) end += 1
    (new String(b, off, end - off, UTF_8), end + 1)
  }

  private def parseRowDescription(b: Array[Byte]): IndexedSeq[PgCol] = {
    val n = readInt16(b, 0)
    var off = 2
    (0 until n).map { _ =>
      val (name, next) = cstring(b, off)
      off = next
      off += 4 + 2 // table oid + attnum
      val typeOid = readInt32(b, off); off += 4
      off += 2 // typlen
      val typmod = readInt32(b, off); off += 4
      off += 2 // format code (always 0 = text in simple protocol)
      PgCol(name, typeOid, typmod)
    }
  }

  private def parseDataRow(b: Array[Byte]): Array[String] = {
    val n = readInt16(b, 0)
    var off = 2
    val row = new Array[String](n)
    var i = 0
    while (i < n) {
      val len = readInt32(b, off); off += 4
      if (len >= 0) { row(i) = new String(b, off, len, UTF_8); off += len }
      i += 1
    }
    row
  }

  private def parseError(b: Array[Byte]): SQLException = {
    var off = 0
    var severity = ""; var sqlState = ""; var message = ""
    while (off < b.length && b(off) != 0) {
      val code = b(off).toChar; off += 1
      val (value, next) = cstring(b, off); off = next
      code match {
        case 'S' => severity = value
        case 'C' => sqlState = value
        case 'M' => message = value
        case _ => ()
      }
    }
    new SQLException(s"$severity: $message", sqlState)
  }
}
