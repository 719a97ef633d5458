package graft.etl.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.SQLException

/** Encoder for PostgreSQL COPY text format (public docs: "COPY …
  * Text Format"): one line per row, tab-separated fields, `\N` for NULL,
  * backslash escapes for the delimiter/terminator bytes. The server
  * parses this with a dedicated bulk path — no per-row SQL parsing —
  * which is why COPY is the canonical fast load and the reference's own
  * ingest bottleneck fix (reference README.md:324-326 complains about
  * row-at-a-time INSERT speed).
  */
private[pgwire] object PgCopyText {

  /** Detect a Spark-JDBC-writer-shaped prepared INSERT
    * (`INSERT INTO t ("a","b") VALUES (?,?)`) and rewrite it as the
    * equivalent COPY statement. Table and column list pass through
    * verbatim (already quoted by the writer). Returns None for any other
    * statement shape — callers fall back to the literal-INSERT path. */
  private val InsertShape =
    """(?is)\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]+)\)\s*VALUES\s*\(\s*\?\s*(?:,\s*\?\s*)*\)\s*""".r

  def copyStatementFor(insertTemplate: String): Option[String] =
    copyPartsFor(insertTemplate).map { case (table, cols) =>
      s"COPY $table ($cols) FROM STDIN"
    }

  /** The (table, column-list) tokens of a writer-shaped INSERT, verbatim
    * as they appear in the SQL — the auto-binary catalog probe needs the
    * table name to resolve the target column type OIDs. */
  def copyPartsFor(insertTemplate: String): Option[(String, String)] =
    insertTemplate match {
      case InsertShape(table, cols) => Some((table, cols))
      case _ => None
    }

  /** One row (raw JDBC parameter values, in column order) → COPY text
    * line including the trailing '\n'. */
  def encodeRow(values: Array[Any]): Array[Byte] = {
    val sb = new StringBuilder(64)
    var i = 0
    while (i < values.length) {
      if (i > 0) sb += '\t'
      encodeField(values(i), sb)
      i += 1
    }
    sb += '\n'
    sb.toString.getBytes(UTF_8)
  }

  private def encodeField(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb ++= "\\N"
    case s: String =>
      s.foreach {
        case '\\' => sb ++= "\\\\"
        case '\t' => sb ++= "\\t"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case c => sb += c
      }
    case b: java.lang.Boolean => sb += (if (b) 't' else 'f')
    // Double/Float toString yields "NaN"/"Infinity"/"-Infinity", which the
    // float8/float4 input routines accept directly.
    case d: java.lang.Double => sb ++= d.toString
    case f: java.lang.Float => sb ++= f.toString
    case n: java.math.BigDecimal => sb ++= n.toPlainString
    case t: java.sql.Timestamp => sb ++= t.toString
    case d: java.sql.Date => sb ++= d.toString
    case b: Array[Byte] =>
      // bytea hex input is the text "\x…"; the backslash itself must be
      // COPY-escaped, so the wire bytes are "\\x…"
      sb ++= "\\\\x"
      b.foreach(x => sb ++= f"$x%02x")
    case n: Number => sb ++= n.toString
    case other => throw new SQLException(
      s"pgwire: cannot COPY-encode parameter of ${other.getClass.getName}")
  }
}
