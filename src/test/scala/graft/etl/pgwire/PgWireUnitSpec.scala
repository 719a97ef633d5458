package graft.etl.pgwire

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit coverage of the pgwire pieces that don't need a server:
  * placeholder splitting, literal encoding, URL parsing, tag parsing. */
class PgWireUnitSpec extends AnyFunSuite {

  test("splitPlaceholders: placeholders outside quotes only") {
    assert(PgJdbc.splitPlaceholders("INSERT INTO t VALUES (?, ?)") ===
      Vector("INSERT INTO t VALUES (", ", ", ")"))
    // '?' inside a single-quoted literal is not a placeholder
    assert(PgJdbc.splitPlaceholders("SELECT '?' WHERE x = ?") ===
      Vector("SELECT '?' WHERE x = ", ""))
    // '' escape keeps the literal open-closed pairing intact
    assert(PgJdbc.splitPlaceholders("SELECT 'it''s ?' , ?") ===
      Vector("SELECT 'it''s ?' , ", ""))
    // '?' inside a double-quoted identifier is not a placeholder
    assert(PgJdbc.splitPlaceholders("""SELECT "a?b" FROM t WHERE c = ?""") ===
      Vector("""SELECT "a?b" FROM t WHERE c = """, ""))
    assert(PgJdbc.splitPlaceholders("no params") === Vector("no params"))
  }

  test("encodeLiteral: strings escape quotes, temporal types are typed literals") {
    assert(PgJdbc.encodeLiteral(null) === "NULL")
    assert(PgJdbc.encodeLiteral("it's") === "'it''s'")
    assert(PgJdbc.encodeLiteral(java.lang.Boolean.TRUE) === "TRUE")
    assert(PgJdbc.encodeLiteral(java.lang.Long.valueOf(42L)) === "42")
    assert(PgJdbc.encodeLiteral(java.lang.Double.valueOf(1.5)) === "1.5")
    assert(PgJdbc.encodeLiteral(java.lang.Double.valueOf(Double.NaN)) === "'NaN'::float8")
    assert(PgJdbc.encodeLiteral(java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")) ===
      "TIMESTAMP '2024-03-01 12:34:56.789'")
    assert(PgJdbc.encodeLiteral(java.sql.Date.valueOf("2024-03-01")) ===
      "DATE '2024-03-01'")
    assert(PgJdbc.encodeLiteral(Array[Byte](0x41, 0x0a)) === "'\\x410a'::bytea")
  }

  test("parseUrl: host/port/database forms") {
    assert(PgWireDriver.parseUrl("jdbc:postgresql://127.0.0.1:5433/graft") ===
      (("127.0.0.1", 5433, "graft")))
    assert(PgWireDriver.parseUrl("jdbc:postgresql://localhost/postgres") ===
      (("localhost", 5432, "postgres")))
    assert(PgWireDriver.parseUrl("jdbc:postgresql://h:1/db?x=y") ===
      (("h", 1, "db")))
    intercept[java.sql.SQLException] {
      PgWireDriver.parseUrl("jdbc:postgresql:nohost")
    }
  }

  test("CommandComplete tags parse to update counts") {
    assert(PgResult(Vector.empty, Vector.empty, "INSERT 0 5").updateCount === 5)
    assert(PgResult(Vector.empty, Vector.empty, "DELETE 3").updateCount === 3)
    assert(PgResult(Vector.empty, Vector.empty, "MERGE 4").updateCount === 4)
    assert(PgResult(Vector.empty, Vector.empty, "CREATE TABLE").updateCount === 0)
    assert(PgResult(Vector.empty, Vector.empty, "BEGIN").updateCount === 0)
  }

  private def numericHex(s: String): String =
    PgCopyBinary.numericBytes(new java.math.BigDecimal(s))
      .map(b => f"$b%02x").mkString

  test("COPY BINARY numeric encoding: base-10000 groups, weight, sign, " +
    "dscale (hand-checked wire fixtures)") {
    // 0.0001: one digit group [1] at weight -1, dscale 4
    assert(numericHex("0.0001") === "0001" + "ffff" + "0000" + "0004" + "0001")
    // -12345678.90: groups [1234,5678,9000], weight 1, negative, dscale 2
    assert(numericHex("-12345678.90") ===
      "0003" + "0001" + "4000" + "0002" + "04d2" + "162e" + "2328")
    // zero keeps its display scale, no digit groups
    assert(numericHex("0.00") === "0000" + "0000" + "0000" + "0002")
    // 1.5: groups [1, 5000] straddling the point, weight 0
    assert(numericHex("1.5") ===
      "0002" + "0000" + "0000" + "0001" + "0001" + "1388")
    // integer with trailing zero group stripped: 10000 = [1] at weight 1
    assert(numericHex("10000") === "0001" + "0001" + "0000" + "0000" + "0001")
  }

  test("COPY BINARY header/trailer and NULL field framing") {
    assert(PgCopyBinary.header.length === 19)
    assert(new String(PgCopyBinary.header.take(7)) === "PGCOPY\n")
    assert(PgCopyBinary.trailer.toSeq === Seq(0xff.toByte, 0xff.toByte))
    // a (long, NULL) tuple: int16 2, int32 8 + payload, int32 -1
    val row = PgCopyBinary.encodeRow(Array[Any](java.lang.Long.valueOf(1L), null))
    assert(row.map(b => f"$b%02x").mkString ===
      "0002" + "00000008" + "0000000000000001" + "ffffffff")
  }
}
