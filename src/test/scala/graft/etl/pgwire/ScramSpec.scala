package graft.etl.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.SQLException
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 client replayed bit-for-bit against the RFC 7677 §3
  * example exchange, plus negative paths (tampered server nonce, bad
  * server signature) and the MD5 response algorithm. */
class ScramSpec extends AnyFunSuite {

  // RFC 7677 §3: user="user", pass="pencil", client nonce below.
  private val ClientNonce = "rOprNGfwEbeRWgbNEkqO"
  private val ServerFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val ExpectedClientFinal =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val ServerFinal = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  test("RFC 7677 example exchange replays exactly") {
    val s = new Scram("pencil", ClientNonce, "user")
    assert(s.clientFirstMessage === "n,,n=user,r=" + ClientNonce)
    assert(s.clientFinal(ServerFirst) === ExpectedClientFinal)
    s.verifyServerFinal(ServerFinal) // must not throw
  }

  test("server nonce must extend the client nonce") {
    val s = new Scram("pencil", ClientNonce, "user")
    val tampered = ServerFirst.replace(ClientNonce, "XXXX")
    val e = intercept[SQLException](s.clientFinal(tampered))
    assert(e.getMessage.contains("nonce"))
  }

  test("a forged server signature is rejected") {
    val s = new Scram("pencil", ClientNonce, "user")
    s.clientFinal(ServerFirst)
    val e = intercept[SQLException](
      s.verifyServerFinal("v=" + Base64.getEncoder.encodeToString(
        Array.fill[Byte](32)(0x42))))
    assert(e.getMessage.contains("signature"))
  }

  test("missing server-first attributes are individual errors") {
    intercept[SQLException](
      new Scram("p", ClientNonce, "").clientFinal("s=AAAA,i=4096"))
    intercept[SQLException](
      new Scram("p", ClientNonce, "").clientFinal(s"r=${ClientNonce}x,i=4096"))
    intercept[SQLException](
      new Scram("p", ClientNonce, "").clientFinal(s"r=${ClientNonce}x,s=AAAA"))
  }

  test("fresh nonces are printable, comma-free, and distinct") {
    val a = Scram.freshNonce()
    val b = Scram.freshNonce()
    assert(a !== b)
    for (n <- Seq(a, b)) {
      assert(n.length >= 16)
      assert(n.forall(c => c > 0x20 && c < 0x7f && c != ','), n)
    }
  }

  test("attr parsing keeps '=' inside values (base64 padding)") {
    val m = Scram.parseAttrs("r=abc,s=QUJD==,i=4096")
    assert(m("r") === "abc")
    assert(m("s") === "QUJD==")
    assert(m("i") === "4096")
  }

  test("Hi() matches PBKDF2-HMAC-SHA-256 (derived from the RFC vector)") {
    // SaltedPassword for the §3 vector: verify via the derived client key →
    // stored key → the known proof in ExpectedClientFinal round-trips,
    // which transitively pins Hi(). Direct check: 1 iteration equals
    // HMAC(pw, salt || INT(1)).
    val salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val one = Scram.hi("pencil", salt, 1)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec("pencil".getBytes(UTF_8),
      "HmacSHA256"))
    mac.update(salt)
    mac.update(Array[Byte](0, 0, 0, 1))
    assert(one.toSeq === mac.doFinal().toSeq)
  }

  test("MD5 response matches postgres' documented construction") {
    // md5(md5("secretpostgres") + salt) computed independently
    val salt = Array[Byte](0x01, 0x02, 0x03, 0x04)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    val inner = hex(md.digest("secretpostgres".getBytes(UTF_8)))
    md.reset()
    val expected = "md5" + hex(md.digest((inner + new String(
      salt.map(_.toChar))).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    assert(Scram.md5Password("postgres", "secret", salt) === expected)
  }
}
