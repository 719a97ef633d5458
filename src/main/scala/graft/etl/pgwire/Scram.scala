package graft.etl.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.sql.SQLException
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Client side of SCRAM-SHA-256 and SCRAM-SHA-256-PLUS (RFC 5802
  * framing, RFC 7677 hash suite) — the authentication PostgreSQL
  * requires by default since v14 (`password_encryption =
  * scram-sha-256`). Written from the public RFCs and the PostgreSQL
  * "SASL Authentication" protocol docs. Channel binding follows the
  * socket: plaintext sends gs2 `n,,`; a TLS session where the server
  * did not advertise -PLUS sends `y,,` (downgrade evidence); a TLS
  * session with -PLUS sends `p=tls-server-end-point,,` and mixes the
  * RFC 5929 certificate hash into the c= attribute ([[PgTls]]).
  *
  * One instance per authentication exchange:
  * {{{
  *   val s = new Scram(password)          // fresh random nonce
  *   send(s.clientFirstMessage)           // in SASLInitialResponse
  *   val fin = s.clientFinal(serverFirst) // from AuthenticationSASLContinue
  *   send(fin)                            // in SASLResponse
  *   s.verifyServerFinal(serverFinal)     // from AuthenticationSASLFinal
  * }}}
  *
  * The nonce is injectable so the RFC 7677 §3 example exchange can be
  * replayed bit-for-bit in a spec (ScramSpec).
  */
private[pgwire] final class Scram(password: String, nonce: String,
    username: String, gs2Header: String,
    channelBinding: Array[Byte]) {

  def this(password: String) =
    this(password, Scram.freshNonce(), "", "n,,", Array.emptyByteArray)

  def this(password: String, nonce: String) =
    this(password, nonce, "", "n,,", Array.emptyByteArray)

  def this(password: String, nonce: String, username: String) =
    this(password, nonce, username, "n,,", Array.emptyByteArray)
  /** PostgreSQL ignores the SASL username (the startup-message user wins),
    * so production exchanges send it empty per the PG docs; the RFC test
    * vector injects "user" here. */
  private val clientFirstBare = s"n=$username,r=$nonce"

  val clientFirstMessage: String = gs2Header + clientFirstBare

  private var authMessage: String = _
  private var saltedPassword: Array[Byte] = _

  /** Build the client-final-message from the server-first-message
    * (`r=<nonce>,s=<salt-b64>,i=<iterations>`). */
  def clientFinal(serverFirst: String): String = {
    val attrs = Scram.parseAttrs(serverFirst)
    val serverNonce = attrs.getOrElse("r",
      throw new SQLException("SCRAM: server-first lacks r=", "28000"))
    if (!serverNonce.startsWith(nonce))
      throw new SQLException("SCRAM: server nonce does not extend client nonce", "28000")
    val salt = Base64.getDecoder.decode(attrs.getOrElse("s",
      throw new SQLException("SCRAM: server-first lacks s=", "28000")))
    val iterations = attrs.getOrElse("i",
      throw new SQLException("SCRAM: server-first lacks i=", "28000")).toInt

    saltedPassword = Scram.hi(password, salt, iterations)
    val clientKey = Scram.hmac(saltedPassword, "Client Key")
    val storedKey = MessageDigest.getInstance("SHA-256").digest(clientKey)

    // c= carries the base64 of gs2-header ++ cb-data (RFC 5802 §5.1:
    // "n,," → "biws"; with p= the certificate hash follows the header)
    val cBind = Base64.getEncoder.encodeToString(
      gs2Header.getBytes(UTF_8) ++ channelBinding)
    val withoutProof = s"c=$cBind,r=$serverNonce"
    authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"

    val clientSignature = Scram.hmac(storedKey, authMessage)
    val proof = clientKey.zip(clientSignature).map { case (a, b) => (a ^ b).toByte }
    withoutProof + ",p=" + Base64.getEncoder.encodeToString(proof)
  }

  /** Check the server signature (`v=<b64>`) — proves the server knew the
    * salted password, not just our proof. Throws on mismatch. */
  def verifyServerFinal(serverFinal: String): Unit = {
    require(authMessage != null, "clientFinal must run before verifyServerFinal")
    val attrs = Scram.parseAttrs(serverFinal)
    val v = attrs.getOrElse("v",
      throw new SQLException("SCRAM: server-final lacks v=", "28000"))
    val serverKey = Scram.hmac(saltedPassword, "Server Key")
    val expected = Base64.getEncoder.encodeToString(Scram.hmac(serverKey, authMessage))
    if (expected != v)
      throw new SQLException("SCRAM: server signature mismatch", "28000")
  }
}

private[pgwire] object Scram {
  val Mechanism = "SCRAM-SHA-256"
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  private val rng = new SecureRandom()

  /** Printable-ASCII nonce (RFC 5802: chars in %x21-2B / %x2D-7E — exclude
    * ','). 18 random bytes base64'd gives 24 chars from a safe alphabet. */
  def freshNonce(): String = {
    val b = new Array[Byte](18)
    rng.nextBytes(b)
    Base64.getEncoder.encodeToString(b)
  }

  /** `k1=v1,k2=v2` → map; values may contain '=' (base64 padding). */
  def parseAttrs(msg: String): Map[String, String] =
    msg.split(',').iterator.filter(_.length >= 2).map { part =>
      part.substring(0, 1) -> part.substring(2)
    }.toMap

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA-256 with one block (RFC 5802 §2.2):
    * U1 = HMAC(str, salt || INT(1)); Un = HMAC(str, Un-1); Hi = U1^...^Ui. */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(password.getBytes(UTF_8), "HmacSHA256"))
    mac.update(salt)
    mac.update(Array[Byte](0, 0, 0, 1))
    var u = mac.doFinal()
    val result = u.clone()
    var i = 1
    while (i < iterations) {
      u = { mac.reset(); mac.doFinal(u) }
      var j = 0
      while (j < result.length) { result(j) = (result(j) ^ u(j)).toByte; j += 1 }
      i += 1
    }
    result
  }

  /** Postgres MD5 auth response: "md5" + hex(md5(hex(md5(password+user)) + salt)).
    * Public algorithm (PG docs, "Password Authentication"). */
  def md5Password(user: String, password: String, salt: Array[Byte]): String = {
    val md = MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    val inner = hex(md.digest((password + user).getBytes(UTF_8)))
    md.reset()
    md.update(inner.getBytes(UTF_8))
    md.update(salt)
    "md5" + hex(md.digest())
  }
}
