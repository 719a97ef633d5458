package graft.etl.pgwire

import java.io.{DataInputStream, DataOutputStream, FileInputStream}
import java.net.Socket
import java.security.{KeyStore, MessageDigest, SecureRandom}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.sql.SQLException

import javax.net.ssl.{SSLContext, SSLSocket, TrustManager, TrustManagerFactory, X509TrustManager}

/** TLS layer for the pgwire client — the PostgreSQL SSLRequest dance
  * (public protocol docs, "Protocol Flow: SSL Session Encryption"):
  * before the StartupMessage the client sends an 8-byte SSLRequest
  * (int32 length, int32 code 80877103); the server answers one raw byte,
  * 'S' (proceed with a TLS handshake on the same socket) or 'N' (TLS not
  * available). After 'S' the TLS session wraps the socket and the normal
  * v3 startup runs inside it.
  *
  * Trust model mirrors libpq's sslmode ladder:
  *   - `disable` — never send SSLRequest (plaintext only).
  *   - `prefer` (default) — ask; fall back to plaintext on 'N'. Like
  *     libpq's default this protects against passive snooping only.
  *   - `require` — ask; fail on 'N'. Without a root cert the server
  *     certificate is NOT verified (libpq `require` semantics).
  *   - `require` + `sslrootcert` — additionally verify the server chain
  *     against the given PEM certificate(s) (libpq `verify-ca`; hostname
  *     verification — verify-full — is out of scope and documented).
  *
  * The negotiated peer certificate is returned so SCRAM can offer
  * channel binding: [[channelBindingData]] computes the RFC 5929 §4.1
  * `tls-server-end-point` value (hash of the server certificate using
  * the certificate's own signature hash, with MD5/SHA-1 upgraded to
  * SHA-256 per the RFC).
  */
private[pgwire] object PgTls {

  sealed trait Mode
  case object Disable extends Mode
  case object Prefer extends Mode
  case object Require extends Mode

  /** @param rootCert PEM file with trusted CA / server cert(s); when set
    *   the chain is verified (verify-ca), otherwise any cert is accepted. */
  final case class Config(mode: Mode, rootCert: Option[String] = None)

  val Default: Config = Config(Prefer)

  /** Parse the libpq-style property value. */
  def configFrom(sslmode: Option[String], rootCert: Option[String]): Config =
    sslmode.map(_.trim.toLowerCase) match {
      case None | Some("prefer") => Config(Prefer, rootCert)
      case Some("disable") => Config(Disable, rootCert)
      case Some("require") => Config(Require, rootCert)
      case Some("verify-ca") => Config(Require, rootCert.orElse(throw new SQLException(
        "pgwire: sslmode=verify-ca requires sslrootcert", "08006")))
      case Some(other) => throw new SQLException(
        s"pgwire: unsupported sslmode '$other' " +
          "(supported: disable, prefer, require, verify-ca)", "08006")
    }

  private val SslRequestCode = 80877103 // 1234 << 16 | 5679

  /** Run the SSLRequest negotiation on a connected socket. Returns the
    * socket to use for the v3 protocol (the original, or a TLS wrapper)
    * plus the server certificate when TLS is active. */
  def negotiate(raw: Socket, host: String, port: Int,
      cfg: Config): (Socket, Option[X509Certificate]) = cfg.mode match {
    case Disable => (raw, None)
    case _ =>
      val out = new DataOutputStream(raw.getOutputStream)
      out.writeInt(8)
      out.writeInt(SslRequestCode)
      out.flush()
      val answer = new DataInputStream(raw.getInputStream).read()
      answer match {
        case 'S' =>
          val ssl = wrap(raw, host, port, cfg.rootCert)
          val cert = ssl.getSession.getPeerCertificates()(0) match {
            case x: X509Certificate => x
            case other => throw new SQLException(
              s"pgwire: non-X509 server certificate ${other.getClass.getName}", "08006")
          }
          (ssl, Some(cert))
        case 'N' =>
          if (cfg.mode == Require)
            throw new SQLException(
              "pgwire: server does not support TLS but sslmode=require", "08006")
          (raw, None)
        case 'E' =>
          // ErrorResponse to SSLRequest (pre-7.4 server): the rest of the
          // error message is still in the socket, so continuing a
          // plaintext startup here would parse those bytes as v3 frames.
          // libpq hard-fails this case; so do we.
          throw new SQLException(
            "pgwire: server answered SSLRequest with ErrorResponse " +
              "(pre-7.4 protocol) — refusing to continue on this socket", "08006")
        case -1 =>
          throw new SQLException("pgwire: server closed connection during SSLRequest", "08006")
        case other =>
          throw new SQLException(s"pgwire: unexpected SSLRequest response byte $other", "08006")
      }
  }

  private def wrap(raw: Socket, host: String, port: Int,
      rootCert: Option[String]): SSLSocket = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[TrustManager](rootCert match {
      case Some(path) => verifyingTrustManager(path)
      case None => TrustAll
    }), new SecureRandom())
    val ssl = ctx.getSocketFactory
      .createSocket(raw, host, port, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    ssl.startHandshake()
    ssl
  }

  /** libpq `require`: encrypt, trust anything (no chain validation). */
  private object TrustAll extends X509TrustManager {
    override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }

  /** Build a PKIX trust manager from a PEM file (CertificateFactory
    * reads PEM directly; multiple concatenated certs all load). */
  private def verifyingTrustManager(pemPath: String): X509TrustManager = {
    val cf = CertificateFactory.getInstance("X.509")
    val in = new FileInputStream(pemPath)
    val certs = try cf.generateCertificates(in) finally in.close()
    if (certs.isEmpty)
      throw new SQLException(s"pgwire: no certificates in $pemPath", "08006")
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    var i = 0
    certs.forEach { c => ks.setCertificateEntry(s"root$i", c); i += 1 }
    val tmf = TrustManagerFactory.getInstance("PKIX")
    tmf.init(ks)
    tmf.getTrustManagers.collectFirst { case x: X509TrustManager => x }
      .getOrElse(throw new SQLException("pgwire: no X509TrustManager from PKIX", "08006"))
  }

  /** RFC 5929 §4.1 tls-server-end-point: hash of the DER server cert
    * using the hash of the cert's signature algorithm, except MD5 and
    * SHA-1 map to SHA-256. (PostgreSQL's only supported channel-binding
    * type, per its SASL docs.) */
  def channelBindingData(cert: X509Certificate): Array[Byte] = {
    val sig = cert.getSigAlgName.toUpperCase.replace("-", "")
    val hash =
      if (sig.contains("SHA384")) "SHA-384"
      else if (sig.contains("SHA512")) "SHA-512"
      else "SHA-256" // SHA256 itself, plus the mandated MD5/SHA1 upgrade
    MessageDigest.getInstance(hash).digest(cert.getEncoded)
  }
}
