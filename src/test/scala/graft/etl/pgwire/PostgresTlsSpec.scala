package graft.etl.pgwire

import java.sql.{DriverManager, SQLException}

import graft.SparkSpec
import graft.etl.JdbcUpsert
import org.scalatest.BeforeAndAfterAll

/** TLS for the pgwire sink, against a real PostgreSQL 15 cluster started
  * with `ssl = on` and a pg_hba.conf whose every TCP line is `hostssl …
  * scram-sha-256` — the shape any cloud-managed Postgres (RDS et al.)
  * presents: TLS is mandatory BEFORE authentication even starts.
  *
  * What's proven here:
  *   - a plaintext client is rejected by the server (hostssl), so the
  *     fixture is non-vacuous;
  *   - sslmode=require completes the SSLRequest → TLS handshake → SCRAM
  *     startup, and because the server advertises SCRAM-SHA-256-PLUS over
  *     TLS, the client binds the exchange to the server certificate
  *     (RFC 5929 tls-server-end-point) — asserted via the negotiated
  *     mechanism, so channel binding cannot silently regress to `n,,`;
  *   - verify-ca validates the server chain against the fixture's own
  *     certificate and REJECTS a decoy root (the trust check is real);
  *   - the full Spark-side path (JdbcUpsert staging write + promotion +
  *     JDBC read-back) runs unchanged over the encrypted session.
  *
  * The non-TLS path stays covered by PostgresUpsertSpec (ssl=off cluster,
  * default sslmode=prefer falling back on the server's 'N').
  */
class PostgresTlsSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private var server: PgServerFixture.Running = _
  private def url = server.url

  private def props(sslmode: String, rootCert: Option[String] = None) = {
    val p = server.props
    p.setProperty("sslmode", sslmode)
    rootCert.foreach(p.setProperty("sslrootcert", _))
    p
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (PgServerFixture.available) {
      PgWireDriver.ensureRegistered()
      server = PgServerFixture.start(ssl = true)
    }
  }

  override def afterAll(): Unit = {
    try if (server != null) PgServerFixture.stop(server)
    finally super.afterAll()
  }

  test("hostssl cluster rejects a plaintext client (sslmode=disable)") {
    assume(PgServerFixture.available, "no postgres installation in sandbox")
    val e = intercept[SQLException] {
      DriverManager.getConnection(url, props("disable")).close()
    }
    // server-side pg_hba rejection, not a client artifact
    assert(e.getMessage.toLowerCase.contains("pg_hba") ||
      e.getSQLState == "28000", s"unexpected: ${e.getMessage}")
  }

  test("sslmode=require: TLS handshake + SCRAM channel binding (SCRAM-SHA-256-PLUS)") {
    assume(PgServerFixture.available, "no postgres installation in sandbox")
    val proto = new PgProtocol("127.0.0.1", server.port, "postgres",
      "postgres", Some(PgServerFixture.Password),
      PgTls.Config(PgTls.Require))
    try {
      assert(proto.tlsActive, "session is not inside TLS")
      // PG 15 advertises -PLUS over TLS; the client must have bound
      assert(proto.authMechanism === Scram.MechanismPlus)
      val r = proto.query("SELECT ssl FROM pg_stat_ssl WHERE pid = pg_backend_pid()")
      assert(r.head.rows.head(0) === "t", "server does not see the session as SSL")
    } finally proto.close()
  }

  test("verify-ca: fixture certificate validates; a decoy root is rejected") {
    assume(PgServerFixture.available, "no postgres installation in sandbox")
    val conn = DriverManager.getConnection(url,
      props("verify-ca", server.certFile))
    try {
      val rs = conn.createStatement().executeQuery("SELECT 41 + 1")
      assert(rs.next() && rs.getInt(1) === 42)
    } finally conn.close()

    val decoy = PgServerFixture.selfSignedCert(
      s"/tmp/graft_decoy_${System.nanoTime()}", "decoy")
    val e = intercept[Exception] {
      DriverManager.getConnection(url, props("verify-ca", Some(decoy))).close()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).toSeq
    assert(chain.exists(t => t.isInstanceOf[javax.net.ssl.SSLException] ||
      t.isInstanceOf[java.security.cert.CertificateException] ||
      Option(t.getMessage).exists(_.toLowerCase.contains("cert"))),
      s"expected a certificate failure, got: $e")
  }

  test("full upsert + promotion + Spark JDBC read-back over TLS") {
    assume(PgServerFixture.available, "no postgres installation in sandbox")
    val p = props("verify-ca", server.certFile)
    val t = "tracking_tls"
    val batch1 = Seq(("k1", "v1"), ("k2", "v1")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch1, url, t, "oid__id", p)
    val batch2 = Seq(("k2", "v2"), ("k3", "v2")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch2, url, t, "oid__id", p)

    val back = spark.read.jdbc(url, t, p)
      .as[(String, String)].collect().toMap
    assert(back === Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v2"))
  }
}
