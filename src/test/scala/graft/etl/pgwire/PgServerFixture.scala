package graft.etl.pgwire

import java.io.File
import java.net.ServerSocket
import java.nio.file.{Files, Paths}

/** Starts a throwaway PostgreSQL 15 cluster for the pgwire/upsert specs:
  * initdb + pg_ctl from the system installation, trust auth, TCP on a
  * random free localhost port. When the JVM runs as root (the sandbox
  * default) the server processes run as the `postgres` system user via
  * runuser, since postgres refuses to start as root.
  *
  * All state lives under /tmp and is removed on stop. If no usable
  * installation exists the specs cancel (assume) rather than fail.
  */
object PgServerFixture {

  private val binDirCandidates =
    Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
      "/usr/lib/postgresql/14/bin", "/usr/local/bin")

  lazy val binDir: Option[String] =
    binDirCandidates.find(d => new File(d, "initdb").isFile &&
      new File(d, "pg_ctl").isFile && new File(d, "postgres").isFile)

  private def isRoot: Boolean = System.getProperty("user.name") == "root"

  private def hasPostgresUser: Boolean =
    try {
      val p = new ProcessBuilder("id", "-u", "postgres")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  lazy val available: Boolean =
    binDir.isDefined && (!isRoot || hasPostgresUser)

  /** Password every fixture server requires (since round 5 the default
    * cluster is initdb'd with -A scram-sha-256, matching both modern PG
    * defaults and the reference's password-bearing connection config,
    * credentials.json.example:1-11). */
  val Password = "graft-test-pw"

  final case class Running(port: Int, dataDir: String,
      certFile: Option[String] = None) {
    def url: String = s"jdbc:postgresql://127.0.0.1:$port/postgres"
    def props: java.util.Properties = {
      val p = new java.util.Properties()
      p.setProperty("user", "postgres")
      p.setProperty("password", Password)
      // makes Spark's DriverRegistry instantiate the pgwire driver by name
      p.setProperty("driver", classOf[PgWireDriver].getName)
      p
    }
  }

  /** Wrap a command so it runs as the postgres user when we're root. */
  private def asPg(cmd: Seq[String]): Seq[String] =
    if (isRoot) Seq("runuser", "-u", "postgres", "--") ++ cmd else cmd

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new File("/tmp")) // postgres user can't read /root/repo
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** initdb + start. Throws with the captured output on any failure —
    * callers have already checked [[available]].
    *
    * @param auth pg_hba auth method written by initdb -A for ALL
    *   connections: "scram-sha-256" (default — the pgwire client must
    *   complete a real RFC 7677 exchange) or "trust". For MD5 use
    *   [[switchToMd5]] after a trust start (PG 15's initdb hashes the
    *   bootstrap password with the default scram encryption, and a
    *   scram-stored verifier makes the server negotiate SASL even under
    *   an md5 hba line).
    */
  def start(auth: String = "scram-sha-256", ssl: Boolean = false,
      extraOpts: String = ""): Running = {
    val bin = binDir.getOrElse(sys.error("no postgres installation found"))
    val dataDir = s"/tmp/graft_pg_${System.nanoTime()}"
    val port = freePort()
    // --pwfile sets the bootstrap superuser password (scram-hashed)
    val pwFile = Paths.get(s"$dataDir.pw")
    Files.write(pwFile, (Password + "\n").getBytes)
    pwFile.toFile.setReadable(true, false)
    val initArgs = Seq(s"$bin/initdb", "-D", dataDir, "-A", auth,
      "-U", "postgres", "--no-sync") ++
      (if (auth == "trust") Seq.empty else Seq(s"--pwfile=$pwFile"))
    val (ic, iout) = run(asPg(initArgs))
    Files.deleteIfExists(pwFile)
    require(ic == 0, s"initdb failed ($ic):\n$iout")
    val cert = if (ssl) Some(makeSslFiles(dataDir)) else None
    cert.foreach { _ =>
      // TLS becomes MANDATORY for TCP clients: every `host` hba line
      // (written by initdb -A) flips to `hostssl`, so a plaintext startup
      // is rejected by the server, not merely unencrypted.
      val hba = Paths.get(dataDir, "pg_hba.conf")
      val lines = new String(Files.readAllBytes(hba),
        java.nio.charset.StandardCharsets.UTF_8)
      val rewritten = lines.linesIterator.map { l =>
        if (l.startsWith("host ") || l.startsWith("host\t")) "hostssl" + l.substring(4)
        else l
      }.mkString("\n") + "\n"
      Files.write(hba, rewritten.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val sslOpts = cert.map { crt =>
      val key = crt.stripSuffix(".crt") + ".key"
      s" -c ssl=on -c ssl_cert_file=$crt -c ssl_key_file=$key"
    }.getOrElse("")
    // timezone pinned: DATE_TRUNC over timestamptz follows the server
    // TimeZone, and the parity specs compare against Spark's UTC session
    // extraOpts: bench-only server settings (e.g. EtlScaleBench sizes
    // shared_buffers/max_wal_size to the batch — the standard bulk-load
    // tuning); specs leave it empty so they test stock-config behavior
    val opts = s"-p $port -c listen_addresses=127.0.0.1 " +
      s"-c unix_socket_directories=$dataDir -c fsync=off " +
      "-c synchronous_commit=off -c timezone=UTC" + sslOpts +
      (if (extraOpts.nonEmpty) " " + extraOpts else "")
    val (sc, sout) = run(asPg(Seq(s"$bin/pg_ctl", "-D", dataDir, "-w",
      "-o", opts, "-l", s"$dataDir/server.log", "start")))
    require(sc == 0, s"pg_ctl start failed ($sc):\n$sout")
    Running(port, dataDir, cert)
  }

  private def opensslBin: String =
    Seq("/usr/bin/openssl", "/usr/local/bin/openssl",
      "/root/miniconda/bin/openssl")
      .find(new File(_).isFile).getOrElse("openssl")

  /** Standalone self-signed cert (key next to it) — the TLS spec uses one
    * as a DECOY root to prove verify-ca actually verifies. */
  def selfSignedCert(prefix: String, cn: String): String = {
    val key = s"$prefix.key"
    val crt = s"$prefix.crt"
    val (gc, gout) = run(Seq(opensslBin, "req", "-x509", "-newkey", "rsa:2048",
      "-keyout", key, "-out", crt, "-days", "2", "-nodes", "-subj", s"/CN=$cn"))
    require(gc == 0, s"openssl req failed ($gc):\n$gout")
    crt
  }

  /** Self-signed server certificate for the fixture; the key must be
    * 0600 and owned by the server user (postgres checks at startup).
    * Returns the certificate path (the key sits next to it). */
  private def makeSslFiles(dataDir: String): String = {
    val dir = new File(s"$dataDir.ssl")
    require(dir.mkdirs(), s"cannot create $dir")
    val key = s"$dir/server.key"
    val crt = s"$dir/server.crt"
    val (gc, gout) = run(Seq(opensslBin, "req", "-x509", "-newkey", "rsa:2048",
      "-keyout", key, "-out", crt, "-days", "2", "-nodes",
      "-subj", "/CN=127.0.0.1"))
    require(gc == 0, s"openssl req failed ($gc):\n$gout")
    run(Seq("chmod", "755", dir.getPath))
    run(Seq("chmod", "600", key))
    run(Seq("chmod", "644", crt))
    if (isRoot) run(Seq("chown", "-R", "postgres", dir.getPath))
    crt
  }

  /** Flip a running (trust-started) cluster to MD5 challenge-response
    * auth: store an md5-hashed verifier for the superuser, rewrite
    * pg_hba.conf to `md5`, reload. New connections then get the
    * AuthenticationMD5Password (code 5) challenge. */
  def switchToMd5(r: Running): Unit = {
    PgWireDriver.ensureRegistered()
    val conn = java.sql.DriverManager.getConnection(r.url, {
      val p = new java.util.Properties()
      p.setProperty("user", "postgres")
      p.setProperty("driver", classOf[PgWireDriver].getName)
      p
    })
    try {
      val st = conn.createStatement()
      try {
        st.execute("SET password_encryption = 'md5'")
        st.execute(s"ALTER ROLE postgres PASSWORD '$Password'")
      } finally st.close()
    } finally conn.close()
    val hba = Paths.get(r.dataDir, "pg_hba.conf")
    val lines = new String(Files.readAllBytes(hba),
      java.nio.charset.StandardCharsets.UTF_8)
    val rewritten = lines.linesIterator.map { l =>
      if (l.trim.startsWith("#") || l.trim.isEmpty) l
      else l.replaceAll("trust\\s*$", "md5")
    }.mkString("\n") + "\n"
    Files.write(hba, rewritten.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bin = binDir.get
    val (rc, rout) = run(asPg(Seq(s"$bin/pg_ctl", "-D", r.dataDir, "reload")))
    require(rc == 0, s"pg_ctl reload failed ($rc):\n$rout")
  }

  def stop(r: Running): Unit = {
    binDir.foreach { bin =>
      run(asPg(Seq(s"$bin/pg_ctl", "-D", r.dataDir, "-m", "immediate", "stop")))
    }
    // data dir was created by the postgres user; we're root (or the owner)
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      Files.deleteIfExists(Paths.get(f.getPath)); ()
    }
    try rm(new File(r.dataDir)) catch { case _: Throwable => () }
    try rm(new File(r.dataDir + ".ssl")) catch { case _: Throwable => () }
  }
}
