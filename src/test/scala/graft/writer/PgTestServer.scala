package graft.writer

import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** Boots a throwaway PostgreSQL server from the container's postgres
  * binaries (unix socket only, trust auth, superuser `graft`) for
  * live integration specs — shared by `PgLiveSpec` (the writer SQL
  * surface) and the composed Quick-Start e2e. `start()` returns false
  * when the binaries are absent or the server cannot boot so suites
  * can `assume`-cancel instead of failing in minimal environments.
  */
final class PgTestServer {

  private def findBin(name: String): Option[String] =
    Seq(s"/usr/local/bin/$name", s"/usr/bin/$name", s"/usr/lib/postgresql/15/bin/$name")
      .find(p => Files.isExecutable(Paths.get(p)))

  private var dir: Path = _
  private var sock: String = _
  var lastBootLog: String = ""

  // initdb refuses to run as root; the sandbox runs tests as root, so
  // server-side commands drop to `nobody` via runuser when needed
  private def serverCmd(cmd: Seq[String]): Seq[String] =
    if (System.getProperty("user.name") == "root")
      Seq("runuser", "-u", "nobody", "--") ++ cmd
    else cmd

  // stdout and stderr arrive on separate pump threads — appends must
  // synchronize or the shared builder corrupts under interleaving
  private def collectingLogger(out: StringBuilder): ProcessLogger = {
    def add(s: String): Unit = out.synchronized {
      out.append(s).append('\n'); ()
    }
    ProcessLogger(add, add)
  }

  private def runIn(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(cmd, new java.io.File("/tmp")).!(collectingLogger(out))
    (code, out.synchronized(out.toString))
  }

  def start(): Boolean =
    (findBin("initdb"), findBin("pg_ctl"), findBin("psql")) match {
      case (Some(initdb), Some(pgCtl), Some(_)) =>
        dir = Files.createTempDirectory("graft-pg")
        sock = dir.resolve("sock").toString
        Files.createDirectories(Paths.get(sock))
        // the nobody user must own the data dir and socket dir
        runIn(Seq("chmod", "-R", "777", dir.toString))
        val (initCode, initOut) = runIn(serverCmd(Seq(
          initdb, "-D", s"$dir/data", "-A", "trust", "-U", "graft")))
        if (initCode != 0) { lastBootLog = initOut; false }
        else {
          val (startCode, startOut) = runIn(serverCmd(Seq(
            pgCtl, "-D", s"$dir/data",
            "-o", s"-c listen_addresses='' -k $sock",
            "-l", s"$dir/pg.log", "-w", "start")))
          lastBootLog = startOut
          startCode == 0
        }
      case _ =>
        lastBootLog = "postgres binaries not found"
        false
    }

  def stop(): Unit =
    if (dir != null)
      findBin("pg_ctl").foreach(pgCtl =>
        runIn(serverCmd(Seq(pgCtl, "-D", s"$dir/data", "-w", "-m", "fast", "stop"))))

  /** Run SQL via psql; returns (exit code, combined trimmed output). */
  def sqlRaw(q: String): (Int, String) = {
    val (code, out) = runIn(Seq(findBin("psql").get, "-h", sock, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-tAc", q))
    (code, out.trim)
  }

  /** Run a full SQL script fed on stdin (one psql process — the same
    * channel shape for INSERT scripts and COPY-with-inline-data
    * scripts, so throughput comparisons don't measure process forks).
    */
  def scriptRaw(script: String): (Int, String) = {
    val out = new StringBuilder
    val cmd = Seq(findBin("psql").get, "-h", sock, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-q", "-f", "-")
    val code = (Process(cmd, new java.io.File("/tmp")) #<
      new java.io.ByteArrayInputStream(script.getBytes("UTF-8")))
      .!(collectingLogger(out))
    (code, out.synchronized(out.toString).trim)
  }

  /** Run a `COPY … FROM STDIN` statement via psql, feeding `data`
    * (already COPY-text-encoded) on stdin — the live channel for the
    * writer's COPY fast path, whose encoded stream is identical to
    * what `PostgresWriter.copyInto` hands pgjdbc.
    */
  def copyRaw(copyStatement: String, data: String): (Int, String) = {
    val out = new StringBuilder
    val cmd = Seq(findBin("psql").get, "-h", sock, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-c", copyStatement)
    val code = (Process(cmd, new java.io.File("/tmp")) #<
      new java.io.ByteArrayInputStream(data.getBytes("UTF-8")))
      .!(collectingLogger(out))
    (code, out.synchronized(out.toString).trim)
  }
}

object PgTestServer {
  /** Fill JDBC `?` placeholders with SQL literals, in order — psql
    * has no extended protocol, so live specs inline the binds.
    */
  def fill(sqlText: String, lits: Seq[String]): String = {
    val it = lits.iterator
    val sb = new StringBuilder
    sqlText.foreach {
      case '?' => sb.append(it.next())
      case c => sb.append(c)
    }
    require(!it.hasNext, "too many literals")
    sb.toString
  }
}
