package graft.control

import java.nio.file.{Files, Paths}
import graft.GraftSession

/** CLI — the reference daemon's verbs (`cerebro [--profile P] start`,
  * `status`, `restart <source>`, cerebro/__main__.py:30-143) over the
  * config-driven engine.
  *
  * {{{
  * sbt "runMain graft.control.Main start --config etc/graft.yaml \
  *      [--profile P] [--sources a,b] [--workdir /tmp/graft] \
  *      [--duration-s 60] [--socket S]"
  * sbt "runMain graft.control.Main status [--socket S]"
  * sbt "runMain graft.control.Main restart <name> [--socket S]"
  * }}}
  *
  * `start` serves a [[StatusServer]] on a Unix domain socket (default
  * `/tmp/graft.sock` — the reference's `/tmp/cerebro.sock`,
  * cerebro.py:372-375), so `status` and `restart` run from a SECOND
  * process against the live engine, exactly like the reference CLI.
  */
object Main {

  /** Flags that consume the following token as their value — the scanner
    * for positional args must skip both. */
  private val flagsWithValue = Set("--socket", "--config", "--profile",
    "--workdir", "--duration-s", "--master", "--sources")

  /** First positional arg after the verb, skipping `--flag value` pairs —
    * so `restart --socket /tmp/g.sock pqr` resolves `pqr`, not the socket
    * path. */
  private[graft] def positional(args: Array[String]): Option[String] = {
    var i = 1
    while (i < args.length) {
      val a = args(i)
      if (flagsWithValue.contains(a)) i += 2
      else if (a.startsWith("--")) i += 1
      else return Some(a)
    }
    None
  }

  def main(args: Array[String]): Unit = {
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val socketPath = Paths.get(opt("--socket").getOrElse("/tmp/graft.sock"))
    args.headOption match {
      case Some("start") =>
        val configPath = opt("--config").getOrElse(sys.error("--config required"))
        val workDir = opt("--workdir").getOrElse("/tmp/graft-work")
        val duration = opt("--duration-s").map(_.toLong)
        val spark = GraftSession.get(opt("--master").getOrElse("local[*]"))
        val cfg = EngineConfig.selectSources(
          EngineConfig.parse(
            Files.readString(Paths.get(configPath)), opt("--profile")),
          opt("--sources"))
        val engine = new Engine(spark)
        engine.start(cfg, workDir)
        val statusServer = new StatusServer(engine, socketPath)
        statusServer.start()
        println(s"[graft] started ${cfg.sources.size} source(s), " +
          s"${cfg.observers.size} observer(s); workdir=$workDir; socket=$socketPath")
        val deadline = duration.map(System.currentTimeMillis() + _ * 1000)
        while (deadline.forall(_ > System.currentTimeMillis()) &&
            engine.status.values.exists(identity)) {
          engine.awaitAnyTermination(10000)
          println(s"[graft] status: " + engine.status.map { case (k, v) =>
            s"$k=${if (v) "RUNNING" else "STOPPED"}" }.mkString(" "))
        }
        statusServer.stop()
        engine.stopAll()
        spark.stop()
      case Some("status") =>
        // second-process status (cerebro/__main__.py:101-120): one line of
        // JSON from the socket, rendered one source per line — parsed
        // with a real JSON reader so names with , : " survive
        val reply = StatusServer.request(socketPath, "status")
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(reply)
        val fields = root.fields()
        while (fields.hasNext) {
          val e = fields.next()
          println(s"${e.getKey}: ${if (e.getValue.asBoolean) "OK" else "FAILED"}")
        }
      case Some("restart") =>
        // second-process restart (cerebro/__main__.py:123-143)
        val name = positional(args)
          .getOrElse(sys.error("restart requires a source name"))
        print("Restarting ... ")
        val reply = StatusServer.request(socketPath, s"restart $name")
        println(if (reply == "true") "SUCCESS" else "FAILED")
        if (reply != "true") sys.exit(1)
      case other =>
        System.err.println(s"usage: start --config <yaml> [--profile P] " +
          s"[--sources a,b] [--workdir D] [--duration-s N] | status | " +
          s"restart <name> [--socket S]; got: ${other.getOrElse("")}")
        sys.exit(2)
    }
  }
}
