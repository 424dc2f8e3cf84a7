package graft.control

import java.nio.file.{Files, Paths}
import graft.GraftSession

/** CLI — the reference daemon's verbs (`cerebro [--profile P] start`,
  * `status`, cerebro/__main__.py:30-143) over the config-driven engine.
  *
  * {{{
  * sbt "runMain graft.control.Main start --config etc/graft.yaml \
  *      [--profile P] [--workdir /tmp/graft] [--duration-s 60]"
  * }}}
  *
  * `status` is printed on a timer while running (stdout replaces the
  * reference's Unix status socket; the verbs survive, the transport
  * doesn't — SURVEY.md §7.5).
  */
object Main {
  def main(args: Array[String]): Unit = {
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    args.headOption match {
      case Some("start") =>
        val configPath = opt("--config").getOrElse(sys.error("--config required"))
        val workDir = opt("--workdir").getOrElse("/tmp/graft-work")
        val duration = opt("--duration-s").map(_.toLong)
        val spark = GraftSession.get(opt("--master").getOrElse("local[*]"))
        val cfg = EngineConfig.parse(
          Files.readString(Paths.get(configPath)), opt("--profile"))
        val engine = new Engine(spark)
        engine.start(cfg, workDir)
        println(s"[graft] started ${cfg.sources.size} source(s), " +
          s"${cfg.observers.size} observer(s); workdir=$workDir")
        val deadline = duration.map(System.currentTimeMillis() + _ * 1000)
        while (deadline.forall(_ > System.currentTimeMillis()) &&
            engine.status.values.exists(identity)) {
          engine.awaitAnyTermination(10000)
          println(s"[graft] status: " + engine.status.map { case (k, v) =>
            s"$k=${if (v) "RUNNING" else "STOPPED"}" }.mkString(" "))
        }
        engine.stopAll()
        spark.stop()
      case other =>
        System.err.println(s"usage: start --config <yaml> [--profile P] " +
          s"[--workdir D] [--duration-s N]; got: ${other.getOrElse("")}")
        sys.exit(2)
    }
  }
}
