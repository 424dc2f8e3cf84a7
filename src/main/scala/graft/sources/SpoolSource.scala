package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.control.EngineConfig.SourceConf

/** Config-driven streaming source: a raw-reply spool directory (what a
  * [[PollingSource]] writes, or any external process appending
  * `raw\tepochMillis` text files) parsed by a named wire parser — the
  * YAML-expressible form of the reference's per-device source entries
  * (cerebro/etc/cerebro.yaml sources). */
final case class SpoolSource(conf: SourceConf) extends TelemetrySource {
  def name: String = conf.name
  def bucket: Option[String] = conf.bucket
  def tags: Map[String, String] = conf.tags

  private def opt(key: String): Option[String] = conf.options.get(key).map(_.toString)
  private def req(key: String): String =
    opt(key).getOrElse(throw new IllegalArgumentException(s"$name: missing option '$key'"))

  def stream(spark: SparkSession): DataFrame = {
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(req("path"))
      .select(
        regexp_extract(col("value"), "^(.*)\\t([0-9]+)$", 1).as("raw"),
        timestamp_millis(
          regexp_extract(col("value"), "^(.*)\\t([0-9]+)$", 2).cast(LongType))
          .as("recv_time"))
    val b = bucket.getOrElse("sensors")
    req("parser") match {
      case "govee" => Parsers.govee(raw, req("address"),
        opt("device").getOrElse(""), opt("delay").map(_.toLong).getOrElse(10L), b)
      case "sens4" => Parsers.sens4(raw, opt("ccd").getOrElse("NA"), b)
      case "ln2_scale" => Parsers.ln2Scale(raw, b)
      case "lvm_thermistors" => Parsers.thermistors(raw,
        conf.options.get("mapping").map(_.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString }).getOrElse(Map.empty),
        opt("channels").map(_.toInt).getOrElse(16), b)
      case "check_file_exists" => Parsers.fileExists(raw, req("file"), b)
      case "tpm" => Parsers.tpmSnapshot(raw, b)
      case other => throw new IllegalArgumentException(s"$name: unknown parser '$other'")
    }
  }
}
