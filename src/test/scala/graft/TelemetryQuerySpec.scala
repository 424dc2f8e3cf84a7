package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model.TelemetryPoint
import graft.query.TelemetryQuery

class TelemetryQuerySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    TelemetryPoint("weather", Map("site" -> "APO"),
      Map("temp" -> 20.0, "rh" -> 40.0), null, ts("2024-01-01 00:00:00"), None, None),
    TelemetryPoint("weather", Map("site" -> "APO"),
      Map("temp" -> 21.0), null, ts("2024-01-01 00:01:00"), None, None),
    TelemetryPoint("weather", Map("site" -> "LCO"),
      Map("temp" -> 30.0), null, ts("2024-01-01 00:00:00"), None, None),
    TelemetryPoint("seeing", Map("site" -> "APO"),
      Map("fwhm" -> 1.1), null, ts("2024-01-01 00:00:00"), None, None)
  ).toDF()

  test("Q1-Q4: range + measurement + tag + field filters compose") {
    val q = TelemetryQuery.fromDF(points)
      .range(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:30"))
      .measurement("weather")
      .tag("site", "APO")
      .fields("temp")
    val rows = q.toDF.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Map[String, Double]]("fields") == Map("temp" -> 20.0))
  }

  test("Q5 pivot widens field map to columns") {
    val wide = TelemetryQuery.fromDF(points)
      .measurement("weather")
      .withPivotValues(Seq("temp", "rh"))
      .pivot()
    assert(wide.columns.contains("temp") && wide.columns.contains("rh"))
    val apo0 = wide.filter(element_at(col("tags"), "site") === "APO" &&
        col("time") === ts("2024-01-01 00:00:00")).head()
    assert(apo0.getAs[Double]("temp") == 20.0 && apo0.getAs[Double]("rh") == 40.0)
    val apo1 = wide.filter(element_at(col("tags"), "site") === "APO" &&
        col("time") === ts("2024-01-01 00:01:00")).head()
    assert(apo1.isNullAt(apo1.fieldIndex("rh"))) // missing field -> null
  }
}
