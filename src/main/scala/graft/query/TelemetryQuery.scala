package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Point

/** Fluent read-side query builder — parity with the reference's Flux
  * builder `CerebroClient._build_query` (cerebro/client.py:57-91,
  * SURVEY.md §2.3 Q1-Q6): from(bucket) |> range |> filter(measurement)
  * |> filter(field) |> pivot.
  *
  * Where the reference string-concatenates Flux and ships it to InfluxDB,
  * here every step is a declarative DataFrame op, so Catalyst pushes the
  * range/measurement/field predicates into the parquet scan (check
  * `PushedFilters` in `.explain`) and prunes columns — the same pushdown
  * the reference gets "by construction", but optimizer-verified.
  */
final case class TelemetryQuery private (
    df: DataFrame,
    pivotValues: Option[Seq[String]]) {

  /** Q2 — absolute time range, inclusive start / exclusive end like Flux
    * `range(start, stop)`. */
  def range(start: java.sql.Timestamp, end: java.sql.Timestamp): TelemetryQuery =
    copy(df = df.filter(col(Point.Time) >= lit(start) && col(Point.Time) < lit(end)))

  /** Q2 — relative range: `last(15, "minutes")` ≈ Flux `range(start: -15m)`
    * (client.py:111-114), anchored on the current timestamp. */
  def last(amount: Int, unit: String): TelemetryQuery =
    copy(df = df.filter(col(Point.Time) >= current_timestamp() - expr(s"INTERVAL $amount $unit")))

  /** Q3 — measurement filter (client.py:80). */
  def measurement(m: String): TelemetryQuery =
    copy(df = df.filter(col(Point.Measurement) === lit(m)))

  /** Q4 — field filter: keep only the named keys of the dynamic field map
    * (client.py:82-83 ORs several `_field ==` filters). */
  def fields(names: String*): TelemetryQuery = {
    val keep = names.map(lit)
    copy(df = df.withColumn(Point.Fields,
      map_filter(col(Point.Fields), (k, _) => k.isin(keep: _*))))
  }

  /** Tag equality filter (Flux `r["tag"] == v` filters). */
  def tag(name: String, value: String): TelemetryQuery =
    copy(df = df.filter(element_at(col(Point.Tags), name) === lit(value)))

  /** Fix the output field columns ahead of time. Without this, `pivot`
    * must launch an extra distinct-values job — at 100 TB always declare
    * the expected fields. */
  def withPivotValues(values: Seq[String]): TelemetryQuery =
    copy(pivotValues = Some(values))

  /** Q5 — long→wide pivot (client.py:85-89): one row per (time, tags),
    * one column per field key, `max` as the value reducer (deterministic,
    * unlike `first`, and identical to the reference's single-value case).
    */
  def pivot(): DataFrame = {
    val exploded = df.select(
      col(Point.Time), col(Point.Measurement), col(Point.Tags),
      explode(col(Point.Fields)).as(Seq("__field", "__value")))
    val grouped = exploded.groupBy(col(Point.Time), col(Point.Measurement), col(Point.Tags))
    val piv = pivotValues match {
      case Some(vs) => grouped.pivot("__field", vs)
      case None => grouped.pivot("__field")
    }
    piv.max("__value")
  }

  /** Q6 — terminal: the query IS a DataFrame. */
  def toDF: DataFrame = df
}

object TelemetryQuery {
  /** Q1 — scan: `from(bucket: "...")`; a bucket is a parquet (or any
    * Spark-readable) path holding the uniform point schema. */
  def from(spark: SparkSession, bucketPath: String): TelemetryQuery =
    TelemetryQuery(spark.read.parquet(bucketPath), None)

  def fromDF(df: DataFrame): TelemetryQuery = TelemetryQuery(df, None)
}
