package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-based rolling windows — the Spark form of the reference's
  * `rolling_mean_by` / `rolling_max_by` wind & gust analysis
  * (cerebro/tools.py:248-272, operators R11/R12 in SURVEY.md §2.3).
  *
  * Scale note: the reference computes one global rolling series (a single
  * station's weather, thousands of rows). A global `Window.orderBy` in Spark
  * collapses to ONE partition — wrong at 100 TB. The API therefore requires
  * partition keys; per-entity rolling series (per device, per user, per
  * measurement) is the scalable semantics, and passing no keys is an
  * explicit, documented opt-in for small frames.
  */
object Rolling {

  /** A range-frame window over event-time, partitioned by `keys`.
    * Ordering is on `unix_micros(ts)` so the frame bound is exact
    * microseconds — matching what an oracle computes with `epoch_us`.
    */
  def timeWindow(tsCol: Column, windowSeconds: Long, keys: Column*): WindowSpec = {
    val base = if (keys.isEmpty) Window.partitionBy() else Window.partitionBy(keys: _*)
    base.orderBy(unix_micros(tsCol))
      .rangeBetween(-windowSeconds * 1000000L, Window.currentRow)
  }

  /** R11 — rolling time-window mean of `value` over trailing `windowSeconds`. */
  def rollingMean(value: Column, tsCol: Column, windowSeconds: Long, keys: Column*): Column =
    avg(value).over(timeWindow(tsCol, windowSeconds, keys: _*))

  /** R12 — rolling time-window max (wind gusts, tools.py:258-264). */
  def rollingMax(value: Column, tsCol: Column, windowSeconds: Long, keys: Column*): Column =
    max(value).over(timeWindow(tsCol, windowSeconds, keys: _*))

  /** Rolling count in the trailing window (rate estimation). */
  def rollingCount(value: Column, tsCol: Column, windowSeconds: Long, keys: Column*): Column =
    count(value).over(timeWindow(tsCol, windowSeconds, keys: _*))

  /** The reference's full wind pipeline shape: for each (colName -> agg)
    * add columns `<colName>_<label>` for every window in `windows`
    * (tools.py:248-272 builds 5m/10m/30m means and gusts). */
  def withRollingColumns(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      windows: Seq[(String, Long)],
      cols: Seq[(String, String)]): DataFrame = {
    val keyCols = keys.map(col)
    windows.foldLeft(df) { case (acc, (label, seconds)) =>
      cols.foldLeft(acc) { case (acc2, (c, aggName)) =>
        val w = timeWindow(col(tsCol), seconds, keyCols: _*)
        val agg = aggName match {
          case "mean" => avg(col(c))
          case "max" => max(col(c))
          case "min" => min(col(c))
          case other => throw new IllegalArgumentException(s"unsupported rolling agg: $other")
        }
        acc2.withColumn(s"${c}_$label", agg.over(w))
      }
    }
  }
}
