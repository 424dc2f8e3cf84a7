package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the canonical time-series enrichment
  * the reference delegates to InfluxDB/Flux. For each left row, attach the
  * latest right row with `right.time <= left.time` on the same key.
  *
  * Implementation is the scalable union+window pattern rather than a
  * per-left-row subquery: tag both sides, union, then a single window
  * partitioned by key and ordered by (time, side) carries the last seen
  * right payload forward with `last(_, ignoreNulls = true)`.
  *
  * Scale: exactly ONE shuffle (by key) and one sorted scan per partition —
  * the same cost profile as a sort-merge join, with no risk of the
  * row-explosion an inequality theta-join would cause. Skewed keys behave
  * like any windowed aggregation (AQE-splittable input, one entity's
  * timeline per task).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its latest-at-or-before row is attached)
    * @param leftKey    join key column on `left`
    * @param rightKey   join key column on `right`
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    columns of `right` to carry (null when no match yet)
    * @param tiebreaker column of `right` ordering simultaneous right rows;
    *                   the greatest wins (must be unique per key+time for
    *                   deterministic output)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreaker: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right, 1 = left: at equal times the right row sorts first,
    // so `<=` (at-or-before) semantics hold.
    val taggedRight = right.select(
      (Seq(col(rightKey).as("__key"), col(rightTime).as("__time"), lit(0).as("__side"),
        col(tiebreaker).as("__tie"),
        struct(payload.map(col): _*).as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(leftKey).as("__key"), col(leftTime).as("__time"), lit(1).as("__side"),
        lit(null).cast(right.schema(tiebreaker).dataType).as("__tie"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col)): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__matched.$p").as(p))): _*)
  }
}
