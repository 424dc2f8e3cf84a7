package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point-in-time row to every interval
  * containing it — `p.ts ∈ [i.start, i.end)` — without the cartesian
  * blow-up a raw inequality theta-join produces (Spark plans those as
  * BroadcastNestedLoopJoin: O(N×M) comparisons).
  *
  * Technique: bucketize time into fixed-width grid cells. Each interval
  * explodes to the cells it overlaps; each point maps to exactly one
  * cell; an EQUI-join on the cell id finds all candidates, and the exact
  * predicate filters them. With `cellWidth` ≈ the typical interval
  * length, each interval lands in O(1) cells and the join is a plain
  * hash-partitioned shuffle — linear, AQE-skew-splittable, the standard
  * distributed interval-join shape.
  *
  * Intervals are half-open `[start, end)`; both sides in epoch seconds
  * resolution of `cellWidth`.
  */
object RangeJoin {

  /** Inner range join. A point lives in exactly one cell, so every true
    * (point, interval) match is found exactly once — no dedup needed.
    * (For left-outer semantics, anti-join the points against this result
    * and union with null payload — composition, not a mode flag, because
    * a cell match that fails the exact predicate must not suppress the
    * null extension.)
    *
    * @param points     frame with `ptsCol` (timestamp)
    * @param intervals  frame with `startCol`/`endCol` (timestamps)
    * @param cellWidthSeconds grid cell width — tune to median interval
    */
  def join(points: DataFrame, intervals: DataFrame,
      ptsCol: String, startCol: String, endCol: String,
      cellWidthSeconds: Long,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    val w = lit(cellWidthSeconds)
    val pCell = points.withColumn("__cell",
      floor(unix_timestamp(col(ptsCol)) / w))
    val iCells0 = intervals
      // Degenerate/inverted intervals ([start,end) with end <= start)
      // match nothing, and `sequence(hi, lo)` would DESCEND — one badly
      // inverted row would explode to a huge cell array. Drop them
      // before the explode; semantics are unchanged.
      .filter(col(endCol) > col(startCol))
      .withColumn("__cell", explode(sequence(
        floor(unix_timestamp(col(startCol)) / w),
        // end is exclusive: a cell is touched iff start <= cell_end
        floor((unix_timestamp(col(endCol)) - 1) / w))))
    // extra equi keys (e.g. entity id) ride the same shuffle
    val iCells = equiKeys.foldLeft(iCells0) { case (df, (pk, ik)) =>
      df.withColumnRenamed(ik, pk)
    }
    pCell.join(iCells, "__cell" +: equiKeys.map(_._1))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) < col(endCol))
      .drop("__cell")
  }
}
