package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("grid range join == theta join, including cell-boundary cases") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start (inclusive)
      (2L, ts("2024-01-01 11:59:59")),
      (3L, ts("2024-01-01 12:00:00")), // == end (exclusive)
      (4L, ts("2024-01-05 00:00:00")), // no interval
      (5L, ts("2024-01-02 06:00:00"))  // interval spanning cells
    ).toDF("pid", "pts")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 12:00:00")),
      (101L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")),
      (102L, ts("2024-01-01 06:00:00"), ts("2024-01-02 12:00:00")) // overlaps 100/101 span
    ).toDF("iid", "istart", "iend")

    val grid = RangeJoin.join(points, intervals, "pts", "istart", "iend",
        cellWidthSeconds = 6 * 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val theta = points.join(intervals,
        col("pts") >= col("istart") && col("pts") < col("iend"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(grid == theta)
    assert(grid.contains((1L, 100L)) && !grid.exists(_._1 == 3L && grid.exists(_._2 == 100L) &&
      grid.contains((3L, 100L))))
    assert(!grid.exists(_._1 == 4L))
  }

  test("degenerate and inverted intervals are dropped before the explode") {
    val points = Seq((1L, ts("2024-01-01 01:00:00"))).toDF("pid", "pts")
    val intervals = Seq(
      (300L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")), // empty
      // badly inverted: a descending sequence here would be ~5M cells
      (301L, ts("2024-01-10 00:00:00"), ts("2014-01-01 00:00:00")),
      (302L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))  // sane
    ).toDF("iid", "istart", "iend")
    val got = RangeJoin.join(points, intervals, "pts", "istart", "iend",
        cellWidthSeconds = 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 302L)))
  }

  test("equi keys restrict matches within the same cells") {
    val points = Seq((7L, 1L, ts("2024-01-01 01:00:00"))).toDF("pid", "k", "pts")
    val intervals = Seq(
      (200L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      (201L, 2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("iid", "ik", "istart", "iend")
    val got = RangeJoin.join(points, intervals, "pts", "istart", "iend",
        cellWidthSeconds = 86400, equiKeys = Seq("k" -> "ik"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((7L, 200L)))
  }
}
