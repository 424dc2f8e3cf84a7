package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.model.TelemetryPoint
import graft.transforms.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("T8 relayDecode: closed/open/other") {
    val df = Seq("closed", "open", "CLOSED", "weird", null)
      .toDF("s").select(Transforms.relayDecode(col("s")).as("b"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq ==
      Seq(true, false, true, null, null))
  }

  test("T12 bitUnpack: hex bitmask to per-channel bits") {
    val df = Seq(("d1", "A")).toDF("id", "hex") // 0xA = 1010
    val out = Transforms.bitUnpack(df, "hex", 4)
      .orderBy("channel").select("channel", "bit").as[(Int, Long)].collect()
    assert(out.toSeq == Seq((0, 0L), (1, 1L), (2, 0L), (3, 1L)))
  }

  test("T13 voltsToTorr matches the reference calibration formula") {
    val v = 5.0
    val expected = math.pow(10, 2.04545 * v - 6.86373) * 0.00750062
    val got = Seq(v).toDF("v").select(Transforms.voltsToTorr(col("v")))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("R8/R13 unit conversions") {
    val got = Seq((212.0, 80.0)).toDF("f", "rh")
      .select(Transforms.fahrenheitToCelsius(col("f")),
        Transforms.dewPoint(lit(20.0), col("rh")))
      .as[(Double, Double)].head()
    assert(got == ((100.0, 16.0)))
  }

  test("R14 floatsToF32 downcasts doubles only") {
    val df = Seq((1.5, 2L, "x")).toDF("d", "l", "s")
    val out = Transforms.floatsToF32(df)
    assert(out.schema("d").dataType == FloatType)
    assert(out.schema("l").dataType == LongType)
    assert(out.schema("s").dataType == StringType)
  }

  test("T2 flattenStructs produces dotted columns, keeps arrays") {
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", Row(1, Seq(7, 8)))),
      StructType(Seq(
        StructField("id", StringType),
        StructField("nest", StructType(Seq(
          StructField("x", IntegerType),
          StructField("arr", ArrayType(IntegerType))))))))
    val out = Transforms.flattenStructs(df)
    assert(out.columns.toSeq == Seq("id", "nest.x", "nest.arr"))
    assert(out.select(col("`nest.arr`")).as[Seq[Int]].head() == Seq(7, 8))
  }

  test("T5/T10/T11 normalize: drops empty, stamps time, merges global tags") {
    val pts = Seq(
      TelemetryPoint("m1", Map("a" -> "1"), Map("f" -> 1.0), null, null, None, None),
      TelemetryPoint("m2", Map.empty, Map.empty, null, null, None, None))
    val out = Transforms.normalize(Map("site" -> "APO"))(pts.toDF())
    val rows = out.collect()
    assert(rows.length == 1) // empty point dropped
    val tags = rows(0).getAs[Map[String, String]]("tags")
    assert(tags == Map("a" -> "1", "site" -> "APO"))
    assert(!rows(0).isNullAt(rows(0).fieldIndex("time"))) // time stamped
  }
}
