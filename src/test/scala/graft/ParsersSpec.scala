package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.Parsers

class ParsersSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:05")

  test("govee: parses temp+hum points, drops not-found/mismatch/stale") {
    val raw = Seq(
      ("A4:C1:38:01 23.5 45.0 x 2024-01-01T00:00:00", t0), // good
      ("?", t0), // not found
      ("FF:FF:FF:FF 10.0 20.0 x 2024-01-01T00:00:00", t0), // wrong address
      ("A4:C1:38:01 23.5 45.0 x 2023-12-31T23:59:00", t0)  // stale (>20s)
    ).toDF("raw", "recv_time")
    val pts = Parsers.govee(raw, "a4:c1:38:01", "gv1", delaySeconds = 10)
    val rows = pts.orderBy("measurement").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("humidity", "temperature"))
    val temp = rows(1)
    assert(temp.getAs[Map[String, Double]]("fields") == Map("value" -> 23.5))
    assert(temp.getAs[Map[String, String]]("tags") ==
      Map("address" -> "A4:C1:38:01", "device" -> "gv1"))
    assert(temp.getAs[Timestamp]("time") == Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("sens4: regex-parses the 4 floats, drops garbage") {
    val raw = Seq(
      ("@253ACKQ1.23E-04,2.34E-02,3.45E-03,25.40,junk\\", t0),
      ("garbage", t0)
    ).toDF("raw", "recv_time")
    val rows = Parsers.sens4(raw, ccd = "r1").collect()
    assert(rows.length == 1)
    val f = rows(0).getAs[Map[String, Double]]("fields")
    assert(f("pz") == 1.23e-4 && f("pir") == 2.34e-2 && f("cmb") == 3.45e-3 && f("temp") == 25.40)
    assert(rows(0).getAs[Map[String, String]]("tags") == Map("ccd" -> "r1"))
  }

  test("ln2Scale: extracts the pound weight") {
    val raw = Seq(("ST,GS, 123.45 lb\r", t0), ("nope", t0)).toDF("raw", "recv_time")
    val rows = Parsers.ln2Scale(raw).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Map[String, Double]]("fields") == Map("value" -> 123.45))
    assert(rows(0).getString(0) == "ln2_weigth")
  }

  test("thermistors: hex mask to 16 per-channel points with mapped names") {
    val raw = Seq(("!010005\r", t0)).toDF("raw", "recv_time") // 0x0005 = ch0, ch2
    val rows = Parsers.thermistors(raw,
        Map("channel0" -> "ln2_r1", "channel2" -> "ccd_b2"))
      .collect()
    assert(rows.length == 16)
    val byField = rows.map(r => r.getAs[Map[String, Double]]("fields").head).toMap
    assert(byField("channel0") == 1.0 && byField("channel2") == 1.0 && byField("channel1") == 0.0)
    val names = rows.map(r => r.getAs[Map[String, String]]("tags")("channel_name")).toSet
    assert(names.contains("ln2_r1") && names.contains("ccd_b2") && names.contains(""))
  }

  test("driftDevices: relay decode + units/offset tags") {
    val readings = Seq(
      ("relay1", "closed", "relay", 0, t0),
      ("temp1", "21.5", "degC", 40, t0)
    ).toDF("device", "raw_value", "units", "offset", "recv_time")
    val rows = Parsers.driftDevices(readings).collect()
    val relay = rows.find(_.getAs[Map[String, Double]]("fields").contains("relay1")).get
    assert(relay.getAs[Map[String, Double]]("fields")("relay1") == 1.0)
    assert(!relay.getAs[Map[String, String]]("tags").contains("units"))
    val temp = rows.find(_.getAs[Map[String, Double]]("fields").contains("temp1")).get
    assert(temp.getAs[Map[String, String]]("tags") == Map("units" -> "degC", "offset" -> "40"))
  }

  test("fileExists: poll fn probes the filesystem; parser emits file_exists points") {
    // S6 (lvm.py:287-309): the poll fn is the driver half...
    val f = java.nio.file.Files.createTempFile("graft-exists-", ".dat")
    val poll = Parsers.checkFileExistsPoll(f.toString)
    assert(poll() == Seq("1"))
    java.nio.file.Files.delete(f)
    assert(poll() == Seq("0"))
    // ...and the parser is the distributed half: basename field, 1/0
    // value, full_path tag
    val raw = Seq(("1", t0), ("0", t0), ("garbage", t0)).toDF("raw", "recv_time")
    val rows = Parsers.fileExists(raw, "/data/agcam/last_image.fits").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(0) == "file_exists"))
    assert(rows.map(_.getAs[Map[String, Double]]("fields")).toSet ==
      Set(Map("last_image.fits" -> 1.0), Map("last_image.fits" -> 0.0)))
    assert(rows.forall(_.getAs[Map[String, String]]("tags") ==
      Map("full_path" -> "/data/agcam/last_image.fits")))
  }

  test("tpmSnapshot: dict snapshot becomes one tpm point; empty/non-numeric dropped") {
    // S14 (tpm.py:75-93): the PLC state dict, one JSON line per tick
    val raw = Seq(
      ("""{"alt_pos": 45.2, "az_pos": 121.9, "dome_state": 1}""", t0),
      ("""{}""", t0),                   // empty snapshot -> dropped (tpm.py:82)
      ("""{"note": "text-only"}""", t0), // all-non-numeric -> dropped
      ("not json", t0)
    ).toDF("raw", "recv_time")
    val rows = Parsers.tpmSnapshot(raw).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "tpm")
    assert(rows(0).getAs[Map[String, Double]]("fields") ==
      Map("alt_pos" -> 45.2, "az_pos" -> 121.9, "dome_state" -> 1.0))
    assert(rows(0).getAs[Timestamp]("time") == t0)
  }

  test("tpmSnapshot: heterogeneous snapshot keeps numeric siblings of string entries") {
    // A realistic PLC tick mixes numeric readings and status strings
    // (tpm.py:84-87 ships the whole dict); one string entry must not
    // discard the tick — only the non-numeric entries are dropped.
    val raw = Seq(
      ("""{"temp": 1.5, "status": "OK", "rpm": 7.25e2, "ok": true}""", t0)
    ).toDF("raw", "recv_time")
    val rows = Parsers.tpmSnapshot(raw).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Map[String, Double]]("fields") ==
      Map("temp" -> 1.5, "rpm" -> 725.0))
  }
}
