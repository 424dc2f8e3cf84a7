package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.ActorReplies
import graft.sources.ActorReplies._
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Chunk
import graft.transforms.KeywordProcessor

/** S10 end-to-end: reassembleLines → ActorReplies.parse →
  * KeywordProcessor.process on reference-shaped reply lines
  * (cerebro/sources/tron.py:390-454), including keyword-dictionary
  * typing (`consume`) and broadcast filtering. */
class ActorRepliesSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private val dict = KeysDictionary("boss", Map(
    "ccdTemp" -> KeyDef(Seq(FloatType(units = "degC"))),
    "version" -> KeyDef(Seq(ActorReplies.StringType())),
    "motion" -> KeyDef(Seq(PvtType(name = "pos", units = "deg"))),
    "exposureState" -> KeyDef(Seq(
      ActorReplies.StringType(name = "state"),
      FloatType(name = "remaining", units = "s")))))

  test("parseLine: header fields, quoted values with embedded delimiters, bare keywords") {
    val r = parseLine("""12 1 i ccdTemp=-103.2; version="v1; 2,3"; idle""").get
    assert(r.header == ReplyHeader(12L, 1L, "i"))
    assert(r.keywords == Seq(
      ParsedKeyword("ccdTemp", Seq("-103.2")),
      ParsedKeyword("version", Seq("v1; 2,3")),
      ParsedKeyword("idle", Nil)))
    assert(parseLine("not a reply").isEmpty)
    assert(parseLine("""5 2 w bad="unterminated""").isEmpty)
  }

  test("consume: dictionary supplies names/units/types, enforces arity and syntax") {
    // PVT consumes THREE raw values into one triple
    val pvt = dict.get("motion").get.consume(Seq("10.0", "0.5", "4500.5")).get
    assert(pvt.size == 1 && pvt.head.name == "pos" && pvt.head.units == "deg" &&
      pvt.head.value == null && pvt.head.pvt.toSeq == Seq(10.0, 0.5, 4500.5))
    // arity mismatch → None
    assert(dict.get("motion").get.consume(Seq("10.0", "0.5")).isEmpty)
    // type mismatch (float slot fed a word) → None
    assert(dict.get("ccdTemp").get.consume(Seq("warm")).isEmpty)
    // lookup is case-insensitive (tron.py:416-417)
    assert(dict.get("CCDTEMP").nonEmpty)
    assert(dict.get("nope").isEmpty)
  }

  test("S10 chain runs as ONE continuous streaming pipeline") {
    // possible because KeywordProcessor is window-free (array-domain
    // derivation): stateful reassembly → parser → keyword processor →
    // sink, all inside a single streaming query
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val lines = StatefulOps.reassembleLines(in.toDS())
    // local val: closing over the suite field would capture (and fail to
    // serialize) the whole ScalaTest suite
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val replies = lines.map(l => ReplyLine(l.line, ts))
    val points = KeywordProcessor.process(ActorReplies.parse(replies, dict).toDF())
    val q = points.writeStream.queryName("s10_stream").format("memory")
      .outputMode("append").start()
    try {
      in.addData(Chunk("boss", 0, "12 1 i ccdTemp=-103.2\n"))
      q.processAllAvailable()
      in.addData(Chunk("boss", 1, "12 1 : exposureState=READING,7.5\n"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM s10_stream").collect()
      assert(rows.length == 3, s"1 ccdTemp + 2 exposureState values, got ${rows.length}")
      val fields = rows.flatMap(_.getAs[Map[String, Double]]("fields")).toMap
      assert(fields == Map("ccdTemp" -> -103.2, "exposureState_remaining" -> 7.5))
      val strs = rows.flatMap(_.getAs[Map[String, String]]("fields_str")).toMap
      assert(strs == Map("exposureState_state" -> "READING"))
    } finally q.stop()
  }

  test("S10 chain: reassembleLines → parse → KeywordProcessor.process") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS())
      .writeStream.queryName("s10_lines").format("memory")
      .outputMode("append").start()
    val lines = try {
      // four replies, chunked at hostile boundaries (mid-keyword,
      // mid-quoted-string), spread over two micro-batches
      in.addData(
        Chunk("boss", 0, "12 1 i ccdTemp=-103.2; versi"),
        Chunk("boss", 1, "on=\"v1; 2,3\"\n0 1 i ccdTemp=999.9\n"))
      q.processAllAvailable()
      in.addData(
        Chunk("boss", 2, "12 1 : motion=10.0,0.5,4500.5; unknownKw=5; exposureSta"),
        Chunk("boss", 3, "te=INTEGRATING,42.5\n12 1 w ccdTemp=warm\n"))
      q.processAllAvailable()
      spark.sql("SELECT line FROM s10_lines").as[String].collect().toSeq
    } finally q.stop()
    assert(lines.size == 4, s"expected 4 reassembled lines: $lines")

    val parsed = ActorReplies.parse(lines.map(ReplyLine(_, t0)).toDS(), dict)
    val rows = parsed.collect()
    // broadcast (commandId=0) dropped; unknownKw dropped; ccdTemp=warm
    // fails FloatType consume → dropped. Survivors: ccdTemp, version,
    // motion, exposureState.
    assert(rows.map(_.keyword).sorted.toSeq ==
      Seq("ccdTemp", "exposureState", "motion", "version"))
    val motion = rows.find(_.keyword == "motion").get.values.head
    assert(motion.name == "pos" && motion.units == "deg" &&
      motion.pvt.toSeq == Seq(10.0, 0.5, 4500.5))

    val points = KeywordProcessor.process(parsed.toDF(), bucket = "actors")
    val byField = points.collect().map { r =>
      val f = r.getAs[Map[String, Double]]("fields")
      val fs = r.getAs[Map[String, String]]("fields_str")
      val tags = r.getAs[Map[String, String]]("tags")
      (f, fs, tags, r.getAs[String]("measurement"))
    }
    assert(byField.forall(_._4 == "boss"))
    // single-value unnamed float keyword → bare field name + units tag
    assert(byField.exists { case (f, _, tags, _) =>
      f.get("ccdTemp").contains(-103.2) && tags.get("units").contains("degC") })
    // PVT explodes to _P/_V/_T off the dictionary-supplied value name
    assert(byField.exists { case (f, _, _, _) =>
      f.get("motion_pos_P").contains(10.0) && f.get("motion_pos_V").contains(0.5) &&
        f.get("motion_pos_T").contains(4500.5) })
    // named string value → fields_str; named float sibling → fields + units
    assert(byField.exists { case (_, fs, _, _) =>
      fs.get("exposureState_state").contains("INTEGRATING") })
    assert(byField.exists { case (f, _, tags, _) =>
      f.get("exposureState_remaining").contains(42.5) && tags.get("units").contains("s") })
    // quoted string with embedded delimiters survives intact
    assert(byField.exists { case (_, fs, _, _) =>
      fs.get("version").contains("v1; 2,3") })
  }
}
