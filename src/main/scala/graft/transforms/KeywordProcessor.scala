package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Point

/** T1 — the Tron/actor keyword processor (`process_keyword`,
  * cerebro/sources/tron.py:30-99) as a declarative flatMap.
  *
  * Input schema (one row per keyword update):
  * {{{
  * actor STRING, keyword STRING, recv_time TIMESTAMP,
  * values ARRAY<STRUCT<name STRING, units STRING, value STRING, pvt ARRAY<DOUBLE>>>
  * }}}
  *
  * Reproduced semantics, each with its reference line:
  *   - per-value field naming: `kw_name` when the key is named, bare `kw`
  *     for single-value keywords, positional `kw_i` otherwise (tron.py:45-51)
  *   - `units` promoted to a tag on that value's point (tron.py:54-55)
  *   - PVT triples exploded to `_P/_V/_T` fields (tron.py:58-64); other
  *     array values dropped with no point (tron.py:66-70)
  *   - configurable casts keyed `actor.keyword[_key]` (tron.py:75-84):
  *     "int" truncates, "float" passes through, "bool" maps falsy strings
  *     ("", "0", "false", "f") to 0
  *   - `keyword_tags`: the value at a configured index becomes a tag on
  *     every sibling point of the same keyword instance (tron.py:86-97)
  *
  * Numeric results land in `fields`; non-numeric, uncast values land in
  * `fields_str` (the dual-map model of SURVEY.md §7.4 #2 — the reference
  * ships heterogeneous dicts to InfluxDB, we keep both typed views).
  *
  * ==Execution shape==
  * One input row carries the WHOLE keyword, so every derived quantity —
  * the positional counter over parseable values, the keyword-tag lookup —
  * is row-scoped. It is therefore computed in the ARRAY domain
  * (`transform`/`filter` over `values` BEFORE the explode), not with
  * `Window.partitionBy(actor, keyword, recv_time)` over exploded rows:
  * the window form forced a shuffle for row-local semantics and made the
  * transform illegal on streaming DataFrames. This form is shuffle-FREE
  * and streaming-safe, so the full S10 chain
  * (`reassembleLines → ActorReplies.parse → process → sink`) runs as one
  * continuous streaming pipeline (asserted by ActorRepliesSpec). The
  * interpreted-HOF cost is bounded by values-per-keyword (≤ tens), not
  * corpus size — this is the ingest path, not the analytics hot path.
  */
object KeywordProcessor {

  final case class KeywordTagConf(index: Int, name: String)

  /** Typed hot-path twin of [[process]] — the same semantics as plain
    * JVM-compiled Scala over `Dataset[KeywordRow]` instead of
    * interpreted Catalyst higher-order functions. The declarative form
    * is the oracle-pinned reference (q52); this one exists because the
    * q52 16× audit measured the interpreted HOF evaluation as the
    * chain's remaining floor (~2.5 s/batch — SCALE.md "q52 audit").
    * PARITY IS HASH-CHECKED, not asserted: q83 runs the identical
    * replay chain through this path against q52's byte-identical
    * oracle SQL, and KeywordProcessorSpec compares both forms row-set
    * for row-set over the edge-case fixtures (pvt, named/positional
    * slots, casts, keyword_tags, malformed numerics, null raws).
    *
    * Two deliberate parity quirks reproduced from the declarative
    * form's three-valued logic: (a) a `bool` cast on a NULL raw value
    * yields 1.0 (the `when(isin...)` condition is null ⇒ otherwise
    * branch); (b) the keyword-tag value renders doubles via
    * `Double.toString` — the same shortest-round-trip form Spark's
    * double→string cast emits. */
  def processTyped(
      rows: org.apache.spark.sql.Dataset[graft.sources.ActorReplies.KeywordRow],
      tags: Map[String, String] = Map.empty,
      keywordTags: Map[String, KeywordTagConf] = Map.empty,
      casts: Map[String, String] = Map.empty,
      bucket: String = "actors"): org.apache.spark.sql.Dataset[graft.model.TelemetryPoint] = {
    import rows.sparkSession.implicits._
    val numRe = java.util.regex.Pattern.compile(
      "^[+-]?([0-9]*\\.)?[0-9]+([eE][+-]?[0-9]+)?$")
    val falsy = Set("", "0", "false", "f")
    rows.flatMap { r =>
      val values = Option(r.values).getOrElse(Seq.empty)
      val nValues = values.size
      final class D(val idx: Int, val parseable: Boolean, val fieldBase: String,
          val raw: String, val units: String, val pvt: Array[Double],
          val castVal: Option[Double], val ktv: String)
      var ii = 0 // parseable count of the PREFIX (tron.py:70-72)
      val derived = values.zipWithIndex.map { case (kv, i) =>
        val parseable = kv.pvt == null || kv.pvt.length == 3
        val keyName =
          if (kv.name != null && kv.name.nonEmpty) "_" + kv.name
          else if (nValues == 1) ""
          else "_" + ii
        if (parseable) ii += 1
        val fieldBase = r.keyword + keyName
        val raw = kv.value
        val numeric: Option[Double] =
          if (raw != null && numRe.matcher(raw).matches()) Some(raw.toDouble) else None
        val castVal: Option[Double] = casts.get(r.actor + "." + fieldBase) match {
          case Some("int") => numeric.map(_.toInt.toDouble)
          case Some("float") => numeric
          case Some("bool") =>
            Some(if (raw != null && falsy(raw.toLowerCase)) 0.0 else 1.0)
          case _ => numeric
        }
        val ktv = castVal.map(_.toString).getOrElse(raw)
        new D(i, parseable, fieldBase, raw, kv.units, kv.pvt, castVal, ktv)
      }
      val ktConf = keywordTags.get(r.actor + "." + r.keyword)
      val ktTags: Map[String, String] = ktConf match {
        case Some(c) =>
          derived.find(d => d.parseable && d.idx == c.index)
            .flatMap(d => Option(d.ktv)).map(v => Map(c.name -> v))
            .getOrElse(Map.empty)
        case None => Map.empty
      }
      derived.filter(_.parseable).map { d =>
        val isPvt = d.pvt != null && d.pvt.length == 3
        val fields: Map[String, Double] =
          if (isPvt) Map(
            d.fieldBase + "_P" -> d.pvt(0),
            d.fieldBase + "_V" -> d.pvt(1),
            d.fieldBase + "_T" -> d.pvt(2))
          else d.castVal.map(v => Map(d.fieldBase -> v)).getOrElse(Map.empty)
        val fieldsStr: Map[String, String] =
          if (!isPvt && d.castVal.isEmpty && d.raw != null) Map(d.fieldBase -> d.raw)
          else Map.empty
        val unitTags: Map[String, String] =
          if (d.units != null && d.units.nonEmpty) Map("units" -> d.units) else Map.empty
        graft.model.TelemetryPoint(r.actor, tags ++ unitTags ++ ktTags,
          fields, fieldsStr, r.recv_time, None, Some(bucket))
      }
    }
  }

  def process(
      df: DataFrame,
      tags: Map[String, String] = Map.empty,
      keywordTags: Map[String, KeywordTagConf] = Map.empty,
      casts: Map[String, String] = Map.empty,
      bucket: String = "actors"): DataFrame = {

    def litMap(m: Map[String, String]): Column =
      if (m.isEmpty) map().cast(MapType(StringType, StringType))
      else map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

    val castsCol = litMap(casts)
    val ktIndex = litMap(keywordTags.map { case (k, v) => k -> v.index.toString })
    val ktName = litMap(keywordTags.map { case (k, v) => k -> v.name })
    val baseTags = litMap(tags)

    val nValues = size(col("values"))
    def parseableOf(kv: Column): Column =
      kv.getField("pvt").isNull || size(kv.getField("pvt")) === 3

    // Per-element derivation, entirely in the array domain. `ii` is the
    // positional counter over PARSEABLE predecessors (tron.py:70-72
    // increments only for appended points): count of parseable elements
    // in the prefix values[0..i-1].
    val derived = transform(col("values"), (kv, i) => {
      val ii = size(filter(slice(col("values"), lit(1), i), e => parseableOf(e)))
      val keyName = when(kv.getField("name").isNotNull && kv.getField("name") =!= "",
          concat(lit("_"), kv.getField("name")))
        .when(nValues === 1, lit(""))
        .otherwise(concat(lit("_"), ii))
      val fieldBase = concat(col("keyword"), keyName)
      val rawVal = kv.getField("value")
      // try_cast semantics: malformed numerics become null (routed to
      // fields_str) instead of failing the job under ANSI mode
      val numericVal = when(
        rawVal.rlike("^[+-]?([0-9]*\\.)?[0-9]+([eE][+-]?[0-9]+)?$"),
        rawVal.cast(DoubleType))
      // this transform is INTERPRETED (higher-order function), so dead
      // per-element work is paid per row at ingest volume: with no
      // casts configured the lookup + three when-branches are pruned at
      // PLAN BUILD time, not evaluated to null a billion times
      val castVal = if (casts.isEmpty) numericVal else {
        val castKey = concat(col("actor"), lit("."), fieldBase)
        val cast = element_at(castsCol, castKey)
        when(cast === "int", numericVal.cast(IntegerType).cast(DoubleType))
          .when(cast === "float", numericVal)
          .when(cast === "bool",
            when(lower(rawVal).isin("", "0", "false", "f"), 0.0).otherwise(1.0))
          .otherwise(numericVal)
      }
      struct(
        i.as("idx"),
        parseableOf(kv).as("parseable"),
        fieldBase.as("field_base"),
        rawVal.as("raw"),
        kv.getField("units").as("units"),
        kv.getField("pvt").as("pvt"),
        castVal.as("cast_val"),
        coalesce(castVal.cast(StringType), rawVal).as("ktv"))
    })

    // keyword_tags: the parseable element at the configured index; `get`
    // (0-based, null on out-of-bounds) keeps the lookup ANSI-safe when no
    // element matches.
    val ktKey = concat(col("actor"), lit("."), col("keyword"))
    val ktMatch = get(filter(col("derived"), d =>
      d.getField("parseable") &&
        d.getField("idx").cast(StringType) === element_at(ktIndex, ktKey)), lit(0))

    val exploded = df
      .withColumn("derived", derived)
      // same build-time pruning as casts: no keyword_tags configured =>
      // the per-row filter/get lambda never exists in the plan
      .withColumn("kt_value",
        if (keywordTags.isEmpty) lit(null).cast(StringType) else ktMatch.getField("ktv"))
      .withColumn("kt_name",
        if (keywordTags.isEmpty) lit(null).cast(StringType) else element_at(ktName, ktKey))
      .select(col("actor"), col("keyword"), col("recv_time"),
        col("kt_value"), col("kt_name"),
        explode(filter(col("derived"), _.getField("parseable"))).as("d"))

    val d = col("d")
    val isPvt = d.getField("pvt").isNotNull && size(d.getField("pvt")) === 3
    val fields = when(isPvt, map(
        concat(d.getField("field_base"), lit("_P")), d.getField("pvt").getItem(0),
        concat(d.getField("field_base"), lit("_V")), d.getField("pvt").getItem(1),
        concat(d.getField("field_base"), lit("_T")), d.getField("pvt").getItem(2)))
      .when(d.getField("cast_val").isNotNull, map(d.getField("field_base"), d.getField("cast_val")))
      .otherwise(map().cast(MapType(StringType, DoubleType)))
    val fieldsStr = when(!isPvt && d.getField("cast_val").isNull && d.getField("raw").isNotNull,
        map(d.getField("field_base"), d.getField("raw")))
      .otherwise(map().cast(MapType(StringType, StringType)))

    val unitTags = when(d.getField("units").isNotNull && d.getField("units") =!= "",
        map(lit("units"), d.getField("units")))
      .otherwise(map().cast(MapType(StringType, StringType)))
    val ktTags = when(col("kt_value").isNotNull && col("kt_name").isNotNull,
        map(col("kt_name"), col("kt_value")))
      .otherwise(map().cast(MapType(StringType, StringType)))

    exploded.select(
      col("actor").as(Point.Measurement),
      map_concat(baseTags, unitTags, ktTags).as(Point.Tags),
      fields.as(Point.Fields),
      fieldsStr.as(Point.FieldsStr),
      col("recv_time").cast(TimestampType).as(Point.Time),
      lit(null).cast(LongType).as(Point.TimeNs),
      lit(bucket).as(Point.Bucket))
  }
}
