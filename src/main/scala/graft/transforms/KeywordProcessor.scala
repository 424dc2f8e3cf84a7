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
  *     every sibling point of the same keyword instance (tron.py:86-97) —
  *     row-scoped here, no shuffle, because one input row carries the
  *     whole keyword
  *
  * Numeric results land in `fields`; non-numeric, uncast values land in
  * `fields_str` (the dual-map model of SURVEY.md §7.4 #2 — the reference
  * ships heterogeneous dicts to InfluxDB, we keep both typed views).
  */
object KeywordProcessor {

  final case class KeywordTagConf(index: Int, name: String)

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

    val exploded = df
      .withColumn("n_values", size(col("values")))
      .select(col("actor"), col("keyword"), col("recv_time"), col("n_values"),
        posexplode(col("values")).as(Seq("idx", "kv")))
      // positional counter over parseable values: scalars and PVTs emit,
      // other arrays are skipped BEFORE the counter increments (tron.py:70-72
      // increments ii only for appended points)
      .withColumn("parseable", col("kv.pvt").isNull || size(col("kv.pvt")) === 3)
      .withColumn("ii", sum(when(col("parseable"), 1).otherwise(0))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("actor", "keyword", "recv_time")
          .orderBy("idx")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("ii", coalesce(col("ii"), lit(0)))
      .filter(col("parseable"))

    val keyName = when(col("kv.name").isNotNull && col("kv.name") =!= "",
        concat(lit("_"), col("kv.name")))
      .when(col("n_values") === 1, lit(""))
      .otherwise(concat(lit("_"), col("ii")))

    val withKey = exploded
      .withColumn("key_name", keyName)
      .withColumn("field_base", concat(col("keyword"), col("key_name")))
      .withColumn("cast_key", concat(col("actor"), lit("."), col("field_base")))
      .withColumn("cast", element_at(castsCol, col("cast_key")))

    val rawVal = col("kv.value")
    // try_cast semantics: malformed numerics become null (routed to
    // fields_str) instead of failing the job under ANSI mode
    val numericVal = when(
      rawVal.rlike("^[+-]?([0-9]*\\.)?[0-9]+([eE][+-]?[0-9]+)?$"),
      rawVal.cast(DoubleType))
    val castVal = when(col("cast") === "int", numericVal.cast(IntegerType).cast(DoubleType))
      .when(col("cast") === "float", numericVal)
      .when(col("cast") === "bool",
        when(lower(rawVal).isin("", "0", "false", "f"), 0.0).otherwise(1.0))
      .otherwise(numericVal)

    val isPvt = col("kv.pvt").isNotNull && size(col("kv.pvt")) === 3
    val fields = when(isPvt, map(
        concat(col("field_base"), lit("_P")), col("kv.pvt").getItem(0),
        concat(col("field_base"), lit("_V")), col("kv.pvt").getItem(1),
        concat(col("field_base"), lit("_T")), col("kv.pvt").getItem(2)))
      .when(castVal.isNotNull, map(col("field_base"), castVal))
      .otherwise(map().cast(MapType(StringType, DoubleType)))
    val fieldsStr = when(!isPvt && castVal.isNull && rawVal.isNotNull,
        map(col("field_base"), rawVal))
      .otherwise(map().cast(MapType(StringType, StringType)))

    // keyword_tags: value at the configured index, broadcast to all sibling
    // points of the same (actor, keyword, recv_time) row via a window max
    // (one row in the frame matches, the rest are null)
    val ktKey = concat(col("actor"), lit("."), col("keyword"))
    val tagAtIdx = when(element_at(ktIndex, ktKey) === col("idx").cast(StringType),
      coalesce(castVal.cast(StringType), rawVal))
    val withKt = withKey
      .withColumn("kt_value", max(tagAtIdx).over(
        org.apache.spark.sql.expressions.Window.partitionBy("actor", "keyword", "recv_time")))
      .withColumn("kt_name", element_at(ktName, ktKey))

    val baseTags = litMap(tags)
    val unitTags = when(col("kv.units").isNotNull && col("kv.units") =!= "",
        map(lit("units"), col("kv.units")))
      .otherwise(map().cast(MapType(StringType, StringType)))
    val ktTags = when(col("kt_value").isNotNull && col("kt_name").isNotNull,
        map(col("kt_name"), col("kt_value")))
      .otherwise(map().cast(MapType(StringType, StringType)))

    withKt.select(
      col("actor").as(Point.Measurement),
      map_concat(baseTags, unitTags, ktTags).as(Point.Tags),
      fields.as(Point.Fields),
      fieldsStr.as(Point.FieldsStr),
      col("recv_time").cast(TimestampType).as(Point.Time),
      lit(null).cast(LongType).as(Point.TimeNs),
      lit(bucket).as(Point.Bucket))
  }
}
