package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travels as an opaque `BINARY` column with typed
  * metadata, and per-item decode / feature-extraction runs distributed via
  * `mapPartitions` over an `Iterator` — the Scala-side equivalent of a
  * batched `mapInPandas` UDF (same batch shape: one partition streams
  * through the codec without materializing).
  *
  * The actual codec is STUBBED (`decodeStub`) — media libraries are not in
  * this container — behind a deterministic fake so the Spark-side plumbing
  * (schema, partitioning, batch iteration, null handling) is real and
  * testable. Swap `decodeStub` for a real decoder (JavaCV etc.) at
  * deployment; nothing else changes.
  *
  * Scale notes: media rows are large and skew-prone, so helpers
  * `repartitionForDecode` (spread by hash, decouple from upstream file
  * splits) and binary-size bucketing keep partitions within executor
  * memory at 100 TB.
  */
object Multimodal {

  /** Media row schema: id + opaque payload + declared metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Feature row produced by the decode/extract pass. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Stands in for the real image/audio decode (``???`` in production —
    * the container has no media libs). Deterministic by construction so
    * tests and oracles can replay it.
    *
    * The per-item seed is the first 60 bits of `md5(content)` — chosen
    * over a bespoke rolling hash precisely so any SQL engine can replay
    * the stub (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), giving the
    * multimodal pipeline a hard cross-engine oracle. Feature j is a
    * 12-bit slice of the seed over 4096 — a power-of-two denominator, so
    * the float is exact and float→double widening is lossless (no
    * rounding hazards in the oracle compare). */
  def decodeStub(kind: String, content: Array[Byte], dim: Int): (Option[Int], Option[Int], Option[Double], Array[Float]) = {
    val bytes = if (content == null) Array.empty[Byte] else content
    val n = bytes.length
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md5.map(b => f"${b & 0xff}%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60-bit, >= 0
    val features = Array.tabulate(dim) { j =>
      ((h >> ((4 * j) % 60)) & 0xfff).toFloat / 4096.0f
    }
    kind match {
      case "image" => (Some(((h & 0xff) + 1).toInt), Some((((h >> 8) & 0xff) + 1).toInt), None, features)
      case "audio" | "video" => (None, None, Some((n.toDouble / 1000.0)), features)
      case _ => (None, None, None, features)
    }
  }

  /** Distributed decode/feature-extract: one streamed pass per partition.
    * Null payloads produce a feature row with empty features (kept, so
    * joins stay total). */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val encoder = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val (w, h, d, f) = decodeStub(kind, content, dim)
        Row(id, kind, (if (content == null) 0 else content.length).toLong,
          w.orNull, h.orNull, d.orNull, f)
      }
    }(encoder)
  }

  /** Resize plumbing for images: per-item transform producing a new
    * payload + target dimensions, streamed per partition like
    * [[extractFeatures]]. The pixel math is the STUB (real resize = swap
    * the body for an image lib call; schema, null handling and batch
    * shape stay fixed): the stub payload is the first
    * `min(n, targetW*targetH)` input bytes, deterministic so tests can
    * assert exact output. Non-image rows pass through untouched with
    * null target dims — resize composes with mixed-kind media tables. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (kind != "image" || content == null) Row(id, kind, content, null, null)
        else Row(id, kind, content.take(math.min(content.length, targetW * targetH)),
          targetW, targetH)
      }
    }(encoder)
  }

  /** Frame-sampling plumbing for video: emit one row per sampled frame
    * index (the decode itself is the stub). Generator-only — no shuffle. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest((length(col("content")) / 1000).cast(IntegerType), lit(1)))
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(everyNth)), 1, maxFrames)))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("meta"))

  /** Spread media rows evenly before the expensive decode: hash-partition
    * on id so one oversized input file can't pin a single task, sized so
    * `targetBytesPerPartition` of payload lands in each task. */
  def repartitionForDecode(media: DataFrame, totalBytes: Long,
      targetBytesPerPartition: Long = 512L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
}
