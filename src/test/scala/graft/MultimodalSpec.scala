package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", "fakejpegbytes".getBytes("UTF-8"), Map("src" -> "cam1")))
    rows.add(Row(2L, "audio", Array.fill[Byte](2500)(7), Map.empty[String, String]))
    rows.add(Row(3L, "image", null, Map.empty[String, String]))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("extractFeatures: distributed stub decode, deterministic, null-safe") {
    val f = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(f.length == 3)
    assert(f(0).getAs[Long]("n_bytes") == 13L)
    assert(f(0).getAs[Int]("width") > 0 && f(0).getAs[Int]("height") > 0)
    assert(f(1).getAs[Double]("duration_s") == 2.5)
    assert(f(2).getAs[Long]("n_bytes") == 0L) // null payload survives
    assert(f.forall(_.getSeq[Float](6).length == 4))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(f.map(_.getSeq[Float](6).toList).toSeq ==
      again.map(_.getSeq[Float](6).toList).toSeq)
  }

  test("sampleFrames: one row per sampled frame, capped") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2L),
      everyNth = 1, maxFrames = 2).collect()
    assert(frames.length == 2) // 2500 bytes -> 2 frames at stub rate, cap 2
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1))
  }

  test("resizeImages: images get payload + target dims, non-images pass through") {
    val r = Multimodal.resizeImages(media, targetW = 2, targetH = 3)
      .orderBy("media_id").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Array[Byte]]("content").toSeq ==
      "fakejp".getBytes("UTF-8").toSeq) // min(13, 2*3) stub bytes
    assert(r(0).getAs[Int]("width") == 2 && r(0).getAs[Int]("height") == 3)
    assert(r(1).getString(1) == "audio" &&
      r(1).getAs[Array[Byte]]("content").length == 2500) // untouched
    assert(r(1).isNullAt(3) && r(1).isNullAt(4))
    assert(r(2).isNullAt(2)) // null payload survives
  }

  test("repartitionForDecode sizes partitions by payload bytes") {
    val parts = Multimodal.repartitionForDecode(media, totalBytes = 4L << 30,
      targetBytesPerPartition = 1L << 30)
    assert(parts.rdd.getNumPartitions == 4)
  }
}
