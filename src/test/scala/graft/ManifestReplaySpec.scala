package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{ManifestReplaySource, ReplayScaffold}

/** Pins the manifest replay's core contract (VERDICT r12 #1): batch
  * arrival order is the lexicographic order of the staged FILENAMES and
  * nothing else — in particular NOT file mtimes, the filesystem-owned
  * metadata whose environment-dependence was the only surviving
  * explanation for two driver-red rounds of q87/q89 against nine green
  * local runs. The adversarial test here rewrites every staged file's
  * mtime to the REVERSE of the intended order — the exact corruption the
  * old FileStreamSource path could not survive — and requires per-trigger
  * delivery to still follow the names. */
class ManifestReplaySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType),
    StructField("v", DoubleType), StructField("ts", TimestampType),
    StructField("ok", BooleanType)))

  private def freshDir(): File = {
    val d = Files.createTempDirectory("graft-manifest-spec").toFile
    d.deleteOnExit(); d
  }

  private def stage(dir: File, ids: Seq[Long], index: Int): Unit = {
    import spark.implicits._
    val df = ids.toDF("id")
      .withColumn("tag", concat(lit("t"), col("id")))
      .withColumn("v", col("id") * 1.5)
      .withColumn("ts", timestamp_micros(col("id") * 1000000L + 7L))
      .withColumn("ok", col("id") % 2 === 0)
    ReplayScaffold.writeManifestBatch(dir, df, index)
  }

  /** Drain the spool, recording (trigger, ids) per micro-batch. */
  private def drain(dir: File): Seq[(Long, Seq[Long])] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = ReplayScaffold.manifestStream(spark, dir, schema)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized { seen += ((id, df.select("id").collect().map(_.getLong(0)).sorted.toSeq)) }
        ()
      }.option("checkpointLocation",
        new File(dir.getParentFile, dir.getName + "-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    seen.sortBy(_._1).toSeq
  }

  test("arrival order follows filenames even under adversarially REVERSED mtimes") {
    val dir = freshDir()
    stage(dir, Seq(1L, 2L), 0)
    stage(dir, Seq(10L, 11L), 1)
    stage(dir, Seq(20L), 2)
    // the corruption: newest-named file gets the OLDEST mtime — an
    // mtime-ordered source would replay 2,1,0
    val files = dir.listFiles().filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      assert(f.setLastModified(2000000000000L - i * 100000L))
    }
    val batches = drain(dir).filter(_._2.nonEmpty)
    assert(batches.map(_._2) === Seq(Seq(1L, 2L), Seq(10L, 11L), Seq(20L)))
  }

  test("one staged batch per trigger; empty batches keep their trigger slot") {
    val dir = freshDir()
    stage(dir, Seq(1L), 0)
    stage(dir, Seq.empty, 1) // empty staged batch = empty (but real) trigger
    stage(dir, Seq(3L), 2)
    val batches = drain(dir)
    // three data-bearing triggers in name order, the middle one empty
    assert(batches.map(_._2).filter(_.nonEmpty) === Seq(Seq(1L), Seq(3L)))
    assert(batches.count(_._2.isEmpty) >= 1)
  }

  test("typed round-trip: long, string, double, timestamp (micros), boolean") {
    val dir = freshDir()
    stage(dir, Seq(5L, 6L), 0)
    val out = spark.read.schema(
        StructType(schema.fields.map(f => f.dataType match {
          case TimestampType => f.copy(dataType = LongType) // spool encoding
          case _ => f
        })))
      .json(dir.toString + "/batch-*.jsonl")
    // spool encodes ts as micros; the stream decodes to TimestampType
    val streamed = {
      val seen = drain(dir)
      seen.flatMap(_._2)
    }
    assert(streamed.sorted === Seq(5L, 6L))
    assert(out.where(col("id") === 5L).head().getLong(3) === 5000000L + 7L)
    // full typed readback through the source itself
    val q = ReplayScaffold.manifestStream(spark, dir, schema)
    val rows = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val qq = q.writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= df.collect() }; ()
      }.option("checkpointLocation",
        new File(dir.getParentFile, dir.getName + "-ckpt2").toString).start()
      try qq.processAllAvailable() finally qq.stop()
      buf.sortBy(_.getLong(0))
    }
    assert(rows.map(_.getLong(0)) === Seq(5L, 6L))
    assert(rows.head.getString(1) === "t5")
    assert(rows.head.getDouble(2) === 7.5)
    assert(rows.head.getTimestamp(3).getTime === 5000L) // 5000007 us -> ms
    assert(rows.head.getBoolean(4) === false)
    assert(rows(1).getBoolean(4) === true)
  }

  test("checkpointed offsets resume exactly: restart serves only undelivered batches") {
    val dir = freshDir()
    val ckpt = new File(dir.getParentFile, dir.getName + "-ckpt-resume").toString
    stage(dir, Seq(1L), 0)
    stage(dir, Seq(2L), 1)
    def drainWith(record: (Long, Seq[Long]) => Unit): Unit = {
      val q = ReplayScaffold.manifestStream(spark, dir, schema)
        .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          record(id, df.select("id").collect().map(_.getLong(0)).toSeq); ()
        }.option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    val first = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    drainWith((id, ids) => first.synchronized { first += ((id, ids)) })
    assert(first.flatMap(_._2).sorted == Seq(1L, 2L))
    // extend the spool, restart on the SAME checkpoint: offset 2 is
    // committed, so the resumed stream must serve ONLY batch index 2 —
    // a replay of 0/1 would double rows, a skip would lose batch 2
    stage(dir, Seq(3L), 2)
    val second = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    drainWith((id, ids) => second.synchronized { second += ((id, ids)) })
    assert(second.flatMap(_._2) == Seq(3L),
      s"resume must deliver exactly the undelivered batch, got $second")
  }

  test("unsupported spool field types fail at load, not per-row") {
    val bad = StructType(Seq(StructField("a", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException] {
      ManifestReplaySource.validate(bad)
    }
    assert(e.getMessage.contains("unsupported spool field type"))
  }
}
