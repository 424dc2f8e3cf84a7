package graft
import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantics probe behind q80's oracle model (`sbt "runMain
  * graft.WmProbe"`): a hand-built 3-file spool that discriminates how
  * append-mode windowed aggregation really treats watermarks in Spark
  * 4.1. Findings, encoded in WindowedReplay's oracle and scaladoc:
  *
  *  - batch 2's late row (00:20, raw ts BELOW the naive watermark
  *    max(b1)−delay = 00:30) is counted → the late filter never judges
  *    the raw timestamp;
  *  - batch 3's late row into hour 00 (whose window end 01:00 is below
  *    that batch's naive watermark 02:30) is ALSO counted → the
  *    effective watermark lags one batch (batch N runs against stats
  *    through batch N−2), and a closed-but-not-yet-evicted window still
  *    accepts rows;
  *  - the final window (05:00, end past the last watermark) never
  *    emits.
  *
  * Expected output: hours 00 (a,b,c each 1), 01 (a 1), 02 (c 1),
  * 03 (a 1); nothing for hour 05. */
object WmProbe {
  val schema = StructType(Seq(StructField("ts", TimestampType), StructField("k", StringType)))
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[4]", 4)
    import spark.implicits._
    val base = new File("/tmp/wmprobe"); graft.streaming.ReplayScaffold.rmTree(base); base.mkdirs()
    val spool = new File(base, "spool"); spool.mkdirs()
    def write(rows: Seq[(String, String)], mtime: Long): Unit = {
      val seen = Option(spool.listFiles()).getOrElse(Array.empty[File]).map(_.getName).toSet
      rows.toDF("s", "k").select(col("s").cast("timestamp").as("ts"), col("k"))
        .coalesce(1).write.mode("append").parquet(spool.toString)
      spool.listFiles().filterNot(f => seen(f.getName))
        .filter(_.getName.startsWith("part-")).foreach(_.setLastModified(mtime))
    }
    // b1: hours 00 and 01; max ts 01:30 -> wm1 = 00:30 (delay 1h)
    write(Seq(("2024-01-01 00:10:00", "a"), ("2024-01-01 01:30:00", "a")), 1000000000000L)
    // b2: advances max to 03:30 -> wm2 = 02:30; also a late row into hour 00
    //     (window end 01:00 > wm1? no: end 01:00 > wm1=00:30 -> still open by wm1)
    write(Seq(("2024-01-01 03:30:00", "a"), ("2024-01-01 00:20:00", "b")), 1000000100000L)
    // b3: late rows: hour 00 (end 01:00 <= wm2=02:30 -> closed by now),
    //     hour 02 (end 03:00 > wm2? 03:00 > 02:30 -> open)
    write(Seq(("2024-01-01 00:25:00", "c"), ("2024-01-01 02:10:00", "c"),
      ("2024-01-01 05:30:00", "a")), 1000000200000L)
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(spool.toString)
    val agg = in.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("k")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val outDir = new File(base, "out")
    val q = agg.writeStream.format("parquet").option("path", outDir.toString)
      .outputMode("append").option("checkpointLocation", new File(base, "ckpt").toString).start()
    q.processAllAvailable(); q.stop()
    spark.read.parquet(outDir.toString).orderBy("ws", "k").collect()
      .foreach(r => println(s"OUT ${r.get(0)} ${r.getString(1)} ${r.getLong(2)}"))
    spark.stop()
  }
}
