package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver calling queries with a BARE session (no graft configs). */
object BareSessionCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n1 = SparkEntry.entry(spark).count()
    val n2 = SparkEntry.queries("q07_events_range")(spark, "/root/testdata/sf0.001").count()
    val n3 = SparkEntry.queries("q29_ann_cosine")(spark, "/root/testdata/sf0.001").count()
    println(s"BARE-SESSION OK entry=$n1 q07=$n2 q29=$n3")
    spark.stop()
  }
}
