package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.text.PhraseIndex

class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  test("planted phrases: counts, offsets, overlapping and repeated-term matches") {
    val docs = Seq(
      (1L, "x a b c y a b c"),      // two hits at 0-based starts 1, 5
      (2L, "a b x a b c"),          // one hit at 3
      (3L, "a b a b a"),            // "a b a": overlapping hits at 0, 2
      (4L, "c b a"),                // none
      (5L, "a b")                   // prefix only, no c
    ).toDF("doc_id", "text")
    val abc = PhraseIndex.phraseSearch(docs, "doc_id", "text", "a b c")
      .orderBy("doc_id").collect()
    assert(abc.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 2, 1), (2L, 1, 3)))
    // duplicate term in the phrase: "a b a" requires a at p AND p+2
    val aba = PhraseIndex.phraseSearch(docs, "doc_id", "text", "a b a")
      .orderBy("doc_id").collect()
    assert(aba.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((3L, 2, 0)))
    // single-term phrase degrades to a posting lookup
    val c = PhraseIndex.phraseSearch(docs, "doc_id", "text", "c")
      .orderBy("doc_id").collect()
    assert(c.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 2, 3), (2L, 1, 5), (4L, 1, 0)))
  }

  test("persisted bucket layout serves identical results through partition pruning") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val dir = Files.createTempDirectory("phrase-idx").toFile
    try {
      PhraseIndex.writePostingsLayout(docs, "doc_id", "text", dir.toString, buckets = 16)
      val mem = PhraseIndex.phraseSearch(docs, "doc_id", "text", "table scan")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val served = PhraseIndex.phraseSearchPruned(spark, dir.toString, "table scan", buckets = 16)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(mem.nonEmpty && mem.toSeq == served.toSeq)
      // pruning is real: the scan must carry partition filters on bucket
      val df = PhraseIndex.phraseSearchPruned(spark, dir.toString, "table scan", buckets = 16)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [bucket"),
        s"bucket partition filters must prune the index read:\n$scan")
    } finally ReplaySupport.rmTree(dir)
  }

  test("plan shape: token filter prunes before the posting aggregation") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = PhraseIndex.phraseSearch(docs, "doc_id", "text", "table scan")
    val plan = df.queryExecution.executedPlan.toString
    // the isin filter must sit under the groupBy (on the exploded
    // occurrence rows), so only phrase-term occurrences reach the exchange
    assert("Filter \\(token#\\d+ IN \\(table,scan\\)".r.findFirstIn(plan).isDefined,
      s"term pruning must reach the occurrence rows:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "posting frames are posting-list-sized — joins must not sort-merge the corpus")
  }
}

/** Local rmTree (mirrors ReplayScaffold.rmTree without importing the
  * streaming package into an unrelated spec). */
object ReplaySupport {
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }
}
