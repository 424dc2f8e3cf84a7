package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-side answer to
  * "big joins shuffle on their keys". Writing both fact tables bucketed
  * (and sorted) by the join key lets every subsequent join/aggregation on
  * that key run with ZERO exchange: each task reads matching bucket files
  * from both sides. At 100 TB this converts the dominant shuffle of a
  * fact-fact join (e.g. lineitem ⋈ orders on orderkey) into a local merge
  * per bucket — the single biggest plan win available to a warehouse
  * layout, which is why the reference's InfluxDB sharding-by-series is
  * re-expressed here as bucketing-by-key.
  *
  * Bucket-count guidance: `total_size / bucket_count ≈` one task's worth
  * (128-512 MB post-compression); both sides of a co-located join MUST
  * use the same count and key.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table registered in the
    * session catalog. `sortCols` default to the bucket key so merge joins
    * skip the sort too. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — produces an
    * exchange-free sort-merge join when layouts line up (verify with
    * `assertNoShuffleJoin`). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the physical plan contains a join with no shuffle exchange
    * feeding it (bucket layouts matched). */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
