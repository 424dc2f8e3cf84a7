package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Collocation mining — pointwise mutual information over adjacent
  * token bigrams (Church & Hanks 1990, "Word association norms, mutual
  * information, and lexicography"; the scoring behind word2vec's
  * word2phrase pass). The corpus-analysis question it answers: which
  * word pairs co-occur far above chance — multiword entities, idioms,
  * boilerplate phrases — the vocabulary-induction and
  * phrase-conflation signal a training-data pipeline computes before
  * tokenizer training.
  *
  * PMI(w1,w2) = ln( p(w1 w2) / (p(w1)·p(w2)) )
  *            = ln( (c12·T·T) / (B·c1·c2) )
  * with c12 the bigram count, c1/c2 unigram counts, T total tokens,
  * B total bigrams.
  *
  * Scale shape: the bigram explode is scan-fused (zip_with over the
  * token array — no self-join to reach the neighbor); both count
  * aggregations are map-side partial and VOCABULARY-bounded (distinct
  * unigrams / distinct bigrams), so the exchanges never carry corpus
  * volume; the `minCount` filter lands immediately after the bigram
  * aggregate, so the two unigram joins see only the head of the bigram
  * distribution, not its long tail; the final top-k is
  * TakeOrderedAndProject (bounded per-partition heaps, no global sort).
  *
  * Determinism: counts are exact integers; the probability ratio is
  * evaluated in explicitly-parenthesized IEEE double products (exact
  * cross-engine at any corpus size — BIGINT products of the same
  * quantities overflow past ~10^18), one division, and the ln passes
  * through DECIMAL(27,12) (the repo-wide cross-engine log discipline),
  * so the q104 DuckDB oracle replays every emitted score bit-for-bit.
  */
object Collocations {

  /** Top-`k` collocations by PMI: `(w1, w2, c12, pmi)` for bigrams with
    * `c12 >= minCount`, ties broken lexicographically. */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k > 0, s"k must be positive, got $k")
    val arr = split(col(textCol), " ")
    val n = size(arr)
    // adjacent pairs from ONE pass over the token array; empty and
    // single-token docs contribute nothing (slice length clamps to 0)
    val bigrams = docs.select(explode(zip_with(
        slice(arr, lit(1), greatest(n - 1, lit(0))),
        slice(arr, lit(2), greatest(n - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val unigrams = docs.select(explode(arr).as("w"))
    val uni = unigrams.groupBy("w").agg(count(lit(1)).as("c"))
    // totals as one tiny (1-row) frame each, cross-joined in — both are
    // sums over the already-aggregated count tables, not rescans
    val tTot = uni.agg(sum("c").cast("long").as("t"))
    val bgCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val bTot = bgCounts.agg(sum("c12").cast("long").as("b"))
    val head = bgCounts.filter(col("c12") >= minCount)
    def d(c: Column): Column = c.cast("double")
    val ratio = ((d(col("c12")) * d(col("t"))) * d(col("t"))) /
      ((d(col("b")) * d(col("c1"))) * d(col("c2")))
    head
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      // broadcast pinned: 1-row totals frames — under an AQE-off
      // harness the planner must still never consider shuffling these
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(bTot))
      .select(col("w1"), col("w2"), col("c12"),
        log(ratio).cast(DecimalType(27, 12)).cast("double").as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
