package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-text retrieval scoring — Okapi BM25 (Robertson & Walker 1994;
  * the SPARQL/Lucene default ranking function), the relevance pass a
  * training-data pipeline runs to mine corpus documents for a set of
  * probe queries (RAG evaluation harnesses, targeted-domain mining,
  * benchmark decontamination by ranked retrieval rather than exact
  * n-gram hits).
  *
  * score(q, D) = Σ_{t ∈ q} idf(t) · tf(t,D)·(k1+1) /
  *                          (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  * idf(t) = ln( (N − df(t) + 0.5)/(df(t) + 0.5) + 1 )   (Lucene form —
  * strictly positive, so a term in >half the corpus can't flip signs).
  *
  * Scale shape: docs are repartitioned by id ONCE before the explode
  * (the q58 pattern) — the (id, token) term aggregate, the per-doc
  * length rollup, its id-keyed join back, and the final (query, doc)
  * score sum ALL ride that single HashPartitioning(id) exchange (each
  * grouping/join key set contains `id`). The query table is a handful
  * of rows and broadcasts; df is counted from the candidate posting
  * rows themselves (bounded by the query terms' posting lists — never a
  * full-vocabulary aggregate) and broadcasts back. Only candidate rows
  * (docs sharing ≥1 query term) ever reach the scorer; the per-query
  * top-k is the bounded-heap [[graft.operators.TopKByScore]] partial
  * aggregate, not a global sort.
  *
  * Determinism: tf/df/dl/N are exact integers; idf and the per-term
  * score are explicitly-parenthesized IEEE double arithmetic with the
  * ln routed through DECIMAL(27,12) (the repo-wide cross-engine log
  * discipline); each per-term score then rounds through DECIMAL(27,12)
  * so the per-(query, doc) SUM is decimal-exact — independent of
  * summation order across engines. The q106 DuckDB oracle replays every
  * ranked score bit-for-bit.
  */
object Retrieval {

  /** Top-`k` documents per query by BM25: `(query_id, rank, doc_id,
    * score)`; ties broken by ascending doc_id (pinned in the heap's
    * ordering). Query terms are deduplicated per query (standard for
    * short queries — qtf weighting adds nothing at ≤5 terms). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    // one exchange serves the whole plan (q58 pattern): every later
    // grouping / join key set contains `id`. The explicit isNotNull
    // keeps every lineage branch's scan subtree IDENTICAL (the id joins
    // push an IsNotNull into their branch's scan; a branch without one
    // would canonicalize differently and defeat exchange reuse).
    val tf = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .where(col("id").isNotNull)
      .repartition(col("id"))
      .select(col("id"), explode(TextStats.tokens(col("text"))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("id").agg(sum("tf").cast("long").as("dl"))

    val qt = queries
      .flatMap { case (qid, q) => q.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "token")
    // candidate posting rows: only docs sharing >= 1 query term. df is
    // counted from the candidates BEFORE the dl join (distinct docs per
    // token; a token shared by two queries duplicates rows, distinct
    // absorbs it) — bounded by the query terms' posting lists, never a
    // full-vocabulary aggregate — then broadcasts back.
    val cand0 = tf.join(broadcast(qt), Seq("token"))
    val dfreq = cand0.select(col("token"), col("id")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val cand = cand0.join(dl, Seq("id"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val sumDl = dl.agg(sum("dl").cast("long").as("sum_dl"))

    def d(c: Column): Column = c.cast("double")
    def dec(c: Column): Column = c.cast(DecimalType(27, 12))
    val avgdl = d(col("sum_dl")) / d(col("n_docs"))
    val idf = dec(log(((d(col("n_docs")) - d(col("df"))) + lit(0.5)) /
      (d(col("df")) + lit(0.5)) + lit(1.0))).cast("double")
    val termScore = idf * ((d(col("tf")) * lit(k1 + 1.0)) /
      (d(col("tf")) + lit(k1) * ((lit(1.0 - b)) + lit(b) * (d(col("dl")) / avgdl))))

    val scored = cand
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(sumDl))
      .select(col("query_id"), col("id"), dec(termScore).as("ts"))
      .groupBy("query_id", "id")
      .agg(sum("ts").cast("double").as("score"))

    scored.groupBy("query_id")
      .agg(graft.operators.TopKByScore.topK(k)(col("score"), col("id")).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col("query_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("doc_id"), col("__e.score").as("score"))
  }
}
