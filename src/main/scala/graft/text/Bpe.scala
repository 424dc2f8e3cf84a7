package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINER inner loop (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" §3.2) — the
  * other half of subword tokenization next to [[Selection.subwordVocab]]
  * (frequency-ranked piece mining) and `subword_piece_count` (the apply
  * side): iteratively find the most frequent ADJACENT symbol pair,
  * weighted by word frequency, merge it everywhere, repeat. The merge
  * TABLE (ordered pair list) is what a trained BPE tokenizer ships.
  *
  * Scale design — the property that makes BPE trainable on 100 TB: the
  * corpus is scanned ONCE, into a (word, count) table; every merge round
  * after that runs on the DISTINCT-WORD table, which is
  * vocabulary-bounded (Heaps' law: ~millions of types for trillions of
  * tokens), never on the corpus. Each round is two vocabulary-bounded
  * jobs: an adjacent-pair count (explode + sum, map-side partial) whose
  * argmax is a 1-row TakeOrdered, and a merge application that rewrites
  * each word's symbol string in place (no shuffle — the word table's
  * partitioning is untouched). Rounds persist the rewritten table and
  * drop the previous one, so state is one vocabulary-sized frame.
  *
  * Merge semantics (both engines replay it exactly): symbols of a word
  * are folded left-to-right; when the accumulator's LAST symbol equals
  * `left` and the next symbol equals `right`, they fuse (the fused
  * symbol cannot fuse again as `left` in the same pass since
  * left+right != left). "aaaaaa" under (a,a) → [aa, aa, aa] — greedy,
  * scan-after-merge, the Sennrich reference behavior. Pair COUNTS are
  * plain adjacent-pair occurrences ("aaa" counts (a,a) twice), also per
  * the reference implementation.
  *
  * Symbols are kept as a single U+0001-joined string per word: the
  * corpus contract is printable-ASCII tokens, so the separator is
  * collision-free, and a string fold (`aggregate` HOF here,
  * `list_reduce` in the DuckDB oracle) gives both engines the identical
  * greedy semantics with no array-of-array plumbing.
  */
object Bpe {

  /** Symbol separator inside a word's symbol string. */
  val Sep = "\u0001"

  private def symsOf(s: Column): Column = split(s, Sep)

  /** Fold one merge (left, right) through a symbol string — the
    * compiled `bpe_merge` kernel (one O(bytes) pass per word;
    * [[org.apache.spark.sql.graft.BpeStatics]] documents the exact
    * equivalence with [[applyMergeHof]], the original interpreted
    * `aggregate` fold, which rebuilt the accumulator by immutable
    * string concat — O(len²) bytes copied per word plus per-element
    * interpreted-lambda dispatch, the §4 anti-pattern in the ONE
    * expression every merge round applies to every vocabulary word). */
  private def applyMerge(s: Column, left: String, right: String): Column =
    call_function("bpe_merge", s, lit(left), lit(right))

  /** Plan-evidence probe: the merge-application projection of one round
    * applied to the initial word table (what `merges` runs per round),
    * exposed so StagePlans can dump its physical plan — the q132 outer
    * plan is a driver-materialized LocalTableScan and can't show it. */
  private[graft] def mergeApplyProbe(docs: DataFrame, textCol: String,
      left: String, right: String): DataFrame = {
    val wc = docs
      .select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(concat_ws(Sep, transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("s"), col("c"))
    wc.withColumn("s", applyMerge(col("s"), left, right))
  }

  /** The original interpreted HOF fold, kept as the independent
    * semantic reference the kernel is spec-pinned against
    * (CorpusOpsSpec "bpe_merge kernel ≡ aggregate fold"). */
  private[graft] def applyMergeHof(s: Column, left: String, right: String): Column =
    aggregate(symsOf(s), lit(""),
      (acc, x) => when(acc === "", x)
        .when((acc === left || acc.endsWith(Sep + left)) && x === right,
          concat(acc, x))
        .otherwise(concat(acc, lit(Sep), x)))

  /** Adjacent symbol pairs of a symbol string, exploded — the compiled
    * `bpe_pairs` generator ([[org.apache.spark.sql.graft.BpePairStatics]]
    * has the equivalence contract with the arrays_zip/slice form it
    * replaces: that form materialized the split array plus two slice
    * copies plus a zipped struct array PER WORD PER ROUND — the largest
    * exec-time stages of q132 at 16×, OPTIMIZATION_r18.md). */
  private def pairFrame(words: DataFrame): DataFrame =
    words
      .select(col("c"), explode(call_function("bpe_pairs", col("s"))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("c"))

  /** Train `rounds` BPE merges over the corpus' space-tokenized words.
    * Returns the merge table: (round, merge_left, merge_right,
    * pair_count), one row per completed round, deterministic (count
    * desc, then lexicographic pair) — stops early if no pair remains.
    *
    * Single-char words can never contribute a pair and merges cannot
    * change that, so they are dropped from the word table up front. */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    val wc = docs
      .select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(concat_ws(Sep, transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("s"), col("c"))
    var words = wc.persist()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val top = pairFrame(words)
          .groupBy("l", "r").agg(sum(col("c")).as("cnt"))
          .orderBy(desc("cnt"), asc("l"), asc("r"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val row = top(0)
          val (l, rr, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          out += ((r, l, rr, cnt))
          if (r < rounds) {
            val next = words.withColumn("s", applyMerge(col("s"), l, rr)).persist()
            next.count()
            words.unpersist()
            words = next
          }
          r += 1
        }
      }
    } finally words.unpersist()
    import spark.implicits._
    out.toSeq.toDF("round", "merge_left", "merge_right", "pair_count")
  }

  /** The DuckDB oracle for [[merges]], generated for a fixed round count.
    *
    * CONSERVATIVE SQL ONLY (round 15): the original oracle drove the
    * greedy fold through `list_reduce` with a correlated lambda and
    * built the char split with a list comprehension — the newest SQL
    * surface in the whole suite, and semantics that have shifted across
    * DuckDB releases (the `->` lambda syntax is deprecated-then-removed
    * after 1.2; list comprehensions postdate 1.0). q132 came back
    * driver-red with rows green and err null — two deterministic
    * engines disagreeing on integer arithmetic — and the driver's
    * DuckDB version is the one engine q121 does not fingerprint
    * (VERDICT r14 "What's wrong #2"; q148 now reports it). This rewrite
    * keeps the identical merge semantics on ancient, version-stable
    * primitives: `regexp_replace` / `replace` / `string_split` / slices.
    *
    * Representation: a word's symbol list is a WRAPPED string — every
    * symbol enclosed in chr(1) markers, `"ab","c"` ⇒ `␁ab␁␁c␁`. Then:
    *  - adjacent pairs = zip of the split-on-`␁␁` list with its tail
    *    (after trimming the outer markers);
    *  - applying merge (l, r) = plain `replace(s, '␁l␁␁r␁', '␁lr␁')`,
    *    which IS the greedy left-to-right fold: `replace` scans
    *    non-overlapping occurrences and resumes AFTER each replacement,
    *    so a fused symbol cannot re-fuse as LEFT in the same pass —
    *    exactly [[applyMerge]]'s accumulator rule — and the full
    *    per-symbol wrapping makes boundary false-matches impossible
    *    (symbols never contain chr(1)).
    * The per-symbol wrapping (rather than single separators) is what
    * makes consecutive merges correct: `aaaa` wrapped is
    * `␁a␁␁a␁␁a␁␁a␁`; replacing `␁a␁␁a␁` consumes symbols pairwise and
    * yields `␁aa␁␁aa␁` = `[aa, aa]`, matching the fold — with single
    * separators the first replacement would eat the shared separator
    * and the second pair would never merge. */
  def oracleSql(rounds: Int): String = {
    val rounds1toN = 1 to rounds
    // every symbol wrapped: "abc" -> ␁a␁␁b␁␁c␁  ([\s\S] so a token
    // containing \n still splits per char, matching Spark's substr)
    val head = s"""
      WITH wc AS (
        SELECT word, COUNT(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) >= 2 GROUP BY word),
      w0 AS (
        SELECT regexp_replace(word, '([\\s\\S])', chr(1) || '\\1' || chr(1), 'g') AS s, c
        FROM wc)"""
    val per = rounds1toN.map { k =>
      val prev = s"w${k - 1}"
      val apply =
        if (k == rounds) "" else s""",
      w$k AS (
        SELECT replace(s, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                          chr(1) || m.l || m.r || chr(1)) AS s, c
        FROM $prev, m$k m)"""
      s""",
      p$k AS (
        SELECT l, r, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(y[1:len(y)-1]) AS l, unnest(y[2:len(y)]) AS r, c FROM (
            SELECT string_split(trim(s, chr(1)), chr(1) || chr(1)) AS y, c FROM $prev))
        GROUP BY l, r),
      m$k AS (SELECT $k AS round, l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1)$apply"""
    }.mkString
    val union = rounds1toN.map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")
    s"""$head$per
      SELECT round, l AS merge_left, r AS merge_right, cnt AS pair_count
      FROM ($union) ORDER BY round"""
  }

  /** q151 stage probe — the FULL round-1 adjacent-pair count table,
    * order-insensitive. Decomposes q132: green here while q132 is red
    * localizes the divergence to the argmax or merge-application stage;
    * red here means the tokenization/pair-count base itself differs. */
  def round1Pairs(docs: DataFrame, textCol: String): DataFrame = {
    val wc = docs
      .select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(concat_ws(Sep, transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("s"), col("c"))
    pairFrame(wc)
      .groupBy("l", "r").agg(sum(col("c")).as("cnt"))
      .orderBy("l", "r")
  }

  /** Conservative oracle for [[round1Pairs]] (no comprehensions, no
    * lambdas — same primitives as [[oracleSql]]). */
  val Round1PairsOracle: String = """
      WITH wc AS (
        SELECT word, COUNT(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) >= 2 GROUP BY word),
      cs AS (
        SELECT string_split(trim(
            regexp_replace(word, '([\s\S])', chr(1) || '\1' || chr(1), 'g'),
            chr(1)), chr(1) || chr(1)) AS y, c
        FROM wc)
      SELECT l, r, CAST(SUM(c) AS BIGINT) AS cnt FROM (
        SELECT unnest(y[1:len(y)-1]) AS l, unnest(y[2:len(y)]) AS r, c FROM cs)
      GROUP BY l, r ORDER BY l, r"""
}
