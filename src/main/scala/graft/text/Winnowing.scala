package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every token k-gram, slide a window of `w` consecutive
  * hashes, and select the RIGHTMOST minimal hash of each window. The
  * selected set has two properties the all-k-grams index lacks:
  *
  *  - density guarantee: ~2/(w+1) of positions are selected, so the
  *    fingerprint index is a FRACTION of the k-gram index — at 100 TB
  *    that is the difference between a copy-detection index that fits
  *    and one that re-materializes the corpus;
  *  - detection guarantee: any shared token run of length ≥ w + k − 1
  *    shares at least one SELECTED fingerprint, so long verbatim overlap
  *    is never missed (the q77 span-dedup recall story at 1/w the cost).
  *
  * The whole kernel — tokenize, k-gram h60, rightmost-min windows,
  * per-doc distinct — is ONE compiled scan-fused pass per row
  * ([[org.apache.spark.sql.graft.WinnowSelect]]): no explode, no
  * shuffle until the final distinct of selected rows, whose volume is
  * the DENSITY-BOUNDED fingerprint count, not the token count. Three
  * Column-DSL formulations of the same algorithm (round-17 measurement,
  * OPTIMIZATION_r17.md) all ran through Catalyst's interpreted
  * higher-order-function path, whose per-element expression trees
  * re-evaluate every duplicated slice — 4.7-20.7 s on the q134 corpus
  * vs 0.6 s for the compiled kernel, identical output.
  *
  * The rightmost-min choice is the paper's "robust" rule; the deque
  * kernel's pop-on-`>=` makes the surviving front the LATEST index
  * among equal minima, which is exactly the
  * `w − position(reverse(window), min) + 1` formulation the DuckDB
  * oracle replays with `list_reverse`/`list_position` (CorpusOpsSpec
  * pins both against an independent JVM replay of the rule).
  */
object Winnowing {

  /** Selected fingerprints: one row per distinct (id, pos, fp) where
    * `pos` is the 0-based k-gram position selected by some window and
    * `fp` its 60-bit k-gram hash. Documents shorter than k tokens hash
    * their whole token run (the [[graft.dedup.Dedup.shinglePosting]]
    * short-doc convention); shorter than w+k−1, the single window spans
    * what exists, so every doc emits ≥ 1 fingerprint.
    *
    * The per-doc DISTINCT is exact and O(tokens): equal selections are
    * provably confined to ADJACENT window runs, so emitting only
    * selection changes dedups completely. Adjacency proof: if windows
    * j and l (j<l) both select position p, then for any m in (j,l):
    * window_m ⊆ window_j ∪ window_l, so value(p) = min_j = min_l is
    * window_m's min too (p ∈ window_m since l ≤ p ≤ j+w−1); and a
    * same-value element q>p in window_m would lie in window_l (if
    * q ≥ l) contradicting p as window_l's RIGHTMOST min, else
    * q < l ≤ p contradicts q > p. Hence every in-between window
    * selects p — one contiguous run. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    graft.Tables.spread(docs).select(col(idCol).as("id"),
        explode(call_function("winnow_select", col(textCol), lit(k), lit(w))).as("s"))
      .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }
}
