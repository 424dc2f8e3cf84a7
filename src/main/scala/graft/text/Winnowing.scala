package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
  * Everything is per-document array math fused into the scan (transform/
  * slice/array_min — no explode, no shuffle until the final distinct of
  * selected rows, whose volume is the DENSITY-BOUNDED fingerprint count,
  * not the token count). The rightmost-min choice is the paper's
  * "robust" rule, expressed engine-portably as
  * `w − position(reverse(window), min) + 1` — first match in the
  * reversed window IS the last match in the window, and DuckDB replays
  * the identical formula with `list_reverse`/`list_position`.
  */
object Winnowing {

  /** Selected fingerprints: one row per distinct (id, pos, fp) where
    * `pos` is the 0-based k-gram position selected by some window and
    * `fp` its 60-bit k-gram hash. Documents shorter than k tokens hash
    * their whole token run (the [[graft.dedup.Dedup.shinglePosting]]
    * short-doc convention); shorter than w+k−1, the single window spans
    * what exists, so every doc emits ≥ 1 fingerprint. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val ws = TextStats.tokens(col(textCol))
    // k-gram hashes: h60 of the space-joined token k-gram, one per
    // position 0..max(n-k, 0) (at least one, the short-doc rule)
    val hs = transform(
      sequence(lit(0), greatest(size(ws) - k, lit(0))),
      i => graft.dedup.Dedup.h60(concat_ws(" ", slice(ws, i + 1, lit(k)))))
    // windows j = 0..L-w (at least one; slice caps at the array end for
    // short docs in both engines), each selecting its rightmost min
    val selected = transform(
      sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
      j => {
        val win = slice(col("hs"), j + 1, lit(w))
        val m = array_min(win)
        struct(
          (j + size(win) - array_position(reverse(win), m)).as("pos"),
          m.as("fp"))
      })
    docs.select(col(idCol).as("id"), hs.as("hs"))
      .select(col("id"), explode(array_distinct(selected)).as("s"))
      .select(col("id"), col("s.pos").cast("long").as("pos"), col("s.fp").as("fp"))
  }
}
