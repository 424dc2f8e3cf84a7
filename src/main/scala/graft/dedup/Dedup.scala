package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextStats

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash and n-gram Jaccard. All hashing is md5-derived so an external
  * oracle (DuckDB) can replay the pipeline bit-for-bit; all heavy lifting
  * is arrays-in-columns until the final candidate join, so the only
  * shuffles are the LSH band join / group-by — the shape that scales to
  * 100 TB (no all-pairs comparison ever materializes).
  */
object Dedup {

  /** Large prime > 2^32 for 32-bit universal hashing. */
  val Prime: Long = 4294967311L

  /** Deterministic 32-bit hash of a string via md5 (first 8 hex digits).
    * Oracle-replicable: DuckDB `CAST(('0x' || substr(md5(s),1,8)) AS BIGINT)`. */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Exact dedup — group identical normalized texts; returns one row per
    * duplicate group with its cardinality and the minimum id (the survivor
    * a `dropDuplicates` pass would keep). Plain hash-aggregate: one shuffle
    * on the fingerprint, partial-aggregated map-side. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextStats.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("survivor_id"))

  /** MinHash signature: `numPerm` permutations of the 32-bit shingle hash
    * under `(a_i * h + b_i) mod P`, `a_i = 2i+1`, `b_i = 7919i+1`.
    * Pure array math per row — no shuffle, no UDF. */
  def minhashSignature(text: Column, n: Int, numPerm: Int): Column = {
    val hs = transform(shingles(text, n), s => h32(s))
    transform(sequence(lit(0), lit(numPerm - 1)), i => {
      val a = i * 2 + 1
      val b = i * lit(7919) + 1
      array_min(transform(hs, h => (a * h + b) % Prime))
    })
  }

  /** MinHash + LSH banding: signature is split into `bands` bands of
    * `numPerm / bands` rows; docs sharing any band key become candidate
    * pairs; candidates are verified with the estimated Jaccard (fraction
    * of agreeing minhashes). The band join is the scale trick: each doc
    * explodes to only `bands` rows, and the join key (band index + band
    * hash) is high-cardinality, so the shuffle is well distributed.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, est >= threshold.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val rows = numPerm / bands
    require(bands * rows == numPerm, "bands must divide numPerm")
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), n, numPerm).as("sig"))
    val banded = sigs.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", concat_ws("-",
        transform(slice(col("sig"), col("band") * rows + 1, lit(rows)), _.cast("string"))))
    val a = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / numPerm).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash (Charikar) fingerprint over distinct tokens: bit j of the
    * result is set iff more token hashes have bit j set than clear.
    * `bits` <= 32. Again pure per-row array math. */
  def simhash(text: Column, bits: Int = 16): Column = {
    val hs = transform(array_distinct(split(text, " ")), w => h32(w))
    (0 until bits).map { j =>
      val vote = aggregate(hs, lit(0L),
        (a, h) => a + (shiftright(h, j).bitwiseAND(1) * 2 - 1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: block on each half of the fingerprint (a
    * Hamming-distance pigeonhole: any pair within `bits/2`-bit distance
    * differing in only one half collides on the other), verify with
    * `bit_count(xor) <= maxHamming`. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    val half = bits / 2
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol), bits).as("sh"))
    val blocked = sigs.withColumn("block", explode(array(
      concat_ws(":", lit("lo"), col("sh").bitwiseAND((1L << half) - 1)),
      concat_ws(":", lit("hi"), shiftright(col("sh"), half)))))
    val a = blocked.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity pairs via shingle-inverted-index
    * self-join: explode distinct shingles, join on shingle, count the
    * intersection, then `|A∩B| / (|A| + |B| - |A∩B|)`.
    *
    * Scale note: the inverted-index join is quadratic in the posting-list
    * length of a shingle, so `maxShingleFreq` drops stop-shingles (df >
    * threshold) first — the standard guard that keeps the join linear-ish
    * on real corpora. */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxShingleFreq: Long = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("shingles"))
      .withColumn("n_shingles", size(col("shingles")))
    val posting = sh.select(col("id"), col("n_shingles"),
      explode(col("shingles")).as("shingle"))
    val freqOk = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq)
    val filtered = posting.join(freqOk.select("shingle"), Seq("shingle"))
    val a = filtered.select(col("shingle"), col("id").as("id_a"), col("n_shingles").as("na"))
    val b = filtered.select(col("shingle"), col("id").as("id_b"), col("n_shingles").as("nb"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
