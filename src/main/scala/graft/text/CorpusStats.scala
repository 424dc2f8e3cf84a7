package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-distribution diagnostics for training-data pipelines: Zipf
  * rank-frequency slope (is a source natural language, boilerplate, or
  * keyboard mash?) and smoothed unigram KL divergence of each source
  * against the corpus (which source drifts hardest from the mixture —
  * the domain-shift monitor next to [[TextStats.vocabGrowth]]'s novelty
  * curve).
  *
  * Cross-engine float discipline: every ln goes through DECIMAL(27,12)
  * (the q63/q127 convention), all sums are integer or DECIMAL (exact,
  * order-independent), and doubles appear only in a fixed-shape final
  * expression — so DuckDB replays every value bit-for-bit.
  */
object CorpusStats {

  private def lnDec(c: Column): Column =
    log(c.cast("double")).cast(DecimalType(27, 12))

  /** Zipf slope per group: the least-squares slope of ln(freq) over
    * ln(rank) across the group's token frequency table (natural text
    * sits near −1; templated/boilerplate sources flatten, mash steepens).
    *
    * Exactness: x = ln(rank), y = ln(count) are quantized to integers
    * ⌊10⁵·DECIMAL(27,12)⌋ (the common 10⁵ factor cancels in the slope),
    * so Σx, Σy, Σxy, Σx² are exact integer sums — order-independent —
    * and the published slope is ONE IEEE division of two exact integers.
    *
    * Scale shape: one corpus scan → (group, token) counts
    * (vocabulary-bounded, map-side partial); the rank window sorts the
    * frequency TABLE within each group (types, not tokens); the
    * regression is a 5-aggregate group-by. Nothing is corpus-sized after
    * the first aggregate. */
  def zipfSlope(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(groupCol).as("g"), explode(TextStats.tokens(col(textCol))).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
    val ranked = tf.withColumn("rank",
      row_number().over(Window.partitionBy("g").orderBy(desc("c"), asc("tok"))))
    val q = ranked.select(col("g"), col("c"),
      floor(lnDec(col("rank")) * 100000).cast("long").as("x"),
      floor(lnDec(col("c")) * 100000).cast("long").as("y"))
    val dec38 = DecimalType(38, 0)
    q.groupBy("g").agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum((col("x") * col("y")).cast(dec38)).as("sxy"),
        sum((col("x") * col("x")).cast(dec38)).as("sxx"))
      .filter(col("n_types") >= 2)
      .select(col("g"), col("n_types"), col("n_tokens"),
        round((col("n_types").cast(dec38) * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n_types").cast(dec38) * col("sxx") - col("sx") * col("sx"))
          .cast("double"), 6).as("zipf_slope"))
  }

  /** Smoothed unigram KL divergence KL(P_group ‖ P_corpus) per group —
    * add-one smoothing over the corpus vocabulary V, so the divergence
    * is finite even when a group misses most of the vocabulary.
    *
    * The naive sum ranges over V × groups (every source × every vocab
    * token, present or not) — materializing that cross frame is exactly
    * the kind of bounded-but-huge stage a 100 TB pipeline cannot afford.
    * It decomposes instead: with D_s = n_s + V, D = N + V,
    *
    *   KL_s = T_s / D_s + ln D − ln D_s,
    *   T_s  = Σ_present [(c_sw+1)·ln(c_sw+1) − c_sw·ln(c_w+1)] − G,
    *   G    = Σ_vocab ln(c_w+1),
    *
    * (the absent-token mass folds into the per-present correction and
    * the global scalar G — algebra in the scaladoc of q136's oracle).
    * So the compute is: per-(group, token) PRESENT counts, a
    * vocabulary-bounded corpus frequency table, and two scalars. No
    * vocab × groups frame ever exists.
    *
    * Exactness: T_s and G are DECIMAL sums of integer×DECIMAL(27,12)
    * products; the published KL is a fixed-shape double expression over
    * exact parts. */
  def klDrift(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val st = docs
      .select(col(groupCol).as("g"), explode(TextStats.tokens(col(textCol))).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
    val cw = st.groupBy("tok").agg(sum(col("c")).as("cw"))
    val globals = cw.agg(
      count(lit(1)).as("v"),
      sum(col("cw")).as("n_total"),
      sum(lnDec(col("cw") + 1)).as("g_sum"))
    val perSrc = st.join(cw, Seq("tok"))
      .groupBy("g").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("c") + 1).cast(DecimalType(10, 0)) * lnDec(col("c") + 1) -
          col("c").cast(DecimalType(10, 0)) * lnDec(col("cw") + 1)).as("s_present"))
    perSrc.crossJoin(broadcast(globals))
      .select(col("g"), col("n_tokens"), col("n_types"),
        round((col("s_present") - col("g_sum")).cast("double") /
            (col("n_tokens") + col("v")).cast("double") +
          lnDec(col("n_total") + col("v")).cast("double") -
          lnDec(col("n_tokens") + col("v")).cast("double"), 6).as("kl_nats"))
  }
}
