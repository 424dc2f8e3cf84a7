package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a `(user_id, event_type, ts)` stream —
  * the product-analytics pair every telemetry pipeline grows:
  * step-funnel conversion and cohort retention. Both are deterministic
  * relational compositions (min-aggregates, keyed equi-joins, integer
  * week arithmetic) with exact DuckDB replays (q111/q112).
  *
  * Scale shape: every aggregate and join is keyed by `user_id` (or by
  * the week-bounded cohort grid, which is calendar-bounded); step
  * frames shrink monotonically down the funnel, and nothing is ever
  * quadratic — no window over the full event stream, no self-join of
  * raw events against raw events without a step filter first.
  */
object Funnels {

  /** Earliest-completion step funnel: for the ordered `steps` event
    * types, each step's timestamp is the MIN event of that type within
    * `windowSeconds` AFTER the previous step (step 1 = the user's first
    * such event overall). Emits one row per user who completed step 1:
    * `(user_id, step1_ts, ..., stepN_ts, depth)` with nulls past the
    * user's depth.
    *
    * Each step is one filtered min-aggregate joined user-keyed to the
    * previous frontier — the frontier only shrinks, so step k costs at
    * most the step-k event volume plus a users-bounded join. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsCol).cast("timestamp").as("ts"))
    val first = ev.filter(col("et") === steps.head)
      .groupBy("user_id").agg(min("ts").as("ts1"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (frontier, (s, i)) =>
      val prev = s"ts$i"
      val cur = s"ts${i + 1}"
      val next = ev.filter(col("et") === s)
        .join(frontier.select(col("user_id"), col(prev)), Seq("user_id"))
        .filter(col("ts") >= col(prev) &&
          col("ts") <= col(prev) + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy("user_id").agg(min("ts").as(cur))
      frontier.join(next, Seq("user_id"), "left")
    }
    val depth = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"ts${i + 1}").isNotNull, 1).otherwise(0)
    }
    // depth counts the longest completed PREFIX: a null step nulls
    // everything after it by construction (each step joins on the
    // previous frontier), so the sum-of-nonnull form is exact
    full.select(col("user_id") +: steps.indices.map(i => col(s"ts${i + 1}")) :+
      depth.cast("int").as("depth"): _*)
  }

  /** Daily burst detection — the volume-anomaly monitor a telemetry
    * pipeline runs per stream: a day is a burst when its count exceeds
    * the trailing-`window`-day mean by more than `kNum/kDen` standard
    * deviations (one-sided). The test is evaluated in EXACT integer
    * arithmetic — no mean, no sqrt:
    *
    *   cnt − μ > k·σ   ⇔   cnt·n > sum  AND
    *   kDen²·(cnt·n − sum)² > kNum²·(n·sumsq − sum²)
    *
    * (multiply through by n²; σ² = (n·sumsq − sum²)/n²) — so the q113
    * DuckDB oracle replays every flag verbatim, no floating point
    * anywhere. Warm-up days (fewer than `window` trailing observations)
    * report is_burst = false with their n visible.
    *
    * Scale shape: one (type, day) count aggregate — calendar-bounded —
    * then a ROWS-frame window over that tiny frame; raw events are
    * touched once. */
  def burstDays(events: DataFrame, typeCol: String, tsCol: String,
      origin: String, window: Int = 7, kNum: Long = 5, kDen: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = ((unix_timestamp(col(tsCol).cast("timestamp")) -
      unix_timestamp(lit(origin).cast("timestamp"))) / lit(86400L))
    val daily = events
      .select(col(typeCol).as("event_type"), floor(day).cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-window, -1)
    val stats = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("tsum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("tsumsq", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
    val dev = col("cnt") * col("n") - col("tsum")
    val varN2 = col("n") * col("tsumsq") - col("tsum") * col("tsum")
    stats.select(col("event_type"), col("day"), col("cnt"), col("n"),
      col("tsum"), col("tsumsq"),
      (col("n") === window && dev > 0 &&
        lit(kDen * kDen) * dev * dev > lit(kNum * kNum) * varN2).as("is_burst"))
  }

  /** Session journey mining: the top-`k` most common length-`3`
    * event-type sequences within user sessions (`session_window` with
    * `gap`) — the "what do users actually do" pass of product
    * analytics, and the n-gram pattern-mining shape (PMI's zip-explode,
    * one order up) applied to behavioral sequences.
    *
    * Determinism: in-session order is (ts, event_id) via
    * `sort_array(collect_list(struct(...)))` — exact integer/µs sort,
    * no window-sort nondeterminism. Scale shape: one session_window
    * aggregate (user-keyed exchange) whose output is sessions, not
    * events; the trigram explode is scan-fused over the per-session
    * type arrays; the count aggregate's key domain is |event types|³;
    * the top-k is TakeOrderedAndProject. */
  def sessionJourneys(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, gap: String = "30 minutes",
      k: Int = 20): DataFrame = {
    val seqs = events
      .groupBy(session_window(col(tsCol).cast("timestamp"), gap), col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).as("eid"), col(typeCol).as("et")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("et")).as("types"))
    val a = col("types")
    val m = greatest(size(a) - 2, lit(0))
    val tri = seqs.select(explode(zip_with(
        zip_with(slice(a, lit(1), m), slice(a, lit(2), m),
          (x, y) => struct(x.as("t1"), y.as("t2"))),
        slice(a, lit(3), m),
        (p, z) => struct(p.getField("t1").as("t1"),
          p.getField("t2").as("t2"), z.as("t3")))).as("g"))
      .select(col("g.t1").as("t1"), col("g.t2").as("t2"), col("g.t3").as("t3"))
    tri.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Weekly cohort retention: cohort(user) = epoch-week of the user's
    * first event (relative to `origin`); a user is retained at offset k
    * if they have ≥1 event in week cohort+k. Emits the dense grid
    * `(cohort_week, week_offset, active_users, cohort_size, retention)`
    * for offsets that occurred.
    *
    * Two user-keyed aggregates (first week, distinct active weeks) ride
    * one exchange; the output grid is calendar-bounded. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      origin: String): DataFrame = {
    val week = (unix_timestamp(col(tsCol).cast("timestamp")) -
      unix_timestamp(lit(origin).cast("timestamp"))) / lit(604800L)
    val uw = events
      .select(col(userCol).as("user_id"), floor(week).cast("long").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, Seq("user_id"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset").agg(count(lit(1)).as("active_users"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }
  /** CUSUM drift detector over daily event volumes (Page 1954): flags
    * the day a type's volume has accumulated a SUSTAINED excursion above
    * its reference rate — the sequential complement of [[burstDays]]'
    * single-day z-test (a slow 15% ramp never trips a one-day z-test;
    * CUSUM integrates it until it must).
    *
    * Entirely integer arithmetic, closed form instead of a sequential
    * fold: with y_d = cnt_d − k_ref and P_d the running sum of y over the
    * type's observed days, the classic recursion
    * S_d = max(0, S_{d−1} + y_d) has the prefix-sum identity
    * S_d = P_d − min(0, min_{j≤d} P_j) — so two window functions over the
    * calendar-bounded daily frame compute it, no per-key recursion, no
    * UDF, no state. Raw events are touched once (the daily aggregate).
    *
    * k_ref per type = ceil-mean daily count + `allowancePermille`‰ of it
    * (integer division); alarm when S_d > hMult·k_ref. Days with zero
    * events carry no row and so contribute nothing — the detector runs
    * over OBSERVED days, which is the streaming-ingest reality.
    */
  def cusumDrift(events: DataFrame, typeCol: String, tsCol: String,
      origin: String, allowancePermille: Long = 100, hMult: Long = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = ((unix_timestamp(col(tsCol).cast("timestamp")) -
      unix_timestamp(lit(origin).cast("timestamp"))) / lit(86400L))
    val daily = events
      .select(col(typeCol).as("event_type"), floor(day).cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy("event_type")
    // integer divisions via floor-of-double: exact while the dividends
    // stay under 2^53 (daily sums per type; the oracle replays with //)
    val ref = daily
      .withColumn("ceil_mean",
        floor((sum(col("cnt")).over(byType) + count(lit(1)).over(byType) - 1) /
          count(lit(1)).over(byType)).cast("long"))
      .withColumn("k_ref",
        col("ceil_mean") +
          floor(col("ceil_mean") * allowancePermille / 1000).cast("long"))
    val run = byType.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref
      .withColumn("p", sum(col("cnt") - col("k_ref")).over(run))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(run)))
      .select(col("event_type"), col("day"), col("cnt"), col("k_ref"),
        col("s"), (col("s") > col("k_ref") * hMult).as("is_drift"))
  }
  /** Per-user behavioral entropy over event types — bots and scripted
    * accounts collapse to near-zero entropy (one repeated action),
    * engaged humans spread over the type vocabulary; the per-user
    * quality signal event-stream curation filters on. Shannon entropy
    * in nats from exact integer counts:
    *
    *   H = ln(n) − (Σ_t c_t·ln(c_t)) / n
    *
    * with every ln through DECIMAL(27,12) (the q63 discipline) and the
    * Σ an exact DECIMAL sum, so the published double is engine-exact.
    * One (user, type) count aggregate (map-side partial, key domain
    * users × |types|) collapsed to one row per user — no window, no
    * per-user sort. */
  def behavioralEntropy(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def lnDec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      log(c.cast("double")).cast(DecimalType(27, 12))
    events
      .groupBy(col(userCol).as("user_id"), col(typeCol).as("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast(DecimalType(10, 0)) * lnDec(col("c"))).as("s"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        round(lnDec(col("n_events")).cast("double") -
          col("s").cast("double") / col("n_events").cast("double"), 6)
          .as("entropy_nats"))
  }
}
