package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over timestamped event streams (batch side).
  *
  * Scale notes: both operators shuffle once on their natural key
  * (window+type / user) and aggregate with partial map-side combine.
  * Sessionization uses one window pass per user partition — at 100 TB the
  * per-user event counts are the skew risk, not the user count; AQE skew
  * handling plus the ms-granularity sort keep partitions balanced.
  * Double sums go through DECIMAL(18,6) so the result is independent of
  * partial-aggregation order (float addition is not associative; a plain
  * sum(double) is nondeterministic across partitionings).
  */
object EventOps {

  /** Tumbling-window aggregation: event count + exact value sum per
    * (window, key). `windowDuration` e.g. "1 hour". */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String
  ): DataFrame =
    Ts.normalize(events, tsCol)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col(keyCol), col("n_events"), col("total_value"))

  /** Hopping (sliding) window aggregation: like [[windowedAgg]] but
    * windows of `windowDuration` advance every `slideDuration`, so each
    * event lands in windowDuration/slideDuration overlapping windows.
    * Spark plans `window(ts, dur, slide)` as a narrow per-event explode of
    * its window list feeding the SAME single shuffle hash-aggregate as the
    * tumbling case — the overlap factor multiplies map-side rows, never
    * shuffles or joins. */
  def hoppingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      slideDuration: String
  ): DataFrame =
    Ts.normalize(events, tsCol)
      .groupBy(window(col(tsCol), windowDuration, slideDuration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col(keyCol), col("n_events"), col("total_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMs`. Returns one row per
    * (user, session) with event count and start/end epoch-millis. */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapMs: Long
  ): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val tsMs   = Ts.millis(events, tsCol)
    val prevMs = lag(tsMs, 1).over(byUser)
    val isNew  = when(prevMs.isNull || (tsMs - prevMs) > gapMs, 1L).otherwise(0L)
    events
      .withColumn("ts_ms", tsMs)
      .withColumn("session_id",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"))
  }

  /** Per-user daily LAG/ROLLING feature frame — the feature-engineering
    * export a forecasting or churn model trains on: one row per
    * (user, active day) with the day's DECIMAL-routed value total and
    * event count, the previous and 7-back OBSERVED-day totals (row
    * lags, so sparse users are well-defined), and the trailing-7-row
    * mean. Lags are null while history is short — exactly what a
    * feature store would emit.
    *
    * Scale shape: one (user, day) aggregate shuffle with map-side
    * combine, then one window pass partitioned by user over the
    * day-compressed frame (rows = active user-days, not events). The
    * decimal day totals are cast to double BEFORE the rolling divide so
    * the oracle reproduces the arithmetic bit for bit. */
  def lagFeatures(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val daily = events
      .groupBy(col(userCol), date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("dv"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
    val w7 = w.rowsBetween(-6, Window.currentRow)
    daily.select(col(userCol), col("day"), col("n_events"),
      round(col("dv").cast("double"), 6).as("day_value"),
      round(lag(col("dv"), 1).over(w).cast("double"), 6).as("lag1_value"),
      round(lag(col("dv"), 7).over(w).cast("double"), 6).as("lag7_value"),
      round(sum(col("dv")).over(w7).cast("double") /
        count(lit(1)).over(w7), 6).as("roll7_mean"))
  }

  /** Session attribution — attach SIDE events into sessions built from
    * ANCHOR events: sessions come from [[sessionize]] over the anchor
    * stream, and each side event lands in the session(s) whose
    * [start, end] window contains its timestamp ("which browsing
    * session did this purchase belong to"). Output: every session with
    * its attached-event count and DECIMAL-routed attached-value total
    * (0 for sessions that converted nothing — the left join keeps
    * them).
    *
    * Scale shape: an EQUI-join keyed on the user plus a residual range
    * predicate — never a cross product or a time-replicated bucket
    * join; the shuffle carries each side's rows once, and the residual
    * nested loop is bounded by sessions-per-user (small in any real
    * clickstream; a pathological hot user would bucket by day first,
    * the [[graft.ops.Temporal]] interval-join recipe). */
  def sessionAttach(
      anchors: DataFrame,
      side: DataFrame,
      userCol: String,
      tsCol: String,
      gapMs: Long,
      valueCol: String
  ): DataFrame = {
    val sess = sessionize(anchors, userCol, tsCol, gapMs)
    val sideTs = side.select(col(userCol).as("__side_user"),
      Ts.millis(side, tsCol).as("__side_ms"),
      col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__side_v"))
    sess.join(sideTs,
        sess(userCol) === col("__side_user") &&
          col("__side_ms") >= col("start_ms") && col("__side_ms") <= col("end_ms"),
        "left")
      .groupBy(sess(userCol), col("session_id"), col("n_events"),
        col("start_ms"), col("end_ms"))
      .agg(count(col("__side_ms")).as("n_attached"),
        round(coalesce(sum(col("__side_v")), lit(0))
          .cast("double"), 6).as("attached_value"))
  }

  /** Per-key numeric profile for data-quality checks: counts, null counts,
    * min/max, and DECIMAL-routed sum/mean (partial-aggregation-order
    * independent — a plain sum(double) is nondeterministic across
    * partitionings), plus the exact interpolated median. One shuffle on the
    * key with map-side partial aggregation; the median is the only
    * full-values aggregate. `exact = false` is the 100 TB call-site
    * switch: p50 comes from the constant-memory `approx_percentile`
    * sketch (at `accuracy`) instead of holding each key's value set. */
  def valueProfile(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    val decSum = sum(col(valueCol).cast(DecimalType(18, 6)))
    val p50 =
      if (exact) percentile(col(valueCol), lit(0.5))
      else percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).cast("double")
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("n_null"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"),
        decSum.cast("double").as("vsum"),
        (decSum.cast("double") / count(lit(1))).as("vavg"),
        p50.as("p50"))
  }

  /** Per-key quantile profile with a self-checking approximation gate:
    * exact interpolated p50/p90 next to the Greenwald-Khanna sketch
    * estimates (`approx_percentile` — the 100 TB path: constant-memory
    * mergeable sketches instead of holding each key's full value set), plus
    * booleans asserting the sketch lands within `relTol` of exact. The
    * booleans make the approximation ORACLE-CHECKABLE across engines whose
    * sketches differ (same pattern as the HLL gate in
    * `events_approx_distinct`).
    *
    * `exact = true` (the eval posture) runs the full-values exact
    * percentiles next to the sketch; `exact = false` is the 100 TB
    * call-site switch — p50/p90 come from the sketch alone, nothing holds
    * a key's value set, and the gates report true vacuously (there is no
    * reference to compare against; schema is unchanged). */
  def quantileProfile(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      accuracy: Int = 10000,
      relTol: Double = 0.05,
      exact: Boolean = true
  ): DataFrame = {
    val v = col(valueCol)
    def within(approx: Column, exact: Column): Column =
      abs(approx - exact) <= abs(exact) * relTol
    val base = df.groupBy(col(keyCol))
    if (exact)
      base.agg(
        count(lit(1)).as("n"),
        percentile(v, lit(0.5)).as("p50"),
        percentile(v, lit(0.9)).as("p90"),
        percentile_approx(v, lit(0.5), lit(accuracy)).as("ap50"),
        percentile_approx(v, lit(0.9), lit(accuracy)).as("ap90"))
      .select(col(keyCol), col("n"),
        round(col("p50"), 6).as("p50"),
        round(col("p90"), 6).as("p90"),
        within(col("ap50"), col("p50")).as("ok_p50"),
        within(col("ap90"), col("p90")).as("ok_p90"))
    else
      base.agg(
        count(lit(1)).as("n"),
        percentile_approx(v, lit(0.5), lit(accuracy)).cast("double").as("ap50"),
        percentile_approx(v, lit(0.9), lit(accuracy)).cast("double").as("ap90"))
      .select(col(keyCol), col("n"),
        round(col("ap50"), 6).as("p50"),
        round(col("ap90"), 6).as("p90"),
        lit(true).as("ok_p50"),
        lit(true).as("ok_p90"))
  }

  /** Fixed-width histogram per key: values bucket into
    * `[i*binWidth, (i+1)*binWidth)` with the last bin catching overflow
    * (and bin 0 catching negatives) — one map-side-combinable aggregate,
    * the constant-memory distribution profile for dashboards/drift checks.
    * Returns (keyCol, bin, n) for occupied bins. */
  def fixedHistogram(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      binWidth: Double,
      nBins: Int
  ): DataFrame = {
    val bin = least(greatest(floor(col(valueCol) / binWidth), lit(0)), lit(nBins - 1))
      .cast("int")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** One-pass multi-column profile: row count, null count and exact
    * distinct count for every requested column, unpivoted to one row per
    * column — the schema-wide data-quality sweep. All statistics ride ONE
    * aggregate over one scan (Catalyst plans the multiple distincts via
    * Expand); at 100 TB swap `countDistinct` for `approx_count_distinct`
    * to avoid the expand blowup — the shape is otherwise identical. */
  def schemaProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd")))
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nn`, `${c}__nd`").mkString(", ")
    df.agg(count(lit(1)).as("n"), aggs: _*)
      .select(col("n"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct)"))
      .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"))
  }

  /** Min-timestamp funnel (first-touch attribution): a user reaches stage k
    * when their EARLIEST occurrence of every stage 1..k exists and is
    * strictly ordered in time (t₁ < t₂ < … < t_k). Returns one row per
    * stage: (stage, stage_idx, n_users).
    *
    * Scale shape: one shuffle groups events by user with map-side partial
    * `min(when(...))` aggregation — per-user state is `stages.size`
    * timestamps regardless of event count — then a single-row rollup of
    * stage booleans unpivots to the per-stage counts. No self-joins (the
    * naive k-way join formulation shuffles the event table k times). */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val mins = events
      .filter(col(typeCol).isInCollection(stages))
      .groupBy(col(userCol))
      .agg(
        min(when(col(typeCol) === stages.head, col(tsCol))).as("__t_0"),
        stages.tail.zipWithIndex.map { case (s, i) =>
          min(when(col(typeCol) === s, col(tsCol))).as(s"__t_${i + 1}")
        }: _*)
    val reached: Seq[Column] = stages.indices.map { k =>
      val present = (0 to k).map(i => col(s"__t_$i").isNotNull)
      val ordered = (1 to k).map(i => col(s"__t_${i - 1}") < col(s"__t_$i"))
      (present ++ ordered).reduce(_ && _)
    }
    val rolled = mins.agg(
      sum(when(reached.head, 1L).otherwise(0L)).as("__n_0"),
      reached.tail.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__n_${i + 1}")
      }: _*)
    val stackArgs = stages.zipWithIndex
      .map { case (s, i) => s"'$s', $i, `__n_$i`" }.mkString(", ")
    rolled
      .select(expr(s"stack(${stages.size}, $stackArgs) AS (stage, stage_idx, n_users)"))
      .select(col("stage"), col("stage_idx"), coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Time-boxed funnel — [[funnel]] with a conversion window: a user
    * counts at stage k only when every later stage's first occurrence
    * ALSO lands within `maxDelayMs` of the stage-0 anchor (the user's
    * first stage-0 event). Unbounded funnels credit conversions that took
    * a year; this is the "converted within 7 days" product readout.
    * Convention (documented, shared with [[funnel]]): stage times are
    * each type's FIRST occurrence, anchored at the first stage-0 —
    * a later qualifying re-entry is out of scope. Same one-aggregate +
    * one-row-rollup shape: no self-joins, no windows. */
  def funnelWindowed(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      maxDelayMs: Long
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val mins = ev
      .filter(col(typeCol).isInCollection(stages))
      .groupBy(col(userCol))
      .agg(
        min(when(col(typeCol) === stages.head, col("__ms"))).as("__t_0"),
        stages.tail.zipWithIndex.map { case (s, i) =>
          min(when(col(typeCol) === s, col("__ms"))).as(s"__t_${i + 1}")
        }: _*)
    val reached: Seq[Column] = stages.indices.map { k =>
      val present = (0 to k).map(i => col(s"__t_$i").isNotNull)
      val ordered = (1 to k).map(i => col(s"__t_${i - 1}") < col(s"__t_$i"))
      val inWindow = (1 to k).map(i => col(s"__t_$i") <= col("__t_0") + maxDelayMs)
      (present ++ ordered ++ inWindow).reduce(_ && _)
    }
    val rolled = mins.agg(
      sum(when(reached.head, 1L).otherwise(0L)).as("__n_0"),
      reached.tail.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__n_${i + 1}")
      }: _*)
    val stackArgs = stages.zipWithIndex
      .map { case (s, i) => s"'$s', $i, `__n_$i`" }.mkString(", ")
    rolled
      .select(expr(s"stack(${stages.size}, $stackArgs) AS (stage, stage_idx, n_users)"))
      .select(col("stage"), col("stage_idx"), coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Per-key cardinality profile: exact distinct plus HyperLogLog estimate
    * (the scale path — approx_count_distinct aggregates constant-size
    * sketches instead of shuffling the full distinct key set). */
  def cardinalityProfile(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(idCol)).as("nd_exact"),
        approx_count_distinct(col(idCol)).as("nd_approx"))

  /** Per-user conversion delay: time from the user's FIRST `fromType`
    * event to their first `toType` event at-or-after it (signup→purchase,
    * view→click…). Two map-side-combinable aggregates and one user-keyed
    * equi-join, all co-partitioned on the user — no window over event
    * history, so a hot user costs one aggregate row, not a sorted task.
    * Users with no `fromType` event are excluded; unconverted users keep
    * null `to_ms`/`delay_ms` and `converted = false`. */
  def conversionDelay(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      fromType: String,
      toType: String
  ): DataFrame = {
    val ms = Ts.millis(events, tsCol)
    val first = events.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === fromType, ms)).as("from_ms"))
      .filter(col("from_ms").isNotNull)
    val to = events.select(col(userCol), ms.as("ms"), col(typeCol))
      .filter(col(typeCol) === toType)
      .join(first, Seq(userCol))
      .filter(col("ms") >= col("from_ms"))
      .groupBy(col(userCol)).agg(min(col("ms")).as("to_ms"))
    first.join(to, Seq(userCol), "left")
      .select(col(userCol), col("from_ms"), col("to_ms"),
        (col("to_ms") - col("from_ms")).as("delay_ms"),
        col("to_ms").isNotNull.as("converted"))
  }

  /** Multi-level OLAP rollup over (key, day): per-(key, day) subtotals,
    * per-key totals, and the grand total in ONE pass. Spark plans `rollup`
    * as an Expand (3 grouping sets per input row) feeding a single hash
    * aggregate — one shuffle, map-side partial combine, so the 100 TB cost
    * is the same shape as a plain groupBy with 3× the map-side rows.
    * Rolled-up levels are labeled 'ALL' and disambiguated from genuine
    * values by the `grouping()` flags (a real key named 'ALL' would
    * otherwise collide). Sums are DECIMAL-routed. */
  def rollupProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = multiLevelProfile(events, keyCol, tsCol, valueCol, toCube = false)

  /** CUBE sibling of [[rollupProfile]]: adds the per-day marginal the
    * rollup lacks — all four grouping sets (key, day) / (key) / (day) /
    * () in the same single Expand+aggregate pass (4 grouping sets per
    * input row instead of 3; identical shuffle shape). */
  def cubeProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = multiLevelProfile(events, keyCol, tsCol, valueCol, toCube = true)

  private def multiLevelProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      toCube: Boolean
  ): DataFrame = {
    val day = to_date(col(tsCol))
    val decSum = sum(col(valueCol).cast(DecimalType(18, 6)))
    val pre = events.select(col(keyCol), day.as("day"), col(valueCol))
    val grouped =
      if (toCube) pre.cube(col(keyCol), col("day"))
      else pre.rollup(col(keyCol), col("day"))
    grouped
      .agg(count(lit(1)).as("n"), decSum.cast("double").as("vsum"),
        grouping(col(keyCol)).as("g_key"), grouping(col("day")).as("g_day"))
      .select(
        coalesce(col(keyCol).cast("string"), lit("ALL")).as("key"),
        coalesce(col("day").cast("string"), lit("ALL")).as("day"),
        col("g_key").cast("int").as("g_key"),
        col("g_day").cast("int").as("g_day"),
        col("n"), round(col("vsum"), 6).as("vsum"))
  }

  /** Time-series gap fill: densify per-key bucket aggregates over the
    * corpus's full [min, max] bucket range, emitting explicit zero rows
    * for silent periods — resampling for dashboards/anomaly baselines,
    * where a missing bucket and a zero bucket mean different things.
    * The grid is GENERATED, not scanned: distinct keys (small) ×
    * `sequence(lo, hi)` from a 1-row bounds aggregate, so grid size is
    * #keys · #buckets regardless of event count; the aggregated frame
    * left-joins the grid on (key, bucket). */
  def gapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      bucketMs: Long,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val bucket = expr(s"__ms div $bucketMs")
    val decSum = sum(col(valueCol).cast(DecimalType(18, 6)))
    // cached: consumed by the bounds aggregate, the key list AND the final
    // join — scope-owned, release after the result is materialized
    val agg = scope.cache(ev
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), round(decSum.cast("double"), 6).as("vsum")))
    val bounds = agg.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = agg.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("vsum"), lit(0.0)).as("vsum"))
  }

  /** Robust outlier gate via the median absolute deviation: per key, the
    * exact interpolated median, the MAD (median of |v − median|), and the
    * count of values beyond `k` scaled MADs (1.4826·MAD ≈ σ under
    * normality — the standard robust z-score). Three full scans by
    * construction (each pass needs the previous one's per-key stats); the
    * per-key stat tables are tiny and broadcast back, so no pass shuffles
    * the fact table beyond its own aggregation. `exact = false` is the
    * 100 TB call-site switch: both medians come from the Greenwald-Khanna
    * sketch (`approx_percentile` at `accuracy`) — constant memory per key
    * instead of holding a key's full value set (same trade as
    * [[quantileProfile]]'s gate). */
  def madOutlierGate(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Double = 3.0,
      exact: Boolean = true,
      accuracy: Int = 10000,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    val v = col(valueCol)
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(accuracy)).cast("double")
    // pass 1: per-key medians (tiny — one row per key). Cached because
    // withMed is consumed by BOTH later passes and Spark does not dedup
    // common subplans — uncached, each would re-run the percentile agg.
    val medians = scope.cache(df.groupBy(col(keyCol))
      .agg(med(v).as("med")))
    val withMed = df.join(broadcast(medians), Seq(keyCol))
    // pass 2: MAD = median of absolute deviations from the key's median
    val mads = withMed.groupBy(col(keyCol))
      .agg(med(abs(v - col("med"))).as("mad_raw"))
    // pass 3: count beyond k scaled MADs; n/med/mad ride the same
    // aggregate (every row already carries them), so no join-back
    withMed
      .join(broadcast(mads), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad_raw")), 6).as("mad"),
        sum(when(abs(v - col("med")) > lit(k) * lit(1.4826) * col("mad_raw"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col(keyCol), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Per-event sliding-rate feature: how many events the same user emitted
    * in the trailing `windowSec` seconds (inclusive of this one) — a RANGE
    * frame over epoch seconds, so simultaneous events count each other
    * symmetrically and tie order is irrelevant. One shuffle on the user
    * plus an in-partition sort; no join, no second pass. */
  def slidingRate(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowSec: Long
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val sec = expr("__ms div 1000")
    val w = Window.partitionBy(col(userCol)).orderBy(sec)
      .rangeBetween(-windowSec, Window.currentRow)
    ev.select(col(userCol), col(tsCol), count(lit(1)).over(w).as("n_trailing"))
  }

  /** Cohort retention: users grouped by first-activity week, activity
    * counted per (cohort week, active week) — the classic growth rollup.
    * Weeks are `epoch_millis div 604800000` integer buckets
    * (engine-portable arithmetic; no calendar-week locale ambiguity).
    * Three map-side-combinable aggregates (first week per user, distinct
    * user-weeks, the cohort×week count) and one equi-join on the user —
    * every shuffle carries ids and week ints, never events. Output:
    * (cohort_week, active_week, week_offset, n_users). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val wk = expr("__ms div 604800000")
    val firstWeek = ev.groupBy(col(userCol)).agg(min(wk).as("cohort_week"))
    val active = ev.select(col(userCol), wk.as("active_week")).distinct()
    active.join(firstWeek, Seq(userCol))
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_week"), col("active_week"),
        (col("active_week") - col("cohort_week")).as("week_offset"), col("n_users"))
  }

  /** Per-day pivot: one row per day, one (count, value-sum) column pair
    * per pivot value — the wide-format report `rollupProfile`'s long
    * format feeds. The pivot domain is CALLER-SUPPLIED: at 100 TB you
    * never spend a full scan discovering it (`.pivot(col)` without
    * values does exactly that), and `.pivot(col, values)` still compiles
    * to a two-stage aggregate via `PivotFirst`. Conditional aggregation
    * is one map-side-combinable pass with the same single shuffle on the
    * day — strictly the better plan, identical output. Values absent
    * from a day produce 0s, not nulls; sums are DECIMAL-routed. */
  def pivotProfile(
      events: DataFrame,
      tsCol: String,
      pivotCol: String,
      valueCol: String,
      values: Seq[String]
  ): DataFrame = {
    val day = to_date(col(tsCol)).cast("string")
    val aggs = values.flatMap { v =>
      val hit = col(pivotCol) === lit(v)
      Seq(
        sum(when(hit, 1L).otherwise(0L)).as(s"n_$v"),
        round(sum(when(hit, col(valueCol)).otherwise(lit(0.0))
          .cast(DecimalType(18, 6))).cast("double"), 6).as(s"sum_$v"))
    }
    events.groupBy(day.as("day")).agg(aggs.head, aggs.tail: _*)
  }

  /** First-touch attribution: for every conversion event, the type of the
    * user's FIRST event (at or before the conversion) and the elapsed
    * time to convert. One shuffle on the user plus an in-partition sort;
    * the window is cumulative (`rows unbounded preceding`), so running
    * min/first state is O(1) per row and the filter to conversions
    * happens after the window without a second pass. Tie order is pinned
    * by (ts, event_id) — simultaneous events attribute deterministically. */
  def firstTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsMs = Ts.millis(events, tsCol)
    events
      .withColumn("first_touch", first(col(typeCol)).over(w))
      .withColumn("ms_to_convert", tsMs - min(tsMs).over(w))
      .withColumn("n_prior_events", count(lit(1)).over(w) - 1L)
      .filter(col(typeCol) === lit(conversionType))
      .select(col(idCol), col(userCol), col("first_touch"),
        col("ms_to_convert"), col("n_prior_events"))
  }

  /** Top-k event-type sequences: the `n`-length type n-grams users emit
    * in timestamp order, globally counted, top `k` by frequency —
    * sequence mining for funnel discovery. `lead` windows build the
    * n-grams in the same single user-shuffle+sort every per-user pass
    * here uses; the global count is map-side combinable on short string
    * keys; top-k is TakeOrderedAndProject (per-partition heads, never a
    * full sort). Ties break on the sequence string so the cut is
    * deterministic. */
  def topSequences(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      n: Int = 3,
      k: Int = 25
  ): DataFrame = {
    require(n >= 2, s"sequence length must be >= 2, got $n")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = (0 until n).map { i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w)
    }
    events
      .select(concat_ws(">", steps: _*).as("seq"), steps.last.isNotNull.as("full"))
      .filter(col("full"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("seq"))
      .limit(k)
  }

  /** MATCH_RECOGNIZE-lite: count regex PATTERN matches over each user's
    * time-ordered event-type sequence — the row-pattern recognition
    * operator (SQL:2016 `MATCH_RECOGNIZE`, Flink CEP) Spark has no native
    * form of, expressed with built-ins only: map each event type to one
    * character (`alphabet`; unmapped types become `other`), fold each
    * user's events — ordered by (ts, id), so ties are pinned — into one
    * string, and run the Java-regex `pattern` over it. Matches are
    * leftmost, non-overlapping, greedy: exactly the semantics of
    * `regexp_extract_all`, and of `MATCH_RECOGNIZE ... AFTER MATCH SKIP
    * PAST LAST ROW` for patterns without alternation. Returns per user the
    * match count and the longest match's event span; only users with ≥1
    * match survive.
    *
    * Scale: one shuffle keyed on the user; per-group state is the user's
    * own event string (the same bound as any per-entity CEP — sessionize
    * first if single entities are unbounded), and the regex runs
    * codegen-adjacent per row, never on the driver. The single-char
    * alphabet keeps the string length equal to the event count, so a
    * 10k-event user costs a 10k-char regex scan, not a row-by-row state
    * machine. */
  def sequencePattern(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      alphabet: Seq[(String, String)],
      pattern: String,
      other: String = "o"
  ): DataFrame = {
    require(alphabet.nonEmpty, "alphabet must map at least one event type")
    require(alphabet.forall(_._2.length == 1) && other.length == 1,
      s"alphabet symbols must be single characters: $alphabet / $other")
    val mapped = alphabet.tail
      .foldLeft(when(col(typeCol) === alphabet.head._1, lit(alphabet.head._2))) {
        case (acc, (t, c)) => acc.when(col(typeCol) === t, lit(c))
      }.otherwise(lit(other))
    // typed Column API, not SQL-string interpolation: a pattern holding a
    // quote or backslash must reach the regex engine verbatim, never the
    // SQL parser
    val matches = regexp_extract_all(col("seq"), lit(pattern), lit(0))
    events
      .select(col(userCol).as("user_id"),
        struct(col(tsCol), col(idCol), mapped.as("c")).as("st"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("st"))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"),
        size(matches).cast("long").as("n_matches"),
        coalesce(array_max(transform(matches, m => length(m))), lit(0))
          .cast("long").as("longest"))
      .filter(col("n_matches") > 0)
  }

  /** Debounce: drop an event when the PREVIOUS raw event of the same
    * (user, type) landed within `minGapMs` before it — duplicate-click /
    * retry-storm suppression. The gate compares to the previous RAW event
    * (a `lag` over the (user, type) partition), not the previous kept one:
    * a burst collapses to its first event only if every inter-event gap is
    * short, which is the standard analytics debounce and — unlike
    * kept-event chaining — is expressible as one window pass with no
    * recursion. Tie order inside equal timestamps is pinned on `idCol`.
    * One shuffle on (user, type); no join, no second pass. */
  def debounce(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      minGapMs: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    val tsMs   = Ts.millis(events, tsCol)
    val prevMs = lag(tsMs, 1).over(w)
    events
      .withColumn("gap_ok", prevMs.isNull || (tsMs - prevMs) >= minGapMs)
      .filter(col("gap_ok"))
      .drop("gap_ok")
  }

  /** Rolling distinct actives: for every day with activity, the distinct
    * `userCol` count over the trailing `windowDays` days (inclusive). The
    * scale shape converts the range join a naive rolling-distinct implies
    * into narrow arithmetic: dedup (day, user) pairs first (map-side
    * combinable, collapses each user's per-day event volume to 1 row),
    * EXPLODE each pair to the `windowDays` target days it contributes to
    * (narrow — no join, no grid scan), dedup (target_day, user) again
    * (a user active on several days of one window must count once), then
    * count. Day-grid frames are #days-sized — broadcast by construction.
    * Output is restricted to days that actually appear in the data (the
    * semi-join with `obsDays`), matching the "report days we observed"
    * convention; a gap-filled variant would swap in [[gapFill]]'s grid. */
  def rollingActive(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val day = expr(s"__ms div ${86400000L}")
    val dayUser = ev.select(day.as("day"), col(userCol).as("u")).distinct()
    val obsDays = dayUser.select(col("day")).distinct()
    val contrib = dayUser
      .select(explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
        .as("target_day"), col("u"))
    contrib
      .join(broadcast(obsDays.withColumnRenamed("day", "target_day")), "target_day")
      .distinct()
      .groupBy(col("target_day"))
      .agg(count(lit(1)).as("active_users"))
      .withColumnRenamed("target_day", "day")
  }

  /** Burst detection over per-(key, time-bucket) counts: a bucket is a
    * burst when its event count reaches `factor`× the trailing average of
    * the `trailingBuckets` PRECEDING buckets (bucket-value RANGE frame, so
    * silent gaps genuinely thin the baseline out of the frame instead of
    * shifting it) and at least 3 trailing buckets exist (cold-start
    * guard). The trailing mean is an exact integer sum divided once —
    * deterministic across engines and partitionings. One count shuffle on
    * (key, bucket) + one window pass over the bucket frame (rows = active
    * buckets, not events). */
  def burstScore(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      bucketMs: Long,
      trailingBuckets: Int = 6,
      factor: Double = 3.0
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val counts = ev.select(col(keyCol), expr(s"__ms div $bucketMs").as("bucket"))
      .groupBy(col(keyCol), col("bucket")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rangeBetween(-trailingBuckets, -1)
    counts
      .withColumn("n_trail", count(col("n")).over(w))
      .withColumn("tsum", sum(col("n")).over(w))
      .select(col(keyCol), col("bucket"), col("n"), col("n_trail"),
        round(when(col("n_trail") === 0L, lit(0.0))
          .otherwise(col("tsum").cast("double") / col("n_trail")), 6).as("trail_avg"),
        (col("n_trail") >= 3L &&
          col("n") >= lit(factor) * col("tsum").cast("double") / col("n_trail"))
          .as("is_burst"))
  }

  /** Behavioral diversity: per-user Shannon entropy (nats) of the
    * event-type distribution — 0 for single-action users (bots and
    * scrapers hammer one endpoint; so do broken clients), higher for
    * organic mixed sessions. The per-user analog of Corpus.tokenEntropy,
    * same DECIMAL-canonicalized ln recipe: one (user, type) count shuffle
    * (map-side combinable), one per-user rollup. */
  def userTypeEntropy(
      events: DataFrame,
      userCol: String,
      typeCol: String
  ): DataFrame = {
    val dec = DecimalType(27, 12)
    val counts = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("c"))
    val lc = log(col("c").cast("double")).cast(dec).cast("double")
    counts.groupBy(col(userCol))
      .agg(
        sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum((col("c").cast("double") * lc).cast(dec)).cast("double").as("s"))
      .select(col(userCol), col("n_events"), col("n_types"),
        round(log(col("n_events").cast("double")).cast(dec).cast("double")
          - col("s") / col("n_events"), 6).as("entropy"))
  }

  /** EXACT global quantiles at unbounded scale: interpolated (type-7,
    * `percentile`/`quantile_cont` semantics) quantiles of one value
    * column computed by RANK SELECTION, never by holding the value set —
    * the two-pass answer to "exact p99 over 100 TB". Pass 1 ranks every
    * value with [[graft.ops.Corpus.rangedPrefixSum]] (range-partitioned,
    * no data-sized single-partition exchange); pass 2 broadcasts the
    * 1-row total count, computes each quantile's fractional index
    * h = 1 + q·(n−1), keeps ONLY the ≤2 rows per quantile whose rank is
    * ⌊h⌋ or ⌈h⌉ (a scan-side filter), and interpolates. Ties in the value
    * column get arbitrary consecutive ranks — equal values, so the
    * selected quantile is unaffected. Nothing anywhere retains more than
    * a partition of values, vs `percentile`'s per-group value buffer.
    *
    * Output: (q, n_values, quantile), one row per requested q. */
  def globalQuantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double]
  ): DataFrame =
    globalQuantilesRaw(df, valueCol, qs)
      .select(col("q"), col("n_values"), round(col("quantile"), 6).as("quantile"))

  /** [[globalQuantiles]] without the display rounding — consumers that
    * COMPARE data against the cut (winsorization) need the exact
    * interpolated value, not a 6-decimal rendering of it. */
  private[ops] def globalQuantilesRaw(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs: $qs")
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = Corpus.rangedPrefixSum(vals, Seq(col("__v").asc), lit(1L))
    val n1 = ranked.agg(max(col("__cum")).as("__n"))
    import df.sparkSession.implicits._
    val qFrame = qs.toDF("q")
    ranked.crossJoin(broadcast(n1)).crossJoin(broadcast(qFrame))
      .withColumn("__h", lit(1.0) + col("q") * (col("__n") - 1).cast("double"))
      .filter(col("__cum") === floor(col("__h")).cast("long") ||
        col("__cum") === ceil(col("__h")).cast("long"))
      .groupBy(col("q"))
      .agg(max(col("__n")).as("n_values"),
        min(when(col("__cum") === floor(col("__h")).cast("long"), col("__v"))).as("__lo"),
        max(when(col("__cum") === ceil(col("__h")).cast("long"), col("__v"))).as("__hi"),
        max(col("__h") - floor(col("__h"))).as("__frac"))
      .select(col("q"), col("n_values"),
        (col("__lo") + col("__frac") * (coalesce(col("__hi"), col("__lo")) - col("__lo")))
          .as("quantile"))
  }

  /** EXACT per-key quantiles WITHOUT per-key value buffers: the grouped
    * complement to [[globalQuantiles]]. `percentile(...)` (and
    * `quantileProfile(exact = true)`) materializes each key's full value
    * set inside one aggregation buffer — fine to ~10^6 values per key, an
    * executor OOM when one key holds a billion. Here each value gets its
    * within-key rank AND its key's total count from ONE key-partitioned
    * window (parallel across keys, never a single partition, no join),
    * and a scan-side filter keeps only the ≤2 rows bracketing each
    * quantile's fractional index before type-7 interpolation — memory per
    * key is O(1) regardless of key cardinality. Skewed keys are the
    * window sort's problem, not a buffer's (spillable).
    *
    * Output: (key, q, n_values, quantile) — one row per key × q. */
  def groupedQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs: $qs")
    import df.sparkSession.implicits._
    val vals = df.select(col(keyCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = vals
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    val qFrame = qs.toDF("q")
    ranked.crossJoin(broadcast(qFrame))
      .withColumn("__h", lit(1.0) + col("q") * (col("__n") - 1).cast("double"))
      .filter(col("__r") === floor(col("__h")).cast("long") ||
        col("__r") === ceil(col("__h")).cast("long"))
      .groupBy(col(keyCol), col("q"))
      .agg(max(col("__n")).as("n_values"),
        min(when(col("__r") === floor(col("__h")).cast("long"), col("__v"))).as("__lo"),
        max(when(col("__r") === ceil(col("__h")).cast("long"), col("__v"))).as("__hi"),
        max(col("__h") - floor(col("__h"))).as("__frac"))
      .select(col(keyCol), col("q"), col("n_values"),
        round(col("__lo") + col("__frac") * (coalesce(col("__hi"), col("__lo")) - col("__lo")),
          6).as("quantile"))
  }

  /** DDSketch-style RELATIVE-ERROR quantiles (Masson et al., VLDB 2019):
    * positive values map to logarithmic buckets i = ⌈ln(v)/ln(γ)⌉ with
    * γ = (1+α)/(1−α), so the bucket midpoint 2γ^i/(γ+1) is within
    * relative error α of every value it holds — the sketch every
    * latency/size monitoring pipeline ships because ERROR SCALES WITH
    * THE VALUE (a 1% p99 of 10 s is 100 ms; a rank sketch's absolute
    * error is useless across 6 orders of magnitude).
    *
    * Scale shape — this is the constant-state quantile path: one
    * map-side-combinable groupBy on (key, bucket) whose distinct-key
    * count is bounded by log_γ(range) (~hundreds at α = 2%), one
    * per-key fold over the SORTED bucket array to locate each rank —
    * never a per-key value sort, never a value buffer. ln quotients are
    * canonicalized to 12 dp against a 17-digit ln(γ) literal so both
    * engines bucket identically; estimates round to 6 dp.
    * Non-positive values are counted out (`n_nonpos`), as in the
    * sketch's real deployments (they get the exact zero/negative side
    * store). */
  def ddsketchQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      alpha: Double,
      qs: Seq[Double]
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs: $qs")
    val gamma = (1 + alpha) / (1 - alpha)
    val lnGamma = math.log(gamma)
    val bucket = ceil(round(log(col(valueCol).cast("double")) / lit(lnGamma), 12))
      .cast("int")
    val pos = df.filter(col(valueCol).isNotNull)
    val hist = pos.filter(col(valueCol) > 0)
      .groupBy(col(keyCol), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))
    val nonpos = pos.groupBy(col(keyCol))
      .agg(sum(when(col(valueCol) <= 0, 1L).otherwise(0L)).as("n_nonpos"))
    ddsketchQuantilesFromHistogram(hist, keyCol, "__b", "__c", alpha, qs)
      .join(nonpos, Seq(keyCol), "left")
      .select(Seq(col(keyCol), col("n_values"),
        coalesce(col("n_nonpos"), lit(0L)).as("n_nonpos")) ++
        qs.map(q => col(s"p${(q * 100).round}")): _*)
  }

  /** The DDSketch rank walk over an ALREADY-BUILT (key, bucket, count)
    * histogram — the readout for sketches maintained incrementally
    * (e.g. [[graft.streaming.StreamingOps.ddsketchSink]]'s table):
    * DDSketch buckets merge by pure addition, so a histogram summed
    * across batches answers exactly the batch sketch's quantiles. */
  def ddsketchQuantilesFromHistogram(
      hist: DataFrame,
      keyCol: String,
      bucketCol: String,
      countCol: String,
      alpha: Double,
      qs: Seq[Double]
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs: $qs")
    val gamma = (1 + alpha) / (1 - alpha)
    val lnGamma = math.log(gamma)
    val perKey = hist
      .select(col(keyCol), col(bucketCol).cast("int").as("__b"),
        col(countCol).cast("long").as("__c"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__b"), col("__c")))).as("__h"),
        sum(col("__c")).as("n_values"))
    val qCols = qs.map { q =>
      val rank = (floor(lit(q) * (col("n_values") - 1).cast("double")) + 1)
        .cast("long")
      // fold the sorted buckets: carry (cumulative, found bucket); the
      // first bucket whose running count reaches the rank wins
      val found = aggregate(col("__h"),
        struct(lit(0L).as("cum"), lit(Int.MinValue).as("b")),
        (acc, x) => {
          val cum = acc.getField("cum") + x.getField("__c")
          struct(cum.as("cum"),
            when(acc.getField("b") =!= Int.MinValue, acc.getField("b"))
              .when(cum >= rank, x.getField("__b"))
              .otherwise(Int.MinValue).as("b"))
        }).getField("b")
      round(lit(2.0) * exp(found.cast("double") * lit(lnGamma)) /
        lit(gamma + 1.0), 6).as(s"p${(q * 100).round}")
    }
    perKey.select(Seq(col(keyCol), col("n_values")) ++ qCols: _*)
  }

  /** Exponential time-decay popularity — the standard recency weighting
    * behind "what matters NOW" rankings and recency-biased sampling
    * weights: each event contributes 0.5^(age/halfLife) anchored at the
    * corpus max timestamp (a 1-row broadcast aggregate, not a collect).
    * Weights are rounded to 12 dp BEFORE the sum (libm pow agreement
    * across engines at sub-ULP scale) and summed through DECIMAL(27,12)
    * so partial-aggregation order cannot change bits. One scan, one
    * shuffle on the type key — no windows, no self-joins. */
  def decayedPopularity(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      halfLifeDays: Double
  ): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive: $halfLifeDays")
    val dec = DecimalType(27, 12)
    val anchor = events.agg(max(unix_micros(col(tsCol))).as("__anchor"))
    events.crossJoin(broadcast(anchor))
      .withColumn("__w",
        round(pow(lit(0.5),
          (col("__anchor") - unix_micros(col(tsCol))).cast("double") /
            (86400.0e6 * halfLifeDays)), 12).cast(dec))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__w")).cast("double"), 6).as("decayed_score"))
  }

  /** Equi-depth (quantile) binning — the feature-engineering complement
    * to the equi-width [[histogram]]: bin edges are the EXACT type-7
    * quartiles from [[globalQuantiles]]' rank selection (no value
    * buffers, no single-partition sort), pivoted to one row and
    * broadcast; each value's bin is the count of edges strictly below
    * it. Both engines bin against the same 6-dp-rounded edges, so
    * boundary ties cannot diverge. Per-bin means go through
    * DECIMAL(27,12). */
  def equiDepthBins(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75)
  ): DataFrame = {
    require(qs.nonEmpty, "need at least one cut quantile")
    val dec = DecimalType(27, 12)
    val cuts = globalQuantiles(df, valueCol, qs)
    val wide = cuts.agg(
      max(when(col("q") === qs.head, col("quantile"))).as("__c0"),
      qs.tail.zipWithIndex.map { case (q, i) =>
        max(when(col("q") === q, col("quantile"))).as(s"__c${i + 1}")
      }: _*)
    val binExpr = qs.indices
      .map(i => when(col(valueCol) > col(s"__c$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(wide))
      .withColumn("bin", binExpr)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 6).as("lo"),
        round(max(col(valueCol)), 6).as("hi"),
        round((sum(col(valueCol).cast(dec)) / count(lit(1))).cast("double"), 6)
          .as("mean"))
  }

  /** Holt linear-trend forecast over each key's DAILY count series — the
    * classic double-exponential smoothing (level + trend) behind
    * short-horizon volume forecasts and drift alarms:
    * {{{
    *   l_1 = y_1,  b_1 = y_2 - y_1
    *   l_t = α·y_t + (1-α)(l_{t-1} + b_{t-1})
    *   b_t = β(l_t - l_{t-1}) + (1-β)·b_{t-1}
    *   ŷ_{T+h} = l_T + h·b_T
    * }}}
    * The per-key series is bounded by the DAY count (30 here, never the
    * event count), so it folds inside ONE Catalyst `aggregate` HOF over
    * the sorted daily array — sequential IEEE double arithmetic, bit
    * reproducible across engines, no window recursion, no driver loop.
    * Scale shape: the only shuffle is the daily-count group-by; a key's
    * state is two doubles. */
  def holtForecast(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      alpha: Double,
      beta: Double,
      horizonDays: Int
  ): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1, "need 0 < alpha, beta < 1")
    val daily = events.groupBy(col(typeCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("double").as("__y"))
    val a = lit(alpha); val b = lit(beta)
    daily.groupBy(col(typeCol))
      .agg(array_sort(collect_list(struct(col("__day"), col("__y")))).as("__s"))
      .filter(size(col("__s")) >= 2)
      .withColumn("__ys", transform(col("__s"), _.getField("__y")))
      .withColumn("__fit",
        aggregate(
          expr("slice(__ys, 2, size(__ys) - 1)"),
          struct(element_at(col("__ys"), 1).as("l"),
            (element_at(col("__ys"), 2) - element_at(col("__ys"), 1)).as("b")),
          (acc, y) => {
            val l2 = a * y + (lit(1.0) - a) * (acc.getField("l") + acc.getField("b"))
            struct(l2.as("l"),
              (b * (l2 - acc.getField("l")) +
                (lit(1.0) - b) * acc.getField("b")).as("b"))
          }))
      .select(col(typeCol), size(col("__ys")).cast("long").as("n_days"),
        round(col("__fit.l"), 6).as("level"),
        round(col("__fit.b"), 6).as("trend"),
        round(col("__fit.l") + lit(horizonDays.toDouble) * col("__fit.b"), 6)
          .as("forecast"))
  }

  /** EWMA control chart over each key's daily count series — the
    * classic statistical-process-control monitor for a pipeline's volume
    * (small sustained shifts that per-day z-scores miss accumulate in
    * the smoothed statistic):
    * {{{
    *   z_1 = y_1;   z_t = λ·y_t + (1-λ)·z_{t-1}
    *   flag day t when |y_t - z_{t-1}| > L·σ·sqrt(λ/(2-λ))
    * }}}
    * σ is the sample std of the daily series, computed from the SAME
    * sorted array the chart folds over (sequential IEEE arithmetic —
    * bit-reproducible across engines, like [[holtForecast]]). Per-key
    * state: one double and a counter; the only shuffle is the daily
    * group-by. */
  def ewmaChart(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      lambda: Double,
      limitL: Double
  ): DataFrame = {
    require(lambda > 0 && lambda < 1, s"need 0 < lambda < 1: $lambda")
    val daily = events.groupBy(col(typeCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("double").as("__y"))
    val lam = lit(lambda)
    val series = daily.groupBy(col(typeCol))
      .agg(array_sort(collect_list(struct(col("__day"), col("__y")))).as("__s"))
      .filter(size(col("__s")) >= 2)
      .withColumn("__ys", transform(col("__s"), _.getField("__y")))
      .withColumn("__n", size(col("__ys")).cast("double"))
      .withColumn("__sum",
        aggregate(col("__ys"), lit(0.0), (a, y) => a + y))
      .withColumn("__sumsq",
        aggregate(col("__ys"), lit(0.0), (a, y) => a + y * y))
      .withColumn("__mu", col("__sum") / col("__n"))
      .withColumn("__sigma",
        sqrt((col("__sumsq") - col("__n") * col("__mu") * col("__mu")) /
          (col("__n") - 1.0)))
      .withColumn("__limit",
        lit(limitL) * col("__sigma") * sqrt(lam / (lit(2.0) - lam)))
    series
      .withColumn("__chart",
        aggregate(
          expr("slice(__ys, 2, size(__ys) - 1)"),
          struct(element_at(col("__ys"), 1).as("z"), lit(0L).as("flags")),
          (acc, y) => struct(
            (lam * y + (lit(1.0) - lam) * acc.getField("z")).as("z"),
            (acc.getField("flags") +
              when(abs(y - acc.getField("z")) > col("__limit"), 1L)
                .otherwise(0L)).as("flags"))))
      .select(col(typeCol), col("__n").cast("long").as("n_days"),
        round(col("__sigma"), 6).as("sigma"),
        round(col("__limit"), 6).as("ctrl_limit"),
        round(col("__chart.z"), 6).as("ewma"),
        col("__chart.flags").as("n_flagged"))
  }

  /** Two-sided CUSUM change-point detector over each key's daily count
    * series — the standard complement to the [[ewmaChart]] drift
    * monitor: cumulative sums accumulate sustained shifts from the
    * series mean that per-day tests never see:
    * {{{
    *   S⁺_t = max(0, S⁺_{t-1} + y_t - μ - k),  S⁻_t = max(0, S⁻_{t-1} + μ - y_t - k)
    *   alarm when S⁺ > h or S⁻ > h   (k = 0.5σ slack, h = 4σ threshold)
    * }}}
    * μ and σ come from the same sorted array the recursion folds over
    * (sequential IEEE arithmetic — bit-reproducible, the
    * [[holtForecast]] shape). Per-key state: two doubles + a counter. */
  def cusumChart(
      events: DataFrame,
      typeCol: String,
      tsCol: String
  ): DataFrame = {
    val daily = events.groupBy(col(typeCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("double").as("__y"))
    val series = daily.groupBy(col(typeCol))
      .agg(array_sort(collect_list(struct(col("__day"), col("__y")))).as("__s"))
      .filter(size(col("__s")) >= 2)
      .withColumn("__ys", transform(col("__s"), _.getField("__y")))
      .withColumn("__n", size(col("__ys")).cast("double"))
      .withColumn("__sum", aggregate(col("__ys"), lit(0.0), (a, y) => a + y))
      .withColumn("__sumsq", aggregate(col("__ys"), lit(0.0), (a, y) => a + y * y))
      .withColumn("__mu", col("__sum") / col("__n"))
      .withColumn("__sigma",
        sqrt((col("__sumsq") - col("__n") * col("__mu") * col("__mu")) /
          (col("__n") - 1.0)))
      .withColumn("__k", lit(0.5) * col("__sigma"))
      .withColumn("__h", lit(4.0) * col("__sigma"))
    series
      .withColumn("__c",
        aggregate(col("__ys"),
          struct(lit(0.0).as("sp"), lit(0.0).as("sn"), lit(0L).as("alarms")),
          (acc, y) => {
            val sp2 = greatest(lit(0.0),
              acc.getField("sp") + y - col("__mu") - col("__k"))
            val sn2 = greatest(lit(0.0),
              acc.getField("sn") + col("__mu") - y - col("__k"))
            struct(sp2.as("sp"), sn2.as("sn"),
              (acc.getField("alarms") +
                when(sp2 > col("__h") || sn2 > col("__h"), 1L).otherwise(0L))
                .as("alarms"))
          }))
      .select(col(typeCol), col("__n").cast("long").as("n_days"),
        round(col("__mu"), 6).as("mu"),
        round(col("__c.sp"), 6).as("cusum_high"),
        round(col("__c.sn"), 6).as("cusum_low"),
        col("__c.alarms").as("n_alarms"))
  }

  /** Winsorized per-type value profile: values clipped at the EXACT
    * global [pLo, pHi] quantiles — the standard heavy-tail guard before
    * feature scaling/aggregation — with per-type clip counts and the
    * clipped mean. The cuts come from [[globalQuantiles]] (rank-selected,
    * no value buffers) and broadcast back as ONE row; clipping is a
    * scan-side `least/greatest`, and the clipped mean routes through
    * DECIMAL(18,6) so it is shuffle-order-independent and
    * oracle-replicable. Two passes total at any scale. */
  def winsorizedProfile(
      df: DataFrame,
      typeCol: String,
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99
  ): DataFrame = {
    val v = col(valueCol)
    val cuts = globalQuantilesRaw(df, valueCol, Seq(pLo, pHi))
      .agg(min(when(col("q") === pLo, col("quantile"))).as("__lo"),
        max(when(col("q") === pHi, col("quantile"))).as("__hi"))
    val clipped = least(greatest(v, col("__lo")), col("__hi"))
    df.crossJoin(broadcast(cuts))
      .groupBy(col(typeCol))
      .agg(count(v).as("n"),
        sum(when(v < col("__lo"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(v > col("__hi"), 1L).otherwise(0L)).as("n_clipped_high"),
        (sum(clipped.cast(DecimalType(18, 6))).cast("double") / count(v))
          .as("__m"))
      .select(col(typeCol), col("n"), col("n_clipped_low"),
        col("n_clipped_high"), round(col("__m"), 6).as("clipped_mean"))
  }

  /** Concentration profile: the Gini coefficient of per-key event counts
    * — 0 when activity is uniform across keys, →1 when a few keys own
    * everything. The one-number companion to [[skewReport]]'s top-k
    * table: skewReport names the hot keys, Gini says whether the tail
    * matters. Ascending (count, key) ranking makes ties deterministic;
    * every sum is an exact long (rank·count products stay far under 2^63
    * at any realistic key count), so the coefficient is one double
    * division at the end — bit-replicable.
    *
    * Scale note: the rank runs over the PER-KEY count frame (#keys rows,
    * not #events) as a range-partitioned two-pass rank
    * ([[graft.ops.Corpus.rangedPrefixSum]] with a unit value: partition
    * by (count, key) range, rank locally, offset by the prefix of
    * per-partition row counts) — no single-partition window at any key
    * count; the formula is unchanged. */
  def giniConcentration(events: DataFrame, keyCol: String): DataFrame = {
    val counts = events.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    Corpus.rangedPrefixSum(counts, Seq(col("n").asc, col(keyCol).asc), lit(1L))
      .withColumn("i", col("__cum"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
        sum(col("i") * col("n")).as("sin"))
      .select(col("n_keys"), col("total"),
        round((lit(2L) * col("sin") - (col("n_keys") + 1) * col("total"))
          .cast("double") /
          (col("n_keys").cast("double") * col("total")), 6).as("gini"))
  }

  /** Inactivity churn candidates: users whose LAST event is at least
    * `thresholdMs` before the corpus's last observed event — the lapsed-
    * user feed behind win-back campaigns and retention dashboards
    * (anchored to observed data, not wall-clock, so replays are
    * deterministic). One map-side-combinable per-user aggregate; the
    * corpus max is a 1-row aggregate OVER that frame (not a second event
    * scan) broadcast back; the threshold is a scan-side filter. */
  def inactivityChurn(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      thresholdMs: Long
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val perUser = ev.groupBy(col(userCol))
      .agg(max(col("__ms")).as("last_ms"), count(lit(1)).as("n_events"))
    val mx = perUser.agg(max(col("last_ms")).as("corpus_max_ms"))
    perUser.crossJoin(broadcast(mx))
      .filter(col("corpus_max_ms") - col("last_ms") >= thresholdMs)
      .select(col(userCol), col("last_ms"), col("n_events"),
        (col("corpus_max_ms") - col("last_ms")).as("silent_ms"))
  }

  /** Seasonal anomaly gate: flags (type, day, hour) count buckets that
    * deviate ≥ `zThreshold` sample standard deviations from that type's
    * SAME-HOUR-OF-DAY baseline — the diurnal-profile complement to
    * [[burstScore]] (which compares against the trailing window and so
    * flags every rush hour; this learns the rush hour and flags deviations
    * FROM it). Baseline moments are exact integer sums of counts (s1, s2),
    * so mean/variance/z are deterministic double arithmetic over exact
    * inputs — order-independent and bit-replicable by the oracle.
    *
    * Scale shape: one (type, day, hour) count shuffle (map-side
    * combinable), then the baseline aggregate collapses to #types × 24
    * rows — broadcast back to the bucket frame; variance uses the
    * n·Σx²−(Σx)² identity so no second pass over the buckets. Baselines
    * cover OBSERVED buckets only (a type silent for a whole (day, hour)
    * contributes no zero row — compose with gapFill first to change that;
    * documented, not hidden). */
  def seasonalAnomaly(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      zThreshold: Double = 2.0
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val counts = ev.select(col(typeCol),
        expr("__ms div 86400000").as("day"),
        expr("(__ms div 3600000) % 24").as("hour"))
      .groupBy(col(typeCol), col("day"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val base = counts.groupBy(col(typeCol), col("hour"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast("double") / col("n_days")
    val varE = (col("n_days") * col("s2") - col("s1") * col("s1")).cast("double") /
      (col("n_days") * (col("n_days") - 1))
    val z = (col("n") - mean) / sqrt(varE)
    counts.join(broadcast(base), Seq(typeCol, "hour"))
      .filter(col("n_days") >= 2 && varE > 0 && abs(z) >= zThreshold)
      .select(col(typeCol), col("day"), col("hour"), col("n"), col("n_days"),
        round(mean, 6).as("hour_mean"), round(z, 6).as("z"))
  }

  /** Welch two-sample test between the `valueCol` distributions of two
    * event types — the A/B readout (unequal variances, unequal sizes):
    * means, mean lift, t statistic, and Welch–Satterthwaite degrees of
    * freedom. All moments come from ONE conditional-aggregation pass
    * (count / Σv / Σv² per arm, no join, no second scan); value sums are
    * DECIMAL(27,12)-routed so they are partial-aggregation-order
    * independent, and every downstream quantity is deterministic double
    * arithmetic over those exact sums — the oracle reproduces t and df bit
    * for bit. Squares are taken in double before the DECIMAL route (a
    * DECIMAL(27,12)² would overflow width 38 — the zipfFit recipe). */
  def abTestLift(
      events: DataFrame,
      typeCol: String,
      valueCol: String,
      typeA: String,
      typeB: String
  ): DataFrame = {
    val dec = DecimalType(27, 12)
    def armAgg(t: String, suffix: String) = Seq(
      count(when(col(typeCol) === t, 1)).as(s"n_$suffix"),
      sum(when(col(typeCol) === t, col(valueCol).cast(dec))).as(s"s1_$suffix"),
      sum(when(col(typeCol) === t,
        (col(valueCol) * col(valueCol)).cast(dec))).as(s"s2_$suffix"))
    val aggs = armAgg(typeA, "a") ++ armAgg(typeB, "b")
    val m = events.filter(col(typeCol).isin(typeA, typeB))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ma", col("s1_a").cast("double") / col("n_a"))
      .withColumn("mb", col("s1_b").cast("double") / col("n_b"))
      .withColumn("va",
        (col("s2_a").cast("double") - col("n_a") * col("ma") * col("ma")) /
          (col("n_a") - 1))
      .withColumn("vb",
        (col("s2_b").cast("double") - col("n_b") * col("mb") * col("mb")) /
          (col("n_b") - 1))
      .withColumn("sa", col("va") / col("n_a"))
      .withColumn("sb", col("vb") / col("n_b"))
    m.select(col("n_a"), col("n_b"),
      round(col("ma"), 6).as("mean_a"), round(col("mb"), 6).as("mean_b"),
      round(col("ma") - col("mb"), 6).as("mean_lift"),
      round((col("ma") - col("mb")) / sqrt(col("sa") + col("sb")), 6).as("t_stat"),
      round(((col("sa") + col("sb")) * (col("sa") + col("sb"))) /
        (col("sa") * col("sa") / (col("n_a") - 1) +
          col("sb") * col("sb") / (col("n_b") - 1)), 6).as("welch_df"))
  }

  /** Skew report: the top-`k` hottest keys with their share of all rows
    * and their multiple of the median key size — the diagnostic read
    * before choosing a salting factor or AQE skew threshold (companion to
    * `Skew.saltedJoin`). One map-side-combinable count, a 1-row stats
    * aggregate broadcast back, and a TakeOrderedAndProject cut — never a
    * global sort. */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("total"),
      percentile(col("n"), lit(0.5)).as("p50"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n"),
        round(col("n") / col("total"), 6).as("share"),
        round(col("n") / col("p50"), 6).as("x_median"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }

  /** First-order Markov transition matrix over event types: for every
    * (from, to) pair of consecutive same-user events, the transition count
    * and row-normalized probability — the sequence model behind
    * next-action prediction and anomaly scoring. Consecutive pairs come
    * from the standard single (user × (ts, id)) window pass; the count is
    * map-side combinable on short string keys; the per-from totals frame
    * is #types-sized and broadcast back, so normalization never reshuffles
    * the pair table. p is a ratio of two longs — deterministic, no float
    * accumulation. */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val counts = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 6).as("p"))
  }

  /** SCD2 change history over an attribute: per user, collapse the event
    * stream to the rows where `attrCol` CHANGES (null-safe: `<=>` against
    * the lag), then stamp each surviving version with
    * [valid_from, valid_to) epoch-millis and a per-user version number —
    * the slowly-changing-dimension type-2 build warehouses run on every
    * mutation feed. `valid_to` is null for the open current version. Two
    * window passes over the SAME (user × (ts, id)) sort — Catalyst reuses
    * the one shuffle+sort for both (no second exchange); tie order inside
    * equal timestamps is pinned on `idCol`. */
  def changeHistory(
      events: DataFrame,
      userCol: String,
      attrCol: String,
      tsCol: String,
      idCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val tsMs    = Ts.millis(events, tsCol)
    val changed = !(col(attrCol) <=> lag(col(attrCol), 1).over(w))
    val versions = events
      .withColumn("valid_from_ms", tsMs)
      .withColumn("chg", changed)
      .filter(col("chg"))
    val wv = Window.partitionBy(col(userCol)).orderBy(col("valid_from_ms"), col(idCol))
    versions
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(wv))
      .withColumn("version_n", row_number().over(wv).cast("long"))
      .select(col(userCol), col(attrCol), col("valid_from_ms"),
        col("valid_to_ms"), col("version_n"))
  }

  /** Per-type daily-volume trend: least-squares slope of daily event
    * counts against the day index — the "is this event type growing or
    * dying" readout. Days re-anchor to each type's first active day, so
    * every regression input is a SMALL exact integer (x ≤ the span in
    * days, y = a count) and all five sufficient statistics are exact
    * integer sums — the slope is one deterministic double division, no
    * DECIMAL canonicalization needed. One (type, day) count shuffle, one
    * window min over the #type×days frame, one per-type rollup.
    * Single-day types report a null slope (zero variance in x). */
  def typeTrend(
      events: DataFrame,
      typeCol: String,
      tsCol: String
  ): DataFrame = {
    val ev = events.withColumn("__ms", Ts.millis(events, tsCol))
    val daily = ev.select(col(typeCol), expr("__ms div 86400000").as("day"))
      .groupBy(col(typeCol), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(typeCol))
    val x = daily.withColumn("x", col("day") - min(col("day")).over(w))
    val a = x.groupBy(col(typeCol)).agg(
      count(lit(1)).as("nd"),
      sum(col("x")).as("sx"),
      sum(col("n")).as("sy"),
      sum(col("x") * col("n")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val den = a("nd") * a("sxx") - a("sx") * a("sx")
    a.select(col(typeCol), col("nd").as("n_days"),
      when(den > 0,
        round((col("nd") * col("sxy") - col("sx") * col("sy")).cast("double") /
          den.cast("double"), 6)).as("slope"),
      round(col("sy").cast("double") / col("nd"), 6).as("mean_daily"))
  }

  /** Inter-arrival cadence regularity: per-user mean/CV of the gaps
    * between consecutive events — scripted clients are metronomic
    * (coefficient of variation near 0), organic humans are bursty
    * (CV ≳ 1); this is the timing-side bot screen next to
    * [[userTypeEntropy]]'s action-mix screen. The gap multiset of a
    * sorted timestamp multiset is tie-permutation invariant, so ordering
    * by the timestamp alone is deterministic. Moments are exact: the gap
    * sum stays a long (it telescopes to the user's time span), squares
    * route through DECIMAL before summation (a year-scale gap squared
    * overflows a long), so mean/CV are single deterministic double
    * chains over exact integers — the oracle reproduces them bit for
    * bit. One window pass + one per-user aggregate, both on the same
    * user-partitioned sort. */
  def interArrivalRegularity(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      minGaps: Int = 5,
      cvBotThreshold: Double = 0.3
  ): DataFrame = {
    val w     = Window.partitionBy(col(userCol)).orderBy(col("__ms"))
    val ev    = events.withColumn("__ms", Ts.millis(events, tsCol))
    val gap   = (col("__ms") - lag(col("__ms"), 1).over(w))
    val gd    = col("gap").cast(DecimalType(19, 0))
    val agg = ev
      .withColumn("gap", gap)
      .filter(col("gap").isNotNull)
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("s1"),
        sum(gd * gd).as("s2"))
    val mean = col("s1").cast("double") / col("n_gaps")
    val varE = (col("n_gaps") * col("s2") -
        col("s1").cast(DecimalType(19, 0)) * col("s1").cast(DecimalType(19, 0)))
      .cast("double") / (col("n_gaps") * col("n_gaps")).cast("double")
    val cv = sqrt(varE) / mean
    agg
      .filter(col("n_gaps") >= minGaps)
      .select(col(userCol), col("n_gaps"),
        round(mean, 6).as("mean_gap_ms"),
        when(col("s1") > 0, round(cv, 6)).as("cv"),
        (col("s1") > 0 && cv < cvBotThreshold).as("is_metronomic"))
  }

  /** Corpus-level session profile: one row of session-shape health
    * numbers over [[sessionize]]'s output — session count, bounce rate
    * (single-event sessions), mean events per session, and exact
    * interpolated p50/p90 session durations. The expensive shuffle is
    * sessionize's own user-partitioned window; the profile itself
    * aggregates the #sessions-sized frame down to one row (counts are
    * exact longs, so mean is one deterministic double division). The
    * exact percentile holds session durations — a #sessions-sized set,
    * orders of magnitude below the event count; swap in
    * `percentile_approx` at the call site if even that is too much
    * state (the [[valueProfile]] `exact = false` pattern). */
  def sessionProfile(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapMs: Long
  ): DataFrame = {
    val sessions = sessionize(events, userCol, tsCol, gapMs)
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
    sessions.agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n_events")).as("total_events"),
        percentile(col("duration_ms"), lit(0.5)).as("p50"),
        percentile(col("duration_ms"), lit(0.9)).as("p90"))
      .select(col("n_sessions"), col("n_bounce"),
        round(col("n_bounce").cast("double") / col("n_sessions"), 6).as("bounce_rate"),
        round(col("total_events").cast("double") / col("n_sessions"), 6)
          .as("mean_events"),
        round(col("p50"), 6).as("p50_duration_ms"),
        round(col("p90"), 6).as("p90_duration_ms"))
  }

  /** Lag-1 autocorrelation of daily event counts per type — "is today's
    * volume predictive of tomorrow's": Pearson r over (day d, day d+1)
    * count pairs where both days have activity (silent days leave the
    * frame, same convention as [[burstScore]]'s gap-aware baseline).
    *
    * Shape: one (type, day) count shuffle (map-side combinable), a
    * self-equi-join on (type, day+1) over the tiny daily frame, one
    * per-type rollup. The five sufficient statistics are EXACT integer
    * sums; the final r is deterministic double arithmetic from them
    * (identical longs → identical IEEE ops on any engine; exact up to
    * 2^53 — far beyond any real daily-count product). Types with zero
    * variance on either side report a null r rather than ±Inf/NaN. */
  def dailyAutocorr(
      events: DataFrame,
      typeCol: String,
      tsCol: String
  ): DataFrame = {
    val daily = Ts.normalize(events, tsCol)
      .groupBy(col(typeCol).as("t"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("c"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.t") === col("b.t") && col("b.d") === date_add(col("a.d"), 1))
      .select(col("a.t").as("t"), col("a.c").as("x"), col("b.c").as("y"))
    val stats = pairs.groupBy(col("t"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val den = sqrt((n * d("sxx") - d("sx") * d("sx")) *
      (n * d("syy") - d("sy") * d("sy")))
    stats.select(col("t").as(typeCol), col("n").as("n_pairs"),
      when(den === 0.0, lit(null)).otherwise(round(num / den, 6))
        .as("autocorr"))
  }

  /** Longest strictly-increasing value streak per user — the classic
    * gaps-and-islands analytic: flag each event that beats its
    * predecessor (ts order, id tiebreak), convert consecutive flags into
    * island ids with the double-row_number difference trick, then take
    * the longest island. Trend/engagement features ("how long do users
    * keep escalating") that a plain lag-delta can't express.
    *
    * Shape: one shuffle on the user key; all three windows share the
    * same (user × ts) ordering so they reuse ONE sort; island sizes are
    * bounded by per-user event counts (the sessionize skew note applies).
    * Ties (equal consecutive values) break streaks — strictly greater
    * only, pinned by the spec. */
  def valueStreaks(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      idCol: String
  ): DataFrame = {
    val byTs = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val flagged = events
      .withColumn("inc",
        when(col(valueCol) > lag(col(valueCol), 1).over(byTs), 1).otherwise(0))
      .withColumn("rn", row_number().over(byTs))
    // island id: rn minus the running count of increasing rows is constant
    // within each maximal run of inc=1 rows (and unique per run)
    val islands = flagged
      .withColumn("inc_rn",
        sum(col("inc")).over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("island", col("rn") - col("inc_rn"))
    islands
      .filter(col("inc") === 1)
      .groupBy(col(userCol), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col(userCol))
      // +1: a run of k increasing STEPS spans k+1 events
      .agg((max(col("run")) + 1).as("longest_streak"),
        sum(col("run")).as("n_increases"))
  }

  /** Bradley–Terry preference ranking via Hunter's MM iteration — the
    * aggregation step of RLHF preference-data curation: given pairwise
    * comparisons (a, b, aWins), estimate per-item strengths π with the
    * fixed-point update π_i ← W_i / Σ_{j≠i} n_ij/(π_i+π_j) for a FIXED
    * `iterations` budget, then normalize to a distribution.
    *
    * Scale shape: the raw pair stream aggregates ONCE to the per-pair
    * count matrix (one shuffle on (i,j) with map-side combine; the
    * matrix is O(items²) ≪ comparisons) — every iteration thereafter
    * touches only that matrix. Each round references the previous score
    * vector EXACTLY ONCE (the matrix is self-loop-augmented so π_i
    * re-enters a round through a window max over the i-partition rather
    * than a second join — the naive two-join round doubles the lazy plan
    * tree per iteration). Per-item denominators route through
    * DECIMAL(27,12) so the j-sum is independent of partial-aggregation
    * order. The count matrix is localCheckpoint-ed ONCE (the pageRank
    * precedent): it feeds every round and Spark does not dedup common
    * subplans — each round then re-reads the checkpointed blocks, not
    * the raw pair stream. */
  def bradleyTerry(
      pairs: DataFrame,
      itemACol: String,
      itemBCol: String,
      aWinsCol: String,
      iterations: Int = 8
  ): DataFrame =
    bradleyTerryFromCounts(
      directedComparisons(pairs, itemACol, itemBCol, aWinsCol)
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"), sum(col("wi")).as("w")),
      iterations)

  /** Both directions of a comparison stream — (i, j, wi) rows where
    * `wi` is 1 iff `i` won that game. The shape [[bradleyTerry]]
    * aggregates and [[graft.streaming.StreamingOps.prefMaintainSink]]
    * maintains incrementally. Works on batch AND streaming frames
    * (projection + self-union only). */
  def directedComparisons(
      pairs: DataFrame,
      itemACol: String,
      itemBCol: String,
      aWinsCol: String
  ): DataFrame =
    pairs.select(col(itemACol).as("i"), col(itemBCol).as("j"),
        col(aWinsCol).cast("long").as("wi"))
      .unionByName(pairs.select(col(itemBCol).as("i"), col(itemACol).as("j"),
        (lit(1L) - col(aWinsCol).cast("long")).as("wi")))

  /** [[bradleyTerry]]'s MM solve over a PRECOMPUTED symmetric count
    * matrix (i, j, n, w) — the entry point for maintained matrices (e.g.
    * a streaming sink's partial-count log re-aggregated at read time):
    * integer count addition is associative, so solving the maintained
    * matrix equals solving the raw pair stream exactly. */
  def bradleyTerryFromCounts(
      counts: DataFrame,
      iterations: Int = 8
  ): DataFrame = {
    val dec = DecimalType(27, 12)
    val g = counts.select(col("i"), col("j"), col("n"), col("w"))
      .localCheckpoint()
    val wins = g.groupBy(col("i")).agg(sum(col("w")).as("wins"))
    val items = g.select(col("i")).distinct()
    // self-loop rows (n = 0) carry π_i into each round's i-partition
    val gAug = g.select(col("i"), col("j"), col("n"))
      .unionByName(items.select(col("i"), col("i").as("j"), lit(0L).as("n")))
    val byI = Window.partitionBy("i")
    var pi = items.select(col("i").as("item"), lit(1.0).as("pi"))
    // π and the win totals are O(items) — the DIMENSION side of every
    // round's joins (the count matrix gAug is the O(items²) fact side).
    // Broadcasting them keeps each round at ONE exchange (the i-window,
    // whose partitioning the groupBy(i) then reuses) instead of shuffling
    // gAug by j and den/wins by i every round — at any matrix size the
    // fact side never moves (the maintainEnriched broadcast-the-dimension
    // decision; same values, the j-lookup is a hash probe instead of a
    // merge). Items beyond broadcast reach would shard the solve itself
    // long before this join shape is the binding constraint.
    for (_ <- 1 to iterations) {
      val t = gAug.join(
          broadcast(pi.select(col("item").as("j"), col("pi").as("pj"))), "j")
        .withColumn("pii", max(when(col("j") === col("i"), col("pj"))).over(byI))
      val den = t.filter(col("j") =!= col("i"))
        .groupBy(col("i"))
        .agg(sum((col("n") / (col("pii") + col("pj"))).cast(dec)).as("den"))
      pi = den.join(broadcast(wins), "i")
        .select(col("i").as("item"),
          (col("wins") / col("den").cast("double")).as("pi"))
    }
    // normalize through an unbounded window (single reference of the
    // final chain) with a DECIMAL-routed total
    val all = Window.partitionBy(lit(1))
    pi.withColumn("tot", sum(col("pi").cast(dec)).over(all))
      .select(col("item"),
        round(col("pi") / col("tot").cast("double"), 6).as("score"),
        row_number().over(Window.orderBy(
          (col("pi") / col("tot").cast("double")).desc, col("item").asc))
          .as("rank"))
  }

  /** Krippendorff's alpha (nominal data) — the inter-rater reliability
    * readout of an annotation-QA pipeline: α = 1 − D_o/D_e over rating
    * units, computed from the per-(unit, category) count grid. Units
    * with fewer than 2 ratings are unpairable and excluded (the standard
    * treatment). All counts stay integral until the final divisions;
    * per-unit disagreement terms route through DECIMAL(27,12) so the
    * unit-sum is aggregation-order-independent. One shuffle on
    * (unit, category) with map-side combine; everything after is a
    * #categories-row reduction. At extreme corpus sizes the D_e products
    * P_c·(N−P_c) are computed in DOUBLE — deterministic, with relative
    * error ~1e-16, which the 6-digit rounding absorbs. */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      catCol: String
  ): DataFrame = {
    val dec = DecimalType(27, 12)
    val cnt = df.groupBy(col(unitCol).as("u"), col(catCol).as("c"))
      .agg(count(lit(1)).as("nuc"))
    val byU = Window.partitionBy("u")
    val pairable = cnt.withColumn("nu", sum(col("nuc")).over(byU))
      .filter(col("nu") >= 2)
    val oterm = (col("nuc") * (col("nu") - col("nuc"))) / (col("nu") - lit(1L))
    val stats = pairable.agg(
      count_distinct(col("u")).as("n_units"),
      sum(col("nuc")).as("nn"),
      sum(oterm.cast(dec)).as("so_d"))
    val pc = pairable.groupBy(col("c")).agg(sum(col("nuc")).as("p_c"))
    val se = pc.crossJoin(broadcast(stats.select(col("nn").as("nn2"))))
      .agg(sum((col("p_c").cast("double") * (col("nn2") - col("p_c")).cast("double"))
        .cast(dec)).as("se_d"))
    stats.crossJoin(broadcast(se))
      .select(col("n_units"), col("nn").as("n_ratings"),
        round(col("so_d").cast("double") / col("nn"), 6).as("d_obs"),
        round(col("se_d").cast("double") / (col("nn") * (col("nn") - lit(1L))), 6)
          .as("d_exp"),
        round(lit(1.0) - (col("nn") - lit(1L)) * col("so_d").cast("double") /
          col("se_d").cast("double"), 6).as("alpha"))
  }

  /** pass@k — the unbiased combinatorial estimator (Codex-paper form)
    * over per-task sample outcomes: for each task with n samples and c
    * passes, pass@k = 1 − C(n−c,k)/C(n,k), evaluated as the fixed-order
    * product Π_{i=0}^{k−1} (n−c−i)/(n−i) so both engines execute the
    * identical IEEE op sequence (no factorials, no overflow at any n).
    * Tasks with n < k report NULL for that k; n−c < k reports 1.0 (a
    * pass inside every size-k draw). One shuffle on the task key with
    * map-side combine; the estimator is a per-row projection after. */
  def passAtK(
      df: DataFrame,
      taskCol: String,
      passCol: String,
      ks: Seq[Int] = Seq(1, 5, 10)
  ): DataFrame = {
    val base = df.groupBy(col(taskCol).as("task_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol), 1L).otherwise(0L)).as("c"))
    val out = ks.foldLeft(base) { (acc, k) =>
      val prod = (1 until k).foldLeft(
        (col("n") - col("c")) / col("n")) { (e, i) =>
        e * ((col("n") - col("c") - lit(i)) / (col("n") - lit(i)))
      }
      acc.withColumn(s"pass$k",
        when(col("n") < k, lit(null).cast("double"))
          .when(col("n") - col("c") < k, lit(1.0))
          .otherwise(round(lit(1.0) - prod, 6)))
    }
    out
  }
}
