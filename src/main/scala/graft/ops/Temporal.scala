package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: as-of join and bounded
  * range (interval) join.
  *
  * Design for 100 TB:
  *  - The as-of join is NOT an inequality join (Spark would plan
  *    `l.ts >= r.ts` as BroadcastNestedLoop — O(n·m) and a driver OOM when
  *    neither side is small). It is the union + running-`last` formulation:
  *    tag both inputs, union them, and take per key the last right-hand
  *    value at-or-before each left row in one window pass. ONE shuffle on
  *    the key, sort within partitions, no join node at all.
  *  - The range join never compares all pairs: rows land in fixed-width
  *    time buckets sized to the match window, the probe side explodes to
  *    its 3 adjacent buckets, and candidates meet in an equi-join on
  *    (key, bucket) — per-bucket occupancy bounds the work, and AQE handles
  *    skewed buckets. |Δt| ≤ window implies the buckets differ by at most
  *    one, so every qualifying pair is found exactly once (the build side
  *    keeps its single home bucket — no distinct needed).
  *  - Both results are deterministic for any partitioning: the as-of pick
  *    carries (ts, value) atomically in one struct ordered by an explicit
  *    total order, and the range counts are plain aggregates.
  */
object Temporal {

  /** For every `left` row, the most recent `right` row with
    * `right.ts <= left.ts` within the same `keyCol` (an as-of / "last known
    * value" join — quotes-to-trades, state-at-event-time lookups).
    *
    * Returns all `left` columns plus `asof_<tsCol>` and `asof_<c>` for each
    * requested right column (null when no right row precedes the left row).
    * Ties on (key, ts) between right rows resolve to the largest carried
    * struct — an explicit total order, so the result does not depend on
    * partitioning or execution order. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val carried = struct(
      col(tsCol).as(tsCol) +: rightCols.map(c => col(c).as(c)): _*)
    val r = right.select(col(keyCol), col(tsCol), carried.as("__asof"))
      .withColumn("__tag", lit(0))
    val l = left.withColumn("__tag", lit(1))
    // Right rows sort before left rows at equal ts (tag 0 < 1), so "at or
    // before" is inclusive; the struct tie-break makes same-ts right rows
    // deterministic. A single `last` over the struct keeps the matched
    // row's (ts, values) atomic — two separate `last` calls could mix rows.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__asof").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(col).toSeq
    val asofCols = (tsCol +: rightCols).map(c =>
      col(s"__match.$c").as(s"asof_$c"))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols ++ asofCols: _*)
  }

  /** [[asofJoin]] with a STALENESS BOUND — pandas `merge_asof(tolerance=)`
    * semantics: a match older than `toleranceMs` is as good as no match,
    * so every carried column nulls out (state snapshots go stale; a
    * quote from last week must not price today's trade). Same
    * union-plus-one-window scale shape — the bound is a post-window
    * row-local gate, zero extra passes; the ts gap goes through the
    * [[Ts]] dtype dispatch so TIMESTAMP/NTZ/DATE/numeric columns all
    * work. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      toleranceMs: Long
  ): DataFrame = {
    val joined = asofJoin(left, right, keyCol, tsCol, rightCols)
    val fresh =
      Ts.millis(joined, tsCol) - Ts.millis(joined, s"asof_$tsCol") <= toleranceMs
    val leftCols = left.columns.map(col).toSeq
    val gated = (tsCol +: rightCols).map(c =>
      when(fresh, col(s"asof_$c")).otherwise(lit(null)).as(s"asof_$c"))
    joined.select(leftCols ++ gated: _*)
  }

  /** FORWARD as-of join: each left row matches the EARLIEST right row of
    * the same key at or AFTER its timestamp — the "next event" direction
    * ([[asofJoin]] mirrored): next error after a click, next fill after an
    * order, next heartbeat after a probe. Same union + one-window shape
    * (no join node, one shuffle): right rows tag AFTER left rows at equal
    * ts (tag 2 > 1), so "at or after" is inclusive, and `first` over the
    * [current, unbounded following) frame with the ascending struct
    * tie-break picks the earliest match deterministically. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val carried = struct(
      col(tsCol).as(tsCol) +: rightCols.map(c => col(c).as(c)): _*)
    val r = right.select(col(keyCol), col(tsCol), carried.as("__asof"))
      .withColumn("__tag", lit(2))
    val l = left.withColumn("__tag", lit(1))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__asof").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftCols = left.columns.map(col).toSeq
    val asofCols = (tsCol +: rightCols).map(c =>
      col(s"__match.$c").as(s"asof_$c"))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", first(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols ++ asofCols: _*)
  }

  /** [[asofJoin]] with a hot-key defense: the window partitions on
    * `(key, floor(ts / chunkMs))` instead of the key alone, so one
    * celebrity key's history splits across time chunks instead of landing
    * in a single task (AQE cannot split window partitions — the chunking
    * must be in the plan). A carry pass threads the last right-hand value
    * across chunk boundaries:
    *   1. per (key, chunk): the max (ts, value) right struct — ONE
    *      map-side-combinable aggregate, output one row per (key, chunk);
    *   2. running max over STRICTLY-previous chunks per key — a window
    *      over the tiny per-chunk frame (rows = chunks, not events);
    *   3. within each (key, chunk): the usual union + running-`last`,
    *      coalesced with the chunk's carry-in.
    * Identical results to [[asofJoin]] for every input (randomized
    * equivalence spec); same total order, so still deterministic under any
    * partitioning. Cost: one extra small shuffle + one tiny window.
    * Pick `chunkMs` so a hot key's densest chunk fits one task; cold keys
    * just see a couple of near-empty chunks. */
  def asofJoinChunked(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      chunkMs: Long
  ): DataFrame = {
    val carried = struct(
      col(tsCol).as(tsCol) +: rightCols.map(c => col(c).as(c)): _*)
    val tsNum = Ts.millis(left, tsCol)
    val chunk = floor(tsNum.cast("double") / chunkMs).cast("long")
    val r = right.select(col(keyCol), col(tsCol), carried.as("__asof"))
      .withColumn("__tag", lit(0))
    val l = left.withColumn("__tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__chunk", chunk)
    // last right struct per (key, chunk) — null where a chunk has no right
    // rows, so the running carry max skips it
    val perChunk = u.groupBy(col(keyCol), col("__chunk"))
      .agg(max(when(col("__tag") === 0,
        struct(col(tsCol).as("__ts"), col("__asof").as("__a")))).as("__m"))
    val wCarry = Window.partitionBy(keyCol).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perChunk
      .withColumn("__c", max(col("__m")).over(wCarry))
      .select(col(keyCol), col("__chunk"), col("__c.__a").as("__carry"))
    val wChunk = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__asof").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(col).toSeq
    val asofCols = (tsCol +: rightCols).map(c =>
      col(s"__match.$c").as(s"asof_$c"))
    u.join(carry, Seq(keyCol, "__chunk"))
      .withColumn("__match",
        coalesce(last(col("__asof"), ignoreNulls = true).over(wChunk), col("__carry")))
      .filter(col("__tag") === 1)
      .select(leftCols ++ asofCols: _*)
  }

  /** For every row, the number of OTHER rows with the same `partCol` whose
    * timestamp lies within ±`windowMs` (bounded interval self-join, e.g.
    * burst detection). `tsCol` must be a timestamp column; comparison is at
    * millisecond granularity. Returns (idCol, n_within) over ALL input rows
    * (0 when nothing is nearby). */
  def rangeSelfCount(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      partCol: String,
      windowMs: Long
  ): DataFrame = {
    val e = df.select(col(partCol).as("__p"), col(idCol).as("__id"),
      Ts.millis(df, tsCol).as("__ms"))
    val bkt = floor(col("__ms") / windowMs).cast("long")
    val build = e.select(col("__p"), col("__id").as("__b_id"),
      col("__ms").as("__b_ms"), bkt.as("__bucket"))
    val probe = e.select(col("__p"), col("__id").as("__a_id"),
      col("__ms").as("__a_ms"),
      explode(array(bkt - 1, bkt, bkt + 1)).as("__bucket"))
    val counts = probe.join(build, Seq("__p", "__bucket"))
      .filter(col("__b_id") =!= col("__a_id") &&
        abs(col("__a_ms") - col("__b_ms")) <= windowMs)
      .groupBy(col("__a_id")).agg(count(lit(1)).as("n_within"))
    e.join(counts, col("__id") === col("__a_id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_within"), lit(0L)).as("n_within"))
  }
}
