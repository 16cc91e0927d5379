package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog cardinality sketches as DATA — per-shard register
  * tables you can store, ship, and union without ever rescanning the shards
  * (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007).
  *
  * Why this exists next to `approx_count_distinct` (which is also HLL++
  * under the hood): the built-in is a query-time aggregate — the sketch
  * lives inside one job and dies with it. A 100 TB corpus pipeline wants
  * the sketch AS A TABLE: each ingest shard commits its (register, rho)
  * rows once, and any later union — across shards, days, or sources — is a
  * `groupBy(register).max(rho)` over a few thousand tiny rows, never a
  * rescan of the shard. That register-wise max IS the sketch of the union
  * (the defining HLL merge property), so distinct-count questions over any
  * shard combination cost O(m) per shard, not O(data).
  *
  * Determinism (the whole point for oracle-checkability):
  *  - the hash is md5 of the key string — identical in every engine;
  *  - `rho` is derived from the BIT LENGTH of the 52-bit hash suffix
  *    (via `bin()`), never floating-point log;
  *  - the harmonic sum Σ 2^(-M_j) is computed as the exact integer
  *    Σ 2^(53 - M_j) (a BIGINT ≤ m·2^53 = 2^61), so it is
  *    order-independent — no float-summation nondeterminism;
  *  - the final estimate is a fixed left-to-right chain of IEEE
  *    multiply/divide on that exact integer, bit-identical across engines.
  *
  * Scale shape: the sketch build is one map-side-combinable
  * `groupBy(shard, idx).max(rho)` — the shuffle carries at most m rows per
  * shard regardless of input size. Merges and estimates read register rows
  * only. No driver state, no collects.
  */
object Sketches {

  /** Register-index bits. m = 2^B = 256 registers; standard error
    * 1.04/√m ≈ 6.5%. The md5 hex layout is fixed: hex[0..1] → register,
    * hex[2..14] (52 bits) → rho suffix. */
  val B = 8
  val M = 1 << B
  /** Suffix width in bits; rho ∈ [1, W+1]. */
  val W = 52

  /** Sparse per-shard register table: one row per (shard, occupied
    * register) with the max rho observed. At most m rows per shard leave
    * the map-side combine, whatever the input row count. */
  def hllRegisters(df: DataFrame, key: Column, shardCol: String): DataFrame = {
    val h = md5(key)
    val idx = conv(substring(h, 1, 2), 16, 10).cast("long").as("idx")
    val sfx = conv(substring(h, 3, 13), 16, 10).cast("long")
    // bin() drops leading zeros, so length(bin(x)) is the exact bit length:
    // rho = leading-zeros-in-W-bits + 1 = W + 1 - bitlength (W+1 for x = 0).
    val rho = when(sfx === 0L, lit(W + 1))
      .otherwise(lit(W + 1) - length(bin(sfx))).cast("int")
    df.select(col(shardCol).as("shard"), idx, rho.as("rho"))
      .groupBy("shard", "idx").agg(max("rho").as("rho"))
  }

  /** Register-wise union: the sketch of the union of every shard in
    * `registers` (HLL merge = per-register max). Returns the same sparse
    * (idx, rho) shape with a single literal shard label. */
  def hllUnion(registers: DataFrame, label: String): DataFrame =
    registers.groupBy("idx").agg(max("rho").as("rho"))
      .select(lit(label).as("shard"), col("idx"), col("rho"))

  /** Cardinality estimate per shard from a sparse register table.
    * Exact-integer harmonic numerator: occupied registers contribute
    * 2^(W+1-rho), the v empty ones 2^(W+1) each; the float estimate is a
    * deterministic multiply/divide chain on that integer. Small-range
    * (linear-counting) correction applies below 2.5m when empty registers
    * remain — flagged in `corrected` so exact-oracle queries can pin the
    * regime they compare in. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val scale = lit(1L << (W + 1))                       // 2^53, exact
    // Scala's functions.shiftleft takes an Int shift; the SQL ShiftLeft
    // expression accepts a column shift amount — the integer shift keeps
    // the numerator exact (no pow-of-two float rounding).
    val num = sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - rho)")) // exact BIGINT
    val perShard = registers.groupBy("shard").agg(
      count(lit(1)).as("used"),
      num.as("num_occ"))
    val v = lit(M) - col("used")
    val numerator = col("num_occ") + v.cast("long") * scale
    // alpha_m · m² · 2^(W+1): one fixed left-to-right double chain
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble)) *
      lit((M.toLong * M.toLong).toDouble) * scale.cast("double")
    val raw = alphaM2 / numerator.cast("double")
    val corrected = raw <= lit(2.5 * M) && v > 0
    val est = when(corrected, lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
      .otherwise(raw)
    perShard.select(
      col("shard"),
      col("used").cast("int").as("registers_used"),
      v.cast("int").as("v_zero"),
      round(est, 4).as("estimate"),
      corrected.as("corrected"))
  }

  /** The full mergeable-sketch report over `df`: per-shard estimates PLUS a
    * union row built purely from the shards' registers (never from the
    * data), each next to its exact distinct count and a 3-sigma accuracy
    * verdict (sigma = 1.04/sqrt(m)). The union row is what you could NOT
    * get by summing per-shard exacts when shards overlap — the naive sum is
    * included per shard row's `nd_exact` for contrast. */
  def hllReport(df: DataFrame, key: Column, shardCol: String,
                unionLabel: String = "__union"): DataFrame = {
    val keyed = df.select(key.as("__k"), col(shardCol).as("shard"))
    val regs = hllRegisters(keyed, col("__k"), "shard").localCheckpoint()
    val all = regs.unionByName(hllUnion(regs, unionLabel))
    val est = hllEstimate(all)
    val exact = keyed.groupBy("shard").agg(countDistinct(col("__k")).as("nd_exact"))
      .unionByName(keyed.agg(countDistinct(col("__k")).as("nd_exact"))
        .select(lit(unionLabel).as("shard"), col("nd_exact")))
    val sigma3 = lit(3.0 * 1.04 / math.sqrt(M.toDouble))
    est.join(exact, "shard")
      .select(col("shard"), col("registers_used"), col("v_zero"),
        col("estimate"), col("corrected"), col("nd_exact"),
        (abs(col("estimate") - col("nd_exact")) / col("nd_exact") <= sigma3)
          .as("within_3sigma"))
  }

  /** APPROXIMATE-DISTINCT incremental view maintenance — what
    * [[graft.sources.ManifestTable.maintainRollup]] structurally CANNOT
    * give: count-distinct does not merge by addition, so an additive
    * rollup can only re-scan. An HLL register table merges by per-register
    * MAX, so each refresh folds ONLY the change feed's registers into the
    * stored table: cost is the new batch plus O(shards·m) register rows,
    * never the source — the 100 TB "distinct users per segment, refreshed
    * per ingest batch" shape. Same contract as maintainRollup: thread the
    * returned source version into the next call, −1 bootstraps, an idle
    * refresh is a commit-free no-op, and a rewrite commit since the last
    * refresh (compaction/overwrite — the change feed refuses it)
    * AUTO-RE-BOOTSTRAPS from the full table, correctness over
    * incrementality. The maintained table is bit-identical to a
    * from-scratch sketch of the source (register max is associative and
    * idempotent), which is what the oracle checks. */
  def maintainDistinctRollup(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      aggDir: String,
      sinceVersion: Long,
      shardCol: String,
      key: Column
  ): Long = {
    val T = graft.sources.ManifestTable
    val curV = T.currentVersion(spark, srcDir)
    if (curV < 0) return sinceVersion
    val (delta, rebootstrap) =
      if (sinceVersion < 0) (T.read(spark, srcDir), true)
      else
        try ((T.readChangesSince(spark, srcDir, sinceVersion), false))
        catch {
          case _: IllegalArgumentException => (T.read(spark, srcDir), true)
        }
    if (!rebootstrap && delta.isEmpty) return curV
    val part = hllRegisters(delta, key, shardCol)
    val merged =
      if (rebootstrap || T.versions(spark, aggDir).isEmpty) part
      else T.read(spark, aggDir).unionByName(part)
        .groupBy("shard", "idx").agg(max("rho").as("rho"))
    T.commit(spark, aggDir, merged)
    curV
  }

  // ---------------------------------------------------------------------
  // KMV (k-minimum-values) sketches — the SET-OPERATIONS complement to
  // HLL: a KMV sketch is the k smallest distinct hash values of a set
  // (Bar-Yossef et al., "Counting distinct elements in a data stream",
  // RANDOM 2002; Beyer et al. SIGMOD 2007 for the unbiased estimator).
  // Union merges by re-taking the k smallest of the combined rows, and —
  // what HLL registers cannot give — INTERSECTION/Jaccard estimates fall
  // out of membership of the merged sketch's hashes in each side's
  // sketch. Same determinism contract as the HLL table: md5 hashes, the
  // estimate a fixed arithmetic chain, every value reproducible by any
  // engine.
  // ---------------------------------------------------------------------

  /** KMV sketch size. Relative error ~ 1/sqrt(k-2) ≈ 13% at k=64. */
  val K = 64

  /** 52-bit md5-derived hash — uniform on [0, 2^52), collision odds
    * negligible at sketch scale, and small enough that every arithmetic
    * step below stays exact in a BIGINT/double. */
  private def h52(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long")

  /** Per-shard KMV sketch table: the K smallest DISTINCT key hashes per
    * shard, ranked. At most K rows per shard leave the plan whatever the
    * input size.
    *
    * Scale shape: the distinct is one map-side-combinable aggregate on
    * (shard, h); the min-K cut is a per-shard rank window over DISTINCT
    * hashes only. At extreme per-shard cardinality, pre-filter map-side
    * with any upper bound on the k-th hash (e.g. from yesterday's
    * sketch) before the distinct — the cut is monotone, so a
    * conservative threshold never changes the result. */
  def kmvSketch(df: DataFrame, key: Column, shardCol: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("h").asc)
    df.select(col(shardCol).as("shard"), h52(key).as("h"))
      .groupBy("shard", "h").agg(count(lit(1)).as("__n")).drop("__n")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** Union-merge: the KMV sketch of the union of every shard in
    * `sketches`, built purely from sketch rows (distinct hashes, re-rank,
    * keep K) — never from the data. */
  def kmvUnion(sketches: DataFrame, label: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("h").asc)
    sketches.select(lit(label).as("shard"), col("h")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** Distinct-count estimates from a KMV sketch table: a SATURATED
    * sketch (K rows) estimates (K-1) · 2^52 / h_K (the unbiased KMV
    * estimator); an unsaturated one holds EVERY distinct hash, so its
    * row count is exact. One K-row-per-shard aggregate. */
  def kmvEstimate(sketches: DataFrame): DataFrame =
    sketches.groupBy("shard")
      .agg(count(lit(1)).as("rows"), max(col("h")).as("hk"))
      .select(col("shard"), col("rows").cast("int").as("sketch_rows"),
        round(when(col("rows") < K, col("rows").cast("double"))
          .otherwise(lit((K - 1).toDouble) * lit(4503599627370496.0) /
            col("hk").cast("double")), 4).as("estimate"),
        (col("rows") < K).as("is_exact"))

  /** The SET-OPERATIONS report for two shards `a` and `b` of `df` — what
    * the HLL registers cannot answer: estimated |A|, |B|, |A∪B| from the
    * merged sketch, Jaccard from the merged sketch's membership in both
    * sides (rho = |merged ∩ A-sketch ∩ B-sketch| / |merged|), and
    * |A∩B| = rho · |A∪B| (Beyer et al.'s KMV set-operation recipe) —
    * all from ≤3K stored rows, never a rescan. Exact counterparts ride
    * along for the accuracy read. */
  def kmvSetOps(df: DataFrame, key: Column, shardCol: String,
                a: String, b: String): DataFrame = {
    val keyed = df.select(key.as("__k"), col(shardCol).as("shard"))
      .filter(col("shard").isin(a, b))
    val sk = kmvSketch(keyed, col("__k"), "shard").localCheckpoint()
    val merged = kmvUnion(sk, "__u")
    val skA = sk.filter(col("shard") === a).select(col("h"))
    val skB = sk.filter(col("shard") === b).select(col("h"))
    // membership of the merged sketch's hashes in both sides' sketches
    val rhoRow = merged.select(col("h"))
      .join(skA, Seq("h"), "left_semi").join(skB, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val mStats = merged.agg(count(lit(1)).as("m_rows"), max(col("h")).as("m_hk"))
    val estOf = (rows: Column, hk: Column) =>
      when(rows < K, rows.cast("double"))
        .otherwise(lit((K - 1).toDouble) * lit(4503599627370496.0) /
          hk.cast("double"))
    val perShard = sk.groupBy("shard")
      .agg(count(lit(1)).as("rows"), max(col("h")).as("hk"))
    val estA = perShard.filter(col("shard") === a)
      .select(estOf(col("rows"), col("hk")).as("est_a"))
    val estB = perShard.filter(col("shard") === b)
      .select(estOf(col("rows"), col("hk")).as("est_b"))
    // one key shuffle for all three exact counts (r14, guide §2.3): the
    // countDistinct triple planned as an Expand ×3 — three times the
    // shuffle bytes of one distinct-key aggregate with membership flags
    val exact = keyed.filter(col("__k").isNotNull)
      .groupBy(col("__k"))
      .agg(max(when(col("shard") === a, 1).otherwise(0)).as("__ina"),
        max(when(col("shard") === b, 1).otherwise(0)).as("__inb"))
      .agg(sum(col("__ina")).cast("long").as("nd_a"),
        sum(col("__inb")).cast("long").as("nd_b"),
        count(lit(1)).as("nd_union"))
    val unionEst = mStats.select(estOf(col("m_rows"), col("m_hk")).as("est_union"),
      col("m_rows"))
    estA.crossJoin(estB).crossJoin(unionEst).crossJoin(rhoRow).crossJoin(exact)
      .select(
        lit(a).as("shard_a"), lit(b).as("shard_b"),
        round(col("est_a"), 4).as("est_a"),
        round(col("est_b"), 4).as("est_b"),
        round(col("est_union"), 4).as("est_union"),
        round(col("n_both") / col("m_rows"), 6).as("jaccard_est"),
        round(col("n_both") / col("m_rows") * col("est_union"), 4)
          .as("est_intersection"),
        col("nd_a"), col("nd_b"), col("nd_union"),
        (col("nd_a") + col("nd_b") - col("nd_union")).as("nd_intersection"))
  }

  // ---------------------------------------------------------------------
  // Count-min sketches — the FREQUENCY complement: per-shard (row, col,
  // count) tables of depth×width counters (Cormode & Muthukrishnan,
  // "An improved data stream summary: the count-min sketch", J.Alg 2005).
  // Merge is pure per-cell ADDITION (like the DDSketch histogram table),
  // and a point estimate is the min over depth rows — always an
  // OVERCOUNT, within N·e/width with probability 1 − e^-depth. Row
  // hashes are md5 with a per-row salt, so every engine derives the
  // identical table.
  // ---------------------------------------------------------------------

  /** Count-min depth (independent hash rows) and width (counters/row). */
  val CmsD = 4
  val CmsW = 256

  /** Per-shard count-min table: one row per occupied (shard, row, col)
    * cell. Map-side combinable; at most depth·width rows per shard leave
    * the shuffle whatever the input size. */
  def cmsSketch(df: DataFrame, key: Column, shardCol: String): DataFrame = {
    val rows = (0 until CmsD).map { r =>
      struct(lit(r).as("row"),
        (conv(substring(md5(concat(lit(s"cms$r|"), key)), 1, 13), 16, 10)
          .cast("long") % CmsW).cast("int").as("col"))
    }
    df.select(col(shardCol).as("shard"), explode(array(rows: _*)).as("rc"))
      .groupBy(col("shard"), col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min tables by per-cell addition — the whole point: any
    * shard combination's frequency table is a groupBy-sum over tiny
    * rows, never a rescan. */
  def cmsMerge(sketches: DataFrame, label: String): DataFrame =
    sketches.groupBy("row", "col").agg(sum(col("cnt")).as("cnt"))
      .select(lit(label).as("shard"), col("row"), col("col"), col("cnt"))

  /** Point-frequency estimates for `probes` (one column named `probe`)
    * against one sketch's cells: min over the depth rows, next to
    * nothing the sketch didn't store. Estimates are structural
    * OVERCOUNTS (never under), the property downstream thresholds rely
    * on. The probe side is a broadcast of #probes·depth cells against
    * the ≤depth·width-row sketch. */
  def cmsPointEstimate(sketch: DataFrame, probes: DataFrame): DataFrame = {
    val cells = (0 until CmsD).map { r =>
      struct(lit(r).as("row"),
        (conv(substring(md5(concat(lit(s"cms$r|"), col("probe"))), 1, 13), 16, 10)
          .cast("long") % CmsW).cast("int").as("col"))
    }
    probes.select(col("probe"), explode(array(cells: _*)).as("rc"))
      .select(col("probe"), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(sketch, Seq("row", "col"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ---------------------------------------------------------------------
  // Mergeable TOP-K (heavy hitters) summaries — the frequency-RANKING
  // complement of the count-min table (which answers point queries but
  // cannot enumerate the heavy keys). Per shard: the exact top-m keys by
  // count plus the shard's truncation threshold (the (m+1)-th count — an
  // upper bound on every key the shard dropped). Merging summaries gives
  // every key DETERMINISTIC bounds: lo = Σ counts where present,
  // hi = lo + Σ thresholds of the shards that dropped it (Agarwal et al.,
  // "Mergeable summaries", PODS 2012 — the Misra-Gries merge bound; the
  // TPUT/threshold-algorithm candidate guarantee: any key with true count
  // > Σ thresholds is certainly present in some summary). Everything is
  // integer arithmetic with (count desc, key asc) tie-breaks, so an
  // independent engine reproduces every bound and verdict bit-for-bit.
  // ---------------------------------------------------------------------

  /** Per-shard top-`m` summary table: one row per kept (shard, key) with
    * its exact in-shard count and the shard's truncation threshold
    * denormalized in (`thr` = the (m+1)-th count, 0 when nothing was
    * dropped — then absent means count 0 exactly). The per-shard top-m
    * cut runs as a map-side partial group-limit: at most m+1 rows per
    * shard per partition enter the shuffle, whatever the input size. */
  def topkSketch(df: DataFrame, key: Column, shardCol: String, m: Int): DataFrame = {
    val counts = df.select(col(shardCol).as("shard"), key.as("key"))
      .groupBy("shard", "key").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("shard").orderBy(col("cnt").desc, col("key").asc)
    val ranked = counts.withColumn("r", row_number().over(w))
      .filter(col("r") <= m + 1)
    val thr = ranked.filter(col("r") === m + 1)
      .select(col("shard"), col("cnt").as("thr"))
    ranked.filter(col("r") <= m)
      .join(broadcast(thr), Seq("shard"), "left")
      .select(col("shard"), col("key"), col("cnt"),
        coalesce(col("thr"), lit(0L)).as("thr"))
  }

  /** Merge summaries into per-key count BOUNDS: `lo` sums the counts of
    * the shards that kept the key (each exact); `hi` adds every other
    * shard's threshold (the most a dropped key could have held there).
    * true count ∈ [lo, hi] always — the structural guarantee thresholds
    * downstream rely on. One aggregate over summary rows plus a 1-row
    * total-threshold broadcast; never a rescan of any shard. */
  def topkMerge(sketches: DataFrame, label: String): DataFrame = {
    val totalThr = sketches.select(col("shard"), col("thr")).distinct()
      .agg(coalesce(sum(col("thr")), lit(0L)).as("total_thr"))
    sketches.groupBy(col("key"))
      .agg(sum(col("cnt")).as("lo"), sum(col("thr")).as("seen_thr"))
      .crossJoin(broadcast(totalThr))
      .select(lit(label).as("shard"), col("key"), col("lo"),
        (col("lo") + col("total_thr") - col("seen_thr")).as("hi"))
  }

  /** The top-`k` candidates by guaranteed count, each with a PROVEN
    * verdict: a candidate is certainly in the true top-k when fewer than
    * k OTHER keys could possibly exceed it (hi > its lo). The merged
    * frame is bounded by #shards·m rows — the global rank window and the
    * bounds self-join run over summary rows only, so "tiny by
    * construction" holds at any data size. */
  def topkCandidates(merged: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("lo").desc, col("key").asc)
    val cand = merged.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("key"), col("lo"), col("hi"), col("rank"))
    cand.as("c")
      .join(broadcast(merged.as("m")),
        col("m.key") =!= col("c.key") && col("m.hi") > col("c.lo"), "left")
      .groupBy(col("c.key").as("key"), col("c.lo").as("lo"),
        col("c.hi").as("hi"), col("c.rank").as("rank"))
      .agg(count(col("m.key")).as("n_contenders"))
      .select(col("key"), col("lo"), col("hi"), col("rank"),
        col("n_contenders"), (col("n_contenders") < k).as("proven"))
  }
}
