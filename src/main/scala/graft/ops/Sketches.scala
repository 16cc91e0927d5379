package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
