package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The mergeable-HLL-sketch-table contract (ops/Sketches): register
  * bounds, the defining merge property (register-wise max == sketch of
  * the union), order-independence of the exact-integer estimate, and
  * the 3-sigma accuracy verdict on overlapping shards. */
class SketchesSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // two shards with a 200-key overlap: per-shard exact 500, union 800 —
  // the case where summing per-shard exacts (1000) is WRONG and only a
  // mergeable sketch answers the union without rescanning
  private def fixture = {
    val a = (0L until 500L).map(i => (s"key-$i", "a"))
    val b = (300L until 800L).map(i => (s"key-$i", "b"))
    (a ++ b).toDF("k", "shard")
  }

  behavior of "Sketches"

  it should "keep registers in-range and at most m rows per shard" in {
    val regs = Sketches.hllRegisters(fixture, col("k"), "shard").collect()
    regs.length should be <= 2 * Sketches.M
    all(regs.map(_.getLong(1))) should (be >= 0L and be < Sketches.M.toLong)
    all(regs.map(_.getInt(2))) should (be >= 1 and be <= Sketches.W + 1)
  }

  it should "merge by register-wise max exactly to the from-scratch union sketch" in {
    val keyed = fixture
    val regs = Sketches.hllRegisters(keyed, col("k"), "shard")
    val merged = Sketches.hllUnion(regs, "u")
      .select(col("idx"), col("rho")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val scratch = Sketches.hllRegisters(
        keyed.select(col("k"), lit("u").as("shard")), col("k"), "shard")
      .select(col("idx"), col("rho")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    merged shouldBe scratch
  }

  it should "estimate order-independently (exact-integer harmonic sum)" in {
    val est1 = Sketches.hllEstimate(
      Sketches.hllRegisters(fixture, col("k"), "shard"))
    // reversed arrival order and a different partitioning must produce
    // the bit-identical estimate — the float chain runs on an integer
    // numerator, never on an order-dependent float sum
    val est2 = Sketches.hllEstimate(
      Sketches.hllRegisters(fixture.orderBy(col("k").desc).repartition(7),
        col("k"), "shard"))
    val a = est1.orderBy("shard").collect().map(_.toSeq)
    val b = est2.orderBy("shard").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "report per-shard and union estimates within 3 sigma of exact" in {
    val rep = Sketches.hllReport(fixture, col("k"), "shard").collect()
    rep.length shouldBe 3 // a, b, __union
    val byShard = rep.map(r => r.getString(0) -> r).toMap
    byShard("a").getLong(5) shouldBe 500L
    byShard("b").getLong(5) shouldBe 500L
    // the union row is what per-shard exact sums (1000) cannot give
    byShard("__union").getLong(5) shouldBe 800L
    all(rep.map(_.getBoolean(6))) shouldBe true // within_3sigma
    // estimates genuinely differ from exact (it IS a sketch)
    rep.map(_.getDouble(3)).toSet.size should be > 1
  }

  it should "maintain distinct-count registers in O(delta), idle-free, rebootstrapping after rewrites" in {
    def tmp() = java.nio.file.Files.createTempDirectory("graft_hll_ivm").toString
    def rm(d: String) =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    val src = tmp(); val agg = tmp()
    val M = graft.sources.ManifestTable
    def regRows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    def scratchRegs() = regRows(Sketches.hllRegisters(
      M.read(spark, src), col("k"), "shard"))
    try {
      M.append(spark, src,
        (0L until 300L).map(i => (s"key-$i", if (i % 2 == 0) "a" else "b"))
          .toDF("k", "shard"))
      var w = Sketches.maintainDistinctRollup(
        spark, src, agg, -1L, "shard", col("k"))
      regRows(M.read(spark, agg)) shouldBe scratchRegs()
      // the incremental refresh folds only the new batch's registers
      M.append(spark, src,
        (300L until 700L).map(i => (s"key-$i", "a")).toDF("k", "shard"))
      w = Sketches.maintainDistinctRollup(spark, src, agg, w, "shard", col("k"))
      regRows(M.read(spark, agg)) shouldBe scratchRegs()
      // idle refresh: no new source version, no new agg commit
      val aggV = M.currentVersion(spark, agg)
      w = Sketches.maintainDistinctRollup(spark, src, agg, w, "shard", col("k"))
      M.currentVersion(spark, agg) shouldBe aggV
      // a rewrite commit (compaction) breaks the file diff: the refresh
      // must detect it and rebuild from scratch, still exactly right
      M.compactSorted(spark, src, Seq("k"), targetFiles = 2)
      M.append(spark, src,
        (700L until 800L).map(i => (s"key-$i", "b")).toDF("k", "shard"))
      Sketches.maintainDistinctRollup(spark, src, agg, w, "shard", col("k"))
      regRows(M.read(spark, agg)) shouldBe scratchRegs()
    } finally { rm(src); rm(agg) }
  }

  behavior of "top-k summaries"

  // a skewed multi-shard fixture where no single shard's top-m equals the
  // global ranking: key K20 is moderately frequent EVERYWHERE (and must
  // win globally), while each shard has its own noisy local heavies
  private def hhFixture = {
    val shards = Seq("s1", "s2", "s3")
    val rows = shards.zipWithIndex.flatMap { case (sh, i) =>
      val common = (0 until 30).map(_ => ("K20", sh))
      val locals = (0 until 20).flatMap(j =>
        (0 until (25 - j)).map(_ => (s"L$i-$j", sh)))
      common ++ locals
    }
    rows.toDF("k", "shard")
  }

  it should "bound every key's true count inside [lo, hi] and keep summaries at m rows" in {
    val sk = Sketches.topkSketch(hhFixture, col("k"), "shard", m = 8)
    sk.groupBy("shard").count().collect()
      .foreach(_.getLong(1) should be <= 8L)
    val merged = Sketches.topkMerge(sk, "all")
    val truth = hhFixture.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("n_true"))
    val viol = merged.join(truth, "key")
      .filter(col("n_true") < col("lo") || col("n_true") > col("hi"))
      .count()
    viol shouldBe 0L
    // the TPUT guarantee: any key above the summed thresholds is present
    val totalThr = sk.select("shard", "thr").distinct()
      .agg(sum("thr")).collect().head.getLong(0)
    val mustBePresent = truth.filter(col("n_true") > totalThr)
    mustBePresent.join(merged, Seq("key"), "left_anti").count() shouldBe 0L
    // and the globally heaviest key is found and proven despite never
    // being any single shard's #1
    val cand = Sketches.topkCandidates(merged, k = 3).collect()
    val top = cand.find(_.getInt(3) == 1).get
    top.getString(0) shouldBe "K20"
    top.getBoolean(5) shouldBe true // proven
  }

  it should "merge summaries to the same bounds regardless of arrival order" in {
    val sk1 = Sketches.topkSketch(hhFixture, col("k"), "shard", m = 8)
    val sk2 = Sketches.topkSketch(
      hhFixture.orderBy(col("k").desc).repartition(7), col("k"), "shard", m = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      Sketches.topkMerge(df, "all").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).sorted
    rows(sk1) shouldBe rows(sk2)
  }

  behavior of "KMV sketches"

  it should "hold at most K rows, exact below K, estimate above it" in {
    val sk = Sketches.kmvSketch(fixture, col("k"), "shard")
    sk.groupBy("shard").count().collect()
      .foreach(_.getLong(1) should be <= Sketches.K.toLong)
    // a small shard's sketch IS its distinct set (exact estimate)
    val small = (0L until 20L).map(i => (s"s-$i", "tiny")).toDF("k", "shard")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, col("k"), "shard")).collect().head
    est.getInt(1) shouldBe 20
    est.getDouble(2) shouldBe 20.0
    est.getBoolean(3) shouldBe true // is_exact
    // a saturated sketch estimates within the ~13% (1/sqrt(K-2)) band,
    // generously widened to 3x for the fixed fixture
    val big = Sketches.kmvEstimate(
      Sketches.kmvSketch(fixture, col("k"), "shard")).collect()
    big.foreach { r =>
      r.getBoolean(3) shouldBe false
      math.abs(r.getDouble(2) - 500.0) / 500.0 should be < 0.4
    }
  }

  it should "union-merge to exactly the from-scratch sketch" in {
    val sk = Sketches.kmvSketch(fixture, col("k"), "shard")
    val merged = Sketches.kmvUnion(sk, "u")
      .select("h", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val scratch = Sketches.kmvSketch(
        fixture.select(col("k"), lit("u").as("shard")), col("k"), "shard")
      .select("h", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    merged shouldBe scratch
  }

  it should "estimate intersection and Jaccard from sketch rows alone" in {
    // true: |A|=500, |B|=500, |A∩B|=200, |A∪B|=800, J=0.25
    val rep = Sketches.kmvSetOps(fixture, col("k"), "shard", "a", "b")
      .collect().head
    rep.getLong(7) shouldBe 500L  // nd_a
    rep.getLong(8) shouldBe 500L  // nd_b
    rep.getLong(9) shouldBe 800L  // nd_union
    rep.getLong(10) shouldBe 200L // nd_intersection
    math.abs(rep.getDouble(4) - 800.0) / 800.0 should be < 0.4  // est_union
    // Jaccard and intersection estimates land in a usable band around
    // truth (K=64 gives coarse but decision-grade set-overlap reads)
    rep.getDouble(5) should (be > 0.05 and be < 0.6)   // jaccard_est vs 0.25
    rep.getDouble(6) should (be > 40.0 and be < 500.0) // est_intersection vs 200
  }

  behavior of "count-min sketches"

  it should "merge by addition and never undercount" in {
    val data = (0L until 2000L).map(i => (s"u-${i % 97}", if (i % 2 == 0) "x" else "y"))
      .toDF("k", "shard")
    val sk = Sketches.cmsSketch(data, col("k"), "shard")
    // at most depth*width rows per shard
    sk.groupBy("shard").count().collect()
      .foreach(_.getLong(1) should be <= (Sketches.CmsD * Sketches.CmsW).toLong)
    // merging per-shard tables == sketching all the data at once
    val merged = Sketches.cmsMerge(sk, "all")
      .select("row", "col", "cnt").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    val scratch = Sketches.cmsSketch(
        data.select(col("k"), lit("all").as("shard")), col("k"), "shard")
      .select("row", "col", "cnt").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    merged shouldBe scratch
    // point estimates: structurally >= exact, and within N/width slack
    val probes = (0 until 10).map(i => s"u-$i").toDF("probe")
    val est = Sketches.cmsPointEstimate(
        Sketches.cmsMerge(sk, "all"), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 10).map(i => s"u-$i").foreach { p =>
      est(p) should be >= exact(p)
      est(p) - exact(p) should be <= (2000L * 3 / Sketches.CmsW + 1)
    }
    // an unseen key can only collide upward from zero
    val unseen = Sketches.cmsPointEstimate(
      Sketches.cmsMerge(sk, "all"), Seq("never-seen").toDF("probe"))
      .collect().head.getLong(1)
    unseen should be >= 0L
  }

  behavior of "sketch plan shapes"

  it should "build every sketch with map-side combine and no sort-merge join" in {
    // the 100 TB posture, plan-proven: each sketch build is a partial-
    // aggregated groupBy (the shuffle carries at most m / K / depth*width
    // rows per shard, never the data), merges run over sketch rows only,
    // and every join in the probe paths broadcasts the tiny side
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id").cast("string").as("k"),
        col("event_type").as("shard"))
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val hll = planOf(Sketches.hllRegisters(ev, col("k"), "shard"))
    withClue(hll) {
      hll should include ("partial_max")
      hll should not include "SortMergeJoin"
    }
    val kmv = planOf(Sketches.kmvSketch(ev, col("k"), "shard"))
    withClue(kmv) {
      // the min-K cut runs MAP-SIDE too: a Partial WindowGroupLimit
      // before the shard exchange caps the shuffle at K rows per shard
      // per input partition (the distinct is the agg-function-free
      // HashAggregate pair around the (shard, h) exchange)
      kmv should include ("row_number(), 64, Partial")
      kmv should include ("row_number(), 64, Final")
      kmv should not include "SortMergeJoin"
    }
    val cms = planOf(Sketches.cmsSketch(ev, col("k"), "shard"))
    withClue(cms) {
      cms should include ("partial_count")
      cms should not include "SortMergeJoin"
    }
    val probe = planOf(Sketches.cmsPointEstimate(
      Sketches.cmsMerge(Sketches.cmsSketch(ev, col("k"), "shard"), "all"),
      Seq("1", "2").toDF("probe")))
    withClue(probe) {
      probe should include ("BroadcastHashJoin")
      probe should not include "SortMergeJoin"
    }
    // top-k summary build: the per-shard top-(m+1) cut runs MAP-SIDE —
    // at most m+1 rows per shard per partition enter the shuffle
    val hh = planOf(Sketches.topkSketch(ev, col("k"), "shard", m = 8))
    withClue(hh) {
      hh should include ("row_number(), 9, Partial")
      hh should include ("row_number(), 9, Final")
      hh should not include "SortMergeJoin"
    }
  }
}
