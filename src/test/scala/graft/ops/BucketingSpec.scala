package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Bucketed-layout join co-location: the write-once-shuffle-never property
  * the 100 TB design leans on for repeatedly-joined tables. */
class BucketingSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "Bucketing"

  it should "plan a same-bucketed equi-join with no shuffle exchange" in {
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val sigs = (0L until 1000L).map(i => (i, i % 7)).toDF("doc_id", "band")
    Bucketing.writeBucketed(docs, "b_docs", Seq("doc_id"), 4)
    Bucketing.writeBucketed(sigs, "b_sigs", Seq("doc_id"), 4)
    // force sort-merge joins: tiny test frames would otherwise broadcast,
    // which has no shuffle either and would make both assertions vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_docs", "b_sigs", Seq("doc_id"))
      joined.count() shouldBe 1000
      withClue(joined.queryExecution.executedPlan.toString) {
        Bucketing.hasNoShuffle(joined) shouldBe true
      }
      // control: the same join on un-bucketed frames DOES shuffle
      val plain = docs.join(sigs, "doc_id")
      Bucketing.hasNoShuffle(plain) shouldBe false
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_sigs")
    }
  }

  it should "probe a bucketed corpus dedup index with zero corpus-side shuffle" in {
    // The posture the Dedup.MinhashIndex doc promises: corpus bands
    // bucketed by (band, key), corpus shingles bucketed by (id) — every
    // nightly incremental probe joins them co-located by layout, and only
    // the new batch + candidate pairs shuffle.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text")
    Bucketing.writeBucketed(idx.bands, "g_corpus_bands", Seq("band", "key"), 4)
    Bucketing.writeBucketed(idx.shingles, "g_corpus_sh", Seq("id"), 4)
    // static plans (AQE off) so every Exchange is visible to collect();
    // broadcast off so a broadcast corpus wouldn't make the check vacuous
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    var ctlDir: String = null
    try {
      val res = Dedup.minhashNearDupsAgainstIndex(batch,
        spark.table("g_corpus_sh"), spark.table("g_corpus_bands"), "doc_id", "text")
      // identical rows to the build-inline path on the same inputs
      val direct = Dedup.minhashNearDupsAgainst(batch, corpus, "doc_id", "text")
      res.collect().toSet shouldBe direct.collect().toSet
      res.count() should be > 0L
      // the plan property bucketing buys: neither corpus-table scan is
      // re-partitioned before its consuming join. Exchanges ABOVE a join
      // legitimately carry derived candidate pairs (which descend from the
      // corpus scan), so the check walks each Exchange's child subtree and
      // flags a corpus scan only if reachable without crossing a join.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def scanShuffledBeforeJoin(e: ShuffleExchangeExec, marker: String): Boolean = {
        def walk(p: SparkPlan): Boolean = p match {
          case _: BaseJoinExec => false
          case leaf if leaf.children.isEmpty => leaf.toString.contains(marker)
          case other => other.children.exists(walk)
        }
        walk(e.child)
      }
      val plan = res.queryExecution.executedPlan
      plan.toString should include ("Bucketed: true") // both index scans
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      exchanges should not be empty // the new-batch side DOES shuffle
      val offending = exchanges.filter(scanShuffledBeforeJoin(_, "g_corpus"))
      withClue(plan.toString) { offending shouldBe empty }
      // control: probing un-bucketed corpus frames shuffles the corpus
      // band scan before its join. The corpus is re-read from its OWN
      // distinctly-named parquet dir so the marker cannot match the
      // new-batch side's documents.parquet scan (which always shuffles) —
      // otherwise this control could never fail and would prove nothing.
      ctlDir = java.nio.file.Files
        .createTempDirectory("graft_corpus_ctl").toString
      corpus.write.mode("overwrite").parquet(ctlDir)
      val idxPlain = Dedup.minhashIndex(
        spark.read.parquet(ctlDir), "doc_id", "text")
      val plain = Dedup.minhashNearDupsAgainstIndex(batch,
        idxPlain.shingles, idxPlain.bands, "doc_id", "text")
      val plainCorpusShuffled = plain.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
        .exists(scanShuffledBeforeJoin(_, "graft_corpus_ctl"))
      plainCorpusShuffled shouldBe true
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS g_corpus_bands")
      spark.sql("DROP TABLE IF EXISTS g_corpus_sh")
      if (ctlDir != null) // cleaned even when an assertion above fails
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ctlDir))
    }
  }

  it should "write range-sorted files covering disjoint key ranges" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_range_t").toString
    val docs = (0L until 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .repartition(7) // any input partitioning; the writer re-ranges
    Bucketing.writeRangeSorted(docs, dir, "doc_id", numFiles = 3)
    val perFile = spark.read.parquet(dir)
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo").collect()
    perFile.length shouldBe 3
    perFile.map(_.getLong(3)).sum shouldBe 300
    // each file's range starts strictly after the previous file's end
    perFile.sliding(2).foreach { case Array(a, b) =>
      b.getLong(1) should be > a.getLong(2)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  it should "skip files on BOTH keys under a z-ordered layout" in {
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong, (i % n).toLong, (i / n).toLong))
      .toDF("id", "x", "y")
    def filesTouched(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()

    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    Bucketing.writeZOrdered(grid, zDir, "x", "y", bits = 6, numFiles = 8)
    // an x-range AND a y-range filter each concentrate in a few files
    filesTouched(zDir, col("x") < 8) should be <= 6L
    filesTouched(zDir, col("y") < 8) should be <= 6L

    // control: a single-key sort stripes one dimension — the filter on the
    // OTHER key touches every file
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    Bucketing.writeRangeSorted(grid, xDir, "x", numFiles = 8)
    filesTouched(xDir, col("y") < 8) shouldBe 8L

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zDir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(xDir))
  }

  it should "compact a many-file layout without losing rows" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    docs.repartition(20).write.mode("overwrite").parquet(dir) // 20 small files
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    parquetFiles() shouldBe 20
    Bucketing.compact(spark, dir, targetFiles = 2)
    parquetFiles() shouldBe 2
    val back = spark.read.parquet(dir)
    back.count() shouldBe 500
    back.agg(sum("doc_id")).collect()(0).getLong(0) shouldBe (0L until 500L).sum
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  it should "skip row groups at the scan for range-sorted and z-ordered layouts" in {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // What the scan actually READ (post row-group min/max skipping), not
    // just which files contained matches: each small file is one parquet
    // row group, so a skipped file contributes zero to the scan's
    // numOutputRows metric.
    def scanned(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val leaves = plan.collectLeaves()
      val rows = leaves.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (rows, leaves.map(_.toString).mkString("\n"))
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val docs = (0L until 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    Bucketing.writeRangeSorted(docs, dir, "doc_id", numFiles = 3)
    val (rows, scan) = scanned(spark.read.parquet(dir).filter(col("doc_id") < 50))
    withClue(scan) {
      // the predicate reaches the parquet reader...
      scan should include ("PushedFilters")
      scan should include ("LessThan(doc_id,50)")
      // ...and 2 of 3 disjoint-range row groups are never materialized
      rows should be < 300L
      rows should be >= 50L
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

    // z-order: BOTH dimensions skip at the scan
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong, (i % n).toLong, (i / n).toLong))
      .toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    Bucketing.writeZOrdered(grid, zDir, "x", "y", bits = 6, numFiles = 8)
    val (zx, sx) = scanned(spark.read.parquet(zDir).filter(col("x") < 8))
    val (zy, sy) = scanned(spark.read.parquet(zDir).filter(col("y") < 8))
    withClue(sx) { zx should be < (n * n).toLong }
    withClue(sy) { zy should be < (n * n).toLong }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zDir))
  }

  it should "prune partitions at the scan for partitioned layouts" in {
    // Hive-style partitioning: the OTHER storage-layout lever — a stratum
    // filter must never touch the other strata's files at 100 TB.
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = (0L until 300L)
      .map(i => (i, Seq("en", "de", "fr")((i % 3).toInt), s"text $i"))
      .toDF("doc_id", "lang", "text")
    Bucketing.writePartitioned(docs, dir, Seq("lang"))
    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    filtered.count() shouldBe 100
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    // the lang predicate must land in the scan's PartitionFilters (pruned
    // at planning), not as a post-scan Filter over all partitions
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(scan).getOrElse("")
    withClue(scan) { pf should include ("lang") }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
