package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The two-pass range-partitioned rank/prefix-sum: bit-identical to the
  * single-partition ordered window it replaces, with NO
  * `Exchange SinglePartition` anywhere in the executed plan — the shape
  * that survives a 100× scale-up. */
class RangeRankSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "rangedPrefixSum"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  it should "match the single-partition ordered window bit for bit" in {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 5000L).map(i => (i, rnd.nextInt(50).toLong + 1L))
    val df = rows.toDF("id", "v")
    val got = Corpus.rangedPrefixSum(df, Seq(col("v").desc, col("id").asc), col("v"))
      .select(col("id"), col("__cum")).as[(Long, Long)].collect().toMap
    // reference: driver-side prefix sum over the same total order
    var cum = 0L
    val want = rows.sortBy { case (id, v) => (-v, id) }.map { case (id, v) =>
      cum += v; (id, cum)
    }.toMap
    got shouldBe want
  }

  it should "keep every exchange partitioned — no SinglePartition anywhere" in {
    val df = (0L until 5000L).map(i => (i, i % 97)).toDF("id", "v")
    val plan = planOf(
      Corpus.rangedPrefixSum(df, Seq(col("v").desc, col("id").asc), col("v")))
    withClue(plan) {
      plan should not include "Exchange SinglePartition"
      plan should include("rangepartitioning")     // pass 1: order-preserving split
      plan should include("hashpartitioning(__pid") // local cumsum stays per-partition
    }
  }

  it should "rank for giniConcentration identically to the direct formula" in {
    val rnd = new scala.util.Random(7)
    val events = (0 until 20000).map(i => (s"k${rnd.nextInt(300)}", i))
      .toDF("user_id", "x")
    val got = EventOps.giniConcentration(events, "user_id").collect()(0)
    // direct computation from per-key counts on the driver
    val counts = events.groupBy("user_id").count()
      .as[(String, Long)].collect().sortBy { case (k, n) => (n, k) }
    val nk = counts.length.toLong
    val total = counts.map(_._2).sum
    val sin = counts.zipWithIndex.map { case ((_, n), i) => (i + 1L) * n }.sum
    got.getLong(0) shouldBe nk
    got.getLong(1) shouldBe total
    val gini = (2L * sin - (nk + 1) * total).toDouble / (nk.toDouble * total)
    got.getDouble(2) shouldBe (math.rint(gini * 1e6) / 1e6)
  }

  it should "plan giniConcentration and tokenBudgetSelect without data-sized SinglePartition exchanges" in {
    // A SinglePartition exchange is scale-safe ONLY when it moves
    // map-side partial-aggregate rows (one row per partition — gini's
    // final 1-row readout). It is the bottleneck shape when it feeds a
    // Sort/Window over the full frame — the plan this rank replaced.
    def offendingSinglePartitions(plan: String): Seq[String] = {
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          !lines.drop(i + 1).take(2).exists(_.contains("partial_")) => l
      }
    }

    val events = (0 until 5000).map(i => (s"k${i % 37}", i)).toDF("user_id", "x")
    val gp = planOf(EventOps.giniConcentration(events, "user_id"))
    withClue(gp) { offendingSinglePartitions(gp) shouldBe empty }

    val docs = (0L until 500L)
      .map(i => (i, s"some sample text number $i with a few words"))
      .toDF("doc_id", "text")
    val tb = Corpus.tokenBudgetSelect(docs, "doc_id", "text", budgetTokens = 1000L)
    val tp = planOf(tb)
    withClue(tp) {
      offendingSinglePartitions(tp) shouldBe empty
      // the budget cut emits data rows, not a 1-row readout — here not
      // even a partial-fed SinglePartition may appear
      tp should not include "Exchange SinglePartition"
    }
  }

  it should "select exact global quantiles matching percentile, with no data-sized SinglePartition" in {
    val rnd = new scala.util.Random(99)
    val df = (0 until 10000).map(_ => rnd.nextGaussian() * 100).toDF("value")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = EventOps.globalQuantiles(df, "value", qs)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = df.agg(
      percentile(col("value"), lit(0.1)), percentile(col("value"), lit(0.5)),
      percentile(col("value"), lit(0.9)), percentile(col("value"), lit(0.99)))
      .collect()(0)
    qs.zipWithIndex.foreach { case (q, i) =>
      got(q)._1 shouldBe 10000L
      got(q)._2 shouldBe (math.rint(want.getDouble(i) * 1e6) / 1e6)
    }
    val plan = planOf(EventOps.globalQuantiles(df, "value", Seq(0.5)))
    withClue(plan) {
      // the only SinglePartition exchanges allowed are partial-aggregate
      // readouts (the 1-row n and the per-q result collapse)
      val lines = plan.linesIterator.toVector
      val offending = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          !lines.drop(i + 1).take(2).exists(_.contains("partial_")) => l
      }
      offending shouldBe empty
    }
  }

  it should "keep the per-key quantile window parallel (no data-sized SinglePartition)" in {
    val df = (0 until 4000).map(i => (s"k${i % 7}", i.toDouble)).toDF("k", "value")
    val plan = planOf(EventOps.groupedQuantiles(df, "k", "value", Seq(0.5)))
    withClue(plan) {
      val lines = plan.linesIterator.toVector
      val offending = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          !lines.drop(i + 1).take(2).exists(_.contains("partial_")) => l
      }
      offending shouldBe empty
      // the window partitions by the key, never globally
      plan should include("hashpartitioning(k")
    }
  }

  it should "compute exact per-key quantiles matching percentile, bufferlessly" in {
    val rnd = new scala.util.Random(3)
    val df = (0 until 8000).map(i => (s"k${i % 5}", rnd.nextGaussian() * 10))
      .toDF("k", "value")
    val got = EventOps.groupedQuantiles(df, "k", "value", Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    val want = df.groupBy("k").agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.95)).as("p95"))
      .collect().flatMap(r => Seq(
        (r.getString(0), 0.5) -> r.getDouble(1),
        (r.getString(0), 0.95) -> r.getDouble(2))).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) =>
      v shouldBe (math.rint(want(k) * 1e6) / 1e6)
    }
  }

  it should "cut equi-depth bins at the exact rounded quartiles" in {
    val df = (1 to 100).map(_.toDouble).toDF("value")
    val bins = EventOps.equiDepthBins(df, "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    bins.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // quartiles of 1..100 (type-7): 25.75, 50.5, 75.25 -> 25/25/25/25
    bins(0L) shouldBe ((25L, 1.0, 25.0))
    bins(1L) shouldBe ((25L, 26.0, 50.0))
    bins(2L) shouldBe ((25L, 51.0, 75.0))
    bins(3L) shouldBe ((25L, 76.0, 100.0))
  }

  it should "weight decayed popularity by exact half-life powers" in {
    val base = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    def at(days: Double) =
      new java.sql.Timestamp(base.getTime + (days * 86400000L).toLong)
    // anchor event weight 1.0; 7 days earlier weight 0.5; 14 days 0.25
    val df = Seq(("a", at(14.0)), ("a", at(7.0)), ("a", at(0.0)),
      ("b", at(14.0)), ("b", at(0.0))).toDF("event_type", "ts")
    val got = EventOps.decayedPopularity(df, "event_type", "ts", halfLifeDays = 7.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got("a") shouldBe ((3L, 1.75))   // 1 + 0.5 + 0.25
    got("b") shouldBe ((2L, 1.25))   // 1 + 0.25 (7-day half-life, 14 days)
  }

  behavior of "bpeSegment broadcastVocab switch"

  it should "produce identical results in broadcast and shuffle-hash modes" in {
    val docs = (0L until 200L)
      .map(i => (i, s"alpha beta gamma_$i delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val bc = Corpus.bpeSegment(docs, "doc_id", "text", nMerges = 6,
      broadcastVocab = true).orderBy("doc_id").collect()
    val sh = Corpus.bpeSegment(docs, "doc_id", "text", nMerges = 6,
      broadcastVocab = false).orderBy("doc_id").collect()
    sh shouldBe bc
  }
}
