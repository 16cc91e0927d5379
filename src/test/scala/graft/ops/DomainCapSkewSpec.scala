package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The skew-safe domain cap: a source holding most of the corpus must
  * not funnel through one window-sort task. `skewSafe = true` swaps the
  * per-source window for a range-partitioned per-(partition, source)
  * rank plus broadcast prefix offsets — bit-identical output, with
  * every sort bounded by a range partition. */
class DomainCapSkewSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "domainCapSample(skewSafe)"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // one dominant source (86% of rows), one mid, one below its budget
  private lazy val skewed = {
    val rows = (0L until 6000L).map(i => (i, "big")) ++
      (6000L until 6900L).map(i => (i, "mid")) ++
      (6900L until 6950L).map(i => (i, "tiny"))
    rows.toDF("doc_id", "source").repartition(13)
  }

  it should "agree with the exact-window mode row for row on a skewed fixture" in {
    val exact = Corpus.domainCapSample(skewed, "doc_id", "source", 0.25)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._3))
    val safe = Corpus.domainCapSample(skewed, "doc_id", "source", 0.25,
      skewSafe = true)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._3))
    safe shouldBe exact
    // and both equal the driver-side reference cut
    val budget = math.floor(0.25 * 6950).toLong
    exact.count(_._2 == "big") shouldBe budget
    exact.count(_._2 == "mid") shouldBe 900   // under budget: all survive
    exact.count(_._2 == "tiny") shouldBe 50
    val md5hex = java.security.MessageDigest.getInstance("MD5")
    def k(id: Long) = md5hex.clone().asInstanceOf[java.security.MessageDigest]
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantBig = (0L until 6000L).sortBy(i => (k(i), i)).take(budget.toInt).toSet
    exact.filter(_._2 == "big").map(_._1).toSet shouldBe wantBig
  }

  it should "never sort a whole source in one task: range split + partition-bounded windows" in {
    val plan = planOf(
      Corpus.domainCapSample(skewed, "doc_id", "source", 0.25, skewSafe = true))
    withClue(plan) {
      // pass 1: the global (source, key) order is SPLIT across range
      // partitions — a dominant source spans many of them
      plan should include("rangepartitioning")
      // the only row_number window runs per (partition-id, source):
      // bounded by a range partition, never by a source's row count
      plan should include("windowspecdefinition(__pid")
      plan should not include "windowspecdefinition(source#"
      // the sole SinglePartition is the 1-row budget-total readout fed
      // by partial aggregates — never a data-sized exchange
      val lines = plan.linesIterator.toVector
      val offending = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          !lines.drop(i + 1).take(2).exists(_.contains("partial_")) => l
      }
      offending shouldBe empty
    }
  }
}
