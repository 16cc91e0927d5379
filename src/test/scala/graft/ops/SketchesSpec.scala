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
}
