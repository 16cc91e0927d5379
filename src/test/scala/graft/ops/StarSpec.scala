package graft.ops

import graft.plug.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class StarSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  // two orders for customer 1 (nation 10), one for customer 2 (nation 20);
  // lineitem 3 ships outside the window, lineitem 4 belongs to nation 20
  private lazy val lineitem = Seq(
    (1L, 100L, 1.0, 10.0, 0.1, 0.05, "N", "O", ts("1996-05-01")),
    (1L, 101L, 2.0, 20.0, 0.0, 0.05, "N", "O", ts("1996-06-01")),
    (2L, 100L, 1.0, 30.0, 0.5, 0.05, "R", "F", ts("1995-01-01")),
    (3L, 102L, 4.0, 40.0, 0.25, 0.05, "N", "O", ts("1997-01-01"))
  ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  private lazy val orders = Seq(
    (1L, 1L, ts("1996-04-01"), "1-URGENT"),
    (2L, 1L, ts("1994-12-01"), "5-LOW"),
    (3L, 2L, ts("1996-12-01"), "2-HIGH")
  ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")

  private lazy val customer = Seq(
    (1L, 10L, "BUILDING"), (2L, 20L, "MACHINERY")
  ).toDF("c_custkey", "c_nationkey", "c_mktsegment")

  private lazy val nation = Seq((10L, "ALPHA"), (20L, "BETA"))
    .toDF("n_nationkey", "n_name")

  behavior of "Star"

  it should "roll revenue up to customer nations with window filters" in {
    val out = Star.revenueByNation(lineitem, orders, customer, nation,
        "1996-01-01", "1998-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // ALPHA: items 1+2 → 10·0.9 + 20·1.0 = 29; BETA: item 4 → 40·0.75 = 30
    out shouldBe Array(("ALPHA", 2L, 29.0), ("BETA", 1L, 30.0))
  }

  it should "rank orders by revenue inside one segment" in {
    val out = Star.topOrdersBySegment(lineitem, orders, customer,
        "BUILDING", "1997-01-01", "1995-06-30", 10)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    // only customer 1 is BUILDING; order 2's lineitem shipped before the
    // cutoff, so order 1 alone survives with its two in-window items
    out shouldBe Array((1L, "1-URGENT", 29.0))
  }

  it should "summarize pricing by returnflag and linestatus" in {
    val out = Star.pricingSummary(lineitem, "2000-12-01")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    out.length shouldBe 2
    val nO = out(0)
    nO._1 shouldBe "N"
    nO._3 shouldBe 7.0                       // 1 + 2 + 4
    nO._4 shouldBe 70.0                      // 10 + 20 + 40
    nO._5 shouldBe 59.0                      // 9 + 20 + 30
    nO._6 shouldBe math.rint((9 * 1.05 + 20 * 1.05 + 30 * 1.05) * 100) / 100
    nO._7 shouldBe 3L
    out(1) shouldBe (("R", "F", 1.0, 30.0, 15.0,
      math.rint(15 * 1.05 * 100) / 100, 1L))
  }
}
