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

  // supplier-keyed fixture for the Q5/Q14/Q15 flavors
  private lazy val lineitemS = Seq(
    (1L, 100L, 500L, 10.0, 0.1, ts("1996-05-01")),   // rev 9,  supp nation 10
    (1L, 101L, 501L, 20.0, 0.0, ts("1996-06-01")),   // rev 20, supp nation 20
    (2L, 100L, 500L, 30.0, 0.5, ts("1995-01-01")),   // rev 15, order outside window
    (3L, 102L, 502L, 40.0, 0.25, ts("1997-01-01"))   // rev 30, supp nation 20
  ).toDF("l_orderkey", "l_partkey", "l_suppkey",
    "l_extendedprice", "l_discount", "l_shipdate")

  private lazy val supplier = Seq(
    (500L, "S-A", 10L), (501L, "S-B", 20L), (502L, "S-C", 20L)
  ).toDF("s_suppkey", "s_name", "s_nationkey")

  private lazy val nationR = Seq((10L, "ALPHA", 1L), (20L, "BETA", 2L))
    .toDF("n_nationkey", "n_name", "n_regionkey")

  private lazy val region = Seq((1L, "ASIA"), (2L, "EUROPE"))
    .toDF("r_regionkey", "r_name")

  private lazy val part = Seq(
    (100L, "PROMO"), (101L, "STANDARD"), (102L, "PROMO")
  ).toDF("p_partkey", "p_type")

  it should "keep only local-supplier revenue inside the region" in {
    // window keeps orders 1 and 3; order 1's supp-501 line is non-local
    // (cust nation 10 vs supp nation 20); order 3 is local but BETA/EUROPE
    val asia = Star.localSupplierVolume(lineitemS, orders, customer,
        supplier, nationR, region, "ASIA", "1996-01-01", "1997-01-01")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    asia shouldBe Array(("ALPHA", 9.0, 1L))
    val europe = Star.localSupplierVolume(lineitemS, orders, customer,
        supplier, nationR, region, "EUROPE", "1996-01-01", "1997-01-01")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    europe shouldBe Array(("BETA", 30.0, 1L))
  }

  it should "compute the promo revenue share as a DECIMAL-sum ratio" in {
    val out = Star.promoRevenueShare(lineitemS, part, "PROMO",
        "1995-01-01", "1998-01-01")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    // promo parts 100/102 carry 9+15+30 = 54 of the 74 total
    out shouldBe Array((math.rint(100.0 * 54 / 74 * 10000) / 10000, 4L))
  }

  it should "surface the max-revenue supplier with ties intact" in {
    val out = Star.topSupplier(lineitemS, supplier,
        "1996-01-01", "1997-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    out shouldBe Array((501L, "S-B", 20.0))
    // widen the window so supp-502's 30 wins alone
    val wide = Star.topSupplier(lineitemS, supplier,
        "1995-01-01", "1998-01-01")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    wide shouldBe Array(("S-C", 30.0))
  }

  it should "count only late-shipped orders per priority via the semi join" in {
    // o1 has one late line (>90d) and one on-time line → counted ONCE;
    // o2 ships on time; o3 is outside the orderdate window
    val ord = Seq(
      (1L, ts("1997-02-01"), "1-URGENT"),
      (2L, ts("1997-03-01"), "5-LOW"),
      (3L, ts("1996-01-01"), "2-HIGH")
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("1997-06-15")), (1L, ts("1997-02-10")),
      (2L, ts("1997-03-20")), (3L, ts("1996-09-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val out = Star.latePriorityCensus(li, ord, "1997-01-01", "1997-07-01", 90)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(("1-URGENT", 1L))
  }

  it should "keep zero-order customers in the order-count distribution" in {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "5-LOW"), (12L, 2L, "2-HIGH")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Star.orderCountDistribution(ord, cust, "5-LOW")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // cust1: 1 counted order (5-LOW excluded), cust2: 1, cust3: 0
    out shouldBe Array((0L, 1L), (1L, 2L))
  }

  it should "anti-join recent orderers out of the dormant-balance census" in {
    val cust = Seq(
      (1L, 10L, 300.0),  // above avg, dormant → kept
      (2L, 10L, 200.0),  // above avg but ordered recently → anti-joined out
      (3L, 20L, 10.0),   // below the positive-balance avg (170)
      (4L, 20L, -50.0)   // negative balances don't enter the avg
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val ord = Seq((100L, 2L, ts("1999-06-01")), (101L, 1L, ts("1998-01-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Star.dormantHighBalance(cust, ord, nation, "1999-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(("ALPHA", 1L, 300.0))
  }

  it should "gate small-quantity lines on the windowed per-part average" in {
    val part = Seq((100L, "Brand#1"), (101L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (100L, 1.0, 700.0), (100L, 10.0, 10.0), (100L, 10.0, 10.0),
      (101L, 1.0, 999.0) // wrong brand — never scanned past the join
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    // avg qty for part 100 = 7 → cutoff 1.4 → only the qty-1 line passes
    val out = Star.smallQuantityRevenue(li, part, "Brand#1")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    out shouldBe Array((100.0, 1L))
  }

  it should "push the OR-envelope to both scans in the Q19 flavor" in {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val q = Star.specialDiscountRevenue(t("lineitem"), t("part"),
      Seq(("Brand#1", (1, 10), (1.0, 15.0)),
        ("Brand#2", (11, 20), (10.0, 25.0)),
        ("Brand#3", (21, 35), (20.0, 40.0))))
    q.collect().length shouldBe 1
    val plan = q.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "CartesianProduct"
      val liScan = plan.linesIterator
        .filter(l => l.contains("lineitem.parquet") && l.contains("PushedFilters"))
        .mkString
      liScan should include("l_quantity")
      val partScan = plan.linesIterator
        .filter(l => l.contains("part.parquet") && l.contains("PushedFilters"))
        .mkString
      partScan should include("p_size")
      partScan should include("p_brand")
    }
  }

  it should "plan Q7/Q8 with broadcast dims and no cartesian shapes" in {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val q7 = Star.tradeVolume(t("lineitem"), t("orders"), t("customer"),
      t("supplier"), t("nation"), "NATION_3", "NATION_7",
      "1996-01-01", "1998-01-01")
    val q8 = Star.marketShare(t("lineitem"), t("orders"), t("customer"),
      t("supplier"), t("part"), t("nation"), t("region"),
      "EUROPE", "NATION_5", "ECONOMY", "1996-01-01", "1998-01-01")
    Seq("q7" -> q7, "q8" -> q8).foreach { case (tag, q) =>
      q.collect().length should be >= 0
      val plan = q.queryExecution.executedPlan.toString
      withClue(s"$tag plan:\n$plan") {
        plan should include("BroadcastHashJoin")
        plan should not include "BroadcastNestedLoopJoin"
        plan should not include "CartesianProduct"
        // the shipdate/orderdate window reaches the fact scan
        val factScan = plan.linesIterator.filter(l =>
          (l.contains("lineitem.parquet") || l.contains("orders.parquet")) &&
            l.contains("PushedFilters")).mkString
        factScan should (include("l_shipdate") or include("o_orderdate"))
      }
    }
  }

  it should "plan the anti and semi joins as hash joins with pushed filters" in {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val q22 = Star.dormantHighBalance(t("customer"), t("orders"), t("nation"),
      "1999-01-01")
    q22.collect().length should be >= 0
    val p22 = q22.queryExecution.executedPlan.toString
    withClue(p22) {
      p22.toLowerCase should include("leftanti")
      p22 should not include "CartesianProduct"
      // the orderdate cutoff pushes to the orders scan (anti build side
      // shrinks before the join)
      val ordersScan = p22.linesIterator.filter(l =>
        l.contains("orders.parquet") && l.contains("PushedFilters")).mkString
      ordersScan should include("o_orderdate")
    }
    val q4 = Star.latePriorityCensus(t("lineitem"), t("orders"),
      "1997-01-01", "1997-07-01", 90)
    q4.collect().length should be >= 0
    val p4 = q4.queryExecution.executedPlan.toString
    withClue(p4) {
      p4.toLowerCase should include("leftsemi")
      p4 should not include "BroadcastNestedLoopJoin"
      p4 should not include "CartesianProduct"
    }
  }

  it should "plan Q5 with broadcast dims, pushed date filter, no nested loop" in {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val q = Star.localSupplierVolume(t("lineitem"), t("orders"), t("customer"),
      t("supplier"), t("nation"), t("region"), "ASIA", "1996-01-01", "1997-01-01")
    q.collect().length should be >= 0
    val plan = q.queryExecution.executedPlan.toString
    withClue(plan) {
      // the ≤25-row nation⋈region frame rides a broadcast join…
      plan should include("BroadcastHashJoin")
      // …and nothing degenerates to a nested-loop or cartesian shape
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      // the orderdate window reaches the orders parquet scan
      val ordersScan = plan.linesIterator
        .filter(l => l.contains("orders.parquet") && l.contains("PushedFilters"))
        .mkString
      ordersScan should include("o_orderdate")
    }
  }

  it should "plan Q9/Q18 flavors with pushed filters and pre-join cuts" in {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val q9 = Star.profitByNation(t("lineitem"), t("orders"), t("supplier"),
      t("part"), t("nation"), "an")
    q9.collect().length should be >= 1
    val p9 = q9.queryExecution.executedPlan.toString
    withClue(p9) {
      // fixed 25-row nation broadcasts; nothing goes nested-loop
      p9 should include("BroadcastHashJoin")
      p9 should not include "BroadcastNestedLoopJoin"
      p9 should not include "CartesianProduct"
      // the name-substring filter reaches the part scan
      val partScan = p9.linesIterator
        .filter(l => l.contains("part.parquet") && l.contains("PushedFilters"))
        .mkString
      partScan should include("p_name")
    }
    val q21 = Star.loneLateSuppliers(t("lineitem"), t("orders"),
      t("supplier"), lateDays = 90, k = 10)
    val w = q21.collect()
    w.length shouldBe 10
    // ranked by wait count with the suppkey tiebreak
    w.map(_.getLong(2)).toSeq shouldBe w.map(_.getLong(2)).sortBy(-_).toSeq
    val p21 = q21.queryExecution.executedPlan.toString
    withClue(p21) {
      p21 should include("TakeOrderedAndProject")
      p21 should not include "CartesianProduct"
    }
    val q18 = Star.largeOrderCustomers(t("lineitem"), t("orders"),
      t("customer"), minQty = 200.0, k = 20)
    val rows = q18.collect()
    rows.length should be > 0
    rows.length should be <= 20
    all(rows.map(_.getDouble(4))) should be > 200.0
    val p18 = q18.queryExecution.executedPlan.toString
    withClue(p18) {
      // the value-ranked cut is a map-side partial top-k, never a sort
      p18 should include("TakeOrderedAndProject")
      p18 should not include "CartesianProduct"
    }
  }
}
