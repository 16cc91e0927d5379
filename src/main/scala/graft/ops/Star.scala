package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classic star-schema OLAP over the TPC-H-ish tables — the multi-table
  * join-chain family (fact ⋈ fact ⋈ dimensions → grouped rollup) that
  * every analytics engine is judged on, expressed the way Catalyst wants
  * it:
  *
  *  - Filters sit directly on the base scans so they PUSH DOWN to parquet
  *    (`PushedFilters` on the orders/lineitem scans) and prune columns at
  *    the source — the fact tables never carry unused columns through a
  *    shuffle.
  *  - The two fact tables join on their natural key (orderkey) as a
  *    shuffle join — at 100 TB both sides are huge and co-partitioning on
  *    the join key is the only shape that scales; AQE picks the physical
  *    strategy and handles skew.
  *  - Tiny dimensions (nation: 25 rows, region: 5 — FIXED size at any
  *    scale factor) are explicitly `broadcast()`: the probe side never
  *    shuffles for them. Customer is sf-scaled so it joins by shuffle on
  *    custkey — broadcasting it would OOM a 100 TB driver.
  *  - Money sums route through DECIMAL(18,6) (partial-aggregation-order
  *    independent — double addition is not associative), and aggregation
  *    is declared AFTER the joins so Catalyst's partial-aggregate pass
  *    combines map-side.
  */
object Star {

  private val dec = DecimalType(18, 6)
  private def revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast(dec)

  /** Revenue by customer nation inside a shipdate window (TPC-H Q5
    * flavor): lineitem ⋈ orders ⋈ customer ⋈ nation, nation broadcast,
    * both fact filters pushed to the scans. */
  def revenueByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      shipFrom: String,
      shipUntil: String
  ): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= Ts.literal(lineitem, "l_shipdate", shipFrom) &&
        col("l_shipdate") < Ts.literal(lineitem, "l_shipdate", shipUntil))
      .select(col("l_orderkey"), revenue.as("rev"))
    li.join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("rev")).cast("double"), 2).as("revenue"))
  }

  /** Top-k open orders by accumulated revenue for one market segment
    * (TPC-H Q3 flavor): the ranking cut is a TakeOrderedAndProject over
    * the per-order aggregate — never a global sort of the fact join. */
  def topOrdersBySegment(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      segment: String,
      orderedBefore: String,
      shippedAfter: String,
      k: Int
  ): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders
      .filter(col("o_orderdate") < Ts.literal(orders, "o_orderdate", orderedBefore))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = lineitem
      .filter(col("l_shipdate") > Ts.literal(lineitem, "l_shipdate", shippedAfter))
      .select(col("l_orderkey"), revenue.as("rev"))
    val ranked = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("order_revenue"))
      .orderBy(col("order_revenue").desc, col("o_orderkey"))
      .limit(k)
    ranked.select(col("o_orderkey"),
      Ts.millis(ranked, "o_orderdate").as("orderdate_ms"),
      col("o_orderpriority"), col("order_revenue"))
  }

  /** Pricing summary by returnflag/linestatus (TPC-H Q1 flavor): the
    * single-fact rollup — one shuffle on the two grouping columns,
    * everything else map-side partials over the scan. */
  def pricingSummary(lineitem: DataFrame, shipUntil: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= Ts.literal(lineitem, "l_shipdate", shipUntil))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast(dec)).cast("double"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast(dec)).cast("double"), 2)
          .as("sum_base_price"),
        round(sum(revenue).cast("double"), 2).as("sum_disc_price"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).cast(dec)).cast("double"), 2)
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
}
