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

  /** Local-supplier volume (TPC-H Q5 flavor): revenue by nation where the
    * ordering customer and the supplying supplier share a nation, inside
    * one region and one orderdate window.
    *
    * Scale shape: nation⋈region collapse to ONE broadcast frame (≤25 rows
    * at any scale factor, filtered to the region before broadcast), so the
    * only shuffles are the three fact-side equi-joins (orderkey, custkey,
    * suppkey). The local-supplier constraint (`c_nationkey = s_nationkey`)
    * is a post-join filter on two already-carried ints — never a join
    * condition that would force a nation-keyed repartition. */
  def localSupplierVolume(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String,
      orderedFrom: String,
      orderedUntil: String
  ): DataFrame = {
    val regionNations = broadcast(
      nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .join(region.filter(col("r_name") === regionName)
          .select(col("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val ord = orders
      .filter(col("o_orderdate") >= Ts.literal(orders, "o_orderdate", orderedFrom) &&
        col("o_orderdate") < Ts.literal(orders, "o_orderdate", orderedUntil))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(regionNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Promotion revenue share (TPC-H Q14 flavor): what fraction of one
    * shipdate window's revenue came from promo-typed parts. One scalar
    * row; the part join shuffles on partkey (part is sf-scaled — at
    * 100 TB it cannot broadcast), the conditional sum folds into the same
    * partial aggregate as the total. The final ratio divides two DECIMAL
    * sums, so the result is partial-aggregation-order independent. */
  def promoRevenueShare(
      lineitem: DataFrame,
      part: DataFrame,
      promoType: String,
      shipFrom: String,
      shipUntil: String
  ): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= Ts.literal(lineitem, "l_shipdate", shipFrom) &&
        col("l_shipdate") < Ts.literal(lineitem, "l_shipdate", shipUntil))
      .select(col("l_partkey"), revenue.as("rev"))
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round((lit(100.0) *
          sum(when(col("p_type") === promoType, col("rev")).otherwise(lit(0).cast(dec)))
            .cast("double") /
          sum(col("rev")).cast("double")), 4).as("promo_share_pct"),
        count(lit(1)).as("n_items"))

  /** Top supplier(s) by revenue in a shipdate window (TPC-H Q15 flavor).
    * Two-phase max: the per-supplier aggregate (one shuffle on suppkey)
    * feeds a 1-row global-max frame that is broadcast BACK against the
    * same aggregate — never a single-partition window over all suppliers
    * — then the ≤#ties winners join the supplier dim for names. Ties all
    * surface, matching the reference semantics of a `= (SELECT max …)`
    * subquery. */
  def topSupplier(
      lineitem: DataFrame,
      supplier: DataFrame,
      shipFrom: String,
      shipUntil: String
  ): DataFrame = {
    val perSupp = lineitem
      .filter(col("l_shipdate") >= Ts.literal(lineitem, "l_shipdate", shipFrom) &&
        col("l_shipdate") < Ts.literal(lineitem, "l_shipdate", shipUntil))
      .select(col("l_suppkey"), revenue.as("rev"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev")).as("total_rev"))
    val maxRev = perSupp.agg(max(col("total_rev")).as("max_rev"))
    perSupp.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_rev").cast("double"), 2).as("total_revenue"))
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
