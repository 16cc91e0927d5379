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

  /** Forecast revenue-change (TPC-H Q6 flavor): the revenue a discount
    * band would have yielded in one shipdate year — the pure scan-side
    * query: every predicate (date window, discount band, quantity cap)
    * pushes to the parquet scan, and the one-row answer is a map-side
    * partial aggregate with nothing to shuffle but 32 partial sums. The
    * discount literals compare against the stored doubles directly (no
    * epsilon): both engines read identical bits and compare against
    * identical literals. */
  def forecastRevenueChange(
      lineitem: DataFrame,
      shipFrom: String,
      shipUntil: String,
      discountLo: Double,
      discountHi: Double,
      qtyBelow: Double
  ): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= Ts.literal(lineitem, "l_shipdate", shipFrom) &&
        col("l_shipdate") < Ts.literal(lineitem, "l_shipdate", shipUntil) &&
        col("l_discount") >= discountLo && col("l_discount") <= discountHi &&
        col("l_quantity") < qtyBelow)
      .agg(
        round(sum((col("l_extendedprice") * col("l_discount")).cast(dec))
          .cast("double"), 2).as("revenue_effect"),
        count(lit(1)).as("n_items"))

  /** Late-shipment priority census (TPC-H Q4 flavor): orders in one
    * orderdate window that had at least one line shipped more than
    * `graceDays` after the order date, counted by priority.
    *
    * The existence test is a LEFT SEMI join — orders never duplicate per
    * matching line, and the probe side carries only (orderkey, shipdate).
    * The equi-key (orderkey) keeps it a hash/merge join at any scale; the
    * lateness comparison rides along as the join residual. */
  def latePriorityCensus(
      lineitem: DataFrame,
      orders: DataFrame,
      orderedFrom: String,
      orderedUntil: String,
      graceDays: Int
  ): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= Ts.literal(orders, "o_orderdate", orderedFrom) &&
        col("o_orderdate") < Ts.literal(orders, "o_orderdate", orderedUntil))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    ord.join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > expr(s"timestampadd(DAY, $graceDays, o_orderdate)"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_orders"))
  }

  /** Bi-national trade volume (TPC-H Q7 flavor): revenue shipped between
    * two named nations (either direction), by supplier nation × customer
    * nation × ship year.
    *
    * Scale shape: the two-row nation slice is broadcast against customer
    * and supplier FIRST, so the sf-scaled dims shrink to the two nations
    * before any fact join — the orderkey/custkey/suppkey shuffles then
    * move only rows that can still qualify. The direction filter is a
    * post-join predicate on two already-carried names. */
  def tradeVolume(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      nationA: String,
      nationB: String,
      shipFrom: String,
      shipUntil: String
  ): DataFrame = {
    val pair = nation.filter(col("n_name").isin(nationA, nationB))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(pair.select(col("n_nationkey"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("cust_nation"))
    val supp = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(pair.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem
      .filter(col("l_shipdate") >= Ts.literal(lineitem, "l_shipdate", shipFrom) &&
        col("l_shipdate") < Ts.literal(lineitem, "l_shipdate", shipUntil))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("ship_year"), revenue.as("rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** National market share (TPC-H Q8 flavor): for one part type sold to
    * one customer region, the fraction of revenue supplied by one nation,
    * per order year. The share is a conditional-sum ratio inside ONE
    * aggregate — never two scans joined back.
    *
    * Scale shape: nation⋈region collapses to a ≤25-row broadcast on the
    * customer side; the supplier-nation name is another ≤25-row broadcast;
    * part is sf-scaled so the partkey join shuffles. Both DECIMAL sums
    * share one partial aggregate, and the ratio divides at the end. */
  def marketShare(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      part: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String,
      suppNation: String,
      partType: String,
      orderedFrom: String,
      orderedUntil: String
  ): DataFrame = {
    val regionNations = broadcast(
      nation.select(col("n_nationkey"), col("n_regionkey"))
        .join(region.filter(col("r_name") === regionName)
          .select(col("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey")))
    val suppNations = broadcast(nation
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val ord = orders
      .filter(col("o_orderdate") >= Ts.literal(orders, "o_orderdate", orderedFrom) &&
        col("o_orderdate") < Ts.literal(orders, "o_orderdate", orderedUntil))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("order_year"))
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revenue.as("rev"))
      .join(part.filter(col("p_type") === partType).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(regionNations, col("c_nationkey") === col("n_nationkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(suppNations, col("s_nationkey") === col("sn_key"))
      .groupBy(col("order_year"))
      .agg(
        round(
          sum(when(col("supp_nation") === suppNation, col("rev"))
            .otherwise(lit(0).cast(dec))).cast("double") /
            sum(col("rev")).cast("double"), 6).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  /** Returned-item revenue losers (TPC-H Q10 flavor): top-k customers by
    * revenue on returned lines for one orderdate quarter. The returnflag
    * filter pushes to the lineitem scan; the ranking cut is a
    * TakeOrderedAndProject over the per-customer aggregate with a
    * custkey tiebreak, so the k rows are deterministic under ties. */
  def returnedItemTopCustomers(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      returnFlag: String,
      orderedFrom: String,
      orderedUntil: String,
      k: Int
  ): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= Ts.literal(orders, "o_orderdate", orderedFrom) &&
        col("o_orderdate") < Ts.literal(orders, "o_orderdate", orderedUntil))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem
      .filter(col("l_returnflag") === returnFlag)
      .select(col("l_orderkey"), revenue.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Customer order-count distribution (TPC-H Q13 flavor): how many
    * customers placed exactly N orders (excluding one priority class),
    * INCLUDING the zero-order customers — which is why the join is LEFT
    * OUTER from customer with the priority filter INSIDE the join
    * condition (a WHERE would silently drop the unmatched rows).
    *
    * Two shuffles: custkey for the outer join + count, then the tiny
    * count-of-counts regroup. The top-100 cut is a TakeOrderedAndProject
    * with a c_count tiebreak. */
  def orderCountDistribution(
      orders: DataFrame,
      customer: DataFrame,
      excludePriority: String
  ): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
      .limit(100)

  /** Small-quantity-order revenue (TPC-H Q17 flavor): for one brand's
    * parts, the annualized revenue of lines whose quantity is under 20%
    * of that part's average quantity.
    *
    * The per-part average is a WINDOW over the partkey-joined frame — the
    * brand join already shuffles on partkey, and the window reuses that
    * partitioning, so the "correlated subquery" costs no extra shuffle
    * (vs the aggregate-and-join-back shape, which re-shuffles the fact). */
  def smallQuantityRevenue(
      lineitem: DataFrame,
      part: DataFrame,
      brand: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(part.filter(col("p_brand") === brand).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        round(sum(col("l_extendedprice").cast(dec)).cast("double") / 7.0, 2)
          .as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Discounted-revenue special (TPC-H Q19 flavor): one scalar revenue
    * over an OR of brand×size×quantity conjunctions.
    *
    * The disjunction cannot push down as-is, so its per-table ENVELOPE is
    * derived and pushed instead: lineitem scans only the overall quantity
    * range, part scans only the brand set and overall size range — then
    * the exact OR-of-ANDs applies after the partkey join. At 100 TB the
    * envelope is what keeps the scan from reading every row group. */
  def specialDiscountRevenue(
      lineitem: DataFrame,
      part: DataFrame,
      cases: Seq[(String, (Int, Int), (Double, Double))]
  ): DataFrame = {
    val qtyLo = cases.map(_._3._1).min
    val qtyHi = cases.map(_._3._2).max
    val sizeLo = cases.map(_._2._1).min
    val sizeHi = cases.map(_._2._2).max
    val li = lineitem
      .filter(col("l_quantity") >= qtyLo && col("l_quantity") <= qtyHi)
      .select(col("l_partkey"), col("l_quantity"), revenue.as("rev"))
    val pt = part
      .filter(col("p_brand").isin(cases.map(_._1): _*) &&
        col("p_size") >= sizeLo && col("p_size") <= sizeHi)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val exact = cases.map { case (b, (sLo, sHi), (qLo, qHi)) =>
      col("p_brand") === b &&
        col("p_size") >= sLo && col("p_size") <= sHi &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    }.reduce(_ || _)
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(exact)
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Dormant high-balance customers (TPC-H Q22 flavor): customers whose
    * balance beats the positive-balance average and who placed no order
    * since a cutoff, grouped by nation.
    *
    * The average is a 1-row aggregate broadcast back (never a window over
    * all customers); the "no recent order" test is a LEFT ANTI join on
    * custkey against the date-filtered orders — the filter pushes to the
    * orders scan, so the anti join's build side shrinks first. */
  def dormantHighBalance(
      customer: DataFrame,
      orders: DataFrame,
      nation: DataFrame,
      orderedSince: String
  ): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recent = orders
      .filter(col("o_orderdate") >= Ts.literal(orders, "o_orderdate", orderedSince))
      .select(col("o_custkey"))
    customer.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal").cast(dec)).cast("double"), 2).as("totacctbal"))
  }

  /** Pricing summary by returnflag/linestatus (TPC-H Q1 flavor): the
    * single-fact rollup — one shuffle on the two grouping columns,
    * everything else map-side partials over the scan. */
  /** Product-line profit by supplier nation and order year (TPC-H Q9
    * flavor, adapted to this schema: there is no partsupp table, so unit
    * cost is modeled as 60% of `p_retailprice`). The part-name substring
    * filter pushes to the part scan; nation broadcasts (fixed 25 rows);
    * part, supplier and orders are sf-scaled and join by shuffle; the
    * profit expression folds in DECIMAL before the one (nation, year)
    * aggregate shuffle. */
  def profitByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      supplier: DataFrame,
      part: DataFrame,
      nation: DataFrame,
      namePattern: String
  ): DataFrame = {
    val p = part.filter(col("p_name").contains(namePattern))
      .select(col("p_partkey"), col("p_retailprice"))
    val profit = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")).cast(dec)
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
          col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(round(sum(profit).cast("double"), 2).as("sum_profit"),
        count(lit(1)).as("n_items"))
  }

  /** Large-volume orders and who placed them (TPC-H Q18 flavor): orders
    * whose line quantities total past `minQty`, top-k by order value.
    * The per-order quantity rollup is one map-side-combinable groupBy
    * on the fact's own key; the HAVING filter drops almost everything
    * BEFORE the joins; the cut is a TakeOrderedAndProject with an
    * orderkey tiebreak. */
  def largeOrderCustomers(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      minQty: Double,
      k: Int
  ): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec)).as("__qty"))
      .filter(col("__qty") > minQty)
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      // rank on the RAW price (rounding only in the output projection, so
      // near-tie orders can never flip rank against an external replay)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("__qty").cast("double"), 2).as("total_qty"))
  }

  /** Suppliers who ALONE held up multi-supplier orders (TPC-H Q21
    * flavor, adapted: "late" is shipping more than `lateDays` after the
    * order date — this schema has no commit/receipt dates). The
    * exists/not-exists pair becomes ONE per-order aggregate (distinct
    * suppliers, distinct LATE suppliers), so the whole census is two
    * hash aggregates and an equi-join — no correlated subqueries, no
    * double fact scan; the cut is a TakeOrderedAndProject. */
  def loneLateSuppliers(
      lineitem: DataFrame,
      orders: DataFrame,
      supplier: DataFrame,
      lateDays: Int,
      k: Int
  ): DataFrame = {
    val l = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("late"))
    // ONE pass over the fact join (r14 optimization round — the old
    // shape evaluated `l` twice: once into the per-order census, once
    // into the late-pair leg joined back against it): reduce to distinct
    // (order, supplier) pairs with an any-late flag, then answer the
    // census with a WINDOW over the same order key — the window reuses
    // the aggregation's partitioning (no extra exchange), and the
    // qualifying late pairs fall out of the same rows the census read.
    val pairs = l.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("late"), lit(1)).otherwise(lit(0))).as("__late"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
    pairs
      .withColumn("__ns", count(lit(1)).over(w))
      .withColumn("__nl", sum(col("__late")).over(w))
      .filter(col("__ns") > 1 && col("__nl") === 1 && col("__late") === 1)
      .groupBy(col("l_suppkey"))
      // pairs are unique per (order, supplier), so the per-supplier row
      // count IS the distinct-order count
      .agg(count(lit(1)).as("numwait"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(k)
  }

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
