package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup verdicts into an actual corpus-dedup decision
  * (cluster → keep one representative per cluster).
  *
  * Design for 100 TB:
  *  - Min-label propagation: each round is ONE shuffle (propagate labels
  *    across edges, then a map-side-combinable `min` aggregate). Rounds =
  *    O(component diameter); near-dup clusters are stars/cliques from
  *    banding buckets, so diameter is small (3–5 rounds in practice). For
  *    adversarial long-chain graphs swap in large-star/small-star
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  *    which keeps the identical per-round shuffle shape in O(log n) rounds.
  *  - Every round ends in `localCheckpoint` — without it the iterative plan
  *    doubles per round, analysis cost grows quadratically, and a mid-job
  *    failure at round k replays every previous round's shuffles.
  *  - The driver loop carries only a scalar per round (the changed-label
  *    count, read from one action on the label frame); labels themselves
  *    never leave the cluster.
  *  - Labels are vertex-id minima, so the result is deterministic for any
  *    partitioning, execution order, or engine — exact-oracle-checkable.
  */
object Components {

  /** Both directions of an undirected edge list, materialized so the
    * (often expensive — e.g. a full MinHash banding pipeline) upstream
    * edge computation runs ONCE: the one-direction frame is checkpointed
    * first, and the union reads its blocks twice instead of executing
    * the pipeline twice. */
  private def symmetrized(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val once = edges.select(col(srcCol).as("s"), col(dstCol).as("d")).localCheckpoint()
    once.union(once.select(col("d").as("s"), col("s").as("d"))).localCheckpoint()
  }

  /** Assigns every vertex the minimum vertex id reachable from it in the
    * undirected graph given by `edges`. Returns (`idCol`, "component").
    *
    * `edges` rows are undirected pairs (each pair listed once; symmetry is
    * added internally). Vertices absent from `edges` keep their own id as
    * the component — pass the FULL vertex set so singletons are covered. */
  def connectedComponents(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25
  ): DataFrame = {
    val sym = symmetrized(edges, srcCol, dstCol)

    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // Propagate each vertex's label to its neighbors, then take the min
      // of (own label, neighbor labels) per vertex. Partial `min` combines
      // map-side, so the shuffle carries one row per (vertex, distinct
      // incoming label) at most. The convergence check rides the SAME
      // aggregate: each vertex has exactly one own-label row, so
      // min(own-only) recovers the previous label and `new < old` is the
      // per-vertex changed flag — no extra join per round, and counting
      // the flags is a cheap scan of the just-checkpointed blocks.
      val own = labels.select(col("id"), col("component"), lit(true).as("own"))
      val propagated = sym
        .join(labels.withColumnRenamed("id", "s"), "s")
        .select(col("d").as("id"), col("component"), lit(false).as("own"))
      val next = own.union(propagated)
        .groupBy("id").agg(
          min("component").as("component"),
          min(when(col("own"), col("component"))).as("__old"))
        .localCheckpoint()
      changed = next.filter(col("component") < col("__old")).count()
      labels = next.drop("__old")
      it += 1
    }
    labels.withColumnRenamed("id", idCol)
  }

  /** Dedup clustering over verified near-dup pairs: every document gets the
    * cluster id (minimum doc id of its duplicate cluster) and a keeper flag
    * (true for the one representative the corpus retains). */
  def dedupClusters(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String
  ): DataFrame =
    connectedComponents(docs, idCol, pairs, aCol, bCol)
      .select(col(idCol), col("component").as("cluster_id"),
        (col(idCol) === col("component")).as("is_keeper"))

  /** Fixed-iteration PageRank over an undirected pair graph — node
    * centrality for duplicate-cluster triage (which copy is the "hub" of
    * a near-dup family) and general graph analytics over derived edges.
    *
    * Convention is GraphX's static PageRank: init 1.0, then
    * `pr' = (1−d) + d·Σ pr(in)/deg(in)` for exactly `iterations` rounds,
    * no dangling-mass redistribution — vertices without edges settle at
    * (1−d). Each round is the [[connectedComponents]] shuffle shape: one
    * equi-join on the source plus one map-side-combinable aggregate on
    * the destination, ended with `localCheckpoint` so the iterative plan
    * cannot snowball. Only the loop counter lives on the driver.
    *
    * Determinism across engines and partitionings: the per-edge
    * contribution `pr/deg` is an IEEE double both engines compute
    * identically, but SUMMING doubles is order-dependent — so each
    * contribution is cast to DECIMAL(28,15) and the sum is exact decimal
    * arithmetic, then one cast back. The oracle replays the recurrence
    * bit-for-bit. */
  def pageRank(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85
  ): DataFrame = {
    val sym = symmetrized(edges, srcCol, dstCol)
    val deg = sym.groupBy("s").agg(count(lit(1)).as("deg")).localCheckpoint()
    var pr = vertices.select(col(idCol).as("id"), lit(1.0).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = sym
        .join(deg, "s")
        .join(pr.withColumnRenamed("id", "s"), "s")
        .select(col("d").as("id"),
          (col("pr") / col("deg"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 15)).as("c"))
      pr = pr.select(col("id"))
        .join(contribs.groupBy("id").agg(sum(col("c")).as("cs")), Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("cs").cast("double"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("id").as(idCol), round(col("pr"), 6).as("pagerank"))
  }

  /** Triangle count + global clustering coefficient over an undirected
    * graph given as CANONICAL edges (src < dst, no self-loops, no
    * duplicates — what the near-dup pair generators emit). One row:
    * edge/triangle/wedge counts and 3·T / wedges.
    *
    * Scale shape: edges are oriented from their lower-(degree, id)
    * endpoint before the wedge join — a total order, so the orientation is
    * acyclic and every triangle has exactly ONE vertex with two out-edges
    * into the other two (counted once, no post-hoc dedup), and out-degrees
    * are bounded by O(√m), which is what keeps the wedge self-join from
    * exploding on hub vertices (the standard degree-ordered triangle
    * count). Everything else is equi-joins on vertex ids and 1-row
    * aggregates; nothing touches the driver. */
  def triangleStats(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      scope: CacheScope = new CacheScope
  ): DataFrame = {
    // edges feed the degree count, the orientation join, the wedge-closing
    // probe and the edge-count aggregate — scope-owned cache
    val e = scope.cache(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    val fromU = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = ed.select(
      when(fromU, col("u")).otherwise(col("v")).as("s"),
      when(fromU, col("v")).otherwise(col("u")).as("t"))
    // wedge: two out-neighbors of one source; t1 < t2 keeps the closing
    // edge in canonical form so it probes the edge set directly
    val cand = oriented.select(col("s"), col("t").as("t1"))
      .join(oriented.select(col("s"), col("t").as("t2")), "s")
      .filter(col("t1") < col("t2"))
    val nTri = cand
      .join(e.select(col("u").as("t1"), col("v").as("t2")), Seq("t1", "t2"))
      .agg(count(lit(1)).as("n_triangles"))
    val nEdge = e.agg(count(lit(1)).as("n_edges"))
    val nWedge = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    nEdge.crossJoin(broadcast(nTri)).crossJoin(broadcast(nWedge))
      .select(col("n_edges"), col("n_triangles"),
        coalesce(col("n_wedges"), lit(0L)).as("n_wedges"),
        round(when(coalesce(col("n_wedges"), lit(0L)) === 0L, 0.0)
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")), 6)
          .as("global_cc"))
  }

  /** Semi-supervised label propagation over a DIRECTED bounded-degree
    * graph (e.g. the committed kNN graph the ANN queries navigate):
    * spread sparse seed labels to the unlabeled majority — the cheap way
    * to scale a small human-labeled quality/topic set to corpus size.
    *
    * Per round, every node adopts the plurality label among its
    * out-neighbors' previous-round labels (count desc, then own-label
    * flag, then smallest label — fully deterministic, exact-integer
    * ranking); nodes with NO labeled neighbor keep their previous label
    * (the self-loop fallback), and seed nodes stay clamped to their seed
    * label. Rounds chain LAZILY into one plan: the graph is augmented
    * with weight-0 self-loops so each round references the previous
    * label frame EXACTLY ONCE (a second own-label join would double the
    * plan tree per round), and the ranking is a per-node window over a
    * bounded-degree candidate set, so per-round state is O(degree) per
    * node and each round is one join + one aggregate shuffle.
    *
    * `nodes` must carry every vertex with a nullable seed label;
    * `edges` are directed (src adopts from dst). Returns (`idCol`,
    * "label") after `rounds` rounds — nodes never reached by any label
    * stay null. */
  def labelPropagate(
      nodes: DataFrame,
      idCol: String,
      labelCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int = 3
  ): DataFrame = {
    val edgesAug = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        lit(1L).as("w"))
      .unionByName(nodes.select(col(idCol).as("src"), col(idCol).as("dst"),
        lit(0L).as("w")))
    val seeds = nodes.select(col(idCol).as("id"), col(labelCol).as("slabel"))
    val byNode = org.apache.spark.sql.expressions.Window
      .partitionBy("src")
      .orderBy(col("cnt").desc, col("own").desc, col("label").asc)
    var prev = seeds.select(col("id"), col("slabel").as("label"))
    for (_ <- 1 to rounds) {
      val cand = edgesAug
        .join(prev.select(col("id").as("dst"), col("label")), "dst")
        .filter(col("label").isNotNull)
        .groupBy(col("src"), col("label"))
        .agg(sum(col("w")).as("cnt"),
          max(when(col("w") === 0L, 1).otherwise(0)).as("own"))
      val picked = cand.withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("src").as("id"), col("label").as("plabel"))
      prev = seeds.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("slabel"), col("plabel")).as("label"))
    }
    prev.select(col("id").as(idCol), col("label"))
  }
}
