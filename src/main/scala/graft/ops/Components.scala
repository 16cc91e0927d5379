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
    val sym = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .localCheckpoint()

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
}
