package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Owner handle for the intermediate frames an operator persists on behalf
  * of its (lazy) returned DataFrame — `Ingest.QuarantinedRead`'s unpersist
  * contract generalized to the ops that cache internally (gap fill, MAD
  * gate, MinHash signatures, kNN edges, triangle edges, LM vocab).
  *
  * Operators take a `scope` parameter defaulting to a fresh throwaway
  * scope, which keeps the fire-and-forget behavior that is right for the
  * harness's one-shot JVMs. A long-lived session passes its own scope and
  * calls [[release]] once the result is materialized (written/counted),
  * returning the executor memory instead of pinning it for the session.
  *
  * Releasing BEFORE the returned frame's action only costs recomputation,
  * never correctness: every intermediate cached through a scope is
  * deterministic under recompute (DECIMAL-routed sums, explicit total
  * orders) — unlike `QuarantinedRead.quarantine`, which is the one cache
  * whose release changes what is legal to re-run (see its scaladoc).
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK — spill, don't recompute) and remember
    * it for [[release]]. */
  private[graft] def cache(df: DataFrame): DataFrame = synchronized {
    frames += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every frame this scope persisted. Idempotent. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }

  /** Frames still pinned through this scope (for leak checks in specs). */
  def cachedCount: Int = synchronized {
    frames.count(_.storageLevel != StorageLevel.NONE)
  }
}
