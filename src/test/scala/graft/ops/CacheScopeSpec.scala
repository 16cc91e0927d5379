package graft.ops

import graft.plug.TestSpark
import org.apache.spark.storage.StorageLevel
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Cache-lifecycle contract: every op that persists an intermediate on
  * behalf of its returned frame takes a [[CacheScope]]; releasing the
  * scope returns the memory, and the default throwaway scope keeps the
  * old one-shot-JVM behavior. */
class CacheScopeSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap at all"))
    .toDF("id", "text")

  behavior of "CacheScope"

  it should "pin intermediates while in scope and release them on demand" in {
    val scope = new CacheScope
    val out = Dedup.minhashNearDupPairs(docs, "id", "text", scope = scope)
    out.count()
    scope.cachedCount should be > 0
    scope.release()
    scope.cachedCount shouldBe 0
    // released result stays correct — recompute, not corruption
    Dedup.minhashNearDupPairs(docs, "id", "text").count() shouldBe out.count()
  }

  it should "scope the gap-fill aggregate and stay correct after release" in {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), "a", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val scope = new CacheScope
    val filled = EventOps.gapFill(ev, "event_type", "ts", "value", 3600000L, scope)
    filled.count() shouldBe 4L // hours 0..3 densified
    scope.cachedCount shouldBe 1
    scope.release()
    scope.cachedCount shouldBe 0
    filled.count() shouldBe 4L // post-release action recomputes, same rows
  }

  it should "be idempotent on release and chain through composite ops" in {
    val scope = new CacheScope
    // lshRecallEval threads its scope into the inner minhashNearDupPairs —
    // one release must drain BOTH layers' caches
    Dedup.lshRecallEval(docs, "id", "text", scope = scope).count()
    scope.cachedCount should be > 1
    scope.release()
    scope.release() // idempotent
    scope.cachedCount shouldBe 0
  }

  behavior of "percentile exactness switch"

  private def vals = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
    ("b", 10.0), ("b", 20.0), ("b", 30.0))
    .toDF("k", "v")

  it should "match exact and approx p50 in valueProfile on small keys" in {
    // at n << accuracy the GK sketch is exact, so both modes agree —
    // the switch changes memory posture, not small-data results
    val exact = EventOps.valueProfile(vals, "k", "v")
      .orderBy("k").collect()
    val approx = EventOps.valueProfile(vals, "k", "v", exact = false)
      .orderBy("k").collect()
    exact.map(_.getLong(1)) shouldBe approx.map(_.getLong(1)) // n
    // exact interpolates (median of 8 values averages the middle pair);
    // the sketch returns a data value — both must be the true middle
    // region, and for odd-count key "a" they agree exactly
    exact.head.getDouble(7) shouldBe 3.0
    approx.head.getDouble(7) shouldBe 3.0
    exact.last.getDouble(7) shouldBe 20.0
    approx.last.getDouble(7) shouldBe 20.0
  }

  it should "keep the quantileProfile schema across modes, gates vacuous when approx" in {
    val exact = EventOps.quantileProfile(vals, "k", "v")
    val approx = EventOps.quantileProfile(vals, "k", "v", exact = false)
    approx.schema.fieldNames shouldBe exact.schema.fieldNames
    approx.schema("p50").dataType shouldBe exact.schema("p50").dataType
    val r = approx.orderBy("k").collect()
    all(r.map(_.getBoolean(4))) shouldBe true // ok_p50 vacuous
    r.head.getDouble(2) shouldBe 3.0 // sketch p50 of key a
  }

  it should "gate outliers identically in both madOutlierGate modes on small keys" in {
    val scope = new CacheScope
    val exact = EventOps.madOutlierGate(vals, "k", "v").orderBy("k").collect()
    val approx = EventOps
      .madOutlierGate(vals, "k", "v", exact = false, scope = scope)
      .orderBy("k").collect()
    exact.map(_.getLong(4)) shouldBe approx.map(_.getLong(4)) // n_outliers
    exact.head.getLong(4) shouldBe 1L // the 100.0 spike in key a
    scope.release()
    scope.cachedCount shouldBe 0
  }
}
