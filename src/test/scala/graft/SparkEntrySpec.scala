package graft

import graft.plug.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Guards on the driver contract itself — the harness the correctness gate
  * runs through, so a wiring mistake here silently weakens every check. */
class SparkEntrySpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  behavior of "SparkEntry"

  it should "provide an oracle for every query (and no orphan oracles)" in {
    // The driver records a weaker rows-only check for queries without an
    // oracle; keeping the sets equal means every operator stays on the
    // strong hash-match gate. An oracle without a query is dead SQL.
    SparkEntry.queries.keySet shouldBe SparkEntry.oracleSql.keySet
  }

  it should "smoke the flagship entry on sf0.001" in {
    SparkEntry.entry(spark).count() should be > 0L
  }

  it should "assign injective initials abbreviations for the bench line" in {
    // Stage 5 of the bench degrade chain compresses names to
    // prefix + token initials; an abbrev collision would silently merge
    // two queries' times in the emitted JSON object.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val m = Bench.initialsAbbrev(names)
    m.keySet shouldBe names.toSet
    m.values.toSeq.distinct.size shouldBe names.size
    m("dedup_ngram_jaccard") shouldBe "dd_nj"
    // collision pairs resolve deterministically by lengthening per-token
    m("docs_pack_seqs") shouldBe "dc_pase"
    m("docs_part_sink") shouldBe "dc_pasi"
    m("events_cohort") shouldBe "ev_coh"
    m("events_conversion") shouldBe "ev_con"
  }

  it should "keep bench abbreviations unique even for unresolvable names" in {
    // docs_ab can never win an initials abbrev: dc_ab is taken by
    // docs_a_b at level 1 and docs_ab's sole token caps at "ab". The
    // fallback must not emit the colliding short form dc_ab — a duplicate
    // JSON key would silently merge two queries' bench times.
    val m = Bench.initialsAbbrev(Seq("docs_a", "docs_ab", "docs_a_b").sorted)
    m.values.toSeq.distinct.size shouldBe 3
    m("docs_ab") shouldBe "docs_ab" // full name, not the taken dc_ab
  }

  it should "keep the stage-5 bench line under budget at 120 queries" in {
    // The driver parses the bench JSON from a ~2000-char tail window.
    // Stage 5 (initials + 1-decimal times) is DESIGNED to hold decimal
    // precision to ~120 queries under pessimistic 4-char times; past
    // that the chain's stage 6 takes over (next test). Pin the designed
    // guarantee at exactly 120 names (truncate or pad the live set).
    val names = SparkEntry.queries.keys.toSeq.sorted
    val at120 =
      if (names.size >= 120) names.take(120)
      else names ++ (names.size until 120).map(i => s"text_future_query_$i")
    val m = Bench.initialsAbbrev(at120)
    m.values.toSeq.distinct.size shouldBe at120.size
    val qs = at120.map(n => "\"" + m(n) + "\":88.8").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":8888.88,"unit":"sec","queries":$qs,"failed":[],"levels":"0x88,1x888,2x888,3x888,4x888,5x888","warmup_sec":8888,"spent_sec":8888,"sf":"/root/testdata/sf0.1"}"""
    withClue(s"projected stage-5 line length ${line.length}: ") {
      line.length should be < 1850
    }
  }

  it should "keep the stage-6 bench line under budget at 135 queries" in {
    // Whole-second times, empty failed omitted — designed to hold to
    // ~135 queries with pessimistic 3-char times (the always-on ladder
    // fields cost ~5 queries of headroom); past that stage 7's
    // single-letter prefixes take over (next test). Pin the designed
    // guarantee at exactly 140 names (truncate or pad the live set).
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (names0.size >= 135) names0.take(135)
      else names0 ++ (names0.size until 135).map(i => s"text_future_query_$i")
    val m = Bench.initialsAbbrev(names)
    val qs = names.map(n => "\"" + m(n) + "\":888").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":8888.88,"unit":"sec","queries":$qs,"levels":"0x88,1x888,2x888,3x888,4x888,5x888","warmup_sec":8888,"spent_sec":8888,"sf":"/root/testdata/sf0.1"}"""
    withClue(s"projected stage-6 line length ${line.length} at ${names.size} queries: ") {
      line.length should be < 1850
    }
  }

  it should "keep the stage-7 bench line under budget at 155 queries" in {
    // Single-letter family prefixes, whole-second times, empty failed
    // omitted — designed to hold to ~155 queries (ladder fields cost
    // ~5 of headroom); past that stage 8's
    // sorted-list ordinals take over (next test). Pin the designed
    // guarantee at exactly 160 names (truncate or pad the live set).
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (names0.size >= 155) names0.take(155)
      else names0 ++ (names0.size until 155).map(i => s"text_future_query_$i")
    val m = Bench.initialsAbbrev(names, Bench.tightAbbrev)
    m.values.toSeq.distinct.size shouldBe names.size // still injective
    val qs = names.map(n => "\"" + m(n) + "\":888").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":8888.88,"unit":"sec","queries":$qs,"levels":"0x88,1x888,2x888,3x888,4x888,5x888","warmup_sec":8888,"spent_sec":8888,"sf":"/root/testdata/sf0.1"}"""
    withClue(s"projected stage-7 line length ${line.length} at ${names.size} queries: ") {
      line.length should be < 1800
    }
  }

  it should "keep the stage-8 bench line under budget at 185 queries" in {
    // Base-36 ordinals with pessimistic 3-char times at the stage's
    // DESIGNED size (the live set has outgrown it — stage 9 guards the
    // full set); the mapping must be injective and decodable by
    // re-sorting the query list.
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (names0.size >= 185) names0.take(185)
      else names0 ++ (names0.size until 185).map(i => s"text_future_query_$i")
    val m = Bench.ordinalAbbrev(names)
    m.values.toSeq.distinct.size shouldBe names.size
    names.zipWithIndex.foreach { case (n, i) =>
      java.lang.Long.parseLong(m(n), 36) shouldBe i.toLong // reversible
    }
    val qs = names.map(n => "\"" + m(n) + "\":888").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":8888.88,"unit":"sec","queries":$qs,"levels":"0x88,1x888,2x888,3x888,4x888,5x888","warmup_sec":8888,"spent_sec":8888,"sf":"/root/testdata/sf0.1"}"""
    withClue(s"projected stage-8 line length ${line.length} at ${names.size} queries: ") {
      line.length should be < 1800
    }
  }

  it should "keep the stage-9 bench line parseable for the full live set" in {
    // Last-resort stage: sub-half-second passing queries leave the map,
    // so the line's length is bounded by the SLOW-query count (which the
    // 2x bench gate bounds), not the set size. Pessimistic projection: 80
    // slow queries at 3-char times plus a 10-name failed list must parse
    // no matter how large the registered set grows.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val m = Bench.ordinalAbbrev(names)
    val slow = names.take(80)
    val qs = slow.map(n => "\"" + m(n) + "\":888").mkString("{", ",", "}")
    val failed = names.takeRight(10).map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":8888.88,"unit":"sec","queries":$qs,"failed":$failed,"levels":"0x88,1x888,2x888,3x888,4x888,5x888","warmup_sec":8888,"spent_sec":8888,"sf":"/root/testdata/sf0.1"}"""
    withClue(s"projected stage-9 line length ${line.length} with 80 slow of ${names.size} queries: ") {
      line.length should be < 1800
    }
  }

  it should "plan the round-5 operators with their claimed shuffle shapes" in {
    // Each claim here is one the scaladocs make about 100 TB posture; a
    // regression that adds an exchange or a cartesian product should fail
    // a test, not a bench read.
    def plan(n: String) =
      SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
    def exchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).size
    // rollup: Expand feeding ONE hash-agg shuffle
    val rollup = plan("events_rollup")
    withClue(rollup) {
      rollup should include ("Expand")
      exchanges(rollup) shouldBe 1
    }
    // sliding rate: one user shuffle, no join
    val rate = plan("events_rate_window")
    withClue(rate) {
      exchanges(rate) shouldBe 1
      rate should not include "Join"
    }
    // merge upsert: single key shuffle with the map-side group limit
    val merge = plan("docs_merge_upsert")
    withClue(merge) {
      merge should include ("WindowGroupLimit")
      exchanges(merge) shouldBe 1
    }
    // kNN graph: LSH equi-join candidates — never a cartesian product —
    // with the bounded per-node top-k
    val knn = plan("sim_knn_graph")
    withClue(knn) {
      knn should include ("WindowGroupLimit")
      knn should not include "CartesianProduct"
    }
    // prefix screen: candidates join on the blocking key, no cartesian
    val prefix = plan("dedup_prefix")
    withClue(prefix) { prefix should not include "CartesianProduct" }
    // interpolated LM: the corpus-sized bigram table must never be the
    // build side of a broadcast join
    val lm = plan("text_interp_lm")
    withClue(lm) { lm should include ("ShuffledHashJoin [bg") }
    // pivot: ONE conditional-aggregation pass — a single day shuffle, no
    // Expand, no join (the .pivot two-stage shape would add an aggregate)
    val pivot = plan("events_pivot")
    withClue(pivot) {
      exchanges(pivot) shouldBe 1
      pivot should not include "Expand"
      pivot should not include "Join"
    }
    // attribution: one user shuffle + in-partition sort, no join
    val attr = plan("events_attribution")
    withClue(attr) {
      exchanges(attr) shouldBe 1
      attr should not include "Join"
    }
    // sequence mining: the global cut is TakeOrderedAndProject (per-
    // partition heads), never a full sort of the count table
    val seqs = plan("events_top_sequences")
    withClue(seqs) { seqs should include ("TakeOrderedAndProject") }
    // decontamination: the benchmark gram set is the BROADCAST side of the
    // semi-join; the training side never shuffles for the probe
    val decon = plan("text_contam_ngram")
    withClue(decon) { decon should include ("BroadcastHashJoin") }
    // star rollup: the fixed-size nation dim broadcasts, the shipdate
    // window reaches the lineitem scan as pushed filters, and no join
    // degenerates to a cartesian product
    val star = plan("star_revenue_by_nation")
    withClue(star) {
      star should include ("BroadcastHashJoin")
      star should not include "CartesianProduct"
      "PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\]".r.findFirstIn(star)
        .getOrElse("") should include ("GreaterThanOrEqual")
    }
    // top-orders: the k-cut is TakeOrderedAndProject over the per-order
    // aggregate, never a global sort of the fact join
    val topo = plan("star_top_orders")
    withClue(topo) { topo should include ("TakeOrderedAndProject") }
  }

  it should "prune unused columns all the way into the parquet scan" in {
    // text_token_stats touches only (doc_id, text); documents also carries
    // lang/source/n_chars. If the projection doesn't reach the scan, every
    // query pays full-width reads at 100 TB.
    val plan = SparkEntry.queries("text_token_stats")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    withClue(readSchema) {
      readSchema should include ("doc_id")
      readSchema should include ("text")
      readSchema should not include "n_chars"
      readSchema should not include "source"
    }
  }

  it should "plan per-group top-k with a partial window group limit" in {
    // rank <= 5 must become a map-side WindowGroupLimit (partial top-k per
    // partition BEFORE the exchange) — at 100 TB the alternative is a full
    // sort of every group.
    val plan = SparkEntry.queries("docs_topk_by_lang")(spark, sf)
      .queryExecution.executedPlan.toString
    withClue(plan) { plan should include ("WindowGroupLimit") }
  }

  it should "push partition-key filters into the scan for plug queries" in {
    // The rule engine is a projection chain: a caller's filter below it
    // must still reach PushedFilters in the parquet scan.
    val df = SparkEntry.queries("plug_flat_override")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === 42L)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    withClue(plan) { pushed should include ("l_orderkey") }
  }
}
