package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Round-6 operators: duplicated-span profile, containment screen,
  * Count-Min gate, hopping windows. */
class SpanSketchSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "dupSpanProfile"

  it should "flag spans recurring across documents and zero short docs" in {
    // docs 1 and 2 share their full 8-token prefix; doc 3 is unique;
    // doc 4 is too short for any 8-gram
    val docs = Seq(
      Doc(1, "a b c d e f g h unique1 tail1", "s"),
      Doc(2, "a b c d e f g h unique2 tail2", "s"),
      Doc(3, "q r s t u v w x y z", "s"),
      Doc(4, "too short", "s")).toDS.toDF()
    val out = Corpus.dupSpanProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe Array(
      (1L, 3L, 1L), // 10 tokens -> 3 spans; only the shared prefix recurs
      (2L, 3L, 1L),
      (3L, 3L, 0L),
      (4L, 0L, 0L))
    out(0).getDouble(3) shouldBe 0.333333 +- 1e-9
    out(3).getDouble(3) shouldBe 0.0
  }

  it should "count a doc-internal repeat as a dup span" in {
    // the same 8-gram twice INSIDE one doc: total(g)=2 > c per position?
    // No — both positions belong to the same doc, c = 2 = tot, NOT a dup
    // (external-only semantics); a third occurrence in another doc flips
    // both to dup.
    val internal = Seq(Doc(1, "a b c d e f g h a b c d e f g h", "s")).toDS.toDF()
    Corpus.dupSpanProfile(internal, "doc_id", "text")
      .collect().head.getLong(2) shouldBe 0L
    val withExt = Seq(
      Doc(1, "a b c d e f g h a b c d e f g h", "s"),
      Doc(2, "a b c d e f g h", "s")).toDS.toDF()
    val out = Corpus.dupSpanProfile(withExt, "doc_id", "text")
      .orderBy("doc_id").collect()
    out(0).getLong(2) shouldBe 2L // both internal positions now recur externally
    out(1).getLong(2) shouldBe 1L
  }

  behavior of "containmentPairs"

  it should "score an excerpt at containment 1 where jaccard stays low" in {
    // doc 2's shingle set is a strict subset of doc 1's
    val docs = Seq(
      Doc(1, "a b c d e f g h i j k l", "s"),
      Doc(2, "a b c d e", "s"),
      Doc(3, "z y x w v u t", "s")).toDS.toDF()
    val out = Dedup.containmentPairs(docs, "doc_id", "text", "source")
      .collect()
    out should have size 1
    val r = out.head
    (r.getLong(0), r.getLong(1)) shouldBe (1L, 2L)
    r.getDouble(2) shouldBe 1.0 // containment
    r.getDouble(3) should be < 0.5 // jaccard hides the excerpt
    // the symmetric screen at the same bar misses it
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
      threshold = 0.6) shouldBe empty
  }

  behavior of "cmsTopkGate"

  it should "estimate at-or-above truth with exact truth counts" in {
    val docs = Seq(
      Doc(1, "x x x x y y z", "s"),
      Doc(2, "x y w", "s")).toDS.toDF()
    val out = Corpus.cmsTopkGate(docs, "text", depth = 4, width = 64, k = 10)
      .collect()
    out should have size 4 // vocab {x, y, z, w}
    val byTerm = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    byTerm("x")._1 shouldBe 5L
    byTerm("y")._1 shouldBe 3L
    byTerm("z")._1 shouldBe 1L
    byTerm("w")._1 shouldBe 1L
    all(out.map(_.getBoolean(4))) shouldBe true // n_cms >= n_true, structural
    all(out.map(r => r.getLong(2) >= r.getLong(1))) shouldBe true
    // top-k order: n_true desc, term asc
    out.map(_.getString(0)) shouldBe Array("x", "y", "w", "z")
  }

  behavior of "hoppingAgg"

  it should "land each event in exactly windowDuration/slideDuration windows" in {
    // epoch-built timestamps — TZ-independent (Timestamp.valueOf would
    // parse in the JVM default zone, not the UTC session zone)
    val ev = Seq(
      (1L, new java.sql.Timestamp(1704069600000L), "a", 1.0), // 00:40Z
      (2L, new java.sql.Timestamp(1704070200000L), "a", 2.0)) // 00:50Z
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.hoppingAgg(ev, "ts", "event_type", "value", "1 hour", "30 minutes")
      .orderBy("window_start_ms").collect()
    // events at 00:40/00:50 belong to windows starting 00:00 and 00:30
    out.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))) shouldBe Array(
      (1704067200000L, 2L, 3.0),
      (1704069000000L, 2L, 3.0))
  }

  behavior of "bpeMerges"

  it should "learn the classic low/lower/lowest merge sequence" in {
    val docs = Seq(Doc(1, "low low lower lowest", "s")).toDS.toDF()
    val out = Corpus.bpeMerges(docs, "text", nMerges = 4)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    out shouldBe Array(
      (1, "l", "o", 4),    // (l,o) ties (o,w) at 4 -> lexicographic pick
      (2, "lo", "w", 4),
      (3, "low", "e", 2),
      (4, "lowe", "r", 1)) // three 1-count pairs -> smallest (left, right)
  }

  it should "rewrite overlapping chains greedy-leftmost" in {
    // [a,a,a,a]: greedy BPE gives [aa][aa], then one (aa,aa) pair — the
    // single-pass replace would leave [aa][a][a] and count wrong
    val docs = Seq(Doc(1, "aaaa", "s")).toDS.toDF()
    val out = Corpus.bpeMerges(docs, "text", nMerges = 2)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    out shouldBe Array(("a", "a", 3), ("aa", "aa", 1))
  }

  it should "segment with the learned merges at the vocab level" in {
    val docs = Seq(Doc(1, "low low lower lowest", "s")).toDS.toDF()
    val out = Corpus.bpeSegment(docs, "doc_id", "text", nMerges = 4)
      .collect().head
    // merges (l,o)(lo,w)(low,e)(lowe,r): low->1, lower->1, lowest->3
    (out.getInt(1), out.getInt(2)) shouldBe ((4, 6))
    out.getDouble(3) shouldBe 1.5
  }

  it should "derive identical vocab and drift from a shipped merge table" in {
    // the committed-tokenizer-registry path (loadBpeMerges +
    // bpeVocabularyWith/bpeVocabDriftWith) is only sound if the With-
    // variants equal their inline-induction counterparts exactly
    val docs = Seq(Doc(1, "low low lower lowest", "s"),
      Doc(2, "low slow slower", "s")).toDS.toDF()
    val merges = Corpus.bpeMergeTable(docs, "text", nMerges = 4)
    val inline = Corpus.bpeVocabulary(docs, "text", nMerges = 4)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1)))
    val shipped = Corpus.bpeVocabularyWith(docs, "text", merges)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1)))
    shipped shouldBe inline
    val a = docs.filter(col("doc_id") === 1)
    val b = docs.filter(col("doc_id") === 2)
    val driftInline = Corpus.bpeVocabDrift(a, b, "text", nMerges = 3).collect()
    val driftShipped = Corpus.bpeVocabDriftWith(spark,
      Corpus.bpeMergeTable(a, "text", nMerges = 3),
      Corpus.bpeMergeTable(b, "text", nMerges = 3)).collect()
    driftShipped.map(_.toSeq) shouldBe driftInline.map(_.toSeq)
  }

  behavior of "cdcChunkDups"

  it should "survive a prefix insertion that kills every fixed-span gram" in {
    // "k2 k3 k4 k5" is a crafted boundary gram (hash60 % 16 == 0), so
    // both docs cut after k5 and share the trailing "a b c" chunk even
    // though their prefixes differ in LENGTH — every fixed 8-gram span
    // shifts, the CDC chunk doesn't.
    val docs = Seq(
      Doc(1, "p q k2 k3 k4 k5 a b c", "s"),
      Doc(2, "x y z k2 k3 k4 k5 a b c", "s")).toDS.toDF()
    val cdc = Corpus.cdcChunkDups(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    cdc.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))) shouldBe
      Array((2L, 1L, 0.5), (2L, 1L, 0.5))
    // the contrast: the fixed-span profile sees ZERO shared 8-grams here
    Corpus.dupSpanProfile(docs, "doc_id", "text")
      .collect().map(_.getLong(2)).sum shouldBe 0L
  }

  it should "emit one whole-document chunk when no boundary fires" in {
    val doc = Seq(Doc(1, "alpha beta gamma", "s")).toDS.toDF() // < window
    val out = Corpus.cdcChunkDups(doc, "doc_id", "text").collect().head
    (out.getLong(1), out.getLong(2)) shouldBe ((1L, 0L))
  }

  behavior of "qualityBlend"

  it should "keep the top decile and zero out degenerate signals" in {
    // 10 docs with varying length/stopword mix -> distinct blends
    val docs = (1L to 10L).map(i =>
      Doc(i, ("the quick fox " * i.toInt).trim + s" unique$i", "s")).toDS.toDF()
    val out = Corpus.qualityBlend(docs, "doc_id", "text").collect()
    out should have size 10
    out.count(_.getBoolean(2)) shouldBe 1 // p90 keeps the top of 10
    // z-scores are centered: blend sums to ~0 across the corpus
    math.abs(out.map(_.getDouble(1)).sum) should be < 1e-3
    // identical docs -> sigma 0 on every signal -> blend 0, all kept
    val same = (1L to 4L).map(i => Doc(i, "same text here", "s")).toDS.toDF()
    val deg = Corpus.qualityBlend(same, "doc_id", "text").collect()
    all(deg.map(_.getDouble(1))) shouldBe 0.0
    all(deg.map(_.getBoolean(2))) shouldBe true
  }

  behavior of "skewReport"

  it should "rank hot keys with share and multiple-of-median" in {
    val df = (Seq.fill(8)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .toDF("user_id")
    val out = EventOps.skewReport(df, "user_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // counts 8,2,1,1: total 12, median 1.5
    out shouldBe Array(
      (1L, 8L, 0.666667, 5.333333),
      (2L, 2L, 0.166667, 1.333333))
  }

  behavior of "versionDiff"

  it should "classify added, removed, changed and unchanged documents" in {
    val base = Seq(Doc(1, "alpha", "s"), Doc(2, "beta", "s"), Doc(3, "gamma", "s"))
      .toDS.toDF()
    val revised = Seq(Doc(2, "beta", "s"), Doc(3, "gamma EDITED", "s"),
      Doc(4, "delta", "s")).toDS.toDF()
    val out = Corpus.versionDiff(base, revised, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Array((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added"))
  }

  it should "ignore case and whitespace drift like the exact-dedup fingerprint" in {
    val base = Seq(Doc(1, "Hello  World", "s")).toDS.toDF()
    val revised = Seq(Doc(1, "hello world", "s")).toDS.toDF()
    Corpus.versionDiff(base, revised, "doc_id", "text")
      .collect().head.getString(1) shouldBe "unchanged"
  }

  behavior of "pmiCollocations"

  it should "rank exclusive pairs above independent ones" in {
    // "new york" always co-occur; "the" pairs with everything
    val docs = (1L to 6L).map(i =>
      Doc(i, "new york the cat the dog", "s")).toDS.toDF()
    val out = Corpus.pmiCollocations(docs, "text", minCount = 5, k = 10)
      .collect()
    val pmi = out.map(r => r.getString(0) -> r.getDouble(4)).toMap
    // N = 36 tokens; "new york": 6·36/(6·6) = 6 -> ln 6
    pmi("new york") shouldBe math.log(6.0) +- 1e-6
    // "the cat": 6·36/(12·6) = 3 -> ln 3; beaten by the exclusive pair
    pmi("the cat") shouldBe math.log(3.0) +- 1e-6
    out.head.getString(0) shouldBe "new york"
    // counts ride along
    val r = out.find(_.getString(0) == "new york").get
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((6L, 6L, 6L))
  }

  behavior of "tokenEntropy"

  it should "compute exact Shannon entropy in nats" in {
    val docs = Seq(
      Doc(1, "a a a a", "s"),   // one symbol -> H = 0
      Doc(2, "a b c d", "s"),   // uniform over 4 -> H = ln 4
      Doc(3, "a a b b", "s"))   // uniform over 2 -> H = ln 2
      .toDS.toDF()
    val out = Corpus.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.map(r => (r.getLong(1), r.getLong(2))) shouldBe
      Array((4L, 1L), (4L, 4L), (4L, 2L))
    out(0).getDouble(3) shouldBe 0.0
    out(1).getDouble(3) shouldBe math.log(4.0) +- 1e-6
    out(2).getDouble(3) shouldBe math.log(2.0) +- 1e-6
  }

  behavior of "burstScore"

  it should "flag a spike against the trailing baseline, gap-aware" in {
    def ev(id: Long, ms: Long) = (id, new java.sql.Timestamp(ms), "a", 1.0)
    // buckets 0..6: one event each; bucket 7: five events; bucket 20:
    // one event after silence (trailing frame empty again)
    val rows = (0L to 6L).map(i => ev(i, i * 1000)) ++
      (0L until 5L).map(i => ev(100 + i, 7000 + i)) :+ ev(200, 20000)
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.burstScore(df, "event_type", "ts", 1000L,
        trailingBuckets = 6, factor = 3.0)
      .orderBy("bucket").collect()
    val byBucket = out.map(r =>
      r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    byBucket(0L) shouldBe ((1L, 0L, 0.0, false))   // cold start
    byBucket(3L) shouldBe ((1L, 3L, 1.0, false))   // baseline, no spike
    byBucket(7L) shouldBe ((5L, 6L, 1.0, true))    // 5 >= 3x1.0 -> burst
    byBucket(20L) shouldBe ((1L, 0L, 0.0, false))  // gap emptied the frame
  }

  behavior of "thresholdSweep"

  it should "price every threshold including zero-pair corpora" in {
    val dup = Seq(
      Doc(1, "the quick brown fox jumps over the lazy dog", "s"),
      Doc(2, "the quick brown fox jumps over the lazy dog", "s"),
      Doc(3, "completely different words appear here instead now", "s"))
      .toDS.toDF()
    val out = Dedup.thresholdSweep(dup, "doc_id", "text")
      .orderBy("threshold").collect()
    out.map(_.getDouble(0)) shouldBe Array(0.5, 0.6, 0.7, 0.8, 0.9)
    out.map(_.getLong(1)) shouldBe Array(1L, 1L, 1L, 1L, 1L) // the identical pair
    // a corpus with no candidates still reports all five thresholds
    val solo = Seq(Doc(1, "only one document", "s")).toDS.toDF()
    val zeros = Dedup.thresholdSweep(solo, "doc_id", "text")
      .orderBy("threshold").collect()
    zeros.map(_.getDouble(0)) shouldBe Array(0.5, 0.6, 0.7, 0.8, 0.9)
    all(zeros.map(_.getLong(1))) shouldBe 0L
  }

  behavior of "labelCentroids"

  it should "mean-pool prototypes with exact cohesion on aligned members" in {
    // label 0: two identical axis vectors -> centroid = the vector,
    // cohesion 1; label 1: two orthogonal vectors -> centroid at 45°,
    // cohesion cos(45°)
    val df = Seq(
      (1L, Seq(2f, 0f), 0), (2L, Seq(2f, 0f), 0),
      (3L, Seq(1f, 0f), 1), (4L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(df, "embedding", "label")
      .orderBy("label").collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((0L, 2L), (1L, 2L))
    out(0).getDouble(2) shouldBe 2.0 // |centroid| of label 0
    out(0).getDouble(3) shouldBe 1.0 // members sit ON the centroid
    out(1).getDouble(2) shouldBe math.sqrt(0.5) +- 1e-6 // (0.5, 0.5)
    out(1).getDouble(3) shouldBe math.cos(math.Pi / 4) +- 1e-6
  }

  behavior of "pqReconstruct"

  it should "reconstruct per-subspace codes deterministically" in {
    val vecs = Seq(
      Vec(1, Seq(1f, 0f, 0f, 0.1f)), Vec(2, Seq(1f, 0f, 0f, 0.1f)),
      Vec(3, Seq(0.9f, 0.1f, 0.1f, 0f)), Vec(4, Seq(0f, 1f, 0.9f, 0f)),
      Vec(5, Seq(0.1f, 0.9f, 1f, 0.1f)), Vec(6, Seq(0f, 1f, 1f, 0f)))
      .toDS.toDF()
    val out = Similarity.pqReconstruct(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, lloydRounds = 2)
    val rows = out.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    rows.map(_._1) shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
    all(rows.map(_._2.size)) shouldBe 4 // codes concat back to full dim
    // identical inputs quantize to identical reconstructions
    rows(0)._2 shouldBe rows(1)._2
    // deterministic across rebuilds (seeding, Lloyd, ties all pinned)
    val again = Similarity.pqReconstruct(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, lloydRounds = 2)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    rows.map(_._2) shouldBe again
    // the encode+reconstruct is ONE narrow projection: codebooks are plan
    // literals — no join, no exchange anywhere in the build
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "Join"
      plan should not include "Exchange"
    }
  }

  behavior of "round-6 plan shapes"

  it should "plan the new operators with their claimed shuffle shapes" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // dup-span profile: gram/doc aggregates + equi-joins, never pairwise
    val spans = plan(Corpus.dupSpanProfile(docs, "doc_id", "text"))
    withClue(spans) {
      spans should not include "CartesianProduct"
      spans should not include "BroadcastNestedLoop"
    }
    // CMS gate: the depth×width cell table must broadcast back, and the
    // top-k must be a TakeOrderedAndProject (per-partition heads), not a
    // global sort
    val cms = plan(Corpus.cmsTopkGate(docs, "text"))
    withClue(cms) {
      cms should include ("BroadcastHashJoin")
      cms should include ("TakeOrderedAndProject")
      cms should not include regex("(?s)Sort \\[n_true")
    }
    // hopping windows: the overlap explode stays narrow — one aggregate
    // shuffle, same as tumbling; no join
    val hop = plan(EventOps.hoppingAgg(
      docs.select(col("doc_id").as("event_id"),
        org.apache.spark.sql.functions.timestamp_millis(col("doc_id") * 60000)
          .as("ts"),
        col("lang").as("event_type"), col("n_chars").cast("double").as("value")),
      "ts", "event_type", "value", "1 hour", "30 minutes"))
    withClue(hop) {
      "Exchange hashpartitioning".r.findAllIn(hop).size shouldBe 1
      hop should not include "Join"
    }
  }
}
