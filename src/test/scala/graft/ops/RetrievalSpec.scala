package graft.ops

import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The persisted-inverted-index contract (ops/Retrieval): positional
  * postings invariants, exact agreement between index-served BM25 and the
  * full-scan scorer, the champion-list prune's structure, phrase matching
  * against a hand-built fixture, and the plan shapes that make the tier
  * scale (map-side partial group-limit, broadcast query joins). */
class RetrievalSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private lazy val postings = Retrieval.buildPostings(docs, "doc_id", "text")

  behavior of "Retrieval"

  it should "build postings whose tf, dl and positions are mutually consistent" in {
    val bad = postings.filter(
      col("tf") =!= array_size(col("positions")) ||
        array_size(col("positions")) === 0 ||
        // strictly increasing offsets, all inside the document
        exists(zip_with(col("positions"),
            slice(col("positions"), 2, 1000000),
          (a, b) => b <= a), x => x) ||
        element_at(col("positions"), -1) >= col("dl"))
      .count()
    bad shouldBe 0L
    // per-document tf sums reconstruct the document length exactly
    val mismatch = postings.groupBy("id")
      .agg(sum(col("tf")).as("n"), max(col("dl")).as("dl"))
      .filter(col("n") =!= col("dl")).count()
    mismatch shouldBe 0L
  }

  it should "serve BM25 from postings exactly equal to the full-scan scorer" in {
    val terms = Seq("spark", "table", "window")
    val (n, dl) = Retrieval.corpusStats(docs, "text")
    val q = terms.map(t => (0L, t)).toDF("query_id", "term")
    // k large enough to keep every matching document: the whole ranking
    // must agree, not just the head
    val served = Retrieval
      .bm25TopK(postings.filter(col("term").isin(terms: _*)), q, n, dl,
        k = 100000)
      .select(col("doc_id"), col("n_terms_matched"), col("bm25"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val full = Corpus.bm25Score(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    served shouldBe full
  }

  it should "rank only full-match documents in conjunctive mode, contiguously" in {
    val terms = Seq("spark", "table", "window")
    val (n, dl) = Retrieval.corpusStats(docs, "text")
    val q = terms.map(t => (0L, t)).toDF("query_id", "term")
    val p = postings.filter(col("term").isin(terms: _*))
    val conj = Retrieval.bm25TopK(p, q, n, dl, k = 100000,
      requireAllTerms = true).collect()
    conj.foreach(_.getLong(3) shouldBe 3L)
    // ranks contiguous from 1 over the conjunctive result
    conj.map(_.getInt(2)).sorted shouldBe (1 to conj.length).toArray
    // exactly the disjunctive rows that matched everything, same scores
    val disjFull = Retrieval.bm25TopK(p, q, n, dl, k = 100000)
      .filter(col("n_terms_matched") === 3)
      .select("doc_id", "bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    conj.map(r => (r.getLong(1), r.getDouble(4))).sorted shouldBe disjFull
  }

  it should "prune champion lists to c per term with the true df frozen in" in {
    val (n, dl) = Retrieval.corpusStats(docs, "text")
    val champ = Retrieval.championPostings(postings, n, dl, c = 8)
    champ.groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") > 8).count() shouldBe 0L
    // frozen dfc is the FULL posting-list length, not the pruned one
    val trueDf = postings.groupBy("term").agg(count(lit(1)).as("dfx"))
    champ.select(col("term"), col("dfc")).distinct()
      .join(trueDf, "term")
      .filter(col("dfc") =!= col("dfx")).count() shouldBe 0L
  }

  it should "match phrases exactly against a hand-built corpus" in {
    val tiny = Seq(
      (1L, "a b a b c"),   // "a b" at 0 and 2
      (2L, "b a b"),       // "a b" at 1
      (3L, "a a a"),       // no b at all
      (4L, "b b a")        // a last: no following b
    ).toDF("doc_id", "text")
    val p = Retrieval.buildPostings(tiny, "doc_id", "text")
    val got = Retrieval.phraseMatch(p, "a", "b")
      .select(col("doc_id"), col("n_phrase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    got shouldBe Array((1L, 2), (2L, 1))
    // proximity at window 2 additionally finds doc 3's "b b a"? no — order
    // matters (a BEFORE b); doc 1 "a b a b c": a@0→b@1, a@2→b@3 (both
    // within 2); doc 2 "b a b": a@1→b@2; doc 4 "b b a": nothing follows a
    val near = Retrieval.proximityMatch(p, "a", "b", window = 2)
      .select(col("doc_id"), col("n_near"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    near shouldBe Array((1L, 2), (2L, 1))
    // a wider window lets doc 1's a@0 also reach b@3 — still 2 distinct
    // 'a' occurrences, so the per-occurrence count is unchanged there
    val wide = Retrieval.proximityMatch(p, "a", "b", window = 5)
      .select(col("doc_id"), col("n_near"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    wide shouldBe Array((1L, 2), (2L, 1))
    // trigram: only doc 1 holds "a b a" ("a b" at 0 then a@2) — and the
    // 3-term path agrees with the bigram path on the 2-term phrase
    val tri = Retrieval.phraseMatchAll(p, Seq("a", "b", "a"))
      .select(col("doc_id"), col("n_phrase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    tri shouldBe Array((1L, 1))
    val bi2 = Retrieval.phraseMatchAll(p, Seq("a", "b"))
      .select(col("doc_id"), col("n_phrase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    bi2 shouldBe got
  }

  it should "prune ranges with block-max bounds and still rank exactly" in {
    val (n, dl) = Retrieval.corpusStats(docs, "text")
    // the mixed rare+common query shape block-max exists for, plus a
    // common-only query where little or nothing can be pruned
    val q = Seq((0L, "dup"), (0L, "spark"), (0L, "table"),
      (1L, "join"), (1L, "filter")).toDF("query_id", "term")
    val p = postings
      .filter(col("term").isin("dup", "spark", "table", "join", "filter"))
    val W = 32L
    val bidx = Retrieval.blockIndex(p, n, dl, W)
    val surv = Retrieval.blockMaxSurvivors(p, bidx, q, n, dl, k = 5)
    val candidates = bidx
      .join(q.select("query_id", "term").distinct(), "term")
      .select("query_id", "blk").distinct().count()
    surv.count() should be < candidates
    // EXACTNESS at any pruning rate: identical rows to the exhaustive path
    val got = Retrieval.bm25TopKBlockMax(p, q, n, dl, k = 5, surv, W)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .sorted
    val want = Retrieval.bm25TopK(p, q, n, dl, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .sorted
    got shouldBe want
  }

  it should "drop exactly the rare-term-free ranges on a hand-built skew" in {
    // 64 docs: "rare" lives only in docs 0..3 (range 0 at W=16); "common"
    // is everywhere with identical tf/dl, so every range's common-only
    // upper bound is the same and θ (from rare-range champions) crushes it
    val tiny = (0L until 64L)
      .map(i => (i, if (i < 4) "rare common common" else "other common common"))
      .toDF("doc_id", "text")
    val p = Retrieval.buildPostings(tiny, "doc_id", "text")
    val (n, dl) = Retrieval.corpusStats(tiny, "text")
    val q = Seq((0L, "rare"), (0L, "common")).toDF("query_id", "term")
    val W = 16L
    val bidx = Retrieval.blockIndex(p, n, dl, W)
    val surv = Retrieval.blockMaxSurvivors(p, bidx, q, n, dl, k = 3)
    surv.collect().map(_.getLong(1)).sorted shouldBe Array(0L)
    val got = Retrieval.bm25TopKBlockMax(p, q, n, dl, k = 3, surv, W)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    got shouldBe Array(0L, 1L, 2L)
  }

  it should "answer substring queries from the trigram index, verifying candidates" in {
    val tiny = Seq(
      (1L, "xx abcd yy abcd"), // two true hits
      (2L, "abc bcd"),         // FALSE candidate: all trigrams, no substring
      (3L, "ab"),              // too short to index anything
      (4L, "zzzz")             // no relevant trigram
    ).toDF("doc_id", "text")
    val p = Retrieval.buildTrigramPostings(tiny, "doc_id", "text")
    // per-doc dedup: doc 1 indexes each distinct window once
    p.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe
      Array((1L, 10L), (2L, 5L), (4L, 1L))
    // doc 2 survives the trigram intersection but fails verification
    val tris = "abcd".sliding(3).toSeq
    val cand = p.filter(col("tri").isin(tris: _*))
      .groupBy("id").agg(countDistinct(col("tri")).as("n"))
      .filter(col("n") === tris.size)
      .collect().map(_.getLong(0)).sorted
    cand shouldBe Array(1L, 2L)
    Retrieval.substringSearch(p, tiny, "doc_id", "text", "abcd")
      .collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe
      Array((1L, 2L))
  }

  it should "keep the scale shapes: partial group-limit and broadcast probes" in {
    val (n, dl) = Retrieval.corpusStats(docs, "text")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // champion prune: per-term top-c runs MAP-SIDE — the shuffle carries
    // at most c rows per term per input partition, so no term's full
    // posting list ever sorts in one task
    val champ = planOf(Retrieval.championPostings(postings, n, dl, c = 8))
    withClue(champ) {
      champ should include ("row_number(), 8, Partial")
      champ should include ("row_number(), 8, Final")
    }
    // probe: the (query_id, term) frame and the df frame broadcast into
    // the postings scan; rank <= k is a partial group-limit again
    val q = Seq((0L, "spark"), (1L, "join")).toDF("query_id", "term")
    val topk = planOf(Retrieval.bm25TopK(postings, q, n, dl, k = 5))
    withClue(topk) {
      topk should include ("BroadcastHashJoin")
      topk should include ("row_number(), 5, Partial")
      topk should not include "SortMergeJoin"
    }
  }

  it should "match hand-computed nDCG with capped grades and ideal ties" in {
    // corpus engineered so the BM25 top list and the ideal list differ:
    // doc 1 repeats 'cat' 4x (grade caps at 3) but is long; doc 2 has
    // 'cat' once in two tokens; doc 3 has none.
    val tiny = Seq(
      (1L, ("cat " * 4 + "filler " * 36).trim),
      (2L, "cat dog"),
      (3L, "dog bird fish")).toDF("doc_id", "text")
    val qs = Seq((0L, "cat")).toDF("query_id", "term")
    val out = Retrieval.ndcgAtK(tiny, "doc_id", "text", qs, k = 2)
      .collect()(0)
    // grades: doc1 -> min(3,4)=3 (gain 7), doc2 -> 1 (gain 1), doc3 absent.
    // BM25 rank (k1=1.2, b=0.75, avgdl=15): doc2's tf-factor 2.2/1.42
    // beats doc1's 8.8/6.7 (doc1 is 40 tokens long) -> ranking = [2, 1];
    // ideal = [1 (g3), 2 (g1)] -> nDCG < 1.
    // dcg  = 1/log2(2) + 7/log2(3); idcg = 7/log2(2) + 1/log2(3)
    val l3 = BigDecimal(math.log(3) / math.log(2))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = 1.0 / 1.0 + 7.0 / l3
    val idcg = 7.0 / 1.0 + 1.0 / l3
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    out.getDouble(1) shouldBe r6(dcg) +- 2e-6
    out.getDouble(2) shouldBe r6(idcg) +- 2e-6
    out.getDouble(3) shouldBe r6(dcg / idcg) +- 2e-6
    // a query whose term never occurs: zero idcg must gate to 0, not NaN
    val none = Retrieval.ndcgAtK(tiny, "doc_id", "text",
      Seq((9L, "absent")).toDF("query_id", "term"), k = 2).collect()(0)
    (none.getDouble(1), none.getDouble(2), none.getDouble(3)) shouldBe ((0.0, 0.0, 0.0))
  }
}
