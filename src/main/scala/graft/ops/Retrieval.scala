package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.TextFunctions.tokens

/** Persisted inverted index for lexical (BM25) retrieval — the text-side
  * counterpart of the persisted IVF tier in [[Similarity]] +
  * [[graft.sources.ManifestTable]]: build the posting lists ONCE as a
  * governed manifest table, probe them with a stats-pruned term read, and
  * maintain them incrementally at O(delta).
  *
  * Why an index at all: [[Corpus.bm25Score]] is the full-scan shape — every
  * query tokenizes the corpus again. At 100 TB a keyword query must not
  * re-read 100 TB; it should open the handful of files that hold the query
  * terms' posting lists. The pieces:
  *
  *  - '''Postings table''' (`term, id, tf, dl, positions`): one row per
  *    (term, document), document length denormalized so probes never join a
  *    doc-length side table, token offsets retained so PHRASE queries are an
  *    array intersection instead of a text rescan (the Lucene posting-with-
  *    positions shape). Built by one explode + (term, id) aggregation —
  *    map-side combinable, shuffle keyed on (term, id) which is near-unique,
  *    so no hot keys at any corpus size.
  *  - '''Layout''': `compactSorted(Seq("term"))` range-clusters the table so
  *    each file covers a disjoint term range; the manifest's string min/max
  *    stats then turn a probe into `readWhereIn(dir, "term", terms)` — the
  *    UTF-8 containment prune opens only files whose range can hold a query
  *    term, at any index size.
  *  - '''Corpus stats as table metadata''': BM25 needs the corpus document
  *    count and total length. They ride the manifest header (`#meta=`,
  *    [[graft.sources.ManifestTable.properties]]) in the SAME pointer move
  *    as the postings they describe — a probe reads them for free instead of
  *    rescanning the corpus, and a snapshot can never pair postings with
  *    another snapshot's stats.
  *  - '''Staleness contract''': the index commit binds `#indexof` to the
  *    corpus snapshot it covers; probes gate on `requireIndexFresh` exactly
  *    like the ANN probe path. Maintenance after a corpus append is
  *    [[buildPostings]] over `readChangesSince` (the delta only) landed with
  *    `appendIndex` — posting lists for a term may then span files, which is
  *    correct: document frequency is re-aggregated at probe time from the
  *    (complete) pruned read, so delta appends never invalidate stored
  *    statistics. Only the `#meta=` corpus totals change, and they swap in
  *    the same transaction.
  *  - '''Static pruning''' ([[championPostings]]): the impact-ordered
  *    champion-list variant for latency-bound top-k — keep only the C
  *    highest-impact postings per term (partial per-partition group-limit,
  *    shuffle carries ≤ C rows per term per partition), freeze each term's
  *    true document frequency into the artifact, and accept approximate
  *    recall priced by [[bm25TopK]]-vs-champion evaluation (the nprobe-sweep
  *    pattern applied to lexical search).
  *  - '''Block-max pruning''' ([[blockIndex]] / [[blockMaxSurvivors]] /
  *    [[bm25TopKBlockMax]]): the EXACT fast path — range-aligned per-block
  *    score ceilings (the block-max WAND side file) plus a champion-derived
  *    threshold prove most docid ranges cannot hold a top-k document
  *    before any posting row is scored. Unlike champion lists, results are
  *    bit-identical to the exhaustive ranking at any pruning rate.
  *
  * Determinism: scores canonicalize through DECIMAL(27,12) exactly as
  * [[Corpus.bm25Score]] does (the idf's `ln` is the one libm call, pinned by
  * the DECIMAL cast; everything else is integer-derived IEEE arithmetic), and
  * ranking orders by the EXACT decimal score sum with document-id ties — so
  * an independent engine reproduces every rank bit-for-bit.
  */
object Retrieval {

  /** `#meta=` keys the index build records next to its `#indexof` binding. */
  val MetaDocs = "retrieval.n_docs"
  val MetaTotalDl = "retrieval.total_dl"

  private val dec = DecimalType(27, 12)

  /** The posting lists of `df`: one row per (term, document) with term
    * frequency, document length, and ascending token offsets. One explode +
    * one (term, id)-keyed aggregation; `array_sort` pins the offset order
    * regardless of partial-aggregate merge order. */
  def buildPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    buildPostingsFromTokens(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks")))

  /** [[buildPostings]] over an ALREADY-TOKENIZED (id, toks) frame — the
    * build half when tokenization is staged once and shared with
    * [[corpusStatsFromTokens]] (r14 optimization round: the index-build
    * queries tokenized the corpus twice, once for the stats aggregate
    * and once for the postings; at 100 TB that is two full corpus
    * passes where one suffices). Arithmetic identical to
    * [[buildPostings]] by construction — it IS the same plan tail. */
  def buildPostingsFromTokens(toks: DataFrame): DataFrame =
    toks.select(col("id"), size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")))
      .groupBy(col("col").as("term"), col("id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"),
        array_sort(collect_list(col("pos"))).as("positions"))

  /** (document count, total token length) of the corpus — the two scalars a
    * BM25 probe needs beyond the posting lists themselves. One 1-row
    * aggregate collected on the driver; committed as `#meta=` so probes
    * never recompute it. */
  def corpusStats(df: DataFrame, textCol: String): (Long, Long) =
    corpusStatsFromTokens(
      df.select(tokens(col(textCol)).as("toks")))

  /** [[corpusStats]] over an already-tokenized frame (any frame with a
    * `toks` array column) — the stats half of the shared-tokenization
    * build path. */
  def corpusStatsFromTokens(toks: DataFrame): (Long, Long) = {
    val r = toks
      .agg(count(lit(1)).as("n"),
        sum(size(col("toks")).cast("long")).as("dl"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  // The tf-side BM25 factor: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) —
  // monotone in the full per-term score for a fixed term, which is what
  // makes it the champion-list impact ordering.
  private def tfFactor(nDocs: Long, totalDl: Long, k1: Double, b: Double) = {
    val avgdl = lit(totalDl).cast("double") / lit(nDocs)
    (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
  }

  // idf = ln(1 + (N − df + ½)/(df + ½)), DECIMAL-canonicalized — identical
  // expression to Corpus.bm25Score so index-served scores equal full-scan
  // scores exactly.
  private def idfOf(nDocs: Long) =
    log(lit(1.0) + (lit(nDocs) - col("dfc") + lit(0.5)) /
      (col("dfc") + lit(0.5))).cast(dec).cast("double")

  /** Top-k BM25 per query from a posting-list read. `queries` is the tiny
    * (query_id, term) frame — broadcast into the postings join, so the only
    * corpus-sized shape is the postings scan itself (already pruned to the
    * query terms by [[graft.sources.ManifestTable.readWhereIn]]). Document
    * frequency re-aggregates from the read (a #terms-sized frame), so the
    * scores are exact at ANY snapshot, including after delta appends.
    * Ranking compares the exact DECIMAL score sum (never the rounded double)
    * with document-id ties; rank ≤ k runs as a partial per-partition
    * group-limit before the per-query shuffle. `excludeSelf` drops the
    * document whose id equals the query id — the more-like-this mode,
    * where queries ARE documents and the trivial self-match is noise.
    * `requireAllTerms` is the boolean-AND mode: only documents matching
    * EVERY term of their query rank (the filter applies BEFORE ranking,
    * so ranks stay contiguous over the conjunctive result).
    *
    * Note the scoring/probing passes evaluate the batch frames more than
    * once (df census + window); pass cached frames when the inputs are
    * expensive to recompute. */
  def bm25TopK(
      postings: DataFrame,
      queries: DataFrame,
      nDocs: Long,
      totalDl: Long,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      excludeSelf: Boolean = false,
      requireAllTerms: Boolean = false
  ): DataFrame = {
    val dfq = postings.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    val joined = postings
      .join(broadcast(queries.select(col("query_id"), col("term"))), "term")
      .join(broadcast(dfq), "term")
    val scored0 =
      (if (excludeSelf) joined.filter(col("id") =!= col("query_id"))
       else joined)
      .select(col("query_id"), col("id"),
        (idfOf(nDocs) * tfFactor(nDocs, totalDl, k1, b)).as("s"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("s").cast(dec)).as("sd"))
    val scored =
      if (!requireAllTerms) scored0
      else scored0.join(
        broadcast(queries.groupBy(col("query_id"))
          .agg(countDistinct(col("term")).as("__nq"))),
        "query_id")
        .filter(col("n_terms_matched") === col("__nq"))
        .drop("__nq")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sd").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"), col("rank"),
        col("n_terms_matched"), round(col("sd").cast("double"), 6).as("bm25"))
  }

  /** The impact-ordered static prune: per term, keep only the `c` postings
    * with the highest tf-side BM25 factor (ties by document id) and FREEZE
    * the term's true document frequency into each surviving row — the
    * champion-list / quantized-impact index shape. The per-term top-c runs
    * as a partial group-limit (map-side, ≤ c rows per term per partition
    * enter the shuffle), so no term's full posting list ever sorts in one
    * task. The artifact is approximate BY DESIGN; price its recall with
    * [[bm25TopK]] over the full postings as truth. */
  def championPostings(
      postings: DataFrame,
      nDocs: Long,
      totalDl: Long,
      c: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val dfq = postings.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("impact").desc, col("id").asc)
    postings
      .withColumn("impact", tfFactor(nDocs, totalDl, k1, b))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= c)
      .join(broadcast(dfq), "term")
      .select(col("term"), col("id"), col("tf"), col("dl"),
        col("positions"), col("dfc"))
  }

  /** [[bm25TopK]] over a champion-list artifact: identical scoring, but
    * document frequency comes from the frozen `dfc` column — the build-time
    * truth the artifact carries — because the pruned lists no longer contain
    * every matching document. */
  def bm25TopKChampion(
      champion: DataFrame,
      queries: DataFrame,
      k: Int,
      nDocs: Long,
      totalDl: Long,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val scored = champion
      .join(broadcast(queries.select(col("query_id"), col("term"))), "term")
      .select(col("query_id"), col("id"),
        (idfOf(nDocs) * tfFactor(nDocs, totalDl, k1, b)).as("s"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("s").cast(dec)).as("sd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sd").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"), col("rank"),
        col("n_terms_matched"), round(col("sd").cast("double"), 6).as("bm25"))
  }

  /** RANGE-ALIGNED BLOCK-MAX metadata — the batch analogue of the
    * block-max WAND index side file: per (term, docid-range) the maximum
    * tf-side BM25 factor any posting in that range can contribute. Ranges
    * are `floor(id / rangeWidth)`, ALIGNED ACROSS TERMS, so a document's
    * postings for every term live in exactly one range and a per-range
    * upper bound really bounds the document's whole score. The artifact
    * is #terms × #ranges rows — metadata-sized next to the postings it
    * describes — built by one map-side-combinable aggregation, and meant
    * to be committed alongside the posting index so a probe can prune
    * BEFORE touching posting rows. */
  def blockIndex(
      postings: DataFrame,
      nDocs: Long,
      totalDl: Long,
      rangeWidth: Long,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    postings
      .select(col("term"), floor(col("id") / lit(rangeWidth)).as("blk"),
        tfFactor(nDocs, totalDl, k1, b).as("impact"))
      .groupBy(col("term"), col("blk"))
      .agg(max(col("impact")).as("bmax"), count(lit(1)).as("n_postings"))

  /** The docid ranges a block-max-pruned top-k probe must still score —
    * batch WAND's two bounds turned into two tiny joins:
    *
    *  1. '''Threshold θ''' (a LOWER bound on the true k-th score): score
    *     only the champion postings (the c highest-impact per term, a
    *     partial group-limit) and take each query's k-th best PARTIAL sum.
    *     A partial sum only omits positive contributions, so at least k
    *     documents truly score ≥ θ. Queries with < k champion candidates
    *     get θ = −∞ (no pruning — never wrong, just not faster).
    *  2. '''Upper bound UB(range)''' = Σ over query terms of
    *     idf · blockMax(term, range). Every posting of a document lives in
    *     its one range, so UB(range) ≥ the full score of every document in
    *     it. A range with UB < θ cannot hold a top-k document and is
    *     dropped; the ε slack covers the double-vs-DECIMAL summation-order
    *     gap (slack only ever KEEPS more ranges — exactness is one-sided).
    *
    * Both joins run over metadata-sized frames (champion lists, the block
    * index, the query terms); nothing here scans full posting lists. The
    * survivors frame is queries × ranges — broadcastable into the pruned
    * scoring read of [[bm25TopKBlockMax]]. */
  def blockMaxSurvivors(
      postings: DataFrame,
      blockIdx: DataFrame,
      queries: DataFrame,
      nDocs: Long,
      totalDl: Long,
      k: Int,
      champC: Int = 8,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val qt = broadcast(queries.select(col("query_id"), col("term")))
    val champ = championPostings(postings, nDocs, totalDl, champC, k1, b)
    val lower = champ.join(qt, "term")
      .select(col("query_id"), col("id"),
        (idfOf(nDocs) * tfFactor(nDocs, totalDl, k1, b)).cast(dec).as("s"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("s")).as("lb"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("lb").desc, col("id").asc)
    val theta = lower.withColumn("r", row_number().over(wq))
      .filter(col("r") <= k)
      .groupBy(col("query_id"))
      .agg(min(col("lb")).as("th"), count(lit(1)).as("nc"))
      .select(col("query_id"),
        when(col("nc") < k, lit(Double.MinValue))
          .otherwise(col("th").cast("double")).as("theta"))
    val dfq = postings.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    blockIdx.join(qt, "term")
      .join(broadcast(dfq), "term")
      .select(col("query_id"), col("blk"),
        (idfOf(nDocs) * col("bmax")).cast(dec).as("c"))
      .groupBy(col("query_id"), col("blk"))
      .agg(sum(col("c")).cast("double").as("ub"))
      .join(broadcast(theta), "query_id")
      .filter(col("ub") >= col("theta") - lit(1e-6))
      .select(col("query_id"), col("blk"))
  }

  /** [[bm25TopK]] restricted to the ranges [[blockMaxSurvivors]] kept —
    * IDENTICAL results (the oracle is the exhaustive ranking), fraction of
    * the postings scored. Document frequency aggregates from the FULL
    * pruned-by-term read before the range prune, so idf is exact; a
    * surviving document's postings all share its one range, so its score
    * and matched-term count are complete, never partial. At index scale
    * the `(term, blk)` survivors drive the file-level read itself (the
    * postings table range-clusters by term, id); here the prune is the
    * broadcast semi-join the plan would push. */
  def bm25TopKBlockMax(
      postings: DataFrame,
      queries: DataFrame,
      nDocs: Long,
      totalDl: Long,
      k: Int,
      survivors: DataFrame,
      rangeWidth: Long,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val dfq = postings.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    val scored = postings
      .withColumn("blk", floor(col("id") / lit(rangeWidth)))
      .join(broadcast(queries.select(col("query_id"), col("term"))), "term")
      .join(broadcast(survivors), Seq("query_id", "blk"), "left_semi")
      .join(broadcast(dfq), "term")
      .select(col("query_id"), col("id"),
        (idfOf(nDocs) * tfFactor(nDocs, totalDl, k1, b)).as("s"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("s").cast(dec)).as("sd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sd").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"), col("rank"),
        col("n_terms_matched"), round(col("sd").cast("double"), 6).as("bm25"))
  }

  /** CHARACTER-TRIGRAM postings — the substring-search index (pg_trgm /
    * trigram code-search): one row per (trigram, document) over every
    * 3-char window of the raw text, deduplicated per document. Substring
    * queries of length ≥ 3 then resolve from the index: a document can
    * contain the pattern only if it contains EVERY trigram of the
    * pattern, so the posting lists prune the corpus to a candidate set
    * verified row-level — `LIKE '%…%'` answered without scanning the
    * table. One codegen'd windows+dedup projection, one (tri, id)
    * aggregation-free explode; shuffle keyed on near-unique pairs. */
  def buildTrigramPostings(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(
        // texts under 3 chars index no trigram (explode drops the row);
        // the guard matters because sequence(0, negative) DESCENDS
        when(length(col(textCol)) >= 3,
          transform(sequence(lit(0), length(col(textCol)) - lit(3)),
            i => col(textCol).substr(i + lit(1), lit(3))))
          .otherwise(array()))).as("tri"))

  /** Substring search over [[buildTrigramPostings]]: candidates are the
    * documents containing ALL of the pattern's trigrams (an IN-list read
    * of #trigram posting lists + one count-distinct gate — the index
    * prune), then ONLY candidates are verified against the raw text and
    * their occurrence counts returned. `pattern` must be ≥ 3 chars (below
    * that the index cannot prune; scan instead, stated loudly). At corpus
    * scale the verification join is a broadcast of the candidate ids into
    * the (manifest-pruned) document read — the corpus is never scanned. */
  def substringSearch(
      postings: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pattern: String
  ): DataFrame = {
    require(pattern.length >= 3,
      s"substring search needs >= 3 chars to prune (got '$pattern'); " +
        "scan with contains() below that")
    val tris = pattern.sliding(3).toSeq.distinct
    val candidates = postings
      .filter(col("tri").isin(tris: _*))
      .groupBy(col("id"))
      .agg(countDistinct(col("tri")).as("__n"))
      .filter(col("__n") === tris.size)
      .select(col("id"))
    docs.join(broadcast(candidates), col(idCol) === col("id"), "left_semi")
      .select(col(idCol).as("doc_id"),
        ((length(col(textCol)) -
          length(replace(col(textCol), lit(pattern), lit("")))) /
          lit(pattern.length)).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Exact phrase match `"first second"` from positional postings: the two
    * terms' lists equi-join on document id and the occurrence count is
    * `|{p ∈ positions(first) : p+1 ∈ positions(second)}|` — an array
    * intersection over the stored offsets, no text rescan. The probe read
    * is two pruned posting lists; the join shuffles only their rows, keyed
    * on document id. */
  def phraseMatch(
      postings: DataFrame,
      first: String,
      second: String
  ): DataFrame = {
    val a = postings.filter(col("term") === first)
      .select(col("id"), col("positions").as("pa"), col("dl"))
    val bb = postings.filter(col("term") === second)
      .select(col("id"), col("positions").as("pb"))
    a.join(bb, "id")
      .select(col("id").as("doc_id"), col("dl"),
        size(array_intersect(
          transform(col("pa"), p => p + lit(1)), col("pb"))).as("n_phrase"))
      .filter(col("n_phrase") > 0)
  }

  /** N-TERM exact phrase match: occurrences where `terms` appear
    * CONSECUTIVELY, counted as `|{p ∈ P₀ : ∀i, p+i ∈ Pᵢ}|` over the
    * stored offsets — [[phraseMatch]] generalized past bigrams. The
    * #terms posting frames equi-join on document id (a phrase is a
    * handful of terms, so the join chain is literal-sized); the position
    * test is one nested higher-order expression, codegen'd. */
  def phraseMatchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.size >= 2, s"a phrase needs at least 2 terms: $terms")
    val head = postings.filter(col("term") === terms.head)
      .select(col("id"), col("positions").as("__p0"), col("dl"))
    val joined = terms.zipWithIndex.tail.foldLeft(head) { case (acc, (t, i)) =>
      acc.join(postings.filter(col("term") === t)
        .select(col("id"), col("positions").as(s"__p$i")), "id")
    }
    val follows = (p: Column) => terms.indices.tail
      .map(i => exists(col(s"__p$i"), q => q === p + lit(i)))
      .reduce(_ && _)
    joined
      .select(col("id").as("doc_id"), col("dl"),
        size(filter(col("__p0"), follows)).as("n_phrase"))
      .filter(col("n_phrase") > 0)
  }

  /** Ordered PROXIMITY match: occurrences of `first` followed by `second`
    * within `window` tokens (phrase = window 1). The occurrence count is
    * `|{p ∈ positions(first) : ∃q ∈ positions(second), 0 < q−p ≤ window}|`
    * — nested higher-order functions over the stored offsets (codegen'd,
    * per-row work bounded by the two lists' lengths), same join shape as
    * [[phraseMatch]]. */
  def proximityMatch(
      postings: DataFrame,
      first: String,
      second: String,
      window: Int
  ): DataFrame = {
    val a = postings.filter(col("term") === first)
      .select(col("id"), col("positions").as("pa"), col("dl"))
    val bb = postings.filter(col("term") === second)
      .select(col("id"), col("positions").as("pb"))
    a.join(bb, "id")
      .select(col("id").as("doc_id"), col("dl"),
        size(filter(col("pa"), p =>
          exists(col("pb"), q =>
            q - p >= lit(1) && q - p <= lit(window)))).as("n_near"))
      .filter(col("n_near") > 0)
  }

  /** nDCG@k of the BM25 ranking against term-frequency pseudo-relevance
    * — the graded retrieval-quality readout (the eval-harness companion
    * to the recall@k rows of the ANN tier): per query, DCG over the
    * top-k ranking with gains (2^grade − 1) and the standard log2
    * position discount, normalized by the ideal ordering's IDCG.
    * Relevance grades derive from the data itself (total occurrences of
    * the query's terms in the document, capped at `maxGrade`) — the
    * classic pseudo-relevance stand-in when no human judgments exist.
    *
    * Determinism: gains are an exact integer lookup (grade → 2^g−1, a
    * map literal — no libm pow); the ONE libm call per row (log2 of a
    * small integer) canonicalizes through DECIMAL(27,12) exactly like
    * the BM25 idf; per-row terms sum through DECIMAL so the per-query
    * reduction is aggregation-order-independent; both rankings break
    * ties on document id.
    *
    * Scale shape: the ranking is [[bm25TopK]] (queries broadcast, one
    * postings scan); grading is one explode + (query, doc)-keyed
    * aggregation over ONLY query-term tokens; DCG/IDCG are k-row-per-
    * query aggregates. Nothing beyond the postings build touches the
    * corpus. */
  def ndcgAtK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      k: Int = 10,
      maxGrade: Int = 3,
      scope: graft.ops.CacheScope = new graft.ops.CacheScope
  ): DataFrame = {
    // tokenization cached once (the package CacheScope pattern, r14):
    // the stats aggregate, bm25TopK's df census + scoring join, and the
    // relevance grades otherwise each re-tokenize the corpus — four
    // full corpus passes where one suffices at any scale
    val toks = scope.cache(
      docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks")))
    val postings = scope.cache(buildPostingsFromTokens(toks))
    val (n, dl) = corpusStatsFromTokens(toks)
    val ranking = bm25TopK(postings, queries, n, dl, k)
    val rels = toks
      .select(col("id").as("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(queries.select(col("query_id"), col("term"))), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(least(lit(maxGrade.toLong), count(lit(1))).cast("int").as("grade"))
    val gains = typedlit((0 to maxGrade).map(g => g -> ((1L << g) - 1)).toMap)
    def logC(x: Column): Column = log2(x).cast(dec).cast("double")
    def gTerm(grade: Column, pos: Column): Column =
      (element_at(gains, grade).cast("double") / logC(pos + 1)).cast(dec)
    val dcg = ranking
      .join(rels, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"),
        gTerm(coalesce(col("grade"), lit(0)), col("rank")).as("g"))
      .groupBy("query_id").agg(sum(col("g")).as("dcg_d"))
    val wI = Window.partitionBy("query_id")
      .orderBy(col("grade").desc, col("doc_id").asc)
    val idcg = rels.withColumn("rn", row_number().over(wI))
      .filter(col("rn") <= k)
      .select(col("query_id"), gTerm(col("grade"), col("rn")).as("g"))
      .groupBy("query_id").agg(sum(col("g")).as("idcg_d"))
    queries.select("query_id").distinct()
      .join(dcg, Seq("query_id"), "left")
      .join(idcg, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("dcg_d").cast("double"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("idcg_d").cast("double"), lit(0.0)), 6).as("idcg"),
        round(when(coalesce(col("idcg_d"), lit(0)) === 0, 0.0)
          .otherwise(col("dcg_d").cast("double") /
            col("idcg_d").cast("double")), 6).as("ndcg"))
  }
}
