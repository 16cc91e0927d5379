package graft.ops

import graft.plug.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The constraint gate counts exactly the violating rows — including the
  * null/duplicate/dangling-key edge semantics each rule documents. */
class QualitySpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._
  import Quality._

  behavior of "Quality.constraintReport"

  it should "count violations per rule with one scan for row-local rules" in {
    val df = Seq(
      (Some(1L), Some(10.0), "A"),
      (Some(2L), Some(-5.0), "B"),   // range violation
      (None, Some(20.0), "A"),       // null key
      (Some(2L), None, "C"),         // dup key + null value (range skips) + bad status
      (Some(3L), Some(999.0), "A")   // range violation
    ).toDF("id", "v", "status")
    val dim = Seq(1L, 2L).toDF("k") // id 3 dangles

    val report = constraintReport(df, Seq(
      NotNull("id"),
      InRange("v", 0.0, 100.0),
      Accepted("status", Seq("A", "B")),
      Unique(Seq("id")),
      ForeignKey("id", "dim", dim, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    report("not_null(id)") shouldBe ((5L, 1L))
    report("in_range(v,0.0,100.0)") shouldBe ((4L, 2L))   // nulls skipped
    report("accepted(status)") shouldBe ((5L, 1L))
    report("unique(id)") shouldBe ((5L, 1L))              // one extra row of id=2
    report("foreign_key(id->dim.k)") shouldBe ((4L, 1L))  // null key skipped; 3 dangles

    passes(df, Seq(NotNull("status"))) shouldBe true
    passes(df, Seq(NotNull("id"))) shouldBe false
  }

  it should "hold all row-local rules inside a single aggregate over a single scan" in {
    val df = Seq((1L, 2.0, "A")).toDF("id", "v", "status")
    val report = constraintReport(df, Seq(
      NotNull("id"), NotNull("status"), InRange("v", 0.0, 10.0),
      Accepted("status", Seq("A"))))
    report.collect().length shouldBe 4
    // exactly one scan node: four rules, one pass
    val scans = report.queryExecution.executedPlan.collectLeaves()
    scans.length shouldBe 1
  }


  behavior of "Quality.kAnonymityReport"

  it should "census quasi-identifier groups below k" in {
    // groups: (a,x)=3 rows, (a,y)=1 row, (b,x)=2 rows -> k=3: two violate
    val df = Seq(("a","x"),("a","x"),("a","x"),("a","y"),("b","x"),("b","x"))
      .toDF("lang", "source")
    val r = Quality.kAnonymityReport(df, Seq("lang", "source"), k = 3L)
      .collect()(0)
    r.getLong(0) shouldBe 3L            // k
    r.getLong(1) shouldBe 3L            // n_groups
    r.getLong(2) shouldBe 2L            // violating
    r.getLong(3) shouldBe 3L            // rows at risk (1 + 2)
    r.getLong(4) shouldBe 1L            // min group size
    // a k everyone satisfies reports zero risk
    val ok = Quality.kAnonymityReport(df, Seq("lang"), k = 2L).collect()(0)
    ok.getLong(2) shouldBe 0L
    ok.getLong(3) shouldBe 0L
  }

  behavior of "Quality.lDiversityReport"

  it should "flag quasi-groups whose sensitive values lack diversity" in {
    // group (a): 3 rows, 1 distinct sensitive -> leaks even at k=3
    // group (b): 2 rows, 2 distinct -> diverse at l=2, not at l=3
    val df = Seq(("a","s1"),("a","s1"),("a","s1"),("b","s1"),("b","s2"))
      .toDF("q", "sens")
    val r = Quality.lDiversityReport(df, Seq("q"), "sens", l = 2L).collect()(0)
    r.getLong(1) shouldBe 2L  // groups
    r.getLong(2) shouldBe 1L  // violating (a)
    r.getLong(3) shouldBe 3L  // rows at risk
    r.getLong(4) shouldBe 1L  // min distinct
    val r3 = Quality.lDiversityReport(df, Seq("q"), "sens", l = 3L).collect()(0)
    r3.getLong(2) shouldBe 2L
    r3.getLong(3) shouldBe 5L
  }

  behavior of "Quality.psiDrift"

  it should "score identical distributions near zero and shifts high" in {
    val base = (1 to 200).map(i => ("en", (i % 100).toDouble)).toDF("lang", "x")
    val same = Quality.psiDrift(base, base, "lang", "x",
        binWidth = 10.0, nBins = 10)
      .collect()(0)
    same.getLong(1) shouldBe 200L
    same.getLong(2) shouldBe 200L
    same.getDouble(3) shouldBe 0.0 +- 1e-9
    // push every value into the top bin: a hard shift
    val shifted = (1 to 200).map(i => ("en", 95.0)).toDF("lang", "x")
    val drift = Quality.psiDrift(base, shifted, "lang", "x",
        binWidth = 10.0, nBins = 10)
      .collect()(0)
    drift.getDouble(3) should be > 0.25
    // keys missing on one side still census over the full bin domain
    val two = base.union(Seq(("fr", 5.0)).toDF("lang", "x"))
    Quality.psiDrift(two, base, "lang", "x", 10.0, 10)
      .collect().map(_.getString(0)).sorted shouldBe Array("en", "fr")
  }

  behavior of "Quality.linearScore"

  it should "score documents with literal weights and no shuffle" in {
    val docs = Seq((1L, "good text here"), (2L, "bad"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    // hand model: single weight bucket-independent check is impossible
    // with d=1 collapsing every token to w(0) — mean pooling then makes
    // score = sigmoid(bias + w0) for EVERY doc
    val flat = Quality.linearScore(docs, "doc_id", "text",
        weights = Seq(2.0), bias = -1.0, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1)
    flat.map(_._2) shouldBe Array(3, 1, 4) // token counts
    all(flat.map(_._3)) shouldBe (1.0 / (1.0 + math.exp(-1.0)) +- 1e-12)
    all(flat.map(_._4)) shouldBe 1
    // deterministic pseudo-weights reproduce the md5 derivation
    val w = Quality.pseudoWeights(4)
    w.length shouldBe 4
    all(w.map(math.abs)) should be <= 1.0
    w shouldBe Quality.pseudoWeights(4)
    // scale shape: weights are plan literals — no join, no exchange
    val plan = Quality.linearScore(docs, "doc_id", "text",
        Quality.pseudoWeights(64), bias = 0.1)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  behavior of "linear-model artifacts"

  it should "round-trip a model through the committed registry and refuse corrupt bytes" in {
    val w = Quality.pseudoWeights(32)
    val bytes = Quality.linearModelBytes(w, bias = -0.05)
    Quality.parseLinearModelBytes(bytes) shouldBe ((w, -0.05))
    // truncation must fail at parse, never score garbage
    an[IllegalArgumentException] should be thrownBy
      Quality.parseLinearModelBytes(bytes.dropRight(3))
    an[IllegalArgumentException] should be thrownBy
      Quality.parseLinearModelBytes("not a model".getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("modelreg").toString
    try {
      Quality.commitLinearModel(spark, dir, "quality-lr", w, -0.05)
      Quality.loadLinearModel(spark, dir, "quality-lr") shouldBe ((w, -0.05))
      // a second model ships without disturbing the first; re-shipping
      // replaces in ONE snapshot (the registry is always exactly the
      // shipped set)
      Quality.commitLinearModel(spark, dir, "toxicity-lr",
        Quality.pseudoWeights(16), 0.2)
      Quality.commitLinearModel(spark, dir, "quality-lr", w.map(_ * 2), 0.0)
      Quality.loadLinearModel(spark, dir, "quality-lr") shouldBe
        ((w.map(_ * 2), 0.0))
      Quality.loadLinearModel(spark, dir, "toxicity-lr") shouldBe
        ((Quality.pseudoWeights(16), 0.2))
      // and the scoring path consumes the loaded artifact
      val docs = Seq((1L, "hello world"), (2L, "a b c")).toDF("doc_id", "text")
      val viaArtifact = Quality.linearScoreFromArtifact(
        docs, "doc_id", "text", dir, "toxicity-lr").collect().map(_.toString).sorted
      val direct = Quality.linearScore(
        docs, "doc_id", "text", Quality.pseudoWeights(16), 0.2)
        .collect().map(_.toString).sorted
      viaArtifact shouldBe direct
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  it should "refuse to commit over a broken registry instead of wiping siblings" in {
    // r12 ADVICE (medium): the old catch-all treated ANY read failure as
    // "empty registry", so a corrupted pointer made the next commit
    // silently snapshot ONLY the new model — every sibling wiped from
    // CURRENT while the call reported success. A broken registry must
    // refuse the commit; only a verified-absent one starts from empty.
    val dir = java.nio.file.Files.createTempDirectory("modelreg_broken").toString
    try {
      Quality.commitLinearModel(spark, dir, "model-a", Seq(1.0, 2.0), 0.1)
      // corrupt the CURRENT pointer: the table now EXISTS but can't read
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "CURRENT"),
        "manifest-that-does-not-exist.txt".getBytes("UTF-8")): Unit
      a[Throwable] should be thrownBy
        Quality.commitLinearModel(spark, dir, "model-b", Seq(3.0), 0.0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  behavior of "MLP artifacts"

  it should "round-trip an MLP through the GMLP layout and refuse malformed bytes" in {
    val layers: Seq[(Seq[Seq[Double]], Seq[Double])] = Seq(
      (Seq(Seq(0.5, -1.0), Seq(2.0, 0.25), Seq(-0.5, 1.5)), Seq(0.1, -0.2, 0.0)),
      (Seq(Seq(1.0, -1.0, 0.5)), Seq(0.75)))
    val bytes = Quality.mlpBytes(layers)
    Quality.parseMlpBytes(bytes) shouldBe layers
    // truncation / trailing garbage must fail at parse, never score
    an[IllegalArgumentException] should be thrownBy
      Quality.parseMlpBytes(bytes.dropRight(5))
    an[IllegalArgumentException] should be thrownBy
      Quality.parseMlpBytes(bytes ++ Array[Byte](0, 0))
    an[IllegalArgumentException] should be thrownBy
      Quality.parseMlpBytes("nope".getBytes("UTF-8"))
    // incompatible layer shapes refuse at build AND at parse-time check
    an[IllegalArgumentException] should be thrownBy
      Quality.mlpBytes(Seq((Seq(Seq(1.0), Seq(2.0)), Seq(0.0)))) // rows != bias
  }

  it should "run a real forward pass: hand-computed ReLU MLP" in {
    // layer 1: 2 -> 2, layer 2: 2 -> 1; x = (1, 2)
    // z1_0 = 0.5 + 1*1 + (-1)*2 = -0.5 -> relu 0
    // z1_1 = -1.0 + 0.5*1 + 2*2 = 3.5  -> relu 3.5
    // y = 0.25 + 2*0 + (-1)*3.5 = -3.25 (identity on the last layer)
    val layers: Seq[(Seq[Seq[Double]], Seq[Double])] = Seq(
      (Seq(Seq(1.0, -1.0), Seq(0.5, 2.0)), Seq(0.5, -1.0)),
      (Seq(Seq(2.0, -1.0)), Seq(0.25)))
    Quality.mlpForward(Seq(1.0, 2.0), layers) shouldBe Seq(-3.25)
    an[IllegalArgumentException] should be thrownBy
      Quality.mlpForward(Seq(1.0), layers) // dim mismatch
  }

  it should "embed through the seam with a SHIPPED real MLP, not a stub" in {
    import graft.ops.Multimodal
    val layers: Seq[(Seq[Seq[Double]], Seq[Double])] = Seq(
      ((0 until 3).map(i => (0 until 8).map(j => ((i * 8 + j) % 5 - 2) / 4.0)),
        Seq(0.1, -0.1, 0.3)),
      (Seq(Seq(1.0, 0.5, -0.25), Seq(-1.0, 0.0, 2.0)), Seq(0.0, 0.5)))
    val dir = java.nio.file.Files.createTempDirectory("mlpreg").toString
    try {
      Quality.commitModelBytes(spark, dir, "vision-mlp", Quality.mlpBytes(layers))
      val shipped = Quality.loadModelBytes(spark, dir, "vision-mlp")
      val docs = Seq((1L, "hello world"), (2L, "y" * 33)).toDF("doc_id", "text")
      val out = Multimodal.embedMlpWithModel(
        Multimodal.asMedia(docs, "doc_id", "text"), shipped)
        .collect().sortBy(_.id)
      // the features must equal mlpForward over the deterministic input
      // derivation — i.e. the SHIPPED weight matrices did the arithmetic
      val base = Multimodal.embedBatched(
        Multimodal.asMedia(docs, "doc_id", "text"))
        .collect().sortBy(_.id)
      out.zip(base).foreach { case (o, b) =>
        o.embedding shouldBe Quality.mlpForward(b.embedding, layers)
      }
      out.foreach(_.embedding.size shouldBe 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  it should "derive pixel features: changing a pixel changes the embedding, the id never does" in {
    import graft.ops.Multimodal
    val layers: Seq[(Seq[Seq[Double]], Seq[Double])] = Seq(
      ((0 until 3).map(i => (0 until 8).map(j => ((i * 8 + j) % 5 - 2) / 4.0)),
        Seq(0.1, -0.1, 0.3)),
      (Seq(Seq(1.0, 0.5, -0.25), Seq(-1.0, 0.0, 2.0)), Seq(0.0, 0.5)))
    val bytes = Quality.mlpBytes(layers)
    // pixel sensitivity: same id, payloads differing in ONE pixel byte
    // (text byte 0 feeds grid cell g=0 via the cycled BMP pixel area) →
    // different embeddings. Identity INsensitivity: different ids over
    // identical payloads → identical embeddings (the md5(id) stub is
    // provably gone from this path).
    val base = "hello world, a fixed pixel source"
    val flip = "Jello world, a fixed pixel source" // one byte differs
    val docs = Seq((1L, base), (2L, flip), (3L, base)).toDF("doc_id", "text")
    val out = Multimodal.embedMlpPixels(
      Multimodal.asMedia(docs, "doc_id", "text"), bytes)
      .collect().sortBy(_.id)
    out(0).embedding should not be out(1).embedding
    out(0).embedding shouldBe out(2).embedding
    // and the features really are the folded luminance grid through the
    // real forward pass
    val payload = Multimodal.toBmp(base.getBytes("UTF-8"))
    val lum = Multimodal.lumGrid64(payload)
    val x = (0 until 8).map(j => (0 until 8).map(k => lum(j + 8 * k)).sum / 6120.0)
    out(0).embedding shouldBe Quality.mlpForward(x, layers)
    // a model whose input width doesn't divide the 8x8 grid refuses
    val bad = Quality.mlpBytes(Seq(
      (Seq(Seq(1.0, 2.0, 3.0)), Seq(0.0)))) // din = 3
    val thrown = the[org.apache.spark.SparkException] thrownBy
      Multimodal.embedMlpPixels(
        Multimodal.asMedia(docs, "doc_id", "text"), bad).collect()
    thrown.getMessage should include regex "dividing 64|input width"
  }

  it should "land BOTH rows when two models ship concurrently (loser rebases, never lost-updates)" in {
    val dir = java.nio.file.Files.createTempDirectory("mrace_reg").toString
    try {
      // barrier-sync two ships of DIFFERENT models into one registry:
      // both read the same (absent/initial) state, so at most one CAS
      // wins the first slot and the loser MUST rebase — the pre-r14
      // read-modify-write would leave the loser failed (no retry) or,
      // without the CAS, silently drop the winner's row
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val futs = Seq("model-a", "model-b").map { name =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              barrier.await()
              Quality.commitModelBytes(spark, dir, name,
                name.getBytes("UTF-8"))
            }
          })
        }
        futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      val rows = graft.sources.ManifestTable.read(spark, dir)
        .select("model_name").as[String].collect().sorted
      rows shouldBe Array("model-a", "model-b")
      // and both artifacts load back intact from CURRENT
      new String(Quality.loadModelBytes(spark, dir, "model-a"), "UTF-8") shouldBe "model-a"
      new String(Quality.loadModelBytes(spark, dir, "model-b"), "UTF-8") shouldBe "model-b"
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  it should "bind a model to its training corpus and refuse a superseded snapshot" in {
    val M = graft.sources.ManifestTable
    val corpus = java.nio.file.Files.createTempDirectory("mbind_corpus").toString
    val reg = java.nio.file.Files.createTempDirectory("mbind_reg").toString
    try {
      val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      M.commit(spark, corpus, docs)
      val v0 = M.currentVersion(spark, corpus)
      Quality.commitModelBytesBound(spark, reg, "quality-lr",
        Quality.linearModelBytes(Quality.pseudoWeights(8), 0.1), corpus, v0)
      // fresh: served
      Quality.linearScoreFromArtifact(M.read(spark, corpus), "doc_id", "text",
        reg, "quality-lr", requireFresh = true).count() shouldBe 2
      // the corpus moves on; the bound model is now stale and must refuse
      M.append(spark, corpus, Seq((3L, "epsilon zeta")).toDF("doc_id", "text"))
      an[IllegalStateException] should be thrownBy
        Quality.linearScoreFromArtifact(M.read(spark, corpus), "doc_id", "text",
          reg, "quality-lr", requireFresh = true)
      // an UNBOUND model can't claim freshness either
      val reg2 = java.nio.file.Files.createTempDirectory("mbind_reg2").toString
      try {
        Quality.commitLinearModel(spark, reg2, "quality-lr",
          Quality.pseudoWeights(8), 0.1)
        an[IllegalStateException] should be thrownBy
          Quality.linearScoreFromArtifact(M.read(spark, corpus), "doc_id",
            "text", reg2, "quality-lr", requireFresh = true)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(reg2))
      }
      // re-ship bound to the new version: served again, siblings carried
      Quality.commitModelBytesBound(spark, reg, "quality-lr",
        Quality.linearModelBytes(Quality.pseudoWeights(8), 0.1),
        corpus, M.currentVersion(spark, corpus))
      Quality.linearScoreFromArtifact(M.read(spark, corpus), "doc_id", "text",
        reg, "quality-lr", requireFresh = true).count() shouldBe 3
      // the binding is PER MODEL, not per registry snapshot: shipping an
      // UNBOUND sibling must not break quality-lr's freshness...
      Quality.commitLinearModel(spark, reg, "toxicity-lr",
        Quality.pseudoWeights(4), 0.0)
      Quality.linearScoreFromArtifact(M.read(spark, corpus), "doc_id", "text",
        reg, "quality-lr", requireFresh = true).count() shouldBe 3
      an[IllegalStateException] should be thrownBy
        Quality.requireModelFresh(spark, reg, "toxicity-lr") // still unbound
      // ...and a sibling bound to a DIFFERENT corpus keeps its own gate:
      // quality-lr stays fresh against corpusA; the sibling's gate tracks
      // corpusB and refuses when only corpusB moves
      val corpusB = java.nio.file.Files.createTempDirectory("mbind_corpusB").toString
      try {
        M.commit(spark, corpusB, Seq((9L, "eta theta")).toDF("doc_id", "text"))
        Quality.commitModelBytesBound(spark, reg, "toxicity-lr",
          Quality.linearModelBytes(Quality.pseudoWeights(4), 0.0),
          corpusB, M.currentVersion(spark, corpusB))
        Quality.requireModelFresh(spark, reg, "quality-lr")
        Quality.requireModelFresh(spark, reg, "toxicity-lr")
        M.append(spark, corpusB, Seq((10L, "iota")).toDF("doc_id", "text"))
        an[IllegalStateException] should be thrownBy
          Quality.requireModelFresh(spark, reg, "toxicity-lr")
        Quality.requireModelFresh(spark, reg, "quality-lr") // unaffected
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(corpusB))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(corpus))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(reg))
    }
  }

  it should "feed the embed seam from shipped artifact bytes" in {
    import graft.ops.Multimodal
    val docs = Seq((1L, "hello"), (2L, "x" * 50)).toDF("doc_id", "text")
    val w = Quality.pseudoWeights(8)
    val bytes = Quality.linearModelBytes(w, bias = 0.25)
    val out = Multimodal.embedBatchedWithModel(
      Multimodal.asMedia(docs, "doc_id", "text"), bytes)
      .collect().sortBy(_.id)
    val plain = Multimodal.embedBatched(
      Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().sortBy(_.id)
    // the shipped bytes -- not a literal -- shifted every component by
    // bias + w(j): proof the per-partition parse consumed the artifact
    out.zip(plain).foreach { case (a, b) =>
      a.embedding.zip(b.embedding).zipWithIndex.foreach { case ((x, y), j) =>
        x shouldBe (y + 0.25 + w(j)) +- 1e-12
      }
    }
  }
}
