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
