package graft.ext

import graft.ops.Similarity
import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ExtSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "GraftExtensions"

  it should "register the vector kernels in the session" in {
    spark.catalog.functionExists("graft_dot_double") shouldBe true
    spark.catalog.functionExists("graft_cosine") shouldBe true
  }

  it should "produce bit-identical results to the HOF formulation" in {
    val df = Seq(
      (Seq(0.1f, -0.2f, 0.37f, 1.5f), Seq(0.9f, 0.04f, -2.2f, 0.001f)),
      (Seq(1f, 2f, 3f, 4f), Seq(4f, 3f, 2f, 1f)),
      (Seq(-1f, 1f, -1f, 1f), Seq(1f, -1f, 1f, -1f))
    ).toDF("a", "b")
    val out = df.select(
      expr("graft_dot_double(a, b)").as("kd"),
      Similarity.dotDouble(col("a"), col("b")).as("hd"),
      expr("graft_cosine(a, b)").as("kc"),
      Similarity.cosine(col("a"), col("b")).as("hc")
    ).collect()
    out.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
      java.lang.Double.doubleToLongBits(r.getDouble(2)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(3))
    }
  }

  it should "compile two kernels spliced into one codegen scope" in {
    // Regression: the dot/cosine loops once used literal `i`/`n` locals, so
    // a projection evaluating the kernel twice in one generated function
    // failed janino compilation ("Redefinition of local variable i") and
    // silently fell back to interpreted eval. freshName'd locals must keep
    // the plan compiling with fallback DISABLED.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        (Seq(1f, 2f, 3f), Seq(3f, 2f, 1f), Seq(0.5f, -1f, 2f))
      ).toDF("a", "b", "c")
      val r = df.select(
        expr("graft_dot_double(a, b)").as("d1"),
        expr("graft_dot_double(a, c)").as("d2"),
        expr("graft_cosine(a, b)").as("c1"),
        expr("graft_cosine(b, c)").as("c2")
      ).collect().head
      r.getDouble(0) shouldBe 10.0
      r.getDouble(1) shouldBe 4.5
      r.getDouble(2) should be > 0.0
      r.getDouble(3) should be < 1.0
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  it should "match the HOF minhash and simhash formulations exactly" in {
    import graft.ops.{Dedup, TextFunctions}
    val df = Seq("the quick brown fox jumps over the lazy dog", "a b c d e f g h")
      .toDF("text")
      .select(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"),
        TextFunctions.tokens(col("text")).as("toks"))
    val out = df.select(
      expr("graft_minhash_sig(sh, 16)").as("ksig"),
      Dedup.minhashSignature(col("sh"), 16).as("hsig"),
      expr("graft_simhash60(transform(toks, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)))").as("ksim"),
      Dedup.simhash(col("toks")).as("hsim")
    ).collect()
    out.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
      r.getLong(2) shouldBe r.getLong(3)
    }
  }

  it should "match the HOF gramsAll formulation exactly" in {
    import graft.ops.TextFunctions
    val df = Seq("a b c d", "x y", "solo", "r r r r r").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val out = df.select(
      expr("graft_grams(toks, 3)").as("kg"),
      TextFunctions.gramsAll(col("toks"), 3).as("hg"),
      expr("graft_grams(toks, 1)").as("kg1"),
      TextFunctions.gramsAll(col("toks"), 1).as("hg1")
    ).collect()
    out.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
      r.getSeq[String](2) shouldBe r.getSeq[String](3)
    }
    // duplicates kept, short input -> empty (NOT the shingles collapse)
    out(3).getSeq[String](0) shouldBe Seq("r r r", "r r r", "r r r")
    out(1).getSeq[String](0) shouldBe Seq.empty
    // null input propagates on both forms
    val nr = Seq(Option.empty[Seq[String]]).toDF("toks").select(
      expr("graft_grams(toks, 2)"), TextFunctions.gramsAll(col("toks"), 2)
    ).collect().head
    nr.isNullAt(0) shouldBe true
    nr.isNullAt(1) shouldBe true
  }

  it should "propagate nulls exactly like the HOF formulations" in {
    import graft.ops.{Dedup, Similarity, TextFunctions}
    val df = Seq((Option.empty[Seq[String]], Option.empty[Seq[Float]], Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))))
      .toDF("toks", "nv", "v2", "v3")
    val r = df.select(
      expr("graft_minhash_sig(toks, 16)").as("ksig"),
      Dedup.minhashSignature(col("toks"), 16).as("hsig"),
      expr("graft_shingles(toks, 3)").as("ksh"),
      TextFunctions.shingles(col("toks"), 3).as("hsh"),
      expr("graft_dot_double(nv, v2)").as("kdn"),
      Similarity.dotDouble(col("nv"), col("v2")).as("hdn"),
      // mismatched lengths: HOF null-pads -> NULL; kernels must match
      expr("graft_dot_double(v2, v3)").as("kdm"),
      Similarity.dotDouble(col("v2"), col("v3")).as("hdm"),
      expr("graft_cosine(v2, v3)").as("kcm"),
      Similarity.cosine(col("v2"), col("v3")).as("hcm")
    ).collect().head
    (0 until 10).foreach(i => r.isNullAt(i) shouldBe true)
  }

  it should "match built-in md5 and the transform-hash60 formulation" in {
    import graft.ops.TextFunctions
    val df = Seq("the quick brown fox", "", "ünïcode tëxt").toDF("text")
      .select(col("text"), TextFunctions.tokens(col("text")).as("toks"))
    df.select(
      expr("graft_md5hex(text)").as("k"),
      md5(col("text")).as("b")
    ).collect().foreach(r => r.getString(0) shouldBe r.getString(1))
    df.select(
      expr("graft_hash60_arr(toks)").as("k"),
      transform(col("toks"), t => TextFunctions.hash60(t)).as("h")
    ).collect().foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  it should "extract flat JSON scalars exactly like get_json_object" in {
    val df = Seq(
      """{"k": 69, "s": "hi"}""",
      """{"k":-12,"s":"a b","f":150.5,"t":true,"z":null}""",
      """{"other": 1}""",
      """{"s": "esc\"aped\nvalue", "k": 7}""",
      """not json at all""",
      """{"arr": [1,2,{"k": 99}], "k": 5}"""
    ).toDF("j")
    Seq("k", "s", "f", "t", "z", "missing").foreach { key =>
      val rows = df.select(
        expr(s"graft_json_get(j, '$key')").as("mine"),
        get_json_object(col("j"), s"$$.$key").as("spark")
      ).collect()
      rows.foreach { r =>
        withClue(s"key=$key row=$r: ") { r.getString(0) shouldBe r.getString(1) }
      }
    }
    // null input propagates
    Seq(Option.empty[String]).toDF("j")
      .select(expr("graft_json_get(j, 'k')")).collect().head.isNullAt(0) shouldBe true
  }

  it should "match the HOF sign-LSH bucket bit for bit" in {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = df.select(
      expr("graft_lsh_bucket(embedding, 8, 64, 0)").as("k0"),
      Similarity.lshBucket(col("embedding"), 8, 64, firstPlane = 0).as("h0"),
      expr("graft_lsh_bucket(embedding, 8, 64, 8)").as("k1"),
      Similarity.lshBucket(col("embedding"), 8, 64, firstPlane = 8).as("h1")
    ).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getInt(0) shouldBe r.getInt(1)
      r.getInt(2) shouldBe r.getInt(3)
    }
    // NULL and wrong-length vectors land in bucket -1 on both routes
    val edge = Seq((Option.empty[Seq[Float]], Some(Seq(1f, 2f))))
      .toDF("nv", "shortv")
    val e = edge.select(
      expr("graft_lsh_bucket(nv, 8, 64, 0)").as("kn"),
      Similarity.lshBucket(col("nv"), 8, 64).as("hn"),
      expr("graft_lsh_bucket(shortv, 8, 64, 0)").as("km"),
      Similarity.lshBucket(col("shortv"), 8, 64).as("hm")
    ).collect().head
    (0 until 4).foreach(i => e.getInt(i) shouldBe -1)
  }

  it should "match the HOF fold bit-for-bit on mixed float/double arrays" in {
    // the k-means centroid path compares float corpus vectors against
    // double centroid literals — the kernel must equal the portable HOF
    // cosine exactly in every type combination
    val df = Seq((Seq(1.5f, -2.25f, 3f), Seq(0.5d, 1.125d, -2.75d)))
      .toDF("fv", "dv")
    val r = df.select(
      expr("graft_cosine(fv, dv)").as("k_fd"),
      Similarity.cosine(col("fv"), col("dv")).as("h_fd"),
      expr("graft_cosine(dv, dv)").as("k_dd"),
      Similarity.cosine(col("dv"), col("dv")).as("h_dd")
    ).collect().head
    java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    java.lang.Double.doubleToRawLongBits(r.getDouble(2)) shouldBe
      java.lang.Double.doubleToRawLongBits(r.getDouble(3))
  }

  it should "stay inside whole-stage codegen" in {
    // literals would constant-fold into a LocalTableScan; use a real scan
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("graft_cosine(embedding, embedding)").as("c"))
    // a "*(n)" prefix marks a WholeStageCodegen stage; the kernel must not
    // demote its Project to interpreted evaluation
    val plan = df.queryExecution.executedPlan.toString
    plan should include ("*(1) Project [graft_cosine")
    // self-cosine of a non-zero vector is exactly 1 up to rounding
    df.limit(5).collect().foreach(_.getDouble(0) shouldBe 1.0 +- 1e-12)
    // the LSH bucket kernel must also stay codegen'd
    val bplan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("graft_lsh_bucket(embedding, 8, 64, 0)").as("b"))
      .queryExecution.executedPlan.toString
    bplan should include ("*(1) Project [graft_lsh_bucket")
  }
}
