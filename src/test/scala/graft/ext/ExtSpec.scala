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
  }
}
