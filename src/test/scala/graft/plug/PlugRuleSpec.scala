package graft.plug

import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Static-validation unit tests, no Spark session — ported from the
  * reference (src/test/scala/sparkplug/models/PlugRuleSpec.scala). */
class PlugRuleSpec extends AnyFlatSpec with Matchers {

  val nested = StructType(Seq(
    StructField("a", StringType),
    StructField("b", StructType(Seq(
      StructField("c", IntegerType),
      StructField("d", StructType(Seq(StructField("e", DoubleType)))))))))

  "PlugRule.validate" should "reject empty actions" in {
    PlugRule("r", "v", "true", Seq.empty).validate(nested) shouldBe
      List(PlugRuleValidationError("r", "At the least one action must be specified per rule."))
  }

  it should "reject fields not in the schema" in {
    PlugRule("r", "v", "true", Seq(PlugAction("zzz", "1"))).validate(nested) shouldBe
      List(PlugRuleValidationError("r", """Field "zzz" not found in the schema."""))
  }

  it should "accept nested fields to depth 3" in {
    PlugRule("r", "v", "true", Seq(PlugAction("b.d.e", "1.5"))).validate(nested) shouldBe Nil
  }

  it should "accept backtick null on a struct field" in {
    PlugRule("r", "v", "true", Seq(PlugAction("b.d", "`null`"))).validate(nested) shouldBe Nil
  }

  it should "reject type-incompatible literals at each depth" in {
    PlugRule("r", "v", "true", Seq(PlugAction("b.c", "xyz"))).validate(nested) shouldBe
      List(PlugRuleValidationError("r", """Value "xyz" cannot be assigned to field b.c."""))
    PlugRule("r", "v", "true", Seq(PlugAction("b.d.e", "xyz"))).validate(nested) shouldBe
      List(PlugRuleValidationError("r", """Value "xyz" cannot be assigned to field b.d.e."""))
  }

  it should "reject literals for unsupported target types" in {
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    PlugRule("r", "v", "true", Seq(PlugAction("ts", "2024-01-01"))).validate(schema) shouldBe
      List(PlugRuleValidationError("r", """Value "2024-01-01" cannot be assigned to field ts."""))
  }

  "RuleCompiler.coerceValue" should "coerce Int, Double, String and pass through backticks" in {
    RuleCompiler.coerceValue("42", IntegerType).isSuccess shouldBe true
    RuleCompiler.coerceValue("4.2", DoubleType).isSuccess shouldBe true
    RuleCompiler.coerceValue("x", StringType).isSuccess shouldBe true
    RuleCompiler.coerceValue("4.2", IntegerType).isFailure shouldBe true
    RuleCompiler.coerceValue("`concat(a, b)`", IntegerType).isSuccess shouldBe true
    RuleCompiler.coerceValue("x", LongType).isFailure shouldBe true
  }
}
