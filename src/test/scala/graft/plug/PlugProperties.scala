package graft.plug

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.types._

/** Property-based checks for the driver-side rule machinery (no Spark jobs:
  * these exercise coercion and validation over arbitrary inputs; the
  * Spark-side behavioral spec lives in SparkPlugSpec). */
object PlugProperties extends Properties("SparkPlug") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("nested", StructType(Seq(
      StructField("inner", StringType),
      StructField("deep", StructType(Seq(StructField("leaf", DoubleType)))))))
  ))

  property("any Int literal coerces to an IntegerType field") = forAll { (i: Int) =>
    RuleCompiler.coerceValue(i.toString, IntegerType).isSuccess
  }

  property("any finite Double literal coerces to a DoubleType field") =
    forAll(Gen.chooseNum(-1e12, 1e12)) { d =>
      RuleCompiler.coerceValue(d.toString, DoubleType).isSuccess
    }

  property("backtick-free strings always coerce to StringType") =
    forAll(Gen.asciiPrintableStr) { s =>
      !s.contains('`') ==> RuleCompiler.coerceValue(s, StringType).isSuccess
    }

  property("non-numeric strings never coerce to IntegerType") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      RuleCompiler.coerceValue(s, IntegerType).isFailure
    }

  property("validate flags exactly the actions whose key is missing") =
    forAll(Gen.listOf(Gen.oneOf("s", "i", "nested.inner", "no_such", "also_missing"))) { keys =>
      keys.nonEmpty ==> {
        val rule = PlugRule("r", "v1", "true", keys.map(k => PlugAction(k, "x")))
        val errs = rule.validate(schema)
        val missing = keys.filter(k => k == "no_such" || k == "also_missing")
        // every missing key is reported (string-typed present keys never fail coercion)
        errs.count(_.error.contains("not found in the schema")) == missing.size &&
          missing.forall(k => errs.exists(_.error.contains(s""""$k"""")))
      }
    }

  property("buildFieldsMap flattens every nested path exactly once") = forAll { (_: Unit) =>
    val paths = PlugRule.buildFieldsMap(schema).map(_._1)
    paths.distinct == paths &&
      paths.toSet == Set("s", "i", "d", "nested", "nested.inner", "nested.deep", "nested.deep.leaf")
  }

  property("backtick values are exempt from static type validation") =
    forAll(Gen.oneOf("i", "d", "s")) { key =>
      val rule = PlugRule("r", "v1", "true", Seq(PlugAction(key, "`not + valid + sql(")))
      // static validation must not attempt the parse (the dry-run reports it)
      rule.validate(schema).isEmpty
    }
}
