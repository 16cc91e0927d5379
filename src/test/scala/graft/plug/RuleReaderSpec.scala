package graft.plug

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** JSON-lines rule ingestion — ported from the reference
  * (src/test/scala/sparkplug/SparkPlugHelperSpec.scala). */
class RuleReaderSpec extends AnyFlatSpec with Matchers {

  "RuleReader" should "parse JSON-lines rules" in {
    val spark = TestSpark.session
    val path = java.nio.file.Files.createTempFile("rules", ".json")
    java.nio.file.Files.writeString(path,
      """{"name": "rule1", "version": "version1", "condition": "title like '%iPhone%'", "actions": [{ "key": "title", "value": "Apple iPhone"}]}
        |{"name": "rule2", "version": "version1", "condition": "title like '%Galaxy%'", "actions": [{ "key": "title", "value": "Samsung Galaxy"}]}
        |""".stripMargin)
    import RuleReader._
    val rules = spark.readPlugRulesFrom(path.toString).sortBy(_.name)
    rules shouldBe Array(
      PlugRule("rule1", "version1", "title like '%iPhone%'", Seq(PlugAction("title", "Apple iPhone"))),
      PlugRule("rule2", "version1", "title like '%Galaxy%'", Seq(PlugAction("title", "Samsung Galaxy"))))
  }
}
