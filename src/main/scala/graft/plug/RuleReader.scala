package graft.plug

import org.apache.spark.sql.SparkSession

/** JSON-lines rule ingestion (reference:
  * src/main/scala/sparkplug/SparkPlugHelper.scala:8-11). Rules are small
  * driver-side objects compiled into the plan — collect() is correct here. */
class RuleReader(val spark: SparkSession) {
  def readPlugRulesFrom(path: String): Array[PlugRule] = {
    import spark.implicits._
    spark.read.json(path).as[PlugRule].collect()
  }
}

object RuleReader {
  implicit def sparkToRuleReader(spark: SparkSession): RuleReader = new RuleReader(spark)
}
