package graft.plug

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Builds the audit-trail array column.
  *
  * The reference implements this as a registered `UDF4` appending a
  * `GenericRowWithSchema` (reference:
  * src/main/scala/sparkplug/udfs/SparkPlugUDFs.scala:14-31). We express both
  * the empty-array initializer and the append as built-in Catalyst
  * expressions (`array`, `struct`, `concat`) so the audit trail stays inside
  * whole-stage codegen — no UDF, no codegen fence, no extra serialization.
  *
  * Custom audit record types (reference README.md:108-136) are supported by
  * supplying a custom record-struct builder instead of a custom UDF: strictly
  * more efficient, same expressive power for record shapes.
  */
trait AuditAppender extends Serializable {
  /** Schema of one audit record. */
  def detailSchema: StructType

  /** Schema-correct empty audit array (replaces the reference's
    * `udf(() => Seq[T]())`, SparkPlugUDFs.scala:22). */
  def emptyDetails: Column = array().cast(ArrayType(detailSchema, containsNull = true))

  /** One audit record as a struct Column. */
  def record(ruleName: String, ruleVersion: String, fieldNames: Seq[String]): Column

  /** Append one record to the current audit array. */
  def append(current: Column, ruleName: String, ruleVersion: String, fieldNames: Seq[String]): Column =
    concat(current, array(record(ruleName, ruleVersion, fieldNames).cast(detailSchema)))
}

object AuditAppender {
  /** Default appender producing [[PlugDetail]](name, version, fieldNames). */
  val default: AuditAppender = new AuditAppender {
    override val detailSchema: StructType = Encoders.product[PlugDetail].schema
    override def record(ruleName: String, ruleVersion: String, fieldNames: Seq[String]): Column =
      struct(
        lit(ruleName).as("name"),
        lit(ruleVersion).as("version"),
        typedlit(fieldNames).as("fieldNames")
      )
  }

  /** Custom audit record type: derive the schema from a case class and let
    * the caller shape the record struct (fields must match the case class). */
  def forProduct[T <: Product: scala.reflect.runtime.universe.TypeTag](
      build: (String, String, Seq[String]) => Column
  ): AuditAppender = new AuditAppender {
    override val detailSchema: StructType = Encoders.product[T].schema
    override def record(ruleName: String, ruleVersion: String, fieldNames: Seq[String]): Column =
      build(ruleName, ruleVersion, fieldNames)
  }
}
