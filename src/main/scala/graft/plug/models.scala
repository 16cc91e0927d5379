package graft.plug

import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** A single column override: set `key` (possibly a dotted struct path) to
  * `value` when the owning rule's condition holds.
  *
  * Mirrors the reference data model (reference:
  * src/main/scala/sparkplug/models/PlugRule.scala:10-12) but is compiled to
  * Catalyst `Column` expressions instead of SQL text.
  */
case class PlugAction(key: String, value: String) {
  /** Top-level column this action touches (`price.minPrice` -> `price`). */
  val updateKey: String = key.split('.').head
}

/** Validation error surfaced by [[SparkPlug.validate]].
  * (reference: src/main/scala/sparkplug/models/PlugRuleValidationError.scala:3) */
case class PlugRuleValidationError(name: String, error: String)

/** Audit record appended to the plug-details array column for every row a
  * rule changed. (reference: src/main/scala/sparkplug/models/PlugDetail.scala:3) */
case class PlugDetail(name: String, version: String, fieldNames: Seq[String])

/** A plugging rule: rows matching the Spark-SQL `condition` get each action's
  * column overwritten with the action value (typed literal, or arbitrary SQL
  * when backtick-quoted).
  *
  * (reference: src/main/scala/sparkplug/models/PlugRule.scala:16)
  */
case class PlugRule(name: String, version: String, condition: String, actions: Seq[PlugAction]) {

  /** Static (no-Spark-session) validation: actions non-empty, every action key
    * present in the (recursively flattened) schema, literal coercible to the
    * target type. Error strings match the reference verbatim
    * (reference: PlugRule.scala:23-44).
    */
  def validate(schema: StructType): List[PlugRuleValidationError] = {
    if (actions.isEmpty)
      List(validationError("At the least one action must be specified per rule."))
    else {
      val fields = PlugRule.buildFieldsMap(schema).toMap
      // a path whose parent is a string-keyed map targets one map ENTRY;
      // the entry key is data, so only the parent needs to exist — the
      // value is checked against the map's value type
      def mapEntryValueType(key: String): Option[DataType] = {
        val segs = key.split('.')
        if (segs.length < 2) None
        else fields.get(segs.dropRight(1).mkString(".")).collect {
          case m: org.apache.spark.sql.types.MapType
              if m.keyType == org.apache.spark.sql.types.StringType => m.valueType
        }
      }
      actions.flatMap { action =>
        fields.get(action.key).orElse(mapEntryValueType(action.key)) match {
          case None =>
            Some(validationError(s"""Field "${action.key}" not found in the schema."""))
          // Backtick values bypass static type checking entirely (reference:
          // PlugRule.scala:132-135 converts them without validation); parse
          // errors in the SQL surface at the dry-run as "[SQL Error] ...",
          // never here — coercing them statically would throw ParseException
          // out of validate() instead of returning an error list.
          case Some(dt) if !action.value.contains('`') &&
              RuleCompiler.coerceValue(action.value, dt).isFailure =>
            Some(validationError(s"""Value "${action.value}" cannot be assigned to field ${action.key}."""))
          case _ => None
        }
      }.toList
    }
  }

  private def validationError(message: String) = PlugRuleValidationError(name, message)
}

object PlugRule {
  /** Recursive flatten of a StructType into dotted-path -> DataType pairs;
    * struct parents are included as well (reference: PlugRule.scala:146-151).
    * Extension beyond the reference: an array-of-struct field also
    * contributes its ELEMENT fields (`items.price` where
    * `items: array<struct<price,…>>` maps to the element's price type), so
    * rules can target per-element fields — validated with the element
    * field's type and compiled to a `transform` by the RuleCompiler. */
  def buildFieldsMap(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap {
      case f if f.dataType.isInstanceOf[StructType] =>
        (s"$prefix${f.name}", f.dataType) +:
          buildFieldsMap(f.dataType.asInstanceOf[StructType], s"$prefix${f.name}.")
      case f if f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] =>
        (s"$prefix${f.name}", f.dataType) +:
          buildFieldsMap(
            f.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType],
            s"$prefix${f.name}.")
      case f => Seq((s"$prefix${f.name}", f.dataType))
    }
}
