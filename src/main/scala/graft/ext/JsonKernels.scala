package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light JSON scalar extraction.
  *
  * `get_json_object` instantiates a Jackson parser per row, and the parser
  * factory acquires a `BufferRecycler` from a `ThreadLocal` per row. On
  * long-lived executor threads whose ThreadLocalMaps have accumulated stale
  * entries, that per-row `ThreadLocal.get` degrades into a linear scan —
  * observed as a 0.5 s query taking 200+ s depending on which worker thread
  * the task lands on. At 100 TB (billions of rows per executor thread) a
  * per-row parser+ThreadLocal acquisition is the wrong shape even on healthy
  * threads.
  *
  * [[JsonGetSimple]] replaces it for the common pipeline case — extracting a
  * top-level scalar from a flat JSON object — with a single generated string
  * scan: no parser object, no ThreadLocal, no per-row allocation beyond the
  * result. Semantics match `get_json_object(json, '$.key')` for well-formed
  * flat objects: numbers/booleans are returned verbatim, strings are
  * unescaped, JSON `null` and missing keys yield SQL NULL. A matched value
  * that is itself an object/array is returned as its raw text span (compact
  * input assumed); malformed input yields NULL.
  *
  * Known divergence: numbers are returned VERBATIM as written, while
  * `get_json_object` re-serializes them through Jackson (`1.5e2` → `150.0`).
  * For canonically-formatted numbers — integers, shortest-form decimals,
  * i.e. everything a machine-generated pipeline emits — the outputs are
  * identical (pinned by ExtSpec).
  */
object JsonKernels {

  /** Extract `key` from a flat JSON object; null when absent/null/malformed. */
  def jsonGetString(json: UTF8String, key: UTF8String): UTF8String = {
    if (json == null || key == null) return null
    val s = json.toString
    val k = key.toString
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return null
    i = skipWs(s, i + 1)
    while (i < n && s.charAt(i) != '}') {
      if (s.charAt(i) != '"') return null
      val keyEnd = stringEnd(s, i)
      if (keyEnd < 0) return null
      val matches = keyEquals(s, i + 1, keyEnd - 1, k)
      i = skipWs(s, keyEnd)
      if (i >= n || s.charAt(i) != ':') return null
      i = skipWs(s, i + 1)
      val valueEnd = valueSpanEnd(s, i)
      if (valueEnd < 0) return null
      if (matches) return extractValue(s, i, valueEnd)
      i = skipWs(s, valueEnd)
      if (i < n && s.charAt(i) == ',') i = skipWs(s, i + 1)
    }
    null
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** Index one past the closing quote of the string starting at `start`
    * (which must point at the opening quote); -1 if unterminated. */
  private def stringEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Compare the (possibly escaped) key text in s[from, to) to `k`. Keys in
    * pipeline JSON are plain identifiers; escaped keys compare unescaped. */
  private def keyEquals(s: String, from: Int, to: Int, k: String): Boolean = {
    if (s.indexOf('\\', from) >= 0 && s.indexOf('\\', from) < to)
      return unescape(s, from, to) == k
    if (to - from != k.length) return false
    var i = 0
    while (i < k.length) {
      if (s.charAt(from + i) != k.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Index one past the end of the value starting at `from`; -1 if malformed. */
  private def valueSpanEnd(s: String, from: Int): Int = {
    val n = s.length
    if (from >= n) return -1
    s.charAt(from) match {
      case '"' => stringEnd(s, from)
      case '{' | '[' =>
        var depth = 0
        var i = from
        while (i < n) {
          s.charAt(i) match {
            case '"' =>
              val e = stringEnd(s, i)
              if (e < 0) return -1
              i = e
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ =>
        var i = from
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
          s.charAt(i) != ']' && !Character.isWhitespace(s.charAt(i))) i += 1
        if (i == from) -1 else i
    }
  }

  private def extractValue(s: String, from: Int, to: Int): UTF8String =
    s.charAt(from) match {
      case '"' => UTF8String.fromString(unescape(s, from + 1, to - 1))
      case 'n' if s.regionMatches(from, "null", 0, 4) => null
      case _ => UTF8String.fromString(s.substring(from, to))
    }

  private def unescape(s: String, from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < to) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < to + 1 =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** `graft_json_get(json, key)`: top-level scalar extraction from flat JSON —
  * see [[JsonKernels]]. Null-propagating; missing key / JSON null → NULL. */
case class JsonGetSimple(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_get"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(json: Any, key: Any): Any =
    JsonKernels.jsonGetString(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (json, key) => {
      s"""
         |${ev.value} = graft.ext.JsonKernels.jsonGetString($json, $key);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
