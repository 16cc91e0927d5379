package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

private[ext] trait FloatArrayArgs { self: BinaryExpression =>
  def checkFloatArrays(name: String): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** Codegen'd float-vector kernels.
  *
  * The composable route (`zip_with` + `aggregate`) is CodegenFallback: it
  * breaks whole-stage codegen and allocates an intermediate array per row.
  * These expressions generate a tight fused loop instead — the semantics
  * (strict left-to-right double accumulation; NULL for NULL inputs and for
  * mismatched lengths, where `zip_with`'s null-padding poisons the fold)
  * match the higher-order-function formulation bit for bit, so results are
  * interchangeable with [[graft.ops.Similarity.dotDouble]] / `cosine` and
  * with the DuckDB `list_reduce` oracle.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayArgs {

  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  double s = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    s += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |  }
         |  ${ev.value} = s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass cosine similarity: accumulates dot(a,b), |a|² and |b|² in a
  * single fused loop (the HOF formulation needs three passes). Each sum is
  * sequentially accumulated exactly like the three-pass version, so the
  * result is bit-identical. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayArgs {

  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  double dot = 0.0, na = 0.0, nb = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    double xv = (double) $a.getFloat(i);
         |    double yv = (double) $b.getFloat(i);
         |    dot += xv * yv; na += xv * xv; nb += yv * yv;
         |  }
         |  ${ev.value} = dot / (Math.sqrt(na) * Math.sqrt(nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
