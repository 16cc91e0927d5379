package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's codegen'd vector kernels as SQL
  * functions. Install with
  * `spark.sql.extensions=graft.ext.GraftExtensions` — then
  * `expr("graft_cosine(a, b)")` / `graft_dot_double(a, b)` resolve anywhere
  * (SQL text, DataFrame expr, streaming queries).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String,
      build: Seq[Expression] => Expression
  ): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.ext.GraftExtensions", name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects exactly 2 arguments")
        build(args)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_dot_double", args => DotProductDouble(args(0), args(1))))
    ext.injectFunction(fn("graft_cosine", args => CosineSimilarity(args(0), args(1))))
  }
}
