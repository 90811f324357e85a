package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.NativeExprs.{DotProductExpr, MinHashSigExpr, SimHash64Expr}

/** SparkSessionExtensions installer: exposes the engine's native
  * Catalyst expressions to SQL users. Load with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * then e.g. `SELECT graft_simhash64(tokens) FROM docs`, making the
  * dedup/similarity primitives available from pure SQL pipelines, not
  * just the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer: prune id-bound filters into Range scans (product
    // section/point lookups on 10^16-element products become O(window)).
    ext.injectOptimizerRule(_ => RangePruneRule)

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(array<string>, numHashes)")
        val n = args(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"numHashes must be an integer literal, got $other")
        }
        MinHashSigExpr(args.head, n)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64(array<string>)")
        SimHash64Expr(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(array<double>, array<double>)")
        DotProductExpr(args(0), args(1))
      }))
  }
}
