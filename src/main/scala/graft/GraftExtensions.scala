package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions for the engine's native Catalyst expressions —
  * enable with `spark.sql.extensions=graft.GraftExtensions` (every session
  * this repo creates does). Currently injects:
  *
  *   graft_dot(arrayA, arrayB) -> double   (graft.functions.DotProduct)
  *   graft_polyhash(str)       -> bigint   (graft.functions.PolyHash)
  *
  * Injection (vs a UDF) keeps the function inside whole-stage codegen and
  * visible to SQL, `call_function`, and EXPLAIN like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.polyHashFunction)
  }
}

object GraftExtensions {
  val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        graft.functions.DotProduct(args.head, args(1))
      })

  val polyHashFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "graft_polyhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_polyhash takes 1 argument, got ${args.length}")
        graft.functions.PolyHash(args.head)
      })
}
