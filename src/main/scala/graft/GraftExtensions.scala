package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarityExpr

/** Session extensions registering graft's native Catalyst expressions
  * (SURVEY §7.3 tier (b)). Activate either at session build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")`) or
  * imperatively on a live session via [[GraftExtensions.register]] —
  * the latter lets driver-owned sessions opt in after the fact.
  * After registration: `call_function("graft_cosine", a, b)` / SQL
  * `graft_cosine(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineDescriptor)
}

object GraftExtensions {
  private val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"graft_cosine takes 2 arguments, got ${args.length}")
      // explicit element casts: float-array columns arrive as array<double>
      val asDouble = args.map(a =>
        org.apache.spark.sql.catalyst.expressions.Cast(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      CosineSimilarityExpr(asDouble.head, asDouble.last)
    })

  /** imperative registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineDescriptor._1, cosineDescriptor._2, cosineDescriptor._3)
}
