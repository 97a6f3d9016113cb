package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, HyperplaneSigExpr, JaroWinklerExpr, MinHashSigExpr, MinHashTokensSigExpr, SimHashTokensExpr}

/** Session extensions registering graft's native Catalyst expressions
  * (SURVEY §7.3 tier (b)). Activate either at session build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")`) or
  * imperatively on a live session via [[GraftExtensions.register]] —
  * the latter lets driver-owned sessions opt in after the fact.
  * After registration: `call_function("graft_cosine", a, b)` / SQL
  * `graft_cosine(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.minhashDescriptor)
    ext.injectFunction(GraftExtensions.hyperplaneDescriptor)
    ext.injectFunction(GraftExtensions.minhashTokensDescriptor)
    ext.injectFunction(GraftExtensions.simhashTokensDescriptor)
    ext.injectFunction(GraftExtensions.jaroWinklerDescriptor)
  }
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

  private val minhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_minhash takes (array<string> shingles, int numHashes), got ${args.length} args")
      val numHashes = args(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "graft_minhash numHashes must be a literal")
      }
      MinHashSigExpr(args.head, numHashes)
    })

  private def intLiteral(e: Expression, what: String): Int = e match {
    case l if l.foldable => l.eval() match {
      case i: Int => i
      case lg: Long => lg.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$what must be a literal")
  }

  private val hyperplaneDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSigExpr].getName, "graft_hyperplane_sig"),
    (args: Seq[Expression]) => {
      require(args.length == 3 || args.length == 4,
        "graft_hyperplane_sig takes (array vec, int dim, int nBits[, bigint seed])" +
          s", got ${args.length} args")
      val seed = if (args.length == 4) intLiteral(args(3), "seed").toLong else 42L
      // explicit element cast: float-array columns arrive as array<float>
      val vec = org.apache.spark.sql.catalyst.expressions.Cast(args.head,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
      HyperplaneSigExpr(vec, intLiteral(args(1), "dim"),
        intLiteral(args(2), "nBits"), seed)
    })

  /** fused tokens→MinHash-signature kernel for SQL:
    * graft_minhash_tokens(array<string> tokens, int ngram, int numHashes) —
    * the full tokenize-side pipeline as one function call. */
  private val minhashTokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_tokens"),
    new ExpressionInfo(classOf[MinHashTokensSigExpr].getName, "graft_minhash_tokens"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_minhash_tokens takes (array<string> tokens, int ngram, int numHashes)" +
          s", got ${args.length} args")
      MinHashTokensSigExpr(args.head,
        intLiteral(args(1), "ngram"), intLiteral(args(2), "numHashes"))
    })

  /** fused tokens→SimHash kernel for SQL:
    * graft_simhash_tokens(array<string> tokens). */
  private val simhashTokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash_tokens"),
    new ExpressionInfo(classOf[SimHashTokensExpr].getName, "graft_simhash_tokens"),
    (args: Seq[Expression]) => {
      require(args.length == 1,
        s"graft_simhash_tokens takes (array<string> tokens), got ${args.length} args")
      SimHashTokensExpr(args.head)
    })

  /** record-linkage scoring for SQL: graft_jaro_winkler(string, string). */
  private val jaroWinklerDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jaro_winkler"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_jaro_winkler takes 2 string arguments, got ${args.length}")
      JaroWinklerExpr(args.head, args.last)
    })

  /** imperative registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    Seq(cosineDescriptor, minhashDescriptor, hyperplaneDescriptor,
      minhashTokensDescriptor, simhashTokensDescriptor,
      jaroWinklerDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
  }
}
