package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash straight from a TOKEN array: distinct-token dedup, xxhash64,
  * and the per-bit majority vote fused into ONE codegen'd expression.
  *
  * Why (same reasoning as [[MinHashTokensSigExpr]]): the aggregate
  * formulation (`Dedup.simhashSigsAgg`) explodes distinct tokens AND the 64
  * bit positions — 64 shuffle rows per token — while the Column fold form
  * (`Dedup.simhash64`) inlines 64 CodegenFallback `aggregate` lambdas that
  * re-walk the token array per bit. This kernel walks each distinct token
  * once, updates all 64 vote counters in a tight loop, and emits the
  * assembled signature — no explode, no shuffle, whole-stage codegen.
  *
  * Bit-identical to both other forms (asserted in OperatorsSpec): the same
  * seed-42 xxhash64 per DISTINCT token (dedup by exact string equality, the
  * `array_distinct` semantics), vote > 0 sets the bit. An empty token array
  * yields votes of all zero → signature 0L, matching `simhash64` (a
  * zero-token doc cannot occur from the tokenizer, which yields [""]).
  */
case class SimHashTokensExpr(child: Expression, md5Portable: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_tokens requires array<string> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash_tokens"

  override def nullSafeEval(input: Any): Any =
    SimHashTokensExpr.compute(input.asInstanceOf[ArrayData], md5Portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.functions.SimHashTokensExpr.compute($xs, $md5Portable);")

  override protected def withNewChildInternal(newChild: Expression): SimHashTokensExpr =
    copy(child = newChild)
}

object SimHashTokensExpr {
  /** shared by interpreted eval and generated code. md5Portable = the
    * DuckDB-replicable 60-bit variant: token hash = first 15 md5 hex chars
    * (top 60 bits of the first 8 digest bytes), votes over 60 bit positions
    * — matching `conv(substring(md5(tok), 1, 15), 16, 10)` exactly. */
  def compute(toks: ArrayData, md5Portable: Boolean): Long = {
    val nBits = if (md5Portable) 60 else 64
    val len = toks.numElements()
    val votes = new Array[Int](nBits)
    val seen = new java.util.HashSet[UTF8String](math.max(16, len * 2))
    var t = 0
    while (t < len) {
      if (!toks.isNullAt(t)) {
        val tok = toks.getUTF8String(t)
        if (seen.add(tok)) {
          val h = if (md5Portable) MinHashSigExpr.hash60Md5(tok)
            else XxHash64Function.hash(tok, StringType, 42L)
          var i = 0
          while (i < nBits) {
            if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < nBits) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
