package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WIDE SimHash (up to 120 bits as two longs) from a TOKEN array — the
  * corpus-scaled signature the [[SimHashTokensExpr]] scaladoc prescribes:
  * band-bucket selectivity in the Manku banded hamming search is
  * `2^bandWidth`, so a growing corpus needs a WIDER signature (wider bands,
  * same band count), never a lower hamming radius. At `nBits = 60` this
  * kernel is bit-identical to the legacy 60-bit portable signature (hi
  * long 0) — the profile's fixture-SF degenerate case, asserted in tests.
  *
  * Same fused shape as [[SimHashTokensExpr]] (reference semantics:
  * cl-data-frame has no sketches — [EXT] surface): one walk over distinct
  * tokens, `nBits` vote counters, one assembled two-long signature; no
  * explode, no shuffle, whole-stage codegen.
  *
  * Hash base per distinct token:
  *  - portable (md5): lo = first 15 md5 hex chars (= `hash60Md5`), hi =
  *    hex chars 17-31 (bytes 8-15 of the SAME digest, top 60 bits) — both
  *    replicable in DuckDB as `conv(substr(md5(tok), 1|17, 15), 16, 10)`,
  *    one digest per token.
  *  - production (xxhash64): seed 42 for bits 0-59, seed 43 for bits 60+.
  *
  * Bit i < 60 votes from the lo hash's bit i; bit i ≥ 60 from the hi
  * hash's bit i − 60. Output array(sig_lo, sig_hi): sig_lo carries bits
  * 0-59, sig_hi bits 60..nBits−1 (zero when nBits ≤ 60). Both longs stay
  * non-negative (≤ 60 occupied bits each) — safe in a DuckDB BIGINT. */
case class SimHashWideExpr(child: Expression, nBits: Int,
                           md5Portable: Boolean = false)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 120,
    s"graft_simhash_wide supports 1..120 bits, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_wide requires array<string> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash_wide"

  override def nullSafeEval(input: Any): Any =
    SimHashWideExpr.compute(input.asInstanceOf[ArrayData], nBits, md5Portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.functions.SimHashWideExpr.compute($xs, $nBits, $md5Portable);")

  override protected def withNewChildInternal(newChild: Expression): SimHashWideExpr =
    copy(child = newChild)
}

object SimHashWideExpr {
  /** hex chars 17-31 of md5 as a long — conv(substr(md5, 17, 15), 16, 10):
    * top 60 bits of digest bytes 8-15 (drop the 32nd nibble); the hi-half
    * twin of [[MinHashSigExpr.hash60Md5]], off the same digest. */
  private def hash60Md5Hi(d: Array[Byte]): Long = {
    var v = 0L
    var i = 8
    while (i < 16) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, nBits: Int, md5Portable: Boolean): GenericArrayData = {
    val len = toks.numElements()
    val votes = new Array[Int](nBits)
    val seen = new java.util.HashSet[UTF8String](math.max(16, len * 2))
    var t = 0
    while (t < len) {
      if (!toks.isNullAt(t)) {
        val tok = toks.getUTF8String(t)
        if (seen.add(tok)) {
          var hLo = 0L
          var hHi = 0L
          if (md5Portable) {
            val md = MinHashSigExpr.md5Local.get()
            md.reset()
            val d = md.digest(tok.getBytes)
            var v = 0L
            var i = 0
            while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
            hLo = v >>> 4
            hHi = hash60Md5Hi(d)
          } else {
            hLo = XxHash64Function.hash(tok, StringType, 42L)
            hHi = XxHash64Function.hash(tok, StringType, 43L)
          }
          var i = 0
          while (i < nBits) {
            val bit = if (i < 60) (hLo >>> i) & 1L else (hHi >>> (i - 60)) & 1L
            if (bit == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
      }
      t += 1
    }
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < nBits) {
      if (votes(i) > 0) {
        if (i < 60) lo |= (1L << i) else hi |= (1L << (i - 60))
      }
      i += 1
    }
    new GenericArrayData(Array(lo, hi))
  }
}
