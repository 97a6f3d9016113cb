package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused whole-token membership counts over a pre-normalized text string:
  * for each word set, the number of whitespace-delimited tokens of `child`
  * (expected to be `lower(trim(text))` — the caller composes those builtin
  * expressions, so lowercasing/trimming semantics are exactly Spark's own)
  * that equal a member of the set — returned as one `array<long>`, one
  * codegen'd scan.
  *
  * Why a custom Expression (SURVEY §7.3 tier (b), the [[MinHashSigExpr]] /
  * [[HashedQualityExpr]] precedent): the curation gates
  * (langId + qualityScore) evaluated one `regexp_count` alternation pass
  * PER word set — 5+ full regex scans of every document on the serial
  * scan side of every curation query (r22 probe: 0.73 s single-task gate
  * stage at sf0.1). This kernel tokenizes once (byte scan) and does O(1)
  * hash-set lookups per token for ALL sets.
  *
  * Exact equivalence with the r21 `regexp_count` form
  * (`(?<=\s)(?:w1|w2|…)(?=\s)` over the space-padded lowered trimmed
  * text): the r21 scaladoc on `tokenHits` establishes "token == w" ⇔
  * "w flanked by \s on the padded text" where tokens are MAXIMAL non-`\s`
  * runs — this kernel counts exactly those runs. Java regex `\s` is the
  * ASCII class [ \t\n\x0B\f\r]; in UTF-8 no multibyte character contains
  * an ASCII byte, so splitting on those BYTES is precisely codepoint-level
  * splitting. NULL text → NULL (the regex form propagates NULL through
  * concat); empty/whitespace-only text → all-zero counts (zero runs; the
  * padded regex likewise never matches). Oracle-checked by every curation
  * query plus q_lang_guess / q_quality_score / q_stopword_ratio.
  */
case class TokenSetHitsExpr(child: Expression, sets: Array[Array[String]])
    extends UnaryExpression {

  require(sets.nonEmpty && sets.forall(_.nonEmpty),
    "graft_token_set_hits requires at least one non-empty word set")
  // pin the whole-token contract the run-split assumes (same guard as
  // tokenHits, the r21 ADVICE item): a word containing whitespace can never
  // equal a non-\s run, and an empty word would count nothing — both would
  // silently diverge from what a caller passing them expects.
  require(sets.forall(_.forall(w => w.nonEmpty && !w.exists(_.isWhitespace))),
    "graft_token_set_hits: words must be non-empty and whitespace-free")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_set_hits requires a string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_set_hits"

  @transient private lazy val lookup: Array[java.util.HashSet[UTF8String]] =
    TokenSetHitsExpr.buildLookup(sets)

  override def nullSafeEval(input: Any): Any =
    TokenSetHitsExpr.compute(input.asInstanceOf[UTF8String], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val lkRef = ctx.addReferenceObj("tokenSets", lookup,
        "java.util.HashSet[]")
      s"${ev.value} = graft.functions.TokenSetHitsExpr.compute($s, $lkRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenSetHitsExpr =
    copy(child = newChild)

  // nested Array has reference equality; compare by content so plan
  // canonicalization (subexpression elimination across the gate's
  // langId/stopword instances) sees same-set kernels as equal.
  override def equals(other: Any): Boolean = other match {
    case TokenSetHitsExpr(c, s) =>
      c == child && s.length == sets.length &&
        s.indices.forall(i => java.util.Arrays.equals(
          s(i).asInstanceOf[Array[AnyRef]],
          sets(i).asInstanceOf[Array[AnyRef]]))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      sets.map(s => java.util.Arrays.hashCode(s.asInstanceOf[Array[AnyRef]]))
        .foldLeft(0)(31 * _ + _)
}

object TokenSetHitsExpr {
  def buildLookup(sets: Array[Array[String]]): Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[UTF8String](ws.length * 2)
      ws.foreach(w => h.add(UTF8String.fromString(w)))
      h
    }

  /** `\s` of java.util.regex — the exact class `tokens`/`tokenHits` split
    * on. All ASCII, so a byte-level test is codepoint-exact in UTF-8. */
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** shared by interpreted eval and generated code: one scan, maximal
    * non-\s runs, per-set membership counts. */
  def compute(s: UTF8String,
              lookup: Array[java.util.HashSet[UTF8String]]): GenericArrayData = {
    val bytes = s.getBytes // materialized copy; tokens substring from `s`
    val n = bytes.length
    val counts = new Array[Long](lookup.length)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        // UTF8String.substring is codepoint-indexed; slice bytes directly
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        var k = 0
        while (k < lookup.length) {
          if (lookup(k).contains(tok)) counts(k) += 1
          k += 1
        }
      }
    }
    new GenericArrayData(counts)
  }
}
