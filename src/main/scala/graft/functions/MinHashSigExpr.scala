package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a shingle (string) array: xxhash64 each
  * shingle into the 31-bit domain and take all `numHashes` minima of
  * `(a_i·x + b_i) mod P` — ONE fused pass, as a codegen'd Catalyst
  * expression.
  *
  * Why a custom Expression (SURVEY §7.3 tier (b)): the Column-form
  * [[graft.operators.Dedup.minhashSignature]] inlines `numHashes` separate
  * `array_min(transform(...))` trees — the plan grows linearly in numHashes
  * (64 array traversals, each re-hashing every shingle) and, because
  * higher-order functions are CodegenFallback, the whole projection drops
  * out of whole-stage codegen. This kernel is one expression node regardless
  * of numHashes, hashes each shingle exactly once, allocates nothing but the
  * output array, and `doGenCode` emits the loop straight into the codegen
  * body. (The DataFrame-level explode+aggregate form in `Dedup.minhashSigs`
  * remains the corpus-scale path — it gets map-side partial mins across
  * rows; this expression serves per-row/inline uses: streaming ingest,
  * signature columns inside wider projections.)
  *
  * The (a_i, b_i) affine family is `Dedup.hashParams(numHashes)` (seed 42)
  * and the shingle hash is `pmod(xxhash64(s), 2^31)` — output is
  * bit-identical to the HOF formulation. x < 2^31 and a_i < 2^31 bound
  * a_i·x + b_i < 2^62 + 2^31, so the Long arithmetic is exact and
  * non-negative (no ANSI overflow; `%` ≡ pmod). Empty input → NULL (no
  * shingles, no signature); null elements are skipped.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  /** analysis-time type check: a wrong-typed argument (e.g. array<bigint>)
    * must fail with a clear analysis error, not a runtime
    * ClassCastException from getUTF8String. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string> shingles, got ${other.catalogString}")
  }

  private lazy val params: Array[(Long, Long)] =
    graft.operators.Dedup.hashParams(numHashes).toArray
  private lazy val aArr: Array[Long] = params.map(_._1)
  private lazy val bArr: Array[Long] = params.map(_._2)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input → null signature
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val x = MinHashSigExpr.hash31(xs.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val v = (x * aArr(j) + bArr(j)) % MinHashSigExpr.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val any = ctx.freshName("any")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $xs.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$xs.isNullAt($i)) {
         |    $any = true;
         |    long $x = graft.functions.MinHashSigExpr.hash31($xs.getUTF8String($i));
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = ($x * $aRef[$j] + $bRef[$j]) % ${MinHashSigExpr.P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  val P: Long = (1L << 31) - 1
  private val TwoPow31 = 1L << 31

  /** pmod(xxhash64(s), 2^31) — identical to the SQL formulation (seed 42).
    * Called from generated code via the companion's static forwarder. */
  def hash31(s: UTF8String): Long = {
    val h = XxHash64Function.hash(s, StringType, 42L) % TwoPow31
    if (h < 0) h + TwoPow31 else h
  }
}
