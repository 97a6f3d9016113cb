package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH signature over a double-array column: bit i
  * of the result is sign(v · plane_i), for `nBits` seeded Gaussian planes —
  * ONE fused pass, as a codegen'd Catalyst expression.
  *
  * Why a custom Expression (SURVEY §7.3 tier (b)): the Column-form
  * [[graft.operators.Similarity.lshSignatureFns]] inlines one
  * `aggregate(zip_with(...))` tree PER BIT — 60 higher-order-function dot
  * products per row for the 5×12-bit near-dup setting — and higher-order
  * functions are CodegenFallback, so the whole signature projection drops
  * out of whole-stage codegen and runs interpreted, re-reading the vector
  * per plane. This kernel reads the vector once per plane inside one
  * generated loop nest, allocates nothing, and keeps the projection inside
  * the codegen stage with the scan.
  *
  * Bit-identical to the HOF form on well-formed (element-null-free)
  * embedding columns: each dot product accumulates left-to-right in double
  * exactly like `aggregate`'s fold and like the driver-side
  * [[graft.operators.Similarity.signatureOf]] — proven in
  * HyperplaneExprSpec. The planes are `Similarity.hyperplanes(dim, nBits,
  * seed)`, the same family the q_lsh_recall DuckDB oracle embeds as exact
  * double literals, so swapping this kernel in changes no query result.
  * Loops are bounded by min(vector length, dim); a row shorter than `dim`
  * contributes only its prefix (the HOF form zip-truncates identically).
  */
case class HyperplaneSigExpr(child: Expression, dim: Int, nBits: Int,
                             seed: Long) extends UnaryExpression {

  require(nBits > 0 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig requires array<double>, got ${other.catalogString}")
  }

  // planes flattened row-major into one double[] — a single flat reference
  // object for generated code (plane i spans [i*dim, (i+1)*dim))
  private lazy val flatPlanes: Array[Double] =
    graft.operators.Similarity.hyperplanes(dim, nBits, seed)
      .flatten.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), dim)
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var dot = 0.0
      var j = 0
      val off = i * dim
      while (j < n) { dot += xs.getDouble(j) * flatPlanes(off + j); j += 1 }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val pRef = ctx.addReferenceObj("hyperplanes", flatPlanes, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = Math.min($xs.numElements(), $dim);
         |long $sig = 0L;
         |for (int $i = 0; $i < $nBits; $i++) {
         |  double $dot = 0.0;
         |  int $off = $i * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $xs.getDouble($j) * $pRef[$off + $j];
         |  }
         |  if ($dot >= 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}
