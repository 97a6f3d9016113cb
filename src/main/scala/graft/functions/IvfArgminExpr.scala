package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native IVF cluster assignment: argmin over k centroid distances ranked by
  * `|c|² − 2·v·c` (identical ordering to full squared L2 — the |v|² term is
  * constant per row), ties to the lower cluster id, as ONE codegen'd
  * Catalyst expression.
  *
  * Why a custom Expression (SURVEY §7.3 tier (b)): the `functions`-built
  * formulation (k per-centroid `aggregate(zip_with(...))` dot products
  * folded through `array_min` of structs) is interpreted per element with
  * boxing, and its cost explodes with k — at the corpus-scaled
  * k = autoK(corpus) (157 at the 10× stress corpus, ~11k at LAION scale)
  * the assignment projection became the dominant cost of every IVF/SemDeDup
  * query (measured 6.7× on q_semdedup_pairs at 10× data). This kernel holds
  * the centroid matrix as a flat primitive reference object and emits one
  * fused k×dim loop into the whole-stage-codegen body.
  *
  * Bit-exactness: the distance accumulates left-to-right in double per
  * centroid (`d += v_j · c_ij`, then `n2_i − 2·d`) — exactly the
  * `aggregate(zip_with)` fold order and [[graft.operators.Similarity.sqNorm]]
  * norm the literal-expression path used, so assignments (and the
  * fitted-centroid DuckDB oracles built on the same literals) are unchanged
  * (asserted in SkewAndIvfSpec). Strict `<` keeps the FIRST minimum — the
  * same tie-break as struct array_min's (d, i) ordering. Input must be
  * array<double>; callers cast (see [[graft.operators.Similarity.ivfAssign]]).
  */
case class IvfArgminExpr(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {

  require(centers.nonEmpty, "IvfArgminExpr: empty centroid set")
  private val dim = centers.head.length
  require(centers.forall(_.length == dim),
    "IvfArgminExpr: ragged centroid matrix")

  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](centers.length * dim)
    var i = 0
    while (i < centers.length) {
      System.arraycopy(centers(i), 0, f, i * dim, dim); i += 1
    }
    f
  }
  @transient private lazy val norms: Array[Double] =
    centers.map(graft.operators.Similarity.sqNorm)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_argmin"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = math.min(dim, v.numElements())
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < centers.length) {
      var d = 0.0
      val off = i * dim
      var j = 0
      while (j < m) { d += v.getDouble(j) * flat(off + j); j += 1 }
      val dist = norms(i) - 2.0 * d
      if (dist < bestD) { bestD = dist; best = i }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("ivfCenters", flat, "double[]")
      val normRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
      val k = centers.length
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val off = ctx.freshName("off")
      val d = ctx.freshName("d"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int $m = Math.min($dim, $a.numElements());
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $i = 0; $i < $k; $i++) {
         |  double $d = 0.0;
         |  int $off = $i * $dim;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $d += $a.getDouble($j) * $flatRef[$off + $j];
         |  }
         |  double $dist = $normRef[$i] - 2.0 * $d;
         |  if ($dist < $bestD) { $bestD = $dist; $best = $i; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfArgminExpr =
    copy(child = newChild)
}
