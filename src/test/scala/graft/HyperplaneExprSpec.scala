package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Native HyperplaneSigExpr vs the HOF reference formulation: signatures
  * must be BIT-identical (same left-to-right double accumulation), the
  * driver-side signatureOf must agree, and the kernel must stay inside
  * whole-stage codegen. */
class HyperplaneExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vectors(n: Int, dim: Int) =
    (1 to n).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => (math.sin(i * 31 + j * 7) * 3).toFloat))
    }.toDF("id", "v")

  test("native signature is bit-identical to the HOF formulation") {
    val df = vectors(200, 64)
    val both = df.select(col("id"),
        Similarity.lshSignature(col("v"), dim = 64, nBits = 16).as("native"),
        Similarity.lshSignatureFns(col("v"), dim = 64, nBits = 16).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("native signature matches the driver-side signatureOf") {
    val df = vectors(20, 32)
    val rows = df.select(col("id"), col("v"),
        Similarity.lshSignature(col("v"), dim = 32, nBits = 60, seed = 7L).as("s"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val expected = {
        // private[operators] signatureOf — recompute inline with the same fold
        Similarity.hyperplanes(32, 60, 7L).zipWithIndex.foldLeft(0L) {
          case (acc, (plane, i)) =>
            val dot = plane.zip(v).foldLeft(0.0) { case (s, (a, b)) => s + a * b }
            if (dot >= 0) acc | (1L << i) else acc
        }
      }
      assert(r.getLong(2) == expected)
    }
  }

  test("signature projection stays inside whole-stage codegen") {
    // spark.range source (a local Seq would be constant-folded into a
    // LocalTableScan with no codegen stage to inspect)
    val df = spark.range(50).select(
      transform(sequence(lit(0), lit(15)),
        j => sin(col("id") * (j + lit(1)))).as("v"))
    val proj = df.select(Similarity.lshSignature(col("v"), dim = 16, nBits = 8).as("s"))
    proj.collect()
    val plan = proj.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("[codegen id :"), s"no codegen span in:\n$plan")
  }

  test("SQL registration: graft_hyperplane_sig matches the Column form") {
    GraftExtensions.register(spark)
    val df = vectors(30, 16)
    val rows = df.select(
        Similarity.lshSignature(col("v"), dim = 16, nBits = 8).as("a"),
        call_function("graft_hyperplane_sig", col("v"), lit(16), lit(8)).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("wrong input type fails at analysis, not execution") {
    val bad = Seq((1L, Seq(1L, 2L))).toDF("id", "v")
    val e = intercept[Exception] {
      import org.apache.spark.sql.GraftSqlBridge
      bad.select(GraftSqlBridge.column(graft.functions.HyperplaneSigExpr(
        GraftSqlBridge.expression(col("v")), 2, 4, 42L))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>")
      || e.getMessage.toLowerCase.contains("graft_hyperplane_sig"))
  }
}
