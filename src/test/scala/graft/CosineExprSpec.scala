package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Native Catalyst CosineSimilarityExpr: bit-exact agreement with the
  * functions-based cosine, codegen participation, and null handling. */
class CosineExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(7)
    (1 to 50).map { i =>
      (i.toLong,
        Seq.fill(16)(rnd.nextFloat() * 2 - 1),
        Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("graft_cosine is bit-identical to the functions-based cosine") {
    GraftExtensions.register(spark)
    // cosineFns is the org.apache.spark.sql.functions-only reference
    // formulation (Similarity.cosine itself routes to the native kernel)
    val out = fixture.select(
      call_function("graft_cosine", col("a"), col("b")).as("native"),
      Similarity.cosineFns(col("a"), col("b")).as("fns")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} fns=${r.getDouble(1)}")
    }
  }

  test("expression participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    // a LocalTableScan is constant-folded at plan time — go through a real
    // file scan so the projection runs in the codegen'd pipeline
    val dir = java.nio.file.Files.createTempDirectory("graft_cos").toString + "/t"
    fixture.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(call_function("graft_cosine", col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // the "*(n)" operator prefix marks membership in a WholeStageCodegen span
    assert(plan.contains("*(1) Project [graft_cosine"), plan)
  }

  test("SQL surface + null propagation") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("cos_fixture")
    val viaSql = spark.sql(
      "SELECT graft_cosine(a, b) FROM cos_fixture ORDER BY id LIMIT 1")
      .head().getDouble(0)
    assert(!viaSql.isNaN)
    val withNull = Seq((Some(Seq(1.0f, 0.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b"))).head()
    assert(withNull.isNullAt(0)) // null input → null output (BinaryExpression)
    spark.catalog.dropTempView("cos_fixture")
  }
}
