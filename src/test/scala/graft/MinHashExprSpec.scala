package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Native MinHashSigExpr: bit-exact agreement with the HOF Column form,
  * whole-stage-codegen participation, SQL surface, and empty/null input. */
class MinHashExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(13)
    (1 to 40).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(30))(s"tok${rnd.nextInt(200)}"))
    }.toDF("id", "shingles")
  }

  test("native signature ≡ HOF minhashSignature, element for element") {
    val out = fixture.select(
      Dedup.minhashSignatureNative(col("shingles"), 32).as("native"),
      Dedup.minhashSignature(col("shingles"), 32).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
    }
  }

  test("expression participates in whole-stage codegen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mh").toString + "/t"
    fixture.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(Dedup.minhashSignatureNative(col("shingles"), 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_minhash"), plan)
  }

  test("SQL surface via GraftExtensions + empty/null input → null") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("mh_fixture")
    val viaSql = spark.sql(
      "SELECT graft_minhash(shingles, 16) FROM mh_fixture LIMIT 1")
      .head().getSeq[Long](0)
    assert(viaSql.length == 16)
    val edge = Seq((Seq.empty[String], Option(Seq("a")), Option.empty[Seq[String]]))
      .toDF("empty", "one", "nul")
      .select(
        Dedup.minhashSignatureNative(col("empty"), 8).as("e"),
        Dedup.minhashSignatureNative(col("one"), 8).as("o"),
        Dedup.minhashSignatureNative(col("nul"), 8).as("n"))
      .head()
    assert(edge.isNullAt(0))           // no shingles → no signature
    assert(edge.getSeq[Long](1).length == 8)
    assert(edge.isNullAt(2))           // null in → null out
    // the HOF reference form agrees on empty input (normalized to NULL —
    // a bare array of per-hash array_min would yield numHashes NULLs)
    val hofEdge = Seq(Seq.empty[String]).toDF("s")
      .select(Dedup.minhashSignature(col("s"), 8)).head()
    assert(hofEdge.isNullAt(0))
  }

  test("wrong-typed input rejected at analysis time, not runtime CCE") {
    GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(array(1, 2), 8)").collect()
    }
    assert(e.getMessage.contains("array<string>"), e.getMessage)
  }
}
