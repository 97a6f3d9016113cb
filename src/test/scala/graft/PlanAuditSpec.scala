package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale-critical physical-plan properties
  * (parquet predicate pushdown, column pruning, no single-partition
  * exchanges) asserted on executed plans, so a wrapper change that silently
  * breaks them fails CI instead of only showing up in a manual
  * `runMain graft.Explain` audit. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_plan_audit").toString
    (1L to 500L).map(i => (i, i % 7, s"name_$i", i * 1.5))
      .toDF("id", "grp", "name", "x")
      .write.mode("overwrite").parquet(d)
    d
  }

  /** executed-plan string (collect() finalizes the AQE plan). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  test("filter through the DF wrapper reaches the parquet scan (PushedFilters)") {
    val df = DF.fromSpark(spark.read.parquet(dir))
    val plan = finalPlan(df.filter(col("grp") === 3).toSpark)
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters section in:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(grp,3\\).*"),
      s"grp=3 not pushed to the scan:\n$plan")
  }

  test("projection through the DF wrapper prunes the read schema") {
    val df = DF.fromSpark(spark.read.parquet(dir))
    val plan = finalPlan(df.columns(Sel.Names(Seq("id", "x"))).toSpark)
    // ReadSchema must contain only the projected columns
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("id") && read.contains("x") &&
      !read.contains("name") && !read.contains("grp"),
      s"scan reads unprojected columns: $read")
  }

  test("wrapper aggregate keeps whole-stage codegen and avoids SinglePartition") {
    val df = DF.fromSpark(spark.read.parquet(dir))
    val plan = finalPlan(
      df.toSpark.groupBy("grp").agg(sum("x").as("sx")).orderBy("grp"))
    assert(plan.contains("[codegen id :"), s"no codegen span in:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in:\n$plan")
  }
}
