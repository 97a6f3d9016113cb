package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Bucketed writes co-locate join keys: a join of two tables bucketed the
  * same way on the join key plans WITHOUT a shuffle exchange — the
  * pre-partitioned buckets satisfy the join's distribution requirement.
  * This is the offline-prep path for repeated fact-fact joins at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-bucketed join has no shuffle; unbucketed join does") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sources.writeBucketed(a, "graft_bkt_a", "k", 4)
    Sources.writeBucketed(b, "graft_bkt_b", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      joined.collect() // finalize the adaptive plan
      val bucketedPlan = joined.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$bucketedPlan")

      val plain = a.join(b, "k")
      plain.collect()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        s"control join unexpectedly shuffle-free:\n$plainPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
