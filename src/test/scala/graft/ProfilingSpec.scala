package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling
import graft.sources.Sources

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileTable: null and distinct counts per column, one row each") {
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), None),
      (Some(2L), Some("b")),
      (None, Some("b"))
    ).toDF("id", "s")
    val prof = Profiling.profileTable(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(prof("id") == ((4L, 1L, 2L)))  // 4 rows, 1 null, distinct {1,2}
    assert(prof("s") == ((4L, 1L, 2L)))   // distinct {a,b}
    assert(prof.keySet == Set("id", "s"))
  }

  test("profileTable: approx mode agrees on small cardinalities") {
    val df = (1 to 100).map(i => (i.toLong % 5, s"v${i % 7}")).toDF("k", "v")
    val prof = Profiling.profileTable(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL is exact at these cardinalities
    assert(prof("k") == 5L && prof("v") == 7L)
  }

  test("profileTable: rejects quoted column names loudly") {
    val df = Seq(1).toDF("ok").withColumnRenamed("ok", "bad'name")
    val e = intercept[IllegalArgumentException](Profiling.profileTable(df))
    assert(e.getMessage.contains("quote"))
  }

  test("skewReport: hand-computed distribution scalars") {
    // keys: a×6, b×2, c×1, d×1  → n_keys=4, n_rows=10, max=6
    // sorted cnts (1,1,2,6): p50 = (1+2)/2 = 1.5; avg = 2.5; skew = 6/2.5
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = Profiling.skewReport(df, "k").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 1.5 && r.getDouble(4) == 2.5)
    assert(r.getDouble(5) == 2.4)
  }

  test("outlierMad: planted outliers counted, clean group zero") {
    // group g: tight cluster 100±2 plus two wild points; median=100.5,
    // absdevs (.5,.5,.5,1.5,1.5,2.5,899.5,9899.5) → MAD=1.5 → >4.5 flags 2
    val g = Seq(98L, 99L, 100L, 100L, 101L, 102L, 1000L, 10000L).map(("g", _))
    // group h: all identical → MAD 0, strict > keeps outliers at 0
    val h = Seq.fill(5)(("h", 50L))
    val df = (g ++ h).toDF("grp", "x")
    val out = Profiling.outlierMad(df, "grp", col("x"), k = 3.0).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("g")._1 == 8L)
    assert(out("g")._2 == 100.5)  // median of 8 values interpolates to .5
    assert(out("g")._3 == 1.5)
    assert(out("g")._4 == 2L)
    assert(out("h") == ((5L, 50.0, 0.0, 0L)))
  }

  test("mergeSnapshot: upsert replaces, upsert inserts, delete retires, absent-key delete is a no-op") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
    val delta = Seq(
      (2L, "TWO", "upsert"),   // replace
      (9L, "nine", "upsert"),  // insert
      (3L, null, "delete"),    // retire
      (7L, null, "delete")     // absent key — no-op
    ).toDF("k", "v", "op")
    val got = Sources.mergeSnapshot(base, delta, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "one", 2L -> "TWO", 9L -> "nine"))
  }

  test("mergeSnapshot: unknown op value fails loudly instead of dropping rows") {
    val base = Seq((1L, "one")).toDF("k", "v")
    val delta = Seq((1L, "x", "update")).toDF("k", "v", "op")
    val e = intercept[IllegalArgumentException](
      Sources.mergeSnapshot(base, delta, "k").collect())
    assert(e.getMessage.contains("update"))
  }

  test("mergeIntoStore: bucketed round trip, second merge composes") {
    val t = "graft_merge_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      Sources.writeBucketed(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), t, "k", 4)
      Sources.mergeIntoStore(spark, t,
        Seq((2L, 21L, "upsert"), (3L, 0L, "delete")).toDF("k", "v", "op"),
        "k", nBuckets = 4)
      assert(spark.table(t).collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap == Map(1L -> 10L, 2L -> 21L))
      // the swapped-in table must still be a usable merge target
      Sources.mergeIntoStore(spark, t,
        Seq((4L, 40L, "upsert")).toDF("k", "v", "op"), "k", nBuckets = 4)
      assert(spark.table(t).count() == 3)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("mergeSnapshot on co-bucketed stores: anti-join shuffles neither side") {
    val base = "graft_merge_cob_base"
    val dtab = "graft_merge_cob_delta"
    spark.sql(s"DROP TABLE IF EXISTS $base")
    spark.sql(s"DROP TABLE IF EXISTS $dtab")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Sources.writeBucketed(
        (1L to 100L).map(i => (i, i * 10)).toDF("k", "v"), base, "k", 4)
      Sources.writeBucketed(
        Seq((5L, 0L, "delete"), (200L, 1L, "upsert")).toDF("k", "v", "op"),
        dtab, "k", 4)
      val merged = Sources.mergeSnapshot(
        spark.table(base), spark.table(dtab), "k")
      assert(merged.count() == 100) // 100 − 1 delete + 1 insert
      val plan = merged.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed merge should not shuffle either join side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $base")
      spark.sql(s"DROP TABLE IF EXISTS $dtab")
    }
  }
}
