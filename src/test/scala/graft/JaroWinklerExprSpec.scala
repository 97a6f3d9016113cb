package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinklerExpr
import graft.operators.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst JaroWinklerExpr: agreement with DuckDB-pinned reference
  * values, algorithm edge cases, codegen participation, and the blocked
  * linkage operators built on it. */
class JaroWinklerExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB jaro_winkler_similarity on pinned probe values") {
    // every expected value below was read straight out of DuckDB 1.x
    // (the verification oracle engine) — see JaroWinklerExpr scaladoc
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),   // 1 transposition + prefix 3
      ("dixon", "dicksonx", 0.8133333333333332),  // prefix-2 boost over 0.7667
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("abc", "", 0.0), ("", "", 0.0),
      ("ab", "ba", 0.0),                          // window 0: anagram scores 0
      ("CRATE", "TRACE", 0.7333333333333334),     // above 0.7 but prefix 0
      ("aXXXXX", "aYYYYY", 0.4444444444444444),   // below 0.7: NO boost
      ("abXXXX", "abYYYY", 0.5555555555555555),
      ("abcdefghij", "abcdexxxxx", 0.6666666666666666), // 0.667 ≤ 0.7: no boost
      ("aaaaaaaaaa", "aaaaa", 0.9),               // prefix capped at 4
      ("abcde", "axbxcxdxex", 0.8500000000000001),
      ("key agg row", "key agg rwo", 0.9818181818181818))
    pinned.foreach { case (a, b, want) =>
      val got = jw(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw('$a','$b') = $got, want $want")
    }
  }

  test("symmetric, bounded, and identical-string = 1") {
    val rnd = new scala.util.Random(11)
    val words = Seq("spark", "sprak", "query", "qury", "table", "tabel",
      "window", "widnow", "stream", "batch") ++
      (1 to 40).map(_ => rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString)
    for (a <- words; b <- words) {
      val ab = jw(a, b); val ba = jw(b, a)
      assert(java.lang.Double.doubleToLongBits(ab) ==
        java.lang.Double.doubleToLongBits(ba), s"asymmetric: '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range: '$a' '$b' -> $ab")
      if (a == b && a.nonEmpty) assert(ab == 1.0)
    }
  }

  test("expression participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_jw").toString + "/t"
    Seq(("martha", "marhta"), ("dixon", "dicksonx"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaro_winkler"), plan)
    // interpreted eval ≡ codegen'd eval, bit for bit (sorted: parquet scan
    // order across the two splits is not deterministic)
    val got = q.collect().map(_.getDouble(0)).toSeq.sorted
    assert(got == Seq(jw("martha", "marhta"), jw("dixon", "dicksonx")).sorted)
  }

  test("SQL surface + null propagation + type check") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
    val withNull = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_jaro_winkler(1, 'a')").collect()
    }
    assert(err.getMessage.contains("graft_jaro_winkler") ||
      err.getMessage.toLowerCase.contains("cannot resolve"), err.getMessage)
  }

  test("jaroWinklerLinkage: blocked pairs, integer-micros threshold") {
    val df = Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "the quick brown fax"),   // near-dup of 1, same block
      (3L, "en", "the quiet brown fox"),   // nearish of 1
      (4L, "en", "zzz totally different"), // different block
      (5L, "de", "the quick brown fox")    // same text, other lang block
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.jaroWinklerLinkage(df, "doc_id", col("text"),
      concat_ws("|", col("lang"), substring(col("text"), 1, 4)),
      minSimMicros = 900000L).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), out.mkString(", "))
    assert(pairs.contains((1L, 3L)))
    // cross-block pairs never compared, even at similarity 1.0 (5 vs 1)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // scores are micros of the scalar kernel
    out.foreach { r =>
      val want = math.round(jw(
        df.filter(col("doc_id") === r.getLong(0)).head().getString(2).take(40),
        df.filter(col("doc_id") === r.getLong(1)).head().getString(2).take(40))
        * 1e6)
      assert(r.getLong(2) == want)
    }
  }

  test("jaroWinklerBestMatch: one row per matched record, deterministic ties") {
    val df = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamba"),
      (3L, "en", "alpha beta gamma"),  // exact dup of 1 → best for both
      (4L, "en", "alphx betx gammx")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.jaroWinklerBestMatch(df, "doc_id", col("text"),
      concat_ws("|", col("lang"), substring(col("text"), 1, 4)),
      minSimMicros = 700000L).collect()
    val best = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best(1L) == 3L)  // sim 1.0 beats 2's near-dup
    assert(best(3L) == 1L)
    assert(best(2L) == 1L)  // tie between 1 and 3 at equal score → smaller id
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }
}
