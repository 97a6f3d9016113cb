package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-contract (SURVEY §2.8) and summary-semantics (§2.6) suites. */
class ErrorsAndSummarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("empty frame construction is an error (cl-data-frame.lisp:317)") {
    intercept[EmptyFrameException](DF.fromColumns(spark, Nil))
  }

  test("duplicate key at construction (cl-data-frame.lisp:179-183)") {
    intercept[DuplicateKeyException](
      DF(spark, "a" -> Seq(1), "a" -> Seq(2)))
  }

  test("unequal column lengths at construction (cl-data-frame.lisp:438-445)") {
    intercept[ColumnLengthException](
      DF(spark, "a" -> Seq(1, 2), "b" -> Seq(1)))
  }

  test("mask length must equal row count (reference mask-rows semantics)") {
    val d = DF(spark, "a" -> Seq(1, 2, 3))
    intercept[ColumnLengthException](d.sliceFrame(Sel.Mask(Seq(true, false))))
    intercept[ColumnLengthException](
      d.sliceFrame(Sel.Mask(Seq(true, false, true, true))))
  }

  test("key-not-found carries the valid key set (cl-data-frame.lisp:185-192)") {
    val d = DF(spark, "a" -> Seq(1))
    val e = intercept[KeyNotFoundException](d.column("zz"))
    assert(e.keys == Seq("a"))
  }

  test("copy(keyFn) collision raises duplicate-key") {
    val d = DF(spark, "ab" -> Seq(1), "AB" -> Seq(2))
    intercept[DuplicateKeyException](d.copy(_.toLowerCase))
  }

  test("bit column summary: ones + total (cl-data-frame.lisp:31-38)") {
    val d = DF(spark, "flag" -> Seq(false, true, true, false))
    Summary.columnSummary(d.toSpark, "flag") match {
      case Summary.BitSummary(ones, total) =>
        assert(ones == 2 && total == 4)
      case other => fail(s"expected BitSummary, got $other")
    }
  }

  test("few distinct values → frequency table sorted desc (cl-data-frame.lisp:67-71, 84-90)") {
    val d = DF(spark, "x" -> Seq("a", "b", "a", "a", "c", "b"))
    Summary.columnSummary(d.toSpark, "x") match {
      case Summary.VectorSummary(total, None, freqs) =>
        assert(total == 6)
        assert(freqs == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
      case other => fail(s"expected frequency VectorSummary, got $other")
    }
  }

  test(">threshold distinct reals → quantiles, nulls kept as frequencies (cl-data-frame.lisp:72-87)") {
    val vals: Seq[Any] = (1 to 20).map(_.toDouble) :+ null
    val d = DF(spark, "x" -> vals)
    Summary.columnSummary(d.toSpark, "x") match {
      case Summary.VectorSummary(total, Some(q), freqs) =>
        assert(total == 21)
        assert(q.reals == 20)
        assert(q.min == 1.0 && q.max == 20.0)
        assert(q.q50 == 10.5)
        assert(freqs == Seq((null, 1L)))
      case other => fail(s"expected quantile VectorSummary, got $other")
    }
  }

  test("approx-quantile scale path tracks the exact summary") {
    val vals = (1 to 1000).map(_.toDouble)
    val d = DF(spark, "x" -> vals)
    def qs(exact: Boolean) =
      Summary.frameColumnSummaries(d.toSpark, exactQuantiles = exact)
        ._2.head._2.asInstanceOf[Summary.VectorSummary].quantiles.get
    val (e, a) = (qs(true), qs(false))
    assert(e.min == a.min && e.max == a.max)
    // KLL sketch with accuracy 10000 is exact at this cardinality
    assert(math.abs(e.q50 - a.q50) <= 1.0 && math.abs(e.q25 - a.q25) <= 1.0)
  }

  test("frame summary switches raw↔summary at nrow 10 (cl-data-frame.lisp:463-476)") {
    val small = DF(spark, "x" -> Seq(1, 2, 3))
    assert(!Summary.frameSummary(small.toSpark).contains("%")) // raw rows
    val big = DF(spark, "x" -> (1 to 12).map(i => s"v${i % 2}"))
    assert(Summary.frameSummary(big.toSpark).contains("x:")) // summarized
  }

  test("frame summary of an N-column frame is one aggregate pass (≤2 AQE jobs)") {
    val d = DF(spark,
      "s" -> (1 to 30).map(i => s"v${i % 3}"),
      "x" -> (1 to 30).map(_.toDouble),
      "flag" -> (1 to 30).map(i => i % 2 == 0))
    val sdf = d.toSpark
    sdf.count() // materialize anything lazy before counting jobs
    spark.sparkContext.setJobGroup("summary-onepass", "job-count assertion")
    val txt =
      try Summary.frameSummary(sdf)
      finally spark.sparkContext.clearJobGroup()
    assert(txt.contains("s:") && txt.contains("x:") && txt.contains("flag:"))
    // status store is event-bus fed: poll briefly until it settles
    def jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("summary-onepass").length
    val deadline = System.currentTimeMillis() + 5000
    while (jobs == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    Thread.sleep(200) // absorb any trailing job-start events
    // one aggregate pass = at most 2 scheduler jobs under AQE (partial-agg
    // shuffle stage + final stage); the old per-column loop ran 2N
    assert(jobs <= 2, s"frame summary ran $jobs jobs, expected <= 2")
  }
}
