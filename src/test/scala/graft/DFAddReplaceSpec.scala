package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference `data-frame-add` and `replace-column` suites
  * (cl-data-frame-tests.lisp:98-149, 153-168): the destructive-vs-functional
  * aliasing contract (`test-add` macro, :106-135), add of a computed column
  * (:137-149), and replace-by-function vs replace-by-column equivalence. */
class DFAddReplaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base: DF = DF(spark, "a" -> Seq(2, 3, 5, 7))

  test("functional add-columns leaves the original untouched (tests.lisp:106-135)") {
    val d = base
    val added = d.addColumn("b", col("a") * 10)
    assert(added.keys == Vector("a", "b"))
    assert(added.column("b") == Vector(20, 30, 50, 70))
    assert(d.keys == Vector("a")) // original schema unchanged
  }

  test("destructive add via handle mutates in place (tests.lisp:132-135)") {
    val h = new DFHandle(base)
    h.addColumnBang("b", col("a") + 1)
    assert(h.df.keys == Vector("a", "b"))
    h.addColumnBang("c", Seq(9, 9, 9, 9))
    assert(h.df.column("c") == Vector(9, 9, 9, 9))
  }

  test("add computed (map-rows) column (tests.lisp:137-149)") {
    val d = base
    val computed = d.mapRows(Seq("a"))(r => r.head.asInstanceOf[Int] % 2)
    val added = d.addColumn("parity", computed)
    assert(added.column("parity") == Vector(0, 1, 1, 1))
  }

  test("add columns from another frame (cl-data-frame.lisp:290-313 case :306-308)") {
    val d = base
    val other = DF(spark, "x" -> Seq(10, 20, 30, 40), "y" -> Seq("p", "q", "r", "t"))
    val combined = d.addColumns(other)
    assert(combined.keys == Vector("a", "x", "y"))
    assert(combined.column("a") == Vector(2, 3, 5, 7))
    assert(combined.column("y") == Vector("p", "q", "r", "t"))
  }

  test("add-column errors: duplicate key, length mismatch (cl-data-frame.lisp:367-373, 286-288)") {
    intercept[DuplicateKeyException](base.addColumn("a", lit(1)))
    intercept[ColumnLengthException](base.addColumn("b", Seq(1, 2)))
    val other = DF(spark, "z" -> Seq(1, 2))
    intercept[ColumnLengthException](base.addColumns(other))
  }

  test("replace-by-function ≡ replace-by-column; original untouched (tests.lisp:153-168)") {
    val d = base
    val byFn = d.replaceColumnFn("a", c => c * 2)
    val byCol = d.replaceColumn("a", Seq(4, 6, 10, 14))
    assert(byFn.column("a") == byCol.column("a"))
    assert(byFn.column("a") == Vector(4, 6, 10, 14))
    assert(d.column("a") == Vector(2, 3, 5, 7)) // functional: original intact
  }

  test("replace keeps key order") {
    val d = DF(spark, "a" -> Seq(1, 2), "b" -> Seq(3, 4), "c" -> Seq(5, 6))
    val r = d.replaceColumn("b", Seq(30, 40))
    assert(r.keys == Vector("a", "b", "c"))
    assert(r.column("b") == Vector(30, 40))
  }

  test("(setf column) via handle (cl-data-frame.lisp:351-355)") {
    val h = new DFHandle(base)
    h.setColumn("a", Seq(0, 0, 0, 0))
    assert(h.df.column("a") == Vector(0, 0, 0, 0))
  }

  test("replace on missing key raises key-not-found (cl-data-frame.lisp:185-192)") {
    intercept[KeyNotFoundException](base.replaceColumnFn("nope", identity))
  }

  test("addValueColumns: several local columns, one check+join; same errors as addColumn") {
    val d = base.addValueColumns(
      "x" -> Seq(10, 20, 30, 40),
      "y" -> Seq("p", "q", "r", "s"),
      "z" -> Seq(BigDecimal(1) / 4, BigDecimal(1) / 2,
        BigDecimal(3) / 4, BigDecimal(1)))
    assert(d.keys == base.keys ++ Seq("x", "y", "z"))
    assert(d.column("x") == Vector(10, 20, 30, 40))
    assert(d.column("y") == Vector("p", "q", "r", "s"))
    assert(d.column("z").map(_.toString.take(4)) ==
      Vector("0.25", "0.50", "0.75", "1.00")) // DecimalType(38,18) per §7.4.3
    // row alignment survives together with existing columns
    assert(d.slice(Sel.Index(2), Sel.Names(Seq("a", "x"))) ==
      SliceResult.Record(DV(Vector("a", "x"), Vector(base.column("a")(2), 30))))
    // the addColumn error contract applies to the batch form too
    intercept[DuplicateKeyException](base.addValueColumns("a" -> Seq(1, 2, 3, 4)))
    intercept[DuplicateKeyException](
      base.addValueColumns("x" -> Seq(1, 2, 3, 4), "x" -> Seq(5, 6, 7, 8)))
    intercept[ColumnLengthException](base.addValueColumns("x" -> Seq(1, 2)))
    // and the batch result equals the per-column fold
    val folded = base.addColumn("x", Seq(10, 20, 30, 40): Seq[Any])
      .addColumn("y", Seq("p", "q", "r", "s"): Seq[Any])
    val batch = base.addValueColumns(
      "x" -> Seq(10, 20, 30, 40), "y" -> Seq("p", "q", "r", "s"))
    assert(batch.asAlist == folded.asAlist)
  }
}
