package graft

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference `data-vector` suite
  * (cl-data-frame-tests.lisp:22-34): construction, as-plist/as-alist
  * round-trip, key/index/mask slicing with singleton→scalar dropping,
  * map-columns class preservation, rendering. */
class DVSpec extends AnyFunSuite {

  private val dv = DV(Vector("a", "b", "c"), Vector(1, 2, 3))

  test("construction and accessors") {
    assert(dv.ncol == 3)
    assert(dv("a") == 1)
    assert(dv("c") == 3)
  }

  test("as-plist round trip (cl-data-frame-tests.lisp:26-28)") {
    assert(dv.asPlist == Seq("a" -> 1, "b" -> 2, "c" -> 3))
    assert(dv.asMap == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("singleton slice drops to scalar (cl-data-frame-tests.lisp:31)") {
    assert(dv.slice(Sel.Name("b")) == SliceResult.Scalar(2))
    assert(dv.slice(Sel.Index(0)) == SliceResult.Scalar(1))
    // negative index counts from the end
    assert(dv.slice(Sel.Index(-1)) == SliceResult.Scalar(3))
  }

  test("key-vector slice keeps a record (cl-data-frame-tests.lisp:29-30)") {
    dv.slice(Sel.Names(Seq("c", "a"))) match {
      case SliceResult.Record(r) =>
        assert(r.keys == Vector("c", "a"))
        assert(r.values == Vector(3, 1))
      case other => fail(s"expected Record, got $other")
    }
  }

  test("mask slice over entries") {
    dv.slice(Sel.Mask(Seq(true, false, true))) match {
      case SliceResult.Record(r) => assert(r.keys == Vector("a", "c"))
      case other => fail(s"expected Record, got $other")
    }
  }

  test("mask slice length mismatch raises column-length error") {
    // same equal-length contract as the frame row-mask path (DF.filterRows)
    intercept[ColumnLengthException] { dv.slice(Sel.Mask(Seq(true, false))) }
    intercept[ColumnLengthException] {
      dv.slice(Sel.Mask(Seq(true, false, true, true)))
    }
  }

  test("mapValues preserves keys (map-columns on dv, tests.lisp:33)") {
    val doubled = dv.mapValues { case i: Int => i * 2 }
    assert(doubled.keys == dv.keys)
    assert(doubled.values == Vector(2, 4, 6))
  }

  test("render (print-object, cl-data-frame.lisp:416-425)") {
    assert(dv.render == "#<DATA-VECTOR (3) a=1 b=2 c=3>")
  }

  test("missing key raises key-not-found carrying valid keys") {
    val e = intercept[KeyNotFoundException](dv("nope"))
    assert(e.keys == Seq("a", "b", "c"))
  }
}
