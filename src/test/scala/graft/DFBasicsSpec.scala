package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference `data-frame-basics` suite
  * (cl-data-frame-tests.lisp:36-95). Fixture: v=#(1 2 3 4), b=#*0110,
  * s=#(a b c d) (tests.lisp:39-41). */
class DFBasicsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver smoke contract: SparkEntry.entry returns rows at sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }

  private val v = Seq(1, 2, 3, 4)
  private val b = Seq(false, true, true, false)
  private val s = Seq("a", "b", "c", "d")
  private def df: DF = DF(spark, "vv" -> v, "b" -> b, "s" -> s)

  test("construction: keys, dims (tests.lisp:44-50)") {
    val d = df
    assert(d.keys == Vector("vv", "b", "s"))
    assert(d.ncol == 3)
    assert(d.nrow == 4L)
    assert(d.dims == (4L, 3))
  }

  test("columns selectors incl negative index (tests.lisp:51-54)") {
    assert(df.columns(Sel.All).keys == Vector("vv", "b", "s"))
    assert(df.columns(Sel.Names(Seq("s", "vv"))).keys == Vector("s", "vv"))
    // (columns df -2) selects the 2nd-from-last column
    assert(df.columns(Sel.Index(-2)).keys == Vector("b"))
    assert(df.columns(Sel.Indices(Seq(0, 2))).keys == Vector("vv", "s"))
    assert(df.columns(Sel.Mask(Seq(true, false, true))).keys == Vector("vv", "s"))
  }

  test("column materializes in row order (tests.lisp:51)") {
    assert(df.column("vv") == Vector(1, 2, 3, 4))
    assert(df.column("s") == Vector("a", "b", "c", "d"))
  }

  test("2-D slice: bit-mask rows (tests.lisp:63-64)") {
    df.slice(Sel.Mask(b)) match {
      case SliceResult.Frame(f) =>
        assert(f.nrow == 2L)
        assert(f.column("vv") == Vector(2, 3))
        assert(f.column("s") == Vector("b", "c"))
      case other => fail(s"expected Frame, got $other")
    }
  }

  test("2-D slice: singleton row drops to data-vector (tests.lisp:65)") {
    df.slice(Sel.Index(1)) match {
      case SliceResult.Record(r) =>
        assert(r.keys == Vector("vv", "b", "s"))
        assert(r.values == Vector(2, true, "b"))
      case other => fail(s"expected Record, got $other")
    }
    // negative row index
    assert(df.sliceRow(-1).values == Vector(4, false, "d"))
  }

  test("2-D slice: row mask + single column drops to vector") {
    df.slice(Sel.Mask(b), Sel.Name("vv")) match {
      case SliceResult.Col(vs) => assert(vs == Vector(2, 3))
      case other => fail(s"expected Col, got $other")
    }
  }

  test("2-D slice: cell (tests.lisp:31-ish on frames)") {
    assert(df.sliceCell(2, "s") == "c")
    df.slice(Sel.Index(0), Sel.Name("vv")) match {
      case SliceResult.Scalar(x) => assert(x == 1)
      case other => fail(s"expected Scalar, got $other")
    }
  }

  test("index-vector row slice follows selector order") {
    df.sliceFrame(Sel.Indices(Seq(3, 0))) match {
      case f => assert(f.column("vv") == Vector(4, 1))
    }
  }

  test("range row slice") {
    assert(df.sliceFrame(Sel.Range(1, 3)).column("vv") == Vector(2, 3))
  }

  test("predicate filter ≡ mask∘slice (tests.lisp:66-70)") {
    val masked = df.slice(Sel.Mask(df.maskRows(Seq("vv"))(r => r.head.asInstanceOf[Int] >= 3)))
    val filtered = df.filter(col("vv") >= 3)
    (masked, filtered) match {
      case (SliceResult.Frame(m), f) =>
        assert(m.column("vv") == f.column("vv"))
        assert(f.column("vv") == Vector(3, 4))
      case other => fail(s"$other")
    }
  }

  test("map-rows (tests.lisp:74-78)") {
    val out = df.mapRows(Seq("vv"))(r => r.head.asInstanceOf[Int] * 2)
    assert(out == Vector(2, 4, 6, 8))
    val typed: Vector[Long] =
      df.mapRowsTyped(Seq("vv"))(r => r.head.asInstanceOf[Int].toLong * 2)
    assert(typed == Vector(2L, 4L, 6L, 8L))
  }

  test("map-df expression form with result keys (tests.lisp:80-86)") {
    val out = df.mapDF(
      "p" -> (col("vv") + 1),
      "m" -> (col("vv") % 2 === 0))
    assert(out.keys == Vector("p", "m"))
    assert(out.column("p") == Vector(2, 3, 4, 5))
    assert(out.column("m") == Vector(false, true, false, true))
  }

  test("map-df lambda form with declared element types (tests.lisp:85)") {
    val out = df.mapDFRows(Seq("vv"), Seq("p", "m"),
      Seq(LongType, BooleanType)) { r =>
      val x = r.head.asInstanceOf[Int]
      Seq(x.toLong + 1, x % 2 == 0)
    }
    assert(out.keys == Vector("p", "m"))
    assert(out.column("p") == Vector(2L, 3L, 4L, 5L))
    assert(out.column("m") == Vector(false, true, false, true))
    // declared types land in the schema
    assert(out.toSpark.schema("p").dataType == LongType)
    assert(out.toSpark.schema("m").dataType == BooleanType)
  }

  test("map-df lambda with inferred types runs fn EXACTLY once per row") {
    // type inference samples one row on the driver; the executor must reuse
    // that output instead of re-invoking fn (side effects would fire twice).
    // Static object counter: local-mode executors share the JVM, while a
    // captured counter would be serialized per task and mutate a copy.
    DFBasicsSpec.evalCount.set(0)
    val out = df.mapDFRows(Seq("vv"), Seq("d")) { r =>
      DFBasicsSpec.evalCount.incrementAndGet()
      Seq(r.head.asInstanceOf[Int] * 2)
    }
    assert(out.column("d") == Vector(2, 4, 6, 8))
    assert(DFBasicsSpec.evalCount.get == 4,
      s"fn ran ${DFBasicsSpec.evalCount.get} times for 4 rows")
  }

  test("map-df arity assert per row (cl-data-frame.lisp:548)") {
    intercept[Exception] {
      df.mapDFRows(Seq("vv"), Seq("p", "m"))(r => Seq(r.head)).column("p")
    }
  }

  test("mask-rows element type + count-rows (tests.lisp:87-90)") {
    val mask = df.maskRows(Seq("vv", "b")) { r =>
      r.head.asInstanceOf[Int] > 1 && r(1).asInstanceOf[Boolean]
    }
    assert(mask == Vector(false, true, true, false))
    assert(df.countRows(Seq("vv"))(r => r.head.asInstanceOf[Int] > 2) == 2L)
    assert(df.countRows(col("vv") > 2) == 2L)
  }

  test("do-rows traverses first to last (cl-data-frame.lisp:518-526)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Any]
    df.doRows(Seq("s"))(r => seen += r.head)
    assert(seen.toVector == Vector("a", "b", "c", "d"))
  }

  test("as-alist round trip (cl-data-frame.lisp:333-335)") {
    val alist = df.asAlist
    assert(alist.map(_._1) == Seq("vv", "b", "s"))
    assert(alist.head._2 == Vector(1, 2, 3, 4))
    val rebuilt = DF.fromColumns(spark, alist)
    assert(rebuilt.column("s") == df.column("s"))
  }

  test("matrix-df and as-array (cl-data-frame.lisp:456-482)") {
    val m = DF.fromMatrix(spark, Seq("x", "y"), Seq(Seq(1, 10), Seq(2, 20)))
    assert(m.column("x") == Vector(1, 2))
    assert(m.column("y") == Vector(10, 20))
    assert(m.toMatrix.map(_.toVector).toVector ==
      Vector(Vector(1, 10), Vector(2, 20)))
  }

  test("copy with key function (cl-data-frame.lisp:337-343)") {
    val renamed = df.copy(k => k.toUpperCase)
    assert(renamed.keys == Vector("VV", "B", "S"))
    assert(renamed.column("VV") == Vector(1, 2, 3, 4))
    // original untouched
    assert(df.keys == Vector("vv", "b", "s"))
  }

  test("print smoke (tests.lisp:92-95)") {
    val txt = Summary.frameSummary(df.toSpark)
    assert(txt.startsWith("#<DATA-FRAME (3 x 4)"))
    assert(df.sliceRow(0).render.startsWith("#<DATA-VECTOR (3)"))
  }

  test("ordered-keys print-object golden (cl-data-frame.lisp:213-215)") {
    // reference: (print-unreadable-object ... :type t) then keys joined
    // with ", " — e.g. #<ORDERED-KEYS vv, b, s>
    assert(df.renderOrderedKeys == "#<ORDERED-KEYS vv, b, s>")
    assert(df.copy(_.toUpperCase).renderOrderedKeys ==
      "#<ORDERED-KEYS VV, B, S>")
  }

  test("copyColumns: the reference's map-over-columns copy (cl-data-frame.lisp:337-343)") {
    // default identity = shallow copy: keys and data equal, frame independent
    val shallow = df.copyColumns()
    assert(shallow.keys == df.keys)
    assert(shallow.column("vv") == df.column("vv"))
    // non-identity columnFn maps over every column vector, keys kept —
    // the reference's `:key #'fn` semantics (cast keeps the mixed-type
    // frame total: strings stay strings)
    val mapped = df.copyColumns(c => upper(c.cast("string")))
    assert(mapped.keys == df.keys)
    assert(mapped.column("s") == df.column("s").map(
      _.asInstanceOf[String].toUpperCase))
    assert(mapped.column("vv") == Vector("1", "2", "3", "4"))
    // original untouched (the isolation contract)
    assert(df.column("s") == Vector("a", "b", "c", "d"))
  }
}

/** static (JVM-wide) invocation counter for the exactly-once mapDFRows test —
  * referenced via the object so local-mode tasks hit the same instance. */
object DFBasicsSpec {
  val evalCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
