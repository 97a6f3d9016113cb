package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the algebra the reference asserts by example
  * (SURVEY §5.2): mask∘slice ≡ filter, slice-of-slice composition, copy
  * isolation, negative-index resolution. Small generators keep each Spark
  * job sub-second. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[List[Int]] = Gen.choose(1, 6)
    .flatMap(len => Gen.listOfN(len, Gen.choose(-10, 10)))

  test("mask∘slice ≡ filter (tests.lisp:66-70 generalized)") {
    check(Prop.forAll(vecGen, Gen.choose(-10, 10)) { (xs, theta) =>
      val d = DF(spark, "x" -> xs)
      val mask = d.maskRows(Seq("x"))(r => r.head.asInstanceOf[Int] >= theta)
      val viaMask = d.sliceFrame(Sel.Mask(mask)).column("x")
      val viaFilter = d.filter(col("x") >= theta).column("x")
      viaMask == viaFilter && viaMask == xs.filter(_ >= theta).toVector
    })
  }

  test("column slice-of-slice composes") {
    val d = DF(spark, "a" -> Seq(1), "b" -> Seq(2), "c" -> Seq(3), "d" -> Seq(4))
    check(Prop.forAll(Gen.atLeastOne("a", "b", "c", "d"), Gen.choose(0, 3)) { (ks0, i) =>
      val ks = ks0.toSeq
      val once = d.columns(Sel.Names(ks))
      val j = i % ks.size
      once.columns(Sel.Index(j)).keys == Vector(ks(j))
    })
  }

  test("functional ops never mutate the source (copy isolation)") {
    check(Prop.forAll(vecGen) { xs =>
      val d = DF(spark, "x" -> xs)
      d.addColumn("y", col("x") * 2)
      d.replaceColumnFn("x", _ + 1)
      d.copy(_.toUpperCase)
      d.keys == Vector("x") && d.column("x") == xs.toVector
    })
  }

  test("negative index resolves as n+i (cl-slice semantics)") {
    check(Prop.forAll(Gen.choose(1, 20), Gen.choose(-20, 19)) { (n, i) =>
      if (i >= -n && i < n) {
        val r = DF.resolveIndex(i, n)
        r == (if (i < 0) n + i else i) && r >= 0 && r < n
      } else
        scala.util.Try(DF.resolveIndex(i, n)).isFailure
    }, n = 30)
  }

  test("countRows ≡ mask popcount ≡ filter count") {
    check(Prop.forAll(vecGen, Gen.choose(-10, 10)) { (xs, theta) =>
      val d = DF(spark, "x" -> xs)
      val a = d.countRows(col("x") > theta)
      val b = d.countRows(Seq("x"))(r => r.head.asInstanceOf[Int] > theta)
      val c = d.maskRows(Seq("x"))(r => r.head.asInstanceOf[Int] > theta).count(identity)
      a == b && b == c.toLong && a == xs.count(_ > theta).toLong
    })
  }
}
