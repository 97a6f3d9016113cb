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

  test("prefix-filter containment ≡ brute-force all-pairs (lossless blocking)") {
    import graft.operators.Dedup
    import spark.implicits._
    // tiny vocabulary → heavy cross-doc shingle sharing, the adversarial
    // regime for candidate generation: every missed candidate is a missed
    // TRUE pair. Brute force is computed driver-side with the exact
    // tokenize→3-gram-shingle semantics the operator uses.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(3, 7).flatMap(k => Gen.listOfN(k, docGen))
    def shingleSet(text: String): Set[String] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split("\\s+").toSeq
      (0 to math.max(toks.length - 3, 0))
        .map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")).toSet
    }
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    check(Prop.forAll(corpusGen, Gen.oneOf(0.5, 0.7, 0.9)) { (texts, t) =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = Dedup.ngramContainmentPrefix(docs, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sets = texts.zipWithIndex.map { case (s, i) => i.toLong -> shingleSet(s) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        c = round6(sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size))
        if c >= t
      } yield (a, b) -> c).toMap
      got == want
    }, n = 6)
  }

  test("dedupParagraphsIntra is idempotent and preserves first occurrences") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val paraGen = Gen.oneOf("alpha", "beta beta", "gamma delta", "", " ")
    val docGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, paraGen).map(_.mkString("\n")))
    check(Prop.forAll(Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, docGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      def run(d: org.apache.spark.sql.DataFrame, c: String) =
        TextAnalysis.dedupParagraphsIntra(d, "doc_id", c)
          .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val once = run(docs, "text")
      // reference model: keep blanks, else first occurrence
      val model = texts.zipWithIndex.map { case (s, i) =>
        val seen = scala.collection.mutable.Set[String]()
        (i.toLong, s.split("\\r?\\n", -1).filter(p =>
          p.trim.isEmpty || seen.add(p)).mkString("\n"))
      }
      val fixed = run(once.map(identity).toDF("doc_id", "text"), "text")
      once == model && fixed == once // model-exact AND idempotent
    }, n = 6)
  }

  test("searchPhrase ≡ brute-force sliding-window phrase count") {
    import graft.operators.Search
    import spark.implicits._
    val vocab = Vector("a", "b", "c")
    val docGen = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(2, 5).flatMap(k => Gen.listOfN(k, docGen))
    val phraseGen = Gen.choose(2, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)))
    check(Prop.forAll(corpusGen, phraseGen) { (texts, phrase) =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      Search.writePositionalIndex(docs, "doc_id", "text", "graft_pos_prop",
        nBuckets = 2)
      try {
        val got = Search.searchPhrase(spark, "graft_pos_prop", phrase, 100)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val want = texts.zipWithIndex.flatMap { case (s, i) =>
          val toks = s.split(" ").toSeq
          val n = toks.sliding(phrase.length)
            .count(w => w == phrase)
          if (n > 0) Some(i.toLong -> n.toLong) else None
        }.toMap
        got == want
      } finally spark.sql("DROP TABLE IF EXISTS graft_pos_prop_pos")
    }, n = 6)
  }

  test("heavyHitters result is partitioning-independent") {
    import graft.operators.Relational
    import spark.implicits._
    val tokGen = Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.oneOf((0 until 30).map(i => s"cold$i")))
    check(Prop.forAll(Gen.choose(40, 120).flatMap(n => Gen.listOfN(n, tokGen)),
        Gen.oneOf(0.05, 0.1, 0.3)) { (toks, support) =>
      val d = toks.toDF("tok")
      def runAt(parts: Int) =
        Relational.heavyHitters(d.repartition(parts), "tok", support)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val brute = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= math.ceil(support * toks.size).toLong)
        .map { case (k, v) => (k, v) }.toSet
      runAt(1) == brute && runAt(7) == brute && runAt(32) == brute
    }, n = 5)
  }

  test("datasetDiff ≡ reference map diff over random snapshot edits") {
    import spark.implicits._
    import graft.sources.Sources
    val snapGen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 30L), Gen.alphaLowerStr.map(_.take(5)))))
    check(Prop.forAll(snapGen, snapGen) { (cur0, prev0) =>
      val cur = cur0.distinctBy(_._1)
      val prev = prev0.distinctBy(_._1)
      val (cm, pm) = (cur.toMap, prev.toMap)
      val expect =
        (cm.keySet -- pm.keySet).map(_ -> "added") ++
        (pm.keySet -- cm.keySet).map(_ -> "removed") ++
        (cm.keySet & pm.keySet).collect {
          case id if cm(id) != pm(id) => id -> "changed"
        }
      val got = Sources.datasetDiff(cur.toDF("id", "text"),
          prev.toDF("id", "text"), "id", Seq("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      got == expect.toSet
    }, n = 10)
  }

  test("globalPrefixSum ≡ sequential scan, any bucket count / partitioning") {
    import spark.implicits._
    import graft.operators.Relational
    // ids: arbitrary positive longs with clustering and gaps; values
    // include zero and larger-than-bucket-width magnitudes
    val rowsGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 100000L), Gen.choose(0L, 999L))))
    check(Prop.forAll(rowsGen, Gen.oneOf(1, 3, 64), Gen.oneOf(1, 5, 32)) {
      (rows0, nb, parts) =>
        val sorted = rows0.distinctBy(_._1).sortBy(_._1) // unique order keys
        val expect = sorted.map(_._1)
          .zip(sorted.scanLeft(0L)(_ + _._2).init).toMap
        val got = Relational.globalPrefixSum(
            sorted.toDF("id", "v").repartition(parts), "id", "v",
            nBuckets = nb)
          .select("id", "prefix").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        got == expect
    }, n = 12)
  }

  test("corrMatrix agrees with Spark's streaming corr to 1e-6 and is partition-order-independent") {
    import spark.implicits._
    import graft.operators.Profiling
    val rowsGen = Gen.choose(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(-50L, 50L))))
    check(Prop.forAll(rowsGen, Gen.oneOf(1, 7)) { (rows, parts) =>
      val df = rows.toDF("x", "y").repartition(parts)
      val got = Profiling.corrMatrix(df, Seq("x" -> col("x"), "y" -> col("y")))
        .collect().head
      val ours = Option(got.get(2)).map(_.asInstanceOf[Double])
      val xs = rows.map(_._1); val ys = rows.map(_._2)
      val degenerate = xs.distinct.size == 1 || ys.distinct.size == 1
      if (degenerate) ours.isEmpty
      else {
        // Spark's corr() streams double co-moments — close but not exact
        val ref = df.stat.corr("x", "y")
        ours.exists(v => math.abs(v - ref) < 1e-6)
      }
    }, n = 20)
  }

  test("psiDrift is non-negative and zero exactly on equal smoothed shares") {
    import spark.implicits._
    import graft.operators.Profiling
    val corpusGen = Gen.choose(4, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 20L)))
    check(Prop.forAll(corpusGen, corpusGen) { (ref, cur) =>
      val psi = Profiling.psiDrift(ref.toDF("v"), cur.toDF("v"), col("v"))
        .collect().head.getDouble(3)
      // each term (p−q)·ln(p/q) ≥ 0; nanos rounding can dip a hair below
      psi >= -1e-9
    }, n = 12)
    // identical corpora are exactly zero (no rounding residue: p = q)
    check(Prop.forAll(corpusGen) { ref =>
      Profiling.psiDrift(ref.toDF("v"), ref.toDF("v"), col("v"))
        .collect().head.getDouble(3) == 0.0
    }, n = 8)
  }
}
