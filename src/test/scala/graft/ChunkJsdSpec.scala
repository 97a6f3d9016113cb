package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** chunkTokenWindows (RAG overlapping chunker) and groupJsDivergence
  * (pairwise source JSD): hand-computed contracts, coverage properties,
  * and plan shape. */
class ChunkJsdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkTokenWindows: hand-computed windows, overlap and tail") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokenWindows(df, "doc_id", "text",
      chunkTokens = 3, strideTokens = 2).collect()
    // n=5: nchunks = 1 + ceil((5-3)/2) = 2 → [0,3) and [2,5)
    assert(out.length == 2)
    assert(out(0).getString(4) == "a b c" && out(0).getLong(2) == 0L)
    assert(out(1).getString(4) == "c d e" && out(1).getLong(2) == 2L)
    assert(out(1).getLong(3) == 3L)
  }

  test("chunkTokenWindows: short doc = one whole chunk; disjoint stride covers tail") {
    val short = TextAnalysis.chunkTokenWindows(
      Seq((1L, "x y")).toDF("doc_id", "text"), "doc_id", "text", 3, 2).collect()
    assert(short.length == 1 && short(0).getString(4) == "x y" &&
      short(0).getLong(3) == 2L)
    // n=7, chunk=3, stride=3: [0,3) [3,6) [6,7) — the last window is short
    // but still emitted (cover-all-tokens contract)
    val nov = TextAnalysis.chunkTokenWindows(
      Seq((1L, "a b c d e f g")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 3).collect()
    assert(nov.map(_.getString(4)).toSeq == Seq("a b c", "d e f", "g"))
  }

  test("chunkTokenWindows: every token covered, last window reaches the end") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 60L).map { i =>
      (i, (1 to (rnd.nextInt(90) + 1)).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", 24, 16)
      .groupBy("doc_id")
      .agg(max(col("start_token") + col("n_chunk_tokens")).as("covered_to"),
        min("start_token").as("first_start"),
        count(lit(1)).as("n_chunks"))
      .collect()
    val nTok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == nTok(id), s"doc $id not covered to the end")
      assert(r.getLong(2) == 0L)
      val expect = 1L + math.ceil(math.max(nTok(id) - 24L, 0L) / 16.0).toLong
      assert(r.getLong(3) == expect, s"doc $id chunk count")
    }
  }

  test("chunkTokenWindows: pure map + Generate — no join, no hash shuffle") {
    val docs = (1L to 100L).map(i => (i, s"a b c d e f g h i j k $i"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), s"chunker must not join:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"chunker must not hash-shuffle (only the output sort ranges):\n$plan")
  }

  test("groupJsDivergence: identical distributions → 0 bits; disjoint → 1 bit") {
    val df = Seq(
      ("a", "x y z x"), ("b", "x y z x"),   // identical token multisets
      ("c", "p q r")                         // disjoint vocabulary
    ).toDF("g", "text")
    val out = TextAnalysis.groupJsDivergence(df, "g", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) == (3L, 0.0))
    assert(out(("a", "c")) == (0L, 1.0))
    assert(out(("b", "c")) == (0L, 1.0))
  }

  test("groupJsDivergence: hand-computed half-bit case + range") {
    // A = {x, y}, B = {x, z}: only x common at p = q = 1/2 → the classic
    // JSD = 0.5 bits
    val df = Seq(("a", "x y"), ("b", "x z")).toDF("g", "text")
    val r = TextAnalysis.groupJsDivergence(df, "g", "text").head()
    assert(r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9, r.getDouble(3))
    // random corpora stay in [0, 1]
    val rnd = new scala.util.Random(5)
    val docs = (1 to 200).map { i =>
      (s"g${i % 4}", (1 to 20).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    }.toDF("g", "text")
    TextAnalysis.groupJsDivergence(docs, "g", "text").collect().foreach { row =>
      val v = row.getDouble(3)
      assert(v >= 0.0 && v <= 1.0, s"jsd out of range: $v")
    }
  }

  test("topPmiBigrams: hand-computed PMI, hapax guard, top-k cut") {
    val docs = Seq("a b", "a b", "a b", "c c").toDF("text")
    // tokens a:3 b:3 c:2 (N=8), pairs (a,b):3 (c,c):1 (M=4)
    val all = TextAnalysis.topPmiBigrams(docs, "text", k = 10,
      minPairCount = 1L).collect()
    val rows = all.map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
      r.getAs[Long]("cnt_ab"), r.getAs[Long]("pmi_nanos")))
    assert(rows.length == 2, rows.mkString(", "))
    val abRow = rows.find(t => t._1 == "a" && t._2 == "b").get
    val ccRow = rows.find(t => t._1 == "c" && t._2 == "c").get
    assert(abRow._3 == 3L)
    assert(abRow._4 == math.round(math.log(3.0 * 64 / (4 * 3 * 3)) * 1e9))
    assert(ccRow._3 == 1L)
    assert(ccRow._4 == math.round(math.log(4.0) * 1e9))
    // hapax guard drops the singleton pair
    val guarded = TextAnalysis.topPmiBigrams(docs, "text", k = 10,
      minPairCount = 2L).collect()
    assert(guarded.length == 1 &&
      guarded.head.getAs[String]("t1") == "a")
    // top-k cut keeps the highest-PMI pair (a,b at ln 16/3 > c,c at ln 4)
    val top1 = TextAnalysis.topPmiBigrams(docs, "text", k = 1,
      minPairCount = 1L).collect()
    assert(top1.head.getAs[String]("t1") == "a", top1.mkString(", "))
  }

  test("groupTokenJaccard: hand-computed thirds, identical → 1, disjoint → 0 row kept") {
    val df = Seq(
      ("a", "x y"), ("b", "x z"),       // |A∩B|=1, |A∪B|=3 → 1/3
      ("c", "x y"),                      // identical set to a → 1
      ("d", "p q")                       // disjoint from a → 0 (row kept)
    ).toDF("g", "text")
    val out = TextAnalysis.groupTokenJaccard(df, "g", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", "b")) == (1L, 3L, 0.333333))
    assert(out(("a", "c")) == (2L, 2L, 1.0))
    assert(out(("a", "d")) == (0L, 4L, 0.0))
    assert(out.size == 6) // all C(4,2) pairs present
    // duplicate tokens in a doc count once (SET semantics)
    val dup = Seq(("a", "x x x y"), ("b", "x z")).toDF("g", "text")
    val r = TextAnalysis.groupTokenJaccard(dup, "g", "text").head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 3L)
  }

  test("groupJsDivergence: group totals broadcast; join is vocab-keyed") {
    val docs = (1 to 300).map(i =>
      (s"g${i % 5}", s"tok${i % 40} tok${i % 17} common")).toDF("g", "text")
    val q = TextAnalysis.groupJsDivergence(docs, "g", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"totals should broadcast back:\n$plan")
    // the groups²-sized pairs frame may use a nested-loop cross join (tiny
    // by contract); the TOKEN join must be an equi-join, never cartesian
    assert(plan.contains("hashpartitioning(__term") ||
      plan.contains("BroadcastHashJoin"), plan)
  }
}
