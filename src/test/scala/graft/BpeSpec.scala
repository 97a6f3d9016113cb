package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learn: hand-computed merge order, count-desc/pair-asc ties, early stop") {
    // round 1: (a,b) appears 3·2 + 2·1 = 8 times — wins over (b,a)=3,
    // (b,c)=2; round 2: (ab,ab)=3; round 3: (ab,c)=2; round 4: no pair
    // reaches freq 2 → early stop despite numMerges=10
    val m = Bpe.learn(Seq(("abab", 3L), ("abc", 2L)), numMerges = 10)
    assert(m.merges == Vector(("a", "b"), ("ab", "ab"), ("ab", "c")),
      m.merges.toString)
    // exact tie on count: lexicographically smaller pair wins
    val tie = Bpe.learn(Seq(("xy", 2L), ("yz", 2L)), numMerges = 1)
    assert(tie.merges == Vector(("x", "y")), tie.merges.toString)
  }

  test("encodeWord: lowest-rank-first, merge-all-occurrences, unknown symbols") {
    val m = Bpe.BpeModel(Vector(("a", "b"), ("ab", "ab"), ("ab", "c")))
    assert(Bpe.encodeWord("ababab", m) == Vector("abab", "ab"))
    assert(Bpe.encodeWord("abcabc", m) == Vector("abc", "abc"))
    assert(Bpe.encodeWord("xyz", m) == Vector("x", "y", "z"))
    assert(Bpe.encodeWord("", m) == Vector.empty)
    assert(Bpe.encodeWord("a", m) == Vector("a"))
  }

  test("tokenCounts kernel ≡ independent sequential recompute; pre-token parity") {
    val m = Bpe.BpeModel(Vector(("a", "b"), ("ab", "ab"), ("ab", "c")))
    val docs = Seq(
      (1L, "ababab abcabc xyz"),   // 2 + 2 + 3 = 7
      (2L, "AB, ab!"),             // lowercased: ab + , + ab + ! = 1+1+1+1
      (3L, ""),                    // empty → 0
      (4L, "ab ab ab ab ab ab"))   // memo-heavy row: 6 × 1
    val got = Bpe.tokenCounts(docs.toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 4L, 3L -> 0L, 4L -> 6L), got.toString)
    // the Spark-independent encoder lands on identical counts (the
    // q_bpe_count oracle contract)
    val indep = graft.verify.IndependentOracles.bpeCounts(docs, m.merges).toMap
    assert(indep == got, s"independent recompute diverged: $indep vs $got")
    // the dictionary-join batch path is result-identical by construction
    // (each distinct word encoded once, lengths joined back), including the
    // empty doc's 0 row — and stays identical under repartitioning
    val dict = Bpe.tokenCountsDict(docs.toDF("doc_id", "text").repartition(3),
        "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dict == got, s"dict path diverged from memo kernel: $dict vs $got")
  }

  test("fit: end-to-end on a frame, merges deterministic, refines subwordCount") {
    val docs = Seq((1L, "the cat the hat"), (2L, "the bat the cat"),
      (3L, "thorn then"))
      .toDF("doc_id", "text")
    val m1 = Bpe.fit(docs, "text", numMerges = 5)
    val m2 = Bpe.fit(docs.repartition(3), "text", numMerges = 5)
    assert(m1 == m2, "fit must be partitioning-independent")
    // 'th' is the most frequent pair in this corpus — the first merge
    assert(m1.merges.head == (("t", "h")), m1.merges.toString)
    // BPE token counts are bounded above by character counts and below by
    // the pre-token (subwordCount) counts — merges only ever shrink
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pre = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.subwordCount(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(counts(id) >= pre(id),
        s"doc $id: BPE count ${counts(id)} below pre-token count " +
          s"${pre(id)} — impossible: BPE splits WITHIN pre-tokens, so " +
          "every pre-token contributes at least one unit")
    }
  }
}
