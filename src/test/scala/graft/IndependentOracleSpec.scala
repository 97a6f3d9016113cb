package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.verify.{IndependentOracles, XxH64Portable}

/** The Spark-independent sketch recompute (graft.verify) that generates the
  * q_minhash_dedup / q_simhash_dedup / q_approx_distinct DuckDB oracles must
  * agree with the engine under test — asserted here layer by layer (hash
  * primitive, tokenizer, signature, survivor set, HLL estimate) so a future
  * divergence pinpoints its layer instead of surfacing as an opaque
  * CORRECTNESS hash mismatch. */
class IndependentOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic fixture strings covering every xxh64 tail path: 0..100
  // bytes crosses the <4, <8, <32, and multi-stripe boundaries
  private def fixtureStrings: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val pool = "abcdefghijklmnopqrstuvwxyz0123456789 éüλ→"
    (0 to 100).map(n => Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString)
  }

  test("XxH64Portable.hashBytes matches Spark xxhash64 over strings of every tail length") {
    val df = fixtureStrings.toDF("s").select(col("s"), xxhash64(col("s")).as("h"))
    df.collect().foreach { r =>
      assert(XxH64Portable.hashString(r.getString(0), 42L) == r.getLong(1),
        s"string '${r.getString(0).take(20)}…' (${r.getString(0).length} chars)")
    }
  }

  test("XxH64Portable.hashLong/hashInt match Spark xxhash64 on longs and ints") {
    val longs = Seq(0L, 1L, -1L, 42L, Long.MinValue, Long.MaxValue, 123456789012345L)
    val ldf = longs.toDF("v").select(col("v"), xxhash64(col("v")).as("h"))
    ldf.collect().foreach { r =>
      assert(XxH64Portable.hashLong(r.getLong(0), 42L) == r.getLong(1), s"long ${r.getLong(0)}")
    }
    val ints = Seq(0, 1, -1, 42, Int.MinValue, Int.MaxValue)
    val idf = ints.toDF("v").select(col("v"), xxhash64(col("v")).as("h"))
    idf.collect().foreach { r =>
      assert(XxH64Portable.hashInt(r.getInt(0), 42L) == r.getLong(1), s"int ${r.getInt(0)}")
    }
  }

  test("bandKey replicates Spark's xxhash64(array<long>, int) fold") {
    // the exact banding expression lshBands uses: xxhash64(slice(sig, …), b)
    val sig = Seq(11L, 22L, 33L, 44L, 55L, 66L, 77L, 88L)
    val df = Seq(Tuple1(sig)).toDF("sig").select(
      (0 until 2).map(b =>
        xxhash64(slice(col("sig"), b * 4 + 1, 4), lit(b)).as(s"b$b")): _*)
    val row = df.head()
    (0 until 2).foreach { b =>
      assert(IndependentOracles.bandKey(sig.toArray, b, 4) == row.getLong(b),
        s"band $b")
    }
  }

  test("tokenize matches the SQL tokenizer on the sf0.001 corpus") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"),
        TextAnalysis.tokens(TextAnalysis.normalized(col("text"))).as("toks"))
      .collect()
    rows.foreach { r =>
      assert(IndependentOracles.tokenize(r.getString(0)).toSeq ==
        r.getSeq[String](1), s"text '${r.getString(0).take(40)}…'")
    }
  }

  test("independent minhash survivor set == Dedup.minhashDedup on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sparkKept = Dedup.minhashDedup(docs, "doc_id", "text", 0.5,
        numHashes = 32, bands = 8)
      .select("doc_id").as[Long].collect().toSet
    val collected = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), IndependentOracles.tokenize(r.getString(1)))).toSeq
    val dropped = IndependentOracles.minhashDroppedIds(collected,
      threshold = 0.5, numHashes = 32, bands = 8)
    val indepKept = collected.map(_._1).toSet -- dropped
    assert(dropped.nonEmpty, "fixture corpus must exercise the drop path")
    assert(indepKept == sparkKept)
  }

  test("independent simhash survivor set == Dedup.simhashDedup on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sparkKept = Dedup.simhashDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val collected = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), IndependentOracles.tokenize(r.getString(1)))).toSeq
    val dropped = IndependentOracles.simhashDroppedIds(collected)
    val indepKept = collected.map(_._1).toSet -- dropped
    assert(dropped.nonEmpty, "fixture corpus must exercise the drop path")
    assert(indepKept == sparkKept)
  }

  test("hllRawEstimate matches approx_count_distinct across cardinalities") {
    // several cardinalities spanning the raw regime (all ≥ 5m = 2560 for
    // p = 9), plus stride/offset variety so the hashed values differ
    val cases = Seq((3000, 1L, 7L), (14743, 1L, 1L), (50000, 101L, 13L))
    cases.foreach { case (n, off, stride) =>
      val values = (0 until n).map(i => off + i * stride)
      val sparkEst = values.toDF("v").select(col("v").cast(LongType).as("v"))
        .agg(approx_count_distinct(col("v")).as("e")).head().getLong(0)
      val indep = IndependentOracles.hllRawEstimate(values.map(_.toLong))
      assert(indep.contains(sparkEst), s"n=$n off=$off stride=$stride")
    }
  }

  test("hllRawEstimate refuses the non-raw regime instead of guessing") {
    // 2000 distinct < 5m = 2560 → Spark applies the bias-interpolation
    // tables; the independent estimator must return None (the caller then
    // degrades to the rows-only check) rather than an uncorrected literal
    assert(IndependentOracles.hllRawEstimate((1L to 2000L)).isEmpty)
  }

  test("sketch oracles generated for the verify dirs match DuckDB-free replay in Spark") {
    // end-to-end shape check of the generated SQL itself on sf0.001: replay
    // the NOT IN literal list through Spark SQL over the same parquet and
    // compare to the production query output (the driver's DuckDB run
    // executes the identical statement text)
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("documents")
    try {
      val collected = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), IndependentOracles.tokenize(r.getString(1)))).toSeq
      val dropped = IndependentOracles.minhashDroppedIds(collected,
        threshold = 0.5, numHashes = 32, bands = 8)
      val sql = "SELECT doc_id FROM documents WHERE doc_id NOT IN (" +
        dropped.toSeq.sorted.mkString(", ") + ") ORDER BY doc_id"
      val replay = spark.sql(sql).as[Long].collect().toSeq
      val prod = Dedup.minhashDedup(docs, "doc_id", "text", 0.5,
          numHashes = 32, bands = 8)
        .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
      assert(replay == prod)
    } finally spark.catalog.dropTempView("documents")
  }
}
