package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.sources.Sources

/** [EXT] sources/sinks round-trips and typed Aggregator (UDAF) registration
  * (SURVEY §2.9 rows 42 and 51). */
class SourcesAndUdafSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "tag", "x")

  test("parquet round trip with partitioning") {
    val dir = Files.createTempDirectory("graft_pq").toString + "/t"
    Sources.writeParquet(fixture, dir, partitionBy = Seq("tag"))
    val back = Sources.readParquet(spark, dir)
    assert(back.count() == 3)
    // partition pruning: reading one partition touches one directory
    assert(back.filter(col("tag") === "a").count() == 2)
  }

  test("csv round trip (schema-first read)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    Sources.writeCsv(fixture, dir)
    val back = Sources.readCsv(spark, dir, Some(fixture.schema))
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
  }

  test("json round trip") {
    val dir = Files.createTempDirectory("graft_json").toString + "/t"
    Sources.writeJson(fixture, dir)
    val back = Sources.readJson(spark, dir, Some(fixture.schema))
    assert(back.count() == 3)
    assert(back.filter(col("tag") === "b").select("x").head().getDouble(0) == 2.5)
  }

  test("orc round trip with partitioning and predicate pushdown") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    Sources.writeOrc(fixture, dir, partitionBy = Seq("tag"))
    val back = Sources.readOrc(spark, dir)
    assert(back.count() == 3)
    assert(back.filter(col("tag") === "b").select("x").head().getDouble(0) == 2.5)
    // non-partition predicate reaches the ORC scan as a pushed filter
    val q = back.filter(col("id") === 2L)
    q.collect()
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(id,2\\).*"), plan)
  }

  test("SparseCounter aggregator reproduces the reference frequency summary") {
    val counter = udaf(Aggregators.SparseCounter())
    val vals = Seq("a", "b", "a", "a", "c", "b").toDF("v")
    val freq = vals.agg(counter(col("v")).as("freq"))
      .selectExpr("explode(freq) AS e").select("e.*").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(freq == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("SparseCounter cap bounds the buffer (documented delta)") {
    val capped = Aggregators.SparseCounter(maxEntries = 2)
    val b = Seq("x", "y", "z", "x").foldLeft(capped.zero)(capped.reduce)
    assert(b.size == 2)        // z dropped at cap
    assert(b("x") == 2L)       // existing values keep counting
  }

  test("LongMean aggregator as grouped UDAF") {
    val mean = udaf(Aggregators.LongMean())
    val out = Seq(("g1", 2L), ("g1", 4L), ("g2", 10L)).toDF("g", "v")
      .groupBy("g").agg(mean(col("v")).as("m"))
      .orderBy("g").as[(String, Double)].collect().toSeq
    assert(out == Seq(("g1", 3.0), ("g2", 10.0)))
  }

  test("TopK aggregator ≡ window row_number top-k (incl. tie-break)") {
    import graft.operators.Relational
    val rnd = new scala.util.Random(5)
    val d = (1L to 300L).map(i => (s"g${i % 3}", rnd.nextInt(40).toDouble, i))
      .toDF("g", "ord", "id")
    val topk = udaf(Aggregators.TopK(4))
    val viaAgg = d.groupBy("g").agg(topk(col("ord"), col("id")).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e._1").as("ord"), col("e._2").as("id"))
      .as[(String, Double, Long)].collect().toSet
    val viaWindow = Relational.topNPerGroup(d, Seq("g"),
        Seq(desc("ord"), asc("id")), 4)
      .select("g", "ord", "id")
      .as[(String, Double, Long)].collect().toSet
    // random duplicate ord values force the id tie-break on both paths
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 12)
  }

  test("binaryFile ingest: glob pruning, size cap, media bridge") {
    import graft.operators.Multimodal
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("a.jpg"), "fake-jpeg-bytes".getBytes("UTF-8"))
    Files.write(dir.resolve("b.jpg"), ("x" * 2048).getBytes("UTF-8"))
    Files.write(dir.resolve("notes.txt"), "not media".getBytes("UTF-8"))
    val all = Sources.readBinaryFiles(spark, dir.toString, pathGlob = "*.jpg")
    assert(all.count() == 2) // glob drops the .txt at listing time
    val capped = Sources.readBinaryFiles(spark, dir.toString,
      pathGlob = "*.jpg", maxFileBytes = 1024)
    assert(capped.count() == 1) // oversized blob refused by the length filter
    val media = Multimodal.asMediaFromBinary(all)
    val rows = media.orderBy("n_bytes").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_bytes") == 15L)
    assert(new String(rows(0).getAs[Array[Byte]]("bytes"), "UTF-8") == "fake-jpeg-bytes")
    // metadata stats work on the bridged frame without touching blobs
    val stats = Multimodal.metadataStats(media).collect()
    assert(stats.length == 1 && stats(0).getAs[Long]("total_bytes") == 2063L)
  }

  test("writeRangePartitioned: files cover disjoint sorted ranges") {
    val dir = Files.createTempDirectory("graft_range").toString + "/t"
    val data = spark.range(0, 10000).select(
      col("id"), (col("id") * 7 % 97).as("payload"))
    Sources.writeRangePartitioned(data, dir, "id", numFiles = 4)
    val back = Sources.readParquet(spark, dir)
    assert(back.count() == 10000)
    // per-file [min, max] intervals must be pairwise disjoint — the layout
    // property that lets parquet min/max stats skip whole files for range
    // predicates
    val ranges = back
      .select(input_file_name().as("f"), col("id"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlapping file ranges: $ranges")
    }
  }

  test("text ingest: per-line and whole-file document shapes") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.write(dir.resolve("d1.txt"), "line one\nline two".getBytes("UTF-8"))
    Files.write(dir.resolve("d2.txt"), "single doc".getBytes("UTF-8"))
    val lines = Sources.readText(spark, dir.toString)
    assert(lines.count() == 3)
    val docs = Sources.readText(spark, dir.toString, wholeFile = true)
    val texts = docs.as[String].collect().toSet
    assert(texts == Set("line one\nline two", "single doc"))
    // whole-file rows feed the text operators directly
    val toks = docs.select(
      graft.operators.TextAnalysis.tokenCount(col("value")).as("n")).as[Int]
      .collect().sorted
    assert(toks.toSeq == Seq(2, 4))
  }

  test("content manifest: layout-independent, change-sensitive, verify round trip") {
    val d = spark.range(0, 1000)
      .select(col("id"), (col("id") * 7 % 13).as("v"))
    val m1 = Sources.contentManifest(d.repartition(17))
    val m2 = Sources.contentManifest(
      d.repartition(3).sortWithinPartitions(org.apache.spark.sql.functions.desc("v")))
    assert(m1 == m2, "manifest must ignore partitioning and row order")
    assert(m1._1 == 1000L)
    // one changed row flips the hash, row count unchanged
    val changed = d.withColumn("v",
      when(col("id") === 500, lit(-1L)).otherwise(col("v")))
    val mc = Sources.contentManifest(changed)
    assert(mc._1 == m1._1 && mc._2 != m1._2)
    val p = Files.createTempDirectory("graft_manifest").toString + "/m.json"
    Sources.writeManifest(d, p)
    Sources.verifyManifest(d.repartition(5), p) // re-layout verifies clean
    intercept[IllegalStateException] { Sources.verifyManifest(changed, p) }
    // the wraparound-SUM upgrade, pinned: under the old multiset-XOR a row
    // duplicated an even number of times cancelled (x ⊕ x = 0) and only
    // row_count fenced it; under the sum each extra copy shifts the hash
    // by its own term, so duplicating a row PAIR flips the hash itself
    val doubled = d.unionAll(d)
    val md = Sources.contentManifest(doubled)
    assert(md._2 != m1._2, "doubling every row must flip the sum-hash")
    assert(md._1 == 2 * m1._1)
    intercept[IllegalStateException] { Sources.verifyManifest(doubled, p) }
    // …and duplicating just one row PAIR (same count parity trap as the
    // XOR caveat, but with an unchanged-looking corpus) flips it too
    val onePair = d.unionAll(d.filter(col("id") === 7))
      .unionAll(d.filter(col("id") === 7))
    val mp = Sources.contentManifest(onePair)
    assert(mp._2 != m1._2, "an even-duplicated row must not cancel out")
  }

  test("datasetDiffColumns: per-column change counts, null-safe, common ids only") {
    val prev = Seq(
      (1L, Some("alpha"), Some("x")),
      (2L, Some("beta"), Some("y")),
      (3L, Some("gone"), Some("z")),            // removed: not counted
      (4L, Option.empty[String], Some("w")),    // null -> value: text change
      (5L, Option.empty[String], Some("v")))    // null -> null: no change
      .toDF("id", "text", "meta")
    val cur = Seq(
      (1L, Some("alpha"), Some("X2")),          // meta changed
      (2L, Some("beta EDITED"), Some("y")),     // text changed
      (4L, Some("filled"), Some("w")),
      (5L, Option.empty[String], Some("v")),
      (6L, Some("new"), Some("n")))             // added: not counted
      .toDF("id", "text", "meta")
    val got = Sources.datasetDiffColumns(cur, prev, "id",
        Seq("meta", "text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("meta", 1L, 4L), ("text", 2L, 4L)))
    val e = intercept[IllegalArgumentException](
      Sources.datasetDiffColumns(cur, prev, "id", Seq.empty))
    assert(e.getMessage.contains("compare"))
  }

  test("datasetDiff: added/removed/changed only, hash-before-join semantics") {
    val prev = Seq((1L, "alpha", "x"), (2L, "beta", "y"), (3L, "gone", "z"),
      (4L, "same", "w")).toDF("id", "text", "meta")
    val cur = Seq((1L, "alpha", "x"), (2L, "beta EDITED", "y"),
      (4L, "same", "w"), (5L, "new", "v")).toDF("id", "text", "meta")
    val got = Sources.datasetDiff(cur, prev, "id", Seq("text", "meta"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // unchanged ids (1, 4) are absent — the diff is |Δ|-sized
    assert(got == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // the U+0001 separator keeps adjacent columns from borrowing bytes:
    // ("ab","c") and ("a","bc") must NOT hash equal
    val a = Seq((1L, "ab", "c")).toDF("id", "t", "m")
    val b = Seq((1L, "a", "bc")).toDF("id", "t", "m")
    assert(Sources.datasetDiff(a, b, "id", Seq("t", "m"))
      .collect().map(_.getString(1)).toSeq == Seq("changed"))
    // compare-column subset: a meta-only edit is invisible when diffing
    // on text alone
    assert(Sources.datasetDiff(
      Seq((1L, "alpha", "EDIT")).toDF("id", "text", "meta"),
      Seq((1L, "alpha", "x")).toDF("id", "text", "meta"),
      "id", Seq("text")).count() == 0)
    // scale invariant: the join operands are (id, hash) ONLY — document
    // bodies never reach the shuffle
    val joins = Sources.datasetDiff(cur, prev, "id", Seq("text", "meta"))
      .queryExecution.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
    assert(joins.nonEmpty, "expected a shuffled join in the diff plan")
    joins.foreach { j =>
      val names = (j.left.output ++ j.right.output).map(_.name)
      assert(names.forall(n => n == "id" || n.startsWith("__h")),
        s"join operand carries a non-hash column: $names")
    }
  }
}
