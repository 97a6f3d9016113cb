package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.operators.Layout.DimBounds

/** [EXT] Z-order (Morton) data layout: the interleave math, the
  * quantization contract, and the physical property the whole operator
  * exists for — every output file covering a compact rectangle in BOTH
  * dimensions (what parquet min/max pruning needs to skip on either). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorder2: known bit patterns interleave a-odd / b-even") {
    // a = 101b lands at positions 5,3,1 → 100010b = 34
    // b = 011b lands at positions 4,2,0 → 000101b = 5
    val row = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 3).as("z"))
      .head()
    assert(row.getLong(0) == 39L)
    // one step in a = +2 in z at the low bit-pair; identity at zero
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == Seq(0L, 2L, 1L, 3L, 15L))
  }

  test("quantize: exact shift from span bit-width, clamped at the edges") {
    // span 1000 → width 10 → shift 2 at 8 bits; cells stay < 256
    val d = DimBounds(0L, 999L, 8)
    assert(d.shift == 2)
    val q = Seq(0L, 999L, 1500L, -7L).toDF("x")
      .select(Layout.quantize(col("x"), d).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 249L, 249L, 0L)) // out-of-range clamps, never spills
    // power-of-two span: integer bit-length must not misround (1024 → 10)
    assert(DimBounds(0L, 1023L, 8).shift == 2)
    assert(DimBounds(0L, 1024L, 8).shift == 3)
    // span exactly 2^bits → identity cells
    assert(DimBounds(0L, 255L, 8).shift == 0)
    // NARROW span upshifts so its MSB aligns with the wide dimension's —
    // without this the wide dim's high bits own every z-range cut and the
    // layout degenerates to a 1-D sort
    val narrow = DimBounds(10L, 100L, 8) // span 91 → width 7 → upshift 1
    assert(narrow.shift == -1)
    val nq = Seq(10L, 100L).toDF("x")
      .select(Layout.quantize(col("x"), narrow).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(nq == Seq(0L, 180L)) // 90 << 1; still < 256
  }

  test("writeZOrdered: files are compact rectangles in BOTH dimensions") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long"))
    val zDir = Files.createTempDirectory("graft_z").toString + "/t"
    val plainDir = Files.createTempDirectory("graft_plain").toString + "/t"
    // 16 files = 4 top z-bits per cut set = TWO alternating splits per
    // dimension (an odd file count would cut the odd-position dimension
    // once more than the even one and skew the span comparison)
    Layout.writeZOrdered(orders, zDir, col("o_custkey"), col("day"),
      bits = 16, numFiles = 16)
    orders.repartition(16).write.parquet(plainDir)

    // identical contents — layout is pure physical reordering
    val back = spark.read.parquet(zDir)
    assert(back.count() == orders.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ==
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))

    // per-file normalized span of each dimension: the z-ordered layout
    // must be far more compact than a hash-partitioned one (whose every
    // file spans ~the whole domain in every dimension)
    def avgSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .collect().map(_.getDouble(1))
      val domain = orders.agg((max(col(c)) - min(col(c))).cast("double"))
        .head().getDouble(0)
      spans.sum / spans.length / domain
    }
    val (zCk, pCk) = (avgSpan(zDir, "o_custkey"), avgSpan(plainDir, "o_custkey"))
    val (zDy, pDy) = (avgSpan(zDir, "day"), avgSpan(plainDir, "day"))
    assert(pCk > 0.9 && pDy > 0.9, s"hash layout should span ~all: $pCk $pDy")
    assert(zCk < 0.6 * pCk, s"custkey span not compacted: $zCk vs $pCk")
    assert(zDy < 0.6 * pDy, s"day span not compacted: $zDy vs $pDy")

    // the pruning this buys: a both-dims rectangle predicate overlaps few
    // files' [min,max] boxes under z-order, all of them under hash
    def filesOverlapping(dir: String, ckHi: Long, dyHi: Long): Long = {
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("o_custkey").as("cklo"), min("day").as("dylo"))
        .filter(col("cklo") <= ckHi && col("dylo") <= dyHi)
        .count()
    }
    val b = orders.agg(min("o_custkey"), min("day")).head()
    val (ckQ, dyQ) = (b.getLong(0) + 10, b.getLong(1) + 100)
    assert(filesOverlapping(zDir, ckQ, dyQ) < filesOverlapping(plainDir, ckQ, dyQ),
      "z-order should leave fewer candidate files for a corner rectangle")
  }

  test("compactZOrdered: appends erode the rectangles, compaction restores them") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long"))
    val dir = Files.createTempDirectory("graft_zc").toString + "/t"
    val (head, tail) = (orders.filter(col("o_orderkey") % 3 === 0),
      orders.filter(col("o_orderkey") % 3 =!= 0))
    Layout.writeZOrdered(head, dir, col("o_custkey"), col("day"),
      bits = 16, numFiles = 8)
    // two ingest appends, each unordered — the production accretion shape
    tail.filter(col("o_orderkey") % 3 === 1).write.mode("append").parquet(dir)
    tail.filter(col("o_orderkey") % 3 === 2).write.mode("append").parquet(dir)
    val expSum = orders.agg(sum(col("o_orderkey"))).head().getLong(0)
    assert(spark.read.parquet(dir).agg(sum(col("o_orderkey"))).head()
      .getLong(0) == expSum)

    Layout.compactZOrdered(spark, dir, col("o_custkey"), col("day"),
      bits = 16, numFiles = 16)
    val back = spark.read.parquet(dir)
    // contents identical, temp/backup dirs gone, file count = numFiles
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) == expSum)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".zcompact_tmp")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".zcompact_old")))
    assert(back.select(input_file_name()).distinct().count() == 16)
    // rectangle property restored over the FULL corpus
    def avgSpan(c: String): Double = {
      val spans = back.groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .collect().map(_.getDouble(1))
      val domain = orders.agg((max(col(c)) - min(col(c))).cast("double"))
        .head().getDouble(0)
      spans.sum / spans.length / domain
    }
    assert(avgSpan("o_custkey") < 0.6, s"custkey spans: ${avgSpan("o_custkey")}")
    assert(avgSpan("day") < 0.6, s"day spans: ${avgSpan("day")}")
  }

  test("compactZOrdered crash window: recoverZCompact restores, recompaction self-heals") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long"))
    val dir = Files.createTempDirectory("graft_zr").toString + "/t"
    Layout.writeZOrdered(orders, dir, col("o_custkey"), col("day"),
      bits = 16, numFiles = 4)
    val expSum = orders.agg(sum(col("o_orderkey"))).head().getLong(0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a crash BETWEEN the two swap renames: path moved to the
    // backup, the new layout never moved in — no directory at `path`
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".zcompact_old")))
    // the store-open path recovers AUTOMATICALLY — no operator action.
    // (A raw spark.read.parquet(dir) here would throw path-not-found;
    // that failure mode is exactly why opens route through openZOrdered.)
    assert(graft.sources.Sources.openZOrdered(spark, dir)
      .agg(sum(col("o_orderkey"))).head().getLong(0) == expSum)
    assert(!Layout.recoverZCompact(spark, dir)) // idempotent no-op after
    assert(spark.read.parquet(dir).agg(sum(col("o_orderkey"))).head()
      .getLong(0) == expSum)
    // same crash state again, healed implicitly by the next compaction
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".zcompact_old")))
    Layout.compactZOrdered(spark, dir, col("o_custkey"), col("day"),
      bits = 16, numFiles = 4)
    assert(spark.read.parquet(dir).agg(sum(col("o_orderkey"))).head()
      .getLong(0) == expSum)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".zcompact_old")))
  }
}
