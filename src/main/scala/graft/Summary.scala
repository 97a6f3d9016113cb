package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column / frame summaries with the reference's exact switching semantics
  * (SURVEY.md §2.6-2.7):
  *
  *  - a boolean ("bit") column summarizes to count-of-ones + total
  *    (cl-data-frame.lisp:31-38, 65-66);
  *  - a column with more than [[Summary.QuantilesThreshold]] (=10,
  *    cl-data-frame.lisp:60-61) distinct real values summarizes to
  *    min/q25/q50/q75/max quantiles, with non-real elements kept as a
  *    frequency list (cl-data-frame.lisp:72-87);
  *  - otherwise: an exact per-distinct-value frequency table sorted by
  *    descending count (cl-data-frame.lisp:67-71, 84-90);
  *  - a frame prints per-column summaries only when nrow ≥
  *    [[Summary.MinimumLength]] (=10, cl-data-frame.lisp:463-464), else raw.
  *
  * All aggregation is distributed (hash aggregate with partial/map-side
  * combine; exact `percentile` over the shuffled values), and the whole
  * frame summarizes in ONE aggregate job regardless of column count —
  * frequency counter, non-null count, and percentiles run side by side in
  * a single pass (the reference's one loop, cl-data-frame.lisp:69-87).
  */
object Summary {
  val QuantilesThreshold = 10 // *column-summary-quantiles-threshold*
  val MinimumLength = 10      // *column-summary-minimum-length*

  sealed trait ColSummary
  /** "bits, ones: N (P%)" (cl-data-frame.lisp:35-38) */
  final case class BitSummary(ones: Long, total: Long) extends ColSummary {
    def pct: Double = if (total == 0) 0.0 else 100.0 * ones / total
    override def toString: String = f"$total bits, ones: $ones ($pct%.0f%%)"
  }
  /** quantile line + "count (pct%) x value" frequency list
    * (cl-data-frame.lisp:92-117) */
  final case class VectorSummary(
      total: Long,
      quantiles: Option[Quantiles],
      frequencies: Seq[(Any, Long)]) extends ColSummary {
    override def toString: String = {
      val q = quantiles.map(_.toString)
      val f = frequencies.map { case (v, c) =>
        f"$c (${100.0 * c / total}%.0f%%) x $v"
      }
      (q.toSeq ++ f).mkString(", ")
    }
  }
  /** `reals` = number of non-null real elements the quantiles were computed
    * over (the reference's "N reals" in the rendered summary). */
  final case class Quantiles(reals: Long, min: Double, q25: Double, q50: Double,
                             q75: Double, max: Double) {
    override def toString: String =
      f"$reals reals, $min%s [q25=$q25%s, q50=$q50%s, q75=$q75%s] $max%s"
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Cap on the number of frequency entries brought to the driver: the
    * reference collects the FULL distinct-value list (fine in-memory,
    * cl-data-frame.lisp:67-71); at scale an unbounded collect of a
    * high-cardinality column would OOM the driver, so we keep the top
    * [[FrequencyCap]] by count — a documented delta from the reference. */
  val FrequencyCap = 1000

  /** all columns' summaries in ONE aggregate job (SURVEY §4.1): per column
    * the [[graft.functions.Aggregators.SparseCounter]] frequency map, the
    * non-null count, and (numeric only) the exact percentile array are
    * computed side by side in a single global hash aggregate — the
    * reference's one pass over the data (cl-data-frame.lisp:69-87), where
    * earlier rounds ran 2 sequential jobs per column (2N jobs for a wide
    * frame). The quantiles-vs-frequency switch is decided from the counter's
    * observed size AFTER the pass, so no second look at the data is needed.
    * Returns (row count, per-column summaries in schema order).
    *
    * The DEFAULT quantile path is the approx sketch — the scale-correct
    * choice (bounded executor memory at 100 TB). Note the sketch returns
    * OBSERVED values (quantile_disc semantics), never interpolates; the
    * reference interpolates (q50 of 1..20 is 10.5) — pass
    * `exactQuantiles = true` for that parity behavior
    * ([[columnSummary]] does, being the §2.6 parity form). */
  def frameColumnSummaries(df: DataFrame): (Long, Seq[(String, ColSummary)]) =
    frameColumnSummaries(df, exactQuantiles = false)

  /** `exactQuantiles = false` (the default) uses `approx_percentile`
    * (Greenwald-Khanna sketch, bounded memory, accuracy 10000 → ±1e-4 rank
    * error) — the scale path; `true` swaps in the exact `percentile`, which
    * buffers the full value multiset per column (unbounded executor memory
    * at 100 TB) — reference parity on frames big enough for the sketch to
    * actually approximate. */
  def frameColumnSummaries(df: DataFrame,
                           exactQuantiles: Boolean): (Long, Seq[(String, ColSummary)]) = {
    val counter = udaf(graft.functions.Aggregators.SparseCounter(FrequencyCap))
    val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)))
    var idx = 1
    // per field: Left(name, onesIdx) for booleans,
    // Right(name, nonnullIdx, freqIdx, quantileIdx) otherwise
    val exts = df.schema.fields.map { f =>
      val c = df.col(f.name)
      f.dataType match {
        case BooleanType =>
          aggs += sum(c.cast(LongType))
          val e = Left((f.name, idx)); idx += 1; e
        case dt =>
          val nn = idx; aggs += count(c); idx += 1
          val fr = idx; aggs += counter(c.cast(StringType)); idx += 1
          val qi = if (isNumeric(dt)) {
            val q = idx
            val qsCol =
              if (exactQuantiles)
                percentile(c.cast(DoubleType),
                  lit(Array(0.0, 0.25, 0.5, 0.75, 1.0)))
              else
                approx_percentile(c.cast(DoubleType),
                  lit(Array(0.0, 0.25, 0.5, 0.75, 1.0)), lit(10000))
            aggs += qsCol
            idx += 1; Some(q)
          } else None
          Right((f.name, nn, fr, qi))
      }
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
    val total = row.getLong(0)
    val sums: Seq[(String, ColSummary)] = exts.toSeq.map {
      case Left((name, onesIdx)) =>
        name -> (BitSummary(Option(row.get(onesIdx))
          .map(_.toString.toLong).getOrElse(0L), total): ColSummary)
      case Right((name, nnIdx, frIdx, qIdx)) =>
        val nonnull = row.getLong(nnIdx)
        val nulls = total - nonnull
        val freq = row.getSeq[org.apache.spark.sql.Row](frIdx)
          .map(r => (r.getString(0), r.getLong(1)))
        qIdx match {
          case Some(q) if freq.size > QuantilesThreshold =>
            // non-real (null) elements stay in the frequency list like the
            // reference (cl-data-frame.lisp:72-87)
            val qs = row.getSeq[Double](q)
            name -> (VectorSummary(total,
              Some(Quantiles(nonnull, qs(0), qs(1), qs(2), qs(3), qs(4))),
              if (nulls > 0) Seq((null, nulls)) else Nil): ColSummary)
          case _ =>
            val entries: Seq[(Any, Long)] =
              (freq.map(e => (e._1: Any, e._2)) ++
                (if (nulls > 0) Seq((null: Any, nulls)) else Nil))
                .sortBy { case (v, c) => (-c, if (v == null) "" else v.toString) }
            name -> (VectorSummary(total, None, entries): ColSummary)
        }
    }
    (total, sums)
  }

  /** one column's summary — the same single-job pass over just that column.
    * Frequency values are rendered via their string form (the counter is a
    * string-keyed aggregate); the reference prints them the same way. */
  def columnSummary(df: DataFrame, key: String): ColSummary =
    // the §2.6 REFERENCE-PARITY form: exact interpolated quantiles
    // (cl-data-frame's q50 of 1..20 is 10.5, which no observed-value sketch
    // returns) — small interactive frames by contract; the scale surface
    // (frameColumnSummaries / frameSummary / approxQuantileSummary)
    // defaults to the approx sketch
    frameColumnSummaries(df.select(df.col(key)), exactQuantiles = true)._2.head._2

  /** the frequency-table side of column-summary as a distributed plan
    * (cl-data-frame.lisp:67-71, 84-90): per-distinct-value exact counts,
    * sorted desc by count (value asc as tiebreak). */
  def frequencyTable(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(key))

  /** the quantile side of column-summary as a distributed plan: exact
    * min/q25/q50/q75/max of a numeric column (cl-data-frame.lisp:72-87). */
  def quantileSummary(df: DataFrame, key: String): DataFrame =
    df.agg(
      round(min(col(key).cast(DoubleType)), 6).as("vmin"),
      round(percentile(col(key).cast(DoubleType), lit(0.25)), 6).as("q25"),
      round(percentile(col(key).cast(DoubleType), lit(0.5)), 6).as("q50"),
      round(percentile(col(key).cast(DoubleType), lit(0.75)), 6).as("q75"),
      round(max(col(key).cast(DoubleType)), 6).as("vmax"))

  /** the SCALE-path quantile summary: same shape as [[quantileSummary]] but
    * `approx_percentile` (Greenwald-Khanna sketch, bounded executor memory,
    * rank error ≤ 1/accuracy) for the interior quantiles — min/max stay
    * exact (single-value aggregates, no buffering). This is the documented
    * default at corpus scale; the exact [[quantileSummary]] exists for
    * reference-parity goldens and small interactive frames. */
  def approxQuantileSummary(df: DataFrame, key: String,
                            accuracy: Int = 10000): DataFrame = {
    val c = col(key).cast(DoubleType)
    df.agg(
      round(min(c), 6).as("vmin"),
      round(approx_percentile(c, lit(0.25), lit(accuracy)), 6).as("q25"),
      round(approx_percentile(c, lit(0.5), lit(accuracy)), 6).as("q50"),
      round(approx_percentile(c, lit(0.75), lit(accuracy)), 6).as("q75"),
      round(max(c), 6).as("vmax"))
  }

  /** oracle-checkable rank-error validation of the approx quantile sketch:
    * the sketch's values cannot be replicated in an independent engine
    * (merge order varies run to run), but its CONTRACT can be checked
    * exactly — for each returned value v and target rank p the exact ranks
    * rank_min = |{x < v}| and rank_max = |{x ≤ v}| (computed distributively
    * against the raw column, one aggregate pass) must bracket some rank
    * within ±N/accuracy of p·N. Output is deterministic (exact n/vmin/vmax
    * plus the bound booleans, true whenever the GK guarantee holds) so the
    * driver's hash compare pins it — the HLL-bound pattern. */
  def approxQuantileBoundCheck(df: DataFrame, key: String,
                               accuracy: Int = 10000): DataFrame = {
    val c = col(key).cast(DoubleType)
    val sketch = df.agg(approx_percentile(
      c, lit(Array(0.25, 0.5, 0.75)), lit(accuracy)).as("__qs"))
    val eps = 1.0 / accuracy
    def ok(i: Int, p: Double): Column = {
      val v = col("__qs").getItem(i)
      val rankMin = sum((c < v).cast(LongType))
      val rankMax = sum((c <= v).cast(LongType))
      gkRankOk(rankMin, rankMax, count(c), p, eps)
    }
    df.crossJoin(broadcast(sketch)).agg(
      count(c).as("n"),
      round(min(c), 6).as("vmin"),
      round(max(c), 6).as("vmax"),
      ok(0, 0.25).as("ok25"), ok(1, 0.5).as("ok50"), ok(2, 0.75).as("ok75"))
  }

  /** the GK acceptance predicate, shared by [[approxQuantileBoundCheck]]
    * and its boundary unit test: a value occupying ranks
    * (rankMin, rankMax] is acceptable iff that interval intersects
    * [⌊(p−ε)N⌋, ⌈(p+ε)N⌉]. The ceil/floor on the bound sides is load-
    * bearing — raw p±ε·N is STRICTER than the documented GK contract, and
    * a sketch value sitting exactly at its integer error-bound edge would
    * flip the oracle to a false mismatch without it. */
  private[graft] def gkRankOk(rankMin: Column, rankMax: Column, n: Column,
                              p: Double, eps: Double): Column =
    ((rankMin + 1) <= ceil(lit(p + eps) * n)) &&
      (rankMax >= floor(lit(p - eps) * n))

  /** the bit-summary side as a distributed plan (cl-data-frame.lisp:31-38):
    * ones + total of a boolean column. */
  def bitSummaryTable(df: DataFrame, cond: Column): DataFrame =
    df.agg(
      sum(cond.cast(LongType)).as("ones"),
      count(lit(1)).as("total"))

  /** frame-level summary: summarize every column when nrow ≥ MinimumLength,
    * else render raw rows (print-object, cl-data-frame.lisp:465-476).
    * ONE aggregate job for any column count (plus a raw-rows collect for
    * small frames) — never a job-per-column loop. */
  def frameSummary(df: DataFrame): String = {
    val (n, sums) = frameColumnSummaries(df)
    val header = s"#<DATA-FRAME (${df.columns.length} x $n)"
    if (n >= MinimumLength) {
      val body = sums.map { case (k, s) => s"  $k: $s" }.mkString("\n")
      s"$header\n$body>"
    } else {
      val rows = df.collect().map(_.toSeq.mkString(" ")).mkString("\n  ")
      s"$header\n  $rows>"
    }
  }

  def frameSummary(df: DF): String = frameSummary(df.toSpark)

  /** two-corpus drift report over a numeric column: both sides histogram
    * into the SAME fixed integer buckets (shared lo/hi/buckets → exact,
    * engine-portable arithmetic: bucket = clamp((x−lo)·n div span)), then
    * full-outer-join on the bucket — (bucket, n_a, n_b) with zeros for
    * one-sided buckets. This is the corpus-version monitoring surface (a
    * new crawl shifting the length/score distribution shows up as mass
    * moving between buckets) kept in EXACT INTEGER counts: PSI/KL are one
    * ln away, but transcendentals are engine-ulp-unstable — callers derive
    * them from the exact counts. Out-of-range values clamp to the edge
    * buckets (visible as edge-mass, never dropped). One scan + one tiny
    * aggregate per side; the join is buckets-sized. */
  def histogramDrift(a: DataFrame, b: DataFrame, colName: String,
                     lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(hi > lo, s"histogramDrift: hi ($hi) must be > lo ($lo)")
    require(buckets >= 2 && buckets <= 4096,
      s"histogramDrift: buckets must be in [2,4096], got $buckets")
    val span = hi - lo + 1
    // clamp the RAW value into [lo, hi] BEFORE the multiply: clamping the
    // bucket after it lets (x − lo) · buckets overflow Long for extreme
    // out-of-range x, wrapping negative so the row lands in bucket 0
    // instead of the documented top edge bucket. Post-clamp the product is
    // bounded by (span − 1) · buckets, which the require below keeps exact.
    require(span <= Long.MaxValue / buckets,
      s"histogramDrift: span ($span) * buckets ($buckets) would overflow " +
        "Long — use coarser units (e.g. ms instead of ns) or fewer buckets")
    def hist(df: DataFrame, out: String): DataFrame =
      df.select(expr(
          s"((least(${hi}L, greatest(${lo}L, CAST($colName AS BIGINT))) " +
            s"- ${lo}L) * ${buckets}L) div ${span}L")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(out))
    hist(a, "n_a").join(hist(b, "n_b"), Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .orderBy("bucket")
  }
}
