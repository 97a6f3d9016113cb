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
  * combine; exact `percentile` over the shuffled values): one Spark job per
  * column, no driver-side loops over data.
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

  /** one column's summary. Two aggregate jobs max: one combined aggregate for
    * totals/distinct-count, then EITHER the capped frequency top-k OR the
    * exact percentile job. */
  def columnSummary(df: DataFrame, key: String): ColSummary = {
    val dt = df.schema(key).dataType
    dt match {
      case BooleanType =>
        val r = df.agg(
          sum(col(key).cast(IntegerType)).as("ones"),
          count(lit(1)).as("total")).head()
        BitSummary(Option(r.get(0)).map(_.toString.toLong).getOrElse(0L), r.getLong(1))
      case _ =>
        // single job: total rows, non-null count, distinct non-null count
        val stats = df.agg(
          count(lit(1)).as("total"),
          count(col(key)).as("nonnull"),
          count_distinct(col(key)).as("distinct")).head()
        val (total, nonnull, distinct) =
          (stats.getLong(0), stats.getLong(1), stats.getLong(2))
        val nulls = total - nonnull
        val nullFreq: Seq[(Any, Long)] = if (nulls > 0) Seq((null, nulls)) else Nil
        if (isNumeric(dt) && distinct > QuantilesThreshold) {
          // weighted quantiles over the value distribution, exact; non-real
          // (null) elements stay in the frequency list like the reference
          // (cl-data-frame.lisp:72-87).
          val q = df.agg(
            percentile(col(key).cast(DoubleType), lit(Array(0.0, 0.25, 0.5, 0.75, 1.0)))
              .as("qs")).head().getSeq[Double](0)
          VectorSummary(total,
            Some(Quantiles(nonnull, q(0), q(1), q(2), q(3), q(4))), nullFreq)
        } else {
          // (value, count) pairs — the reference's sparse counter as a hash
          // agg; collect capped at FrequencyCap entries.
          val rows = df.groupBy(col(key)).agg(count(lit(1)).as("count"))
            .orderBy(desc("count"), col(key).cast(StringType))
            .limit(FrequencyCap)
            .collect().map(r => (r.get(0), r.getLong(1))).toSeq
          VectorSummary(total, None, rows)
        }
    }
  }

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

  /** the bit-summary side as a distributed plan (cl-data-frame.lisp:31-38):
    * ones + total of a boolean column. */
  def bitSummaryTable(df: DataFrame, cond: Column): DataFrame =
    df.agg(
      sum(cond.cast(LongType)).as("ones"),
      count(lit(1)).as("total"))

  /** frame-level summary: summarize every column when nrow ≥ MinimumLength,
    * else render raw rows (print-object, cl-data-frame.lisp:465-476). */
  def frameSummary(df: DataFrame): String = {
    val n = df.count()
    val header = s"#<DATA-FRAME (${df.columns.length} x $n)"
    if (n >= MinimumLength) {
      val body = df.columns.map { k =>
        s"  $k: ${columnSummary(df, k)}"
      }.mkString("\n")
      s"$header\n$body>"
    } else {
      val rows = df.collect().map(_.toSeq.mkString(" ")).mkString("\n  ")
      s"$header\n  $rows>"
    }
  }

  def frameSummary(df: DF): String = frameSummary(df.toSpark)
}
