package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [EXT] Typed custom aggregations (SURVEY §2.9 row 51: the reference's whole
  * transform surface is user functions; the aggregate-function analogue on
  * Spark is `Aggregator[IN, BUF, OUT]`, registrable as a UDAF via
  * `functions.udaf`).
  *
  * [[SparseCounter]] reproduces the reference's sparse-counter frequency
  * summary (clnu:make-sparse-counter + clnu:add, cl-data-frame.lisp:69-71) as
  * a single-pass distributed aggregate with a bounded buffer: per-partition
  * maps merge associatively, and the cap keeps the buffer executor-safe on
  * high-cardinality columns (a documented delta from the reference's
  * unbounded in-memory counter).
  */
object Aggregators {

  /** top-k exact-ish frequency counter. Buffer is a value→count map capped at
    * `maxEntries`; per-partition reduce drops NEW values when full (existing
    * keep counting), merge unions ALL counts then trims to the top
    * `maxEntries` by (count desc, value asc) — exact whenever distinct
    * values ≤ cap, an underestimate beyond it. Beyond the cap the result
    * depends on which values each partition saw first, so it is
    * deterministic only for deterministic input partitions (a parquet read
    * is; a shuffled intermediate may not be) — a documented delta from the
    * reference's unbounded counter. */
  final case class SparseCounter(maxEntries: Int = 10000)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < maxEntries => b.updated(v, 1L)
        case None => b
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val union = b.foldLeft(a) { case (acc, (v, c)) =>
        acc.updated(v, acc.getOrElse(v, 0L) + c)
      }
      if (union.size <= maxEntries) union
      else union.toSeq.sortBy { case (v, c) => (-c, v) }.take(maxEntries).toMap
    }

    /** sorted desc by count, value asc tiebreak — the reference's summary
      * ordering (cl-data-frame.lisp:84-87). */
    override def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (v, c) => (-c, v) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** bounded top-k per group: keeps only the k largest (ord, id) pairs (id
    * asc breaks ties) through BOTH reduce and merge, so partial aggregation
    * ships at most k rows per group per partition — the shuffle-minimal
    * alternative to a window `row_number`, which must sort and shuffle every
    * row of every group. Exact and deterministic (total order on (-ord, id)).
    * The list-resort per reduce is O(k log k); a production kernel would use
    * a bounded heap, the aggregate's shape and guarantees are identical. */
  final case class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, s"k must be positive, got $k")
    private def best(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sortBy { case (o, id) => (-o, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
      best(v +: b)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      best(a ++ b)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = best(b)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** exact mean via (sum, count) — the canonical Aggregator shape; numerically
    * order-independent for integral inputs, used as the UDAF registration
    * example in tests. */
  final case class LongMean()
      extends Aggregator[Long, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), v: Long): (Long, Long) = (b._1 + v, b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / b._2
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
