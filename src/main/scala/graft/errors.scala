package graft

/** Eager schema-error contract of the reference.
  *
  * The reference raises first-class conditions at call time:
  * `duplicate-key` (cl-data-frame.lisp:179-183, raised at 221-223) and
  * `key-not-found` carrying the valid key set (cl-data-frame.lisp:185-192,
  * raised at 205-211). Spark's own errors are lazy (analysis-time) and
  * `withColumn` silently overwrites, so the graft wrapper checks eagerly and
  * throws these instead (SURVEY.md §2.8, §7.4.4).
  */
final class DuplicateKeyException(val key: String, val keys: Seq[String])
    extends IllegalArgumentException(
      s"Duplicate key '$key' (existing keys: ${keys.mkString(", ")})")

final class KeyNotFoundException(val key: String, val keys: Seq[String])
    extends IllegalArgumentException(
      s"Key '$key' not found (valid keys: ${keys.mkString(", ")})")

/** Reference: "Can't create an empty data frame." (cl-data-frame.lisp:317) */
final class EmptyFrameException
    extends IllegalArgumentException("Can't create an empty data frame.")

/** Reference: "Columns don't have the same length." (cl-data-frame.lisp:438-445)
  * and `check-column-compatibility` on insertion (cl-data-frame.lisp:286-288).
  */
final class ColumnLengthException(val expected: Long, val got: Long)
    extends IllegalArgumentException(
      s"Columns don't have the same length (expected $expected, got $got).")

/** Guard for the reference-parity paths that materialize the whole frame on
  * the driver (`column`/`mapRows`/`maskRows`/`asAlist`/`toMatrix`): at corpus
  * scale such a collect is an OOM, not a slow call, so above
  * [[DF.maxDriverRows]] the call refuses with a pointer to the distributed
  * form instead of letting the footgun fire (round-9 verdict item #7). */
final class DriverMaterializationException(
    val op: String, val rows: Long, val cap: Long, val scaleAlt: String)
    extends IllegalStateException(
      s"$op would materialize $rows rows on the driver (cap $cap). These " +
        "reference-parity forms exist for small interactive frames; at scale " +
        s"use $scaleAlt, or raise graft.DF.maxDriverRows explicitly.")
