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
