package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import graft.files.FileOps

/**
 * Column-reference DSL — the Spark counterpart of the reference's
 * `C("x.y")` accessor and its string-predicate sugar
 * (reference: src/datachain/query/schema.py:32-66):
 *
 * {{{
 * import graft.dsl._
 * chain.filter(C("file.path").glob("*.jpg"), C("score") > 0.5)
 * }}}
 */
object dsl {

  /** Dotted-path column reference (nested signals resolve natively). */
  object C {
    def apply(path: String): Column = col(path)
  }

  implicit class GraftColumn(private val c: Column) extends AnyVal {
    /** Glob match over the whole value (reference `.glob()`, translated to
      * an anchored regex: `*` stays within a path segment, `**` crosses). */
    def glob(pattern: String): Column =
      c.rlike("^" + FileOps.globToRegex(pattern) + "$")

    /** Unanchored regex match (reference `.regexp()`). */
    def regexp(pattern: String): Column = c.rlike(pattern)

    /** Membership (reference `.in_()`). */
    def in_(values: Any*): Column = c.isin(values: _*)
  }
}
