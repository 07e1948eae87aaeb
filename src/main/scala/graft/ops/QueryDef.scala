package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle equivalent the
  * driver hash-compares against. Column names/aliases MUST match between
  * the two (the compare sorts columns by name before hashing).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle))
  def sparkOnly(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
