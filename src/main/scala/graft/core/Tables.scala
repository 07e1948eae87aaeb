package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each accessor is a plain parquet scan; Catalyst pushes filters and
  * prunes columns into the scan, so callers should select/filter on the
  * returned DataFrame rather than pre-materializing.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** events.parquet carries TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true Spark reads `ts` as an
    * epoch-nanos long. Convert to a microsecond timestamp (truncating,
    * matching DuckDB's ts::TIMESTAMP) so downstream time logic is typed.
    */
  def events: DataFrame =
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Raw events with `ts` left as the epoch-nanos long (exact arithmetic). */
  def eventsRaw: DataFrame = t("events")
}
