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

  /** events.parquet has shipped with two `ts` layouts across driver
    * generations: TIMESTAMP(NANOS) — which
    * spark.sql.legacy.parquet.nanosAsLong=true surfaces as an epoch-nanos
    * long — and plain TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ).
    * Both accessors sniff the scanned type and normalize, so query code
    * is layout-independent:
    *  - [[events]]: `ts` as a typed timestamp (micros precision,
    *    truncating nanos, matching DuckDB's ts::TIMESTAMP)
    *  - [[eventsRaw]]: `ts` as an epoch-MICROS long (exact integer
    *    arithmetic; session tz is UTC so the NTZ→micros cast is exact).
    *    Micros, not nanos: every integer-exact consumer works in micros
    *    (`unix_micros` precision), so a nanos contract would just add a
    *    per-row ×1000 on the micros layout and a ÷1000 in every reader.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Raw events with `ts` as an epoch-micros long (exact arithmetic). */
  def eventsRaw: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("ts div 1000")) // nanos layout → micros
      case _ =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    }
  }
}
