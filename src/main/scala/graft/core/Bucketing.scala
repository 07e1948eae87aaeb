package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * The staging↔log joins (idempotency J5, staged-delete S16, dedup J3)
  * all key on the same few columns; persisting both sides bucketed on
  * that key lets Catalyst plan a SortMergeJoin with NO Exchange on
  * either side — at 100 TB that removes the dominant shuffle of every
  * maintenance run. Bucketing requires the session catalog
  * (saveAsTable), so these helpers manage warehouse tables rather than
  * bare parquet paths.
  */
object Bucketing {

  /** Persist a frame as a bucketed, sorted table (overwrite). Clears
    * both the catalog entry AND any leftover table directory first:
    * `mode("overwrite")` only drops a table the CURRENT session's
    * catalog knows about — a location left behind by a previous JVM
    * (in-memory catalog, on-disk warehouse) otherwise fails the create
    * with LOCATION_ALREADY_EXISTS.
    *
    * Path safety: only unqualified `[A-Za-z0-9_]+` names are accepted
    * (a qualified `db.tbl` would make the fallback path below point at
    * the wrong directory). When the catalog KNOWS the table, its real
    * location is resolved via DESCRIBE EXTENDED before the drop — a
    * custom/external location survives DROP TABLE and would otherwise
    * fail the re-create while an unrelated warehouse path got deleted.
    * Only for a catalog-unknown orphan do we fall back to the default
    * managed location, lowercased the way Spark derives it.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed requires an unqualified [A-Za-z0-9_]+ table name, got '$table'")
    val conf = spark.sparkContext.hadoopConfiguration
    if (spark.catalog.tableExists(table)) {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
        .where(org.apache.spark.sql.functions.col("col_name") === "Location")
        .select("data_type").collect().headOption.map(_.getString(0))
      spark.sql(s"DROP TABLE `$table`")
      loc.foreach(Fs.delete(_, conf, recursive = true))
    } else {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      Fs.delete(s"$warehouse/${table.toLowerCase(java.util.Locale.ROOT)}",
        conf, recursive = true)
    }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the physical plan contains zero Exchange operators —
    * asserted in BucketingSpec by inspecting the executed plan.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), on, joinType)
}
